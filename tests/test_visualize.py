"""Visualizer / profiler smoke tests."""

import os
import pickle

import numpy as np
import pytest

from unopticalflow_tpu.utils.profiler import Profiler
from unopticalflow_tpu.utils.visualizer import Visualizer, VisualizerDebug


def test_visualizer_log_pack(tmp_path, capsys):
    vis = Visualizer({"loss_pixel": 0.15}, dump_dir=str(tmp_path / "log.pkl"))
    pack = {
        "loss_pixel": np.array([0.5, 0.7]),
        "loss_ssim": np.array([1.0]),
        "loss_flow_smooth": np.array([0.1]),
        "loss_flow_consis": np.array([0.2]),
    }
    vis.print_loss(pack, iter_=3)
    out = capsys.readouterr().out
    assert "iter: 3" in out and "loss_pixel: 0.6" in out

    vis.add_log_pack({"eval_2015_res": "epe 1.0"})
    vis.dump_log()
    with open(tmp_path / "log.pkl", "rb") as f:
        log = pickle.load(f)
    assert log == [{"eval_2015_res": "epe 1.0"}]


def test_visualizer_debug_dumpers(tmp_path):
    vis = VisualizerDebug(dump_dir=str(tmp_path))
    rng = np.random.RandomState(0)
    vis.save_img(rng.randint(0, 255, (8, 8, 3), np.uint8), "img")
    vis.show_mask(rng.rand(8, 8, 1), "mask")
    vis.save_depth_img(rng.rand(8, 8, 1) * 10, "d")
    vis.save_flow_img(rng.randn(8, 8, 2), "f")
    vis.save_disp_color_img(rng.rand(8, 8), "disp")
    names = sorted(os.listdir(tmp_path))
    assert names == [
        "d_depth.png", "disp_depth.jpg", "f_flow.png", "img.png", "mask.png"
    ]


def test_profiler_sections(capsys):
    prof = Profiler(silent=True)
    with prof.section("load"):
        sum(range(1000))
    with prof.section("load"):
        sum(range(1000))
    report = prof.report_all()
    assert "load" in report and report["load"] > 0
    assert prof.counts["load"] == 2


def test_correspondence_and_epipolar_tools(tmp_path):
    """show_corres / show_epipolar_line save the reference-named files."""
    cv2 = pytest.importorskip("cv2")
    from unopticalflow_tpu.utils.visualizer import VisualizerDebug

    rng = np.random.RandomState(0)
    viz = VisualizerDebug(dump_dir=str(tmp_path))
    img1 = rng.randint(0, 255, (40, 60, 3), dtype=np.uint8)
    img2 = rng.randint(0, 255, (40, 60, 3), dtype=np.uint8)
    match = np.array(
        [[10, 20, 30], [5, 15, 25], [12, 22, 32], [6, 16, 26]], np.float32
    )
    viz.draw_point_corres(img1, img2, match, "m")
    for f in ("m_img1_cor.png", "m_img2_cor.png"):
        out = cv2.imread(str(tmp_path / f))
        assert out is not None and out.shape == (40, 60, 3)

    # a valid fundamental matrix (pure x-translation -> horizontal epilines)
    fundamental = np.array([[0, 0, 0], [0, 0, -1], [0, 1, 0]], np.float64)
    viz.draw_epipolar_line(img1, img2, match, fundamental, "e")
    for f in ("e_1eline.png", "e_2eline.png"):
        out = cv2.imread(str(tmp_path / f))
        assert out is not None and out.shape == (40, 60, 3)
    # the epiline overlay must actually draw on the image
    assert not np.array_equal(cv2.imread(str(tmp_path / "e_1eline.png")), img1)


def test_ray_tools():
    """visualize_two_rays plots on a 3D axis and returns the ray dot."""
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    import matplotlib.pyplot as plt

    from unopticalflow_tpu.utils.visualizer import VisualizerDebug

    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    K = np.array([[50.0, 0, 30], [0, 50, 20], [0, 0, 1]])
    P1 = K @ np.hstack([np.eye(3), np.zeros((3, 1))])
    P2 = K @ np.hstack([np.eye(3), np.array([[1.0], [0], [0]])])
    dot = VisualizerDebug(dump_dir=None).visualize_two_rays(
        ax, [30, 20, 30, 20], P1, P2
    )
    # same pixel, camera translated in x: rays nearly parallel
    assert 0.9 < dot <= 1.0
    plt.close(fig)
