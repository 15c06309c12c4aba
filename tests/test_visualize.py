"""Visualizer / profiler smoke tests."""

import os
import pickle

import numpy as np

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
