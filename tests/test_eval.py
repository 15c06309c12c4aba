"""Evaluation-stack tests: flow I/O round trips and metric correctness."""

import os

import numpy as np
import pytest

from unopticalflow_tpu.evaluation import eval_depth, eval_flow_avg
from unopticalflow_tpu.evaluation.eval_odom import (
    calc_sequence_errors,
    load_poses,
    umeyama_alignment,
)
from unopticalflow_tpu.evaluation.evaluate_flow import calculate_error_rate
from unopticalflow_tpu.evaluation.evaluate_mask import (
    frequency_weighted_IU,
    mean_IU,
    pixel_accuracy,
)
from unopticalflow_tpu.evaluation.flowlib import (
    flow_error,
    flow_to_image,
    read_flow,
    read_flow_png,
    write_flow,
    write_flow_png,
)


def test_flo_roundtrip(tmp_path):
    flow = np.random.RandomState(0).randn(8, 12, 2).astype(np.float32) * 10
    path = str(tmp_path / "a.flo")
    write_flow(flow, path)
    np.testing.assert_allclose(read_flow(path), flow, rtol=1e-6)


def test_kitti_png_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    flow = np.zeros((6, 9, 3))
    flow[:, :, 0] = np.round(rng.randn(6, 9) * 30 * 64) / 64  # quantized to 1/64
    flow[:, :, 1] = np.round(rng.randn(6, 9) * 30 * 64) / 64
    flow[:, :, 2] = 1
    flow[0, 0, :] = 0  # one invalid pixel
    path = str(tmp_path / "f.png")
    write_flow_png(flow, path)
    back = read_flow_png(path)
    valid = flow[:, :, 2] == 1
    np.testing.assert_allclose(back[valid][:, :2], flow[valid][:, :2], atol=1e-6)
    assert back[0, 0, 0] == 0 and back[0, 0, 1] == 0


def test_flow_error_and_image():
    tu = np.ones((5, 5)) * 3
    tv = np.zeros((5, 5))
    assert flow_error(tu, tv, tu + 1.0, tv) == pytest.approx(1.0)
    img = flow_to_image(np.stack([tu, tv], -1))
    assert img.shape == (5, 5, 3) and img.dtype == np.uint8


def test_calculate_error_rate():
    gt = np.zeros((4, 4, 2))
    gt[:, :, 0] = 10.0
    mask = np.ones((4, 4))
    epe = np.zeros((4, 4))
    epe[0, :] = 4.0  # >3px and 40% of |gt|=10 -> outliers
    assert calculate_error_rate(epe, gt, mask) == pytest.approx(4 / 16)


def test_eval_flow_avg_perfect_prediction():
    class Cfg:
        img_hw = (8, 16)
        model_dir = "."

    rng = np.random.RandomState(0)
    gt = np.zeros((8, 16, 3))
    gt[:, :, 0] = 2.0
    gt[:, :, 1] = -1.0
    gt[:, :, 2] = 1.0
    noc = np.ones((8, 16))
    pred = gt[:, :, :2].copy()
    res = eval_flow_avg([gt], [noc], [pred], Cfg())
    vals = [float(v) for v in res.splitlines()[1].split(",")]
    assert vals[0] == pytest.approx(0.0, abs=1e-4)  # epe
    assert vals[3] == pytest.approx(0.0, abs=1e-6)  # err_rate


def test_segmentation_metrics():
    gt = np.zeros((4, 4))
    gt[:2] = 1
    pred = np.zeros((4, 4))
    pred[:2, :2] = 1
    assert pixel_accuracy(pred, gt) == pytest.approx((4 + 8) / 16)
    miu, iu = mean_IU(pred, gt)
    # class 0: inter 8, union 12 ; class 1: inter 4, union 8
    assert iu[0] == pytest.approx(8 / 12)
    assert iu[1] == pytest.approx(4 / 8)
    assert miu == pytest.approx((8 / 12 + 4 / 8) / 2)
    fw = frequency_weighted_IU(pred, gt)
    assert fw == pytest.approx((8 * 8 / 12 + 8 * 4 / 8) / 16)


def test_eval_depth_perfect():
    gt = [np.full((20, 20), 10.0)]
    res = eval_depth(gt, [gt[0].copy()])
    abs_rel, sq_rel, rms, log_rms, a1, a2, a3 = res
    assert abs_rel == pytest.approx(0.0)
    assert a1 == pytest.approx(1.0)


def test_umeyama_recovers_similarity():
    rng = np.random.RandomState(3)
    x = rng.randn(3, 40)
    theta = 0.3
    r_true = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ]
    )
    t_true = np.array([1.0, -2.0, 0.5])
    y = 2.5 * (r_true @ x) + t_true[:, None]
    r, t, c = umeyama_alignment(x, y, with_scale=True)
    np.testing.assert_allclose(r, r_true, atol=1e-8)
    np.testing.assert_allclose(t, t_true, atol=1e-8)
    assert c == pytest.approx(2.5)


def test_odom_pose_loading_and_errors(tmp_path):
    # straight-line GT at 1 m/frame; prediction identical -> zero errors
    lines = []
    for i in range(250):
        pose = np.eye(4)[:3]
        pose[2, 3] = float(i)
        lines.append(" ".join(str(v) for v in pose.flatten()) + "\n")
    gt_txt = str(tmp_path / "gt.txt")
    with open(gt_txt, "w") as f:
        f.writelines(lines)
    poses = load_poses(gt_txt)
    assert len(poses) == 250 and poses[3][2, 3] == 3.0
    errs = calc_sequence_errors(poses, poses)
    assert errs and all(e[1] == 0 and e[2] == 0 for e in errs)


def test_flowlib_long_tail(tmp_path):
    """segment_flow / evaluate_flow(_file) / disp_to_flowfile / warp_image /
    scale_image / visualize_flow (reference flowlib.py:29-82,166-201,299-440)."""
    from unopticalflow_tpu.evaluation import flowlib as fl

    rng = np.random.RandomState(0)
    # segment_flow: pure +x flow is octant 1; zero flow is class 0
    f = np.zeros((6, 8, 2), np.float32)
    f[:, :, 0] = 2.0
    assert set(np.unique(fl.segment_flow(f))) == {1.0}
    assert set(np.unique(fl.segment_flow(np.zeros((4, 4, 2), np.float32)))) == {0.0}

    # evaluate_flow(_file): EPE of a known offset
    gt = rng.rand(6, 8, 2).astype(np.float32)
    pred = gt + np.array([3.0, 4.0], np.float32)
    np.testing.assert_allclose(fl.evaluate_flow(gt, pred), 5.0, rtol=1e-6)
    pg, pp = str(tmp_path / "g.flo"), str(tmp_path / "p.flo")
    fl.write_flow(gt, pg)
    fl.write_flow(pred, pp)
    np.testing.assert_allclose(fl.evaluate_flow_file(pg, pp), 5.0, rtol=1e-6)

    # disp_to_flowfile roundtrip: u = disparity, v = 0
    disp = rng.rand(6, 8).astype(np.float32) * 10
    df = str(tmp_path / "d.flo")
    fl.disp_to_flowfile(disp, df)
    back = fl.read_flow(df)
    np.testing.assert_allclose(back[:, :, 0], disp, rtol=1e-6)
    assert np.all(back[:, :, 1] == 0)

    # warp_image: integer-shift flow reproduces the shifted image inside
    im = np.stack([np.tile(np.arange(16, dtype=np.uint8), (8, 1))] * 3, -1)
    shift = np.zeros((8, 16, 2), np.float32)
    shift[:, :, 0] = 2.0
    out = fl.warp_image(im, shift)
    np.testing.assert_allclose(out[:, :-2, 0], im[:, 2:, 0])

    # scale_image endpoints
    np.testing.assert_array_equal(
        fl.scale_image(np.array([[1.0, 3.0]]), (0, 255)), [[0, 255]]
    )

    # visualize_flow in both modes returns uint8 HxWx3
    vis_y = fl.visualize_flow(rng.rand(6, 8, 2).astype(np.float32), "Y")
    f3 = np.dstack([gt, np.ones((6, 8), np.float32)])
    vis_rgb = fl.visualize_flow(f3, "RGB")
    for v in (vis_y, vis_rgb):
        assert v.shape == (6, 8, 3) and v.dtype == np.uint8


def test_real_kitti_eval_runbook_smoke(tmp_path):
    """benchmarks/real_kitti_eval.py end-to-end on synthetic GT fixtures.

    Builds tiny KITTI-2012/2015 training trees (image pairs + 16-bit GT flow
    PNGs + obj_map) and drives the real-data EPE runbook script through model
    load -> inference -> GT load -> eval_flow_avg -> parsed metrics, so the
    one-command path is proven before any real dataset exists on a host.
    """
    import sys

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo_root, "benchmarks"))
    try:
        import real_kitti_eval
    finally:
        sys.path.pop(0)
    import cv2

    rng = np.random.RandomState(5)
    n, gh, gw = 2, 40, 72

    def build(root, with_obj_map):
        for sub in ("image_2", "flow_occ", "flow_noc") + (
            ("obj_map",) if with_obj_map else ()
        ):
            os.makedirs(os.path.join(root, sub))
        for i in range(n):
            for suffix in ("_10", "_11"):
                cv2.imwrite(
                    os.path.join(root, "image_2", f"{i:06d}{suffix}.png"),
                    rng.randint(0, 255, (gh, gw, 3), dtype=np.uint8),
                )
            gt = np.zeros((gh, gw, 3), np.float64)
            gt[:, :, :2] = np.round(rng.uniform(-4, 4, (gh, gw, 2)) * 64) / 64
            gt[:, :, 2] = (rng.rand(gh, gw) > 0.2).astype(np.float64)
            write_flow_png(gt, os.path.join(root, "flow_occ", f"{i:06d}_10.png"))
            noc = gt.copy()
            noc[:, :, 2] *= (rng.rand(gh, gw) > 0.3).astype(np.float64)
            write_flow_png(noc, os.path.join(root, "flow_noc", f"{i:06d}_10.png"))
            if with_obj_map:
                cv2.imwrite(
                    os.path.join(root, "obj_map", f"{i:06d}_10.png"),
                    (rng.rand(gh, gw) > 0.5).astype(np.uint16),
                )

    d2012 = str(tmp_path / "kitti_2012" / "training")
    d2015 = str(tmp_path / "kitti_2015" / "training")
    build(d2012, with_obj_map=False)
    build(d2015, with_obj_map=True)

    results = real_kitti_eval.run_eval(
        pretrained_model=None,
        gt_2012_dir=d2012,
        gt_2015_dir=d2015,
        img_hw=(64, 128),  # 6-level pyramid needs H, W divisible by 64
        limit=n,
    )
    for key in ("kitti_2012", "kitti_2015"):
        metrics = results[key]
        assert np.isfinite(metrics["epe"]) and metrics["epe"] > 0, key
        assert "err_rate" in metrics, key
    # 2015 ran with moving masks -> the extended 8-column table
    assert "epe_move" in results["kitti_2015"]
