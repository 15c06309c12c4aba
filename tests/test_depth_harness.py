"""Depth-eval harness tests (synthetic GT; reference test.py:99-198 protocols).

The harnesses accept any depth-predicting callable; here a "perfect oracle"
(disp = 1/gt resized to the network input) must score near-zero error under
median scaling, and a 2x-scaled oracle must score identically (median
scaling removes global scale — the protocol's defining property).
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unopticalflow_tpu.evaluation.depth_harness import (
    resize_depths,
    test_eigen_depth as eigen_depth_eval,
    test_nyu as nyu_depth_eval,
    test_single_image as single_image_demo,
)

IMG_HW = (64, 128)


class _Cfg:
    def __init__(self, raw_base_dir):
        self.raw_base_dir = raw_base_dir
        self.img_hw = IMG_HW


def _smooth_depth(h, w, seed):
    """Smooth positive depth field with structure (resize-friendly)."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    return (
        10.0
        + 3.0 * np.sin(2 * np.pi * xs / w + seed)
        + 2.0 * np.cos(2 * np.pi * ys / h + 0.5 * seed)
    )


def _oracle(gt_depths, scale=1.0):
    """infer_disp returning scale/gt resized to the network input size."""

    state = {"i": 0}

    def infer(images):
        gt = gt_depths[state["i"]]
        state["i"] += 1
        disp = scale / gt
        h, w = images.shape[1:3]
        return cv2.resize(disp, (w, h)).astype(np.float32)[None]

    return infer


@pytest.fixture(scope="module")
def eigen_tree(tmp_path_factory):
    """Tiny synthetic KITTI-raw tree + eigen dir (test_files + gt_depths)."""
    root = tmp_path_factory.mktemp("eigen")
    raw = root / "raw"
    eig = root / "eigen"
    eig.mkdir()
    rng = np.random.RandomState(0)
    lines = []
    gts = []
    for i in range(3):
        drive = f"2011_09_26/2011_09_26_drive_{i:04d}_sync"
        d = raw / drive / "image_02" / "data"
        d.mkdir(parents=True)
        img = rng.randint(0, 255, (96, 160, 3), np.uint8)
        cv2.imwrite(str(d / f"{i:010d}.png"), img)
        lines.append(f"{drive} {i:010d} l\n")
        gts.append(_smooth_depth(96, 160, seed=i))
    (eig / "test_files.txt").write_text("".join(lines))
    np.savez(
        eig / "gt_depths.npz", data=np.asarray(gts, dtype=object)
    )
    return str(raw), str(eig), gts


def test_eigen_oracle_near_zero_error(eigen_tree, capsys):
    raw, eig, gts = eigen_tree
    import io

    buf = io.StringIO()
    res = eigen_depth_eval(_Cfg(raw), _oracle(gts), eigen_dir=eig, file=buf)
    abs_rel, sq_rel, rms, log_rms, a1, a2, a3 = res
    assert abs_rel < 0.05 and a1 > 0.95, res
    out = buf.getvalue()
    assert "abs_rel" in out and "log_rms" in out  # reference table format


def test_eigen_median_scaling_removes_scale(eigen_tree):
    raw, eig, gts = eigen_tree
    r1 = eigen_depth_eval(_Cfg(raw), _oracle(gts, 1.0), eigen_dir=eig)
    r2 = eigen_depth_eval(_Cfg(raw), _oracle(gts, 2.0), eigen_dir=eig)
    # not bit-identical: resize_depths' 1/(disp + 1e-4) epsilon (reference
    # test.py:93) breaks pure scale invariance at the 4th decimal
    np.testing.assert_allclose(r1[:4], r2[:4], atol=5e-3)
    np.testing.assert_allclose(r1[4:], r2[4:], atol=1e-3)


def test_nyu_oracle_near_zero_error():
    rng = np.random.RandomState(1)
    n, h, w = 2, 480, 640
    images = rng.randint(0, 255, (n, 3, h, w), np.uint8)
    depths = np.stack([_smooth_depth(h, w, seed=i) for i in range(n)])
    crop_gts = [d[45:472, 41:602] for d in depths]

    import io

    buf = io.StringIO()
    res = nyu_depth_eval(
        _Cfg(None), _oracle(crop_gts), images, depths, file=buf
    )
    abs_rel, sq_rel, rms, log10, a1, a2, a3 = res
    assert abs_rel < 0.05 and a1 > 0.95, res
    assert "log10" in buf.getvalue()  # NYU header variant


def test_resize_depths_formula():
    gt = [np.ones((8, 10), np.float64)]
    disp = [np.full((4, 5), 2.0, np.float32)]
    depths, resized = resize_depths(gt, disp)
    assert depths[0].shape == (8, 10)
    np.testing.assert_allclose(depths[0], 1.0 / (2.0 + 1e-4))
    np.testing.assert_allclose(resized[0], 2.0)


def test_single_image_demo(tmp_path):
    img_path = str(tmp_path / "in.png")
    cv2.imwrite(
        img_path, np.random.RandomState(2).randint(0, 255, (96, 160, 3), np.uint8)
    )

    def infer(images):
        h, w = images.shape[1:3]
        return np.ones((1, h, w, 1), np.float32)

    disp, depth = single_image_demo(
        img_path, infer, IMG_HW, save_dir=str(tmp_path)
    )
    assert disp.shape == (96, 160)
    assert os.path.exists(str(tmp_path / "demo_depth.jpg"))
