"""Depth-evaluation harnesses (Eigen / NYU / single-image demo).

The reference ships these as DEAD code: its ``test_eigen_depth`` /
``test_nyu`` / ``test_single_image`` (/root/reference/test.py:99-198) call
``model.infer_depth`` on model classes that either don't exist in the repo
(``Model_depth_pose``, ``Model_flowposenet`` — test.py:236-242 raises
NameError) or don't define the method (``Model_flow``), so none of them ever
ran.  This module is the working equivalent: the same protocols (Eigen split
file walk + gt_depths.npz, NYU labeled-mat crop, disp→depth resizing,
median-scaled monodepth metrics via evaluation/evaluate_depth.py) decoupled
from any model class — they accept ANY depth-predicting callable

    infer_disp(images: (B, H, W, 3) float32 in [0, 1]) -> (B, H, W[, 1]) disp

so a future depth head (or a wrapped third-party model) can be evaluated
against the reference protocol immediately.  ``--mode depth`` in test.py
still raises (no depth model exists anywhere, here or in the reference);
the error message points at this harness.
"""

from __future__ import annotations

import os
import sys

import numpy as np

from unopticalflow_tpu.evaluation.evaluate_depth import eval_depth

_METRIC_HEADER = (
    "{:>10}, {:>10}, {:>10}, {:>10}, {:>10}, {:>10}, {:>10} \n"
)
_METRIC_ROW = (
    "{:10.4f}, {:10.4f}, {:10.3f}, {:10.3f}, {:10.3f}, {:10.3f}, {:10.3f} \n"
)


def _as_disp_hw(disp) -> np.ndarray:
    """(H, W[, 1]) prediction -> (H, W) float32."""
    d = np.asarray(disp, np.float32)
    if d.ndim == 3:
        d = d[..., 0]
    return d


def resize_depths(gt_depth_list, pred_disp_list):
    """Resize each predicted disparity to its GT frame and invert to depth
    (reference test.py:85-97: depth = 1 / (disp + 1e-4))."""
    import cv2

    pred_depth_list, pred_disp_resized = [], []
    for gt, disp in zip(gt_depth_list, pred_disp_list):
        h, w = gt.shape[:2]
        d = cv2.resize(_as_disp_hw(disp), (w, h))
        pred_depth_list.append(1.0 / (d + 1e-4))
        pred_disp_resized.append(d)
    return pred_depth_list, pred_disp_resized


def resize_disp(pred_disp_list, gt_depths):
    """NYU variant (reference test.py:130-139); the 1e-6 floor guards the
    reference's unprotected 1/disp against zero-disparity predictions."""
    import cv2

    h, w = gt_depths[0].shape[:2]
    out = []
    for disp in pred_disp_list:
        d = cv2.resize(_as_disp_hw(disp), (w, h))
        out.append(1.0 / (d + 1e-6))
    return out


def _print_metrics(res, nyu: bool = False, file=None) -> None:
    f = file or sys.stderr
    abs_rel, sq_rel, rms, log_rms, a1, a2, a3 = res
    f.write(_METRIC_HEADER.format(
        "abs_rel", "sq_rel", "rms", "log10" if nyu else "log_rms",
        "a1", "a2", "a3",
    ))
    f.write(_METRIC_ROW.format(abs_rel, sq_rel, rms, log_rms, a1, a2, a3))


def test_eigen_depth(cfg, infer_disp, eigen_dir: str = "data/eigen",
                     file=None):
    """Eigen-split KITTI depth eval (reference test.py:99-127, working).

    Args:
        cfg: config with ``raw_base_dir`` (KITTI raw root) and ``img_hw``.
        infer_disp: any depth-predicting callable (module docstring contract).
        eigen_dir: directory holding ``test_files.txt`` + ``gt_depths.npz``
            (the vendored split lives at data/eigen/; gt_depths.npz is the
            standard Eigen GT export, not redistributable here).

    Returns:
        (abs_rel, sq_rel, rms, log_rms, a1, a2, a3)
    """
    import cv2

    filenames = open(os.path.join(eigen_dir, "test_files.txt")).readlines()
    h, w = int(cfg.img_hw[0]), int(cfg.img_hw[1])
    pred_disp_list = []
    for line in filenames:
        path1, idx = line.strip().split(" ")[:2]
        img_path = os.path.join(
            cfg.raw_base_dir, path1, "image_02", "data", f"{idx}.png"
        )
        img = cv2.imread(img_path)
        if img is None:
            raise FileNotFoundError(img_path)
        inp = cv2.resize(img, (w, h)).astype(np.float32)[None] / 255.0
        pred_disp_list.append(_as_disp_hw(np.asarray(infer_disp(inp))[0]))

    gt_depths = np.load(
        os.path.join(eigen_dir, "gt_depths.npz"), allow_pickle=True
    )["data"]
    pred_depths, _ = resize_depths(gt_depths, pred_disp_list)
    res = eval_depth(gt_depths, pred_depths)
    _print_metrics(res, nyu=False, file=file)
    return res


def load_nyu_test_data(data_dir: str):
    """Official NYUv2 test split from the labeled mat (test.py:143-154).

    Returns (images (N, 3, H, W) uint8, depths (N, H, W) float)."""
    import h5py
    import scipy.io as sio

    data = h5py.File(os.path.join(data_dir, "nyu_depth_v2_labeled.mat"), "r")
    splits = sio.loadmat(os.path.join(data_dir, "splits.mat"))
    test = np.array(splits["testNdxs"]).squeeze(1)
    images = np.transpose(data["images"], [0, 1, 3, 2])
    depths = np.transpose(data["depths"], [0, 2, 1])
    return images[test - 1], depths[test - 1]


def test_nyu(cfg, infer_disp, test_images, test_gt_depths, file=None):
    """NYUv2 depth eval with the reference crop (test.py:155-184, working).

    Args:
        test_images: (N, 3, H, W) uint8 (the labeled-mat layout that
            ``load_nyu_test_data`` returns).
        test_gt_depths: (N, H, W) metric depths.
    """
    import cv2

    h, w = int(cfg.img_hw[0]), int(cfg.img_hw[1])
    pred_disp_list, crop_gt_depths = [], []
    for img, gt in zip(test_images, test_gt_depths):
        img_crop = np.transpose(img[:, 45:472, 41:602], [1, 2, 0])
        crop_gt_depths.append(np.asarray(gt)[45:472, 41:602])
        inp = cv2.resize(img_crop.astype(np.float32), (w, h))[None] / 255.0
        pred_disp_list.append(_as_disp_hw(np.asarray(infer_disp(inp))[0]))

    pred_depths = resize_disp(pred_disp_list, crop_gt_depths)
    res = eval_depth(crop_gt_depths, pred_depths, nyu=True)
    _print_metrics(res, nyu=True, file=file)
    return res


def test_single_image(img_path, infer_disp, training_hw, save_dir="./"):
    """Single-image depth demo: predict, resize back, save a colormapped
    disparity (reference test.py:185-198, working)."""
    import cv2

    from unopticalflow_tpu.utils.visualizer import VisualizerDebug

    img = cv2.imread(img_path)
    if img is None:
        raise FileNotFoundError(img_path)
    h, w = img.shape[:2]
    inp = cv2.resize(
        img, (int(training_hw[1]), int(training_hw[0]))
    ).astype(np.float32)[None] / 255.0
    disp = _as_disp_hw(np.asarray(infer_disp(inp))[0])
    disp_resized = cv2.resize(disp, (w, h))
    depth = 1.0 / (1e-6 + disp_resized)

    visualizer = VisualizerDebug(dump_dir=save_dir)
    visualizer.save_disp_color_img(disp_resized, name="demo")
    print("Depth prediction saved in " + save_dir)
    return disp_resized, depth
