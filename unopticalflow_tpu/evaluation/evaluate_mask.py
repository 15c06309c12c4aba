"""Moving-object mask loading and segmentation metrics.

Capability parity with /root/reference/core/evaluation/evaluate_mask.py:
KITTI-2015 ``obj_map`` mask loading over a worker pool binarized at >0
(:199-213), and the py_img_seg_eval metric set (pixel accuracy, mean
accuracy, mean IU, frequency-weighted IU, :20-132) driving ``eval_mask``
(:216-252).  Implemented with vectorized confusion counts instead of per-class
mask stacks — identical values.
"""

from __future__ import annotations

import functools
import multiprocessing
import os

import numpy as np


class EvalSegErr(Exception):
    pass


def _check_size(a, b):
    if a.shape[:2] != b.shape[:2]:
        raise EvalSegErr("DiffDim: Different dimensions of matrices!")


def _class_stats(eval_segm, gt_segm, classes):
    """Per-class (n_ii, t_i, n_ij): intersection, gt count, pred count."""
    stats = []
    for c in classes:
        e = eval_segm == c
        g = gt_segm == c
        stats.append((np.logical_and(e, g).sum(), g.sum(), e.sum()))
    return stats


def pixel_accuracy(eval_segm, gt_segm) -> float:
    _check_size(eval_segm, gt_segm)
    classes = np.unique(gt_segm)
    stats = _class_stats(eval_segm, gt_segm, classes)
    sum_nii = sum(s[0] for s in stats)
    sum_ti = sum(s[1] for s in stats)
    return 0 if sum_ti == 0 else sum_nii / sum_ti


def mean_accuracy(eval_segm, gt_segm) -> float:
    _check_size(eval_segm, gt_segm)
    classes = np.unique(gt_segm)
    stats = _class_stats(eval_segm, gt_segm, classes)
    acc = [nii / ti if ti != 0 else 0 for nii, ti, _ in stats]
    return float(np.mean(acc))


def mean_IU(eval_segm, gt_segm):
    _check_size(eval_segm, gt_segm)
    classes = np.union1d(np.unique(eval_segm), np.unique(gt_segm))
    n_cl_gt = len(np.unique(gt_segm))
    iu = []
    for nii, ti, nij in _class_stats(eval_segm, gt_segm, classes):
        iu.append(0.0 if (nij == 0 or ti == 0) else nii / (ti + nij - nii))
    return float(np.sum(iu) / n_cl_gt), np.array(iu)


def frequency_weighted_IU(eval_segm, gt_segm) -> float:
    _check_size(eval_segm, gt_segm)
    classes = np.union1d(np.unique(eval_segm), np.unique(gt_segm))
    total = 0.0
    for nii, ti, nij in _class_stats(eval_segm, gt_segm, classes):
        if nij == 0 or ti == 0:
            continue
        total += (ti * nii) / (ti + nij - nii)
    return total / (eval_segm.shape[0] * eval_segm.shape[1])


def _read_mask_gt_worker(gt_dataset_dir: str, idx: int):
    import cv2

    return cv2.imread(os.path.join(gt_dataset_dir, "obj_map", f"{idx:06d}_10.png"), -1)


def load_gt_mask(gt_dataset_dir: str, num_gt: int = 200, num_workers: int = 5):
    """KITTI-2015 moving-object masks, binarized at > 0 (:199-213)."""
    fun = functools.partial(_read_mask_gt_worker, gt_dataset_dir)
    with multiprocessing.Pool(num_workers) as pool:
        results = list(pool.imap(fun, range(num_gt), chunksize=10))
    gt_masks = []
    for m in results:
        m = np.asarray(m)
        gt_masks.append((m > 0.0).astype(m.dtype))
    return gt_masks


def eval_mask(pred_masks, gt_masks, opt):
    """Average segmentation metrics over the dataset; dumps binarized preds."""
    import cv2
    import matplotlib.pyplot as plt

    grey_cmap = plt.get_cmap("Greys")
    out_dir = os.path.join(opt.trace, "pred_mask")
    os.makedirs(out_dir, exist_ok=True)

    pa = ma = miu = fwiu = 0.0
    iu = np.array([0.0, 0.0])
    num_total = len(gt_masks)
    for i in range(num_total):
        gt = gt_masks[i]
        h, w = gt.shape[:2]
        pred = cv2.resize(pred_masks[i], (w, h), interpolation=cv2.INTER_LINEAR)
        pred = (pred >= 0.5).astype(np.float64)

        cv2.imwrite(os.path.join(out_dir, f"{i:06d}_10_plot.png"), grey_cmap(pred))
        cv2.imwrite(os.path.join(out_dir, f"{i:06d}_10.png"), pred)

        pa += pixel_accuracy(pred, gt)
        ma += mean_accuracy(pred, gt)
        m, u = mean_IU(pred, gt)
        miu += m
        iu = iu + u
        fwiu += frequency_weighted_IU(pred, gt)

    n = float(num_total)
    return pa / n, ma / n, miu / n, fwiu / n, iu / n
