"""KITTI flow evaluation: GT loading and EPE/outlier metrics.

Capability parity with /root/reference/core/evaluation/evaluate_flow.py:
ground-truth flow_occ/flow_noc PNG loading over a worker pool (:53-83),
per-image prediction rescaling from network resolution to GT resolution
(:107-112), average EPE over valid / non-occluded / occluded pixels, the
KITTI outlier rate (>3 px AND >5 % of GT magnitude, :85-90), optional
moving/static splits from object maps, and the same formatted result string
(:160-174) so training logs are drop-in comparable.
"""

from __future__ import annotations

import functools
import multiprocessing
import os

import numpy as np

from unopticalflow_tpu.evaluation.flowlib import flow_to_image, read_flow_png


def read_raw_calib_file(filepath: str) -> dict:
    """KITTI calib file -> dict of float arrays (non-float lines skipped)."""
    data = {}
    with open(filepath, "r") as f:
        for line in f.readlines():
            key, value = line.split(":", 1)
            try:
                data[key] = np.array([float(x) for x in value.split()])
            except ValueError:
                pass
    return data


def load_intrinsics_raw(calib_file: str) -> np.ndarray:
    filedata = read_raw_calib_file(calib_file)
    p_rect = filedata["P_rect_02"] if "P_rect_02" in filedata else filedata["P2"]
    return np.reshape(p_rect, (3, 4))[:3, :3]


def scale_intrinsics(mat: np.ndarray, sx: float, sy: float) -> np.ndarray:
    out = np.copy(mat)
    out[0, 0] *= sx
    out[0, 2] *= sx
    out[1, 1] *= sy
    out[1, 2] *= sy
    return out


def get_scaled_intrinsic_matrix(calib_file, zoom_x, zoom_y) -> np.ndarray:
    intr = scale_intrinsics(load_intrinsics_raw(calib_file), zoom_x, zoom_y)
    intr[0, 1] = intr[1, 0] = intr[2, 0] = intr[2, 1] = 0.0
    return intr


def _read_flow_gt_worker(dir_gt: str, i: int):
    occ = read_flow_png(os.path.join(dir_gt, "flow_occ", f"{i:06d}_10.png"))
    noc = read_flow_png(os.path.join(dir_gt, "flow_noc", f"{i:06d}_10.png"))
    return occ, noc[:, :, 2]


def load_gt_flow_kitti(
    gt_dataset_dir: str, mode: str, num_workers: int = 5, num_gt: int | None = None
):
    """Load KITTI 2012 (194) / 2015 (200) GT flows + noc masks in parallel.

    ``num_gt`` overrides the per-benchmark frame count (used by smoke tests
    that exercise the pipeline on a small synthetic fixture).
    """
    if num_gt is None:
        if mode == "kitti_2012":
            num_gt = 194
        elif mode == "kitti_2015":
            num_gt = 200
        else:
            raise ValueError(f"Mode {mode} not found.")

    fun = functools.partial(_read_flow_gt_worker, gt_dataset_dir)
    with multiprocessing.Pool(num_workers) as pool:
        results = list(pool.imap(fun, range(num_gt), chunksize=10))
    gt_flows = [r[0] for r in results]
    noc_masks = [r[1] for r in results]
    return gt_flows, noc_masks


def calculate_error_rate(epe_map, gt_flow, mask) -> float:
    """KITTI Fl outlier rate: EPE > 3 px AND > 5% of GT magnitude (:85-90)."""
    bad = np.logical_and(
        epe_map * mask > 3,
        epe_map * mask / np.maximum(
            np.sqrt(np.sum(np.square(gt_flow), axis=2)), 1e-10
        ) > 0.05,
    )
    return bad.sum() / mask.sum()


def eval_flow_avg(
    gt_flows,
    noc_masks,
    pred_flows,
    cfg,
    moving_masks=None,
    write_img: bool = False,
) -> str:
    """Average the per-image KITTI flow metrics; returns the formatted string.

    Predictions are (H_net, W_net, 2) at network resolution; each is vector-
    rescaled to GT resolution then bilinearly resized (:107-112).
    """
    import cv2

    error = error_noc = error_occ = error_rate = 0.0
    error_move = error_static = error_move_rate = error_static_rate = 0.0

    num = len(gt_flows)
    for i, (gt_flow, noc_mask, pred_flow) in enumerate(
        zip(gt_flows, noc_masks, pred_flows)
    ):
        h, w = gt_flow.shape[0:2]
        pred = np.copy(pred_flow)
        pred[:, :, 0] = pred[:, :, 0] / cfg.img_hw[1] * w
        pred[:, :, 1] = pred[:, :, 1] / cfg.img_hw[0] * h
        flo_pred = cv2.resize(pred, (w, h), interpolation=cv2.INTER_LINEAR)

        if write_img:
            out_dir = os.path.join(cfg.model_dir, "pred_flow")
            os.makedirs(out_dir, exist_ok=True)
            cv2.imwrite(
                os.path.join(out_dir, f"{i:06d}_10.png"), flow_to_image(flo_pred)
            )
            cv2.imwrite(
                os.path.join(out_dir, f"{i:06d}_10_gt.png"),
                flow_to_image(gt_flow[:, :, 0:2]),
            )
            cv2.imwrite(
                os.path.join(out_dir, f"{i:06d}_10_err.png"),
                flow_to_image(
                    (flo_pred - gt_flow[:, :, 0:2]) * gt_flow[:, :, 2:3]
                ),
            )

        epe_map = np.sqrt(
            np.sum(np.square(flo_pred[:, :, 0:2] - gt_flow[:, :, 0:2]), axis=2)
        )
        valid = gt_flow[:, :, 2]
        error += np.sum(epe_map * valid) / np.sum(valid)
        error_noc += np.sum(epe_map * noc_mask) / np.sum(noc_mask)
        error_occ += np.sum(epe_map * (valid - noc_mask)) / max(
            np.sum(valid - noc_mask), 1.0
        )
        error_rate += calculate_error_rate(epe_map, gt_flow[:, :, 0:2], valid)

        if moving_masks:
            move_mask = moving_masks[i]
            error_move_rate += calculate_error_rate(
                epe_map, gt_flow[:, :, 0:2], valid * move_mask
            )
            error_static_rate += calculate_error_rate(
                epe_map, gt_flow[:, :, 0:2], valid * (1.0 - move_mask)
            )
            error_move += np.sum(epe_map * valid * move_mask) / np.sum(
                valid * move_mask
            )
            error_static += np.sum(epe_map * valid * (1.0 - move_mask)) / np.sum(
                valid * (1.0 - move_mask)
            )

    if moving_masks:
        header = ("{:>10}, " * 7 + "{:>10} \n").format(
            "epe", "epe_noc", "epe_occ", "epe_move", "epe_static",
            "move_err_rate", "static_err_rate", "err_rate",
        )
        return header + ("{:10.4f}, " * 7 + "{:10.4f} \n").format(
            error / num, error_noc / num, error_occ / num, error_move / num,
            error_static / num, error_move_rate / num, error_static_rate / num,
            error_rate / num,
        )
    header = ("{:>10}, " * 3 + "{:>10} \n").format(
        "epe", "epe_noc", "epe_occ", "err_rate"
    )
    return header + ("{:10.4f}, " * 3 + "{:10.4f} \n").format(
        error / num, error_noc / num, error_occ / num, error_rate / num
    )


def load_gt_flow_sintel(training_dir: str, pass_name: str = "clean"):
    """Walk an MPI-Sintel ``training/`` tree and collect GT + image pairs.

    The reference ships no Sintel eval harness (it only trains on
    ``sintel_raw``); this completes that surface using the same metric
    pipeline as KITTI.  GT ``.flo`` fields (flow frame N -> N+1) live in
    ``training/flow/<scene>/frame_####.flo`` and pair with
    ``training/<pass>/<scene>/frame_####.png`` / ``frame_####+1.png``.
    ``training/occlusions`` masks, when present, define the noc split
    (noc = 1 - occluded); otherwise every pixel counts as non-occluded.

    Returns:
        (gt_flows, noc_masks, image_pairs): gt_flows are (H, W, 3) with an
        all-ones validity channel (Sintel GT is dense), matching the
        ``eval_flow_avg`` input convention; image_pairs are path tuples.
    """
    import cv2

    from unopticalflow_tpu.evaluation.flowlib import read_flow

    flow_root = os.path.join(training_dir, "flow")
    img_root = os.path.join(training_dir, pass_name)
    occ_root = os.path.join(training_dir, "occlusions")
    gt_flows, noc_masks, pairs = [], [], []
    if not os.path.isdir(flow_root) or not os.path.isdir(img_root):
        return gt_flows, noc_masks, pairs
    for scene in sorted(os.listdir(flow_root)):
        scene_dir = os.path.join(flow_root, scene)
        for fname in sorted(os.listdir(scene_dir)):
            if not fname.endswith(".flo"):
                continue
            num = int(fname[:-4].split("_")[-1])
            img1 = os.path.join(img_root, scene, f"frame_{num:04d}.png")
            img2 = os.path.join(img_root, scene, f"frame_{num + 1:04d}.png")
            if not (os.path.exists(img1) and os.path.exists(img2)):
                continue
            gt = read_flow(os.path.join(scene_dir, fname)).astype(np.float32)
            h, w = gt.shape[:2]
            gt_flows.append(
                np.concatenate([gt[:, :, :2], np.ones((h, w, 1), np.float32)], 2)
            )
            occ_path = os.path.join(occ_root, scene, f"frame_{num:04d}.png")
            if os.path.exists(occ_path):
                occ = (cv2.imread(occ_path, 0) > 127).astype(np.float32)
                noc_masks.append(1.0 - occ)
            else:
                noc_masks.append(np.ones((h, w), np.float32))
            pairs.append((img1, img2))
    return gt_flows, noc_masks, pairs
