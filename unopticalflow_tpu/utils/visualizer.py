"""Loss logging and debug-image dumping.

Parity with /root/reference/core/visualize/visualizer.py: ``Visualizer``
accumulates log packs and pickles them to ``log.pkl`` (:23-30), and prints the
four flow losses every ``log_interval`` (:32-48).  ``VisualizerDebug`` keeps
the subset of image dumpers that the live flow path can use (mask/image/flow
dumps); the depth-colormap and epipolar-geometry dumpers exist for the eval
utilities.
"""

from __future__ import annotations

import os
import pickle

import numpy as np


class Visualizer:
    def __init__(self, loss_weights_dict, dump_dir: str | None = None):
        self.loss_weights_dict = loss_weights_dict
        self.dump_dir = dump_dir
        self.log_list = []

    def add_log_pack(self, log_pack):
        self.log_list.append(log_pack)

    def dump_log(self, fname: str | None = None):
        fname = fname or self.dump_dir
        with open(fname, "wb") as f:
            pickle.dump(self.log_list, f)

    def print_loss(self, loss_pack, iter_=None):
        vals = {k: float(np.mean(np.asarray(v))) for k, v in loss_pack.items()}
        print(
            "iter: {it}, loss_pixel: {loss_pixel:.6f}, loss_ssim: {loss_ssim:.6f}, "
            "loss_flow_smooth: {loss_flow_smooth:.6f}, "
            "loss_flow_consis: {loss_flow_consis:.6f}".format(it=iter_, **{
                k: vals.get(k, float("nan"))
                for k in (
                    "loss_pixel", "loss_ssim", "loss_flow_smooth", "loss_flow_consis"
                )
            })
        )


class VisualizerDebug:
    """Image dumpers for debugging (visualizer.py:50-182 subset)."""

    def __init__(self, dump_dir: str | None = None):
        self.dump_dir = dump_dir
        if dump_dir:
            os.makedirs(dump_dir, exist_ok=True)

    def _path(self, name: str, suffix: str = ".png") -> str:
        return os.path.join(self.dump_dir, name + suffix)

    def save_img(self, img, name: str):
        import cv2

        cv2.imwrite(self._path(name), np.asarray(img))

    def show_mask(self, mask, name: str):
        import cv2

        mask = np.asarray(mask, dtype=np.float64)
        mask = mask / max(mask.max(), 1e-12) * 255.0
        cv2.imwrite(self._path(name), mask)

    def save_depth_img(self, depth, name: str):
        import cv2

        depth = np.asarray(depth, dtype=np.float64)
        dmin, dmax = depth.min(), depth.max()
        norm = (depth - dmin) / max(dmax - dmin, 1e-12) * 255.0
        cv2.imwrite(self._path(name + "_depth"), norm.astype(np.uint8))

    def save_flow_img(self, flow, name: str):
        """Color-wheel visualization of a (H, W, 2) flow field."""
        import cv2

        from unopticalflow_tpu.evaluation.flowlib import flow_to_image

        cv2.imwrite(self._path(name + "_flow"), flow_to_image(np.asarray(flow)))

    def save_disp_color_img(self, disp, name: str):
        import matplotlib.cm as cm
        import matplotlib.colors as mcolors
        from PIL import Image

        disp = np.asarray(disp, dtype=np.float64)
        vmax = np.percentile(disp, 95)
        normalizer = mcolors.Normalize(vmin=disp.min(), vmax=vmax)
        mapper = cm.ScalarMappable(norm=normalizer, cmap="magma")
        colormapped = (mapper.to_rgba(disp)[:, :, :3] * 255).astype(np.uint8)
        Image.fromarray(colormapped).save(self._path(name + "_depth", ".jpg"))
