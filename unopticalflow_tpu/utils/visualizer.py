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
        line = (
            "iter: {it}, loss_pixel: {loss_pixel:.6f}, loss_ssim: {loss_ssim:.6f}, "
            "loss_flow_smooth: {loss_flow_smooth:.6f}, "
            "loss_flow_consis: {loss_flow_consis:.6f}".format(it=iter_, **{
                k: vals.get(k, float("nan"))
                for k in (
                    "loss_pixel", "loss_ssim", "loss_flow_smooth", "loss_flow_consis"
                )
            })
        )
        # extension losses (e.g. flowposenet's epipolar term) append after
        # the reference's four, keeping the reference log prefix grep-stable
        for k in sorted(vals):
            if k not in (
                "loss_pixel", "loss_ssim", "loss_flow_smooth", "loss_flow_consis"
            ):
                line += f", {k}: {vals[k]:.6f}"
        print(line)


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

    # -- correspondence / epipolar-geometry tools --------------------------
    # (reference visualizer.py:56-92,120-182; file-name contract preserved:
    # <name>_img{1,2}_cor.png for correspondences, <name>_{1,2}eline.png for
    # epipolar overlays)

    _COLORS = (
        (0, 0, 255), (0, 255, 0), (255, 0, 0), (0, 255, 255),
        (255, 0, 255), (255, 255, 0), (128, 0, 255), (0, 128, 255),
    )

    def show_corres(self, img1, img2, match, name: str):
        """Draw matched points on both images.

        Args:
            img1/img2: (H, W, 3) uint8-compatible arrays.
            match: (4, N) rows [x1, y1, x2, y2].
        """
        import cv2

        match = np.asarray(match)
        outs = []
        for k, img in ((0, img1), (2, img2)):
            canvas = np.asarray(img, np.uint8).copy()  # never draw in place
            for i in range(match.shape[1]):
                x, y = int(round(match[k, i])), int(round(match[k + 1, i]))
                cv2.circle(canvas, (x, y), radius=1,
                           color=self._COLORS[i % len(self._COLORS)], thickness=2)
            outs.append(canvas)
        cv2.imwrite(self._path(name + "_img1_cor"), outs[0])
        cv2.imwrite(self._path(name + "_img2_cor"), outs[1])

    def draw_point_corres(self, img1, img2, match, name: str):
        self.show_corres(img1, img2, match, name)
        print("Correspondence Saved in " + self._path(name + "_img1_cor"))

    @staticmethod
    def drawlines(img1, img2, lines, pts1, pts2, rng=None):
        """Draw epilines (on img1) and their generating points (both images).

        lines: (N, 3) line coefficients (a, b, c) with ax + by + c = 0.
        """
        import cv2

        rng = rng or np.random
        img1 = np.asarray(img1, np.uint8).copy()  # never draw in place
        img2 = np.asarray(img2, np.uint8).copy()
        _, c = img1.shape[:2]
        for line, pt1, pt2 in zip(lines, pts1, pts2):
            color = tuple(int(v) for v in rng.randint(0, 255, 3))
            a, b, cc = line
            if abs(b) < 1e-12:
                continue
            x0, y0 = 0, int(-cc / b)
            x1, y1 = c, int(-(cc + a * c) / b)
            img1 = cv2.line(img1, (x0, y0), (x1, y1), color, 1)
            img1 = cv2.circle(img1, tuple(int(v) for v in pt1), 3, color, -1)
            img2 = cv2.circle(img2, tuple(int(v) for v in pt2), 3, color, -1)
        return img1, img2

    def show_epipolar_line(
        self, img1, img2, match, fundamental, name: str,
        convention: str = "x2Fx1",
    ):
        """Overlay the epipolar lines induced by F on both images.

        match: (4, N) rows [x1, y1, x2, y2]; fundamental: (3, 3).

        convention: ``"x2Fx1"`` (default) means F satisfies x2^T F x1 = 0
        (cv2.computeCorrespondEpilines convention); pass ``"x1Fx2"`` for an
        F with x1^T F x2 = 0 — which is what
        ``ops.geometry.fundamental_from_pose`` returns — and it is transposed
        internally so the two images' epilines are not silently swapped.
        """
        import cv2

        if convention not in ("x2Fx1", "x1Fx2"):
            raise ValueError(f"unknown F convention: {convention!r}")
        match = np.asarray(match, np.float32)
        f = np.asarray(fundamental, np.float64)
        if convention == "x1Fx2":
            f = f.T
        pts1 = match[:2].T
        pts2 = match[2:].T
        lines1 = cv2.computeCorrespondEpilines(
            pts2.reshape(-1, 1, 2), 2, f
        ).reshape(-1, 3)
        out1, _ = self.drawlines(img1, img2, lines1, pts1, pts2)
        lines2 = cv2.computeCorrespondEpilines(
            pts1.reshape(-1, 1, 2), 1, f
        ).reshape(-1, 3)
        out2, _ = self.drawlines(img2, img1, lines2, pts2, pts1)
        cv2.imwrite(self._path(name + "_1eline"), out1)
        cv2.imwrite(self._path(name + "_2eline"), out2)

    def draw_epipolar_line(self, img1, img2, match, fundamental, name: str):
        self.show_epipolar_line(img1, img2, match, fundamental, name)
        print("Epipolar Lines Saved in " + self._path(name + "_1eline"))

    # -- 3D ray plotting (reference visualizer.py:154-182) -----------------

    @staticmethod
    def visualize_points(ax, points):
        ax.plot3D(points[:, 0], points[:, 1], points[:, 2])

    @staticmethod
    def scatter_3d(ax, point, scatter_color="r"):
        ax.scatter(point[0], point[1], point[2], c=scatter_color)

    def show_ray(self, ax, intrinsics, extrinsics, point2d):
        """Plot the camera ray through a pixel; returns its direction."""
        k_inv = np.linalg.inv(intrinsics)
        rot, t = extrinsics[:, :3], extrinsics[:, 3]
        direction = rot.T @ k_inv @ np.array([point2d[0], point2d[1], 1.0])
        direction = direction / (np.linalg.norm(direction) + 1e-12)
        origin = -rot.T @ t
        pts = origin[None] + np.linspace(0.0, 100.0, 1000)[:, None] * direction[None]
        self.visualize_points(ax, pts)
        self.scatter_3d(ax, pts[0], scatter_color="r")
        return direction

    def visualize_two_rays(self, ax, match, proj1, proj2):
        """Plot the two rays of a correspondence; returns their dot product."""
        intrinsics = proj1[:, :3]  # proj1 assumed [K | 0]
        k_inv = np.linalg.inv(intrinsics)
        rt1, rt2 = k_inv @ proj1, k_inv @ proj2
        x1, y1, x2, y2 = np.asarray(match, np.float64)
        d1 = self.show_ray(ax, intrinsics, rt1, [x1, y1])
        d2 = self.show_ray(ax, intrinsics, rt2, [x2, y2])
        return float(np.dot(d1.squeeze(), d2.squeeze()))
