"""Optical-flow file I/O and visualization (host-side numpy).

Capability parity with /root/reference/core/evaluation/flowlib.py:
Middlebury ``.flo`` read/write (:84-105,148-170), KITTI 16-bit PNG flow
read/write with the (value - 2^15)/64 encoding and validity channel
(:107-145), KITTI disparity PNG I/O (value/256), average-EPE utility (:203+),
and the Middlebury color-wheel flow rendering (:258+).

PNG I/O uses OpenCV (16-bit, BGR channel order) instead of the reference's
row-by-row pypng loops — identical arrays, ~100x faster decode.
"""

from __future__ import annotations

import numpy as np

TAG_FLOAT = 202021.25  # .flo magic


def read_flow(filename: str) -> np.ndarray:
    """Read a Middlebury .flo file -> (H, W, 2) float32."""
    with open(filename, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)
        if magic.size == 0 or magic[0] != np.float32(TAG_FLOAT):
            raise ValueError(f"{filename}: invalid .flo magic {magic}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flow(flow: np.ndarray, filename: str) -> None:
    """Write (H, W, 2) flow as Middlebury .flo."""
    h, w = flow.shape[:2]
    with open(filename, "wb") as f:
        np.array([TAG_FLOAT], np.float32).tofile(f)
        np.array([w, h], np.int32).tofile(f)
        flow[:, :, :2].astype(np.float32).tofile(f)


def read_flow_png(flow_file: str) -> np.ndarray:
    """Read a KITTI 16-bit flow PNG -> (H, W, 3) float64 [u, v, valid].

    Encoding: u/v = (uint16 - 2^15) / 64, third channel = validity; invalid
    pixels are zeroed (flowlib.py:107-128).
    """
    import cv2

    raw = cv2.imread(flow_file, cv2.IMREAD_UNCHANGED)
    if raw is None:
        raise FileNotFoundError(flow_file)
    raw = raw.astype(np.float64)
    flow = np.zeros_like(raw)
    flow[:, :, 0] = (raw[:, :, 2] - 2.0**15) / 64.0  # R channel = u (BGR read)
    flow[:, :, 1] = (raw[:, :, 1] - 2.0**15) / 64.0  # G channel = v
    flow[:, :, 2] = raw[:, :, 0]  # B channel = valid
    invalid = flow[:, :, 2] == 0
    flow[invalid, 0] = 0
    flow[invalid, 1] = 0
    return flow


def write_flow_png(flo: np.ndarray, flow_file: str) -> None:
    """Write (H, W, >=2) flow to the KITTI 16-bit PNG encoding."""
    import cv2

    h, w = flo.shape[:2]
    enc = np.ones((h, w, 3), dtype=np.uint16)
    u = np.clip(flo[:, :, 0] * 64.0 + 2.0**15, 0, 2**16 - 1)
    v = np.clip(flo[:, :, 1] * 64.0 + 2.0**15, 0, 2**16 - 1)
    enc[:, :, 2] = u.astype(np.uint16)  # R (cv2 writes BGR)
    enc[:, :, 1] = v.astype(np.uint16)  # G
    if flo.shape[2] > 2:
        enc[:, :, 0] = flo[:, :, 2].astype(np.uint16)
    cv2.imwrite(flow_file, enc)


def read_disp_png(disp_file: str) -> np.ndarray:
    """KITTI disparity PNG -> (H, W) float (uint16 / 256)."""
    import cv2

    raw = cv2.imread(disp_file, cv2.IMREAD_UNCHANGED)
    if raw is None:
        raise FileNotFoundError(disp_file)
    if raw.ndim == 3:
        raw = raw[:, :, 0]
    return raw.astype(np.float64) / 256.0


def write_disp_png(disp: np.ndarray, disp_file: str) -> None:
    import cv2

    cv2.imwrite(disp_file, np.clip(disp * 256.0, 0, 2**16 - 1).astype(np.uint16))


def flow_error(tu, tv, u, v) -> float:
    """Average EPE over pixels with |gt| > 0 (flowlib.py:203+ semantics)."""
    tu, tv, u, v = (np.asarray(a, np.float64) for a in (tu, tv, u, v))
    valid = (np.abs(tu) > 0) | (np.abs(tv) > 0)
    epe = np.sqrt((u - tu) ** 2 + (v - tv) ** 2)
    return float(epe[valid].mean()) if valid.any() else 0.0


# ---------------------------------------------------------------------------
# Middlebury color wheel rendering
# ---------------------------------------------------------------------------

_UNKNOWN_THRESH = 1e7


def make_color_wheel() -> np.ndarray:
    """(55, 3) RGB color wheel (Middlebury convention)."""
    ry, yg, gc, cb, bm, mr = 15, 6, 4, 11, 13, 6
    wheel = np.zeros((ry + yg + gc + cb + bm + mr, 3))
    col = 0
    # RY
    wheel[0:ry, 0] = 255
    wheel[0:ry, 1] = np.floor(255 * np.arange(ry) / ry)
    col += ry
    # YG
    wheel[col : col + yg, 0] = 255 - np.floor(255 * np.arange(yg) / yg)
    wheel[col : col + yg, 1] = 255
    col += yg
    # GC
    wheel[col : col + gc, 1] = 255
    wheel[col : col + gc, 2] = np.floor(255 * np.arange(gc) / gc)
    col += gc
    # CB
    wheel[col : col + cb, 1] = 255 - np.floor(255 * np.arange(cb) / cb)
    wheel[col : col + cb, 2] = 255
    col += cb
    # BM
    wheel[col : col + bm, 2] = 255
    wheel[col : col + bm, 0] = np.floor(255 * np.arange(bm) / bm)
    col += bm
    # MR
    wheel[col : col + mr, 2] = 255 - np.floor(255 * np.arange(mr) / mr)
    wheel[col : col + mr, 0] = 255
    return wheel


def compute_color(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Map normalized flow components to the color wheel -> (H, W, 3) uint8."""
    wheel = make_color_wheel()
    ncols = wheel.shape[0]
    nan = np.isnan(u) | np.isnan(v)
    u = np.where(nan, 0, u)
    v = np.where(nan, 0, v)

    rad = np.sqrt(u**2 + v**2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0

    img = np.zeros(u.shape + (3,), dtype=np.uint8)
    for c in range(3):
        col0 = wheel[k0, c] / 255.0
        col1 = wheel[k1, c] / 255.0
        col = (1 - f) * col0 + f * col1
        small = rad <= 1
        col = np.where(small, 1 - rad * (1 - col), col * 0.75)
        img[:, :, c] = np.where(nan, 0, np.floor(255 * col)).astype(np.uint8)
    return img


def flow_to_image(flow: np.ndarray) -> np.ndarray:
    """(H, W, >=2) flow -> (H, W, 3) uint8 color-wheel visualization."""
    u = flow[:, :, 0].astype(np.float64).copy()
    v = flow[:, :, 1].astype(np.float64).copy()
    unknown = (np.abs(u) > _UNKNOWN_THRESH) | (np.abs(v) > _UNKNOWN_THRESH)
    u[unknown] = 0
    v[unknown] = 0
    rad = np.sqrt(u**2 + v**2)
    maxrad = max(-1.0, float(rad.max()))
    u = u / (maxrad + np.finfo(float).eps)
    v = v / (maxrad + np.finfo(float).eps)
    img = compute_color(u, v)
    img[unknown] = 0
    return img
