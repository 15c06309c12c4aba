"""Build an on-disk KITTI-style prepared dir from the synthetic generator.

Writes N stacked (3H, W, 3) uint8 PNG triplets in the exact layout
``data/preparers.py`` produces and ``data/datasets.py::KITTI_Prepared``
consumes (reference layout: /root/reference/core/dataset/kitti_prepared.py),
plus train.txt and a calib file.  This is the fixture for driving REAL
``train.py`` iterations — full host pipeline (PNG decode -> resize -> augment
-> batch -> H2D) — at production shape without KITTI downloads
(reference recipe: /root/reference/train.py:110-155, config/kitti.yaml).

Usage:
    python benchmarks/make_prepared_synth.py --out /tmp/prep832 \
        --n 200 --hw 256 832
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

from benchmarks.synthetic_epe import make_snippet


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=200)
    p.add_argument("--hw", type=int, nargs=2, default=(256, 832))
    p.add_argument("--max-bg", type=int, default=16)
    p.add_argument("--max-fg", type=int, default=32)
    p.add_argument("--tex-power", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    h, w = args.hw
    drive = os.path.join(args.out, "2011_09_26", "drive_0001")
    os.makedirs(drive, exist_ok=True)
    rng = np.random.RandomState(args.seed)
    lines = []
    for i in range(args.n):
        stacked, _, _ = make_snippet(
            rng, h, w, max_bg=args.max_bg, max_fg=args.max_fg,
            tex_power=args.tex_power,
        )
        u8 = np.clip(stacked * 255.0 + 0.5, 0, 255).astype(np.uint8)
        name = f"{i:010d}.png"
        Image.fromarray(u8).save(os.path.join(drive, name))
        lines.append(
            f"2011_09_26/drive_0001/{name} 2011_09_26/calib_cam_to_cam.txt\n"
        )
        if (i + 1) % 25 == 0:
            print(f"{i + 1}/{args.n}", flush=True)
    with open(
        os.path.join(args.out, "2011_09_26", "calib_cam_to_cam.txt"), "w"
    ) as f:
        # fx 0 cx 0 / 0 fy cy 0 / 0 0 1 0 — shape-consistent with the real
        # P_rect_02 lines the preparers emit
        f.write(
            "P_rect_02: 700.0 0.0 416.0 0.0 0.0 700.0 128.0 0.0 "
            "0.0 0.0 1.0 0.0\n"
        )
    with open(os.path.join(args.out, "train.txt"), "w") as f:
        f.writelines(lines)
    print("done:", args.out)


if __name__ == "__main__":
    main()
