"""Host input-pipeline throughput: can the loader feed the device?

The device trains at ~120 snippets/s at the KITTI recipe (BENCH_r03/r04);
every one of those snippets must come off disk as a stacked 3-frame PNG at
raw KITTI resolution, be decoded, split, resized to 256x832, flipped and
normalized (datasets.py, reference kitti_prepared.py:133-153).  A device 6x
faster than baseline that stalls on input is not 6x faster — this benchmark
measures what the host actually sustains:

  * BatchLoader thread-pool decode path (reference DataLoader(num_workers=4)
    semantics, /root/reference/train.py:110) at 1 and 4 workers,
  * the --cache_decoded path (decoded+resized uint8 .npy, mmap reads) that
    turns repeat visits of the finite dataset into memcpys.

Builds its own synthetic prepared dir at raw KITTI scale (textured frames so
PNG decode cost is realistic) — no dataset download.  Prints one JSON line.

Usage: PYTHONPATH=. python benchmarks/loader_bench.py [--snippets 48]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


RAW_H, RAW_W = 370, 1226  # KITTI raw camera frames (rounded)


def build_prepared_dir(root: str, n: int) -> str:
    """Synthetic prepared dir: n stacked (3*RAW_H, RAW_W) textured PNGs."""
    import cv2

    from synthetic_epe import _texture

    drive = os.path.join(root, "2011_09_26", "drive_0001")
    os.makedirs(drive, exist_ok=True)
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n):
        tex = _texture(rng, 3 * RAW_H, RAW_W, octaves=6)
        img = np.round(tex * 255.0).astype(np.uint8)
        name = f"{i:010d}.png"
        cv2.imwrite(os.path.join(drive, name), img)
        lines.append(
            f"2011_09_26/drive_0001/{name} 2011_09_26/calib_cam_to_cam.txt\n"
        )
    os.makedirs(os.path.join(root, "2011_09_26"), exist_ok=True)
    with open(os.path.join(root, "2011_09_26", "calib_cam_to_cam.txt"), "w") as f:
        f.write(
            "P_rect_02: 700.0 0.0 600.0 0.0 0.0 700.0 180.0 0.0 0.0 0.0 1.0 0.0\n"
        )
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.writelines(lines)
    return root


def measure(dataset, batch: int, workers: int, n_batches: int) -> float:
    """Sustained snippets/s over n_batches (after a 2-batch warmup)."""
    from unopticalflow_tpu.data.loader import BatchLoader

    loader = BatchLoader(dataset, batch_size=batch, num_workers=workers)
    it = iter(loader)
    for _ in range(2):
        next(it)
    t0 = time.time()
    done = 0
    for _ in range(n_batches):
        b = next(it)
        done += (b[0] if isinstance(b, tuple) else b).shape[0]
    dt = time.time() - t0
    # drain so the producer thread stops cleanly
    it.close()
    return done / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--snippets", type=int, default=48)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--batches", type=int, default=30)
    p.add_argument("--dir", default="/tmp/unflow_loader_bench")
    p.add_argument("--device-rate", type=float, default=120.6,
                   help="device snippets/s to compare against (BENCH_r04)")
    args = p.parse_args()

    from unopticalflow_tpu.data.datasets import KITTI_Prepared

    if not os.path.exists(os.path.join(args.dir, "train.txt")):
        print(f"building {args.snippets}-snippet prepared dir (raw KITTI "
              "scale) ...", flush=True)
        build_prepared_dir(args.dir, args.snippets)

    n_samples = (args.batches + 4) * args.batch  # len(ds) = num_iterations
    mk = lambda cache, u8=False: KITTI_Prepared(  # noqa: E731
        args.dir, img_hw=(256, 832), num_iterations=n_samples,
        cache_dir=os.path.join(args.dir, "decoded_cache_256x832")
        if cache else None,
        emit_uint8=u8,
    )

    res = {
        "benchmark": "host input pipeline (stacked-PNG decode -> 256x832)",
        "host_cpus": os.cpu_count(),
        "raw_frame_hw": [RAW_H, RAW_W],
        "batch": args.batch,
    }
    res["decode_w1_snippets_per_s"] = round(
        measure(mk(False), args.batch, 1, args.batches), 1
    )
    res["decode_w4_snippets_per_s"] = round(
        measure(mk(False), args.batch, 4, args.batches), 1
    )
    # cache fill pass (decode each source file once), then the mmap path
    ds = mk(True)
    t0 = time.time()
    for i in range(ds.count()):
        ds._resized_uint8(i)
    res["cache_fill_s"] = round(time.time() - t0, 1)
    res["cached_w4_snippets_per_s"] = round(
        measure(mk(True), args.batch, 4, args.batches), 1
    )
    # uint8 emission (train.py default): the /255 f32 cast runs on device
    # (train_step._loss_fn), so the host touches 4x fewer bytes per batch
    res["cached_w4_uint8_snippets_per_s"] = round(
        measure(mk(True, u8=True), args.batch, 4, args.batches), 1
    )
    res["device_rate_snippets_per_s"] = args.device_rate
    best = max(
        res["decode_w4_snippets_per_s"],
        res["cached_w4_snippets_per_s"],
        res["cached_w4_uint8_snippets_per_s"],
    )
    res["sustains_device_rate"] = bool(best >= args.device_rate)
    res["recipe_note"] = (
        "--cache_decoded required on few-core hosts"
        if res["decode_w4_snippets_per_s"] < args.device_rate
        else "raw decode path sufficient"
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
