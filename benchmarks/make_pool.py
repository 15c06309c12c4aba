"""Pre-generate a synthetic-EPE snippet pool file (no TPU/JAX import).

Builds the exact array ``benchmarks/synthetic_epe.py --pool N --pool-file F``
would build (same generator, same RandomState(0) stream), so a later TPU run
loads it instead of generating on the fly — on the 1-core host this moves
~15 min of numpy generation out of the TPU-holding process.  The campaign
uses float32 pools (the r04 uint8 pool both quantized away sub-pixel signal
and was too small at 2000 snippets; see synth_epe_r04/README.md p10 probes).

Usage:
    python benchmarks/make_pool.py --out /tmp/p832_pool.npy --n 6000 \
        --hw 256 832 --max-bg 16 --max-fg 32 --tex-power 1.0
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from benchmarks.synthetic_epe import make_snippet


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, required=True)
    p.add_argument("--hw", type=int, nargs=2, default=(256, 832))
    p.add_argument("--max-bg", type=int, default=16)
    p.add_argument("--max-fg", type=int, default=32)
    p.add_argument("--tex-power", type=float, default=1.0)
    p.add_argument("--dtype", choices=["float32", "uint8"], default="float32")
    args = p.parse_args()

    h, w = args.hw
    rng = np.random.RandomState(0)  # matches synthetic_epe.py's pool stream
    pool = np.empty((args.n, 3 * h, w, 3), np.dtype(args.dtype))
    t0 = time.time()
    for i in range(args.n):
        s = make_snippet(
            rng, h, w, max_bg=args.max_bg, max_fg=args.max_fg,
            tex_power=args.tex_power,
        )[0]
        pool[i] = (
            np.round(s * 255.0).astype(np.uint8)
            if args.dtype == "uint8" else s
        )
        if (i + 1) % 500 == 0:
            print(f"{i + 1}/{args.n} ({time.time() - t0:.0f}s)", flush=True)
    np.save(args.out, pool)
    print(f"wrote {args.out}: {pool.shape} {pool.dtype} "
          f"({pool.nbytes / 1e9:.1f} GB, {time.time() - t0:.0f}s)")


if __name__ == "__main__":
    main()
