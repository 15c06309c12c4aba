"""Microbenchmark Mosaic's in-kernel vector gather (take_along_axis).

Decides the warp-kernel design: XLA's HLO gather runs at ~8.5 ns per gathered
row (index-issue-bound), so a Pallas warp kernel only wins if Mosaic's
single-vreg gathers run at VPU-ish rates.

  lane       out[s,l] = x[s, idx[s,l]]   (gather dim = 128 lanes, per row)
  sublane    out[s,l] = x[idx[s,l], l]   (gather dim = 8 sublanes, per col)

Run: PYTHONPATH=. python benchmarks/pallas_gather_probe.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 4096  # rows per call
REPS = 64  # in-kernel repetitions to amortize dispatch


@jax.jit
def _sync(x):
    return jnp.sum(x.astype(jnp.float32))


def timeit(fn, *args, iters=20, warmup=5):
    for _ in range(warmup):
        _ = float(_sync(fn(*args)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _ = float(_sync(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts) * 1e3)


def lane_kernel(x_ref, idx_ref, out_ref):
    acc = jnp.zeros_like(x_ref)
    for k in range(REPS):
        g = jnp.take_along_axis(x_ref[:], (idx_ref[:] + k) % 128, axis=1)
        acc = acc + g
    out_ref[:] = acc


def sublane_kernel(x_ref, idx_ref, out_ref):
    acc = jnp.zeros_like(x_ref)
    for k in range(REPS):
        g = jnp.take_along_axis(x_ref[:], (idx_ref[:] + k) % 8, axis=0)
        acc = acc + g
    out_ref[:] = acc


def run(name, kernel, x, idx):
    try:
        f = jax.jit(
            lambda x, i: pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(x, i)
        )
        ms = timeit(f, x, idx)
        n_gathers = x.shape[0] * x.shape[1] * REPS
        print(f"  {name:10s} {ms:8.3f} ms  {ms * 1e6 / n_gathers:7.3f} ns/elem"
              f"  ({ms * 1e6 / (n_gathers / 128):7.2f} ns per 128-elem row-equiv)")
    except Exception as e:  # noqa: BLE001
        print(f"  {name:10s} FAIL {type(e).__name__}: {str(e)[:200]}")


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(R, 128).astype(np.float32))
    idx_l = jnp.asarray(rng.randint(0, 128, (R, 128)).astype(np.int32))
    run("lane_f32", lane_kernel, x, idx_l)
    xb = x.astype(jnp.bfloat16)
    run("lane_bf16", lane_kernel, xb, idx_l)

    x8 = jnp.asarray(rng.rand(8, 128 * 64).astype(np.float32))
    idx_s = jnp.asarray(rng.randint(0, 8, (8, 128 * 64)).astype(np.int32))
    run("sublane_f32", sublane_kernel, x8, idx_s)


if __name__ == "__main__":
    main()
