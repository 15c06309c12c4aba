"""Careful train-step profiling: interleaved trials, per-trial sync.

Usage: python benchmarks/profile_step.py [--batch 8] [--hw 256 832] [--trials 3]

Runs the full train step under each config several times in an interleaved
order (A B A B ...) so machine-level variance (shared tunneled TPU, host
contention) shows up as per-trial spread instead of biasing one config.
"""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, nargs=2, default=(256, 832))
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--fp32", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from unopticalflow_tpu.models import FlowModelConfig, init_flow_model
    from unopticalflow_tpu.training import create_train_state, make_train_step

    W = {
        "loss_pixel": 0.15,
        "loss_ssim": 0.85,
        "loss_flow_smooth": 10.0,
        "loss_flow_consis": 0.01,
    }
    dtype = "float32" if args.fp32 else "bfloat16"
    h, w = args.hw
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(args.batch, 3 * h, w, 3).astype(np.float32))

    setups = {}
    for name, pallas in (("xla-corr", False), ("pallas-corr", True)):
        cfg = FlowModelConfig(
            num_scales=3, compute_dtype=dtype, loss_dtype=dtype,
            use_pallas_corr=pallas,
        )
        params = init_flow_model(jax.random.PRNGKey(0))
        state = create_train_state(params, 1e-4)
        step = make_train_step(cfg, W, 1e-4)
        try:
            t0 = time.perf_counter()
            state, m = step(state, imgs)
            jax.block_until_ready(m)
            print(f"[{name}] compile+first: {time.perf_counter() - t0:.1f}s")
            setups[name] = [step, state]
        except Exception as e:
            print(f"[{name}] FAILED: {str(e)[:300]}")

    for trial in range(args.trials):
        for name, su in setups.items():
            step, state = su
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, m = step(state, imgs)
                _ = float(m["loss_total"])  # hard sync every iteration
            dt = (time.perf_counter() - t0) / args.iters
            su[1] = state
            print(
                f"trial {trial} {name}: {dt * 1e3:8.1f} ms/step "
                f"({args.batch / dt:6.1f} snippets/s)"
            )


if __name__ == "__main__":
    main()
