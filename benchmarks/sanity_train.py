"""End-to-end learning sanity: can the net learn a known constant flow?

Trains from scratch on synthetic 3-frame snippets whose center frame is the
previous frame shifted by a fixed (u, v) pixels, then measures the EPE of
``inference_flow`` against that known displacement.  No dataset needed; this
is the strongest cheap evidence that the unsupervised loss stack + training
step actually learn correct flow end-to-end.

Usage: PYTHONPATH=. python benchmarks/sanity_train.py [--iters 600]
"""

import argparse
import time

import numpy as np


def make_batch(rng, batch, h, w, shift=3):
    """Smooth random textures; frames translate rightward by `shift` px."""
    big = rng.rand(batch, h + 2, w + 2 * shift + 2, 3).astype(np.float32)
    for _ in range(3):  # smooth so photometric gradients are informative
        big = (
            big
            + np.roll(big, 1, 1) + np.roll(big, -1, 1)
            + np.roll(big, 1, 2) + np.roll(big, -1, 2)
        ) / 5.0
    big = big[:, 1:-1, 1:-1]
    f0 = big[:, :, 2 * shift :]
    f1 = big[:, :, shift : shift + w]
    f2 = big[:, :, :w]
    return np.concatenate([f0, f1, f2], axis=1), float(shift)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=600)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--hw", type=int, nargs=2, default=(64, 128))
    p.add_argument("--shift", type=int, default=3)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--bf16", action="store_true",
                   help="run the production precision (bf16 + fused kernels)")
    p.add_argument("--quant-warps", action="store_true",
                   help="uint8-quantized loss-warp gathers (learning-quality "
                        "evidence for FlowModelConfig.quantize_loss_warps)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from unopticalflow_tpu.models import (
        FlowModelConfig,
        inference_flow,
        init_flow_model,
    )
    from unopticalflow_tpu.training import create_train_state, make_train_step

    from unopticalflow_tpu.utils.platform import on_tpu

    prec = "bfloat16" if args.bf16 else "float32"
    cfg = FlowModelConfig(
        num_scales=3, use_pallas_corr=on_tpu(),
        compute_dtype=prec, loss_dtype=prec,
        use_pallas_photo=args.bf16 and on_tpu(),
        quantize_loss_warps=args.quant_warps,
    )
    weights = {
        "loss_pixel": 0.15,
        "loss_ssim": 0.85,
        "loss_flow_smooth": 10.0,
        "loss_flow_consis": 0.01,
    }
    params = init_flow_model(jax.random.PRNGKey(0))
    state = create_train_state(params, lr=args.lr)
    step = make_train_step(cfg, weights, lr=args.lr)

    h, w = args.hw
    rng = np.random.RandomState(0)
    t0 = time.time()
    for it in range(args.iters):
        batch, _ = make_batch(rng, args.batch, h, w, args.shift)
        state, m = step(state, jnp.asarray(batch))
        if it % 100 == 0 or it == args.iters - 1:
            print(
                f"iter {it}: total {float(m['loss_total']):.4f} "
                f"pixel {float(m['loss_pixel']):.4f} "
                f"({time.time() - t0:.0f}s)",
                flush=True,
            )

    # evaluate: center-frame content sits `shift` columns to the right in the
    # next frame, so inference_flow(center, next) should be (+shift, 0)
    batch, shift = make_batch(rng, args.batch, h, w, args.shift)
    img1 = jnp.asarray(batch[:, h : 2 * h])
    img2 = jnp.asarray(batch[:, 2 * h :])
    flow = np.asarray(inference_flow(state.params, cfg, img1, img2))
    interior = flow[:, 8:-8, 8 + args.shift : -8 - args.shift]
    epe = np.sqrt(
        (interior[..., 0] - shift) ** 2 + interior[..., 1] ** 2
    ).mean()
    print(f"EPE vs known ({shift}, 0) flow: {epe:.3f} px "
          f"(mean u={interior[..., 0].mean():.3f}, v={interior[..., 1].mean():.3f})")


if __name__ == "__main__":
    main()
