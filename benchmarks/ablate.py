"""Ablation profiling of the train step: find where the milliseconds go.

Builds several train-step variants with components stubbed out, runs each to
steady state (the tunneled TPU shows a very slow first-executions phase), and
reports per-step time.  Variants:

* full          — the real step
* no-warp       — decoder + loss warps replaced by identity on the target
* no-corr       — cost volume replaced by a zero-cost broadcast
* no-ssim       — SSIM loss dropped
* encoder-only  — only the 3 encoder passes + a reduction

Usage: PYTHONPATH=. python benchmarks/ablate.py [--batch 8] [--hw 256 832]
"""

import argparse
import time
from unittest import mock

import numpy as np


def steady_ms(step, state, imgs, max_rounds=12):
    """Per-step ms once timings stabilize (two consecutive rounds within 20%)."""
    import jax

    state, m = step(state, imgs)
    jax.block_until_ready(m)
    prev = None
    for _ in range(max_rounds):
        t0 = time.perf_counter()
        for _ in range(3):
            state, m = step(state, imgs)
            _ = float(m["loss_total"])
        cur = (time.perf_counter() - t0) / 3
        if prev is not None and abs(cur - prev) < 0.2 * prev:
            return min(cur, prev) * 1e3, state
        prev = cur
    return prev * 1e3, state


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, nargs=2, default=(256, 832))
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--pallas", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import unopticalflow_tpu.models.flow_model as fm
    import unopticalflow_tpu.models.pwc_decoder as pwc
    from unopticalflow_tpu.models import FlowModelConfig, init_flow_model
    from unopticalflow_tpu.training import create_train_state, make_train_step

    W = {
        "loss_pixel": 0.15,
        "loss_ssim": 0.85,
        "loss_flow_smooth": 10.0,
        "loss_flow_consis": 0.01,
    }
    h, w = args.hw
    dt = "float32" if args.fp32 else "bfloat16"
    cfg = FlowModelConfig(
        num_scales=3,
        compute_dtype=dt,
        loss_dtype=dt,
        use_pallas_corr=args.pallas,
    )
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(args.batch, 3 * h, w, 3).astype(np.float32))

    def fake_warp(x, flow, use_mask=False):
        # keep a flow dependency so autodiff shape matches, but no gather
        return x + 0.0 * jnp.mean(flow, axis=-1, keepdims=True)

    def fake_corr(f1, f2, md=4, use_pallas=False):
        base = jnp.mean(f1 * f2, axis=-1, keepdims=True)
        return jnp.broadcast_to(base, f1.shape[:3] + ((2 * md + 1) ** 2,))

    def fake_ssim(x, y):
        # cheap map with the right shape that still fuses cleanly
        return x - y

    variants = {
        "full": {},
        "no-warp": {"warp": fake_warp},
        "no-corr": {"corr": fake_corr},
        "no-warp+corr": {"warp": fake_warp, "corr": fake_corr},
        "no-ssim": {"ssim": fake_ssim},
        "convs-only": {"loss": "flows"},
        "no-context": {"context": True},
    }

    for name, mods in variants.items():
        patches = []
        if "warp" in mods:
            patches.append(mock.patch.object(fm, "bilinear_warp", mods["warp"]))
            patches.append(mock.patch.object(pwc, "bilinear_warp", mods["warp"]))
        if "corr" in mods:
            patches.append(mock.patch.object(pwc, "cost_volume", mods["corr"]))
        if "ssim" in mods:
            import unopticalflow_tpu.models.losses as ls

            patches.append(mock.patch.object(ls, "ssim", mods["ssim"]))
        if mods.get("context"):
            # skip the dilated context net refinement (pwc_decoder lvl-2 tail)
            import unopticalflow_tpu.models.pwc_decoder as pwcmod
            real_block = pwcmod.conv_block

            def skip_dc(p, x, stride=1, dilation=1, compute_dtype=None):
                if dilation > 1:
                    return x[..., :p["w"].shape[-1]] if x.shape[-1] >= p["w"].shape[-1] else real_block(p, x, stride, dilation, compute_dtype)
                return real_block(p, x, stride, dilation, compute_dtype)

            patches.append(mock.patch.object(pwcmod, "conv_block", skip_dc))
        if mods.get("loss") == "flows":
            # bypass the whole loss stack: loss = mean of decoder outputs
            real_fwd = fm.forward

            def flows_only(params, c, images):
                img_h = images.shape[1] // 3
                fp = params["fpyramid"]
                from unopticalflow_tpu.models.feature_pyramid import (
                    apply_feature_pyramid,
                )
                from unopticalflow_tpu.models.pwc_decoder import apply_pwc_decoder

                f_c = apply_feature_pyramid(fp, images[:, img_h:2*img_h], c.cdtype)
                f_l = apply_feature_pyramid(fp, images[:, :img_h], c.cdtype)
                f_r = apply_feature_pyramid(fp, images[:, 2*img_h:], c.cdtype)
                fb = apply_pwc_decoder(params["pwc"], f_c, f_l, (img_h, images.shape[2]),
                                       compute_dtype=c.cdtype, use_pallas_corr=c.use_pallas_corr)
                ff = apply_pwc_decoder(params["pwc"], f_c, f_r, (img_h, images.shape[2]),
                                       compute_dtype=c.cdtype, use_pallas_corr=c.use_pallas_corr)
                z = sum(jnp.mean(jnp.abs(f.astype(jnp.float32)), axis=(1,2,3)) for f in fb+ff)
                return {"loss_pixel": z, "loss_ssim": z, "loss_flow_smooth": z,
                        "loss_flow_consis": z}

            import unopticalflow_tpu.training.train_step as ts
            patches.append(mock.patch.object(ts, "forward", flows_only))
        for pt in patches:
            pt.start()
        try:
            params = init_flow_model(jax.random.PRNGKey(0))
            state = create_train_state(params, 1e-4)
            step = make_train_step(cfg, W, 1e-4)
            t0 = time.perf_counter()
            ms, _ = steady_ms(step, state, imgs)
            print(
                f"{name:>14}: {ms:8.1f} ms/step  "
                f"({args.batch / ms * 1e3:6.1f} snippets/s)  "
                f"[total incl. compile {time.perf_counter() - t0:.0f}s]",
                flush=True,
            )
        except Exception as e:
            print(f"{name:>14}: FAILED {str(e)[:200]}", flush=True)
        finally:
            for pt in patches:
                pt.stop()


if __name__ == "__main__":
    main()
