"""Benchmark: training throughput of the fused train step on one chip.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Metric: train frame-pairs/sec/chip at the reference recipe (KITTI 256x832,
batch 8, Adam) — each 3-frame snippet contributes 2 frame pairs (fwd+bwd
decode), matching how the reference consumes data (train.py:120-152).

vs_baseline: the reference publishes no throughput (BASELINE.md). We use an
estimated 20 train snippets/sec for the reference PyTorch code on its era GPU
(PWC-Net-scale model, batch 8 at 256x832; PWC-Net reports ~28 ms/pair
inference on a Titan X — training with 2 decoder passes + backward is ~4-5x
that). The BASELINE.json target is >=5x that estimate on one v5e chip.

Reporting: value = batch / MEDIAN(per-step synced times) — the chip is
time-shared and individual steps can be 10-50x slower during a co-tenant
burst; a mean over a long window reports tenancy, not framework cost. The
per-step median and IQR are printed to stderr for diagnostics.

Flags: --infer benches single-pair inference instead; --fp32 disables bf16;
--batch/--iters/--hw override the recipe; --no-pallas disables the Pallas
cost-volume kernels (enabled by default on TPU).
"""

import argparse
import json
import sys
import time

import numpy as np

REFERENCE_TRAIN_SNIPPETS_PER_SEC = 20.0  # estimated; see module docstring


def bench_train(batch, img_hw, iters, compute_dtype, use_pallas, quant_warps=False,
                scan_steps=0):
    import jax
    import jax.numpy as jnp

    from unopticalflow_tpu.models import FlowModelConfig, init_flow_model
    from unopticalflow_tpu.training import create_train_state, make_train_step

    cfg = FlowModelConfig(
        num_scales=3, compute_dtype=compute_dtype, loss_dtype=compute_dtype,
        use_pallas_corr=use_pallas, use_pallas_photo=use_pallas,
        quantize_loss_warps=quant_warps,
    )
    weights = {
        "loss_pixel": 0.15,
        "loss_ssim": 0.85,
        "loss_flow_smooth": 10.0,
        "loss_flow_consis": 0.01,
    }
    params = init_flow_model(jax.random.PRNGKey(0))
    state = create_train_state(params, lr=1e-4)
    step = make_train_step(cfg, weights, lr=1e-4)

    h, w = img_hw
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, 3 * h, w, 3).astype(np.float32))

    if scan_steps:
        # A/B probe: K train steps per host dispatch (lax.scan over K
        # device-resident batches).  Quantifies what per-step dispatch
        # still costs beyond the windowed-pipelined protocol below.
        stacked = jnp.stack([images] * scan_steps)
        inner_step = step

        def multi(st, batches):
            def body(s, b):
                s2, m = inner_step(s, b)
                return s2, m["loss_total"]
            return jax.lax.scan(body, st, batches)

        multi_j = jax.jit(multi, donate_argnums=(0,))

        def step(st, imgs, _s=multi_j, _b=stacked):  # noqa: F811
            st2, losses = _s(st, _b)
            return st2, {"loss_total": losses[-1]}

        step.precompile = lambda st, imgs: None

    # AOT-compile and dispatch the executable directly (the framework's
    # multi-host precompile hook): skips per-step jit dispatch overhead,
    # which is material on this 1-core host
    step.precompile(state, images)

    # warmup: beyond the compile, the tunneled TPU runs the first several
    # executions pathologically slowly — sync each warmup step and continue
    # until two consecutive steps agree within 20%
    prev = None
    for _ in range(30):
        t0 = time.perf_counter()
        state, metrics = step(state, images)
        _ = float(metrics["loss_total"])
        cur = time.perf_counter() - t0
        if prev is not None and abs(cur - prev) < 0.2 * prev:
            break
        prev = cur

    # Measurement protocol (two hazards, both documented in ARCHITECTURE.md):
    # 1. The TPU is tunneled: fetching a scalar costs a ~30 ms host round
    #    trip.  A real training loop (train.py) only fetches losses at
    #    log_interval, so steps pipeline back-to-back on device; benching
    #    with a per-step sync would charge the tunnel latency to every step.
    #    => time WINDOWS of K dispatches with one hard sync at the end.
    # 2. The chip is time-shared with bursty co-tenants: a single window
    #    inside a burst can run 10-50x slow.  => report the MEDIAN window,
    #    never a mean over one long run.
    k = max(4, min(10, iters // 2))
    n_windows = max(3, iters // k)
    window_ms = []
    for _ in range(n_windows):
        _ = float(metrics["loss_total"])  # drain the queue before timing
        t0 = time.perf_counter()
        for _ in range(k):
            state, metrics = step(state, images)
        _ = float(metrics["loss_total"])  # hard sync: async timing lies here
        window_ms.append(
            (time.perf_counter() - t0) * 1e3 / (k * max(1, scan_steps))
        )
    med = float(np.median(window_ms)) / 1e3
    spread = float(np.percentile(window_ms, 75) - np.percentile(window_ms, 25))
    diag = {"median_step_ms": round(med * 1e3, 2),
            "window_iqr_ms": round(spread, 2),
            "windows": [round(x, 1) for x in window_ms],
            "steps_per_window": k}
    if (batch, tuple(img_hw), compute_dtype, use_pallas) == (
        8, (256, 832), "bfloat16", True
    ):
        # recipe-only: this attribution is a committed trace of THIS exact
        # configuration (benchmarks/trace_step.py); other shapes/dtypes have
        # different breakdowns — run trace_step.py to attribute them.
        diag.update({
            "profile": "benchmarks/PROFILE_r03.md",
            "device_ms_attrib": {
                "warp_gathers_incl_loop_lowering": 17.6,
                "convs": 20.0, "scatters_copies": 6.5,
                "pallas_corr": 5.9, "pallas_photometric": 4.0,
                "formatting": 7.7, "loop_fusions": 8.7,
                "rest": 2.5,
            },
            "model_tflop_per_step": 1.95,
            "effective_mfu_pct": 13.6,
        })
    print(json.dumps(diag), file=sys.stderr)
    return batch / med, float(metrics["loss_total"])


def bench_infer(batch, img_hw, iters, compute_dtype, use_pallas):
    import jax
    import jax.numpy as jnp

    from unopticalflow_tpu.models import FlowModelConfig, inference_flow, init_flow_model

    cfg = FlowModelConfig(
        num_scales=3, compute_dtype=compute_dtype, loss_dtype=compute_dtype,
        use_pallas_corr=use_pallas, use_pallas_photo=use_pallas,
    )
    params = init_flow_model(jax.random.PRNGKey(0))
    h, w = img_hw
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(batch, h, w, 3).astype(np.float32))

    fn = jax.jit(lambda i1, i2: inference_flow(params, cfg, i1, i2))
    prev = None
    for _ in range(30):  # see bench_train: sync-until-steady warmup
        t0 = time.perf_counter()
        out = fn(img1, img2)
        _ = float(out[0, 0, 0, 0])
        cur = time.perf_counter() - t0
        if prev is not None and abs(cur - prev) < 0.2 * prev:
            break
        prev = cur
    # windowed pipelined timing; see bench_train for the rationale
    k = max(4, min(10, iters // 2))
    n_windows = max(3, iters // k)
    window_ms = []
    for _ in range(n_windows):
        _ = float(out[0, 0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn(img1, img2)
        _ = float(out[0, 0, 0, 0])
        window_ms.append((time.perf_counter() - t0) * 1e3 / k)
    return batch / (float(np.median(window_ms)) / 1e3), 0.0


def validate_on_chip(out_path=None):
    """Fwd+grad closeness of the Pallas kernels vs XLA compositions ON TPU.

    Interpret-mode tests (tests/test_pallas_kernels.py,
    tests/test_pallas_photometric.py) cannot catch Mosaic lowering bugs
    (layouts, masked halos); this runs both kernels on the real chip against
    their pure-XLA compositions and asserts closeness of forward outputs and
    VJPs under a shared random cotangent.  Prints one JSON line; optionally
    writes the full report to ``out_path``.
    """
    import jax
    import jax.numpy as jnp

    from unopticalflow_tpu.ops import pallas_photometric as pp
    from unopticalflow_tpu.ops.cost_volume import cost_volume_xla
    from unopticalflow_tpu.ops.pallas_kernels import cost_volume_pallas
    from unopticalflow_tpu.ops.warp import warp_corners

    rng = np.random.RandomState(0)
    checks = {}

    def rel_err(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = float(np.max(np.abs(b))) or 1.0
        return float(np.max(np.abs(a - b))) / scale

    # ---- cost volume (fwd + df1 + df2), recipe level-3 shape ----
    bsz, h, w, c = 2, 32, 104, 64
    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
        f1 = jnp.asarray(rng.randn(bsz, h, w, c).astype(np.float32), dtype)
        f2 = jnp.asarray(rng.randn(bsz, h, w, c).astype(np.float32), dtype)

        @jax.jit
        def corr_both(f1, f2):
            out_pl, vjp_pl = jax.vjp(
                lambda a, b: cost_volume_pallas(a, b, 4), f1, f2
            )
            out_x, vjp_x = jax.vjp(
                lambda a, b: cost_volume_xla(a, b, 4), f1, f2
            )
            g = jnp.asarray(
                np.random.RandomState(1)
                .randn(*out_x.shape)
                .astype(np.float32),
                out_x.dtype,
            )
            return (out_pl, *vjp_pl(g)), (out_x, *vjp_x(g))

        got, want = jax.device_get(corr_both(f1, f2))
        name = f"corr_{np.dtype(dtype).name}"
        errs = [rel_err(a, b) for a, b in zip(got, want)]
        checks[name] = {
            "max_rel_err_fwd_df1_df2": [round(e, 6) for e in errs],
            "tol": tol,
            "ok": all(e < tol for e in errs),
        }

    # ---- fused photometric pack (fwd sums, weights, d(flow)) ----
    bsz, h, w = 2, 32, 104
    for dtype, tol in ((jnp.float32, 1e-4), (jnp.bfloat16, 2e-2)):
        img = jnp.asarray(rng.rand(bsz, h, w, 3).astype(np.float32), dtype)
        img_l = jnp.asarray(rng.rand(bsz, h, w, 3).astype(np.float32), dtype)
        img_r = jnp.asarray(rng.rand(bsz, h, w, 3).astype(np.float32), dtype)
        flow_b = jnp.asarray(rng.uniform(-5, 5, (bsz, h, w, 2)).astype(np.float32))
        flow_f = jnp.asarray(rng.uniform(-5, 5, (bsz, h, w, 2)).astype(np.float32))

        @jax.jit
        def photo_both(img, img_l, img_r, flow_b, flow_f):
            four_b = warp_corners(img_l, flow_b)
            four_f = warp_corners(img_r, flow_f)

            def scalars(fn, fb, ff):
                out = fn(four_b, four_f, fb, ff, img)
                return (out["s_dw"], out["s_cl"]), (out["s_w"], out["weights"])

            g = (
                jnp.asarray(
                    np.random.RandomState(2).randn(2 * bsz).astype(np.float32)
                ),
            ) * 2

            def run(fn):
                (dw_cl, aux), vjp = jax.vjp(
                    lambda fb, ff: scalars(fn, fb, ff)[0], flow_b, flow_f
                )
                d_fb, d_ff = vjp(g)
                return (*dw_cl, *aux, d_fb, d_ff)

            return run(pp.photometric_pack), run(pp.photometric_pack_reference)

        got, want = jax.device_get(photo_both(img, img_l, img_r, flow_b, flow_f))
        name = f"photo_{np.dtype(dtype).name}"
        labels = ["s_dw", "s_cl", "s_w", "weights", "d_flow_b", "d_flow_f"]
        errs = {k: round(rel_err(a, b), 6) for k, a, b in zip(labels, got, want)}
        checks[name] = {
            "max_rel_err": errs,
            "tol": tol,
            "ok": all(e < tol for e in errs.values()),
        }

    # ---- channel-major photometric variant vs the packed kernel (bf16) ----
    # The cm kernels' on-chip risk surface is the u32 pair unpack + the
    # (12, 1, TH, W) block layout under Mosaic; validated against the packed
    # kernel (itself validated vs XLA above) — expected bit-equal.
    from unopticalflow_tpu.ops.warp import warp_corners_cm

    bsz, h, w = 2, 32, 104
    img = jnp.asarray(rng.rand(bsz, h, w, 3).astype(np.float32), jnp.bfloat16)
    img_l = jnp.asarray(rng.rand(bsz, h, w, 3).astype(np.float32), jnp.bfloat16)
    img_r = jnp.asarray(rng.rand(bsz, h, w, 3).astype(np.float32), jnp.bfloat16)
    flow_b = jnp.asarray(rng.uniform(-5, 5, (bsz, h, w, 2)).astype(np.float32))
    flow_f = jnp.asarray(rng.uniform(-5, 5, (bsz, h, w, 2)).astype(np.float32))

    @jax.jit
    def photo_cm_both(img, img_l, img_r, flow_b, flow_f):
        four_b = warp_corners(img_l, flow_b, gather_u32=True)
        four_f = warp_corners(img_r, flow_f, gather_u32=True)
        ffu = jnp.concatenate(
            [warp_corners_cm(img_l, flow_b), warp_corners_cm(img_r, flow_f)], 0
        )
        g = (
            jnp.asarray(
                np.random.RandomState(2).randn(2 * bsz).astype(np.float32)
            ),
        ) * 2

        def run(fn, *lead):
            def scalars(fb, ff):
                out = fn(*lead, fb, ff, img)
                return (out["s_dw"], out["s_cl"]), (out["s_w"], out["weights"])

            (dw_cl, aux), vjp = jax.vjp(
                lambda fb, ff: scalars(fb, ff)[0], flow_b, flow_f
            )
            d_fb, d_ff = vjp(g)
            _, aux = scalars(flow_b, flow_f)
            return (*dw_cl, *aux, d_fb, d_ff)

        return (
            run(pp.photometric_pack_cm, ffu),
            run(pp.photometric_pack, four_b, four_f),
        )

    got, want = jax.device_get(photo_cm_both(img, img_l, img_r, flow_b, flow_f))
    labels = ["s_dw", "s_cl", "s_w", "weights", "d_flow_b", "d_flow_f"]
    errs = {k: round(rel_err(a, b), 9) for k, a, b in zip(labels, got, want)}
    checks["photo_cm_vs_packed_bfloat16"] = {
        "max_rel_err": errs,
        "tol": 1e-6,
        "ok": all(e < 1e-6 for e in errs.values()),
    }

    # ---- fused regularizer (smooth+consis sums, d(flow)) ----
    from unopticalflow_tpu.ops import pallas_regularizer as pr

    bsz, h, w = 2, 32, 104
    flow_b = jnp.asarray(rng.uniform(-6, 6, (bsz, h, w, 2)).astype(np.float32))
    flow_f = jnp.asarray(rng.uniform(-6, 6, (bsz, h, w, 2)).astype(np.float32))
    img = jnp.asarray(rng.rand(bsz, h, w, 3).astype(np.float32))
    wfd = jnp.asarray(rng.rand(bsz, h, w, 1).astype(np.float32))

    @jax.jit
    def reg_both(flow_b, flow_f, img, wfd):
        def run(fn):
            def scalars(fb, ffl):
                out = fn(fb, ffl, img, wfd)
                return out["s_sx"], out["s_sy"], out["s_consis"]

            (sx, sy, sc), vjp = jax.vjp(scalars, flow_b, flow_f)
            g = tuple(
                jnp.asarray(
                    np.random.RandomState(7 + i).randn(*x.shape).astype(np.float32)
                )
                for i, x in enumerate((sx, sy, sc))
            )
            d_fb, d_ff = vjp(g)
            return (sx, sy, sc, d_fb, d_ff)

        return run(pr.regularizer_pack), run(pr.regularizer_pack_reference)

    got, want = jax.device_get(reg_both(flow_b, flow_f, img, wfd))
    labels = ["s_sx", "s_sy", "s_consis", "d_flow_b", "d_flow_f"]
    errs = {k: round(rel_err(a, b), 6) for k, a, b in zip(labels, got, want)}
    checks["regularizer_float32"] = {
        "max_rel_err": errs,
        "tol": 1e-4,
        "ok": all(e < 1e-4 for e in errs.values()),
    }

    ok = all(v["ok"] for v in checks.values())
    report = {
        "validate": "pallas-on-chip",
        "platform": jax.devices()[0].platform,
        "ok": ok,
        "checks": checks,
    }
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps({"validate": "pallas-on-chip", "ok": ok,
                      "platform": report["platform"],
                      "worst": max(
                          e for v in checks.values()
                          for e in (v["max_rel_err_fwd_df1_df2"]
                                    if "max_rel_err_fwd_df1_df2" in v
                                    else list(v["max_rel_err"].values()))
                      )}))
    return 0 if ok else 1


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=40)  # 4 windows of 10: median robust to one co-tenant burst
    p.add_argument("--hw", type=int, nargs=2, default=(256, 832))
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--no-pallas", action="store_true",
                   help="disable the Pallas cost-volume kernels (default on "
                        "TPU: enabled — ~45% faster end-to-end than XLA corr)")
    p.add_argument("--infer", action="store_true")
    p.add_argument("--quant-warps", action="store_true",
                   help="uint8-quantize the no-grad loss-warp gathers "
                        "(FlowModelConfig.quantize_loss_warps)")
    p.add_argument("--validate", action="store_true",
                   help="on-chip Pallas-vs-XLA fwd+grad closeness check "
                        "instead of the throughput bench")
    p.add_argument("--validate-out", default="benchmarks/PALLAS_VALIDATE.json")
    p.add_argument("--scan-steps", type=int, default=8,
                   help="K train steps per host dispatch (lax.scan). "
                        "Default 8 = the recipe train.py ships "
                        "(--steps_per_dispatch auto); 0 measures the "
                        "single-dispatch path (the round<=4 headline).")
    args = p.parse_args()

    import jax

    # persistent compile cache: repeat bench invocations skip the multi-minute
    # remote compile of the train step (entries self-invalidate on version)
    jax.config.update("jax_compilation_cache_dir", "/tmp/unflow_jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if args.validate:
        sys.exit(validate_on_chip(args.validate_out))

    from unopticalflow_tpu.utils.platform import on_tpu

    compute_dtype = "float32" if args.fp32 else "bfloat16"
    use_pallas = (not args.no_pallas) and on_tpu()

    if args.infer:
        value, _ = bench_infer(
            args.batch, tuple(args.hw), args.iters, compute_dtype, use_pallas
        )
    else:
        value, _ = bench_train(
            args.batch, tuple(args.hw), args.iters, compute_dtype, use_pallas,
            quant_warps=args.quant_warps, scan_steps=args.scan_steps,
        )

    if args.infer:
        out = {
            "metric": "infer frame-pairs/sec/chip (256x832)",
            "value": round(value, 2),
            "unit": "pairs/s",
            "vs_baseline": round(value / 35.0, 2),  # PWC-Net 35 fps on Titan X
        }
    else:
        default_recipe = tuple(args.hw) == (256, 832) and args.batch == 8
        metric = (
            "train snippets/sec/chip (KITTI recipe 256x832, batch 8)"
            if default_recipe
            else f"train snippets/sec/chip ({args.hw[0]}x{args.hw[1]}, batch {args.batch})"
        )
        if args.scan_steps:
            metric += f", {args.scan_steps} steps/dispatch"
        # vs_baseline is pixel-normalized for non-recipe shapes: the 20
        # snippets/s reference estimate is AT 256x832, so a 384x832 rate is
        # compared against 20 * (256*832)/(384*832) — same-work ratio, not
        # apples-to-oranges (VERDICT r04 item 7)
        base = REFERENCE_TRAIN_SNIPPETS_PER_SEC * (
            (256 * 832) / float(args.hw[0] * args.hw[1])
        )
        out = {
            "metric": metric,
            "value": round(value, 2),
            "unit": "snippets/s",
            "vs_baseline": round(value / base, 2),
        }
    print(json.dumps(out))
