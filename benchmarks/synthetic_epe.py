"""Occlusion-aware learning benchmark: piecewise motion + real occlusions.

``sanity_train.py`` proves the loss stack can learn a constant translation;
this benchmark is the stronger claim — the one the reference paper is about
(occlusion-AWARE unsupervised flow, /root/reference/README.md:1-10): a
textured foreground rectangle moves over a differently-moving background, so
every snippet contains genuine occlusion/disocclusion bands where photometric
matching is impossible.  The softmax diff-weight masks
(models/losses.py, reference model_flow_paper.py:101-134) must gate those
pixels out for training to converge; if the masks were broken, the occluded
bands would drag the flow field toward photometric hallucinations.

Ground truth is analytic (integer translations), so we can report true EPE —
over all pixels, over non-occluded pixels, and per region (fg/bg) — plus the
KITTI outlier rate (>3 px), from a from-scratch unsupervised training run at
the production precision (bf16 + all Pallas kernels on TPU).

No dataset, no checkpoint, no egress needed.  Prints one JSON line.

Usage: PYTHONPATH=. python benchmarks/synthetic_epe.py [--iters 4000]
"""

import argparse
import json
import time

import numpy as np

try:  # fast upsample/smooth path; falls back to pure numpy
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

_SMOOTH_K = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], np.float32) / 5.0


def _texture(rng, h, w, octaves, power=0.5):
    """Multi-octave (1/f-like) texture — structure at EVERY pyramid scale.

    Plain smoothed white noise averages to flat gray at the coarse pyramid
    levels (/4 ... /64), which deletes the coarse-to-fine photometric signal
    PWC-style training bootstraps from; natural images are ~1/f.  Summing
    nearest-neighbor-upsampled noise octaves (amplitude ``s**power``) gives
    informative photometric gradients at every decoder level.

    ``power`` sets the spectral slope: 0.5 (amplitude ~ sqrt(scale)) is the
    original benchmark texture; 1.0 (amplitude ~ scale, i.e. 1/f^2 power)
    matches natural-image statistics — the dominant coarse structure widens
    the photometric basin, which is what lets real KITTI frames train with
    tens-of-pixels motions while flat-spectrum noise stalls beyond ~4 px
    (see benchmarks/synth_epe_r04/README.md, diagnosis matrix).
    """
    t = np.zeros((h, w, 3), np.float32)
    for o in range(octaves):
        s = 2**o
        # NB the rng draw stream is the distribution's identity: the fast
        # cv2 path below must consume draws in exactly this order/shape so
        # every leg (and the seeded held-out eval sets) sees the same data
        small = rng.rand(h // s + 2, w // s + 2, 3).astype(np.float32)
        if s == 1:
            up = small[:h, :w]
        elif cv2 is not None:
            # INTER_NEAREST at an exact integer factor is bit-equal to
            # np.repeat (dst j -> src j//s); ~10x faster on the 1-core host
            up = cv2.resize(
                small, ((w // s + 2) * s, (h // s + 2) * s),
                interpolation=cv2.INTER_NEAREST,
            )[:h, :w]
        else:
            up = np.repeat(np.repeat(small, s, 0), s, 1)[:h, :w]
        t += (s**power) * up
    # light box smooth so block edges do not alias under bilinear warps
    # (cross kernel with wrap boundary — identical to the roll formulation
    # up to float summation order)
    if cv2 is not None:
        p = np.pad(t, ((1, 1), (1, 1), (0, 0)), mode="wrap")
        t = cv2.filter2D(p, -1, _SMOOTH_K)[1:-1, 1:-1]
    else:
        t = (
            t
            + np.roll(t, 1, 0) + np.roll(t, -1, 0)
            + np.roll(t, 1, 1) + np.roll(t, -1, 1)
        ) / 5.0
    # renormalize contrast so photometric gradients stay informative
    t -= t.min()
    t /= max(t.max(), 1e-6)
    return t


def make_snippet(rng, h, w, max_bg=4, max_fg=8, tex_power=0.5, fg_bias=0.0):
    """One 3-frame snippet (3H, W, 3) + GT center->next flow + occlusion mask.

    Background translates by integer (u_b, v_b), a foreground rectangle by
    (u_f, v_f); frames are sampled at times t-1, t, t+1 so the snippet is
    consistent linear motion (what the 3-frame loss assumes).  Returns:
        stacked: (3h, w, 3) float32 in [0, 1]
        flow_gt: (h, w, 2) forward flow (u, v) of the CENTER frame
        nonocc:  (h, w) bool — center pixels still visible at t+1
    """
    max_fg = min(max_fg, h // 8, w // 8)  # keep the rect placeable (small frames)
    pad = 2 * max(max_bg, max_fg) + 2
    big = _texture(rng, h + 2 * pad, w + 2 * pad, octaves=6, power=tex_power)
    u_b, v_b = rng.randint(-max_bg, max_bg + 1, size=2)
    u_f, v_f = rng.randint(-max_fg, max_fg + 1, size=2)

    rh = rng.randint(h // 4, h // 2 + 1)
    rw = rng.randint(w // 6, w // 3 + 1)
    # foreground texture at a different octave mix (distinct content)
    fg_tex = _texture(rng, rh, rw, octaves=4, power=tex_power)
    if fg_bias:
        # brightness-offset the object so its BOUNDARY is a real intensity
        # edge.  The base benchmark's fg/bg share intensity statistics, so
        # the edge-aware smoothness (exp(-10|grad I|), losses.py) never
        # releases at the object boundary and boundary-driven fill beats
        # object tracking (see fg_probe.py: the converged model paints the
        # bg field through the rect).  Real object boundaries ARE intensity
        # edges — this knob restores that property.
        fg_tex = fg_bias + (1.0 - fg_bias) * fg_tex
    # keep the rectangle inside the frame at every time step (k = -1, 0, +1)
    ry = rng.randint(abs(v_f) + 1, h - rh - abs(v_f))
    rx = rng.randint(abs(u_f) + 1, w - rw - abs(u_f))

    frames = []
    fg_masks = []
    for k in (-1, 0, 1):
        y0 = pad - k * v_b
        x0 = pad - k * u_b
        fr = big[y0 : y0 + h, x0 : x0 + w].copy()
        fy, fx = ry + k * v_f, rx + k * u_f
        fr[fy : fy + rh, fx : fx + rw] = fg_tex
        m = np.zeros((h, w), bool)
        m[fy : fy + rh, fx : fx + rw] = True
        frames.append(fr)
        fg_masks.append(m)

    flow_gt = np.empty((h, w, 2), np.float32)
    flow_gt[..., 0] = u_b
    flow_gt[..., 1] = v_b
    flow_gt[fg_masks[1]] = (u_f, v_f)

    # center bg pixels whose destination is covered by the fg at t+1 (or
    # leaves the frame) are occluded; fg pixels stay visible by construction
    ys, xs = np.mgrid[0:h, 0:w]
    dst_y = ys + flow_gt[..., 1].astype(int)
    dst_x = xs + flow_gt[..., 0].astype(int)
    inside = (dst_y >= 0) & (dst_y < h) & (dst_x >= 0) & (dst_x < w)
    covered = np.zeros((h, w), bool)
    ok = inside & ~fg_masks[1]
    covered[ok] = fg_masks[2][dst_y[ok], dst_x[ok]]
    nonocc = inside & ~covered

    return np.concatenate(frames, axis=0), flow_gt, nonocc


def make_batch(rng, batch, h, w, **kw):
    out = [make_snippet(rng, h, w, **kw) for _ in range(batch)]
    return (
        np.stack([o[0] for o in out]),
        np.stack([o[1] for o in out]),
        np.stack([o[2] for o in out]),
    )


def evaluate(params, args, gen_kw, infer, zero_flow=False):
    """Held-out EPE (fixed fresh seed, so every call scores the SAME set).

    ``zero_flow=True`` scores a constant-zero prediction on the identical
    set instead — the bar a "learned" run must go UNDER (part of any initial
    epe_all drop is just unlearning the init's constant bias; see
    synth_epe_r04/README.md Act 2b).
    """
    import numpy as np

    h, w = args.hw
    erng = np.random.RandomState(12345)
    epe_all, epe_noc, epe_occ, epe_fg, epe_bg, outlier = [], [], [], [], [], []
    done = 0
    while done < args.eval_snippets:
        n = min(args.batch, args.eval_snippets - done)
        stacked, gt, noc = make_batch(erng, n, h, w, **gen_kw)
        if zero_flow:
            flow = np.zeros_like(gt)
        else:
            flow = np.asarray(
                infer(params, stacked[:, h : 2 * h], stacked[:, 2 * h :]),
                np.float32,
            )
        err = np.linalg.norm(flow - gt, axis=-1)  # (n, h, w)
        fg = np.linalg.norm(gt - gt[:, :1, :1], axis=-1) > 0  # fg-region proxy
        for i in range(n):
            epe_all.append(err[i].mean())
            epe_noc.append(err[i][noc[i]].mean())
            if (~noc[i]).any():
                epe_occ.append(err[i][~noc[i]].mean())
            if fg[i].any():
                epe_fg.append(err[i][fg[i]].mean())
                epe_bg.append(err[i][~fg[i]].mean())
            mag = np.linalg.norm(gt[i], axis=-1)
            outlier.append(
                ((err[i] > 3.0) & (err[i] > 0.05 * np.maximum(mag, 1e-6))).mean()
            )
        done += n
    return {
        "epe_all": round(float(np.mean(epe_all)), 3),
        "epe_nonoccluded": round(float(np.mean(epe_noc)), 3),
        "epe_occluded": round(float(np.mean(epe_occ)), 3) if epe_occ else None,
        "epe_fg": round(float(np.mean(epe_fg)), 3) if epe_fg else None,
        "epe_bg": round(float(np.mean(epe_bg)), 3) if epe_bg else None,
        "outlier_rate_kitti": round(float(np.mean(outlier)), 4),
    }


def prediction_probe(args, gen_kw, infer, params):
    """Is the net CONDITIONING on its input, or predicting a bias?

    Regresses per-snippet mean predicted flow against the GT background
    motion over 64 fresh snippets.  slope ~1: the net tracks per-sample
    motion; slope ~0: it ignores the images and the EPE plateau is a
    collapsed (constant) predictor — the two failure modes a flat epe_all
    curve cannot distinguish.
    """
    h, w = args.hw
    prng = np.random.RandomState(777)
    preds, gts = [], []
    done = 0
    while done < 64:
        n = min(args.batch, 64 - done)
        stacked, gt, _ = make_batch(prng, n, h, w, **gen_kw)
        flow = np.asarray(
            infer(params, stacked[:, h : 2 * h], stacked[:, 2 * h :]),
            np.float32,
        )
        preds.append(flow.reshape(n, -1, 2).mean(1))
        gts.append(gt[:, 0, 0])  # corner pixel is always background
        done += n
    p = np.concatenate(preds)  # (64, 2) mean predicted flow
    g = np.concatenate(gts)  # (64, 2) GT bg motion
    out = {}
    for i, ax in enumerate("uv"):
        gc = g[:, i] - g[:, i].mean()
        slope = float((gc * p[:, i]).sum() / max((gc**2).sum(), 1e-9))
        out[f"slope_{ax}"] = round(slope, 3)
    out["pred_mean"] = [round(float(x), 3) for x in p.mean(0)]
    out["pred_std"] = [round(float(x), 3) for x in p.std(0)]
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=4000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, nargs=2, default=(128, 256))  # divisible by 64
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr-schedule", choices=["const", "cosine"],
                   default="const",
                   help="cosine: decay --lr to --lr-final-frac of itself "
                        "over --iters.  The unsupervised objective dips "
                        "under the zero-flow bar early and then drifts back "
                        "up under a constant lr (see synth_epe_r05/README); "
                        "annealing freezes the dip into a converged result")
    p.add_argument("--lr-final-frac", type=float, default=0.05,
                   help="cosine floor as a fraction of --lr")
    p.add_argument("--supervised", action="store_true",
                   help="diagnostic: train on the analytic GT (L1 EPE loss "
                        "through inference_flow) instead of the unsupervised "
                        "stack.  Separates 'the architecture cannot condition "
                        "on its input' from 'the photometric objective does "
                        "not reward conditioning'.  Under --init torch even "
                        "this collapses to a constant predictor (pred_probe "
                        "slope 0.0, r05 s1/s2 logs) — that was the round-4/5 "
                        "plateau diagnosis: torch-default init makes the net "
                        "input-blind at init (see models/layers.py)")
    p.add_argument("--smooth-weight", type=float, default=10.0,
                   help="loss_flow_smooth weight (KITTI recipe: 10.0). "
                        "Diagnostic knob: the smoothness term is minimized "
                        "by exactly the constant-flow collapse the EPE "
                        "plateau exhibits")
    p.add_argument("--w-pixel", type=float, default=0.15,
                   help="loss_pixel weight (KITTI recipe: 0.15)")
    p.add_argument("--w-ssim", type=float, default=0.85,
                   help="loss_ssim weight (KITTI recipe: 0.85).  Diagnostic "
                        "knob: SSIM's 3x3-pooled statistics can dominate the "
                        "photometric gradient on synthetic low-contrast "
                        "texture; --w-ssim 0 isolates the L1 term")
    p.add_argument("--max-bg", type=int, default=4,
                   help="max |background translation| in px")
    p.add_argument("--max-fg", type=int, default=8,
                   help="max |foreground translation| in px (0 = global "
                        "translation only, no occlusion: diagnostic mode)")
    p.add_argument("--eval-snippets", type=int, default=32)
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="K optimizer steps per host dispatch via "
                        "make_multi_train_step's lax.scan (identical "
                        "parameter trajectory to K=1; see "
                        "training/train_step.py).  On the tunneled axon "
                        "runtime each dispatch pays a ~0.4 s host round "
                        "trip, so K=10 turns a 0.5 s/it campaign leg into "
                        "~0.1 s/it.  --eval-every must be divisible by K.")
    p.add_argument("--eval-every", type=int, default=0,
                   help="also run the held-out eval every N iters (learning "
                        "curve; 0 = only at the end)")
    p.add_argument("--device-gen", action="store_true",
                   help="generate fresh training batches ON the TPU "
                        "(benchmarks/synth_device_gen.py) instead of host "
                        "numpy — same distribution, device speed; the "
                        "held-out eval set stays host-generated (identical "
                        "across modes)")
    p.add_argument("--pool", type=int, default=0,
                   help="pregenerate N snippets (float16) and sample batches "
                        "from them with random horizontal flips, instead of "
                        "generating fresh data every iter — the 1-core host's "
                        "numpy generator otherwise bounds the step rate")
    p.add_argument("--fp32", action="store_true",
                   help="disable the production bf16+Pallas path")
    p.add_argument("--loss-fp32", action="store_true",
                   help="mixed precision: bf16 convs/corr, f32 loss stack "
                        "(pyramids/warps/diffs).  Isolates bf16 IMAGE "
                        "quantization (8-bit mantissa on [0,1] values ~ "
                        "uint8) from bf16 compute — the r04 fresh+uint8 "
                        "probe stalled at the zero-flow bar exactly like "
                        "the bf16 end-to-end leg")
    p.add_argument("--no-flip", action="store_true",
                   help="diagnostic: disable the pool's mirror augmentation")
    p.add_argument("--quantize-fresh", action="store_true",
                   help="diagnostic: round fresh-generated batches through "
                        "uint8 (isolates 8-bit quantization from the fixed-"
                        "pool effect)")
    p.add_argument("--pool-dtype", choices=["uint8", "float32"],
                   default="uint8",
                   help="pool storage dtype (float32 = no 8-bit "
                        "quantization; 4x the host RAM)")
    p.add_argument("--pool-device", action="store_true",
                   help="with --pool: upload the pool to device HBM once "
                        "(chunked) and sample batches + mirror flips + the "
                        "[0,1] cast ON device.  The tunneled runtime moves "
                        "~10 MB/s, so per-step host batches are TRANSFER-"
                        "bound at production shapes (7.6 MB/iter at 256x832 "
                        "batch 4 uint8); a device-resident pool pays the "
                        "wire cost once.")
    p.add_argument("--fg-bias", type=float, default=0.0,
                   help="brightness-offset the foreground object into "
                        "[bias, 1] so its boundary is a real intensity edge "
                        "(real object boundaries are; the base benchmark's "
                        "fg/bg share intensity stats, so the edge-aware "
                        "smoothness never releases at the boundary and "
                        "bg-fill beats object tracking — fg_probe.py)")
    p.add_argument("--tex-power", type=float, default=0.5,
                   help="texture spectral slope: amplitude ~ scale**power; "
                        "0.5 = original benchmark, 1.0 = natural-image-like "
                        "1/f^2 power (wider photometric basins)")
    p.add_argument("--no-pallas-corr", action="store_true",
                   help="diagnostic: XLA cost volume instead of the Pallas "
                        "corr kernel")
    p.add_argument("--no-pallas-photo", action="store_true",
                   help="diagnostic: unfused XLA photometric loss instead of "
                        "the fused Pallas kernel")
    p.add_argument("--no-occlusion-weights", action="store_true",
                   help="ablation: replace the softmax diff-weight occlusion "
                        "masks with the warp-validity mask alone (the "
                        "paper's central mechanism OFF; forces the unfused "
                        "XLA loss path)")
    p.add_argument("--pool-file", default="",
                   help="with --pool: cache the pregenerated pool to this "
                        ".npy (reused across run pairs so ablations train on "
                        "identical data)")
    p.add_argument("--save", default="",
                   help="checkpoint path to write at --eval-every points and "
                        "at the end (long runs become resumable)")
    p.add_argument("--load", default="",
                   help="checkpoint path to resume params+opt_state from")
    p.add_argument("--load-params-only", action="store_true",
                   help="with --load: warm-start the PARAMS only (fresh "
                        "optimizer, iteration counter 0) — the cross-"
                        "resolution fine-tune mode (params are resolution-"
                        "independent; the source run's iters/schedule are "
                        "not)")
    p.add_argument("--init", choices=["torch", "pwc"], default="pwc",
                   help="param init scheme.  'torch' (the reference default) "
                        "is input-blind at init (models/layers.py): every "
                        "r04/r05 leg under it — supervised included — "
                        "plateaued at the constant-predictor optimum.  "
                        "'pwc' is the official PWC-Net kaiming_normal init.")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    # Persistent compile cache: resumed/repeated runs skip the 20-40 s
    # tunneled TPU compiles (entries key on HLO, so staleness self-invalidates).
    jax.config.update("jax_compilation_cache_dir", "/tmp/unflow_jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unopticalflow_tpu.models import (
        FlowModelConfig,
        inference_flow,
        init_flow_model,
    )
    from unopticalflow_tpu.training import (
        create_train_state,
        make_multi_train_step,
        make_train_step,
    )
    from unopticalflow_tpu.utils.platform import on_tpu

    prec = "float32" if args.fp32 else "bfloat16"
    loss_prec = "float32" if (args.fp32 or args.loss_fp32) else "bfloat16"
    cfg = FlowModelConfig(
        num_scales=3,
        compute_dtype=prec,
        loss_dtype=loss_prec,
        use_pallas_corr=on_tpu() and not args.no_pallas_corr,
        use_pallas_photo=(
            (loss_prec == "bfloat16") and on_tpu() and not args.no_pallas_photo
        ),
        use_occlusion_weights=not args.no_occlusion_weights,
    )
    weights = {  # the KITTI recipe table (config/kitti.yaml)
        "loss_pixel": args.w_pixel,
        "loss_ssim": args.w_ssim,
        "loss_flow_smooth": args.smooth_weight,
        "loss_flow_consis": 0.01,
    }
    if args.lr_schedule == "cosine":
        import optax

        # optax.adam accepts a schedule wherever a scalar lr is accepted
        # (training/train_step.py::make_optimizer passes it through), so the
        # harness builds the schedule and the package stays unchanged.
        lr = optax.cosine_decay_schedule(
            init_value=args.lr,
            decay_steps=args.iters,
            alpha=args.lr_final_frac,
        )
    else:
        lr = args.lr
    params = init_flow_model(jax.random.PRNGKey(0), scheme=args.init)
    state = create_train_state(params, lr=lr)
    K = args.steps_per_dispatch
    if K < 1:
        raise SystemExit("--steps-per-dispatch must be >= 1")
    if K > 1:
        if args.supervised:
            raise SystemExit("--steps-per-dispatch>1 not supported with "
                             "--supervised (diagnostic path stays K=1)")
        if args.eval_every and args.eval_every % K:
            raise SystemExit("--eval-every must be divisible by "
                             "--steps-per-dispatch")
        step = make_multi_train_step(cfg, weights, K, lr=lr)
    else:
        step = make_train_step(cfg, weights, lr=lr)
    it0 = 0
    if args.load:
        from unopticalflow_tpu.utils.checkpoint import restore_checkpoint

        if args.load_params_only:
            # no opt_state template: the source run's optimizer tree (e.g. a
            # cosine schedule's count) need not match this run's
            ck_it, params, _ = restore_checkpoint(args.load, state.params)
            state = state._replace(params=params)
            print(f"warm-started params from {args.load} "
                  f"(source iter {ck_it}; fresh optimizer)", flush=True)
        else:
            ck_it, params, opt_state = restore_checkpoint(
                args.load, state.params, state.opt_state
            )
            it0 = ck_it
            state = state._replace(
                step=jnp.asarray(it0, jnp.int32), params=params,
                opt_state=opt_state,
            )
            print(f"resumed from {args.load} at iter {it0}", flush=True)

    h, w = args.hw
    rng = np.random.RandomState(0)
    gen_kw = dict(max_bg=args.max_bg, max_fg=args.max_fg,
                  tex_power=args.tex_power)
    if args.fg_bias:
        gen_kw["fg_bias"] = args.fg_bias
    if args.device_gen:
        from benchmarks.synth_device_gen import make_device_batch

        genkey = {"k": jax.random.PRNGKey(0)}

        def next_batch():
            genkey["k"], sub = jax.random.split(genkey["k"])
            return make_device_batch(
                sub, args.batch, h, w, **gen_kw
            )[0]

    elif args.pool:
        import os

        if args.pool_device:
            est = args.pool * 3 * h * w * 3 * (1 if args.pool_dtype == "uint8" else 4)
            if est > 12e9:
                raise SystemExit(
                    f"--pool-device: pool would need {est / 1e9:.1f} GB HBM "
                    "(>12 GB budget on one v5e) — use --pool-dtype uint8 or "
                    "a smaller --pool"
                )

        # uint8 pool: 8-bit quantization matches the real pipeline (prepared
        # PNGs are 8-bit), and batches cross the (tunneled) host->device link
        # at 1/4 the f32 bytes — measured 12 vs 53 ms per KITTI-shape batch —
        # with the [0,1] cast fused on-device.
        if args.pool_file and os.path.exists(args.pool_file):
            stacked_pool = np.load(args.pool_file, mmap_mode="r")
            assert stacked_pool.dtype == np.dtype(args.pool_dtype), (
                f"pool file dtype {stacked_pool.dtype} != --pool-dtype "
                f"{args.pool_dtype}"
            )
            assert stacked_pool.shape == (args.pool, 3 * h, w, 3), (
                f"pool file shape {stacked_pool.shape} != requested "
                f"({args.pool}, {3 * h}, {w}, 3)"
            )
            # np.array (not asarray): asarray on a read-only memmap returns a
            # VIEW, leaving every fancy-index page-cache bound — force a copy
            stacked_pool = np.array(stacked_pool)
            print(f"loaded {args.pool}-snippet pool from {args.pool_file}",
                  flush=True)
        else:
            print(f"pregenerating {args.pool}-snippet pool ...", flush=True)
            def _store(img):
                if args.pool_dtype == "uint8":
                    return np.round(img * 255.0).astype(np.uint8)
                return img.astype(np.float32)

            stacked_pool = np.stack([
                _store(make_snippet(rng, h, w, **gen_kw)[0])
                for _ in range(args.pool)
            ])
            if args.pool_file:
                np.save(args.pool_file, stacked_pool)
                print(f"saved pool to {args.pool_file}", flush=True)

        if args.pool_device:
            # one bulk upload, then batches never cross the tunnel again:
            # sample + mirror-flip + [0,1] cast run on device
            t_up = time.time()
            pool_dev = jax.device_put(stacked_pool)
            jax.block_until_ready(pool_dev)
            print(
                f"uploaded pool to device HBM "
                f"({stacked_pool.nbytes / 1e9:.2f} GB, "
                f"{time.time() - t_up:.0f}s)",
                flush=True,
            )
            is_u8 = stacked_pool.dtype == np.uint8
            del stacked_pool  # eval uses the fresh host generator

            @jax.jit
            def _sample(key, pool):
                k1, k2 = jax.random.split(key)
                idx = jax.random.randint(k1, (args.batch,), 0, args.pool)
                b = pool[idx].astype(jnp.float32)
                if is_u8:
                    b = b / 255.0
                if not args.no_flip:
                    flip = jax.random.bernoulli(k2, 0.5, (args.batch,))
                    b = jnp.where(flip[:, None, None, None], b[:, :, ::-1, :], b)
                return b

            _dkey = {"k": jax.random.PRNGKey(123)}

            def next_batch():
                _dkey["k"], sub = jax.random.split(_dkey["k"])
                return _sample(sub, pool_dev)

        else:

            def next_batch():
                idx = rng.randint(0, args.pool, size=args.batch)
                b = stacked_pool[idx]
                if not args.no_flip:
                    flip = rng.rand(len(idx)) < 0.5  # mirrored motion = new snippet
                    b[flip] = b[flip, :, ::-1]
                return b

    else:

        def next_batch():
            b = make_batch(rng, args.batch, h, w, **gen_kw)[0]
            if args.quantize_fresh:
                b = np.round(b * 255.0).astype(np.uint8)
            return b

    infer = jax.jit(lambda p, a, b: inference_flow(p, cfg, a, b))

    sup_step = None
    if args.supervised:
        import optax

        sup_opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)

        def _sup_loss(params, im1, im2, gt):
            flow = inference_flow(params, cfg, im1, im2)
            return jnp.mean(jnp.abs(flow - gt))

        @jax.jit
        def sup_step(state, stacked, gt):
            im1 = stacked[:, h : 2 * h]
            im2 = stacked[:, 2 * h :]
            loss, grads = jax.value_and_grad(_sup_loss)(
                state.params, im1, im2, gt
            )
            updates, opt_state = sup_opt.update(
                grads, state.opt_state, state.params
            )
            params2 = optax.apply_updates(state.params, updates)
            z = jnp.zeros_like(loss)
            return type(state)(state.step + 1, params2, opt_state), {
                "loss_total": loss, "loss_pixel": z, "loss_ssim": z,
            }

    # the bar every curve is judged against, on the IDENTICAL held-out set
    zf = evaluate(None, args, gen_kw, None, zero_flow=True)
    print(json.dumps({"zero_flow": zf}), flush=True)

    def save(it):
        if args.save:
            from unopticalflow_tpu.utils.checkpoint import save_checkpoint

            save_checkpoint(args.save, it, state.params, state.opt_state)

    u8cast = jax.jit(lambda u: u.astype(jnp.float32) / 255.0)

    def put(b):
        if isinstance(b, jax.Array):
            return b  # already device-resident (--pool-device)
        return u8cast(jnp.asarray(b)) if b.dtype == np.uint8 else jnp.asarray(b)

    t0 = time.time()
    it = it0
    while it < args.iters:
        if sup_step is not None:
            sb, sgt, _ = make_batch(rng, args.batch, h, w, **gen_kw)
            state, m = sup_step(state, jnp.asarray(sb), jnp.asarray(sgt))
            last_it = it
        elif K > 1:
            # one dispatch covers iterations [it, it+K-1]; metrics come back
            # stacked (K,), so the printed line is labeled with the TRUE
            # iteration of the sub-step it reports (the last one)
            bs = [next_batch() for _ in range(K)]
            # device-resident batches (--pool-device) stack on device;
            # np.stack would silently pull them back across the tunnel
            kb = (jnp.stack(bs) if isinstance(bs[0], jax.Array)
                  else np.stack(bs))
            state, m = step(state, put(kb))
            last_it = it + K - 1
        else:
            state, m = step(state, put(next_batch()))
            last_it = it
        if it % 250 < max(1, K if sup_step is None else 1) or last_it >= args.iters - 1:
            def _scalar(v):
                v = np.asarray(v)
                return float(v.reshape(-1)[-1])
            print(
                f"iter {last_it}: total {_scalar(m['loss_total']):.4f} "
                f"pixel {_scalar(m['loss_pixel']):.4f} "
                f"ssim {_scalar(m['loss_ssim']):.4f} ({time.time() - t0:.0f}s)",
                flush=True,
            )
        if args.eval_every and it % args.eval_every == 0:
            # includes iter 0: the near-init EPE point anchors the curve
            mid = evaluate(state.params, args, gen_kw, infer)
            print(json.dumps({"iter": it, **mid}), flush=True)
            save(it)
        it = last_it + 1 if sup_step is not None or K == 1 else it + K
    save(args.iters)

    result = {
        "benchmark": "synthetic piecewise-motion EPE (occlusion-aware)",
        "iters": args.iters,
        "hw": list(args.hw),
        "precision": prec,
        "loss_precision": loss_prec,
        "lr": args.lr,
        "lr_schedule": args.lr_schedule,
        "init": args.init,
        "smooth_weight": args.smooth_weight,
        "w_pixel": args.w_pixel,
        "w_ssim": args.w_ssim,
        "supervised": args.supervised,
        "batch": args.batch,
        "eval_snippets": args.eval_snippets,
        "max_bg": args.max_bg,
        "max_fg": args.max_fg,
        "tex_power": args.tex_power,
        "occlusion_weights": not args.no_occlusion_weights,
        "platform": jax.devices()[0].platform,
        **evaluate(state.params, args, gen_kw, infer),
        "zero_flow": zf,
        "pred_probe": prediction_probe(args, gen_kw, infer, state.params),
        "train_seconds": round(time.time() - t0, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
