"""The flagship model: occlusion-aware unsupervised optical flow.

Capability parity with the reference ``Model_flow``
(/root/reference/core/networks/model_flow_paper.py:14-255): a shared feature
encoder applied to a 3-frame snippet, the PWC decoder run center->prev (bwd)
and center->next (fwd), multi-scale image pyramids, validity-masked backward
warps, and the 4-loss pack returned as per-sample vectors for the training
loop to weight and reduce.

This is a *functional* model: ``params`` is a pytree, ``forward`` /
``inference_flow`` are pure functions, and the whole training step (forward +
backward + Adam update) compiles to a single XLA program (see
training/train_step.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from unopticalflow_tpu.models import losses
from unopticalflow_tpu.models.feature_pyramid import (
    apply_feature_pyramid,
    init_feature_pyramid,
)
from unopticalflow_tpu.models.pwc_decoder import apply_pwc_decoder, init_pwc_decoder
from unopticalflow_tpu.ops.pyramid import avg_pool_pyramid
from unopticalflow_tpu.ops.warp import bilinear_warp


class FlowModelConfig(NamedTuple):
    """Static model hyperparameters (a subset of the YAML config)."""

    num_scales: int = 3
    # compute dtype for conv/corr work; params and losses stay float32.
    compute_dtype: str = "float32"
    # dtype for the image-space loss stack (pyramids, warps, diffs, SSIM);
    # per-sample loss reductions always accumulate in float32.
    loss_dtype: str = "float32"
    # route cost volumes through the Pallas TPU kernel
    use_pallas_corr: bool = False
    # route the photometric loss stack (warp blend + occlusion weights +
    # SSIM + masked reductions) through the fused Pallas kernel
    # (ops/pallas_photometric.py); falls back to the XLA composition when
    # any loss-scale height doesn't tile the 8-sublane kernel rows
    # ((H >> s) % 8 != 0 for some scale s < num_scales)
    use_pallas_photo: bool = False
    # route smoothness+consistency through ops/pallas_regularizer.py.
    # Off by default: measured ~2.5 ms/step SLOWER than XLA's own fusion of
    # the loss tail at the KITTI recipe (documented negative result); the
    # kernel stays for the validation surface and future revisit.
    use_pallas_reg: bool = False
    # uint8-quantize the (no-grad) loss-warp gathers: halves the gathered
    # row bytes / table writes / relayout volume of the dominant loss-warp
    # cost.  Exact for 8-bit-sourced images at the finest scale; <= 1/510
    # per-channel error on pooled scales (see ops/warp.py::_gather_corners).
    # Off by default so f32 parity paths stay bit-exact vs the reference.
    quantize_loss_warps: bool = False
    # channel-major loss-warp gathers + cm photometric kernels: skips the
    # gather's row-major relayout loops and the NHWC<->NCHW kernel-boundary
    # transposes (ops/warp.py::warp_corners_cm).  Measured faster on v5e at
    # the KITTI recipe; only takes effect on the fused bf16 Pallas path.
    channel_major_loss: bool = True
    # A/B: one 2B-packed loss gather per scale instead of two B-sized
    # dispatches.  Measured 26% SLOWER on v5e (see forward()) — kept as a
    # validated option for other geometries.
    pack2b_loss_gather: bool = False
    # NCHW decoder warps feeding a channel-major corr kernel (no layout
    # boundary).  Measured a small net regression on v5e at the KITTI recipe
    # (71.6 vs 70.9 ms/step; see models/pwc_decoder.py) — validated option.
    channel_major_decoder: bool = False
    # route correlations through the SPMD-partitionable variant
    # (ops/pallas_spmd.py): H-sharded spatial parallelism then keeps the
    # Pallas fast path (with ppermute halo exchanges over ICI) instead of
    # falling back to the XLA correlation.  Set automatically by
    # parallel/spatial.py; single-device runs leave it off.
    pallas_corr_spmd: bool = False
    # ablation switch: when False, the softmax diff-weight occlusion masks
    # (reference model_flow_paper.py:101-134) are replaced by the warp
    # validity mask alone — every in-frame pixel weighs equally in the
    # photometric losses.  Forces the unfused XLA loss path (the fused
    # Pallas kernel hard-codes the weights).  benchmarks/synthetic_epe.py
    # uses this to demonstrate the masks are what makes occluded scenes
    # trainable (the paper's central claim).
    use_occlusion_weights: bool = True

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def ldtype(self):
        return jnp.dtype(self.loss_dtype)


def init_flow_model(key, dtype=jnp.float32, scheme: str = "torch"):
    """Initialize the full parameter tree {fpyramid, pwc}.

    scheme="torch" (default) is the reference's torch-default init;
    scheme="pwc" is the official PWC-Net kaiming_normal init — required for
    from-scratch training at short horizons (see models/layers.py docstring:
    torch-default init makes the net input-blind at init, 4e-6 px output
    sensitivity, and no probe — supervised or unsupervised — escaped it).
    """
    k1, k2 = jax.random.split(key)
    return {
        "fpyramid": init_feature_pyramid(k1, dtype, scheme=scheme),
        "pwc": init_pwc_decoder(k2, dtype, scheme=scheme),
    }


def _decode(params, cfg: FlowModelConfig, feats1, feats2, img_hw):
    # NOTE: wrapping these in jax.checkpoint was measured on v5e to INCREASE
    # both step time (141 -> 262 ms) and temp memory (3.9 -> 7.0 GB) at the
    # KITTI recipe, so no remat knob is offered.
    return apply_pwc_decoder(
        params["pwc"],
        feats1,
        feats2,
        img_hw,
        compute_dtype=cfg.cdtype,
        use_pallas_corr=cfg.use_pallas_corr,
        channel_major=cfg.channel_major_decoder,
        spmd_corr=cfg.pallas_corr_spmd,
    )


def _encode(params, cfg: FlowModelConfig, img):
    return apply_feature_pyramid(params["fpyramid"], img, cfg.cdtype)


def inference_flow(params, cfg: FlowModelConfig, img1, img2):
    """Full-resolution flow img1 -> img2 (model_flow_paper.py:198-202).

    Args:
        img1/img2: (B, H, W, 3) in [0, 1].
    Returns:
        (B, H, W, 2) flow in pixels at network-input resolution.
    """
    img_hw = (img1.shape[1], img1.shape[2])
    b = img1.shape[0]
    # one encoder dispatch for both frames (stacked on batch)
    f = _encode(params, cfg, jnp.concatenate([img1, img2], 0))
    f1 = [x[:b] for x in f]
    f2 = [x[b:] for x in f]
    return _decode(params, cfg, f1, f2, img_hw)[0].astype(jnp.float32)


def forward(params, cfg: FlowModelConfig, images, return_aux: bool = False):
    """Training forward pass -> loss pack (model_flow_paper.py:205-255).

    Args:
        images: (B, 3*H, W, 3) vertically stacked frame triplet
            (prev, center, next), values in [0, 1].
        return_aux: also return intermediate flows/weights (used by the
            flow+pose joint branch, models/flowpose_model.py).

    Returns:
        dict of per-sample (B,) float32 losses:
        loss_pixel, loss_ssim, loss_flow_smooth, loss_flow_consis.
        With ``return_aux``: (pack, {"flows": [...(2B,h,w,2) packed
        [bwd; fwd], finest first], "weights": [...(2B,h,w,1)]}).
    """
    b = images.shape[0]
    img_h = images.shape[1] // 3
    img_w = images.shape[2]
    imgl = images[:, :img_h]
    img = images[:, img_h : 2 * img_h]
    imgr = images[:, 2 * img_h :]

    # Batch-packed execution: the three encoder passes run as ONE dispatch at
    # 3B, and the bwd (center->prev) + fwd (center->next) decoder passes as
    # ONE dispatch at 2B.  Per-sample math is identical to three/two separate
    # calls (convs don't mix batch elements); the packing triples/doubles the
    # GEMM M-dimension so the small-N estimator-tail convs tile the MXU far
    # better, and it halves warp/corr kernel dispatch count.
    feats = _encode(params, cfg, jnp.concatenate([img, imgl, imgr], 0))
    feat_c = [f[:b] for f in feats]
    feat_lr = [f[b:] for f in feats]  # (2B, ...) packed [left; right]

    feats_cc = [jnp.concatenate([fc, fc], 0) for fc in feat_c]
    flows = _decode(params, cfg, feats_cc, feat_lr, (img_h, img_w))
    flows = [f.astype(jnp.float32) for f in flows]  # (2B,...) [bwd; fwd]

    num_levels = len(flows)
    ld = cfg.ldtype
    pyr_c = avg_pool_pyramid(img.astype(ld), num_levels)
    pyr_lr = avg_pool_pyramid(
        jnp.concatenate([imgl, imgr], 0).astype(ld), num_levels
    )

    ns = cfg.num_scales
    pyr_cc = [jnp.concatenate([p, p], 0) for p in pyr_c[:ns]]

    def halves(v):  # (2B,) packed [bwd; fwd] -> per-sample (B,) sum
        return v[:b] + v[b:]

    flows_bwd = [f[:b] for f in flows[:ns]]
    flows_fwd = [f[b:] for f in flows[:ns]]

    fused = (
        cfg.use_pallas_photo
        and cfg.use_occlusion_weights
        and all((img_h >> s) % 8 == 0 for s in range(ns))
    )
    if fused:
        # fused Pallas photometric stack: ONE kernel per scale computes the
        # warp blend, occlusion weights, masked L1 and SSIM sums; only the
        # gather (corner fetch) stays in XLA.  The kernel's hand-written VJP
        # emits d(flow) only — its other inputs carry no gradient by
        # reference semantics (see ops/pallas_photometric.py).
        from unopticalflow_tpu.ops.pallas_photometric import (
            photometric_pack,
            photometric_pack_cm,
        )
        from unopticalflow_tpu.ops.pallas_regularizer import regularizer_pack
        from unopticalflow_tpu.ops.warp import warp_corners, warp_corners_cm

        loss_pixel = 0.0
        loss_ssim = 0.0
        loss_smooth = 0.0
        loss_consis = 0.0
        weights = []
        for s in range(ns):
            # per-direction corner fetches: a single 2B-packed gather was
            # measured 26% SLOWER on v5e (32.3 vs 25.7 ms of gathers at the
            # KITTI recipe) — XLA's gather strategy degrades at the larger
            # operand geometry, so keep two B-sized dispatches
            q8 = cfg.quantize_loss_warps
            cm = (
                cfg.channel_major_loss
                and not q8
                and not cfg.pack2b_loss_gather
                and ld == jnp.bfloat16
            )
            if cm:
                # channel-major fetch + cm kernel: skips the gather's
                # row-major relayout loops AND the 24-channel NHWC->NCHW
                # kernel-boundary transposes in both passes (warp.py::
                # warp_corners_cm, pallas_photometric.py::photometric_pack_cm)
                ffu = jnp.concatenate(
                    [
                        warp_corners_cm(pyr_lr[s][:b], flows_bwd[s]),
                        warp_corners_cm(pyr_lr[s][b:], flows_fwd[s]),
                    ],
                    axis=0,
                )
                out = photometric_pack_cm(
                    ffu, flows_bwd[s], flows_fwd[s], pyr_c[s]
                )
            elif cfg.pack2b_loss_gather:
                four = warp_corners(
                    pyr_lr[s], flows[s], gather_u32=True, gather_u8=q8
                )
                four_b, four_f = four[:b], four[b:]
            else:
                four_b = warp_corners(
                    pyr_lr[s][:b], flows_bwd[s], gather_u32=True, gather_u8=q8
                )
                four_f = warp_corners(
                    pyr_lr[s][b:], flows_fwd[s], gather_u32=True, gather_u8=q8
                )
            if not cm:
                out = photometric_pack(
                    four_b, four_f, flows_bwd[s], flows_fwd[s], pyr_c[s]
                )
            h_s, w_s = pyr_c[s].shape[1], pyr_c[s].shape[2]
            hw = h_s * w_s
            mean_w = out["s_w"] / hw + 1e-12
            loss_pixel = loss_pixel + (out["s_dw"] / hw) / mean_w
            loss_ssim = loss_ssim + (out["s_cl"] / hw) / mean_w
            weights.append(out["weights"])

            if cfg.use_pallas_reg:
                # fused smoothness + fb-consistency sums (reference
                # denominators applied here; ops/pallas_regularizer.py).
                # NOTE measured ~2.5 ms SLOWER than the XLA composition at
                # the KITTI recipe (XLA fuses the loss tail well) — kept as
                # an option and for the on-chip validation surface, off by
                # default.
                reg = regularizer_pack(
                    flows_bwd[s], flows_fwd[s], pyr_c[s],
                    jax.lax.stop_gradient(out["weights"][b:]),
                )
                err = reg["s_sx"] / (h_s * (w_s - 2) * 2) + reg["s_sy"] / (
                    (h_s - 2) * w_s * 2
                )
                loss_smooth = loss_smooth + err / 2.0
                occ_mean = 1.0 - out["s_w"][b:] / hw  # mean(1 - w_fwd)
                loss_consis = loss_consis + (reg["s_consis"] / (hw * 2)) / (
                    occ_mean + 1e-12
                )
    else:
        # one warp dispatch per scale for both directions (gathers on TPU
        # are index-rate-bound; packing halves fixed per-dispatch overhead).
        # gather_u32 is safe here: the pyramid images are stop_gradient'd,
        # so no VJP ever crosses the gather (see warp.py::_gather_corners).
        warped_lr = [
            bilinear_warp(
                i, f, use_mask=True, gather_u32=True,
                gather_u8=cfg.quantize_loss_warps,
            )
            for i, f in zip(pyr_lr[:ns], flows[:ns])
        ]
        diffs, weights = losses.diff_and_occlusion_weights_packed(
            warped_lr, pyr_c, ns, use_weights=cfg.use_occlusion_weights
        )
        loss_pixel = losses.masked_diff_loss(diffs, weights, ns)
        loss_ssim = losses.masked_ssim_loss(pyr_cc, warped_lr, weights, ns)

    if fused and cfg.use_pallas_reg:
        smooth = loss_smooth
        consis = loss_consis
    else:
        # pass the B-sized center pyramid: both packed halves share the same
        # image, so the edge weights compute once (losses.py tiles them)
        smooth = losses.flow_smooth_loss(flows, pyr_c[:ns], ns)
        consis = losses.flow_consistency_loss(
            flows_fwd, flows_bwd, [w[b:] for w in weights], ns
        )
    loss_pack = {
        "loss_pixel": halves(loss_pixel),
        "loss_ssim": halves(loss_ssim),
        "loss_flow_smooth": halves(smooth),
        "loss_flow_consis": consis,
    }
    if return_aux:
        return loss_pack, {"flows": flows, "weights": weights}
    return loss_pack


def forward_pair(params, cfg: FlowModelConfig, images, return_aux: bool = False):
    """2-frame training forward pass (extension; no 3-frame center exists).

    The reference's NYU pipeline emits 2-frame stacks whose flow mode was
    never runnable (its train loop calls ``inputs.cuda()`` on the dataset's
    tuple — SURVEY.md §2.2 quirk); this defines working 2-frame semantics:
    decode BOTH directions between the pair (packed 2B as [f1->f2; f2->f1]),
    and weight the photometric terms by the warp validity mask times a SOFT
    forward-backward consistency weight.  Soft (exponential in the fb error)
    rather than the classic hard UnFlow threshold: at random init no pixel
    passes a hard test, which would zero every loss weight and leave the
    model without gradient to bootstrap from.

    Args:
        images: (B, 2H, W, 3) stacked (frame1, frame2), values in [0, 1].

    Returns:
        loss pack {pixel, ssim, smooth, consis} of per-sample (B,) float32;
        with ``return_aux``: (pack, {"flows": [... (2B,h,w,2) packed
        [fwd; bwd]], "weights": [... (2B,h,w,1)]}).
    """
    from unopticalflow_tpu.models import losses as _losses

    b = images.shape[0]
    img_h = images.shape[1] // 2
    img1 = images[:, :img_h]
    img2 = images[:, img_h:]

    feats = _encode(params, cfg, jnp.concatenate([img1, img2], 0))
    f1 = [f[:b] for f in feats]
    f2 = [f[b:] for f in feats]
    feats_src = [jnp.concatenate([a, c], 0) for a, c in zip(f1, f2)]
    feats_tgt = [jnp.concatenate([c, a], 0) for a, c in zip(f1, f2)]
    flows = _decode(params, cfg, feats_src, feats_tgt, (img_h, images.shape[2]))
    flows = [f.astype(jnp.float32) for f in flows]  # packed [1->2; 2->1]

    num_levels = len(flows)
    ld = cfg.ldtype
    pyr1 = avg_pool_pyramid(img1.astype(ld), num_levels)
    pyr2 = avg_pool_pyramid(img2.astype(ld), num_levels)
    pyr_tgt = [jnp.concatenate([p2, p1], 0) for p1, p2 in zip(pyr1, pyr2)]
    pyr_src = [jnp.concatenate([p1, p2], 0) for p1, p2 in zip(pyr1, pyr2)]

    warped = [
        bilinear_warp(t, f, use_mask=True) for t, f in zip(pyr_tgt, flows)
    ]

    ns = cfg.num_scales
    weights = []
    backs = []  # bwd flow resampled into the source frame: f_ba(x + f_ab(x))
    for s in range(ns):
        f_ab = flows[s]
        f_ba = jnp.concatenate([flows[s][b:], flows[s][:b]], 0)
        back = bilinear_warp(f_ba, f_ab, use_mask=False)
        backs.append(back)
        sq = jnp.sum((f_ab + back) ** 2, -1, keepdims=True)
        mag = jnp.sum(f_ab**2 + back**2, -1, keepdims=True)
        soft = jnp.exp(-sq / (mag + 1.0))
        valid = 1.0 - jnp.all(warped[s] == 0, -1, keepdims=True).astype(f_ab.dtype)
        weights.append(jax.lax.stop_gradient(soft * valid).astype(ld))

    diffs = [
        jnp.mean(jnp.abs(p - w), -1, keepdims=True)
        for p, w in zip(pyr_src[:ns], warped[:ns])
    ]

    def halves(v):
        return v[:b] + v[b:]

    pack = {
        "loss_pixel": halves(_losses.masked_diff_loss(diffs, weights, ns)),
        "loss_ssim": halves(
            _losses.masked_ssim_loss(pyr_src[:ns], warped, weights, ns)
        ),
        "loss_flow_smooth": halves(_losses.flow_smooth_loss(flows, pyr_src, ns)),
        # fb-consistency in the SOURCE frame: compare f1->2(x) against the
        # resampled backward flow f2->1(x + f1->2(x)) (the same `backs` used
        # for the soft weights) rather than f2->1 at the raw raster position,
        # which only matches where motion is locally smooth.
        "loss_flow_consis": _losses.flow_consistency_loss(
            [f[:b] for f in flows[:ns]],
            [bk[:b] for bk in backs],
            [w[:b] for w in weights],
            ns,
        ),
    }
    if return_aux:
        return pack, {"flows": flows, "weights": weights}
    return pack
