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

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def ldtype(self):
        return jnp.dtype(self.loss_dtype)


def init_flow_model(key, dtype=jnp.float32):
    """Initialize the full parameter tree {fpyramid, pwc}."""
    k1, k2 = jax.random.split(key)
    return {
        "fpyramid": init_feature_pyramid(k1, dtype),
        "pwc": init_pwc_decoder(k2, dtype),
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
    f1 = apply_feature_pyramid(params["fpyramid"], img1, cfg.cdtype)
    f2 = apply_feature_pyramid(params["fpyramid"], img2, cfg.cdtype)
    return _decode(params, cfg, f1, f2, img_hw)[0].astype(jnp.float32)


def forward(params, cfg: FlowModelConfig, images):
    """Training forward pass -> loss pack (model_flow_paper.py:205-255).

    Args:
        images: (B, 3*H, W, 3) vertically stacked frame triplet
            (prev, center, next), values in [0, 1].

    Returns:
        dict of per-sample (B,) float32 losses:
        loss_pixel, loss_ssim, loss_flow_smooth, loss_flow_consis.
    """
    img_h = images.shape[1] // 3
    img_w = images.shape[2]
    imgl = images[:, :img_h]
    img = images[:, img_h : 2 * img_h]
    imgr = images[:, 2 * img_h :]

    feat_l = _encode(params, cfg, imgl)
    feat_c = _encode(params, cfg, img)
    feat_r = _encode(params, cfg, imgr)

    flows_bwd = _decode(params, cfg, feat_c, feat_l, (img_h, img_w))
    flows_fwd = _decode(params, cfg, feat_c, feat_r, (img_h, img_w))
    flows_bwd = [f.astype(jnp.float32) for f in flows_bwd]
    flows_fwd = [f.astype(jnp.float32) for f in flows_fwd]

    num_levels = len(flows_fwd)
    ld = cfg.ldtype
    pyr_l = avg_pool_pyramid(imgl.astype(ld), num_levels)
    pyr_c = avg_pool_pyramid(img.astype(ld), num_levels)
    pyr_r = avg_pool_pyramid(imgr.astype(ld), num_levels)

    warped_from_l = [
        bilinear_warp(i, f, use_mask=True) for i, f in zip(pyr_l, flows_bwd)
    ]
    warped_from_r = [
        bilinear_warp(i, f, use_mask=True) for i, f in zip(pyr_r, flows_fwd)
    ]

    ns = cfg.num_scales
    diff_bwd, diff_fwd, w_bwd, w_fwd = losses.diff_and_occlusion_weights(
        warped_from_l, pyr_c, warped_from_r, ns
    )

    loss_pack = {
        "loss_pixel": losses.masked_diff_loss(diff_fwd, w_fwd, ns)
        + losses.masked_diff_loss(diff_bwd, w_bwd, ns),
        "loss_ssim": losses.masked_ssim_loss(pyr_c, warped_from_r, w_fwd, ns)
        + losses.masked_ssim_loss(pyr_c, warped_from_l, w_bwd, ns),
        "loss_flow_smooth": losses.flow_smooth_loss(flows_fwd, pyr_c, ns)
        + losses.flow_smooth_loss(flows_bwd, pyr_c, ns),
        "loss_flow_consis": losses.flow_consistency_loss(
            flows_fwd, flows_bwd, w_fwd, ns
        ),
    }
    return loss_pack
