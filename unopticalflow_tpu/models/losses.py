"""Occlusion-aware unsupervised flow loss stack.

Capability parity with the reference Model_flow loss methods
(/root/reference/core/networks/model_flow_paper.py:36-195):

* diff-weight occlusion masks: per-pixel softmax over the (bwd, fwd) warped
  photometric errors, detached, sharpened by ``2*exp(-(w-0.5)^2/0.03)`` and
  gated by a warped-pixel-validity mask (:101-134),
* masked L1 photometric loss (:90-99),
* masked SSIM loss (:137-148),
* second-order edge-aware smoothness on flow/20 (:157-177),
* forward/backward consistency of flow directions on occluded pixels, with
  the backward direction detached (:180-195).

All losses are per-sample ``(B,)`` vectors summed over ``num_scales`` scales;
the *caller* applies config weights and the batch mean (train.py:147-150).
Everything is elementwise VPU work that XLA fuses into the backward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unopticalflow_tpu.ops.ssim import ssim

_EPS_DIV = 1e-12


def _mean_bhwc(x: jax.Array) -> jax.Array:
    """Mean over all but the batch axis -> (B,), accumulated in float32.

    The fp32 accumulator keeps the per-sample losses exact even when the
    image-space loss stack runs in bfloat16 (FlowModelConfig.loss_dtype).
    """
    return jnp.mean(x, axis=(1, 2, 3), dtype=jnp.float32)


def flow_normalization(flow: jax.Array) -> jax.Array:
    """flow / (||flow||_2 + 1e-12) per pixel (model_flow_paper.py:44-51).

    The sum-of-squares gets a denormal floor before the sqrt so the gradient
    is finite at exactly-zero flow (numerically < 1e-12 from the reference).
    """
    norm = jnp.sqrt(jnp.sum(flow * flow, axis=-1, keepdims=True) + 1e-24)
    return flow / (norm + _EPS_DIV)


def diff_and_occlusion_weights(imgs_from_l, imgs, imgs_from_r, num_scales: int):
    """Per-scale photometric diffs and occlusion weights (:101-134).

    Args:
        imgs_from_l / imgs_from_r: images warped from the previous / next
            frame, one per scale (already validity-masked by the warp).
        imgs: center-frame pyramid.

    Returns:
        (diff_bwd, diff_fwd, weight_bwd, weight_fwd): lists over scales of
        (B, H, W, 1) tensors; weights are detached from the graph.
    """
    diff_bwd, diff_fwd, weight_bwd, weight_fwd = [], [], [], []
    for s in range(num_scales):
        from_l, img, from_r = imgs_from_l[s], imgs[s], imgs_from_r[s]

        # a warped pixel is valid unless every channel is exactly zero
        valid_fwd = 1.0 - jnp.all(from_r == 0, axis=-1, keepdims=True).astype(img.dtype)
        valid_bwd = 1.0 - jnp.all(from_l == 0, axis=-1, keepdims=True).astype(img.dtype)

        diff_l = jnp.mean(jnp.abs(img - from_l), axis=-1, keepdims=True)
        diff_r = jnp.mean(jnp.abs(img - from_r), axis=-1, keepdims=True)

        w = 1.0 - jax.nn.softmax(jnp.concatenate([diff_l, diff_r], -1), axis=-1)
        w = jax.lax.stop_gradient(w)
        w = 2.0 * jnp.exp(-jnp.square(w - 0.5) / 0.03)

        weight_bwd.append(w[..., 0:1] * valid_bwd)
        weight_fwd.append(w[..., 1:2] * valid_fwd)
        diff_bwd.append(diff_l)
        diff_fwd.append(diff_r)
    return diff_bwd, diff_fwd, weight_bwd, weight_fwd


def diff_and_occlusion_weights_packed(
    warped_lr, imgs, num_scales: int, use_weights: bool = True
):
    """Batch-packed variant of :func:`diff_and_occlusion_weights`.

    ``warped_lr[s]`` stacks the from-prev (bwd) and from-next (fwd) warped
    images along the batch axis as ``[from_l; from_r]`` of shape (2B, H, W, C)
    — the layout the merged single decoder/warp pass produces.  Returns
    per-scale (2B, H, W, 1) diffs and occlusion weights in the same packed
    order.  Identical per-sample math to the unpacked form
    (model_flow_paper.py:101-134); only the batching differs.

    ``use_weights=False`` is the occlusion-ablation switch
    (FlowModelConfig.use_occlusion_weights): the softmax diff-weights are
    replaced by 1, leaving only the warp-validity mask.
    """
    diffs, weights = [], []
    for s in range(num_scales):
        w2 = warped_lr[s]
        img = imgs[s]
        b = img.shape[0]

        valid = 1.0 - jnp.all(w2 == 0, axis=-1, keepdims=True).astype(img.dtype)
        diff = jnp.mean(
            jnp.abs(jnp.concatenate([img, img], 0) - w2), axis=-1, keepdims=True
        )

        if use_weights:
            w = 1.0 - jax.nn.softmax(
                jnp.concatenate([diff[:b], diff[b:]], -1), axis=-1
            )
            w = jax.lax.stop_gradient(w)
            w = 2.0 * jnp.exp(-jnp.square(w - 0.5) / 0.03)
            w2dir = jnp.concatenate([w[..., 0:1], w[..., 1:2]], 0)
            weights.append(w2dir * valid)
        else:
            weights.append(valid)
        diffs.append(diff)
    return diffs, weights


def masked_diff_loss(diffs, occ_masks, num_scales: int) -> jax.Array:
    """Sum over scales of mean(diff * occ) / (mean(occ) + eps) (:90-99)."""
    total = 0.0
    for s in range(num_scales):
        divider = _mean_bhwc(occ_masks[s])
        total = total + _mean_bhwc(diffs[s] * occ_masks[s]) / (divider + _EPS_DIV)
    return total


def masked_ssim_loss(imgs, imgs_warped, occ_masks, num_scales: int) -> jax.Array:
    """Sum over scales of the masked DSSIM loss (:137-148)."""
    total = 0.0
    for s in range(num_scales):
        occ = occ_masks[s]
        divider = _mean_bhwc(occ)
        s_map = ssim(imgs[s] * occ, imgs_warped[s] * occ)
        loss = _mean_bhwc(jnp.clip((1.0 - s_map) / 2.0, 0.0, 1.0))
        total = total + loss / (divider + _EPS_DIV)
    return total


def _grad_x(x):
    return x[:, :, 1:, :] - x[:, :, :-1, :]


def _grad_y(x):
    return x[:, 1:, :, :] - x[:, :-1, :, :]


def second_order_smoothness(flow: jax.Array, img: jax.Array) -> jax.Array:
    """Edge-aware 2nd-order smoothness of one flow scale (:157-167).

    ``img`` may carry a smaller batch that divides ``flow``'s (the training
    pass duplicates the center frame for the packed [bwd; fwd] flows) — the
    edge weights are then computed once and tiled, which is exact because
    both halves share the identical image.
    """
    w_x = jnp.exp(-10.0 * jnp.mean(jnp.abs(_grad_x(img)), axis=-1, keepdims=True))
    w_y = jnp.exp(-10.0 * jnp.mean(jnp.abs(_grad_y(img)), axis=-1, keepdims=True))
    if img.shape[0] != flow.shape[0]:
        reps = flow.shape[0] // img.shape[0]
        w_x = jnp.concatenate([w_x] * reps, 0)
        w_y = jnp.concatenate([w_y] * reps, 0)
    dx2 = _grad_x(_grad_x(flow))
    dy2 = _grad_y(_grad_y(flow))
    err = _mean_bhwc(w_x[:, :, 1:, :] * jnp.abs(dx2)) + _mean_bhwc(
        w_y[:, 1:, :, :] * jnp.abs(dy2)
    )
    return err / 2.0


def flow_smooth_loss(flows, imgs, num_scales: int) -> jax.Array:
    """Sum over scales of second_order_smoothness(flow / 20, img) (:169-177)."""
    total = 0.0
    for s in range(num_scales):
        total = total + second_order_smoothness(flows[s] / 20.0, imgs[s])
    return total


def flow_consistency_loss(fwd_flows, bwd_flows, occ_masks, num_scales: int) -> jax.Array:
    """Direction consistency on occluded pixels, bwd detached (:180-195)."""
    total = 0.0
    for s in range(num_scales):
        fwd_n = flow_normalization(fwd_flows[s])
        bwd_n = jax.lax.stop_gradient(flow_normalization(bwd_flows[s]))
        occ = 1.0 - occ_masks[s]
        divider = _mean_bhwc(occ)
        loss = _mean_bhwc(jnp.abs(fwd_n + bwd_n) * occ)
        total = total + loss / (divider + _EPS_DIV)
    return total
