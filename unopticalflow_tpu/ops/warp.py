"""Differentiable backward warping by an optical-flow field.

Semantics match the reference's ``warp_flow``
(/root/reference/core/networks/structures/net_utils.py:16-54), which builds a
pixel mesh grid, adds the flow, normalizes to [-1, 1] with a (W-1)/(H-1)
denominator and calls ``grid_sample`` with PyTorch-1.2 defaults
(align_corners=True, padding_mode='zeros').  Un-normalizing, that is exactly:
sample image at pixel position ``(x + u, y + v)`` with bilinear weights, where
any of the four integer taps falling outside the image contributes zero.

The optional validity mask reproduces ``grid_sample(ones)`` thresholded at
0.9999 (net_utils.py:47-52): a pixel is valid iff the total in-bounds bilinear
weight is >= 0.9999, i.e. the sampling footprint lies fully inside the image.

TPU notes: the 4-tap gather is expressed as ``take_along_axis`` over the
flattened H*W axis, which XLA lowers to a vectorized dynamic-gather; all
arithmetic is elementwise VPU work fused by XLA.  Layout is NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gather_hw(
    img: jax.Array, iy: jax.Array, ix: jax.Array, flat: bool = False
) -> jax.Array:
    """Gather img[b, iy[b,h,w], ix[b,h,w], :] -> (B, H, W, C).

    Indices must already be clipped to the valid range.

    Formulation note (v5e, measured): the flat ``jnp.take`` over (B*H*W, C)
    is the fastest forward (~11% over ``take_along_axis``: 4.55 vs 5.10
    ns/row, benchmarks/gather_probe.py) but its OWN transpose — a flat
    scatter — is ~4x slower in-graph.  No-grad paths (the u32-packed loss
    warps) use ``flat=True`` directly; differentiable paths go through
    ``_gather_hw_diff`` below, which pairs the flat forward with a
    hand-written batched-scatter VJP (the ``take_along_axis`` adjoint).
    """
    b, h, w, c = img.shape
    if flat:
        off = (jnp.arange(b, dtype=jnp.int32) * (h * w)).reshape(b, 1, 1)
        idx = (iy * w + ix + off).reshape(-1)
        # Note (v5e, HLO inspection): XLA lowers this 2-D (rows, c) take via
        # channel-major relayout while-loops (~6 ms/step at the recipe).
        # Expressing it instead as a 1-D chunk gather (flattened operand,
        # slice_sizes=(c,), starts = idx*c) to skip the relayouts was benched
        # at ~100x SLOWER end-to-end — XLA scalarizes small-slice 1-D
        # gathers.  The relayout loops are part of the fastest known form.
        fi = img.reshape(b * h * w, c)
        out = jnp.take(fi, idx, axis=0)
        return out.reshape(b, iy.shape[1], iy.shape[2], c)
    flat2 = img.reshape(b, h * w, c)
    idx = (iy * w + ix).reshape(b, -1, 1)
    out = jnp.take_along_axis(flat2, idx, axis=1)
    return out.reshape(b, iy.shape[1], iy.shape[2], c)


@jax.custom_vjp
def _gather_hw_diff(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Differentiable row gather: flat-take forward, batched-scatter backward.

    Decouples the two formulations: the flat ``jnp.take`` forward is ~11%
    faster per row than ``take_along_axis`` (benchmarks/gather_probe.py), but
    its OWN transpose (a flat scatter over B*H*W rows) is ~4x slower — so the
    hand-written VJP scatters in the batched (B, H*W, C) form, exactly the
    adjoint XLA builds for ``take_along_axis``.
    """
    return _gather_hw(img, iy, ix, flat=True)


def _ghd_fwd(img, iy, ix):
    # dtype token: residuals must be JAX types, so carry an empty array
    token = jnp.zeros((0,) + img.shape, img.dtype)
    return _gather_hw(img, iy, ix, flat=True), (token, iy, ix)


def _ghd_bwd(res, g):
    import numpy as _np

    from jax import dtypes as _dtypes

    token, iy, ix = res
    _, b, h, w, c = token.shape
    idx = (iy * w + ix).reshape(b, -1)
    g2 = g.reshape(b, idx.shape[1], c)
    d = (
        jnp.zeros((b, h * w, c), g2.dtype)
        .at[jnp.arange(b)[:, None], idx]
        .add(g2)
    )
    zero_i = _np.zeros(iy.shape, _dtypes.float0)
    zero_x = _np.zeros(ix.shape, _dtypes.float0)
    return d.reshape(b, h, w, c).astype(token.dtype), zero_i, zero_x


_gather_hw_diff.defvjp(_ghd_fwd, _ghd_bwd)


def _coords_f32(flow, img_hw):
    """Sampling positions (x, y) = grid + flow, ALWAYS in float32.

    Coordinate math must not run in the flow dtype: under the production
    bfloat16 recipe the ulp of x near W=832 is 4.0 px, so ``x - floor(x)``
    collapses to 0 over most of the frame — bilinear weights degenerate and
    the photometric gradient w.r.t. flow vanishes (this silently stalled
    bf16 training at KITTI resolution while 64x128 runs still learned).
    All corner indices/weights derive from these f32 positions; gathered
    values stay in the image dtype.
    """
    h, w = img_hw
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    x = gx + flow[..., 0].astype(jnp.float32)
    y = gy + flow[..., 1].astype(jnp.float32)
    return x, y


def _corner_weights(img_hw, x, y):
    """Bilinear corner indices, weights and in-bounds masks at (x, y)."""
    h, w = img_hw
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    corners = []
    for yi, xi, wgt in (
        (y0, x0, (1.0 - dy) * (1.0 - dx)),
        (y0, x1, (1.0 - dy) * dx),
        (y1, x0, dy * (1.0 - dx)),
        (y1, x1, dy * dx),
    ):
        inb = (
            (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        ).astype(wgt.dtype)
        corners.append((yi, xi, wgt * inb))
    return corners


def warp_corners(
    img: jax.Array,
    flow: jax.Array,
    gather_u32: bool = False,
    gather_u8: bool = False,
):
    """Gather the packed 2x2 corner window per output pixel (no blend).

    Returns (B, H, W, 4C) with corner-major channels
    [(y,x), (y,x+1), (y+1,x), (y+1,x+1)] x C — the input contract of the
    fused photometric kernel (ops/pallas_photometric.py), which recomputes
    the bilinear weights from ``flow`` itself.
    """
    b, h, w, c = img.shape
    x, y = _coords_f32(flow, (h, w))
    corners = _corner_weights((h, w), x, y)
    return _gather_corners(
        img, corners, (h, w), gather_u32=gather_u32, gather_u8=gather_u8
    )


def blend_corners(four: jax.Array, flow: jax.Array, img_hw, use_mask=False):
    """Bilinear blend of warp_corners output (JAX reference composition)."""
    h, w = img_hw
    x, y = _coords_f32(flow, (h, w))
    corners = _corner_weights((h, w), x, y)
    c = four.shape[-1] // 4
    out = 0.0
    for k, (_, _, wgt) in enumerate(corners):
        # blend in f32 (weights are f32 by _coords_f32); cast once at the end
        out = out + four[..., k * c : (k + 1) * c].astype(jnp.float32) * wgt[..., None]
    if use_mask:
        total_w = corners[0][2] + corners[1][2] + corners[2][2] + corners[3][2]
        out = out * (total_w >= 0.9999).astype(jnp.float32)[..., None]
    return out.astype(four.dtype)


def _gather_corners(img, corners, img_hw, gather_u32=False, gather_u8=False):
    """Single gather of 2x2 windows packed into channels (best for small C).

    Each gathered row on TPU occupies a full 128-lane tile, so gathering
    C-channel rows four times wastes 4x the tiles when C is small.  Packing
    the four corner pixels of a 1-px zero-padded image into 4C channels makes
    one gather fetch the whole bilinear footprint.  The zero border makes the
    clamped base index reproduce grid_sample's zero padding for partially
    out-of-bounds footprints; fully OOB footprints already have zero weights.

    ``gather_u32``: bitcast bf16 channel pairs to uint32 around the gather —
    measured ~12% faster per row on v5e (benchmarks/gather_probe.py).  Only
    valid when no gradient flows to ``img`` through the gather (the loss
    warps: pyramid images are stop_gradient'd; flow gradients ride the
    bilinear weights outside) — an integer-typed gather has no VJP.

    ``gather_u8``: additionally quantize the (no-grad) image to uint8 before
    packing, so each gathered row is 4C u8 = C u32 lanes instead of 2C —
    halving the gather row bytes, the table-build writes and the relayout
    volume.  Requires values in [0, 1].  Quantization error is <= 1/510 per
    channel; for 8-bit-sourced images (every dataset here) the finest loss
    scale is exactly representable.  Pixels darker than 1/510 in every
    channel quantize to 0 and are treated as warp-invalid by the
    all-channels-zero validity test downstream — same class of edge case the
    reference's own zero-padding test has for true-black pixels.
    """
    h, w = img_hw
    odtype = img.dtype
    if gather_u8:
        img = jnp.round(jnp.clip(img.astype(jnp.float32), 0.0, 1.0) * 255.0).astype(
            jnp.uint8
        )
    pad = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    packed = jnp.concatenate(
        [
            pad[:, :-1, :-1],  # (y, x)
            pad[:, :-1, 1:],  # (y, x+1)
            pad[:, 1:, :-1],  # (y+1, x)
            pad[:, 1:, 1:],  # (y+1, x+1)
        ],
        axis=-1,
    )  # (B, H+1, W+1, 4C)
    y0, x0 = corners[0][0], corners[0][1]
    iy = jnp.clip(y0 + 1, 0, h)
    ix = jnp.clip(x0 + 1, 0, w)
    if gather_u8:
        # 4C is always a multiple of 4: u8 channels pack exactly into u32.
        b, hp, wp, c4 = packed.shape
        u = jax.lax.bitcast_convert_type(
            packed.reshape(b, hp, wp, c4 // 4, 4), jnp.uint32
        )
        four_u = _gather_hw(u.reshape(b, hp, wp, c4 // 4), iy, ix, flat=True)
        four8 = jax.lax.bitcast_convert_type(four_u, jnp.uint8).reshape(
            b, iy.shape[1], iy.shape[2], c4
        )
        return four8.astype(odtype) * jnp.asarray(1.0 / 255.0, odtype)
    if gather_u32 and img.dtype == jnp.bfloat16:
        # 4C is always even, so bf16 channels pair exactly into uint32 lanes.
        b, hp, wp, c4 = packed.shape
        u = jax.lax.bitcast_convert_type(
            packed.reshape(b, hp, wp, c4 // 2, 2), jnp.uint32
        )
        # flat take: valid here because this path carries no gradient
        four_u = _gather_hw(u.reshape(b, hp, wp, c4 // 2), iy, ix, flat=True)
        # u32 -> bf16 bitcast appends a trailing pair dim; fold it back
        four = jax.lax.bitcast_convert_type(four_u, jnp.bfloat16).reshape(
            b, iy.shape[1], iy.shape[2], c4
        )
    else:
        four = _gather_hw_diff(packed, iy, ix)  # (B, H, W, 4C)
    return four


def warp_corners_cm(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Channel-major no-grad corner fetch: (B,H,W,C bf16) -> (2C, B, H, W) u32.

    Same footprint semantics as ``warp_corners(..., gather_u32=True)`` but the
    packed corner table is built channel-major — (2C u32-pairs, B*(H+1)*(W+1))
    — and fetched with ``jnp.take(op, idx, axis=1)``.  Measured on v5e
    (benchmarks/gather_probe.py --layout): the channel-major take runs at
    4.93 ns/row vs 5.34 for the row-major form — XLA's row-major lowering
    spends the difference in channel-major relayout while-loops that vanish
    when operand AND output are already channel-major.  The consumer
    (ops/pallas_photometric.py::photometric_pack_cm) reads the (2C, B, H, W)
    u32 output directly — no NHWC->NCHW boundary transpose — and unpacks the
    bf16 pairs in-register (bf16 -> f32 is a 16-bit left shift).

    Requires ``img.dtype == bfloat16`` (pair packing) and carries no gradient
    (integer-typed gather; the loss-warp images are stop_gradient'd).
    Channel order: u32 pair p holds corner-major bf16 channels (2p, 2p+1),
    element 0 in the LOW half-word (little-endian bitcast).
    """
    b, h, w, c = img.shape
    assert img.dtype == jnp.bfloat16, "cm corner fetch requires bf16 pairs"
    x, y = _coords_f32(flow, (h, w))
    corners = _corner_weights((h, w), x, y)

    # Build the (2C, R) operand DIRECTLY as one fusion output.  An earlier
    # form produced (B, HP, WP, 2C) and transpose+reshaped it; XLA
    # materialized that as TWO full relayout while-loops per table (e.g.
    # u32[48,257,833] -> flat T(1024) -> (6, R); ~3.8 ms/step total at the
    # KITTI recipe).  Here every input-side pad/slice/reshape fuses into the
    # stack's write, and the bf16 pair packs via u16-bitcast + shift/or
    # (elementwise — the trailing-pair-dim bitcast would reintroduce a
    # layout step).  Element 0 of each pair sits in the LOW half-word,
    # matching the little-endian contract of the packed path.
    pad = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hp, wp = h + 1, w + 1
    chans = []
    for sy, sx in (
        (slice(0, -1), slice(0, -1)),
        (slice(0, -1), slice(1, None)),
        (slice(1, None), slice(0, -1)),
        (slice(1, None), slice(1, None)),
    ):
        for ch in range(c):
            chans.append(pad[:, sy, sx, ch].reshape(-1))  # (R,) bf16
    rows = []
    for p in range(2 * c):
        lo = jax.lax.bitcast_convert_type(chans[2 * p], jnp.uint16).astype(
            jnp.uint32
        )
        hi = jax.lax.bitcast_convert_type(
            chans[2 * p + 1], jnp.uint16
        ).astype(jnp.uint32)
        rows.append(lo | (hi << 16))
    op = jnp.stack(rows, axis=0)  # (2C, B*HP*WP)

    y0, x0 = corners[0][0], corners[0][1]
    iy = jnp.clip(y0 + 1, 0, h)
    ix = jnp.clip(x0 + 1, 0, w)
    off = (jnp.arange(b, dtype=jnp.int32) * (hp * wp)).reshape(b, 1, 1)
    fidx = (iy * wp + ix + off).reshape(-1)
    out = jnp.take(op, fidx, axis=1)  # (2C, B*H*W)
    return out.reshape(2 * c, b, h, w)


def bilinear_warp_nchw(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Differentiable warp returning NCHW — the decoder fast path.

    Same values as ``bilinear_warp(img, flow, use_mask=False)`` (NHWC in,
    transposed out), but the packed corner table is built channel-major and
    fetched with an axis-1 ``jnp.take``:

    * the channel-major take skips XLA's row-major relayout while-loops
      (benchmarks/gather_probe.py --layout);
    * its NATIVE adjoint is the channel-major scatter-add — measured 7.26 vs
      8.28 ns/row for the batched row-major form at decoder geometry
      (--diffwarp), so no custom VJP is needed;
    * the NCHW output feeds the Pallas cost-volume kernel
      (ops/pallas_kernels.py, NCHW-native) with no boundary transpose, and
      the df2 cotangent flows back in NCHW the same way.
    """
    b, h, w, c = img.shape
    x, y = _coords_f32(flow, (h, w))
    corners = _corner_weights((h, w), x, y)

    pad = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    packed = jnp.concatenate(
        [pad[:, :-1, :-1], pad[:, :-1, 1:], pad[:, 1:, :-1], pad[:, 1:, 1:]],
        axis=-1,
    )  # (B, H+1, W+1, 4C)
    hp, wp = h + 1, w + 1
    op = packed.transpose(3, 0, 1, 2).reshape(4 * c, b * hp * wp)

    y0, x0 = corners[0][0], corners[0][1]
    iy = jnp.clip(y0 + 1, 0, h)
    ix = jnp.clip(x0 + 1, 0, w)
    off = (jnp.arange(b, dtype=jnp.int32) * (hp * wp)).reshape(b, 1, 1)
    fidx = (iy * wp + ix + off).reshape(-1)
    four = jnp.take(op, fidx, axis=1).reshape(4 * c, b, h, w)

    out = 0.0
    for k, (_, _, wgt) in enumerate(corners):
        # blend in f32 (weights are f32 by _coords_f32); cast once at the end
        out = out + four[k * c : (k + 1) * c].astype(jnp.float32) * wgt[None]
    return out.astype(img.dtype).transpose(1, 0, 2, 3)  # (B, C, H, W)


def bilinear_warp(
    img: jax.Array, flow: jax.Array, use_mask: bool = False,
    gather_u32: bool = False, gather_u8: bool = False,
) -> jax.Array:
    """Warp ``img`` (the *target* frame) back to the source frame by ``flow``.

    Args:
        img:  (B, H, W, C) target image/features.
        flow: (B, H, W, 2) flow in pixels; channel 0 = x (width) displacement,
              channel 1 = y (height) displacement — same channel convention as
              the reference (net_utils.py:29-39).
        use_mask: multiply the output by the border-validity mask
              (net_utils.py:47-52).

    Returns:
        (B, H, W, C) warped image.
    """
    b, h, w, c = img.shape
    x, y = _coords_f32(flow, (h, w))

    # TPU gathers are index-rate-bound (~10+ cycles per index), so the packed
    # form (1 gather of 4C-channel rows) beats 4 C-channel gathers at every
    # channel width; its scatter transpose wins identically.
    corners = _corner_weights((h, w), x, y)
    four = _gather_corners(
        img, corners, (h, w), gather_u32=gather_u32, gather_u8=gather_u8
    )
    out = 0.0
    for k, (_, _, wgt) in enumerate(corners):
        # blend in f32 (weights are f32 by _coords_f32); cast once at the end
        out = out + four[..., k * c : (k + 1) * c].astype(jnp.float32) * wgt[..., None]

    if use_mask:
        total_w = corners[0][2] + corners[1][2] + corners[2][2] + corners[3][2]
        mask = (total_w >= 0.9999).astype(jnp.float32)[..., None]
        out = out * mask
    return out.astype(img.dtype)


def warp_validity_mask(flow: jax.Array, img_hw) -> jax.Array:
    """Standalone validity mask: 1 where the warp footprint is in-bounds.

    Equals ``grid_sample(ones)`` thresholded at 0.9999 (net_utils.py:47-52).

    Args:
        flow: (B, H, W, 2) flow in pixels.
        img_hw: (H, W) of the image being sampled.

    Returns:
        (B, H, W, 1) float mask.
    """
    h, w = img_hw
    x, y = _coords_f32(flow, (h, w))
    total_w = 0.0
    for _, _, wgt in _corner_weights((h, w), x, y):
        total_w = total_w + wgt
    return (total_w >= 0.9999).astype(flow.dtype)[..., None]
