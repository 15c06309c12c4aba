"""Pallas TPU kernels for the bandwidth-bound hot ops.

Cost-volume family.  The XLA formulation re-reads both feature maps from HBM
for each of the 81 displacements (pwc_tf.py:97-106 semantics); these kernels
stream each tile through VMEM a constant number of times and keep all 81
displacement planes on-chip.

Layout: operands are NCHW (B, C, H, W) — W rides the 128 lanes (well filled
at every pyramid level), C rides the un-padded major dim, so small channel
counts don't burn 42x lane padding the way NHWC C-minor tensors do.  The
public wrapper accepts/returns NHWC and inserts the transposes.

Halo handling: displacement +-md needs md extra rows; overlapping windows are
not expressible as one BlockSpec, so the H-padded operand is passed twice
with block indices (i, i+1) — with tile height TH >= 2 md the two consecutive
row-blocks cover every (TH + 2 md) window (assembled by sublane slicing).
W shifts are (unaligned) lane slices of the 2 md-wider block.

Backward: registered as a custom VJP built from two sibling kernels with
the same window machinery (a single fused df1+df2 kernel was measured ~65%
SLOWER on v5e — 8.7 vs 5.3 ms at the KITTI recipe; Mosaic pipelines the
6-input/2-output variant poorly — so the pair stands) —
    fwd:  cv[p, k]  = 1/C * sum_c f1[p, c] * f2p[p + s_k, c]
    df1:  df1[p, c] = 1/C * sum_k g[p, k] * f2p[p + s_k, c]
    df2:  df2[q, c] = 1/C * sum_k gp[q + s'_k, rev(k)] * f1p[q + s'_k, c]
with s_k = (dy, dx) in [0, 2md]^2 and s'_k = (2md - dy, 2md - dx) (operands
padded by md).  Accumulation is fp32 in VMEM scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# A/B knobs (UNFLOW_DIMSEM / UNFLOW_INFUSE): see ops/_tuning.py and
# benchmarks/PROFILE_r03.md for semantics + on-chip measurements.
from unopticalflow_tpu.ops._tuning import cparams as _cparams


def _rows(a_ref, b_ref, dy: int, tile_h: int, axis: int):
    """Rows [dy, dy+TH) of the halo window from two consecutive row-blocks."""
    if dy == 0:
        return a_ref[0]
    a = a_ref[0]
    b = b_ref[0]
    if dy == tile_h:
        return b
    sl_a = [slice(None)] * a.ndim
    sl_a[axis] = slice(dy, None)
    sl_b = [slice(None)] * b.ndim
    sl_b[axis] = slice(0, dy)
    return jnp.concatenate([a[tuple(sl_a)], b[tuple(sl_b)]], axis=axis)


def _corr_fwd_kernel(f1_ref, f2a_ref, f2b_ref, out_ref, *, md, tile_h, w):
    side = 2 * md + 1
    f1 = f1_ref[0].astype(jnp.float32)  # (C, TH, W)
    inv_c = 1.0 / f1.shape[0]
    for dy in range(side):
        win = _rows(f2a_ref, f2b_ref, dy, tile_h, axis=1)  # (C, TH, W+2md)
        for dx in range(side):
            f2s = win[:, :, dx : dx + w].astype(jnp.float32)
            out_ref[0, dy * side + dx] = (
                jnp.sum(f1 * f2s, axis=0) * inv_c
            ).astype(out_ref.dtype)


def _corr_df1_kernel(g_ref, f2a_ref, f2b_ref, out_ref, acc, *, md, tile_h, w):
    side = 2 * md + 1
    inv_c = 1.0 / out_ref.shape[1]
    acc[...] = jnp.zeros_like(acc)
    for dy in range(side):
        win = _rows(f2a_ref, f2b_ref, dy, tile_h, axis=1)
        for dx in range(side):
            gk = g_ref[0, dy * side + dx].astype(jnp.float32)  # (TH, W)
            f2s = win[:, :, dx : dx + w].astype(jnp.float32)  # (C, TH, W)
            acc[...] += gk[None] * f2s
    out_ref[0] = (acc[...] * inv_c).astype(out_ref.dtype)


def _corr_df2_kernel(ga_ref, gb_ref, f1a_ref, f1b_ref, out_ref, acc, *, md, tile_h, w):
    side = 2 * md + 1
    inv_c = 1.0 / out_ref.shape[1]
    acc[...] = jnp.zeros_like(acc)
    for dyp in range(side):
        gwin = _rows(ga_ref, gb_ref, dyp, tile_h, axis=1)  # (81, TH, W+2md)
        fwin = _rows(f1a_ref, f1b_ref, dyp, tile_h, axis=1)  # (C, TH, W+2md)
        for dxp in range(side):
            k = (2 * md - dyp) * side + (2 * md - dxp)  # rev(k)
            gk = gwin[k, :, dxp : dxp + w].astype(jnp.float32)  # (TH, W)
            f1s = fwin[:, :, dxp : dxp + w].astype(jnp.float32)  # (C, TH, W)
            acc[...] += gk[None] * f1s
    out_ref[0] = (acc[...] * inv_c).astype(out_ref.dtype)


def _pick_tile_h(h: int, w: int, c: int, md: int) -> int:
    """Largest tile height under a VMEM budget (with double buffering)."""

    def roundup(x, m):
        return -(-x // m) * m

    nd = (2 * md + 1) ** 2
    # 12M measured best on v5e: at the KITTI recipe it lifts the level-2
    # fwd/df1 kernels to TH=32 (less halo + fewer dispatches) while leaving
    # df2 at TH=8; 14M (df2 -> TH=16) measured SLOWER (113.2 vs 114.5
    # snippets/s) - oversized df2 tiles pipeline worse.
    budget = 12 * 1024 * 1024
    wp = roundup(w + 2 * md, 128)
    for th in (32, 16, 8):
        if h % th or th < 2 * md:
            continue
        tile_bytes = 4 * th * wp * (3 * c + nd)  # operands + output + scratch
        if 2 * tile_bytes <= budget:
            return th
    return 8


def _halo_pad(x_nchw, md: int, tile_h: int, n_tiles: int):
    """Pad H by md (+ tail so block i+1 always exists) and W by md."""
    h = x_nchw.shape[2]
    rows = (n_tiles + 1) * tile_h
    return jnp.pad(
        x_nchw, ((0, 0), (0, 0), (md, rows - h - md), (md, md))
    )


def _halo_pad_pre(x_nchw, md: int, tile_h: int, n_tiles: int):
    """Like :func:`_halo_pad` for an operand that ALREADY carries its md halo
    rows on both H sides (the SPMD path exchanges real neighbor rows instead
    of zero-padding, ops/pallas_spmd.py); pads only the tail + W."""
    rows = (n_tiles + 1) * tile_h
    return jnp.pad(
        x_nchw, ((0, 0), (0, 0), (0, rows - x_nchw.shape[2]), (md, md))
    )


def _block(ch, tile_h, w, off):
    return pl.BlockSpec(
        (1, ch, tile_h, w),
        lambda b, i, off=off: (b, 0, i + off, 0),
        memory_space=pltpu.VMEM,
    )


def _corr_fwd_nchw(f1, f2, md, h_prepad: bool = False):
    bsz, c, h, w = f1.shape
    nd = (2 * md + 1) ** 2
    tile_h = _pick_tile_h(h, w, c, md)
    n_tiles = h // tile_h
    pad = _halo_pad_pre if h_prepad else _halo_pad
    f2q = pad(f2, md, tile_h, n_tiles)
    return pl.pallas_call(
        functools.partial(_corr_fwd_kernel, md=md, tile_h=tile_h, w=w),
        grid=(bsz, n_tiles),
        in_specs=[
            _block(c, tile_h, w, 0),
            _block(c, tile_h, w + 2 * md, 0),
            _block(c, tile_h, w + 2 * md, 1),
        ],
        out_specs=_block(nd, tile_h, w, 0),
        out_shape=jax.ShapeDtypeStruct((bsz, nd, h, w), f1.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * w * c * nd,
            bytes_accessed=(3 * bsz * h * w * c + bsz * h * w * nd) * 4,
            transcendentals=0,
        ),
        compiler_params=_cparams(3),
    )(f1, f2q, f2q)


def _corr_df1_nchw(g, f2, md, h_prepad: bool = False):
    bsz, c = f2.shape[0], f2.shape[1]
    h, w = g.shape[2], g.shape[3]  # f2 may carry 2md extra halo rows
    nd = (2 * md + 1) ** 2
    tile_h = _pick_tile_h(h, w, c, md)
    n_tiles = h // tile_h
    pad = _halo_pad_pre if h_prepad else _halo_pad
    f2q = pad(f2, md, tile_h, n_tiles)
    return pl.pallas_call(
        functools.partial(_corr_df1_kernel, md=md, tile_h=tile_h, w=w),
        grid=(bsz, n_tiles),
        in_specs=[
            _block(nd, tile_h, w, 0),
            _block(c, tile_h, w + 2 * md, 0),
            _block(c, tile_h, w + 2 * md, 1),
        ],
        out_specs=_block(c, tile_h, w, 0),
        out_shape=jax.ShapeDtypeStruct((bsz, c, h, w), f2.dtype),
        scratch_shapes=[pltpu.VMEM((c, tile_h, w), jnp.float32)],
        compiler_params=_cparams(3),
    )(g, f2q, f2q)


def _corr_df2_nchw(g, f1, md, h_prepad: bool = False):
    bsz, c, h, w = f1.shape
    if h_prepad:  # BOTH operands carry their 2md halo rows
        h = h - 2 * md
    nd = (2 * md + 1) ** 2
    tile_h = _pick_tile_h(h, w, c + nd, md)
    n_tiles = h // tile_h
    pad = _halo_pad_pre if h_prepad else _halo_pad
    gq = pad(g, md, tile_h, n_tiles)
    f1q = pad(f1, md, tile_h, n_tiles)
    return pl.pallas_call(
        functools.partial(_corr_df2_kernel, md=md, tile_h=tile_h, w=w),
        grid=(bsz, n_tiles),
        in_specs=[
            _block(nd, tile_h, w + 2 * md, 0),
            _block(nd, tile_h, w + 2 * md, 1),
            _block(c, tile_h, w + 2 * md, 0),
            _block(c, tile_h, w + 2 * md, 1),
        ],
        out_specs=_block(c, tile_h, w, 0),
        out_shape=jax.ShapeDtypeStruct((bsz, c, h, w), f1.dtype),
        scratch_shapes=[pltpu.VMEM((c, tile_h, w), jnp.float32)],
        compiler_params=_cparams(4),
    )(gq, gq, f1q, f1q)


def _supported(h: int, md: int) -> bool:
    return h % 8 == 0 and 8 >= 2 * md


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cost_volume_pallas(f1: jax.Array, f2: jax.Array, md: int = 4) -> jax.Array:
    """(B, H, W, C) x2 -> (B, H, W, (2md+1)^2), reference channel order."""
    return _fwd(f1, f2, md)[0]


def _fwd(f1, f2, md):
    if not _supported(f1.shape[1], md):
        from unopticalflow_tpu.ops.cost_volume import cost_volume_xla

        # tiny coarse levels: negligible work, XLA handles them
        return cost_volume_xla(f1, f2, md), (f1, f2)
    f1c = jnp.transpose(f1, (0, 3, 1, 2))
    f2c = jnp.transpose(f2, (0, 3, 1, 2))
    out = _corr_fwd_nchw(f1c, f2c, md)
    return jnp.transpose(out, (0, 2, 3, 1)), (f1, f2)


def _bwd(md, res, g):
    f1, f2 = res
    if not _supported(f1.shape[1], md):
        from unopticalflow_tpu.ops.pallas_kernels_xla_bwd import cost_volume_bwd_xla

        return cost_volume_bwd_xla(md, res, g)
    gc = jnp.transpose(g, (0, 3, 1, 2))
    f1c = jnp.transpose(f1, (0, 3, 1, 2))
    f2c = jnp.transpose(f2, (0, 3, 1, 2))
    df1 = _corr_df1_nchw(gc, f2c, md)
    df2 = _corr_df2_nchw(gc, f1c, md)
    return (
        jnp.transpose(df1, (0, 2, 3, 1)),
        jnp.transpose(df2, (0, 2, 3, 1)),
    )


cost_volume_pallas.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cost_volume_pallas_f2c(f1: jax.Array, f2c: jax.Array, md: int = 4):
    """``cost_volume_pallas`` with f2 already NCHW (the kernel's native form).

    f1: (B, H, W, C) NHWC; f2c: (B, C, H, W).  Output NHWC, identical values
    and channel order.  Used with ``ops/warp.py::bilinear_warp_nchw`` so the
    decoder's warped features never cross an NHWC<->NCHW boundary in either
    pass — df2 is returned NCHW straight from the df2 kernel.
    """
    return _fwd_f2c(f1, f2c, md)[0]


def _fwd_f2c(f1, f2c, md):
    if not _supported(f1.shape[1], md):
        from unopticalflow_tpu.ops.cost_volume import cost_volume_xla

        f2 = jnp.transpose(f2c, (0, 2, 3, 1))
        return cost_volume_xla(f1, f2, md), (f1, f2c)
    f1c = jnp.transpose(f1, (0, 3, 1, 2))
    out = _corr_fwd_nchw(f1c, f2c, md)
    return jnp.transpose(out, (0, 2, 3, 1)), (f1, f2c)


def _bwd_f2c(md, res, g):
    f1, f2c = res
    if not _supported(f1.shape[1], md):
        from unopticalflow_tpu.ops.pallas_kernels_xla_bwd import cost_volume_bwd_xla

        f2 = jnp.transpose(f2c, (0, 2, 3, 1))
        df1, df2 = cost_volume_bwd_xla(md, (f1, f2), g)
        return df1, jnp.transpose(df2, (0, 3, 1, 2))
    gc = jnp.transpose(g, (0, 3, 1, 2))
    f1c = jnp.transpose(f1, (0, 3, 1, 2))
    df1 = _corr_df1_nchw(gc, f2c, md)
    df2c = _corr_df2_nchw(gc, f1c, md)
    return jnp.transpose(df1, (0, 2, 3, 1)), df2c


cost_volume_pallas_f2c.defvjp(_fwd_f2c, _bwd_f2c)
