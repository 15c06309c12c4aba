"""Pallas TPU kernels for the bandwidth-bound hot ops.

Cost volume: the XLA formulation re-reads both feature maps from HBM for each
of the 81 displacements (pwc_tf.py:97-106 semantics).  This kernel streams
each input tile through VMEM a constant number of times and accumulates all
81 displacement planes on-chip — O(HWC) HBM traffic instead of O(81·HWC).

Halo handling: displacement ±md needs md extra rows above/below each H-tile.
Overlapping windows are not expressible as one BlockSpec, so the padded
target map is passed twice with block indices (i, i+1); with tile height
TH >= 2·md the two consecutive row-blocks cover the whole (TH + 2·md) window,
which the kernel assembles by concatenation (a cheap major-dim op).  W shifts
are sublane slices, the channel (lane) dim is never sliced — all layouts stay
Mosaic-friendly.  Products are computed in fp32 on the VPU regardless of
input dtype.

The backward pass is registered as a custom VJP with shifted-accumulation XLA
formulas (same O(81) structure as the forward); autodiff through the kernel
itself is not supported.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(f1_ref, f2a_ref, f2b_ref, out_ref, *, md: int, tile_h: int):
    w = out_ref.shape[3]
    side = 2 * md + 1

    f1 = f1_ref[0].astype(jnp.float32)  # (TH, W, C)
    inv_c = 1.0 / f1.shape[-1]
    for dy in range(side):
        # rows [dy, dy+TH) of the halo window, assembled from the two
        # consecutive row-blocks (major-dim concat: cheap)
        if dy == 0:
            rows = f2a_ref[0]
        elif dy == tile_h:  # window exactly the second block (tile_h == 2*md)
            rows = f2b_ref[0]
        else:
            rows = jnp.concatenate(
                [f2a_ref[0, dy:, :, :], f2b_ref[0, :dy, :, :]], axis=0
            )
        for dx in range(side):
            f2s = jax.lax.slice(
                rows, (0, dx, 0), (tile_h, dx + w, rows.shape[-1])
            ).astype(jnp.float32)
            plane = jnp.sum(f1 * f2s, axis=-1) * inv_c  # (TH, W)
            out_ref[0, dy * side + dx] = plane.astype(out_ref.dtype)


def _pick_tile_h(h: int, w: int, c: int, md: int) -> int:
    """Largest tile height whose VMEM footprint (with double buffering and
    lane padding) stays under budget."""

    def roundup(x, m):
        return -(-x // m) * m

    nd = (2 * md + 1) ** 2
    budget = 8 * 1024 * 1024  # half of VMEM, leaving room for the pipeline
    cp = roundup(c, 128)  # channel (lane) padding
    wp = roundup(w, 128)
    for th in (32, 16, 8):
        if h % th or th < 2 * md:
            continue
        tile_bytes = 4 * (
            th * w * cp  # f1 block
            + 2 * th * (w + 2 * md) * cp  # two f2 halo blocks
            + nd * th * wp  # output block
        )
        if 2 * tile_bytes <= budget:  # x2: Pallas double-buffers blocks
            return th
    return 8 if (h % 8 == 0 and 8 >= 2 * md) else h


def _cost_volume_fwd_pallas(f1: jax.Array, f2: jax.Array, md: int) -> jax.Array:
    from unopticalflow_tpu.ops.cost_volume import cost_volume_xla

    bsz, h, w, c = f1.shape
    side = 2 * md + 1
    nd = side * side
    tile_h = _pick_tile_h(h, w, c, md)
    if tile_h < 2 * md or h % tile_h:
        # coarse pyramid levels (h < 8): negligible work, XLA handles them
        return cost_volume_xla(f1, f2, md)

    n_tiles = h // tile_h
    # rows: corr padding (md) + tail padding so blocks (i, i+1) always exist
    rows = (n_tiles + 1) * tile_h
    f2q = jnp.pad(
        f2, ((0, 0), (md, rows - h - md), (md, md), (0, 0))
    )

    f2_spec = lambda off: pl.BlockSpec(
        (1, tile_h, w + 2 * md, c),
        (lambda b, i: (b, i + off, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        functools.partial(_corr_kernel, md=md, tile_h=tile_h),
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, w, c),
                lambda b, i: (b, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            f2_spec(0),
            f2_spec(1),
        ],
        out_specs=pl.BlockSpec(
            (1, nd, tile_h, w),
            lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, nd, h, w), f1.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * w * c * nd,
            bytes_accessed=(3 * bsz * h * w * c + bsz * h * w * nd) * 4,
            transcendentals=0,
        ),
    )(f1, f2q, f2q)
    # kernel emits displacement-major (B, 81, H, W); callers want NHWC
    return jnp.transpose(out, (0, 2, 3, 1))


def _cost_volume_bwd_xla(md: int, res, g):
    """Shifted-accumulation backward (O(81) static shifts, XLA-fused)."""
    f1, f2 = res
    bsz, h, w, c = f1.shape
    side = 2 * md + 1
    inv_c = jnp.asarray(1.0 / c, jnp.float32)
    g = g.astype(jnp.float32)
    f1f = f1.astype(jnp.float32)
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0))).astype(jnp.float32)

    df1 = jnp.zeros_like(f1f)
    df2p = jnp.zeros_like(f2p)
    for dy in range(side):
        for dx in range(side):
            k = dy * side + dx
            gk = g[..., k : k + 1]
            f2s = jax.lax.slice(f2p, (0, dy, dx, 0), (bsz, dy + h, dx + w, c))
            df1 = df1 + gk * f2s
            df2p = df2p.at[:, dy : dy + h, dx : dx + w, :].add(gk * f1f)
    df2 = df2p[:, md : md + h, md : md + w, :]
    return (
        (df1 * inv_c).astype(f1.dtype),
        (df2 * inv_c).astype(f2.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def cost_volume_pallas(f1: jax.Array, f2: jax.Array, md: int = 4) -> jax.Array:
    """(B, H, W, C) x2 -> (B, H, W, (2md+1)^2), reference channel order."""
    return _cost_volume_fwd_pallas(f1, f2, md)


def _fwd(f1, f2, md):
    return _cost_volume_fwd_pallas(f1, f2, md), (f1, f2)


cost_volume_pallas.defvjp(_fwd, _cost_volume_bwd_xla)
