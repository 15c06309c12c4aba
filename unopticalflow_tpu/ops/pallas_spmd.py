"""SPMD partitioning rules for the Pallas cost-volume family.

Spatial (height-sharded) parallelism (parallel/spatial.py) shards every
image/feature tensor over H.  XLA's SPMD partitioner inserts halo exchanges
for convolutions automatically, but a Pallas kernel is an opaque custom call
— without a rule the partitioner would have to all-gather its operands (or
reject the program), which is why spatial mode previously forced the slow
XLA correlation (``use_pallas_corr=False``).

This module gives each of the three correlation kernels (fwd, df1, df2 —
ops/pallas_kernels.py) a ``jax.experimental.custom_partitioning`` rule over
the H axis:

* the local shard computes its rows with the *same* Pallas kernel, fed an
  H-prepadded operand (``h_prepad=True``) whose md halo rows are real
  neighbor rows obtained with two ``jax.lax.ppermute`` ring shifts over ICI
  (destinations with no source — the global top/bottom edges — receive
  zeros, which is exactly the reference's zero-padding semantics,
  pwc_tf.py:101-106);
* the correlation window is ±md = ±4 pixels, so the exchange volume is 4
  rows per neighbor per direction — O(md·W·C), negligible against the
  kernel's O(H·W·C·81) work;
* gradients partition the same way: the custom-vjp pair (df1, df2) are
  separately wrapped ops whose halos are exchanged on the operands the
  gather formulation reads (df1: f2; df2: g AND f1).

Shapes too small for the kernel's 8-row tiling per shard fall back to an
H-prepadded XLA composition (same halo exchange, shifted-slice math), so the
rule is total: any shard height is correct, large ones are fast.

Batch sharding composes for free (dim 0 of every operand/result maps through
the sharding rule); W/C sharding is not supported and is rewritten to
replicated by the partition rule (the partitioner inserts the reshard).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from unopticalflow_tpu.ops.pallas_kernels import (
    _corr_df1_nchw,
    _corr_df2_nchw,
    _corr_fwd_nchw,
    _supported,
)


# ---------------------------------------------------------------------------
# H-prepadded local computations (NHWC; halo rows already attached)
# ---------------------------------------------------------------------------


def _fwd_hpad(f1, f2h, md, use_pallas):
    """corr(f1, f2) where f2h carries md real halo rows on both H sides."""
    b, h, w, c = f1.shape
    if use_pallas and _supported(h, md):
        out = _corr_fwd_nchw(
            jnp.transpose(f1, (0, 3, 1, 2)),
            jnp.transpose(f2h, (0, 3, 1, 2)),
            md,
            h_prepad=True,
        )
        return jnp.transpose(out, (0, 2, 3, 1))
    side = 2 * md + 1
    f2p = jnp.pad(f2h, ((0, 0), (0, 0), (md, md), (0, 0)))
    inv_c = jnp.asarray(1.0 / c, f1.dtype)
    planes = []
    for dy in range(side):
        for dx in range(side):
            s = jax.lax.slice(f2p, (0, dy, dx, 0), (b, dy + h, dx + w, c))
            planes.append(jnp.sum(f1 * s, axis=-1) * inv_c)
    return jnp.stack(planes, axis=-1)


def _df1_hpad(g, f2h, md, use_pallas):
    """df1[p] = 1/C * sum_k g[p, k] * f2[p + s_k]; f2h halo-prepadded."""
    b, h, w, _ = g.shape
    c = f2h.shape[3]
    if use_pallas and _supported(h, md):
        out = _corr_df1_nchw(
            jnp.transpose(g, (0, 3, 1, 2)),
            jnp.transpose(f2h, (0, 3, 1, 2)),
            md,
            h_prepad=True,
        )
        return jnp.transpose(out, (0, 2, 3, 1))
    side = 2 * md + 1
    f2p = jnp.pad(f2h, ((0, 0), (0, 0), (md, md), (0, 0))).astype(jnp.float32)
    gf = g.astype(jnp.float32)
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    for dy in range(side):
        for dx in range(side):
            k = dy * side + dx
            s = jax.lax.slice(f2p, (0, dy, dx, 0), (b, dy + h, dx + w, c))
            acc = acc + gf[..., k : k + 1] * s
    return (acc / c).astype(f2h.dtype)


def _df2_hpad(gh, f1h, md, use_pallas):
    """df2[q] = 1/C * sum_k g[q + s'_k, rev(k)] * f1[q + s'_k]; BOTH operands
    halo-prepadded (the gather formulation reads rows q-md..q+md of each)."""
    b = gh.shape[0]
    h = gh.shape[1] - 2 * md
    w = gh.shape[2]
    c = f1h.shape[3]
    if use_pallas and _supported(h, md):
        out = _corr_df2_nchw(
            jnp.transpose(gh, (0, 3, 1, 2)),
            jnp.transpose(f1h, (0, 3, 1, 2)),
            md,
            h_prepad=True,
        )
        return jnp.transpose(out, (0, 2, 3, 1))
    side = 2 * md + 1
    gp = jnp.pad(gh, ((0, 0), (0, 0), (md, md), (0, 0))).astype(jnp.float32)
    f1p = jnp.pad(f1h, ((0, 0), (0, 0), (md, md), (0, 0))).astype(jnp.float32)
    acc = jnp.zeros((b, h, w, c), jnp.float32)
    for dyp in range(side):
        for dxp in range(side):
            k = (2 * md - dyp) * side + (2 * md - dxp)
            gk = jax.lax.slice(
                gp, (0, dyp, dxp, k), (b, dyp + h, dxp + w, k + 1)
            )
            f1s = jax.lax.slice(
                f1p, (0, dyp, dxp, 0), (b, dyp + h, dxp + w, c)
            )
            acc = acc + gk * f1s
    return (acc / c).astype(f1h.dtype)


# ---------------------------------------------------------------------------
# custom_partitioning plumbing
# ---------------------------------------------------------------------------


def _zero_halo(x, md):
    """Single-shard equivalent of the ppermute exchange (zeros both sides)."""
    z = jnp.zeros((x.shape[0], md) + x.shape[2:], x.dtype)
    return jnp.concatenate([z, x, z], axis=1)


def _halo_exchange_h(x, axis: str, n: int, md: int):
    """Attach md real neighbor rows on both H sides of a shard.

    Shards taller than md use two ``ppermute`` ring shifts (adjacent-chip
    ICI; destinations with no source — the global top/bottom edges — are
    zero-filled, which is exactly the reference's zero padding).  Shards
    shorter than md (the tiny coarse pyramid levels, 1-2 rows per device)
    would need multi-hop halos, so they instead all-gather the full map —
    O(H·W·C) at H ≤ 8 rows, negligible — and window it around the shard.
    """
    sh = x.shape[1]
    if sh >= md:
        top = jax.lax.ppermute(
            x[:, -md:], axis, [(i, i + 1) for i in range(n - 1)]
        )
        bot = jax.lax.ppermute(
            x[:, :md], axis, [(i + 1, i) for i in range(n - 1)]
        )
        return jnp.concatenate([top, x, bot], axis=1)
    full = jax.lax.all_gather(x, axis, axis=1, tiled=True)
    fullp = jnp.pad(full, ((0, 0), (md, md), (0, 0), (0, 0)))
    start = jax.lax.axis_index(axis) * sh  # padded row of global (i*sh - md)
    return jax.lax.dynamic_slice_in_dim(fullp, start, sh + 2 * md, axis=1)


def _spec_axes(shape_with_sharding):
    spec = shape_with_sharding.sharding.spec
    b_ax = spec[0] if len(spec) > 0 else None
    h_ax = spec[1] if len(spec) > 1 else None
    return b_ax, h_ax


def _make_partition(local_fn, halo_both: bool):
    """Build the def_partition ``partition`` callback.

    ``local_fn(a, b_hpad, md, use_pallas)`` computes a shard from the first
    operand and the halo-prepadded second operand (``halo_both`` additionally
    prepads the first — the df2 gather reads halos of both).
    """

    def partition(md, use_pallas, mesh, arg_shapes, result_shape):
        _, h_ax = _spec_axes(result_shape)
        b_ax = _spec_axes(arg_shapes[0])[0]
        sh = NamedSharding(mesh, P(b_ax, h_ax, None, None))

        if h_ax is None:

            def lower_fn(a, b):
                return local_fn(
                    _zero_halo(a, md) if halo_both else a,
                    _zero_halo(b, md),
                    md,
                    use_pallas,
                )

        else:
            ax = h_ax if isinstance(h_ax, str) else h_ax[0]
            if not isinstance(h_ax, str) and len(h_ax) > 1:
                raise NotImplementedError(
                    f"H sharded over multiple mesh axes {h_ax}; use one"
                )
            n = mesh.shape[ax]

            def lower_fn(a, b):
                ah = _halo_exchange_h(a, ax, n, md) if halo_both else a
                bh = _halo_exchange_h(b, ax, n, md)
                return local_fn(ah, bh, md, use_pallas)

        return mesh, lower_fn, sh, (sh, sh)

    return partition


def _infer(md, use_pallas, mesh, arg_shapes, result_shape):
    b_ax, h_ax = _spec_axes(arg_shapes[0])
    return NamedSharding(mesh, P(b_ax, h_ax, None, None))


def _sp_op(local_fn, full_fn, halo_both: bool, rule: str):
    """Wrap a correlation-family op with the H-sharding partition rule."""

    @functools.partial(custom_partitioning, static_argnums=(2, 3))
    def op(a, b, md, use_pallas):
        return full_fn(a, b, md, use_pallas)

    op.def_partition(
        partition=_make_partition(local_fn, halo_both),
        infer_sharding_from_operands=_infer,
        sharding_rule=rule,
    )
    return op


def _fwd_full(f1, f2, md, use_pallas):
    return _fwd_hpad(f1, _zero_halo(f2, md), md, use_pallas)


def _df1_full(g, f2, md, use_pallas):
    return _df1_hpad(g, _zero_halo(f2, md), md, use_pallas)


def _df2_full(g, f1, md, use_pallas):
    return _df2_hpad(_zero_halo(g, md), _zero_halo(f1, md), md, use_pallas)


_corr_fwd_sp = _sp_op(
    _fwd_hpad, _fwd_full, False, "b h w c, b h w c -> b h w k"
)
_corr_df1_sp = _sp_op(
    _df1_hpad, _df1_full, False, "b h w k, b h w c -> b h w c"
)
_corr_df2_sp = _sp_op(
    _df2_hpad, _df2_full, True, "b h w k, b h w c -> b h w c"
)


# ---------------------------------------------------------------------------
# public op: cost volume with SPMD-partitionable forward AND backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def cost_volume_spmd(
    f1: jax.Array, f2: jax.Array, md: int = 4, use_pallas: bool = True
) -> jax.Array:
    """(B, H, W, C) x2 -> (B, H, W, (2md+1)^2), reference channel order.

    Identical values to ``cost_volume_pallas`` /
    ``ops.cost_volume.cost_volume_xla``, but every kernel in the fwd/bwd
    pair carries an SPMD partitioning rule over the H axis, so an H-sharded
    (spatial-parallel) model keeps the Pallas fast path instead of falling
    back to the XLA correlation (parallel/spatial.py).
    """
    return _corr_fwd_sp(f1, f2, md, use_pallas)


def _cv_fwd(f1, f2, md, use_pallas):
    return _corr_fwd_sp(f1, f2, md, use_pallas), (f1, f2)


def _cv_bwd(md, use_pallas, res, g):
    f1, f2 = res
    df1 = _corr_df1_sp(g, f2, md, use_pallas)
    df2 = _corr_df2_sp(g, f1, md, use_pallas)
    return df1, df2


cost_volume_spmd.defvjp(_cv_fwd, _cv_bwd)
