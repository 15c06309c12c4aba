"""XLA fallback backward for the cost volume (tiny coarse pyramid levels).

Shifted-accumulation formulas — the transpose of the 81-displacement forward
(see ops/pallas_kernels.py module docstring for the derivation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cost_volume_bwd_xla(md: int, res, g):
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
