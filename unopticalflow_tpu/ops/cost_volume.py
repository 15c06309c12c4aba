"""Local cost-volume (correlation) layer.

Reference semantics (/root/reference/core/networks/structures/pwc_tf.py:97-106):
zero-pad the target feature map by ``md`` on each spatial side, then for each
of the (2*md+1)^2 integer displacements (dy, dx) in [-md, md]^2 emit the
channel-mean of the elementwise product between the source features and the
displaced target features.  Displacement order is dy-major (dy from -md..md,
dx from -md..md inner), which fixes the channel order the downstream decoder
convolutions were trained against.

Two implementations:

* ``cost_volume_xla`` — 81 statically-shifted multiply/mean ops; XLA fuses the
  loop body but re-reads both feature maps from HBM per displacement.
* ``cost_volume`` — dispatcher; uses the Pallas kernel
  (`unopticalflow_tpu.ops.pallas_kernels.cost_volume_pallas`) on TPU when the
  shapes are tile-friendly, otherwise falls back to the XLA version.  The
  Pallas kernel reads each input once into VMEM and accumulates all
  displacements on-chip, removing the 81x HBM re-read.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def cost_volume_xla(f1: jax.Array, f2: jax.Array, md: int = 4) -> jax.Array:
    """Correlation volume via statically-unrolled shifts.

    Args:
        f1: (B, H, W, C) source features.
        f2: (B, H, W, C) target features.
        md: max displacement; output has (2*md+1)**2 channels.

    Returns:
        (B, H, W, (2*md+1)**2) cost volume, channel-mean of products.
    """
    assert f1.shape == f2.shape, (f1.shape, f2.shape)
    _, h, w, c = f1.shape
    f2p = jnp.pad(f2, ((0, 0), (md, md), (md, md), (0, 0)))
    inv_c = jnp.asarray(1.0 / c, dtype=f1.dtype)
    planes = []
    for dy in range(2 * md + 1):
        for dx in range(2 * md + 1):
            shifted = jax.lax.slice(
                f2p, (0, dy, dx, 0), (f2p.shape[0], dy + h, dx + w, c)
            )
            planes.append(jnp.sum(f1 * shifted, axis=-1) * inv_c)
    return jnp.stack(planes, axis=-1)


@functools.partial(jax.jit, static_argnames=("md", "use_pallas", "spmd"))
def cost_volume(
    f1: jax.Array,
    f2: jax.Array,
    md: int = 4,
    use_pallas: bool = False,
    spmd: bool = False,
) -> jax.Array:
    """Cost volume with optional Pallas fast path (TPU only).

    ``spmd=True`` selects the variant whose fwd/bwd kernels carry H-axis
    SPMD partitioning rules (ops/pallas_spmd.py) so spatial-parallel runs
    keep the Pallas fast path; identical values either way.
    """
    if spmd:
        from unopticalflow_tpu.ops.pallas_spmd import cost_volume_spmd

        return cost_volume_spmd(f1, f2, md, use_pallas)
    if use_pallas:
        from unopticalflow_tpu.ops.pallas_kernels import cost_volume_pallas

        return cost_volume_pallas(f1, f2, md=md)
    return cost_volume_xla(f1, f2, md=md)
