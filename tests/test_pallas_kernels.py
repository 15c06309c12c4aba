"""Pallas cost-volume kernel tests (interpreter mode, runs on CPU).

Real-TPU numerical validation of the same kernels is part of the benchmark
workflow; here the Mosaic interpreter checks the kernel logic (halo
assembly, displacement ordering, reversed-shift backward) against the XLA
reference implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from unopticalflow_tpu.ops.cost_volume import cost_volume_xla
from unopticalflow_tpu.ops.pallas_kernels import cost_volume_pallas

RNG = np.random.RandomState(0)


@pytest.mark.parametrize("shape", [(2, 16, 24, 8), (1, 8, 13, 5)])
def test_pallas_corr_fwd_interpret(shape):
    b, h, w, c = shape
    f1 = jnp.asarray(RNG.rand(b, h, w, c).astype(np.float32))
    f2 = jnp.asarray(RNG.rand(b, h, w, c).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = cost_volume_pallas(f1, f2, 4)
    want = cost_volume_xla(f1, f2, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_pallas_corr_grads_interpret():
    b, h, w, c = 1, 16, 12, 6
    f1 = jnp.asarray(RNG.rand(b, h, w, c).astype(np.float32))
    f2 = jnp.asarray(RNG.rand(b, h, w, c).astype(np.float32))

    def loss_p(x, y):
        return jnp.sum(jnp.sin(cost_volume_pallas(x, y, 4)))

    def loss_x(x, y):
        return jnp.sum(jnp.sin(cost_volume_xla(x, y, 4)))

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_p, argnums=(0, 1))(f1, f2)
    gx = jax.grad(loss_x, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]), rtol=1e-4, atol=1e-5)


def test_small_levels_fall_back_to_xla():
    # h=4 < 2*md: must route to the XLA path transparently
    f1 = jnp.asarray(RNG.rand(1, 4, 13, 7).astype(np.float32))
    f2 = jnp.asarray(RNG.rand(1, 4, 13, 7).astype(np.float32))
    got = cost_volume_pallas(f1, f2, 4)
    want = cost_volume_xla(f1, f2, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_pallas_corr_bf16_interpret():
    b, h, w, c = 1, 16, 12, 8
    f1 = jnp.asarray(RNG.rand(b, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
    f2 = jnp.asarray(RNG.rand(b, h, w, c).astype(np.float32)).astype(jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        got = cost_volume_pallas(f1, f2, 4)
    want = cost_volume_xla(f1.astype(jnp.float32), f2.astype(jnp.float32), 4)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, dtype=np.float32), np.asarray(want), rtol=2e-2, atol=2e-2
    )


def test_f2c_variant_matches_nhwc_interpret():
    """cost_volume_pallas_f2c (f2 pre-NCHW, df2 out NCHW) == the NHWC form,
    on a supported shape and on the XLA-fallback shape."""
    from unopticalflow_tpu.ops.pallas_kernels import (
        cost_volume_pallas,
        cost_volume_pallas_f2c,
    )

    rng = np.random.RandomState(5)
    for h in (16, 4):  # 4 % 8 != 0 -> fallback path
        f1 = jnp.asarray(rng.randn(2, h, 32, 16).astype(np.float32))
        f2 = jnp.asarray(rng.randn(2, h, 32, 16).astype(np.float32))
        f2c = jnp.transpose(f2, (0, 3, 1, 2))
        with pltpu.force_tpu_interpret_mode():
            a, vjpa = jax.vjp(lambda x, y: cost_volume_pallas(x, y, 4), f1, f2)
            b, vjpb = jax.vjp(
                lambda x, y: cost_volume_pallas_f2c(x, y, 4), f1, f2c
            )
            g = jnp.asarray(rng.randn(*a.shape).astype(np.float32))
            da1, da2 = vjpa(g)
            db1, db2c = vjpb(g)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(da1), np.asarray(db1),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(da2),
            np.asarray(jnp.transpose(db2c, (0, 2, 3, 1))),
            rtol=1e-6, atol=1e-6,
        )


@pytest.mark.parametrize("h", [12, 24, 48])
def test_pallas_corr_sintel_pyramid_heights(h):
    """Sintel-recipe feature heights (384 >> {5,4,3} = 12/24/48; config/
    sintel.yaml img_hw [384, 832]) tile the kernel off the 256-row KITTI
    tuning point; values must match the XLA composition (interpret mode).
    The 384>>6 = 6 level is covered by test_small_levels_fall_back_to_xla.
    """
    import numpy as np

    from unopticalflow_tpu.ops.cost_volume import cost_volume_xla
    from unopticalflow_tpu.ops.pallas_kernels import cost_volume_pallas

    rng = np.random.RandomState(h)
    f1 = jnp.asarray(rng.randn(1, h, 26, 6).astype(np.float32))
    f2 = jnp.asarray(rng.randn(1, h, 26, 6).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        got = cost_volume_pallas(f1, f2, md=4)
    want = cost_volume_xla(f1, f2, md=4)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )
