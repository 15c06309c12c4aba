"""Fused smoothness+consistency kernel vs the JAX composition (interpret).

Checks the forward partial sums and the hand-derived flow VJP of
ops/pallas_regularizer.py against the identical pure-JAX composition
(models/losses.py semantics).  On-chip validation runs in the benchmark
workflow (bench.py --validate).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unopticalflow_tpu.ops import pallas_regularizer as pr

RNG = np.random.RandomState(11)
B, H, W = 2, 16, 32


def _case():
    flow_b = jnp.asarray(RNG.uniform(-6, 6, (B, H, W, 2)).astype(np.float32))
    flow_f = jnp.asarray(RNG.uniform(-6, 6, (B, H, W, 2)).astype(np.float32))
    img = jnp.asarray(RNG.rand(B, H, W, 3).astype(np.float32))
    w_fwd = jnp.asarray(RNG.rand(B, H, W, 1).astype(np.float32))
    return flow_b, flow_f, img, w_fwd


@pytest.fixture(scope="module")
def interpret_pack():
    from unittest import mock
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    with mock.patch.object(pl, "pallas_call", interp):
        yield


def test_forward_matches_reference(interpret_pack):
    args = _case()
    got = pr._reg_run_fwd(*args)
    want = pr.regularizer_pack_reference(*args)
    for k in ("s_sx", "s_sy", "s_consis"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-5,
            err_msg=k,
        )


@pytest.mark.slow
def test_flow_vjp_matches_reference(interpret_pack):
    flow_b, flow_f, img, w_fwd = _case()
    # weight the three sums differently so a cross-wired cotangent is caught
    h, w = H, W

    def total(fn, fb, ffl):
        out = fn(fb, ffl, img, w_fwd)
        return (
            jnp.sum(out["s_sx"]) / (h * (w - 2) * 2)
            + jnp.sum(out["s_sy"]) / ((h - 2) * w * 2)
            + 0.37 * jnp.sum(out["s_consis"])
        )

    got = jax.grad(lambda fb, ffl: total(pr.regularizer_pack, fb, ffl),
                   argnums=(0, 1))(flow_b, flow_f)
    want = jax.grad(
        lambda fb, ffl: total(pr.regularizer_pack_reference, fb, ffl),
        argnums=(0, 1),
    )(flow_b, flow_f)
    for g, r, name in zip(got, want, ("d_flow_b", "d_flow_f")):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_consis_grad_only_reaches_fwd(interpret_pack):
    """The bwd flow is detached in the consistency term (reference :186)."""
    flow_b, flow_f, img, w_fwd = _case()

    def consis_only(fb, ffl):
        return jnp.sum(pr.regularizer_pack(fb, ffl, img, w_fwd)["s_consis"])

    g_b, g_f = jax.grad(consis_only, argnums=(0, 1))(flow_b, flow_f)
    assert float(jnp.max(jnp.abs(g_b))) == 0.0
    assert float(jnp.max(jnp.abs(g_f))) > 0.0


@pytest.mark.slow
def test_full_forward_fused_regularizer_matches_unfused(interpret_pack):
    """forward() with use_pallas_photo routes smooth/consis through the
    fused kernel; pack must match the plain-JAX forward."""
    from unopticalflow_tpu.models import FlowModelConfig, forward, init_flow_model

    params = init_flow_model(jax.random.PRNGKey(3))
    images = jnp.asarray(RNG.rand(1, 3 * 64, 64, 3).astype(np.float32))
    cfg_p = FlowModelConfig(num_scales=3, use_pallas_photo=True, use_pallas_reg=True)
    cfg_x = FlowModelConfig(num_scales=3, use_pallas_photo=False)
    got = forward(params, cfg_p, images)
    want = forward(params, cfg_x, images)
    for k in ("loss_flow_smooth", "loss_flow_consis"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-4, atol=1e-5,
            err_msg=k,
        )
