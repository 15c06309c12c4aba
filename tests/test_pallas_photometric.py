"""Fused photometric kernel vs the JAX composition (interpret mode).

Checks the forward sums, the occlusion-weight map, and — the hand-derived
part — the flow VJP, against jax.grad of the identical pure-JAX composition.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unopticalflow_tpu.ops import pallas_photometric as pp
from unopticalflow_tpu.ops.warp import warp_corners

RNG = np.random.RandomState(9)
B, H, W = 2, 16, 32


def _case(dtype=jnp.float32):
    img_b = jnp.asarray(RNG.rand(B, H, W, 3).astype(np.float32), dtype)
    img_l = jnp.asarray(RNG.rand(B, H, W, 3).astype(np.float32), dtype)
    img_r = jnp.asarray(RNG.rand(B, H, W, 3).astype(np.float32), dtype)
    flow_b = jnp.asarray(RNG.uniform(-5, 5, (B, H, W, 2)).astype(np.float32))
    flow_f = jnp.asarray(RNG.uniform(-5, 5, (B, H, W, 2)).astype(np.float32))
    four_b = warp_corners(img_l, flow_b)
    four_f = warp_corners(img_r, flow_f)
    return four_b, four_f, flow_b, flow_f, img_b


@pytest.fixture(scope="module")
def interpret_pack():
    """photometric_pack with pallas_call forced into interpreter mode."""
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
    got = pp._pp_run_fwd(*args)
    want = pp.photometric_pack_reference(*args)
    for k in ("s_dw", "s_w", "s_cl"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-5,
            err_msg=k,
        )
    np.testing.assert_allclose(
        np.asarray(got["weights"]), np.asarray(want["weights"]),
        rtol=1e-5, atol=1e-5,
    )


def test_flow_vjp_matches_reference(interpret_pack):
    four_b, four_f, flow_b, flow_f, img = _case()

    def loss_fused(fb, ffl):
        out = pp.photometric_pack(four_b, four_f, fb, ffl, img)
        # downstream shape of the real losses: normalized sums
        return (
            jnp.sum(out["s_dw"] / (out["s_w"] + 1.0))
            + jnp.sum(out["s_cl"] / (out["s_w"] + 1.0))
        )

    def loss_ref(fb, ffl):
        out = pp.photometric_pack_reference(four_b, four_f, fb, ffl, img)
        return (
            jnp.sum(out["s_dw"] / (out["s_w"] + 1.0))
            + jnp.sum(out["s_cl"] / (out["s_w"] + 1.0))
        )

    gb_f, gf_f = jax.grad(loss_fused, argnums=(0, 1))(flow_b, flow_f)
    gb_r, gf_r = jax.grad(loss_ref, argnums=(0, 1))(flow_b, flow_f)
    np.testing.assert_allclose(np.asarray(gb_f), np.asarray(gb_r),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gf_f), np.asarray(gf_r),
                               rtol=2e-4, atol=2e-5)


def test_weights_and_sw_carry_no_gradient(interpret_pack):
    four_b, four_f, flow_b, flow_f, img = _case()

    def loss(fb):
        out = pp.photometric_pack(four_b, four_f, fb, flow_f, img)
        return jnp.sum(out["weights"]) + jnp.sum(out["s_w"])

    g = jax.grad(loss)(flow_b)
    assert float(jnp.sum(jnp.abs(g))) == 0.0


@pytest.mark.slow
def test_full_forward_fused_matches_unfused(interpret_pack):
    """Model forward + grads with the fused photometric path == XLA path."""
    from unopticalflow_tpu.models import FlowModelConfig, forward, init_flow_model

    params = init_flow_model(jax.random.PRNGKey(2))
    images = jnp.asarray(RNG.rand(1, 3 * 64, 64, 3).astype(np.float32))
    cfg_x = FlowModelConfig(num_scales=3)
    cfg_p = FlowModelConfig(num_scales=3, use_pallas_photo=True)

    pack_x = forward(params, cfg_x, images)
    pack_p = forward(params, cfg_p, images)
    for k in pack_x:
        np.testing.assert_allclose(
            np.asarray(pack_p[k]), np.asarray(pack_x[k]),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )

    def total(p, cfg):
        return sum(jnp.mean(v) for v in forward(p, cfg, images).values())

    gx = jax.grad(lambda p: total(p, cfg_x))(params)
    gp = jax.grad(lambda p: total(p, cfg_p))(params)
    for (ka, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(gx),
        jax.tree_util.tree_leaves_with_path(gp),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(ka),
        )


def _case_cm():
    """bf16 case + channel-major corner pairs (warp_corners_cm)."""
    from unopticalflow_tpu.ops.warp import warp_corners_cm

    img_b = jnp.asarray(RNG.rand(B, H, W, 3).astype(np.float32), jnp.bfloat16)
    img_l = jnp.asarray(RNG.rand(B, H, W, 3).astype(np.float32), jnp.bfloat16)
    img_r = jnp.asarray(RNG.rand(B, H, W, 3).astype(np.float32), jnp.bfloat16)
    flow_b = jnp.asarray(RNG.uniform(-5, 5, (B, H, W, 2)).astype(np.float32))
    flow_f = jnp.asarray(RNG.uniform(-5, 5, (B, H, W, 2)).astype(np.float32))
    four_b = warp_corners(img_l, flow_b, gather_u32=True)
    four_f = warp_corners(img_r, flow_f, gather_u32=True)
    ffu = jnp.concatenate(
        [warp_corners_cm(img_l, flow_b), warp_corners_cm(img_r, flow_f)], 0
    )
    return four_b, four_f, ffu, flow_b, flow_f, img_b


def test_cm_forward_equals_packed(interpret_pack):
    """photometric_pack_cm == photometric_pack: the in-kernel u32 pair unpack
    (bf16 -> f32 via 16-bit shift) is exactly the astype of the packed path
    (pallas_photometric.py::_unpack_pairs).  The weight MAP is exact; the
    per-sample sums get a 1-ULP tolerance (CPU-interpret compilation may
    contract the two kernels' reductions differently — on the real TPU the
    full train-step losses AND grads were verified bit-equal)."""
    four_b, four_f, ffu, flow_b, flow_f, img = _case_cm()
    a = pp.photometric_pack(four_b, four_f, flow_b, flow_f, img)
    c = pp.photometric_pack_cm(ffu, flow_b, flow_f, img)
    np.testing.assert_array_equal(
        np.asarray(a["weights"], np.float32),
        np.asarray(c["weights"], np.float32),
    )
    for k in ("s_dw", "s_w", "s_cl"):
        np.testing.assert_allclose(
            np.asarray(a[k], np.float32), np.asarray(c[k], np.float32),
            rtol=1e-6, atol=0, err_msg=k,
        )


def test_cm_flow_vjp_bit_equals_packed(interpret_pack):
    four_b, four_f, ffu, flow_b, flow_f, img = _case_cm()

    def loss_packed(fb, ffl):
        out = pp.photometric_pack(four_b, four_f, fb, ffl, img)
        return jnp.sum(out["s_dw"]) + jnp.sum(out["s_cl"])

    def loss_cm(fb, ffl):
        out = pp.photometric_pack_cm(ffu, fb, ffl, img)
        return jnp.sum(out["s_dw"]) + jnp.sum(out["s_cl"])

    ga = jax.grad(loss_packed, argnums=(0, 1))(flow_b, flow_f)
    gc = jax.grad(loss_cm, argnums=(0, 1))(flow_b, flow_f)
    for a, c in zip(ga, gc):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_model_forward_cm_matches_packed(interpret_pack):
    """Full fused forward with the channel-major loss-warp path equals the
    packed-gather path (models/flow_model.py fused branch, bf16 losses)."""
    from unopticalflow_tpu.models import FlowModelConfig, forward, init_flow_model

    params = init_flow_model(jax.random.PRNGKey(4))
    images = jnp.asarray(RNG.rand(1, 3 * 64, 64, 3).astype(np.float32))
    cfg = FlowModelConfig(
        num_scales=3, loss_dtype="bfloat16", use_pallas_photo=True
    )
    assert cfg.channel_major_loss, "cm path must be the default"
    pack_cm = forward(params, cfg, images)
    pack_packed = forward(
        params, cfg._replace(channel_major_loss=False), images
    )
    for k in pack_packed:
        np.testing.assert_allclose(
            np.asarray(pack_cm[k]), np.asarray(pack_packed[k]),
            rtol=1e-6, atol=0, err_msg=k,
        )


def test_forward_sintel_scale_shape(interpret_pack):
    """Sintel-recipe scale-2 geometry (384>>2=96 rows; the tile-height
    heuristic picks a taller tile than the 8-row minimum used by the 16-row
    cases above): kernel == JAX composition off the KITTI tuning point.
    Width stays small to keep the interpreter fast; tile choice depends only
    on H and C."""
    rng = np.random.RandomState(7)
    h, w = 96, 32
    img_b = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    img_l = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    img_r = jnp.asarray(rng.rand(1, h, w, 3).astype(np.float32))
    flow_b = jnp.asarray(rng.uniform(-5, 5, (1, h, w, 2)).astype(np.float32))
    flow_f = jnp.asarray(rng.uniform(-5, 5, (1, h, w, 2)).astype(np.float32))
    four_b = warp_corners(img_l, flow_b)
    four_f = warp_corners(img_r, flow_f)
    args = (four_b, four_f, flow_b, flow_f, img_b)
    got = pp._pp_run_fwd(*args)
    want = pp.photometric_pack_reference(*args)
    for k in ("s_dw", "s_w", "s_cl"):
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-5, atol=1e-5,
            err_msg=k,
        )
