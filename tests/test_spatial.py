"""Spatial (height-sharded) parallelism: SP inference == single-device.

Runs on the virtual 8-device CPU mesh (conftest).  Validates that GSPMD
partitioning of the full encoder/decoder stack along H — compiler-inserted
conv halo exchanges + feature all-gathers for the warp gathers — is
numerically identical to the unsharded program, for both a pure spatial mesh
and a 2-D (data, spatial) layout.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unopticalflow_tpu.models import FlowModelConfig, inference_flow, init_flow_model
from unopticalflow_tpu.parallel.spatial import (
    make_spatial_infer,
    shard_images,
    spatial_mesh,
)

# H must divide by n_spatial * 64 (6 stride-2 encoder levels)
H, W, B = 128, 64, 2


@pytest.fixture(scope="module")
def setup():
    cfg = FlowModelConfig(num_scales=3)
    params = init_flow_model(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    img1 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    img2 = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    ref = np.asarray(jax.jit(lambda p, a, b: inference_flow(p, cfg, a, b))(
        params, img1, img2
    ))
    return cfg, params, img1, img2, ref


def test_spatial_infer_matches_single_device(setup):
    cfg, params, img1, img2, ref = setup
    mesh = spatial_mesh(n_spatial=2)
    fn = make_spatial_infer(cfg, mesh)
    i1, i2 = shard_images(mesh, None, img1, img2)
    out = fn(params, i1, i2)
    # the flow itself must come back sharded over H
    assert out.sharding.spec == jax.sharding.PartitionSpec(
        None, "spatial", None, None
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_data_x_spatial_2d_mesh(setup):
    cfg, params, img1, img2, ref = setup
    mesh = spatial_mesh(n_spatial=2, n_data=2)
    fn = make_spatial_infer(cfg, mesh, batch_axis="data")
    i1, i2 = shard_images(mesh, "data", img1, img2)
    out = fn(params, i1, i2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_spatial_training_gradients_match(setup):
    """SP also holds for the TRAINING path: loss grads under an H-sharded
    layout equal the single-device grads (GSPMD partitions the backward's
    halo exchanges and scatter transposes too)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from unopticalflow_tpu.models import forward

    cfg, params, img1, img2, _ = setup
    mesh = spatial_mesh(n_spatial=2)

    # stacked 3-frame snippet (B, 3H, W, 3) built from the fixture images
    images = jnp.concatenate([img1, img2, img1], axis=1)

    def loss_fn(p, ims):
        pack = forward(p, cfg, ims)
        return sum(jnp.sum(v) for v in pack.values())

    g_ref = jax.jit(jax.grad(loss_fn))(params, images)

    img_sh = NamedSharding(mesh, P(None, "spatial", None, None))
    repl = NamedSharding(mesh, P())
    g_sp = jax.jit(
        jax.grad(loss_fn), in_shardings=(repl, img_sh), out_shardings=repl
    )(params, jax.device_put(images, img_sh))

    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_sp)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5
        )


def test_spatial_rejects_pallas_corr():
    cfg = FlowModelConfig(use_pallas_corr=True)
    mesh = spatial_mesh(n_spatial=2)
    with pytest.raises(ValueError, match="use_pallas_corr"):
        make_spatial_infer(cfg, mesh)


def test_spatial_rejects_bad_height(setup):
    cfg, params, img1, img2, _ = setup
    mesh = spatial_mesh(n_spatial=4)  # needs H % 256 == 0; H=128 fails
    fn = make_spatial_infer(cfg, mesh)
    i1, i2 = shard_images(mesh, None, img1, img2)
    with pytest.raises(ValueError, match="divisible"):
        fn(params, i1, i2)
