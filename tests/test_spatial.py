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
@pytest.mark.parametrize("spmd_corr", [False, True])
def test_spatial_training_gradients_match(setup, spmd_corr):
    """SP also holds for the TRAINING path: loss grads under an H-sharded
    layout equal the single-device grads (GSPMD partitions the backward's
    halo exchanges and scatter transposes too).  With ``spmd_corr`` the
    correlations' custom-vjp pair goes through the custom_partitioning ops
    (halo-exchanged df1/df2, ops/pallas_spmd.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from unopticalflow_tpu.models import forward

    cfg, params, img1, img2, _ = setup
    if spmd_corr:
        cfg = cfg._replace(pallas_corr_spmd=True)
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


def test_spmd_corr_xla_fallback_matches(setup):
    """cost_volume_spmd (H-sharded, ppermute halo exchange) == unsharded XLA
    correlation — values AND both input grads (ops/pallas_spmd.py)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from unopticalflow_tpu.ops.cost_volume import cost_volume_xla
    from unopticalflow_tpu.ops.pallas_spmd import cost_volume_spmd

    rng = np.random.RandomState(1)
    f1 = jnp.asarray(rng.rand(2, 24, 16, 6).astype(np.float32))
    f2 = jnp.asarray(rng.rand(2, 24, 16, 6).astype(np.float32))

    def loss_ref(a, b):
        return jnp.sum(jnp.sin(cost_volume_xla(a, b, 4)))

    def loss_sp(a, b):
        return jnp.sum(jnp.sin(cost_volume_spmd(a, b, 4, False)))

    want = jax.jit(loss_ref)(f1, f2)
    g_want = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(f1, f2)

    mesh = spatial_mesh(n_spatial=4)
    sh = NamedSharding(mesh, P(None, "spatial", None, None))
    f1s, f2s = jax.device_put(f1, sh), jax.device_put(f2, sh)
    got = jax.jit(loss_sp, in_shardings=(sh, sh))(f1s, f2s)
    g_got = jax.jit(jax.grad(loss_sp, argnums=(0, 1)),
                    in_shardings=(sh, sh))(f1s, f2s)

    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_spmd_corr_pallas_interpret_matches(setup):
    """The PALLAS hpad kernels (h_prepad=True) + ppermute halo exchange —
    the exact per-shard bodies custom_partitioning lowers (fwd, df1, df2) —
    equal the unsharded zero-padded correlation and its gradients.

    Driven through shard_map + the Mosaic interpreter because interpret-mode
    pallas_call carries an IO-callback effect that cannot lower inside a
    custom_partitioning subcomputation on CPU; on TPU the real kernels lower
    inside the partition rule directly (the partitioner plumbing itself is
    covered end-to-end by test_spmd_corr_xla_fallback_matches)."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import PartitionSpec as P

    from unopticalflow_tpu.ops.cost_volume import cost_volume_xla
    from unopticalflow_tpu.ops.pallas_spmd import (
        _df1_hpad,
        _df2_hpad,
        _fwd_hpad,
        _halo_exchange_h,
    )

    rng = np.random.RandomState(2)
    f1 = jnp.asarray(rng.rand(1, 32, 16, 6).astype(np.float32))
    f2 = jnp.asarray(rng.rand(1, 32, 16, 6).astype(np.float32))
    g = jnp.asarray(rng.rand(1, 32, 16, 81).astype(np.float32))

    mesh = spatial_mesh(n_spatial=2)
    spec = P(None, "spatial", None, None)

    def sharded(body, *args):
        fn = jax.shard_map(
            body, mesh=mesh, in_specs=(spec,) * len(args), out_specs=spec,
            check_vma=False,
        )
        with pltpu.force_tpu_interpret_mode():
            return np.asarray(jax.jit(fn)(*args))

    got_fwd = sharded(
        lambda a, b: _fwd_hpad(a, _halo_exchange_h(b, "spatial", 2, 4), 4, True),
        f1, f2,
    )
    np.testing.assert_allclose(
        got_fwd, np.asarray(cost_volume_xla(f1, f2, 4)), rtol=1e-5, atol=1e-6
    )

    # reference grads from the differentiable XLA formulation
    def loss(a, b):
        return jnp.sum(cost_volume_xla(a, b, 4) * g)

    df1_want, df2_want = jax.jit(jax.grad(loss, argnums=(0, 1)))(f1, f2)

    got_df1 = sharded(
        lambda gg, b: _df1_hpad(gg, _halo_exchange_h(b, "spatial", 2, 4), 4, True),
        g, f2,
    )
    np.testing.assert_allclose(
        got_df1, np.asarray(df1_want), rtol=1e-5, atol=1e-6
    )

    got_df2 = sharded(
        lambda gg, a: _df2_hpad(
            _halo_exchange_h(gg, "spatial", 2, 4),
            _halo_exchange_h(a, "spatial", 2, 4),
            4, True,
        ),
        g, f1,
    )
    np.testing.assert_allclose(
        got_df2, np.asarray(df2_want), rtol=1e-5, atol=1e-6
    )


def test_spatial_infer_keeps_pallas_fast_path(setup):
    """make_spatial_infer with use_pallas_corr auto-sets pallas_corr_spmd
    (no more ValueError): every correlation in the full model goes through
    the custom-partitioning op and the sharded result matches the unsharded
    reference.  On CPU the per-shard bodies run the halo-exchanged XLA
    formulation (native Pallas lowering needs a TPU; interpret-mode Pallas
    cannot lower inside a custom_partitioning subcomputation — the kernel
    bodies themselves are covered by
    test_spmd_corr_pallas_interpret_matches)."""
    cfg, params, img1, img2, ref = setup

    # the auto-flip: use_pallas_corr=True no longer raises
    mesh = spatial_mesh(n_spatial=2)
    fn_auto = make_spatial_infer(cfg._replace(use_pallas_corr=True), mesh)
    assert fn_auto is not None

    # full-model equality through cost_volume_spmd on every level
    fn = make_spatial_infer(cfg._replace(pallas_corr_spmd=True), mesh)
    i1, i2 = shard_images(mesh, None, img1, img2)
    out = fn(params, i1, i2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_spatial_rejects_bad_height(setup):
    cfg, params, img1, img2, _ = setup
    mesh = spatial_mesh(n_spatial=4)  # needs H % 256 == 0; H=128 fails
    fn = make_spatial_infer(cfg, mesh)
    i1, i2 = shard_images(mesh, None, img1, img2)
    with pytest.raises(ValueError, match="divisible"):
        fn(params, i1, i2)
