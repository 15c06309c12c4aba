"""Train-step tests: single-device convergence + data-parallel equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unopticalflow_tpu.models import FlowModelConfig, init_flow_model
from unopticalflow_tpu.training import (
    create_train_state,
    loss_weights_from_config,
    make_multi_train_step,
    make_train_step,
)

CFG = FlowModelConfig(num_scales=3)
WEIGHTS = {
    "loss_pixel": 0.15,
    "loss_ssim": 0.85,
    "loss_flow_smooth": 10.0,
    "loss_flow_consis": 0.01,
}


def _shifted_batch(batch, h=64, w=64, shift=3, seed=0):
    """Synthetic snippets: center frame is prev shifted right by `shift` px."""
    rng = np.random.RandomState(seed)
    base = rng.rand(batch, h, w + 2 * shift, 3).astype(np.float32)
    # smooth it so photometric loss has gradients
    base = (base + np.roll(base, 1, 2) + np.roll(base, 1, 1)) / 3.0
    f0 = base[:, :, 2 * shift :]
    f1 = base[:, :, shift : shift + w]
    f2 = base[:, :, :w]
    return np.concatenate([f0, f1, f2], axis=1)


def test_loss_weights_from_config():
    class C:
        w_ssim = 0.85
        w_flow_smooth = 10.0
        w_flow_consis = 0.01

    w = loss_weights_from_config(C())
    assert w == {
        "loss_pixel": pytest.approx(0.15),
        "loss_ssim": 0.85,
        "loss_flow_smooth": 10.0,
        "loss_flow_consis": 0.01,
    }


def test_train_step_decreases_loss():
    params = init_flow_model(jax.random.PRNGKey(0))
    state = create_train_state(params, lr=1e-4)
    step = make_train_step(CFG, WEIGHTS, lr=1e-4)
    images = jnp.asarray(_shifted_batch(1))

    losses = []
    for _ in range(8):
        state, metrics = step(state, images)
        losses.append(float(metrics["loss_total"]))
    assert int(state.step) == 8
    assert all(np.isfinite(losses))
    # overfitting a single batch must reduce the loss
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_data_parallel_matches_single_device():
    """DP over the 8-CPU mesh must produce the same update as one device."""
    params = init_flow_model(jax.random.PRNGKey(0))
    images = jnp.asarray(_shifted_batch(8))

    # single device (copy params: the donated step consumes its state buffers)
    state1 = create_train_state(jax.tree.map(jnp.copy, params), lr=1e-4)
    step1 = make_train_step(CFG, WEIGHTS, lr=1e-4)
    state1, m1 = step1(state1, images)

    # 8-device data parallel
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    state8 = create_train_state(params, lr=1e-4)
    state8 = jax.device_put(state8, NamedSharding(mesh, P()))
    step8 = make_train_step(CFG, WEIGHTS, lr=1e-4, mesh=mesh)
    images8 = jax.device_put(images, NamedSharding(mesh, P("data")))
    state8, m8 = step8(state8, images8)

    assert np.allclose(float(m1["loss_total"]), float(m8["loss_total"]), rtol=1e-4)
    a = jax.tree.leaves(state1.params)
    b = jax.tree.leaves(state8.params)
    # grad-reduction order differs (one mean vs per-shard mean + pmean); Adam
    # normalizes near-zero grads, so allow update-magnitude (~lr) slack.
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=5e-3, atol=3e-4)


def test_multi_step_matches_sequential_dispatches():
    """K scanned steps must reproduce K sequential dispatches.

    The scan body IS the single-step body (train_step.py::_build_step_body),
    so the trajectories are the same math; XLA compiles the scanned and the
    standalone step into different programs (different fusion order), so
    agreement is to f32 rounding (measured max 9e-6 relative after 3 steps),
    not bitwise.
    """
    K, B = 3, 2
    params = init_flow_model(jax.random.PRNGKey(0))
    batches = np.stack([_shifted_batch(B, seed=s) for s in range(K)])

    state_seq = create_train_state(jax.tree.map(jnp.copy, params), lr=1e-4)
    step1 = make_train_step(CFG, WEIGHTS, lr=1e-4)
    seq_losses = []
    for k in range(K):
        state_seq, m = step1(state_seq, jnp.asarray(batches[k]))
        seq_losses.append(float(m["loss_total"]))

    state_scan = create_train_state(params, lr=1e-4)
    stepk = make_multi_train_step(CFG, WEIGHTS, steps_per_dispatch=K, lr=1e-4)
    state_scan, mk = stepk(state_scan, jnp.asarray(batches))

    assert int(state_scan.step) == K
    assert mk["loss_total"].shape == (K,)
    np.testing.assert_allclose(
        np.asarray(mk["loss_total"], np.float64), seq_losses, rtol=1e-6
    )
    for x, y in zip(jax.tree.leaves(state_seq.params),
                    jax.tree.leaves(state_scan.params)):
        # Fresh-state Adam moves every weight by ~±lr per step with the SIGN
        # of the gradient (m/sqrt(v) ≈ ±1 when v≈0), so fusion-order rounding
        # of a near-zero gradient legitimately flips isolated elements by up
        # to ~K*lr between the two programs (observed: 3/82944 elements at
        # ~1e-4 with lr=1e-4, K=3).  Any real bug (wrong batch order, state
        # threading, donation) diverges at O(weight scale), far above K*lr.
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-3, atol=3.5e-4
        )


@pytest.mark.slow
def test_multi_step_data_parallel():
    """(K, B) scan + DP mesh: shards axis 1, scans axis 0; matches unsharded."""
    K, B = 2, 8
    params = init_flow_model(jax.random.PRNGKey(0))
    batches = np.stack([_shifted_batch(B, seed=s) for s in range(K)])

    state1 = create_train_state(jax.tree.map(jnp.copy, params), lr=1e-4)
    stepk = make_multi_train_step(CFG, WEIGHTS, steps_per_dispatch=K, lr=1e-4)
    state1, m1 = stepk(state1, jnp.asarray(batches))

    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    state8 = create_train_state(params, lr=1e-4)
    state8 = jax.device_put(state8, NamedSharding(mesh, P()))
    stepk8 = make_multi_train_step(
        CFG, WEIGHTS, steps_per_dispatch=K, lr=1e-4, mesh=mesh
    )
    batches8 = jax.device_put(
        jnp.asarray(batches), NamedSharding(mesh, P(None, "data"))
    )
    state8, m8 = stepk8(state8, batches8)

    np.testing.assert_allclose(
        np.asarray(m1["loss_total"]), np.asarray(m8["loss_total"]), rtol=1e-4
    )
    for x, y in zip(jax.tree.leaves(state1.params),
                    jax.tree.leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=5e-3,
                                   atol=3e-4)


def test_uneven_batch_rejected():
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    step8 = make_train_step(CFG, WEIGHTS, lr=1e-4, mesh=mesh)
    params = init_flow_model(jax.random.PRNGKey(0))
    state = create_train_state(params, lr=1e-4)
    with pytest.raises(AssertionError):
        step8(state, jnp.zeros((3, 192, 64, 3)))
