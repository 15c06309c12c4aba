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


def test_uneven_batch_rejected():
    mesh = Mesh(np.asarray(jax.devices()[:8]), axis_names=("data",))
    step8 = make_train_step(CFG, WEIGHTS, lr=1e-4, mesh=mesh)
    params = init_flow_model(jax.random.PRNGKey(0))
    state = create_train_state(params, lr=1e-4)
    with pytest.raises(AssertionError):
        step8(state, jnp.zeros((3, 192, 64, 3)))
