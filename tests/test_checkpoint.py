"""Checkpoint save/restore + torch .pth ingestion tests."""

import os

import numpy as np
import pytest
import torch

import jax

from unopticalflow_tpu.models import init_flow_model
from unopticalflow_tpu.training import create_train_state
from unopticalflow_tpu.utils import checkpoint as ckpt
from unopticalflow_tpu.utils.torch_convert import (
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)


@pytest.fixture(scope="module")
def state():
    params = init_flow_model(jax.random.PRNGKey(0))
    return create_train_state(params, lr=1e-4)


def test_save_restore_roundtrip(state, tmp_path):
    path = str(tmp_path / "iter_5.ckpt")
    ckpt.save_checkpoint(path, 5, state.params, state.opt_state)
    it, params, opt_state = ckpt.restore_checkpoint(path, state.params, state.opt_state)
    assert it == 5
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert len(jax.tree.leaves(opt_state)) == len(jax.tree.leaves(state.opt_state))


def test_torch_pth_ingestion(state, tmp_path):
    """A reference-layout .pth (incl. DataParallel prefix) loads correctly."""
    sd = {
        "module." + k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in params_to_torch_state_dict(state.params).items()
    }
    path = str(tmp_path / "last.pth")
    torch.save({"iteration": 42, "model_state_dict": sd,
                "optimizer_state_dict": {}}, path)
    it, params = ckpt.load_pretrained(path)
    assert it == 42
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_torch_pth_export_roundtrip(state, tmp_path):
    """export_torch_checkpoint writes a .pth that our own ingester round-trips.

    The exported dict mirrors what the reference train loop saves
    (/root/reference/train.py:23-24), so it is the reverse of ingestion.
    """
    from unopticalflow_tpu.utils.torch_convert import export_torch_checkpoint

    path = str(tmp_path / "exported.pth")
    export_torch_checkpoint(path, state.params, iteration=7)
    it, params = ckpt.load_pretrained(path)
    assert it == 7
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_unknown_keys_rejected():
    with pytest.raises(ValueError, match="unrecognized"):
        torch_state_dict_to_params({"bogus.layer.weight": np.zeros((1, 1, 3, 3))})


def test_atomic_write_leaves_no_tmp(state, tmp_path):
    path = str(tmp_path / "last.ckpt")
    ckpt.save_checkpoint(path, 1, state.params)
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")


def test_async_checkpointer_roundtrip(state, tmp_path):
    """Async save == sync save: snapshot now, durable after wait()."""
    saver = ckpt.AsyncCheckpointer()
    p1 = str(tmp_path / "iter_9.ckpt")
    p2 = str(tmp_path / "last.ckpt")
    saver.save((p1, p2), 9, state.params, state.opt_state)
    saver.wait()
    for path in (p1, p2):
        it, params, opt_state = ckpt.restore_checkpoint(
            path, state.params, state.opt_state
        )
        assert it == 9
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not os.path.exists(path + ".tmp")
    saver.close()


def test_async_checkpointer_snapshot_isolation(state, tmp_path):
    """The saved payload is the value AT save() time, not at write time.

    The training loop donates its state buffers into the next step right
    after save() returns; the device-side copy must decouple the write from
    later mutation/deletion of the original buffers.
    """
    import jax.numpy as jnp

    saver = ckpt.AsyncCheckpointer()
    params = {"w": jnp.arange(4.0)}
    path = str(tmp_path / "snap.ckpt")
    saver.save([path], 1, params)
    params["w"].delete()  # simulate donation of the original buffer
    saver.wait()
    _, restored, _ = ckpt.restore_checkpoint(path, {"w": np.zeros(4)})
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.arange(4.0))
    saver.close()


def test_async_checkpointer_order_and_rolling_last(state, tmp_path):
    """Writes land in order: last.ckpt holds the NEWEST queued payload."""
    import jax.numpy as jnp

    saver = ckpt.AsyncCheckpointer()
    last = str(tmp_path / "last.ckpt")
    for step in range(3):
        saver.save([last], step, {"w": jnp.full(2, float(step))})
    saver.wait()
    it, restored, _ = ckpt.restore_checkpoint(last, {"w": np.zeros(2)})
    assert it == 2
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.full(2, 2.0))
    saver.close()


def test_async_checkpointer_error_surfaces(state, tmp_path):
    import jax.numpy as jnp

    saver = ckpt.AsyncCheckpointer()
    saver.save([str(tmp_path / "no_such_dir" / "x.ckpt")], 0, {"w": jnp.zeros(1)})
    with pytest.raises(RuntimeError, match="async checkpoint"):
        saver.wait()
    # the saver recovers after surfacing the error
    ok = str(tmp_path / "ok.ckpt")
    saver.save([ok], 1, {"w": jnp.zeros(1)})
    saver.wait()
    assert os.path.exists(ok)
    saver.close()
