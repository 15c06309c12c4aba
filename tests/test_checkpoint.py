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


def test_unknown_keys_rejected():
    with pytest.raises(ValueError, match="unrecognized"):
        torch_state_dict_to_params({"bogus.layer.weight": np.zeros((1, 1, 3, 3))})


def test_atomic_write_leaves_no_tmp(state, tmp_path):
    path = str(tmp_path / "last.ckpt")
    ckpt.save_checkpoint(path, 1, state.params)
    assert os.path.exists(path)
    assert not os.path.exists(path + ".tmp")
