"""Checkpointing: {step, params, opt_state} with the reference's cadence.

The reference saves ``iter_<n>.pth`` plus a rolling ``last.pth`` every
``save_interval`` iterations and resumes all three fields
(/root/reference/train.py:23-31,153-155).  Here the same layout is kept with
``.ckpt`` files written via ``flax.serialization`` (msgpack), plus direct
ingestion of reference ``.pth`` files through utils/torch_convert.py.

Writes are atomic (temp file + rename) so a preempted host never leaves a
truncated ``last.ckpt`` — the one resilience upgrade over the reference.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, step: int, params, opt_state=None) -> None:
    payload = {
        "iteration": int(step),
        "params": _to_host(params),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
    }
    blob = serialization.to_bytes(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def restore_checkpoint(path: str, params_like, opt_state_like=None):
    """Restore into templates; returns (iteration, params, opt_state)."""
    with open(path, "rb") as f:
        blob = f.read()
    template = {
        "iteration": 0,
        "params": _to_host(params_like),
        "opt_state": _to_host(opt_state_like) if opt_state_like is not None else None,
    }
    payload = serialization.from_bytes(template, blob)
    return payload["iteration"], payload["params"], payload["opt_state"]


def load_pretrained(path: str, params_like=None):
    """Load either a native .ckpt or a reference .pth; returns (iter, params).

    .pth ingestion handles the reference's DataParallel / warm-start key
    prefixes (train.py:47-75).
    """
    if path.endswith(".pth") or path.endswith(".pt"):
        from unopticalflow_tpu.utils.torch_convert import load_torch_checkpoint

        return load_torch_checkpoint(path)
    if params_like is None:
        raise ValueError("restoring a .ckpt requires a params template")
    it, params, _ = restore_checkpoint(path, params_like)
    return it, params
