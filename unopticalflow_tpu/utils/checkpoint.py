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


def _serialize_payload(step: int, params, opt_state) -> bytes:
    return serialization.to_bytes({
        "iteration": int(step),
        "params": _to_host(params),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
    })


def _atomic_write(path: str, blob: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def save_checkpoint(path: str, step: int, params, opt_state=None) -> None:
    _atomic_write(path, _serialize_payload(step, params, opt_state))


class AsyncCheckpointer:
    """Non-blocking checkpoint writes (extension; the reference saves
    synchronously, /root/reference/train.py:153-155).

    ``save()`` snapshots the live device buffers with ONE jitted device-side
    copy (donation-safe: the training step donates its input state, so the
    worker must never read the original buffers) and returns immediately;
    a single worker thread then fetches device->host, serializes ONCE and
    atomically writes every requested path in order.  The training loop's
    host thread never blocks on the D2H fetch or the disk write — material
    on a remote-runtime host where fetching the full train state takes
    seconds per checkpoint.

    Write order is preserved (one worker), so the rolling ``last.ckpt`` is
    always the newest payload.  ``wait()`` drains pending writes; worker
    errors surface on the next ``save()``/``wait()``.
    """

    def __init__(self):
        import queue
        import threading

        import jax.numpy as jnp

        # Bounded queue: each entry pins a full device-side copy of
        # params+opt_state, so saves outpacing the writer must back-pressure
        # (save() blocks on a full queue) instead of accumulating snapshots
        # in HBM without bound.
        self._q: "queue.Queue" = queue.Queue(maxsize=2)
        self._err = None
        self._copy = jax.jit(lambda t: jax.tree.map(jnp.copy, t))
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            item = self._q.get()
            try:
                if item is None:
                    return
                paths, step, (params, opt_state) = item
                blob = _serialize_payload(step, params, opt_state)
                for path in paths:
                    _atomic_write(path, blob)
            except Exception as e:  # surfaced on the next save()/wait()
                self._err = e
            finally:
                self._q.task_done()

    def _check(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async checkpoint write failed") from err

    def save(self, paths, step: int, params, opt_state=None) -> None:
        """Snapshot now, write later.  ``paths``: every file to write."""
        import jax.numpy as jnp

        self._check()
        tree = (params, opt_state)
        if all(
            getattr(x, "is_fully_addressable", True)
            for x in jax.tree.leaves(tree)
        ):
            snap = self._copy(tree)
        else:
            # Multi-host: the train state is replicated over the GLOBAL mesh,
            # so process 0 cannot run a jitted copy on it alone (the program
            # would span unaddressable devices).  Snapshot the local replica
            # instead — per-leaf device-side copies of addressable_shards[0],
            # which holds the full value for a P() (replicated) layout.
            snap = jax.tree.map(
                lambda x: jnp.copy(x.addressable_shards[0].data)
                if not getattr(x, "is_fully_addressable", True)
                else jnp.copy(x),
                tree,
            )
        self._q.put((list(paths), step, snap))

    def wait(self) -> None:
        """Block until every queued checkpoint is durably on disk."""
        self._q.join()
        self._check()

    def close(self) -> None:
        """Drain, stop the worker, THEN surface any pending write error.

        The sentinel/join must happen even when a write failed — otherwise
        the worker thread outlives an object its owner believes is shut
        down (and the error would make close() unrepeatable).
        """
        self._q.join()
        self._q.put(None)
        self._thread.join(timeout=10)
        self._check()


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
