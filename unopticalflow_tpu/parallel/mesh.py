"""Device mesh + sharding utilities.

The reference's only parallelism is single-host data parallelism via
``torch.nn.DataParallel`` (/root/reference/train.py:36-37): batch is scaled by
the GPU count and iterations divided by it (train.py:208-213).  The TPU-native
equivalent is a 1-D ``jax.sharding.Mesh`` over all local (or all global)
devices with the batch sharded on the ``data`` axis; XLA lowers the gradient
``pmean`` to an all-reduce over ICI (multi-chip) / DCN (multi-host).

Multi-host: call ``jax.distributed.initialize()`` before ``jax.devices()``
resolves; everything below then operates on the global device set.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multi_host(**kwargs) -> None:
    """Multi-host setup: call before any device use on every host.

    Thin wrapper over ``jax.distributed.initialize`` (coordinator address,
    process counts etc. flow through kwargs or cloud auto-detection); after
    it, ``jax.devices()`` spans all hosts and the data mesh below rides
    ICI within a slice and DCN across hosts.
    """
    jax.distributed.initialize(**kwargs)


def data_parallel_mesh(num_devices: int | None = None) -> Mesh:
    """1-D ``data`` mesh over the first ``num_devices`` devices (default all)."""
    devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices but only {len(devices)} present"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch(mesh: Mesh, batch):
    """Place a host batch sharded on axis 0 over the ``data`` mesh axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.device_put(batch, sharding)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
