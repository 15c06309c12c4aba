"""Device-mesh construction and sharding helpers."""

from unopticalflow_tpu.parallel.mesh import (
    data_parallel_mesh,
    initialize_multi_host,
    shard_batch,
    replicate,
)

__all__ = [
    "data_parallel_mesh",
    "initialize_multi_host",
    "shard_batch",
    "replicate",
]
