"""Device-mesh construction and sharding helpers."""

from unopticalflow_tpu.parallel.mesh import (
    data_parallel_mesh,
    initialize_multi_host,
    shard_batch,
    replicate,
)
from unopticalflow_tpu.parallel.spatial import (
    make_spatial_infer,
    shard_images,
    spatial_mesh,
)

__all__ = [
    "data_parallel_mesh",
    "initialize_multi_host",
    "shard_batch",
    "replicate",
    "make_spatial_infer",
    "shard_images",
    "spatial_mesh",
]
