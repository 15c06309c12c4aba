"""tpu-unflow: TPU-native occlusion-aware unsupervised optical flow.

A from-scratch JAX/XLA/Pallas framework with the full capabilities of the
UnOpticalFlow reference (PWC-style pyramid flow network trained without labels
on video snippets, SPIE MV 2021). Compute path is functional JAX compiled by
XLA onto the TPU MXU/VPU, with Pallas kernels for the bandwidth-bound hot ops
(cost volume); scaling is data-parallel over a `jax.sharding.Mesh`.

Layout:
    ops/         pure compute primitives (warp, cost volume, SSIM, pyramids)
    models/      feature encoder + PWC decoder + the flow model / loss stack
    training/    jitted train step, optimizer, training loop
    parallel/    device-mesh construction and sharded train step
    data/        dataset preparers (host multiprocessing) + prefetch loaders
    evaluation/  KITTI/Sintel flow metrics, flow I/O, depth/odometry metrics
    utils/       config, checkpointing, torch-weight conversion, logging
"""

__version__ = "0.1.0"
