"""Pure compute primitives (NHWC, functional, jit-friendly).

Every op here has PyTorch-parity semantics documented against the reference
(`/root/reference`, cited per-op) and is unit-tested against torch-CPU in
`tests/test_ops.py`.
"""

from unopticalflow_tpu.ops.warp import bilinear_warp, warp_validity_mask
from unopticalflow_tpu.ops.geometry import (
    cam2pixel,
    euler2mat,
    inverse_warp,
    inverse_warp2,
    pixel2cam,
    pose_vec2mat,
    quat2mat,
)
from unopticalflow_tpu.ops.cost_volume import cost_volume, cost_volume_xla
from unopticalflow_tpu.ops.ssim import ssim
from unopticalflow_tpu.ops.pyramid import avg_pool_pyramid, adaptive_avg_pool
from unopticalflow_tpu.ops.resize import resize_bilinear, upsample2x_double

__all__ = [
    "bilinear_warp",
    "warp_validity_mask",
    "cam2pixel",
    "euler2mat",
    "inverse_warp",
    "inverse_warp2",
    "pixel2cam",
    "pose_vec2mat",
    "quat2mat",
    "cost_volume",
    "cost_volume_xla",
    "ssim",
    "avg_pool_pyramid",
    "adaptive_avg_pool",
    "resize_bilinear",
    "upsample2x_double",
]
