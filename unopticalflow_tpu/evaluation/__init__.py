"""Evaluation: flow/depth/odometry metrics and flow-file I/O (host-side numpy)."""

from unopticalflow_tpu.evaluation.evaluate_flow import (
    eval_flow_avg,
    load_gt_flow_kitti,
    load_gt_flow_sintel,
    get_scaled_intrinsic_matrix,
)
from unopticalflow_tpu.evaluation.evaluate_mask import eval_mask, load_gt_mask
from unopticalflow_tpu.evaluation.evaluate_depth import eval_depth
from unopticalflow_tpu.evaluation.depth_harness import (
    load_nyu_test_data,
    test_eigen_depth,
    test_nyu,
)

__all__ = [
    "load_nyu_test_data",
    "test_eigen_depth",
    "test_nyu",
    "eval_flow_avg",
    "load_gt_flow_kitti",
    "load_gt_flow_sintel",
    "get_scaled_intrinsic_matrix",
    "eval_mask",
    "load_gt_mask",
    "eval_depth",
]
