"""Datasets: offline preparers (host multiprocessing) + training loaders.

Raw-set preparers write the same prepared-directory layout as the reference
(stacked-frame PNGs, per-folder + global ``train.txt`` manifests, copied
calibration files), so prepared directories are interchangeable between the
two frameworks.  Training datasets are host-side numpy (NHWC) feeding a
threaded, double-buffered device prefetcher.
"""

from unopticalflow_tpu.data.preparers import (
    KITTI_RAW,
    KITTI_Odo,
    NYU_Prepare,
    SINTEL_RAW,
)
from unopticalflow_tpu.data.datasets import (
    KITTI_2012,
    KITTI_2015,
    KITTI_Prepared,
    NYU_v2,
    SINTEL_Prepared,
)
from unopticalflow_tpu.data.loader import BatchLoader, device_prefetch

__all__ = [
    "KITTI_RAW",
    "KITTI_Odo",
    "NYU_Prepare",
    "SINTEL_RAW",
    "KITTI_2012",
    "KITTI_2015",
    "KITTI_Prepared",
    "NYU_v2",
    "SINTEL_Prepared",
    "BatchLoader",
    "device_prefetch",
]
