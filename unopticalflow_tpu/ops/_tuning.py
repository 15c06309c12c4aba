"""Shared Pallas compiler-tuning knobs for the kernel families.

A/B knobs (defaults reflect on-chip v5e measurements; see
benchmarks/PROFILE_r03.md):

  UNFLOW_DIMSEM=1  — annotate the grid ("parallel", "parallel").  Both grid
    dims index independent output blocks (batch, row-tile), so declaring
    them parallel lets Mosaic relax its sequential-grid pipeline ordering.
  UNFLOW_INFUSE=1  — allow XLA to fuse producers into kernel operands
    (e.g. the NHWC->NCHW boundary transpose / halo pad), trading the
    materialized relayout for in-fusion operand generation.

The env vars are read at *call* time (trace time — negligible cost), so
monkeypatching ``os.environ`` inside a process works for A/B runs; used by
ops/pallas_kernels.py and ops/pallas_photometric.py.
"""

from __future__ import annotations

import os

from jax.experimental.pallas import tpu as pltpu


def cparams(n_inputs: int):
    """CompilerParams for an ``n_inputs``-operand kernel, or None (default)."""
    dimsem = os.environ.get("UNFLOW_DIMSEM", "0") == "1"
    infuse = os.environ.get("UNFLOW_INFUSE", "0") == "1"
    if not (dimsem or infuse):
        return None
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel") if dimsem else None,
        allow_input_fusion=[True] * n_inputs if infuse else None,
    )
