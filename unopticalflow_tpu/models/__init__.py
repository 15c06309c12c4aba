"""Model registry.

Mirrors the reference registry (/root/reference/core/networks/__init__.py:5-9)
where only ``'flow'`` is a live mode.  ``'flowposenet'`` — declared but
unimplemented in the reference (its test.py:236-242 raises NameError,
SURVEY.md §3.2) — is completed here as the flow+pose joint branch
(models/flowpose_model.py).  ``'depth'`` modes still raise, matching the
reference's broken surface.
"""

from unopticalflow_tpu.models.flow_model import (
    FlowModelConfig,
    forward,
    inference_flow,
    init_flow_model,
)
from unopticalflow_tpu.models.flowpose_model import (
    forward_flowpose,
    inference_pose,
    init_flowpose_model,
)

_REGISTRY = {"flow": init_flow_model, "flowposenet": init_flowpose_model}


def get_model(mode: str):
    """Return the initializer for ``mode``."""
    if mode not in _REGISTRY:
        raise ValueError(
            f"mode '{mode}' is not registered (only {sorted(_REGISTRY)} exist; "
            "the reference's depth modes reference classes that do not exist "
            "in its repo — see SURVEY.md §3.2)"
        )
    return _REGISTRY[mode]


__all__ = [
    "FlowModelConfig",
    "forward",
    "forward_flowpose",
    "inference_flow",
    "inference_pose",
    "init_flow_model",
    "init_flowpose_model",
    "get_model",
]
