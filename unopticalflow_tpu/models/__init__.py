"""Model registry.

Mirrors the reference registry (/root/reference/core/networks/__init__.py:5-9)
where only ``'flow'`` is a live mode; other modes raise, matching the
reference's behavior (its depth/pose classes are absent — SURVEY.md §3.2).
"""

from unopticalflow_tpu.models.flow_model import (
    FlowModelConfig,
    forward,
    inference_flow,
    init_flow_model,
)

_REGISTRY = {"flow": init_flow_model}


def get_model(mode: str):
    """Return the initializer for ``mode``; only 'flow' is registered."""
    if mode not in _REGISTRY:
        raise ValueError(
            f"mode '{mode}' is not registered (only {sorted(_REGISTRY)} exist; "
            "the reference's depth/flowposenet modes reference classes that do "
            "not exist in its repo — see SURVEY.md §3.2)"
        )
    return _REGISTRY[mode]


__all__ = [
    "FlowModelConfig",
    "forward",
    "inference_flow",
    "init_flow_model",
    "get_model",
]
