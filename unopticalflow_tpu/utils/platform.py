"""Platform detection shared by every CLI entry point."""

from __future__ import annotations


def on_tpu() -> bool:
    import jax

    return jax.devices()[0].platform == "tpu"


def resolve_pallas(mode: str | bool | None) -> bool:
    """Resolve a --pallas_corr setting ('auto' | 'on' | 'off' | bool).

    The Pallas kernels lower only on TPU — 'auto' means "TPU yes, anything
    else (CPU, GPU) no".
    """
    if isinstance(mode, bool):
        return mode
    if mode in (None, "auto"):
        return on_tpu()
    if mode == "on":
        return True
    if mode == "off":
        return False
    raise ValueError(f"invalid pallas_corr mode {mode!r} (auto|on|off)")
