"""Windowed SSIM via 3x3 average pooling.

Reference semantics (/root/reference/core/networks/pytorch_ssim/ssim.py:4-19):
means/variances/covariance from ``nn.AvgPool2d(3, 1, padding=1)`` — a 3x3
stride-1 zero-padded average pool whose divisor is always 9
(count_include_pad=True, the PyTorch default), constants C1=0.01^2, C2=0.03^2.
Returns the raw per-pixel SSIM map (no clamping; the loss layer clamps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_C1 = 0.01**2
_C2 = 0.03**2


def _avg_pool3(x: jax.Array) -> jax.Array:
    """3x3 stride-1 average pool, zero padding, divisor fixed at 9 (NHWC)."""
    # init must be the literal 0.0 so JAX pattern-matches the differentiable
    # reduce_window_sum monoid (an Array init kills reverse-mode autodiff)
    s = jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )
    return s * jnp.asarray(1.0 / 9.0, x.dtype)


def ssim(x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-pixel SSIM map of two NHWC images, PyTorch-AvgPool parity."""
    mu_x = _avg_pool3(x)
    mu_y = _avg_pool3(y)
    sigma_x = _avg_pool3(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3(x * y) - mu_x * mu_y

    num = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    den = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    return num / den
