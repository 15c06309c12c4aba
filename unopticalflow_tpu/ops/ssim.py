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
    """3x3 stride-1 average pool, zero padding, divisor fixed at 9 (NHWC).

    Computed on a lane-packed (B, H, W*C) view with a channel-dilated window:
    window elements at lane offsets {0, C, 2C} are exactly the three
    neighboring columns of one channel, and the C zero-pad lanes act as the
    zero image border.  This keeps all 128 lanes busy for small C (an NHWC
    C=3 pool pads its lane dim 42x otherwise).
    """
    b, h, w, c = x.shape
    packed = x.reshape(b, h, w * c)
    # explicit pad + shifted adds instead of lax.reduce_window: the TPU
    # reduce-window emitter runs ~20x slower than bandwidth (measured 1.08 ms
    # per full-res pool); these slices fuse into one loop fusion
    p = jnp.pad(packed, ((0, 0), (1, 1), (0, 0)))
    t = p[:, :-2] + p[:, 1:-1] + p[:, 2:]
    q = jnp.pad(t, ((0, 0), (0, 0), (c, c)))
    s = q[:, :, : -2 * c] + q[:, :, c:-c] + q[:, :, 2 * c :]
    return s.reshape(b, h, w, c) * jnp.asarray(1.0 / 9.0, x.dtype)


def ssim(x: jax.Array, y: jax.Array) -> jax.Array:
    """Per-pixel SSIM map of two NHWC images, PyTorch-AvgPool parity.

    Always computed in float32: the sigma terms are differences of products
    (pool(x^2) - mu^2) whose cancellation loses most bits in bfloat16.  A
    bf16 input is converted inside the fused pool read, so the HBM-side
    traffic still benefits from the half-width inputs.
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mu_x = _avg_pool3(x)
    mu_y = _avg_pool3(y)
    sigma_x = _avg_pool3(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3(x * y) - mu_x * mu_y

    num = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    den = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    return num / den
