"""Bilinear resizing with PyTorch ``F.interpolate`` parity.

The reference upsamples flows with ``F.interpolate(mode='bilinear')`` and the
PyTorch-1.2 default ``align_corners=False`` (pwc_tf.py:119,131,144,156,174-177)
— half-pixel source coordinates ``(i + 0.5) * scale - 0.5`` with edge
clamping.  ``jax.image.resize(method='linear', antialias=False)`` implements
exactly those semantics, so these are thin wrappers that also handle dtype and
the 2x-upsample-and-double idiom used between decoder levels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear(x: jax.Array, out_hw) -> jax.Array:
    """Resize NHWC tensor to (H', W') with torch align_corners=False parity."""
    b, _, _, c = x.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    return jax.image.resize(x, (b, oh, ow, c), method="linear", antialias=False)


def upsample2x_double(flow: jax.Array) -> jax.Array:
    """``F.interpolate(flow, scale_factor=2, mode='bilinear') * 2``.

    Used between PWC decoder levels (pwc_tf.py:119 etc.): the spatial
    resolution doubles and the flow *values* double with it.
    """
    _, h, w, _ = flow.shape
    return resize_bilinear(flow, (2 * h, 2 * w)) * jnp.asarray(2.0, flow.dtype)
