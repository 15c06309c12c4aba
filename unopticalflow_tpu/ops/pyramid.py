"""Multi-scale image pyramids via adaptive average pooling.

Reference semantics (/root/reference/core/networks/model_flow_paper.py:54-60):
scale s of the pyramid is ``F.adaptive_avg_pool2d(img, [H//2^s, W//2^s])``
with gradients stopped (the reference reads ``.data``).  PyTorch's adaptive
pool averages input window [floor(i*H/OH), ceil((i+1)*H/OH)) per output row;
when the size divides evenly this is a plain 2^s x 2^s mean pool, which is the
case for every reference config (256x832, 384x832, 192x256 at num_scales=3).

``adaptive_avg_pool`` implements the exact general semantics: the even case
lowers to ``lax.reduce_window`` (VPU), the uneven case to two small
pooling-matrix contractions (MXU) built statically from the torch window
formula — both bit-match torch up to float association.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pool_matrix(in_size: int, out_size: int, dtype) -> jax.Array:
    """(out_size, in_size) row-normalized adaptive-pool indicator matrix."""
    mat = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -((-(i + 1) * in_size) // out_size)  # ceil
        mat[i, lo:hi] = 1.0 / (hi - lo)
    return jnp.asarray(mat, dtype=dtype)


def adaptive_avg_pool(img: jax.Array, out_hw) -> jax.Array:
    """Adaptive average pool of an NHWC image to ``out_hw``."""
    _, h, w, _ = img.shape
    oh, ow = int(out_hw[0]), int(out_hw[1])
    if h == oh and w == ow:
        return img
    if h % oh == 0 and w % ow == 0:
        kh, kw = h // oh, w // ow
        # reshape + mean instead of lax.reduce_window (the TPU reduce-window
        # emitter is far slower than this fusable reshape-reduce form).
        # NOTE a two-stage variant (H-pool on a W*C-folded view, then W-pool)
        # was A/B'd on-chip and is perf-neutral (74.0 vs 73.7 ms/step) — XLA
        # already schedules this joint reduce well; keep the simple form.
        b, _, _, c = img.shape
        s = img.reshape(b, oh, kh, ow, kw, c).sum(axis=(2, 4), dtype=img.dtype)
        return s * jnp.asarray(1.0 / (kh * kw), img.dtype)
    ph = _pool_matrix(h, oh, img.dtype)
    pw = _pool_matrix(w, ow, img.dtype)
    out = jnp.einsum("oh,bhwc->bowc", ph, img, precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum(
        "pw,bowc->bopc", pw, out.astype(img.dtype), precision=jax.lax.Precision.HIGHEST
    )


def avg_pool_pyramid(img: jax.Array, num_levels: int) -> list[jax.Array]:
    """[img, pool(H/2), pool(H/4), ...] with stopped gradients (all levels).

    Matches model_flow_paper.py:54-60 including the stop-gradient at scale 0
    (the reference takes ``.data`` of every level, so the photometric losses
    never backprop into the images — they only flow through the warps).

    When every level halves evenly, each level is pooled from the previous one
    (a 2x2 mean of 2x2 means equals the 4x4 mean exactly), reading 1/4 the
    data per level instead of re-pooling the full-resolution image.
    """
    _, h, w, _ = img.shape
    sizes = [(int(h / (2**s)), int(w / (2**s))) for s in range(num_levels)]
    chain = all(
        (ph == 2 * ch and pw == 2 * cw)
        for (ph, pw), (ch, cw) in zip(sizes[:-1], sizes[1:])
    )
    out = [jax.lax.stop_gradient(img)]
    for s in range(1, num_levels):
        src = out[-1] if chain else img
        lvl = adaptive_avg_pool(src, sizes[s])
        out.append(jax.lax.stop_gradient(lvl))
    return out
