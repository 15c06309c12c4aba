"""6-DoF PoseNet for the flow+pose joint-training branch.

The reference names a ``Model_flowposenet`` mode but ships no implementation
(its test.py:236-242 raises NameError — SURVEY.md §3.2), so this branch is a
completion of that declared-but-absent surface rather than a port.  The
architecture is the standard SfmLearner-style pose encoder: 7 stride-2 conv
stages over a concatenated frame pair, a 1x1 head to 6 channels, global
average pooling, and a 0.01 output scaling for stable early training.

Convention: ``pose = (tx, ty, tz, rx, ry, rz)`` is the motion of points from
the SECOND frame's camera coordinates into the FIRST frame's, i.e.
``pose_vec2mat(pose)`` (ops/geometry.py:115) maps cam2 points to cam1 — the
same convention as the reference's vestigial ``inverse_warp`` family
(/root/reference/core/networks/structures/inverse_warp.py:139-157).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unopticalflow_tpu.models.layers import conv_block, conv_init

# (in_ch, out_ch, stride); input = two RGB frames stacked on channels
_LAYERS = (
    (6, 16, 2),
    (16, 32, 2),
    (32, 64, 2),
    (64, 128, 2),
    (128, 256, 2),
    (256, 256, 2),
    (256, 256, 2),
)

POSE_SCALE = 0.01


def init_pose_net(key, dtype=jnp.float32, scheme: str = "torch"):
    keys = jax.random.split(key, len(_LAYERS) + 1)
    params = {
        f"conv{i + 1}": conv_init(k, cin, cout, 3, dtype, scheme=scheme)
        for i, ((cin, cout, _), k) in enumerate(zip(_LAYERS, keys))
    }
    params["pose_pred"] = conv_init(keys[-1], _LAYERS[-1][1], 6, 1, dtype, scheme=scheme)
    return params


def apply_pose_net(params, img1, img2, compute_dtype=None):
    """(B, H, W, 3) x2 -> (B, 6) pose vector (t, euler r), frame2 -> frame1."""
    x = jnp.concatenate([img1, img2], axis=-1)
    for i, (_, _, stride) in enumerate(_LAYERS):
        x = conv_block(
            params[f"conv{i + 1}"], x, stride=stride, compute_dtype=compute_dtype
        )
    from unopticalflow_tpu.models.layers import conv_apply

    x = conv_apply(params["pose_pred"], x, compute_dtype=compute_dtype)
    pose = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    return POSE_SCALE * pose
