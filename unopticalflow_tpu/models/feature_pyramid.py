"""Six-stage convolutional feature encoder.

Capability parity with the reference FeaturePyramid
(/root/reference/core/networks/structures/feature_pyramid.py:7-36): 12 conv
blocks (LeakyReLU 0.1), alternating stride-2/stride-1, producing features at
1/2 .. 1/64 resolution with channels (16, 32, 64, 96, 128, 196).

Implemented as a flat config-driven loop over (in, out, stride) tuples rather
than hand-unrolled layers; XLA maps each conv onto the MXU.
"""

from __future__ import annotations

import jax

from unopticalflow_tpu.models.layers import conv_block, conv_init

# (in_ch, out_ch, stride) for conv1..conv12; every odd layer downsamples.
_LAYERS = (
    (3, 16, 2), (16, 16, 1),
    (16, 32, 2), (32, 32, 1),
    (32, 64, 2), (64, 64, 1),
    (64, 96, 2), (96, 96, 1),
    (96, 128, 2), (128, 128, 1),
    (128, 196, 2), (196, 196, 1),
)

FEATURE_CHANNELS = (16, 32, 64, 96, 128, 196)


def init_feature_pyramid(key, dtype=jax.numpy.float32):
    keys = jax.random.split(key, len(_LAYERS))
    return {
        f"conv{i + 1}": conv_init(k, cin, cout, 3, dtype)
        for i, ((cin, cout, _), k) in enumerate(zip(_LAYERS, keys))
    }


def apply_feature_pyramid(params, img: jax.Array, compute_dtype=None):
    """img (B, H, W, 3) -> tuple of 6 feature maps at 1/2 .. 1/64 res."""
    feats = []
    x = img
    for i, (_, _, stride) in enumerate(_LAYERS):
        x = conv_block(
            params[f"conv{i + 1}"], x, stride=stride, compute_dtype=compute_dtype
        )
        if stride == 1:  # every stride-1 conv closes one pyramid stage
            feats.append(x)
    return tuple(feats)
