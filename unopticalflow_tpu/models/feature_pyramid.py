"""Six-stage convolutional feature encoder.

Capability parity with the reference FeaturePyramid
(/root/reference/core/networks/structures/feature_pyramid.py:7-36): 12 conv
blocks (LeakyReLU 0.1), alternating stride-2/stride-1, producing features at
1/2 .. 1/64 resolution with channels (16, 32, 64, 96, 128, 196).

TPU note — the packed first stage: the first three convs have 3-32 channels
at full/half resolution, which runs the 128x128 MXU at 2-9 TFLOP/s (traced);
they cost as much as the entire rest of the encoder.  ``apply`` therefore
evaluates conv1-conv3 in space-to-depth form: the input is packed 4x4 into
48 channels and each conv's 3x3 kernel is re-laid (exactly, with structural
zeros) into a cell-space kernel over packed channels, so the same MACs run
as 48->64->64->32-channel matmuls.  The math is identical up to float
reassociation; parameters keep their canonical (torch-compatible) layout and
the repack happens under jit per step (a few KB of weight shuffling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unopticalflow_tpu.models.layers import (
    LEAKY_SLOPE,
    conv_block,
    conv_init,
    raw_conv,
)

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


def init_feature_pyramid(key, dtype=jax.numpy.float32, scheme: str = "torch"):
    keys = jax.random.split(key, len(_LAYERS))
    return {
        f"conv{i + 1}": conv_init(k, cin, cout, 3, dtype, scheme=scheme)
        for i, ((cin, cout, _), k) in enumerate(zip(_LAYERS, keys))
    }


def _space_to_depth(x, f):
    """(B, H, W, C) -> (B, H/f, W/f, f*f*C); channel order (dy, dx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // f, f, w // f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // f, w // f, f * f * c)


def _depth_to_space(x, f, c):
    """Inverse of _space_to_depth."""
    b, hc, wc, _ = x.shape
    x = x.reshape(b, hc, wc, f, f, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hc * f, wc * f, c)


def _pack_weight(w, p_in: int, p_out: int, stride: int):
    """Re-lay a 3x3 conv kernel into cell space (exact, structural zeros).

    The canonical conv has stride ``stride`` over an input whose pixels are
    packed ``p_in`` x ``p_in`` per cell; outputs are packed ``p_out`` x
    ``p_out`` per cell (requires stride * p_out == p_in, so input and output
    cell grids coincide).  Output pixel (p_out*i + ry) reads input row
    r = stride*ry + ky - 1 relative to 4*i, which lives in cell i + r//p_in
    at in-cell offset r % p_in.  Returns (packed kernel HWIO over packed
    channels, cell-space padding).
    """
    assert stride * p_out == p_in
    k = w.shape[0]
    cin, cout = w.shape[2], w.shape[3]
    offs = [stride * r + kk - 1 for r in range(p_out) for kk in range(k)]
    min_c = min(o // p_in for o in offs)
    max_c = max(o // p_in for o in offs)
    kp = max_c - min_c + 1
    wp = jnp.zeros((kp, kp, p_in * p_in * cin, p_out * p_out * cout), w.dtype)
    for ry in range(p_out):
        for ky in range(k):
            r = stride * ry + ky - 1
            py, dy = r // p_in - min_c, r % p_in
            for rx in range(p_out):
                for kx in range(k):
                    s = stride * rx + kx - 1
                    px, dx = s // p_in - min_c, s % p_in
                    ci = (dy * p_in + dx) * cin
                    co = (ry * p_out + rx) * cout
                    wp = wp.at[py, px, ci : ci + cin, co : co + cout].set(w[ky, kx])
    pad = (-min_c, max_c)
    return wp, pad


def _packed_block(p, x, p_in, p_out, stride, compute_dtype):
    """conv_block evaluated in cell space (see _pack_weight)."""
    w, b = p["w"], p["b"]
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        x = x.astype(compute_dtype)
    wp, pad = _pack_weight(w, p_in, p_out, stride)
    out = raw_conv(x, wp, stride=1, padding=(pad, pad))
    bp = jnp.tile(b.astype(x.dtype), p_out * p_out)
    return jax.nn.leaky_relu(out.astype(x.dtype) + bp, LEAKY_SLOPE)


def apply_feature_pyramid(
    params, img: jax.Array, compute_dtype=None, packed_stage1: bool = True
):
    """img (B, H, W, 3) -> tuple of 6 feature maps at 1/2 .. 1/64 res."""
    feats = []
    h, w = img.shape[1], img.shape[2]
    start = 0
    x = img
    if packed_stage1 and h % 4 == 0 and w % 4 == 0:
        # conv1 (s2, 3->16), conv2 (s1, 16->16), conv3 (s2, 16->32) in packed
        # cell space: 48->64, 64->64 (k3), 64->32; conv3's output lands
        # unpacked at 1/4 resolution, from where the canonical loop continues.
        xp = _space_to_depth(img, 4)
        xp = _packed_block(params["conv1"], xp, 4, 2, 2, compute_dtype)
        xp = _packed_block(params["conv2"], xp, 2, 2, 1, compute_dtype)
        feats.append(_depth_to_space(xp, 2, _LAYERS[1][1]))
        x = _packed_block(params["conv3"], xp, 2, 1, 2, compute_dtype)
        start = 3
        # NOTE: extending the packing to conv4/conv5 (128-channel cell convs)
        # was measured SLOWER end-to-end (89.6 vs 90.9 snippets/s): at >=32
        # channels the canonical convs already tile the MXU adequately and the
        # 4x structural-zero FLOP inflation dominates.  Packing stops here.
    for i in range(start, len(_LAYERS)):
        _, _, stride = _LAYERS[i]
        x = conv_block(
            params[f"conv{i + 1}"], x, stride=stride, compute_dtype=compute_dtype
        )
        if stride == 1:  # every stride-1 conv closes one pyramid stage
            feats.append(x)
    return tuple(feats)
