"""PWC-style coarse-to-fine optical-flow decoder.

Capability parity with the reference PWC_tf
(/root/reference/core/networks/structures/pwc_tf.py:16-179): five pyramid
levels (6 -> 2).  Each level correlates source features against (warped)
target features in a +-4 px window (81 channels), runs a densely-connected
5-conv estimator (128, 128, 96, 64, 32 with concat skips) and a 2-channel
flow head; levels 5..2 warp the target features by the 2x-upsampled coarser
flow and predict a residual.  Level 2 is refined by a 7-conv dilated context
network.  Outputs are 4 flows bilinearly upsampled (and scaled x4) to
[(H, W), (H/2, W/2), (H/4, W/4), (H/8, W/8)].

TPU design notes: everything is expressed level-by-level as dense NHWC convs
(MXU) plus the cost-volume and warp primitives from ``ops``; the level loop is
a static Python loop (5 iterations, distinct channel widths) so XLA sees one
flat graph and can fuse warp/corr into the surrounding convs.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from unopticalflow_tpu.models.layers import conv_block, conv_apply, conv_init
from unopticalflow_tpu.ops.cost_volume import cost_volume
from unopticalflow_tpu.ops.resize import resize_bilinear, upsample2x_double
from unopticalflow_tpu.ops.warp import bilinear_warp, bilinear_warp_nchw

MAX_DISPLACEMENT = 4
_ND = (2 * MAX_DISPLACEMENT + 1) ** 2  # 81 correlation channels
_DD = (128, 128, 96, 64, 32)  # estimator widths (pwc_tf.py:25)

# decoder levels, coarsest first: (level id, feature channels of that level,
# extra input channels beyond the cost volume: features + upsampled flow)
_LEVELS = (
    (6, 196, 0),
    (5, 128, 128 + 2),
    (4, 96, 96 + 2),
    (3, 64, 64 + 2),
    (2, 32, 32 + 2),
)

# context network: (in_ch, out_ch, dilation); final layer is a linear flow head
_CONTEXT = (
    (_DD[4] + 2, 128, 1),
    (128, 128, 2),
    (128, 128, 4),
    (128, 96, 8),
    (96, 64, 16),
    (64, 32, 1),
)


def _estimator_widths(in_ch: int):
    """(in, out) pairs of the dense-concat estimator + flow head."""
    pairs = [(in_ch, _DD[0]), (_DD[0], _DD[1]), (_DD[0] + _DD[1], _DD[2]),
             (_DD[1] + _DD[2], _DD[3]), (_DD[2] + _DD[3], _DD[4])]
    head = (_DD[3] + _DD[4], 2)
    return pairs, head


def init_pwc_decoder(key, dtype=jnp.float32, scheme: str = "torch"):
    params = {}
    n_keys = len(_LEVELS) * 6 + len(_CONTEXT) + 1
    keys = iter(jax.random.split(key, n_keys))
    for lvl, _, extra in _LEVELS:
        pairs, head = _estimator_widths(_ND + extra)
        for i, (cin, cout) in enumerate(pairs):
            params[f"conv{lvl}_{i}"] = conv_init(next(keys), cin, cout, 3, dtype, scheme=scheme)
        params[f"predict_flow{lvl}"] = conv_init(next(keys), head[0], head[1], 3, dtype, scheme=scheme)
    for i, (cin, cout, _) in enumerate(_CONTEXT):
        params[f"dc_conv{i + 1}"] = conv_init(next(keys), cin, cout, 3, dtype, scheme=scheme)
    params["dc_conv7"] = conv_init(next(keys), _CONTEXT[-1][1], 2, 3, dtype, scheme=scheme)
    return params


def _estimate(params, lvl: int, inp: jax.Array, compute_dtype):
    """Dense-concat estimator; returns (last hidden x4, predicted flow)."""
    cd = compute_dtype
    x0 = conv_block(params[f"conv{lvl}_0"], inp, compute_dtype=cd)
    x1 = conv_block(params[f"conv{lvl}_1"], x0, compute_dtype=cd)
    x2 = conv_block(params[f"conv{lvl}_2"], jnp.concatenate([x0, x1], -1), compute_dtype=cd)
    x3 = conv_block(params[f"conv{lvl}_3"], jnp.concatenate([x1, x2], -1), compute_dtype=cd)
    x4 = conv_block(params[f"conv{lvl}_4"], jnp.concatenate([x2, x3], -1), compute_dtype=cd)
    flow = conv_apply(
        params[f"predict_flow{lvl}"], jnp.concatenate([x3, x4], -1), compute_dtype=cd
    )
    return x4, flow


def apply_pwc_decoder(
    params,
    feats1,
    feats2,
    img_hw,
    compute_dtype=None,
    use_pallas_corr: bool = False,
    channel_major: bool = False,
    spmd_corr: bool = False,
):
    """Decode flow from two feature pyramids.

    ``spmd_corr``: route correlations through the SPMD-partitionable op
    (ops/pallas_spmd.py) so H-sharded spatial parallelism keeps the Pallas
    fast path.  Identical values; single-device runs should leave it off
    (the plain op avoids the custom-partitioning custom-call wrapper).

    ``channel_major``: NCHW decoder warps feeding the channel-major corr
    kernel (ops/warp.py::bilinear_warp_nchw +
    pallas_kernels.py::cost_volume_pallas_f2c) so warped features never
    cross an NHWC<->NCHW boundary.  OFF by default: measured a NET
    REGRESSION on v5e at the KITTI recipe (71.6 vs 70.9 ms/step) — the
    channel-major table build for 4C=128-wide feature rows is a transposed
    write whose cost exceeds the saved boundary transposes.  Kept as a
    validated option (tests/test_pallas_kernels.py) for future geometries;
    exposed as FlowModelConfig.channel_major_decoder.

    Args:
        feats1/feats2: 6-tuples from the feature encoder (finest first);
            levels 2..6 = indices 1..5 (index 0, the 1/2-res map, is unused,
            mirroring pwc_tf.py:108-179).
        img_hw: (H, W) of the network input; output flows are upsampled to
            (H, W), (H/2, W/2), (H/4, W/4), (H/8, W/8) and scaled x4.

    Returns:
        list of 4 NHWC flow tensors, finest first.
    """
    cd = compute_dtype
    flow = None
    up_flow = None
    x4 = None
    for lvl, _, extra in _LEVELS:
        f1 = feats1[lvl - 1]
        f2 = feats2[lvl - 1]
        # NOTE: no activation on the cost volume — the reference defines a
        # LeakyReLU member but never applies it to corr (pwc_tf.py:21,112).
        if extra == 0:  # coarsest level: plain correlation
            corr = cost_volume(
                f1, f2, MAX_DISPLACEMENT,
                use_pallas=use_pallas_corr, spmd=spmd_corr,
            )
            x4, flow = _estimate(params, lvl, corr, cd)
        else:
            up_flow = upsample2x_double(flow)
            if use_pallas_corr and channel_major and not spmd_corr and f2.shape[1] % 8 == 0:
                # NCHW warp -> NCHW-native corr kernel: the warped features
                # never cross an NHWC<->NCHW boundary in either pass, and the
                # channel-major take/scatter skips XLA's row-major relayouts
                from unopticalflow_tpu.ops.pallas_kernels import (
                    cost_volume_pallas_f2c,
                )

                warped_c = bilinear_warp_nchw(f2, up_flow)
                corr = cost_volume_pallas_f2c(f1, warped_c, MAX_DISPLACEMENT)
            else:
                warped = bilinear_warp(f2, up_flow, use_mask=False)
                corr = cost_volume(
                    f1, warped, MAX_DISPLACEMENT,
                    use_pallas=use_pallas_corr, spmd=spmd_corr,
                )
            inp = jnp.concatenate([corr, f1, up_flow], axis=-1)
            x4, res = _estimate(params, lvl, inp, cd)
            flow = res + up_flow
        if lvl == 2:  # dilated context refinement (pwc_tf.py:170-171)
            x = jnp.concatenate([flow, x4], axis=-1)
            for i, (_, _, dil) in enumerate(_CONTEXT):
                x = conv_block(params[f"dc_conv{i + 1}"], x, dilation=dil, compute_dtype=cd)
            flow = flow + conv_apply(params["dc_conv7"], x, compute_dtype=cd)
        if lvl == 6:
            flow6 = flow
        elif lvl == 5:
            flow5 = flow
        elif lvl == 4:
            flow4 = flow
        elif lvl == 3:
            flow3 = flow

    h, w = int(img_hw[0]), int(img_hw[1])
    del flow6  # only levels 2..5 are returned (pwc_tf.py:173-179)
    four = jnp.asarray(4.0, flow.dtype)
    return [
        resize_bilinear(flow * four, (h, w)),
        resize_bilinear(flow3 * four, (h // 2, w // 2)),
        resize_bilinear(flow4 * four, (h // 4, w // 4)),
        resize_bilinear(flow5 * four, (h // 8, w // 8)),
    ]
