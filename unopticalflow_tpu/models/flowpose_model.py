"""Flow + pose joint training (``--mode flowposenet``).

The reference declares this mode but ships no implementation — its
``Model_flowposenet`` class does not exist and ``test.py:236-242`` raises
NameError (SURVEY.md §3.2).  This module completes the declared capability
(BASELINE config 5: joint training via odo.yaml / nyu_posenet_192.yaml plus
odometry eval) with a design that needs no depth network:

The flow branch is the unchanged occlusion-aware ``Model_flow`` stack.  The
pose branch is a 6-DoF PoseNet (models/pose_net.py) supervised by the flow
itself through the epipolar constraint: predicted correspondences
``p -> p + flow(p)`` must lie on the epipolar lines of the predicted pose, so
``loss_pose_epipolar`` is the occlusion-weighted mean Sampson distance under
F(pose, K) — scale-free, as monocular odometry is.  Gradients flow to BOTH
branches: the pose net learns camera motion, and the flow net receives a
rigidity prior on non-occluded pixels.

Input: 3-frame snippets (prev, center, next) exactly as flow mode, plus the
per-sample camera intrinsics; the PoseNet runs batch-packed (2B) over the
(center, prev) and (center, next) pairs, mirroring the decoder packing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unopticalflow_tpu.models.flow_model import FlowModelConfig, forward
from unopticalflow_tpu.models.flow_model import init_flow_model
from unopticalflow_tpu.models.pose_net import apply_pose_net, init_pose_net
from unopticalflow_tpu.ops.geometry import (
    fundamental_from_pose,
    sampson_epipolar_distance,
)


def init_flowpose_model(key, dtype=jnp.float32, scheme: str = "torch"):
    k1, k2 = jax.random.split(key)
    return {
        "flow": init_flow_model(k1, dtype, scheme=scheme),
        "pose": init_pose_net(k2, dtype, scheme=scheme),
    }


def epipolar_loss(flow, weight, pose, intrinsics, intrinsics_inv):
    """Occlusion-weighted mean Sampson distance, per sample.

    Args:
        flow: (N, H, W, 2) pixel flow frame1 -> frame2.
        weight: (N, H, W, 1) occlusion weights (1 = trusted match).
        pose: (N, 6) mapping frame2 points into frame1 (pose_net convention).
        intrinsics / intrinsics_inv: (N, 3, 3).

    Returns:
        (N,) float32.
    """
    f = fundamental_from_pose(
        pose.astype(jnp.float32),
        intrinsics.astype(jnp.float32),
        intrinsics_inv.astype(jnp.float32),
    )
    d = sampson_epipolar_distance(flow.astype(jnp.float32), f)
    # robustified: sqrt Sampson (a first-order px distance), like the
    # charbonnier penalties of the photometric stack
    d = jnp.sqrt(d + 1e-6)
    w = weight[..., 0].astype(jnp.float32)
    return jnp.sum(d * w, axis=(1, 2)) / (jnp.sum(w, axis=(1, 2)) + 1e-8)


def forward_flowpose(params, cfg: FlowModelConfig, images, intrinsics, intrinsics_inv):
    """Joint forward -> flow loss pack + ``loss_pose_epipolar``.

    Args:
        images: (B, 3H, W, 3) stacked (prev, center, next) snippet.
        intrinsics / intrinsics_inv: (B, 3, 3) at network input resolution.
    """
    pack, aux = forward(params["flow"], cfg, images, return_aux=True)

    b = images.shape[0]
    img_h = images.shape[1] // 3
    imgl = images[:, :img_h]
    img = images[:, img_h : 2 * img_h]
    imgr = images[:, 2 * img_h :]

    # packed (2B): rows [.. (center, prev) ..; .. (center, next) ..] — pose
    # maps the second frame's points into the center frame, matching the
    # packed [bwd; fwd] flow layout from the flow branch.
    pose = apply_pose_net(
        params["pose"],
        jnp.concatenate([img, img], 0),
        jnp.concatenate([imgl, imgr], 0),
        compute_dtype=cfg.cdtype,
    )

    k2 = jnp.concatenate([intrinsics, intrinsics], 0)
    k2_inv = jnp.concatenate([intrinsics_inv, intrinsics_inv], 0)
    flow0 = aux["flows"][0]  # (2B, H, W, 2), finest scale
    w0 = aux["weights"][0]  # (2B, H, W, 1)
    loss2 = epipolar_loss(flow0, w0, pose, k2, k2_inv)
    pack["loss_pose_epipolar"] = loss2[:b] + loss2[b:]
    return pack


def inference_pose(params, cfg: FlowModelConfig, img1, img2):
    """(B, H, W, 3) x2 -> (B, 6) pose mapping img2's camera into img1's."""
    return apply_pose_net(
        params["pose"], img1, img2, compute_dtype=cfg.cdtype
    ).astype(jnp.float32)


def forward_flowpose_pair(params, cfg: FlowModelConfig, images, intrinsics, intrinsics_inv):
    """2-frame variant of the joint branch (NYU's 2-frame snippets).

    The reference's NYU pipeline emits 2-frame stacks whose flow mode was
    never runnable (its train loop calls ``inputs.cuda()`` on the dataset's
    tuple — SURVEY.md §2.2 quirk).  This defines the 2-frame semantics from
    first principles: decode both directions between the pair (packed 2B as
    [f1->f2; f2->f1]), weight photometric terms by the warp validity mask
    plus a forward-backward occlusion check, and supervise pose on the
    forward flow's epipolar geometry.

    Args:
        images: (B, 2H, W, 3) stacked (frame1, frame2).
    Returns loss pack: pixel/ssim/smooth/consis + pose_epipolar, each (B,).
    """
    from unopticalflow_tpu.models.flow_model import forward_pair

    b = images.shape[0]
    img_h = images.shape[1] // 2
    img1 = images[:, :img_h]
    img2 = images[:, img_h:]

    pack, aux = forward_pair(params["flow"], cfg, images, return_aux=True)
    flows = aux["flows"]
    weights = aux["weights"]

    pose = apply_pose_net(
        params["pose"],
        jnp.concatenate([img1, img2], 0),
        jnp.concatenate([img2, img1], 0),
        compute_dtype=cfg.cdtype,
    )
    k2 = jnp.concatenate([intrinsics, intrinsics], 0)
    k2_inv = jnp.concatenate([intrinsics_inv, intrinsics_inv], 0)
    loss2 = epipolar_loss(flows[0], weights[0], pose, k2, k2_inv)
    pack["loss_pose_epipolar"] = loss2[:b] + loss2[b:]
    return pack
