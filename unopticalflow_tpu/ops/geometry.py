"""Camera-geometry ops: projections, rotation parameterizations, depth warps.

Capability parity with the reference's ``inverse_warp`` module
(/root/reference/core/networks/structures/inverse_warp.py) — exported but not
called by the live flow model there (SURVEY.md §2.1 marks it vestigial); it
is the depth/pose API surface inherited from TrianFlow, kept here so pose /
depth extensions have their primitives.  All functions are NHWC/functional
and jit-compatible.

Conventions: intrinsics K are (B, 3, 3); depth is (B, H, W); pose vectors are
(B, 6) [tx, ty, tz, rx, ry, rz]; rotations follow the reference's euler2mat
(:77) / quat2mat (:115) compositions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unopticalflow_tpu.ops.warp import bilinear_warp


def pixel_grid(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """(3, H, W) homogeneous pixel coordinate grid [x; y; 1]."""
    gx = jnp.tile(jnp.arange(w, dtype=dtype)[None, :], (h, 1))
    gy = jnp.tile(jnp.arange(h, dtype=dtype)[:, None], (1, w))
    return jnp.stack([gx, gy, jnp.ones_like(gx)], axis=0)


def pixel2cam(depth: jax.Array, intrinsics_inv: jax.Array) -> jax.Array:
    """Back-project pixels to camera space (inverse_warp.py:29-45).

    Args:
        depth: (B, H, W).
        intrinsics_inv: (B, 3, 3).

    Returns:
        (B, 3, H, W) camera coordinates.
    """
    b, h, w = depth.shape
    grid = pixel_grid(h, w, depth.dtype).reshape(3, -1)  # (3, HW)
    rays = jnp.einsum("bij,jn->bin", intrinsics_inv, grid)  # (B, 3, HW)
    return (rays * depth.reshape(b, 1, -1)).reshape(b, 3, h, w)


def cam2pixel(
    cam_coords: jax.Array, proj_rot: jax.Array, proj_tr: jax.Array
) -> jax.Array:
    """Project camera-space points to normalized [-1, 1] pixel coordinates
    (inverse_warp.py:47-75).

    Args:
        cam_coords: (B, 3, H, W).
        proj_rot: (B, 3, 3) K @ R.
        proj_tr: (B, 3, 1) K @ t.

    Returns:
        (B, H, W, 2) normalized coordinates.
    """
    b, _, h, w = cam_coords.shape
    pts = cam_coords.reshape(b, 3, -1)
    pcoords = jnp.einsum("bij,bjn->bin", proj_rot, pts) + proj_tr
    x, y, z = pcoords[:, 0], pcoords[:, 1], pcoords[:, 2]
    z = jnp.clip(z, 1e-3, None)
    # normalize to [-1, 1] over the (W-1)/(H-1) span, grid_sample convention
    xn = 2.0 * (x / z) / max(w - 1, 1) - 1.0
    yn = 2.0 * (y / z) / max(h - 1, 1) - 1.0
    return jnp.stack([xn, yn], axis=-1).reshape(b, h, w, 2)


def euler2mat(angle: jax.Array) -> jax.Array:
    """Euler angles (B, 3) [rx, ry, rz] -> rotation matrices (B, 3, 3),
    composed as Rx @ Ry @ Rz (inverse_warp.py:77-113)."""
    x, y, z = angle[:, 0], angle[:, 1], angle[:, 2]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)

    cz, sz = jnp.cos(z), jnp.sin(z)
    rz = jnp.stack(
        [cz, -sz, zeros, sz, cz, zeros, zeros, zeros, ones], axis=1
    ).reshape(-1, 3, 3)
    cy, sy = jnp.cos(y), jnp.sin(y)
    ry = jnp.stack(
        [cy, zeros, sy, zeros, ones, zeros, -sy, zeros, cy], axis=1
    ).reshape(-1, 3, 3)
    cx, sx = jnp.cos(x), jnp.sin(x)
    rx = jnp.stack(
        [ones, zeros, zeros, zeros, cx, -sx, zeros, sx, cx], axis=1
    ).reshape(-1, 3, 3)
    return rx @ ry @ rz


def quat2mat(quat: jax.Array) -> jax.Array:
    """Quaternion [x, y, z] coefficients -> (B, 3, 3) rotation matrices.

    Reference semantics (inverse_warp.py:115-137): the input carries the
    *last three* coefficients; w = 1 is prepended before normalization.
    """
    q = jnp.concatenate([jnp.ones_like(quat[:, :1]), quat], axis=1)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    qw, qx, qy, qz = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    w2, x2, y2, z2 = qw * qw, qx * qx, qy * qy, qz * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    return jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), w2 - x2 + y2 - z2, 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), w2 - x2 - y2 + z2,
        ],
        axis=1,
    ).reshape(-1, 3, 3)


def pose_vec2mat(vec: jax.Array, rotation_mode: str = "euler") -> jax.Array:
    """6/7-DoF pose vector -> (B, 3, 4) [R | t] (inverse_warp.py:139-155)."""
    translation = vec[:, :3, None]
    rot = vec[:, 3:]
    if rotation_mode == "euler":
        rot_mat = euler2mat(rot)
    elif rotation_mode == "quat":
        rot_mat = quat2mat(rot)
    else:
        raise ValueError(f"unknown rotation_mode {rotation_mode!r}")
    return jnp.concatenate([rot_mat, translation], axis=2)


def inverse_warp(
    img: jax.Array,
    depth: jax.Array,
    pose: jax.Array,
    intrinsics: jax.Array,
    rotation_mode: str = "euler",
) -> tuple[jax.Array, jax.Array]:
    """Depth+pose inverse warp of the source image to the target frame
    (inverse_warp.py:157-228).

    Args:
        img: (B, H, W, C) source image.
        depth: (B, H, W) target depth.
        pose: (B, 6) target->source pose vector.
        intrinsics: (B, 3, 3).

    Returns:
        (warped (B, H, W, C), valid mask (B, H, W, 1)).
    """
    b, h, w, _ = img.shape
    cam_coords = pixel2cam(depth, jnp.linalg.inv(intrinsics))
    pose_mat = pose_vec2mat(pose, rotation_mode)
    proj = intrinsics @ pose_mat  # (B, 3, 4)
    coords_norm = cam2pixel(cam_coords, proj[:, :, :3], proj[:, :, 3:])
    return _sample_normalized(img, coords_norm)


def inverse_warp2(
    img: jax.Array,
    depth: jax.Array,
    ref_depth: jax.Array,
    pose_mat: jax.Array,
    intrinsics: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Variant returning (warped img, valid mask, warped source depth)
    (inverse_warp.py:230-269): also samples the source depth map so a
    geometric consistency term can compare projected vs sampled depth.

    Args:
        pose_mat: (B, 3, 4) target->source transform (already matrixized).
    """
    cam_coords = pixel2cam(depth, jnp.linalg.inv(intrinsics))
    proj = intrinsics @ pose_mat
    coords_norm = cam2pixel(cam_coords, proj[:, :, :3], proj[:, :, 3:])
    warped, valid = _sample_normalized(img, coords_norm)
    warped_depth, _ = _sample_normalized(ref_depth[..., None], coords_norm)
    return warped, valid, warped_depth[..., 0]


def _sample_normalized(img: jax.Array, coords_norm: jax.Array):
    """grid_sample(zeros padding) of [-1,1]-normalized coords + valid mask."""
    b, h, w, _ = img.shape
    # convert normalized coords to a pixel-space flow for bilinear_warp
    x = (coords_norm[..., 0] + 1.0) * max(w - 1, 1) / 2.0
    y = (coords_norm[..., 1] + 1.0) * max(h - 1, 1) / 2.0
    gx = jnp.arange(w, dtype=img.dtype)[None, None, :]
    gy = jnp.arange(h, dtype=img.dtype)[None, :, None]
    flow = jnp.stack([x - gx, y - gy], axis=-1)
    warped = bilinear_warp(img, flow, use_mask=False)
    valid = (
        (coords_norm[..., 0] >= -1) & (coords_norm[..., 0] <= 1)
        & (coords_norm[..., 1] >= -1) & (coords_norm[..., 1] <= 1)
    ).astype(img.dtype)[..., None]
    return warped, valid


def skew_matrix(t: jax.Array) -> jax.Array:
    """(B, 3) -> (B, 3, 3) cross-product matrices [t]x."""
    tx, ty, tz = t[:, 0], t[:, 1], t[:, 2]
    z = jnp.zeros_like(tx)
    return jnp.stack(
        [z, -tz, ty, tz, z, -tx, -ty, tx, z], axis=1
    ).reshape(-1, 3, 3)


def fundamental_from_pose(
    pose: jax.Array, intrinsics: jax.Array, intrinsics_inv: jax.Array
) -> jax.Array:
    """6-DoF pose -> fundamental matrix (B, 3, 3).

    ``pose`` maps points from camera 2 into camera 1 (p1 = R p2 + t, the
    pose_vec2mat convention above); correspondences then satisfy
    x1^T F x2 = 0 with F = K^-T [t]x R K^-1.  The translation is normalized
    to unit length — the epipolar constraint is scale-free (monocular
    odometry recovers translation only up to scale).
    """
    mat = pose_vec2mat(pose)
    rot, t = mat[:, :, :3], mat[:, :, 3]
    t = t / (jnp.linalg.norm(t, axis=1, keepdims=True) + 1e-8)
    essential = skew_matrix(t) @ rot
    return jnp.swapaxes(intrinsics_inv, 1, 2) @ essential @ intrinsics_inv


def sampson_epipolar_distance(flow: jax.Array, fundamental: jax.Array) -> jax.Array:
    """First-order geometric (Sampson) epipolar distance of flow matches.

    Args:
        flow: (B, H, W, 2) flow frame1 -> frame2 in pixels; the match for
            pixel (u, v) is (u + flow_u, v + flow_v).
        fundamental: (B, 3, 3) with x1^T F x2 = 0.

    Returns:
        (B, H, W) squared Sampson distance per pixel.
    """
    b, h, w, _ = flow.shape
    dt = flow.dtype
    u = jnp.arange(w, dtype=dt)[None, None, :]
    v = jnp.arange(h, dtype=dt)[None, :, None]
    ones = jnp.ones((b, h, w), dt)
    x1 = jnp.stack([jnp.broadcast_to(u, (b, h, w)),
                    jnp.broadcast_to(v, (b, h, w)), ones], axis=-1)
    x2 = jnp.stack([u + flow[..., 0], v + flow[..., 1], ones], axis=-1)
    f = fundamental.astype(dt)
    # Fx2 (epiline in image 1), F^T x1 (epiline in image 2)
    fx2 = jnp.einsum("bij,bhwj->bhwi", f, x2)
    ftx1 = jnp.einsum("bji,bhwj->bhwi", f, x1)
    r = jnp.sum(x1 * fx2, axis=-1)
    denom = (
        fx2[..., 0] ** 2 + fx2[..., 1] ** 2
        + ftx1[..., 0] ** 2 + ftx1[..., 1] ** 2
    )
    return (r * r) / (denom + 1e-8)
