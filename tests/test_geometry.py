"""Geometry-op tests: rotation parameterizations and depth-pose warps."""

import numpy as np
import pytest

import jax.numpy as jnp

from unopticalflow_tpu.ops.geometry import (
    cam2pixel,
    euler2mat,
    inverse_warp,
    inverse_warp2,
    pixel2cam,
    pose_vec2mat,
    quat2mat,
)

RNG = np.random.RandomState(0)


def test_euler2mat_orthonormal_and_known():
    angles = jnp.asarray(RNG.randn(4, 3).astype(np.float32) * 0.3)
    mats = np.asarray(euler2mat(angles))
    for m in mats:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-5)
    # pure z-rotation by 90 degrees
    m = np.asarray(euler2mat(jnp.asarray([[0.0, 0.0, np.pi / 2]])))[0]
    np.testing.assert_allclose(m @ [1, 0, 0], [0, 1, 0], atol=1e-6)


def test_euler2mat_composition_order():
    """Reference composes xmat @ ymat @ zmat (inverse_warp.py:111)."""
    rx, ry, rz = 0.1, 0.2, 0.3

    def rot(axis, a):
        c, s = np.cos(a), np.sin(a)
        m = np.eye(3)
        i, j = [(1, 2), (0, 2), (0, 1)][axis]
        m[i, i] = c
        m[j, j] = c
        m[i, j] = -s if axis != 1 else s
        m[j, i] = s if axis != 1 else -s
        return m

    want = rot(0, rx) @ rot(1, ry) @ rot(2, rz)
    got = np.asarray(euler2mat(jnp.asarray([[rx, ry, rz]])))[0]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_quat2mat_identity_and_norm():
    # reference convention: (B, 3) last-three coefficients, implicit w=1
    m = np.asarray(quat2mat(jnp.zeros((2, 3))))
    np.testing.assert_allclose(m[0], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(m[1], np.eye(3), atol=1e-6)
    q = jnp.asarray(RNG.randn(3, 3).astype(np.float32))
    mats = np.asarray(quat2mat(q))
    for m in mats:
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(m) == pytest.approx(1.0, abs=1e-5)


def test_pose_vec2mat_quat_mode():
    vec = jnp.asarray(RNG.randn(2, 6).astype(np.float32) * 0.1)
    mat = pose_vec2mat(vec, rotation_mode="quat")
    assert mat.shape == (2, 3, 4)


def test_pose_vec2mat_shapes():
    vec = jnp.asarray(RNG.randn(2, 6).astype(np.float32) * 0.1)
    mat = pose_vec2mat(vec)
    assert mat.shape == (2, 3, 4)
    np.testing.assert_allclose(np.asarray(mat[:, :, 3]), np.asarray(vec[:, :3]))
    with pytest.raises(ValueError):
        pose_vec2mat(vec, rotation_mode="nope")


def test_pixel2cam_cam2pixel_roundtrip():
    b, h, w = 2, 8, 12
    K = np.array([[20.0, 0, 6.0], [0, 20.0, 4.0], [0, 0, 1.0]], np.float32)
    Ks = jnp.asarray(np.tile(K, (b, 1, 1)))
    depth = jnp.asarray(1.0 + RNG.rand(b, h, w).astype(np.float32))
    cam = pixel2cam(depth, jnp.linalg.inv(Ks))
    assert cam.shape == (b, 3, h, w)
    # identity pose: projecting back must hit the original pixels
    coords = cam2pixel(cam, Ks, jnp.zeros((b, 3, 1)))
    xn = np.asarray(coords[..., 0])
    gx = np.tile(np.arange(w, dtype=np.float32), (h, 1))
    np.testing.assert_allclose(xn[0], 2 * gx / (w - 1) - 1, atol=1e-5)


def test_inverse_warp_identity_pose():
    b, h, w = 1, 16, 16
    K = np.array([[16.0, 0, 8.0], [0, 16.0, 8.0], [0, 0, 1.0]], np.float32)
    Ks = jnp.asarray(np.tile(K, (b, 1, 1)))
    img = jnp.asarray(RNG.rand(b, h, w, 3).astype(np.float32))
    depth = jnp.ones((b, h, w), jnp.float32) * 2.0
    pose = jnp.zeros((b, 6), jnp.float32)
    warped, valid = inverse_warp(img, depth, pose, Ks)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(img), atol=1e-4)
    assert float(valid.mean()) == pytest.approx(1.0)


def test_inverse_warp2_translation_shifts_depth():
    b, h, w = 1, 16, 16
    K = np.array([[16.0, 0, 8.0], [0, 16.0, 8.0], [0, 0, 1.0]], np.float32)
    Ks = jnp.asarray(np.tile(K, (b, 1, 1)))
    img = jnp.asarray(RNG.rand(b, h, w, 3).astype(np.float32))
    depth = jnp.ones((b, h, w), jnp.float32) * 4.0
    pose_mat = jnp.asarray(
        np.concatenate([np.eye(3, dtype=np.float32), [[0.5], [0.0], [0.0]]], 1)
    )[None]
    warped, valid, wdepth = inverse_warp2(img, depth, depth[0][None], pose_mat, Ks)
    assert warped.shape == img.shape and wdepth.shape == depth.shape
    # a +x camera translation shifts samples by K_fx * tx / z = 2 px
    np.testing.assert_allclose(
        np.asarray(warped[0, :, :-2]), np.asarray(img[0, :, 2:]), atol=1e-4
    )
