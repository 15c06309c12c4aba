"""Flow+pose joint branch: geometry, losses, training, odometry output.

The reference declares ``flowposenet`` but ships no implementation
(test.py:236-242 NameError), so these tests define the mode's contract:
epipolar geometry that vanishes on true rigid correspondences, a pose that
is recoverable from flow through the Sampson loss, a joint train step that
moves both branches, and odometry output that eval_odom can consume.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unopticalflow_tpu.models import FlowModelConfig, init_flowpose_model
from unopticalflow_tpu.models.flowpose_model import epipolar_loss
from unopticalflow_tpu.models.pose_net import apply_pose_net, init_pose_net
from unopticalflow_tpu.ops.geometry import (
    fundamental_from_pose,
    pose_vec2mat,
    sampson_epipolar_distance,
    skew_matrix,
)

RNG = np.random.RandomState(3)
CFG = FlowModelConfig(num_scales=3)


def _k_matrices(h, w):
    K = np.array(
        [[0.9 * w, 0.0, 0.5 * w], [0.0, 0.9 * w, 0.5 * h], [0.0, 0.0, 1.0]],
        np.float32,
    )
    return K[None], np.linalg.inv(K)[None].astype(np.float32)


def _rigid_flow(pose_vec, K, K_inv, h, w, depth):
    """Exact flow field induced by a rigid motion over a depth map.

    pose maps cam2 points into cam1 (p1 = R p2 + t), so given depth in
    frame 1 we invert: p2 = R^T (p1 - t).
    """
    mat = np.asarray(pose_vec2mat(jnp.asarray(pose_vec[None])))[0]
    rot, t = mat[:, :3], mat[:, 3]
    u, v = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    x1 = np.stack([u, v, np.ones_like(u)], -1)  # (h, w, 3)
    p1 = depth[..., None] * (x1 @ K_inv[0].T)
    p2 = (p1 - t) @ rot  # == R^T (p1 - t)
    x2 = p2 @ K[0].T
    x2 = x2[..., :2] / x2[..., 2:3]
    return (x2 - x1[..., :2])[None].astype(np.float32)


@pytest.fixture(scope="module")
def rigid_case():
    h, w = 48, 64
    K, K_inv = _k_matrices(h, w)
    pose = np.array([0.3, -0.1, 0.8, 0.02, -0.03, 0.01], np.float32)
    depth = 8.0 + 4.0 * RNG.rand(h, w).astype(np.float32)
    flow = _rigid_flow(pose, K, K_inv, h, w, depth)
    return h, w, K, K_inv, pose, flow


def test_skew_matrix():
    t = jnp.asarray(RNG.rand(4, 3).astype(np.float32))
    sk = skew_matrix(t)
    a = jnp.asarray(RNG.rand(4, 3).astype(np.float32))
    want = np.cross(np.asarray(t), np.asarray(a))
    got = np.asarray(jnp.einsum("bij,bj->bi", sk, a))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sampson_zero_on_rigid_flow(rigid_case):
    h, w, K, K_inv, pose, flow = rigid_case
    f = fundamental_from_pose(jnp.asarray(pose[None]), jnp.asarray(K), jnp.asarray(K_inv))
    d = np.asarray(sampson_epipolar_distance(jnp.asarray(flow), f))
    assert d.shape == (1, h, w)
    assert float(np.median(d)) < 1e-4  # true pose: residual ~ 0 px^2

    bad_pose = pose + np.array([0.5, 0.4, -0.3, 0.05, 0.04, -0.06], np.float32)
    fb = fundamental_from_pose(
        jnp.asarray(bad_pose[None]), jnp.asarray(K), jnp.asarray(K_inv)
    )
    db = np.asarray(sampson_epipolar_distance(jnp.asarray(flow), fb))
    assert float(np.median(db)) > 100 * max(float(np.median(d)), 1e-8)


def test_pose_recoverable_from_flow(rigid_case):
    """Gradient descent on the epipolar loss recovers the true motion.

    This is the synthetic-motion sanity check: starting from a perturbed
    pose, optimizing ONLY the Sampson loss must converge back to the true
    rotation and translation direction (scale is unobservable).
    """
    h, w, K, K_inv, pose, flow = rigid_case
    flow_j = jnp.asarray(flow)
    weight = jnp.ones((1, h, w, 1), jnp.float32)
    K_j, K_inv_j = jnp.asarray(K), jnp.asarray(K_inv)

    def loss(p):
        return jnp.sum(epipolar_loss(flow_j, weight, p[None], K_j, K_inv_j))

    import optax

    opt = optax.adam(1e-2)
    est = jnp.asarray(pose + RNG.uniform(-0.1, 0.1, 6).astype(np.float32))
    opt_state = opt.init(est)

    @jax.jit
    def update(est, opt_state):
        grad = jax.grad(loss)(est)
        updates, opt_state = opt.update(grad, opt_state)
        return optax.apply_updates(est, updates), opt_state

    for _ in range(600):
        est, opt_state = update(est, opt_state)

    est = np.asarray(est)
    t_true = pose[:3] / np.linalg.norm(pose[:3])
    t_est = est[:3] / (np.linalg.norm(est[:3]) + 1e-12)
    assert float(t_true @ t_est) > 0.999, (t_true, t_est)  # direction match
    np.testing.assert_allclose(est[3:], pose[3:], atol=5e-3)  # rotation


def test_pose_net_shapes():
    params = init_pose_net(jax.random.PRNGKey(0))
    img = jnp.asarray(RNG.rand(2, 64, 128, 3).astype(np.float32))
    pose = apply_pose_net(params, img, img)
    assert pose.shape == (2, 6)
    assert np.isfinite(np.asarray(pose)).all()
    # identical frames at init: tiny pose (0.01 scaling)
    assert float(jnp.abs(pose).max()) < 1.0


def test_flowpose_train_step_moves_both_branches():
    """One full train step: pack contract + gradients reach every parameter.

    Folds what used to be two tests (a jax.grad pass and a train-step pass)
    into ONE compiled program — each was a separate full-model fwd+bwd
    compile costing minutes on the 1-core CI host.  A parameter leaf that
    changed under Adam received a nonzero gradient, so the per-branch delta
    check subsumes the explicit grad check.
    """
    from unopticalflow_tpu.training import create_train_state, make_train_step

    params = init_flowpose_model(jax.random.PRNGKey(2))
    state = create_train_state(params, lr=1e-4)
    cfg = FlowModelConfig(num_scales=3, compute_dtype="bfloat16")
    weights = {
        "loss_pixel": 0.15, "loss_ssim": 0.85, "loss_flow_smooth": 10.0,
        "loss_flow_consis": 0.01, "loss_pose_epipolar": 1.0,
    }
    step = make_train_step(cfg, weights, lr=1e-4, mode="flowposenet")
    h, w = 64, 64
    images = jnp.asarray(RNG.rand(2, 3 * h, w, 3).astype(np.float32))
    K, K_inv = _k_matrices(h, w)
    batch = (images, jnp.asarray(np.repeat(K, 2, 0)), jnp.asarray(np.repeat(K_inv, 2, 0)))
    # snapshot before stepping: the state is donated into the step
    before = {
        branch: [np.asarray(x) for x in jax.tree.leaves(params[branch])]
        for branch in ("flow", "pose")
    }
    new_state, metrics = step(state, batch)
    assert sorted(k for k in metrics if k != "loss_total") == [
        "loss_flow_consis", "loss_flow_smooth", "loss_pixel",
        "loss_pose_epipolar", "loss_ssim",
    ]
    assert all(np.isfinite(float(v)) for v in metrics.values())
    for branch in ("flow", "pose"):
        after = jax.tree.leaves(new_state.params[branch])
        moved = sum(
            float(np.sum(np.abs(np.asarray(a, np.float32) - b))) > 0
            for a, b in zip(after, before[branch])
        )
        assert moved == len(after), branch
    new_state, _ = step(new_state, batch)
    assert int(new_state.step) == 2


def test_odometry_output_feeds_eval_odom(tmp_path):
    """test_kitti_odo writes a KITTI pose file that eval_odom can load."""
    cv2 = pytest.importorskip("cv2")
    import types

    import test as test_cli
    from unopticalflow_tpu.evaluation.eval_odom import load_poses

    seq = tmp_path / "seq" / "image_2"
    os.makedirs(seq)
    for i in range(4):
        cv2.imwrite(str(seq / f"{i:06d}.png"),
                    RNG.randint(0, 255, (32, 64, 3), dtype=np.uint8))

    # constant forward motion, no rotation
    def pose_fn(i1, i2):
        return np.array([[0.0, 0.0, 1.0, 0.0, 0.0, 0.0]], np.float32)

    cfg = types.SimpleNamespace(img_hw=(32, 64))
    out = str(tmp_path / "res" / "odom.txt")
    test_cli.test_kitti_odo(cfg, pose_fn, str(tmp_path / "seq"), out)
    poses = load_poses(out)
    assert len(poses) == 4
    # unit-norm z steps chain: frame 3 sits at z = 3
    np.testing.assert_allclose(poses[3][:3, 3], [0.0, 0.0, 3.0], atol=1e-5)
    np.testing.assert_allclose(poses[3][:3, :3], np.eye(3), atol=1e-6)


@pytest.mark.slow
def test_forward_flowpose_pair():
    """2-frame (NYU-style) variant: full pack, finite grads to both branches."""
    from unopticalflow_tpu.models.flowpose_model import forward_flowpose_pair

    params = init_flowpose_model(jax.random.PRNGKey(4))
    h, w = 64, 64
    images = jnp.asarray(RNG.rand(1, 2 * h, w, 3).astype(np.float32))
    K, K_inv = _k_matrices(h, w)
    cfg = FlowModelConfig(num_scales=3, compute_dtype="bfloat16")

    def total(p):
        pack = forward_flowpose_pair(
            p, cfg, images, jnp.asarray(K), jnp.asarray(K_inv)
        )
        assert sorted(pack) == [
            "loss_flow_consis", "loss_flow_smooth", "loss_pixel",
            "loss_pose_epipolar", "loss_ssim",
        ]
        assert all(v.shape == (1,) for v in pack.values())
        return sum(jnp.mean(v) for v in pack.values())

    grads = jax.grad(total)(params)
    for branch in ("flow", "pose"):
        leaves = jax.tree.leaves(grads[branch])
        assert all(np.isfinite(np.asarray(x)).all() for x in leaves), branch
        nonzero = sum(float(jnp.sum(jnp.abs(x))) > 0 for x in leaves)
        assert nonzero == len(leaves), branch


@pytest.mark.slow
def test_flow_pair_forward_and_step():
    """2-frame flow-only training path (NYU flow mode, an extension the
    reference never had working)."""
    from unopticalflow_tpu.models.flow_model import forward_pair, init_flow_model
    from unopticalflow_tpu.training import create_train_state, make_train_step

    params = init_flow_model(jax.random.PRNGKey(5))
    h, w = 64, 64
    images = jnp.asarray(RNG.rand(1, 2 * h, w, 3).astype(np.float32))
    cfg = FlowModelConfig(num_scales=3, compute_dtype="bfloat16")
    pack = forward_pair(params, cfg, images)
    assert sorted(pack) == [
        "loss_flow_consis", "loss_flow_smooth", "loss_pixel", "loss_ssim"
    ]
    assert all(v.shape == (1,) and np.isfinite(np.asarray(v)).all()
               for v in pack.values())

    weights = {"loss_pixel": 0.15, "loss_ssim": 0.85,
               "loss_flow_smooth": 10.0, "loss_flow_consis": 0.01}
    step = make_train_step(cfg, weights, lr=1e-4, mode="flow", snippet_frames=2)
    state = create_train_state(params, lr=1e-4)
    state, metrics = step(state, images)
    assert np.isfinite(float(metrics["loss_total"]))


def test_freeze_flow_trains_pose_only():
    """--freeze_flow: Adam moves the pose branch, flow stays bit-identical
    (reference stage-2 semantics, model_flow_paper.py:19-26)."""
    from unopticalflow_tpu.training import create_train_state, make_train_step

    params = init_flowpose_model(jax.random.PRNGKey(6))
    state = create_train_state(params, lr=1e-3, freeze_flow=True)
    cfg = FlowModelConfig(num_scales=3, compute_dtype="bfloat16")
    weights = {"loss_pixel": 0.15, "loss_ssim": 0.85, "loss_flow_smooth": 10.0,
               "loss_flow_consis": 0.01, "loss_pose_epipolar": 1.0}
    step = make_train_step(cfg, weights, lr=1e-3, mode="flowposenet",
                           freeze_flow=True)
    h, w = 64, 64
    images = jnp.asarray(RNG.rand(1, 3 * h, w, 3).astype(np.float32))
    K, K_inv = _k_matrices(h, w)
    before = {
        br: [np.asarray(x) for x in jax.tree.leaves(params[br])]
        for br in ("flow", "pose")
    }
    new_state, _ = step(state, (images, jnp.asarray(K), jnp.asarray(K_inv)))
    flow_after = jax.tree.leaves(new_state.params["flow"])
    assert all(
        np.array_equal(np.asarray(a), b)
        for a, b in zip(flow_after, before["flow"])
    )
    pose_after = jax.tree.leaves(new_state.params["pose"])
    moved = sum(
        float(np.sum(np.abs(np.asarray(a, np.float32) - b))) > 0
        for a, b in zip(pose_after, before["pose"])
    )
    assert moved == len(pose_after)


def test_odometry_metrics_end_to_end(tmp_path):
    """Full odometry chain: synthetic rigid trajectory -> test_kitti_odo pose
    file -> KittiEvalOdom.eval -> t/r errors ~ 0 (reference protocol,
    eval_odom.py:282-350).

    The GT trajectory is the SAME rigid motion at 4x the translation scale —
    monocular scale is one global unknown, and with raw (un-normalized)
    relative translations the evaluator's Umeyama Sim(3) alignment must
    recover exactly that factor, driving both errors to float noise.
    """
    cv2 = pytest.importorskip("cv2")
    import types

    import test as test_cli
    from unopticalflow_tpu.evaluation.eval_odom import KittiEvalOdom
    from unopticalflow_tpu.ops.geometry import pose_vec2mat

    n_frames = 62
    seq = tmp_path / "seq" / "image_2"
    os.makedirs(seq)
    for i in range(n_frames):
        cv2.imwrite(str(seq / f"{i:06d}.png"),
                    RNG.randint(0, 255, (16, 32, 3), dtype=np.uint8))

    # constant relative motion: mostly-forward translation + gentle yaw
    vec = np.array([[0.05, 0.0, 2.0, 0.0, 0.01, 0.0]], np.float32)
    rel = np.eye(4)
    rel[:3] = np.asarray(pose_vec2mat(jnp.asarray(vec)))[0]

    # GT: same chain with translations scaled 4x (~8 m/frame -> ~490 m total,
    # so the 100-400 m KITTI segments are exercised)
    scale = 4.0
    rel_gt = rel.copy()
    rel_gt[:3, 3] *= scale
    t_wc = np.eye(4)
    gt_lines = [" ".join(f"{v:.6e}" for v in t_wc[:3].reshape(-1))]
    for _ in range(n_frames - 1):
        t_wc = t_wc @ rel_gt
        gt_lines.append(" ".join(f"{v:.6e}" for v in t_wc[:3].reshape(-1)))
    gt_txt = str(tmp_path / "gt.txt")
    with open(gt_txt, "w") as f:
        f.write("\n".join(gt_lines) + "\n")

    def pose_fn(i1, i2):
        return vec

    cfg = types.SimpleNamespace(img_hw=(16, 32))
    result_txt = str(tmp_path / "res" / "odom.txt")
    test_cli.test_kitti_odo(cfg, pose_fn, str(tmp_path / "seq"), result_txt)

    t_err, r_err = KittiEvalOdom().eval(gt_txt, result_txt, plot=False)
    assert t_err < 1e-4  # fraction of segment length
    assert r_err < 1e-6  # rad/m
