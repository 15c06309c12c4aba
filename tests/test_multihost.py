"""Two-process ``jax.distributed`` smoke test (multi-host DP over DCN).

The reference has no multi-host capability at all; this framework declares
one (``parallel.initialize_multi_host`` -> ``jax.distributed.initialize``).
No multi-host hardware exists here, so the test forms a REAL 2-process JAX
distributed system on CPU: two subprocesses join a coordinator, see the
global 2-device set, build the 1-D data mesh over it, and pmean a
process-distinct value — asserting the mean crossed process boundaries.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from unopticalflow_tpu.parallel import initialize_multi_host, data_parallel_mesh, shard_batch

pid = int(sys.argv[1])
initialize_multi_host(
    coordinator_address=sys.argv[2],
    num_processes=2,
    process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()  # 1 CPU device per process

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

mesh = data_parallel_mesh()
assert mesh.devices.size == 2

@jax.jit
def mean_over_data(x):
    f = shard_map(
        lambda v: jax.lax.pmean(v, axis_name="data"),
        mesh=mesh, in_specs=P("data"), out_specs=P(),
    )
    return f(x)

# global batch [pid 0 contributes 1.0, pid 1 contributes 3.0] -> mean 2.0
local = np.full((1, 4), 1.0 + 2.0 * pid, np.float32)
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (2, 4)
)
out = mean_over_data(garr)
val = float(jax.device_get(out).ravel()[0])
assert abs(val - 2.0) < 1e-6, val
print(f"proc {pid} OK pmean={val}")
"""


@pytest.mark.slow
def test_two_process_distributed_pmean(tmp_path):
    port = 43219
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # each process must see exactly ONE local CPU device so the global set is 2
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), f"localhost:{port}"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK pmean=2.0" in out, out[-500:]


_TRAIN_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/unflow_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

pid, coord, root, out_npz = int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]

from unopticalflow_tpu.parallel import initialize_multi_host
initialize_multi_host(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 2  # global set: 1 CPU device per process

import numpy as np
import train as train_cli
from unopticalflow_tpu.utils.config import Config

cfg = Config(dict(
    dataset="kitti_depth", num_scales=3, num_iterations=2,
    w_ssim=0.85, w_flow_smooth=10.0, w_flow_consis=0.01,
    img_hw=(64, 64),
    prepared_base_dir=os.path.join(root, "prepared"), prepared_save_dir="data_s1",
    raw_base_dir="/nonexistent", static_frames_txt="/nonexistent",
    test_scenes_txt="/nonexistent",
    model_dir=os.path.join(root, "models_mh"),
    log_dump_dir=os.path.join(root, "models_mh", "log.pkl"),
    batch_size=2,  # GLOBAL batch: 1 sample per process-device
    iter_start=0, lr=1e-4, num_workers=1, log_interval=1,
    test_interval=1000, save_interval=2, mode="flow", resume=False,
    multi_gpu=False, multi_host=True, no_test=True,
    flow_pretrained_model=None, depth_pretrained_model=None,
    precision="float32", pallas_corr="off", seed=0,
))
state = train_cli.train(cfg)
params = jax.device_get(state.params)
flat, _ = jax.tree_util.tree_flatten_with_path(params)
np.savez(out_npz, **{jax.tree_util.keystr(k): np.asarray(v) for k, v in flat})
print(f"proc {pid} trained OK step={int(state.step)}")
"""


@pytest.mark.slow
def test_two_process_train_parity(tmp_path):
    """train() itself across 2 REAL jax.distributed processes == single-process.

    The full CLI path — BatchLoader per-process block sharding,
    make_array_from_process_local_data assembly in device_prefetch, global
    2-device DP mesh, process-0-gated checkpoint/log — for 2 steps on a
    synthetic prepared dir, then asserts the final params match a
    single-process run of the same global recipe (grad pmean over shards ==
    full-batch mean).
    """
    import cv2
    import numpy as np

    import jax
    import train as train_cli
    from unopticalflow_tpu.utils.config import Config

    # synthetic prepared dir (same layout as test_train_loop.py)
    prep = tmp_path / "prepared" / "data_s1"
    drive = prep / "d" / "r"
    drive.mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = []
    h, w = 32, 32
    for i in range(4):
        base = rng.randint(0, 255, (h + 4, w, 3), dtype=np.uint8)
        tri = np.concatenate([base[:h], base[2 : h + 2], base[4 : h + 4]], 0)
        cv2.imwrite(str(drive / f"{i:010d}.png"), tri)
        lines.append(f"d/r/{i:010d}.png d/calib.txt\n")
    with open(prep / "d" / "calib.txt", "w") as f:
        f.write("P_rect_02: 30.0 0.0 16.0 0.0 0.0 30.0 16.0 0.0 0.0 0.0 1.0 0.0\n")
    with open(prep / "train.txt", "w") as f:
        f.writelines(lines)
    os.makedirs(tmp_path / "models_sp")
    os.makedirs(tmp_path / "models_mh")

    # single-process reference run (in-process; warm compile cache)
    cfg_sp = Config(dict(
        dataset="kitti_depth", num_scales=3, num_iterations=2,
        w_ssim=0.85, w_flow_smooth=10.0, w_flow_consis=0.01,
        img_hw=(64, 64),
        prepared_base_dir=str(tmp_path / "prepared"), prepared_save_dir="data_s1",
        raw_base_dir="/nonexistent", static_frames_txt="/nonexistent",
        test_scenes_txt="/nonexistent",
        model_dir=str(tmp_path / "models_sp"),
        log_dump_dir=str(tmp_path / "models_sp" / "log.pkl"),
        batch_size=2, iter_start=0, lr=1e-4, num_workers=1, log_interval=1,
        test_interval=1000, save_interval=2, mode="flow", resume=False,
        multi_gpu=False, no_test=True,
        flow_pretrained_model=None, depth_pretrained_model=None,
        precision="float32", pallas_corr="off", seed=0,
    ))
    state = train_cli.train(cfg_sp)
    flat, _ = jax.tree_util.tree_flatten_with_path(jax.device_get(state.params))
    want = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}

    # two-process distributed run of the SAME global recipe
    port = 43291
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER)
    outs_npz = [str(tmp_path / f"params_{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), f"localhost:{port}",
             str(tmp_path), outs_npz[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed train workers timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} trained OK step=2" in out, out[-500:]

    # process-0 gating: exactly the coordinator wrote the checkpoint
    assert (tmp_path / "models_mh" / "last.ckpt").is_file()

    # both processes converge to identical replicated params...
    got0 = dict(np.load(outs_npz[0]))
    got1 = dict(np.load(outs_npz[1]))
    assert set(got0) == set(got1) == set(want)
    lr, n_steps = 1e-4, 2
    n_close = n_total = 0
    for k in want:
        np.testing.assert_array_equal(got0[k], got1[k], err_msg=k)
        # ...which match the single-process trajectory.  pmean of equal-size
        # shard grads == full-batch mean up to reduction order, but Adam's
        # early steps are ~lr * sign(g): weights whose gradient is at float-
        # noise level can take an opposite-sign step from a 1e-7 gradient
        # difference (whole layers, where gradients barely reach at step 1).
        # So: no element may move more than the maximum possible update
        # divergence (2 * lr per step), and the bulk of ALL parameters must
        # track tightly.
        diff = np.abs(got0[k] - want[k])
        assert diff.max() <= 2.0 * lr * n_steps + 1e-6, (
            f"{k}: max divergence {diff.max()} exceeds the Adam update bound"
        )
        n_close += int((diff <= 1e-5).sum())
        n_total += diff.size
    assert n_close / n_total >= 0.90, (
        f"only {n_close / n_total:.1%} of all parameters track the "
        "single-process trajectory"
    )
