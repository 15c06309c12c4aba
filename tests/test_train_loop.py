"""Integration test: the full train() loop on a synthetic prepared dir (CPU).

Exercises the loop glue end-to-end — dataset/loader construction, prefetch,
jitted step, loss printing, checkpoint cadence and resume — without any
dataset download or TPU.
"""

import os

import numpy as np
import pytest

import train as train_cli
from unopticalflow_tpu.utils.config import Config


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("loop")
    prep = root / "prepared" / "data_s1"
    drive = prep / "d" / "r"
    drive.mkdir(parents=True)
    rng = np.random.RandomState(0)
    lines = []
    h, w = 32, 32  # raw on-disk size; dataset resizes to img_hw
    for i in range(4):
        base = rng.randint(0, 255, (h + 4, w, 3), dtype=np.uint8)
        tri = np.concatenate([base[:h], base[2 : h + 2], base[4 : h + 4]], 0)
        cv2.imwrite(str(drive / f"{i:010d}.png"), tri)
        lines.append(f"d/r/{i:010d}.png d/calib.txt\n")
    (prep / "d").mkdir(exist_ok=True)
    with open(prep / "d" / "calib.txt", "w") as f:
        f.write("P_rect_02: 30.0 0.0 16.0 0.0 0.0 30.0 16.0 0.0 0.0 0.0 1.0 0.0\n")
    with open(prep / "train.txt", "w") as f:
        f.writelines(lines)
    (root / "models").mkdir()
    return root


def _cfg(root, **over):
    d = dict(
        dataset="kitti_depth",
        num_scales=3,
        num_iterations=3,
        w_ssim=0.85,
        w_flow_smooth=10.0,
        w_flow_consis=0.01,
        img_hw=(64, 64),
        prepared_base_dir=str(root / "prepared"),
        prepared_save_dir="data_s1",
        raw_base_dir="/nonexistent",
        static_frames_txt="/nonexistent",
        test_scenes_txt="/nonexistent",
        model_dir=str(root / "models"),
        log_dump_dir=str(root / "models" / "log.pkl"),
        batch_size=2,
        iter_start=0,
        lr=1e-4,
        num_workers=1,
        log_interval=1,
        test_interval=1000,
        save_interval=2,
        mode="flow",
        resume=False,
        multi_gpu=False,
        no_test=True,
        flow_pretrained_model=None,
        depth_pretrained_model=None,
        precision="float32",
        pallas_corr="off",
        seed=0,
    )
    d.update(over)
    return Config(d)


def test_train_loop_and_resume(workspace, capsys):
    state = train_cli.train(_cfg(workspace))
    out = capsys.readouterr().out
    assert "iter: 0, loss_pixel:" in out
    assert int(state.step) == 3
    files = set(os.listdir(workspace / "models"))
    # periodic save at iter 1 (save_interval=2) plus the final save at loop
    # exit (num_iterations=3 is off the save grid; without it the last
    # trained iteration would be silently lost, as in the reference)
    assert {"iter_1.ckpt", "iter_2.ckpt", "last.ckpt"} <= files

    # resume from last.ckpt: restarts at the stored iteration (reference
    # convention: iter_start = checkpoint iteration) — now the FINAL one
    state2 = train_cli.train(_cfg(workspace, resume=True, num_iterations=4))
    out2 = capsys.readouterr().out
    assert "starting iteration: 2." in out2
    assert "iter: 3, loss_pixel:" in out2
    assert int(state2.step) >= 4


@pytest.mark.slow
def test_preemption_sigterm_checkpoints_and_exits(workspace):
    """SIGTERM mid-run -> finish the step, checkpoint, exit 0 (SURVEY §5:
    the reference loses everything since the last save_interval grid point).
    """
    import signal
    import subprocess
    import sys
    import time

    root = str(workspace)
    code = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 1)
jax.config.update('jax_compilation_cache_dir', '/tmp/unflow_jax_test_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
sys.path.insert(0, {os.path.dirname(os.path.abspath(__file__))!r})
import train as train_cli
from test_train_loop import _cfg
from pathlib import Path
train_cli.train(_cfg(Path({root!r}), num_iterations=100000, save_interval=100000,
                     model_dir={root!r} + '/models_pre'))
print('TRAIN_RETURNED')
"""
    os.makedirs(os.path.join(root, "models_pre"), exist_ok=True)
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    import selectors

    # non-blocking line reads: a bare readline() would block through a cold
    # compile and defeat the deadline entirely
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    seen = []
    deadline = time.time() + 600
    hit = False
    while time.time() < deadline and not hit:
        if not sel.select(timeout=5):
            continue  # no output yet (e.g. compiling); re-check the clock
        line = proc.stdout.readline()
        if not line and proc.poll() is not None:
            break
        seen.append(line)
        if "iter: 3," in line:
            proc.send_signal(signal.SIGTERM)
            hit = True
    sel.close()
    if not hit:
        proc.kill()
        proc.wait(timeout=30)
        raise AssertionError("never reached iter 3:\n" + "".join(seen[-20:]))
    out, _ = proc.communicate(timeout=120)
    assert proc.returncode == 0, out
    assert "preemption signal" in out
    assert "TRAIN_RETURNED" in out
    files = set(os.listdir(os.path.join(root, "models_pre")))
    assert "last.ckpt" in files, files
    # the checkpoint holds the preempted iteration, not a grid point
    import jax

    from unopticalflow_tpu.models import init_flow_model
    from unopticalflow_tpu.training import create_train_state
    from unopticalflow_tpu.utils import checkpoint as ckpt

    st = create_train_state(init_flow_model(jax.random.PRNGKey(0)), lr=1e-4)
    it, _, _ = ckpt.restore_checkpoint(
        os.path.join(root, "models_pre", "last.ckpt"), st.params, st.opt_state
    )
    assert it >= 3


def test_train_loop_steps_per_dispatch(workspace, capsys):
    """--steps_per_dispatch=2: same loop surface, K-stacked dispatches.

    Checks the loop glue (stacked stream, interval grids, checkpoint cadence,
    logging at sub-step granularity) and that the 2-per-dispatch trajectory
    tracks the 1-per-dispatch one (same seed -> same batch schedule; the
    comparison tolerance is the Adam fresh-state bound discussed in
    test_training.py::test_multi_step_matches_sequential_dispatches).
    """
    import jax

    os.makedirs(workspace / "models_spd1", exist_ok=True)
    os.makedirs(workspace / "models_spd2", exist_ok=True)
    base = dict(num_iterations=4, save_interval=2, log_interval=2)
    state1 = train_cli.train(
        _cfg(workspace, model_dir=str(workspace / "models_spd1"), **base)
    )
    capsys.readouterr()
    state2 = train_cli.train(
        _cfg(
            workspace,
            model_dir=str(workspace / "models_spd2"),
            steps_per_dispatch=2,
            **base,
        )
    )
    out = capsys.readouterr().out
    assert "iter: 0, loss_pixel:" in out
    assert "iter: 2, loss_pixel:" in out
    assert int(state2.step) == 4
    files = set(os.listdir(workspace / "models_spd2"))
    assert {"iter_1.ckpt", "iter_3.ckpt", "last.ckpt"} <= files
    for x, y in zip(
        jax.tree.leaves(state1.params), jax.tree.leaves(state2.params)
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-3, atol=5e-4
        )


def test_steps_per_dispatch_interval_validation(workspace):
    with pytest.raises(ValueError, match="multiple of --steps_per_dispatch"):
        train_cli.train(
            _cfg(
                workspace,
                model_dir=str(workspace / "models_bad"),
                steps_per_dispatch=2,
                num_iterations=4,
                log_interval=3,
            )
        )
