"""Training CLI — argument/YAML surface preserved from the reference.

Usage (same flags as /root/reference/train.py:161-183):
    python train.py -c config/kitti.yaml --batch_size 8 --lr 1e-4 --mode flow

TPU mapping of the reference semantics:
* the hot loop (train.py:120-155) is one jitted, buffer-donated train step;
* ``--multi_gpu`` becomes "shard the batch over all visible devices": batch
  is multiplied and iterations divided by the device count (train.py:208-213),
  gradients all-reduce over ICI via shard_map/pmean;
* checkpoints ``iter_<n>.ckpt`` + rolling ``last.ckpt`` every save_interval,
  resume restores {iteration, params, opt_state} (train.py:23-46); warm-start
  from either native .ckpt or reference .pth (train.py:47-61);
* KITTI 2012/2015 eval interleaved every test_interval (train.py:121-131).
"""

import argparse
import os
import pickle
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from unopticalflow_tpu.utils.config import Config, load_yaml_config, merge_cli_args


def build_arg_parser():
    p = argparse.ArgumentParser(description="tpu-unflow training pipeline.")
    p.add_argument("-c", "--config_file", default=None, help="config file.")
    p.add_argument("-g", "--gpu", type=str, default="0",
                   help="accepted for reference-CLI compatibility (device "
                        "selection is JAX-managed on TPU).")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--iter_start", type=int, default=0)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--log_interval", type=int, default=100)
    p.add_argument("--test_interval", type=int, default=2000)
    p.add_argument("--save_interval", type=int, default=2000)
    p.add_argument("--mode", type=str, default="flow")
    p.add_argument("--model_dir", type=str, default=None)
    p.add_argument("--prepared_save_dir", type=str, default="data_s1")
    p.add_argument("--flow_pretrained_model", type=str, default=None)
    p.add_argument("--depth_pretrained_model", type=str, default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--multi_gpu", action="store_true",
                   help="data-parallel over all devices (mesh DP).")
    p.add_argument("--multi_host", action="store_true",
                   help="multi-host data parallelism: jax.distributed over "
                        "all hosts (DCN), DP mesh over the GLOBAL device "
                        "set; implies --multi_gpu semantics (batch x N_dev, "
                        "iterations / N_dev). Run the same command on every "
                        "host.")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 for --multi_host (omit on "
                        "cloud TPU pods: auto-detected).")
    p.add_argument("--num_processes", type=int, default=None,
                   help="total process count for --multi_host.")
    p.add_argument("--process_id", type=int, default=None,
                   help="this process's id for --multi_host.")
    p.add_argument("--no_test", action="store_true")
    p.add_argument("--precision", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="compute dtype for convs/corr AND the image-space "
                        "loss stack (TPU extension).")
    p.add_argument("--loss_precision", type=str, default=None,
                   choices=["float32", "bfloat16"],
                   help="override the loss-stack dtype independently of "
                        "--precision (e.g. bf16 convs with fp32 losses).")
    p.add_argument("--pallas_corr", type=str, default="auto",
                   choices=["auto", "on", "off"],
                   help="Pallas cost-volume kernels: auto = on for TPU "
                        "platforms, off elsewhere.")
    p.add_argument("--steps_per_dispatch", default="auto",
                   help="K optimizer steps per host dispatch (lax.scan over "
                        "K stacked batches): amortizes the per-step host/"
                        "dispatch gap on tunneled or dispatch-bound hosts. "
                        "Per-step math is identical to K single dispatches; "
                        "log/save/test intervals must be multiples of K. "
                        "'auto' (default) picks the largest K in {8,4,2,1} "
                        "dividing every interval grid — 8 is the measured "
                        "throughput optimum (benchmarks/bench_r04/b8_scan8). "
                        "Interleaved eval at K>1 sees params K-1 steps "
                        "staler than a K=1 run at the same grid point.")
    p.add_argument("--cache_decoded", action="store_true",
                   help="cache decoded+resized frames as uint8 .npy under the "
                        "prepared dir (feeds the chip faster on few-core hosts).")
    p.add_argument("--freeze_flow", action="store_true",
                   help="flowposenet: freeze the flow branch and train only "
                        "the PoseNet (the reference's stage-2 behavior).")
    p.add_argument("--init_scheme", type=str, default="torch",
                   choices=["torch", "pwc"],
                   help="param init: 'torch' = reference torch-default "
                        "(checkpoint/trajectory parity, but input-blind at "
                        "init — see models/layers.py); 'pwc' = official "
                        "PWC-Net kaiming_normal, required for from-scratch "
                        "training at short horizons.")
    p.add_argument("--seed", type=int, default=0)
    return p


def train(cfg):
    import jax
    import jax.numpy as jnp

    from unopticalflow_tpu.data import (
        BatchLoader,
        KITTI_Odo,
        KITTI_Prepared,
        KITTI_RAW,
        NYU_Prepare,
        NYU_v2,
        SINTEL_Prepared,
        SINTEL_RAW,
        device_prefetch,
    )
    from unopticalflow_tpu.evaluation import load_gt_flow_kitti, load_gt_mask
    from unopticalflow_tpu.models import FlowModelConfig, get_model, inference_flow
    from unopticalflow_tpu.parallel import data_parallel_mesh
    from unopticalflow_tpu.training import (
        TrainState,
        create_train_state,
        loss_weights_from_config,
        make_multi_train_step,
        make_train_step,
    )
    from unopticalflow_tpu.utils import checkpoint as ckpt
    from unopticalflow_tpu.utils.visualizer import Visualizer
    from jax.sharding import NamedSharding, PartitionSpec as P

    from test import test_kitti_2012, test_kitti_2015

    from unopticalflow_tpu.utils.platform import resolve_pallas

    precision = cfg.get("precision", "float32")
    model_cfg = FlowModelConfig(
        num_scales=cfg.num_scales,
        compute_dtype=precision,
        loss_dtype=cfg.get("loss_precision", None) or precision,
        use_pallas_corr=resolve_pallas(cfg.get("pallas_corr", "auto")),
        # independently toggleable (defaults to the pallas_corr setting) so a
        # regression can be isolated to one kernel
        use_pallas_photo=resolve_pallas(
            cfg.get("pallas_photo", cfg.get("pallas_corr", "auto"))
        ),
        # uint8-quantized no-grad loss-warp gathers (ops/warp.py); yaml knob,
        # off by default pending the on-chip throughput validation
        quantize_loss_warps=bool(cfg.get("quantize_loss_warps", False)),
    )
    init_fn = get_model(cfg.mode)
    # init_scheme: "torch" (reference-default; input-blind at init — see
    # models/layers.py) or "pwc" (official PWC-Net kaiming_normal; required
    # for from-scratch training at short horizons).
    params = init_fn(
        jax.random.PRNGKey(cfg.get("seed", 0)),
        scheme=cfg.get("init_scheme", "torch"),
    )
    freeze_flow = bool(cfg.get("freeze_flow")) and cfg.mode == "flowposenet"
    state = create_train_state(params, lr=cfg.lr, freeze_flow=freeze_flow)

    # resume / warm start (reference train.py:42-75)
    if cfg.resume:
        name = f"iter_{cfg.iter_start}.ckpt" if cfg.iter_start > 0 else "last.ckpt"
        try:
            it, params, opt_state = ckpt.restore_checkpoint(
                os.path.join(cfg.model_dir, name), state.params, state.opt_state
            )
        except (ValueError, KeyError) as e:
            # The opt_state pytree structure depends on --freeze_flow
            # (optax.multi_transform vs plain Adam); a mismatched resume
            # otherwise dies with an opaque deserialization error.
            raise ValueError(
                f"failed to restore {name}: checkpoint structure does not "
                f"match the current optimizer (freeze_flow={freeze_flow}). "
                "Resume with the same --freeze_flow setting the checkpoint "
                "was saved under."
            ) from e
        cfg.iter_start = it
        state = TrainState(jnp.asarray(it, jnp.int32), params, opt_state)
    elif cfg.flow_pretrained_model:
        if cfg.mode == "flowposenet":
            # stage-2 warm start (reference train.py:47-75 semantics): the
            # flow branch loads from a FLOW checkpoint (.ckpt or reference
            # .pth); the pose branch keeps its fresh init.
            _, flow_params = ckpt.load_pretrained(
                cfg.flow_pretrained_model, state.params["flow"]
            )
            params = dict(state.params, flow=flow_params)
        else:
            _, params = ckpt.load_pretrained(cfg.flow_pretrained_model, state.params)
        state = create_train_state(params, lr=cfg.lr, freeze_flow=freeze_flow)
        print("Load Flow Pretrained Model from " + cfg.flow_pretrained_model)

    loss_weights = loss_weights_from_config(cfg)
    visualizer = Visualizer(loss_weights, cfg.get("log_dump_dir"))

    # multi-host: process 0 owns preparation/eval/checkpoint/log; the data
    # path is per-process sharded (BatchLoader block + make_array assembly)
    is_main = jax.process_index() == 0

    # dataset preparation on first run (train.py:81-96)
    data_dir = os.path.join(cfg.prepared_base_dir, cfg.prepared_save_dir)
    if not is_main:
        # non-coordinators wait for process 0 to finish preparing — bounded,
        # so a crashed coordinator fails the pod fast instead of hanging it
        # on the TPU reservation forever
        import time as _time

        _deadline = _time.monotonic() + float(cfg.get("prep_timeout_s", 3600))
        while not os.path.exists(os.path.join(data_dir, "train.txt")):
            if _time.monotonic() > _deadline:
                raise RuntimeError(
                    f"timed out waiting for {data_dir}/train.txt — process 0 "
                    "likely failed during data preparation; check its log"
                )
            _time.sleep(2.0)
    elif not os.path.exists(os.path.join(data_dir, "train.txt")):
        if cfg.dataset == "kitti_depth":
            KITTI_RAW(
                cfg.raw_base_dir, cfg.static_frames_txt, cfg.test_scenes_txt
            ).prepare_data_mp(data_dir, stride=1)
        elif cfg.dataset == "sintel_raw":
            SINTEL_RAW(cfg.raw_base_dir).prepare_data_mp(data_dir, cfg.stride)
        elif cfg.dataset == "kitti_odo":
            KITTI_Odo(cfg.raw_base_dir).prepare_data_mp(data_dir, stride=1)
        elif cfg.dataset == "nyuv2":
            NYU_Prepare(cfg.raw_base_dir, cfg.nyu_test_dir).prepare_data_mp(
                data_dir, stride=10
            )
        else:
            raise NotImplementedError(cfg.dataset)

    n_samples = (cfg.num_iterations - cfg.iter_start) * cfg.batch_size
    cache_dir = (
        os.path.join(data_dir, f"decoded_cache_{cfg.img_hw[0]}x{cfg.img_hw[1]}")
        if cfg.get("cache_decoded") else None
    )
    if cfg.dataset in ("kitti_depth", "kitti_odo"):
        dataset = KITTI_Prepared(
            data_dir, num_scales=cfg.num_scales, img_hw=cfg.img_hw,
            num_iterations=n_samples, cache_dir=cache_dir,
            return_intrinsics=(cfg.mode == "flowposenet"),
            emit_uint8=True,  # /255 cast fused on-device (train_step._loss_fn)
        )
    elif cfg.dataset == "sintel_raw":
        dataset = SINTEL_Prepared(
            data_dir, num_scales=cfg.num_scales, img_hw=cfg.img_hw,
            num_iterations=n_samples, cache_dir=cache_dir,
            emit_uint8=True,
        )
    elif cfg.dataset == "nyuv2":
        dataset = NYU_v2(
            data_dir, num_scales=cfg.num_scales, img_hw=cfg.img_hw,
            num_iterations=n_samples,
        )
    else:
        raise NotImplementedError(cfg.dataset)

    loader = BatchLoader(
        dataset, batch_size=cfg.batch_size, num_workers=cfg.num_workers,
        drop_last=False,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )

    eval_gts = None
    if (
        is_main
        and (not cfg.no_test)
        and cfg.dataset in ("kitti_depth", "kitti_odo", "sintel_raw")
    ):
        gt_flows_2012, noc_masks_2012 = load_gt_flow_kitti(cfg.gt_2012_dir, "kitti_2012")
        gt_flows_2015, noc_masks_2015 = load_gt_flow_kitti(cfg.gt_2015_dir, "kitti_2015")
        gt_masks_2015 = load_gt_mask(cfg.gt_2015_dir)
        eval_gts = (gt_flows_2012, noc_masks_2012, gt_flows_2015, noc_masks_2015,
                    gt_masks_2015)

    mesh = None
    batch_sharding = None
    if cfg.multi_gpu or cfg.get("multi_host"):
        mesh = data_parallel_mesh()  # global device set under jax.distributed
        batch_sharding = NamedSharding(mesh, P("data"))
        if is_main:
            print(
                f"data-parallel mesh over {mesh.devices.size} devices "
                f"({jax.process_count()} processes)"
            )
    spd_cfg = cfg.get("steps_per_dispatch", 1) or 1
    if isinstance(spd_cfg, str) and spd_cfg.strip().lower() == "auto":
        # largest K in {8,4,2,1} that divides every interval grid AND the
        # remaining iteration count (8 = measured throughput optimum,
        # benchmarks/bench_r04/b8_scan8.json: 123.8 vs 120.5 snippets/s)
        grids = [
            int(cfg.log_interval), int(cfg.save_interval),
            int(cfg.test_interval), int(cfg.num_iterations - cfg.iter_start),
        ]
        spd = next(k for k in (8, 4, 2, 1) if all(g % k == 0 for g in grids))
        if is_main:
            print(f"steps_per_dispatch auto -> {spd}")
    else:
        spd = int(spd_cfg)
    if spd > 1:
        # The scan body is the single-step body, so the K-step program's
        # parameter trajectory is identical to K single dispatches — the grid
        # constraints below are bookkeeping, not math (intervals/logging only
        # ever observe dispatch boundaries).
        for nm in ("log_interval", "save_interval", "test_interval"):
            iv = int(getattr(cfg, nm))
            if iv % spd:
                raise ValueError(
                    f"--{nm}={iv} must be a multiple of "
                    f"--steps_per_dispatch={spd}"
                )
        if (cfg.num_iterations - cfg.iter_start) % spd:
            raise ValueError(
                f"num_iterations - iter_start = "
                f"{cfg.num_iterations - cfg.iter_start} must be a multiple "
                f"of --steps_per_dispatch={spd}"
            )
        if batch_sharding is not None:
            batch_sharding = NamedSharding(mesh, P(None, "data"))
        step_fn = make_multi_train_step(
            model_cfg, loss_weights, steps_per_dispatch=spd, lr=cfg.lr,
            mesh=mesh, mode=cfg.mode,
            snippet_frames=getattr(dataset, "num_frames", 3),
            freeze_flow=freeze_flow,
        )
    else:
        step_fn = make_train_step(
            model_cfg, loss_weights, lr=cfg.lr, mesh=mesh, mode=cfg.mode,
            snippet_frames=getattr(dataset, "num_frames", 3),
            freeze_flow=freeze_flow,
        )

    # compiled once; evals pass the current params explicitly.  In the joint
    # flow+pose mode the flow branch lives under the "flow" subtree.
    flow_params = (lambda p: p["flow"]) if cfg.mode == "flowposenet" else (lambda p: p)
    infer_jit = jax.jit(
        lambda params, i1, i2: inference_flow(flow_params(params), model_cfg, i1, i2)
    )

    # Async checkpointing: save() snapshots the device buffers and returns;
    # a worker thread does the (slow, tunneled) D2H fetch + serialize +
    # atomic writes.  The loop only blocks at exit (saver.wait below).
    saver = ckpt.AsyncCheckpointer() if is_main else None
    _last_saved = {"iter": None}

    def save(iteration):
        if _last_saved["iter"] == iteration:
            return  # e.g. preemption right after a grid save of the same step
        _last_saved["iter"] = iteration
        saver.save(
            (
                os.path.join(cfg.model_dir, f"iter_{iteration}.ckpt"),
                os.path.join(cfg.model_dir, "last.ckpt"),
            ),
            iteration, state.params, state.opt_state,
        )

    # Preemption handling (extension; the reference has none — SURVEY §5):
    # TPU pods are routinely preempted with a SIGTERM grace window.  Catch
    # SIGTERM/SIGINT, finish the in-flight step, checkpoint, and exit
    # cleanly so --resume continues from the preempted iteration instead of
    # the last save_interval grid point.  Handlers are restored on exit;
    # installation is skipped off the main thread (tests, embedding).
    import signal as _signal

    _preempt = {"sig": None}
    _prev_handlers = {}

    def _on_preempt_signal(signum, frame):
        _preempt["sig"] = signum
        # first signal requests a graceful stop; restore the previous
        # handlers immediately so a SECOND signal force-exits (the loop may
        # be stuck in a multi-minute compile or a wedged device call)
        for _s, _h in _prev_handlers.items():
            _signal.signal(_s, _h)

    try:
        for _s in (_signal.SIGTERM, _signal.SIGINT):
            _prev_handlers[_s] = _signal.signal(_s, _on_preempt_signal)
    except ValueError:  # not the main thread
        _prev_handlers = {}

    # multi-host: agree on stopping only every K iterations — the agreement
    # collective is host-blocking, and checking each step would serialize
    # the hosts in lockstep; grace windows are tens of seconds, so a ~1.5 s
    # check cadence (K steps) loses nothing
    _PREEMPT_CHECK_EVERY = 20

    def _preempt_agreed(do_collective=True):
        """True iff every process agrees to stop at this loop point.

        Multi-host: a per-process flag alone would let processes break at
        DIFFERENT iterations (the signal can land between two processes'
        checks), leaving survivors hung in the next gradient all-reduce.
        A tiny allgather of the local flags — called under an
        iteration-deterministic condition IDENTICAL on every process —
        makes the decision collective: all break together or none do.
        """
        flag = _preempt["sig"] is not None
        if jax.process_count() > 1:
            if not do_collective:
                return False
            from jax.experimental import multihost_utils

            return bool(np.any(multihost_utils.process_allgather(np.asarray(flag))))
        return flag

    if is_main:
        print(f"starting iteration: {cfg.iter_start}.")
    def _stack_host_stream(iterator, k):
        """Group k consecutive host batches into one (k, B, ...) stack.

        Stacking happens on the host numpy side so the (single) H2D copy of
        the whole stack overlaps compute via device_prefetch, same as plain
        batches.  A trailing partial group cannot occur: the loader yields
        exactly ``num_iterations - iter_start`` batches and divisibility by
        k is enforced above.
        """
        import itertools as _it

        while True:
            group = list(_it.islice(iterator, k))
            if len(group) < k:
                return
            if isinstance(group[0], tuple):
                yield tuple(np.stack(parts) for parts in zip(*group))
            else:
                yield np.stack(group)

    def _model_inputs(inputs):
        """Loader tuple -> step_fn batch (NYU carries per-scale intrinsics).

        NYU returns (img, K_ms, K_inv_ms); the pose branch needs the scale-0
        intrinsics, plain flow mode only the images.  (The reference crashed
        here — `inputs.cuda()` on a tuple; the 2-frame flow path is an
        extension, models/flow_model.py::forward_pair.)  With K-stacked
        batches the scale axis sits one deeper.
        """
        if cfg.dataset != "nyuv2":
            return inputs
        imgs, k_ms, k_inv_ms = inputs
        if cfg.mode != "flowposenet":
            return imgs
        sl = (slice(None), slice(None), 0) if spd > 1 else (slice(None), 0)
        return (imgs, k_ms[sl], k_inv_ms[sl])

    host_stream = iter(loader)
    if spd > 1:
        host_stream = _stack_host_stream(host_stream, spd)
    stream = device_prefetch(
        host_stream, sharding=batch_sharding, batch_axis=1 if spd > 1 else 0
    )

    if jax.process_count() > 1:
        # Compile-skew hygiene: each process AOT-compiles the step at its own
        # pace (minutes apart is normal on asymmetric hosts), THEN all meet at
        # a coordination-service barrier (long timeout) before the first
        # gradient all-reduce.  Without this, the slowest process trips the
        # collective rendezvous timeout (Gloo: hard 30 s) while the others
        # are already executing.
        import itertools

        from jax._src import distributed as _dist

        stream = iter(stream)
        try:
            first = next(stream)
        except StopIteration:
            first = None
        if first is not None:
            step_fn.precompile(state, _model_inputs(first))
            stream = itertools.chain([first], stream)
        client = _dist.global_state.client
        if client is not None:
            client.wait_at_barrier(
                "unflow_train_step_compiled", timeout_in_ms=3_600_000
            )

    import time as _time

    _last_step = {"iter": None}  # adjusted iteration of the last done step
    _log_t = {"t": None, "iter": 0}  # throughput accounting between logs

    def _preempt_exit():
        if is_main:
            print(
                f"preemption signal {_preempt['sig']}: checkpointing at "
                f"iteration {_last_step['iter']} and exiting."
            )
            if _last_step["iter"] is not None:
                save(_last_step["iter"])

    _loop_exc = None
    try:
        for dispatch_, inputs in enumerate(stream):
            # iter_ is the FIRST sub-step of this dispatch (== the iteration
            # itself when steps_per_dispatch is 1); the dispatch covers
            # iterations [iter_, iter_ + spd).  All interval grids are
            # multiples of spd (enforced above), so the K=1 conditions
            # generalize by testing the dispatch's LAST sub-step.
            iter_ = dispatch_ * spd
            # check BEFORE the (multi-minute) interleaved eval as well as after
            # the step: a grace window must not be spent evaluating.
            # NOTE (dispatch granularity): eval fires at the TOP of the
            # dispatch whose last sub-step hits test_interval, so the
            # evaluated params are spd-1 optimizer steps staler than a K=1
            # run at the same grid point — account for this when comparing
            # eval curves across --steps_per_dispatch settings.
            will_eval = (iter_ + spd) % cfg.test_interval == 0 and (not cfg.no_test)
            if _preempt_agreed(iter_ % _PREEMPT_CHECK_EVERY == 0 or will_eval):
                _preempt_exit()
                break
            do_eval = will_eval
            if do_eval and eval_gts:
                # multi-host: params are replicated, so every process holds a full
                # local copy — fetch to host, then re-commit ONCE to this
                # process's device so the ~400 per-frame infer_jit calls don't
                # each re-upload the whole pytree.  (Calling a jit on the
                # globally-sharded params from just process 0 would deadlock the
                # other processes' collectives.)
                eval_params = (
                    jax.device_put(
                        jax.device_get(state.params), jax.local_devices()[0]
                    )
                    if jax.process_count() > 1 else state.params
                )
                infer = lambda i1, i2: infer_jit(eval_params, i1, i2)
                res_2012 = test_kitti_2012(cfg, infer, eval_gts[0], eval_gts[1])
                res_2015 = test_kitti_2015(
                    cfg, infer, eval_gts[2], eval_gts[3], eval_gts[4]
                )
                visualizer.add_log_pack(
                    {"eval_2012_res": res_2012, "eval_2015_res": res_2015}
                )
                visualizer.dump_log(os.path.join(cfg.model_dir, "log.pkl"))
            if do_eval and jax.process_count() > 1:
                # Only process 0 holds eval GT; the others must NOT run ahead
                # into the next step's gradient all-reduce while it evaluates
                # (the CPU/Gloo collective rendezvous times out at a hard 30 s).
                # Everyone meets here each eval round instead.
                from jax._src import distributed as _dist

                _client = _dist.global_state.client
                if _client is not None:
                    _client.wait_at_barrier(
                        f"unflow_eval_done_{iter_}", timeout_in_ms=3_600_000
                    )

            iter_ = iter_ + cfg.iter_start
            state, metrics = step_fn(state, _model_inputs(inputs))
            if spd > 1:
                # metrics come back stacked (spd,); log the FIRST sub-step —
                # iteration iter_ itself, the same grid point a K=1 run
                # prints at, so loss curves line up across spd settings
                metrics = jax.tree.map(lambda x: x[0], metrics)
            if is_main and iter_ % cfg.log_interval == 0:
                # throughput observability: print_loss fetches the metrics
                # (a device sync), so timing between log points is free —
                # the interval rate includes everything (step, host, eval)
                now = _time.perf_counter()
                pack = {k: v for k, v in metrics.items() if k != "loss_total"}
                if _log_t["t"] is not None and now > _log_t["t"]:
                    pack["snippets_per_sec"] = (
                        cfg.batch_size
                        * (iter_ - _log_t["iter"])
                        / (now - _log_t["t"])
                    )
                _log_t["t"], _log_t["iter"] = now, iter_
                visualizer.print_loss(pack, iter_=iter_)
            _last_step["iter"] = iter_ + spd - 1
            if is_main and (iter_ + spd) % cfg.save_interval == 0:
                save(iter_ + spd - 1)
            if _preempt_agreed((iter_ + spd) % _PREEMPT_CHECK_EVERY == 0):
                _preempt_exit()
                break
        # final save: the reference only checkpoints on the save_interval grid
        # (train.py:153-155), silently dropping the weights of any run whose
        # length is not a multiple of it — write last.ckpt at loop exit instead
        if (
            is_main
            and _preempt["sig"] is None
            and cfg.num_iterations > cfg.iter_start
            and cfg.num_iterations % cfg.save_interval != 0
        ):
            save(cfg.num_iterations - 1)
    except BaseException as e:
        _loop_exc = e
        raise
    finally:
        # restore handlers and drain async writes on EVERY exit path
        # (a step exception must not leak handlers or abandon queued
        # checkpoints; a saver error must not mask the original one)
        for _s, _h in _prev_handlers.items():
            try:
                _signal.signal(_s, _h)
            except ValueError:
                pass
        if saver is not None:
            try:
                saver.close()  # drain pending writes; surface worker errors
            except Exception:
                if _loop_exc is None:
                    raise
                import traceback

                traceback.print_exc()
    return state


if __name__ == "__main__":
    args = build_arg_parser().parse_args()
    if args.config_file is None:
        raise ValueError("config file needed. -c --config_file.")
    if not os.path.exists(args.config_file):
        raise ValueError("config file not found.")

    is_main_proc = True
    if args.multi_host:
        # must run before any device query, on every host
        from unopticalflow_tpu.parallel import initialize_multi_host

        kw = {}
        if args.coordinator_address is not None:
            kw["coordinator_address"] = args.coordinator_address
        if args.num_processes is not None:
            kw["num_processes"] = args.num_processes
        if args.process_id is not None:
            kw["process_id"] = args.process_id
        initialize_multi_host(**kw)
        import jax

        is_main_proc = jax.process_index() == 0
        args.multi_gpu = True  # DP mesh over the global device set

    if args.model_dir is None:
        args.model_dir = os.path.join(
            "models", os.path.splitext(os.path.split(args.config_file)[1])[0]
        )
    args.model_dir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), args.model_dir, args.mode
    )
    os.makedirs(args.model_dir, exist_ok=True)

    cfg_dict = load_yaml_config(args.config_file)
    cfg_dict["log_dump_dir"] = os.path.join(args.model_dir, "log.pkl")
    if is_main_proc:
        shutil.copy(args.config_file, args.model_dir)
    cfg = merge_cli_args(cfg_dict, args)

    # --multi_gpu semantics (train.py:208-213): scale batch, divide iterations
    # (under --multi_host, jax.devices() spans every host, so the reference's
    # batch x N / iters / N rule generalizes to the global device count)
    if cfg.multi_gpu:
        import jax

        n_dev = len(jax.devices())
        cfg.batch_size = cfg.batch_size * n_dev
        cfg.num_iterations = int(cfg.num_iterations / n_dev)

    if is_main_proc:
        with open(os.path.join(args.model_dir, "config.pkl"), "wb") as f:
            pickle.dump(cfg.to_dict(), f)

    train(cfg)
