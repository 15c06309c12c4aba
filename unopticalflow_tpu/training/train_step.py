"""The fused training step: forward + loss weighting + backward + Adam.

The reference's hot loop (/root/reference/train.py:120-155) — model forward
returning per-sample losses, config-weighted sum, ``loss.backward()``,
``optimizer.step()`` — compiles here into a *single* donated XLA program, so
parameters, optimizer state and activations never round-trip to the host.

Data parallelism: ``make_train_step(mesh=...)`` wraps the step in
``shard_map`` over a 1-D ``data`` mesh axis — the batch is split across
devices and gradients are reduced with ``jax.lax.pmean`` (an XLA all-reduce
that rides ICI), replacing the reference's single-host
``torch.nn.DataParallel`` replicate/scatter/gather (train.py:36).

Loss weighting matches ``generate_loss_weights_dict``
(/root/reference/core/config/config_utils.py:3-9):
pixel = 1 - w_ssim, ssim = w_ssim, smooth = w_flow_smooth,
consis = w_flow_consis.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unopticalflow_tpu.models.flow_model import (
    FlowModelConfig,
    forward,
    forward_pair,
)
from unopticalflow_tpu.models.flowpose_model import (
    forward_flowpose,
    forward_flowpose_pair,
)


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    opt_state: Any


def loss_weights_from_config(cfg) -> dict[str, float]:
    """Config -> loss-weight table (config_utils.py:3-9).

    In flowposenet mode the table gains the epipolar pose weight
    (``w_pose_epipolar`` yaml key) — an extension, since the reference never
    implemented the mode it declares.
    """
    w_ssim = float(getattr(cfg, "w_ssim", 0.85))
    weights = {
        "loss_pixel": 1.0 - w_ssim,
        "loss_ssim": w_ssim,
        "loss_flow_smooth": float(getattr(cfg, "w_flow_smooth", 10.0)),
        "loss_flow_consis": float(getattr(cfg, "w_flow_consis", 0.01)),
    }
    if getattr(cfg, "mode", "flow") == "flowposenet":
        weights["loss_pose_epipolar"] = float(
            getattr(cfg, "w_pose_epipolar", 1.0)
        )
    return weights


def make_optimizer(
    lr: float = 1e-4, freeze_flow: bool = False
) -> optax.GradientTransformation:
    """Adam with torch-default hyperparameters (train.py:39).

    ``freeze_flow`` zeroes updates to the ``flow`` branch of a flowposenet
    param tree — the reference's stage-2 behavior (its Model_flow.__init__
    sets requires_grad=False on fpyramid/pwc when mode is flowposenet,
    model_flow_paper.py:19-26).  Joint training is this framework's default;
    freezing is opt-in via the ``freeze_flow`` config key / CLI flag.
    """
    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if not freeze_flow:
        return opt
    return optax.multi_transform(
        {"train": opt, "frozen": optax.set_to_zero()},
        lambda params: {
            k: ("frozen" if k == "flow" else "train") for k in params
        },
    )


def create_train_state(params, lr: float = 1e-4, freeze_flow: bool = False) -> TrainState:
    opt = make_optimizer(lr, freeze_flow)
    return TrainState(jnp.zeros((), jnp.int32), params, opt.init(params))


def _loss_fn(params, model_cfg: FlowModelConfig, weights, batch, mode, snippet_frames):
    # uint8 batches (datasets' emit_uint8 fast path) are cast to [0, 1] f32
    # ON DEVICE: the host ships 4x fewer bytes and XLA fuses the cast into
    # the first consumer.  Bit-identical to a host-side /255 — the sources
    # are 8-bit PNGs.
    batch = tuple(
        x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x
        for x in batch
    )
    if mode == "flowposenet":
        fwd = forward_flowpose_pair if snippet_frames == 2 else forward_flowpose
    else:
        fwd = forward_pair if snippet_frames == 2 else forward
    pack = fwd(params, model_cfg, *batch)
    total = sum(weights[k] * jnp.mean(v) for k, v in pack.items())
    return total, {k: jnp.mean(v) for k, v in pack.items()}


def _build_step_body(model_cfg, weights, opt, mesh, mode, snippet_frames):
    """One optimizer step: fwd + weighted loss + bwd + Adam (+ DP pmean)."""

    def step_body(state: TrainState, *batch):
        (loss, pack), grads = jax.value_and_grad(_loss_fn, has_aux=True)(
            state.params, model_cfg, weights, batch, mode, snippet_frames
        )
        if mesh is not None:
            grads = jax.lax.pmean(grads, axis_name="data")
            loss = jax.lax.pmean(loss, axis_name="data")
            pack = jax.lax.pmean(pack, axis_name="data")
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, opt_state)
        metrics = dict(pack, loss_total=loss)
        return new_state, metrics

    return step_body


def make_train_step(
    model_cfg: FlowModelConfig,
    weights: dict[str, float],
    lr: float = 1e-4,
    mesh: Mesh | None = None,
    mode: str = "flow",
    snippet_frames: int = 3,
    freeze_flow: bool = False,
):
    """Build the jitted train step.

    Returns ``step_fn(state, batch) -> (state, metrics)``.  ``batch`` is the
    *global* (B, 3H, W, 3) batch in flow mode, or a tuple
    ``(images, K, K_inv)`` in flowposenet mode (2-frame NYU snippets use the
    pair variant via ``snippet_frames=2``).  With a mesh, the batch axes are
    sharded over the ``data`` axis and gradients are pmean-reduced; B must
    divide evenly.
    """
    opt = make_optimizer(lr, freeze_flow)
    step_body = _build_step_body(model_cfg, weights, opt, mesh, mode, snippet_frames)

    n_batch_args = 3 if mode == "flowposenet" else 1

    _attach_precompile = _attach_aot

    if mesh is None:
        jitted = jax.jit(step_body, donate_argnums=(0,))

        def step_fn(state, batch):
            batch = batch if isinstance(batch, tuple) else (batch,)
            return _run(state, *batch)

        _run = _attach_precompile(step_fn, jitted)
        return step_fn

    from jax import shard_map

    repl = P()
    data = P("data")
    sharded = shard_map(
        step_body,
        mesh=mesh,
        in_specs=(repl,) + (data,) * n_batch_args,
        out_specs=(repl, repl),
    )
    state_sh = NamedSharding(mesh, repl)
    batch_sh = NamedSharding(mesh, data)

    step = jax.jit(
        sharded,
        in_shardings=(state_sh,) + (batch_sh,) * n_batch_args,
        out_shardings=(state_sh, state_sh),
        donate_argnums=(0,),
    )

    def step_fn(state, batch):
        batch = batch if isinstance(batch, tuple) else (batch,)
        assert batch[0].shape[0] % mesh.devices.size == 0, (
            f"global batch {batch[0].shape[0]} must divide the "
            f"{mesh.devices.size}-device data mesh"
        )
        return _run(state, *batch)

    _run = _attach_precompile(step_fn, step)
    return step_fn


def make_multi_train_step(
    model_cfg: FlowModelConfig,
    weights: dict[str, float],
    steps_per_dispatch: int,
    lr: float = 1e-4,
    mesh: Mesh | None = None,
    mode: str = "flow",
    snippet_frames: int = 3,
    freeze_flow: bool = False,
):
    """K optimizer steps per host dispatch: ``lax.scan`` over stacked batches.

    The single-step program is already one donated executable, but each
    dispatch still pays the host round trip (tunneled runtimes measure this
    at a few ms/step — see benchmarks/PROFILE_r03.md "host gap").  Scanning
    K steps inside one program amortizes that cost to 1/K while keeping the
    exact same per-step math: the scan body IS the single-step body, so the
    parameter trajectory is identical to K sequential dispatches.

    Returns ``step_fn(state, batch) -> (state, metrics)`` where every batch
    leaf carries a leading (K, ...) axis — (K, B, 3H, W, 3) in flow mode —
    and every metrics leaf comes back stacked (K,), so callers can still log
    any sub-step.  With a mesh, batches are sharded over ``data`` on axis 1
    (the per-step batch axis); K stays a leading scan axis on every device.

    The reference has no analog (its loop is one ``optimizer.step()`` per
    Python iteration, /root/reference/train.py:120-155); this is TPU-native
    dispatch hygiene, same trick as flax's multi-step trainers.
    """
    if steps_per_dispatch < 1:
        raise ValueError(f"steps_per_dispatch must be >= 1, got {steps_per_dispatch}")
    opt = make_optimizer(lr, freeze_flow)
    step_body = _build_step_body(model_cfg, weights, opt, mesh, mode, snippet_frames)

    def multi_body(state: TrainState, *batch):
        def body(s, b):
            return step_body(s, *b)

        return jax.lax.scan(body, state, batch)

    n_batch_args = 3 if mode == "flowposenet" else 1

    if mesh is None:
        jitted = jax.jit(multi_body, donate_argnums=(0,))

        def step_fn(state, batch):
            batch = batch if isinstance(batch, tuple) else (batch,)
            return _run(state, *batch)

        _run = _attach_aot(step_fn, jitted)
        return step_fn

    from jax import shard_map

    repl = P()
    scan_data = P(None, "data")  # (K, B, ...): shard the per-step batch axis
    sharded = shard_map(
        multi_body,
        mesh=mesh,
        in_specs=(repl,) + (scan_data,) * n_batch_args,
        out_specs=(repl, repl),
    )
    state_sh = NamedSharding(mesh, repl)
    batch_sh = NamedSharding(mesh, scan_data)
    step = jax.jit(
        sharded,
        in_shardings=(state_sh,) + (batch_sh,) * n_batch_args,
        out_shardings=(state_sh, state_sh),
        donate_argnums=(0,),
    )

    def step_fn(state, batch):
        batch = batch if isinstance(batch, tuple) else (batch,)
        assert batch[0].shape[1] % mesh.devices.size == 0, (
            f"global batch {batch[0].shape[1]} must divide the "
            f"{mesh.devices.size}-device data mesh"
        )
        return _run(state, *batch)

    _run = _attach_aot(step_fn, step)
    return step_fn


def _attach_aot(step_fn, jitted):
    """AOT-compile support (multi-host compile-skew hygiene).

    ``step_fn.precompile(state, batch)`` compiles the step ahead of time and
    caches the executable so the first real step dispatches it directly.
    Multi-host training compiles on every process at its own pace; without
    this, a slow process reaches the first gradient all-reduce minutes after
    a fast one and trips the CPU/DCN collective rendezvous timeout (Gloo's is
    a hard 30 s).  train.py pairs this with a coordination-service barrier.
    """
    cell = {}

    def precompile(state, batch):
        batch = batch if isinstance(batch, tuple) else (batch,)
        cell["compiled"] = jitted.lower(state, *batch).compile()

    def run(state, *batch):
        compiled = cell.get("compiled")
        return compiled(state, *batch) if compiled is not None else jitted(
            state, *batch
        )

    step_fn.precompile = precompile
    return run
