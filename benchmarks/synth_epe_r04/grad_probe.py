"""Diagnose the synthetic-EPE learning stall: grad norms + flow stats.

Loads one pool batch, evaluates loss + grads at (a) fresh init, (b) the 8k-iter
main.ckpt, under bf16+Pallas (production) and f32+XLA, and prints per-branch
gradient norms and predicted-flow statistics.
"""
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/tmp/unflow_jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from unopticalflow_tpu.models import FlowModelConfig, inference_flow, init_flow_model
from unopticalflow_tpu.models.flow_model import forward
from unopticalflow_tpu.utils.platform import on_tpu

H, W = 256, 832
pool = np.load("/tmp/synth_r04/pool.npy", mmap_mode="r")
batch = np.asarray(pool[:8]).astype(np.float32) / 255.0
images = jnp.asarray(batch)

weights = {"loss_pixel": 0.15, "loss_ssim": 0.85,
           "loss_flow_smooth": 10.0, "loss_flow_consis": 0.01}

params0 = init_flow_model(jax.random.PRNGKey(0))

from unopticalflow_tpu.utils.checkpoint import restore_checkpoint
import jax.tree_util as jtu
it, params8k, _ = restore_checkpoint("/tmp/synth_r04/main.ckpt", params0, None)
print(f"ckpt iter: {it}")

def probe(tag, params, cfg):
    def loss_fn(p):
        pack = forward(p, cfg, images)
        total = sum(weights[k] * jnp.mean(v) for k, v in pack.items())
        return total, {k: jnp.mean(v) for k, v in pack.items()}
    (loss, pack), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    gn = {k: float(optax_gn(v)) for k, v in grads.items()}
    flow = inference_flow(params, cfg, images[:, H:2*H], images[:, 2*H:])
    fl = np.asarray(flow)
    out = {
        "tag": tag, "loss": float(loss),
        "pack": {k: float(v) for k, v in pack.items()},
        "grad_norm": gn,
        "flow_mean_mag": float(np.linalg.norm(fl, axis=-1).mean()),
        "flow_u_mean": float(fl[..., 0].mean()), "flow_u_std": float(fl[..., 0].std()),
        "flow_v_mean": float(fl[..., 1].mean()), "flow_v_std": float(fl[..., 1].std()),
    }
    print(json.dumps(out), flush=True)

def optax_gn(tree):
    leaves = jtu.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))

tpu = on_tpu()
cfg_prod = FlowModelConfig(num_scales=3, compute_dtype="bfloat16",
                           loss_dtype="bfloat16", use_pallas_corr=tpu,
                           use_pallas_photo=tpu)
cfg_f32 = FlowModelConfig(num_scales=3, compute_dtype="float32",
                          loss_dtype="float32", use_pallas_corr=False,
                          use_pallas_photo=False)

probe("init_bf16_pallas", params0, cfg_prod)
probe("init_f32_xla", params0, cfg_f32)
probe("ckpt8k_bf16_pallas", params8k, cfg_prod)
probe("ckpt8k_f32_xla", params8k, cfg_f32)
