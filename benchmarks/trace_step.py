"""Capture a jax.profiler trace of the train step and print per-op hot spots.

Usage: PYTHONPATH=. python benchmarks/trace_step.py [--batch 8] [--hw 256 832]
       [--out /tmp/unflow_trace]

Parses the perfetto trace the profiler writes and aggregates device-track op
durations by fusion/op name, printing the top entries — a poor man's
`xprof` for a box without TensorBoard.
"""

import argparse
import glob
import gzip
import json
import os
import time
from collections import defaultdict


def run_traced(out_dir, batch, hw, fp32, pallas, steps=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unopticalflow_tpu.models import FlowModelConfig, init_flow_model
    from unopticalflow_tpu.training import create_train_state, make_train_step

    W = {"loss_pixel": 0.15, "loss_ssim": 0.85,
         "loss_flow_smooth": 10.0, "loss_flow_consis": 0.01}
    dtype = "float32" if fp32 else "bfloat16"
    h, w = hw
    cfg = FlowModelConfig(num_scales=3, compute_dtype=dtype, loss_dtype=dtype,
                          use_pallas_corr=pallas, use_pallas_photo=pallas)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(batch, 3 * h, w, 3).astype(np.float32))
    params = init_flow_model(jax.random.PRNGKey(0))
    state = create_train_state(params, 1e-4)
    step = make_train_step(cfg, W, 1e-4)

    # warm to steady state (tunneled TPU: slow first executions)
    prev = None
    for _ in range(30):
        t0 = time.perf_counter()
        state, m = step(state, imgs)
        _ = float(m["loss_total"])
        cur = time.perf_counter() - t0
        if prev is not None and abs(cur - prev) < 0.15 * prev:
            break
        prev = cur

    with jax.profiler.trace(out_dir):
        for _ in range(steps):
            state, m = step(state, imgs)
            _ = float(m["loss_total"])


def summarize(out_dir, top=40, steps=3):
    paths = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace files found under", out_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # find the device "XLA Ops" thread: leaf per-op timing without the
    # module/step container spans that would double-count
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    op_tracks = {pt for pt, n in tid_name.items()
                 if n == "XLA Ops" and "TPU" in pid_name.get(pt[0], "")}

    tot = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tracks:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        tot[name] += dur
        cnt[name] += 1
        total += dur
    if not tot:
        print("no device complete-events found; pids:", pid_name)
        return
    print(f"trace: {path}")
    print(f"device total: {total:.1f} ms over {steps} steps "
          f"({total / steps:.1f} ms/step)\n")
    print(f"{'ms/step':>9}  {'%':>5}  {'count':>5}  op")
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms / steps:9.2f}  {100 * ms / total:5.1f}  "
              f"{cnt[name] // steps:5d}  {name[:110]}")

    # ---- attributed rollups (uses the per-event hlo_category/source args) --
    by_cat = defaultdict(float)
    by_src = defaultdict(float)
    flops_total = 0.0
    for e in events:
        a = e.get("args", {})
        if e.get("ph") != "X" or "hlo_category" not in a:
            continue
        ms = float(a["device_duration_ps"]) / 1e9
        by_cat[a["hlo_category"]] += ms
        src = a.get("source")
        if not src:
            stack = a.get("source_stack", "")
            src = next(
                (ln.rsplit(":", 1)[0] for ln in stack.split("\n")
                 if "unopticalflow" in ln), "(xla-internal)",
            )
        by_src[src.replace("/root/repo/", "")] += ms
        flops_total += float(a.get("model_flops", 0) or 0)
    cat_total = sum(by_cat.values())
    if cat_total:
        print(f"\n-- by HLO category ({cat_total / steps:.1f} ms/step) --")
        for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1]):
            if v / steps >= 0.05:
                print(f"  {v / steps:7.2f} ms  {100 * v / cat_total:5.1f}%  {k}")
        print("\n-- by source (top 25) --")
        for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {v / steps:7.2f} ms  {100 * v / cat_total:5.1f}%  {k}")
        mfu = flops_total / (cat_total / 1e3) / 1e12 / 197.0  # v5e bf16 peak
        print(f"\nmodel TFLOP/step: {flops_total / steps / 1e12:.2f}  "
              f"effective MFU vs 197 TF/s bf16 peak: {100 * mfu:.1f}%")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, nargs=2, default=(256, 832))
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--no-pallas", action="store_true")
    p.add_argument("--out", default="/tmp/unflow_trace")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--parse-only", action="store_true")
    args = p.parse_args()

    if not args.parse_only:
        run_traced(args.out, args.batch, tuple(args.hw), args.fp32,
                   not args.no_pallas, args.steps)
    summarize(args.out, args.top, args.steps)
