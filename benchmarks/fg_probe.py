"""Why is foreground-object motion uncaptured?  (VERDICT r04 item 3)

Every converged campaign leg captures background motion to sub-pixel EPE
while epe_fg stays pinned at E|fg| — this probe asks WHAT the converged
model predicts inside the foreground rectangle, on CPU, from a committed
checkpoint (no TPU needed):

  * pred_fg_vs_bg_gt — correlation of the mean fg-region prediction with the
    GT *background* motion: ~1 means the model paints the bg field straight
    through the rectangle (smoothness-dominated filling), ~0 + correlation
    with fg GT would mean genuine object-motion tracking.
  * per |fg - bg| relative-motion bin: EPE of fg pixels — does capture decay
    with relative displacement (a correlation-window limit) or is it flat
    (the fg region is ignored wholesale)?

Usage:
  JAX_PLATFORMS=cpu PYTHONPATH=. python benchmarks/fg_probe.py \
      --ckpt /tmp/synth_r05/b_a_bf16.ckpt [--hw 128 256] [--snippets 48]
"""

import argparse
import json

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--hw", type=int, nargs=2, default=(128, 256))
    p.add_argument("--max-bg", type=int, default=8)
    p.add_argument("--max-fg", type=int, default=16)
    p.add_argument("--tex-power", type=float, default=1.0)
    p.add_argument("--snippets", type=int, default=48)
    p.add_argument("--batch", type=int, default=4)
    args = p.parse_args()

    import jax

    from benchmarks.synthetic_epe import make_snippet
    from unopticalflow_tpu.models import (
        FlowModelConfig,
        inference_flow,
        init_flow_model,
    )
    from unopticalflow_tpu.utils.checkpoint import restore_checkpoint

    h, w = args.hw
    cfg = FlowModelConfig(num_scales=3)  # f32 XLA everywhere (CPU)
    params = init_flow_model(jax.random.PRNGKey(0), scheme="pwc")
    _, params, _ = restore_checkpoint(args.ckpt, params)  # params-only
    infer = jax.jit(lambda a, b: inference_flow(params, cfg, a, b))

    rng = np.random.RandomState(4242)
    rows = []
    done = 0
    while done < args.snippets:
        n = min(args.batch, args.snippets - done)
        stacked, gts, _ = zip(*[
            make_snippet(rng, h, w, max_bg=args.max_bg, max_fg=args.max_fg,
                         tex_power=args.tex_power)
            for _ in range(n)
        ])
        stacked = np.stack(stacked)
        flow = np.asarray(
            infer(stacked[:, h : 2 * h], stacked[:, 2 * h :]), np.float32
        )
        for i in range(n):
            gt = gts[i]
            bg_uv = gt[0, 0]
            fg_mask = np.linalg.norm(gt - bg_uv, axis=-1) > 0
            if not fg_mask.any():
                continue
            fg_uv = gt[fg_mask][0]
            pred_fg = flow[i][fg_mask].mean(0)
            err_fg = float(
                np.linalg.norm(flow[i][fg_mask] - fg_uv[None], axis=-1).mean()
            )
            rows.append({
                "bg_uv": bg_uv.tolist(),
                "fg_uv": fg_uv.tolist(),
                "rel_mag": float(np.linalg.norm(fg_uv - bg_uv)),
                "pred_fg_mean": [round(float(x), 2) for x in pred_fg],
                "epe_fg": round(err_fg, 2),
                "epe_fg_if_painted_bg": round(
                    float(np.linalg.norm(fg_uv - bg_uv)), 2
                ),
                "fg_px": int(fg_mask.sum()),
            })
        done += n

    def corr(a, b):
        a, b = np.asarray(a), np.asarray(b)
        a = a - a.mean()
        b = b - b.mean()
        d = np.sqrt((a**2).sum() * (b**2).sum())
        return float((a * b).sum() / d) if d else 0.0

    pf = np.array([r["pred_fg_mean"] for r in rows])
    bg = np.array([r["bg_uv"] for r in rows])
    fg = np.array([r["fg_uv"] for r in rows])
    bins = {}
    for lo, hi in ((0, 6), (6, 12), (12, 18), (18, 40)):
        sel = [r for r in rows if lo <= r["rel_mag"] < hi]
        if sel:
            bins[f"rel_{lo}-{hi}px"] = {
                "n": len(sel),
                "epe_fg": round(float(np.mean([r["epe_fg"] for r in sel])), 2),
                "epe_if_painted_bg": round(
                    float(np.mean([r["epe_fg_if_painted_bg"] for r in sel])), 2
                ),
            }
    out = {
        "probe": "fg-region prediction analysis",
        "ckpt": args.ckpt,
        "snippets": len(rows),
        "corr_predfg_with_bg_gt": {
            "u": round(corr(pf[:, 0], bg[:, 0]), 3),
            "v": round(corr(pf[:, 1], bg[:, 1]), 3),
        },
        "corr_predfg_with_fg_gt": {
            "u": round(corr(pf[:, 0], fg[:, 0]), 3),
            "v": round(corr(pf[:, 1], fg[:, 1]), 3),
        },
        "epe_fg_by_relative_motion": bins,
        "epe_fg_overall": round(float(np.mean([r["epe_fg"] for r in rows])), 2),
        "epe_if_painted_bg_overall": round(
            float(np.mean([r["epe_fg_if_painted_bg"] for r in rows])), 2
        ),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
