"""Summarize synthetic-EPE training logs into one JSON + a learning curve.

Inputs are the raw stdout logs of ``benchmarks/synthetic_epe.py`` runs
(``--eval-every`` JSON lines interleaved with loss lines).  Emits:

  * ``SYNTH_EPE_r04.json`` — per-run eval trajectories + final metrics +
    the ablation deltas the round-3 verdict asked for (occlusion-mask
    ablation, bf16-vs-f32 trajectory agreement),
  * ``synth_epe_curve.png`` — EPE(all / occluded) and KITTI outlier rate
    vs iteration for every run.

Usage:
  python benchmarks/synth_epe_summarize.py \
      --run main=benchmarks/synth_epe_r04/main_bf16_pallas.log \
      --run nomask=benchmarks/synth_epe_r04/nomask.log \
      --run fp32=benchmarks/synth_epe_r04/fp32.log \
      --out-dir benchmarks/synth_epe_r04
"""

from __future__ import annotations

import argparse
import json
import os
import re


def parse_log(path: str):
    """Return (eval_points, loss_points, final) from a synthetic_epe log."""
    evals, losses, final = [], [], None
    loss_re = re.compile(
        r"iter (\d+): total ([\d.]+) pixel ([\d.]+) ssim ([\d.]+)"
    )
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{"):
                d = json.loads(line)
                if "iter" in d:
                    evals.append(d)
                elif "benchmark" in d:
                    final = d
                elif "zero_flow" in d and len(d) == 1:
                    evals.append({"zero_flow_line": d["zero_flow"]})
            else:
                m = loss_re.match(line)
                if m:
                    losses.append(
                        {"iter": int(m.group(1)), "total": float(m.group(2)),
                         "pixel": float(m.group(3)), "ssim": float(m.group(4))}
                    )
    return evals, losses, final


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--run", action="append", required=True,
                   help="name=logpath (repeatable)")
    p.add_argument("--out-dir", default="benchmarks/synth_epe_r04")
    p.add_argument("--name", default="SYNTH_EPE_r04",
                   help="output JSON basename (e.g. SYNTH_EPE_r05)")
    args = p.parse_args()

    runs = {}
    for spec in args.run:
        name, path = spec.split("=", 1)
        evals, losses, final = parse_log(path)
        zf = next((d["zero_flow_line"] for d in evals if "zero_flow_line" in d), None)
        evals = [d for d in evals if "zero_flow_line" not in d]
        runs[name] = {
            "zero_flow_measured": zf or (final or {}).get("zero_flow"),
            "log": os.path.relpath(path),
            "eval_points": evals,
            "final": final,
            "last_eval": evals[-1] if evals else None,
            "mean_loss_last_1k": (
                round(sum(d["total"] for d in losses[-4:]) / max(len(losses[-4:]), 1), 4)
                if losses else None
            ),
        }

    def zero_flow_epe(m):
        """E|(u,v)| over the integer motion grid [-m, m]^2 — the EPE of a
        constant-zero prediction.  'Learned' means going UNDER this;
        part of any initial epe_all drop is just unlearning the random
        init's constant bias (see synth_epe_r04/README.md Act 2b)."""
        import numpy as np

        u, v = np.mgrid[-m : m + 1, -m : m + 1]
        return round(float(np.hypot(u, v).mean()), 3)

    summary = {"benchmark": f"synthetic occlusion-aware EPE campaign ({args.name})",
               "runs": runs}
    for r in runs.values():
        fin = r.get("final")
        if fin and "max_bg" in fin:
            r["zero_flow_epe_bg"] = zero_flow_epe(fin["max_bg"])
            r["zero_flow_epe_fg"] = zero_flow_epe(fin["max_fg"])

    def last_point(name):
        """Last eval point of a run, falling back to its final metrics
        (runs without --eval-every only have the final JSON)."""
        r = runs.get(name, {})
        if r.get("last_eval"):
            return r["last_eval"]
        fin = r.get("final")
        return {"iter": fin["iters"], **fin} if fin else None

    def at(name, key):
        return (last_point(name) or {}).get(key)

    def main_at_iter(it):
        return next((d for d in runs["main"]["eval_points"]
                     if d["iter"] == it), last_point("main"))

    if "main" in runs and "nomask" in runs:
        # endpoint comparison at the last common eval iteration ...
        it = last_point("nomask")["iter"]
        main_at = main_at_iter(it)
        summary["ablation_occlusion_masks"] = {
            "compared_at_iter": it,
            "epe_all_with_masks": main_at["epe_all"],
            "epe_all_without_masks": at("nomask", "epe_all"),
            "epe_occluded_with_masks": main_at["epe_occluded"],
            "epe_occluded_without_masks": at("nomask", "epe_occluded"),
            # ... plus the full shared trajectory: the mask mechanism's main
            # effect is DURING training (the no-mask run diverges into
            # photometric hallucination before recovering)
            "epe_all_trajectory": [
                {"iter": d["iter"], "with_masks": main_at_iter(d["iter"])["epe_all"],
                 "without_masks": d["epe_all"]}
                for d in runs["nomask"]["eval_points"]
            ],
        }
    if "main" in runs and "fp32" in runs:
        # compare at the f32 run's FINAL point (its held-out eval at its last
        # iteration — mid-run eval points can pre-date a late basin escape)
        fin = runs["fp32"].get("final") or last_point("fp32")
        it = fin.get("iters", fin.get("iter"))
        main_at = main_at_iter(it)
        summary["bf16_vs_f32"] = {
            "compared_at_iter": it,
            "epe_all_bf16": main_at["epe_all"],
            "epe_all_f32": fin["epe_all"],
            "outlier_bf16": main_at["outlier_rate_kitti"],
            "outlier_f32": fin["outlier_rate_kitti"],
        }

    os.makedirs(args.out_dir, exist_ok=True)
    out_json = os.path.join(args.out_dir, args.name + ".json")
    with open(out_json, "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote", out_json)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    zf_drawn = set()
    for name, r in runs.items():
        ev = r["eval_points"]
        if not ev:
            continue
        it = [d["iter"] for d in ev]
        for ax, key, title in zip(
            axes,
            ["epe_all", "epe_occluded", "outlier_rate_kitti"],
            ["EPE (all px)", "EPE (occluded px)", "KITTI outlier rate"],
        ):
            ax.plot(it, [d[key] for d in ev], marker="o", label=name)
            zf = r.get("zero_flow_measured") or {}
            if key in zf and id(ax) not in zf_drawn:
                # the bar every curve must go UNDER to count as "learned"
                ax.axhline(zf[key], color="k", ls="--", lw=1, alpha=0.6,
                           label="zero-flow baseline")
                zf_drawn.add(id(ax))
            ax.set_title(title)
            ax.set_xlabel("iteration")
            ax.grid(True, alpha=0.3)
    axes[0].set_ylabel("px")
    axes[0].legend()
    fig.suptitle("synthetic occlusion-aware EPE: bf16+Pallas production "
                 "recipe, occlusion-mask ablation, f32 pair")
    fig.tight_layout()
    out_png = os.path.join(args.out_dir, "synth_epe_curve.png")
    fig.savefig(out_png, dpi=110)
    print("wrote", out_png)


if __name__ == "__main__":
    main()
