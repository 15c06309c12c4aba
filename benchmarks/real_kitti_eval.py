"""Real-data KITTI EPE in one command — the accuracy north star.

The reference's reason to exist is KITTI 2012 train EPE 2.67 / KITTI 2015
train EPE 7.1 (/root/reference/README.md:6-10, recipe config/kitti.yaml).
This host has no KITTI data and no published checkpoint (zero egress), so the
committed proxy is benchmarks/PARITY.md (bit-parity vs the actual reference
implementation).  The moment an egress-capable host exists, THIS script turns
(KITTI 2012/2015 dirs + a ``.pth`` or ``.ckpt``) into the two EPE numbers
with zero edits:

    python benchmarks/real_kitti_eval.py \
        --pretrained_model checkpoints/last.pth \
        --gt_2012_dir /data/kitti_2012/training \
        --gt_2015_dir /data/kitti_2015/training

See benchmarks/real_kitti_eval.md for the full runbook (downloads, layout,
expected output).  ``--limit N`` restricts both benchmarks to their first N
frames — used by the CI smoke test (tests/test_eval.py) against synthetic
fixtures; leave unset for the real numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_epe(result_str: str) -> dict:
    """Parse eval_flow_avg's formatted table (header row, value row)."""
    lines = [ln for ln in result_str.strip().splitlines() if ln.strip()]
    header = [h.strip() for h in lines[0].split(",")]
    vals = [float(v) for v in lines[1].split(",")]
    return dict(zip(header, vals))


def run_eval(
    pretrained_model: str | None,
    gt_2012_dir: str | None,
    gt_2015_dir: str | None,
    img_hw=(256, 832),
    limit: int | None = None,
    precision: str = "float32",
    pallas_corr: str = "auto",
) -> dict:
    """Evaluate a checkpoint on KITTI 2012 and/or 2015; returns metrics."""
    import jax

    from unopticalflow_tpu.data import KITTI_2012, KITTI_2015
    from unopticalflow_tpu.models import (
        FlowModelConfig,
        get_model,
        inference_flow,
    )
    from unopticalflow_tpu.utils import checkpoint as ckpt
    from unopticalflow_tpu.utils.platform import resolve_pallas

    model_cfg = FlowModelConfig(
        num_scales=3,
        compute_dtype=precision,
        use_pallas_corr=resolve_pallas(pallas_corr),
    )
    params = get_model("flow")(jax.random.PRNGKey(0))
    if pretrained_model:
        _, params = ckpt.load_pretrained(pretrained_model, params)
        print(f"loaded {pretrained_model}")
    else:
        print("WARNING: no --pretrained_model; evaluating a RANDOM INIT "
              "(only meaningful as a pipeline smoke test)")

    infer = jax.jit(lambda i1, i2: inference_flow(params, model_cfg, i1, i2))

    results: dict = {"img_hw": list(img_hw), "checkpoint": pretrained_model}
    # the eval helpers construct the dataset classes themselves, so a frame
    # limit can only be injected via the class attribute — restore it in the
    # finally below so later constructions in the same process see the full
    # 194/200-frame defaults
    saved_totals = (KITTI_2012.num_total, KITTI_2015.num_total)
    if limit is not None:
        KITTI_2012.num_total = limit
        KITTI_2015.num_total = limit
    try:
        return _run_eval_inner(
            results, infer, img_hw, gt_2012_dir, gt_2015_dir, limit
        )
    finally:
        KITTI_2012.num_total, KITTI_2015.num_total = saved_totals


def _run_eval_inner(results, infer, img_hw, gt_2012_dir, gt_2015_dir, limit):
    from test import test_kitti_2012, test_kitti_2015
    from unopticalflow_tpu.evaluation import load_gt_flow_kitti, load_gt_mask

    if gt_2012_dir:
        cfg12 = types.SimpleNamespace(
            img_hw=tuple(img_hw), gt_2012_dir=gt_2012_dir,
            config_file="(real_kitti_eval)", mode="flow", model_dir=".",
        )
        gt_flows, noc_masks = load_gt_flow_kitti(
            gt_2012_dir, "kitti_2012", num_gt=limit
        )
        res12 = test_kitti_2012(cfg12, infer, gt_flows, noc_masks)
        results["kitti_2012"] = parse_epe(res12)
        results["kitti_2012_str"] = res12

    if gt_2015_dir:
        cfg15 = types.SimpleNamespace(
            img_hw=tuple(img_hw), gt_2015_dir=gt_2015_dir,
            config_file="(real_kitti_eval)", mode="flow", model_dir=".",
        )
        gt_flows, noc_masks = load_gt_flow_kitti(
            gt_2015_dir, "kitti_2015", num_gt=limit
        )
        gt_masks = load_gt_mask(gt_2015_dir, num_gt=limit or 200)
        res15 = test_kitti_2015(cfg15, infer, gt_flows, noc_masks, gt_masks)
        results["kitti_2015"] = parse_epe(res15)
        results["kitti_2015_str"] = res15

    return results


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--pretrained_model", default=None,
                   help=".ckpt (native) or .pth (reference) checkpoint")
    p.add_argument("--gt_2012_dir", default=None,
                   help="KITTI 2012 training/ dir (image_2 + flow_occ/noc + "
                        "calib_cam_to_cam)")
    p.add_argument("--gt_2015_dir", default=None,
                   help="KITTI 2015 training/ dir (image_2 + flow_occ/noc + "
                        "obj_map)")
    p.add_argument("--img_hw", type=int, nargs=2, default=(256, 832))
    p.add_argument("--limit", type=int, default=None,
                   help="evaluate only the first N frames (smoke tests)")
    p.add_argument("--precision", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--pallas_corr", default="auto",
                   choices=["auto", "on", "off"])
    p.add_argument("--out_json", default=None,
                   help="also write the metrics dict to this path")
    args = p.parse_args(argv)
    if not (args.gt_2012_dir or args.gt_2015_dir):
        p.error("need --gt_2012_dir and/or --gt_2015_dir")

    results = run_eval(
        args.pretrained_model, args.gt_2012_dir, args.gt_2015_dir,
        img_hw=tuple(args.img_hw), limit=args.limit,
        precision=args.precision, pallas_corr=args.pallas_corr,
    )
    line = {
        k: results.get(k, {}).get("epe")
        for k in ("kitti_2012", "kitti_2015")
        if k in results
    }
    line["reference_targets"] = {"kitti_2012": 2.67, "kitti_2015": 7.1}
    print(json.dumps(line))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
