"""Produce the committed reference-parity artifact (benchmarks/PARITY.md).

Runs, at the full KITTI resolution (256x832):
  1. inference parity: random-init params -> torch state dict -> the ACTUAL
     reference Model_flow (from /root/reference, with its torch-1.2
     grid_sample default restored) vs this framework's inference_flow;
  2. loss-pack parity on a 3-frame snippet;
  3. eval-string byte parity: identical synthetic predictions + KITTI-format
     GT through the reference's eval_flow_avg and ours.

Writes max-abs-error / EPE-vs-reference numbers to benchmarks/PARITY.md.
Run on CPU: PYTHONPATH=. python benchmarks/reference_parity.py
"""

import os
import sys
import types

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def patched_reference():
    import torch

    for name in ("png", "skimage", "skimage.io"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.path.insert(0, "/root/reference")
    torch.Tensor.get_device = lambda self: self.device
    orig_gs = torch.nn.functional.grid_sample

    def gs12(input, grid, mode="bilinear", padding_mode="zeros", align_corners=None):
        return orig_gs(input, grid, mode=mode, padding_mode=padding_mode,
                       align_corners=True if align_corners is None else align_corners)

    torch.nn.functional.grid_sample = gs12
    from core.networks.model_flow_paper import Model_flow
    from core.evaluation.evaluate_flow import eval_flow_avg

    return Model_flow, eval_flow_avg


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import torch

    from unopticalflow_tpu.models import FlowModelConfig, forward, inference_flow, init_flow_model
    from unopticalflow_tpu.utils.torch_convert import params_to_torch_state_dict

    Model_flow, ref_eval_flow_avg = patched_reference()

    h, w = 256, 832
    rng = np.random.RandomState(0)
    params = init_flow_model(jax.random.PRNGKey(0))
    cfg = FlowModelConfig(num_scales=3)

    ref_cfg = types.SimpleNamespace(mode="flow", dataset="kitti_depth",
                                    num_scales=3, h_flow_consist_alpha=3,
                                    h_flow_consist_beta=0.05)
    model = Model_flow(ref_cfg)
    model.load_state_dict({k: torch.from_numpy(np.asarray(v)) for k, v in
                           params_to_torch_state_dict(params).items()}, strict=True)
    model.eval()

    lines = ["# Reference parity report (full KITTI resolution)", ""]
    lines.append("Oracle = the ACTUAL reference implementation imported from "
                 "/root/reference (torch-1.2 grid_sample default restored), "
                 "fed identical weights through utils/torch_convert.  "
                 "Random-init weights; shapes 256x832.")
    lines.append("")

    # 1. inference parity
    img1 = rng.rand(1, h, w, 3).astype(np.float32)
    img2 = rng.rand(1, h, w, 3).astype(np.float32)
    got = np.asarray(inference_flow(params, cfg, jnp.asarray(img1), jnp.asarray(img2)))
    with torch.no_grad():
        want = model.inference_flow(
            torch.from_numpy(img1.transpose(0, 3, 1, 2)),
            torch.from_numpy(img2.transpose(0, 3, 1, 2)),
        ).numpy().transpose(0, 2, 3, 1)
    epe = np.sqrt(((got - want) ** 2).sum(-1)).mean()
    lines.append(f"## 1. inference_flow parity @ {h}x{w}")
    lines.append(f"- mean EPE vs reference: **{epe:.2e} px**")
    lines.append(f"- max abs component diff: {np.abs(got - want).max():.2e} px "
                 f"(flow magnitude range {np.abs(want).max():.1f} px)")
    assert epe < 1e-2, epe

    # 2. loss-pack parity
    images = rng.rand(1, 3 * h, w, 3).astype(np.float32)
    pack = forward(params, cfg, jnp.asarray(images))
    with torch.no_grad():
        ref_pack = model(torch.from_numpy(images.transpose(0, 3, 1, 2)))
    lines.append("")
    lines.append(f"## 2. training loss pack parity @ {h}x{w}")
    for k in sorted(pack):
        a = float(np.asarray(pack[k])[0])
        b = float(ref_pack[k].numpy()[0])
        rel = abs(a - b) / max(abs(b), 1e-12)
        lines.append(f"- {k}: ours {a:.6f} vs reference {b:.6f} (rel {rel:.2e})")
        assert rel < 5e-3, (k, a, b)

    # 3. eval-string byte parity
    from unopticalflow_tpu.evaluation.evaluate_flow import eval_flow_avg

    gt_flows, noc, preds, moving = [], [], [], []
    for _ in range(8):
        gh, gw = 375, 1242
        gt = np.zeros((gh, gw, 3), np.float32)
        gt[:, :, :2] = rng.uniform(-30, 30, (gh, gw, 2))
        gt[:, :, 2] = (rng.rand(gh, gw) > 0.3).astype(np.float32)
        gt_flows.append(gt)
        noc.append(gt[:, :, 2] * (rng.rand(gh, gw) > 0.4))
        preds.append(rng.uniform(-30, 30, (h, w, 2)).astype(np.float32))
        moving.append((rng.rand(gh, gw) > 0.5).astype(np.float32))
    ecfg = types.SimpleNamespace(img_hw=(h, w), model_dir="/tmp")
    ours = eval_flow_avg(gt_flows, noc, preds, ecfg, moving_masks=moving)
    ref = ref_eval_flow_avg(gt_flows, noc, preds, ecfg, moving_masks=moving)
    lines.append("")
    lines.append("## 3. KITTI eval metric-string byte parity (375x1242 GT)")
    lines.append(f"- byte-identical: **{ours == ref}**")
    lines.append("```")
    lines.append(ours.rstrip())
    lines.append("```")
    assert ours == ref

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "PARITY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
