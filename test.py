"""Evaluation CLI — argument surface preserved from the reference.

Usage (same flags as /root/reference/test.py:200-213):
    python test.py -c config/kitti.yaml --mode flow --task kitti_flow \
        --pretrained_model PATH [--result_dir DIR]

Live tasks (matching the reference's actually-working surface, SURVEY.md
§3.2): ``--mode flow`` with ``--task kitti_flow``.  The depth/demo tasks
require an ``infer_depth`` that neither the reference's Model_flow nor this
rebuild has — they raise a clear error instead of the reference's NameError.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from unopticalflow_tpu.utils.config import Config, load_yaml_config, merge_cli_args


def _pair_flow(infer_fn, img_stack):
    """(2H, W, 3) numpy pair stack -> (H, W, 2) numpy flow."""
    import jax.numpy as jnp

    img_h = img_stack.shape[0] // 2
    img1 = jnp.asarray(img_stack[None, :img_h])
    img2 = jnp.asarray(img_stack[None, img_h:])
    flow = infer_fn(img1, img2)
    return np.asarray(flow[0])


def test_kitti_2012(cfg, infer_fn, gt_flows, noc_masks):
    """EPE/outlier eval on KITTI 2012 train (reference test.py:16-41)."""
    from unopticalflow_tpu.data import KITTI_2012
    from unopticalflow_tpu.evaluation import eval_flow_avg

    dataset = KITTI_2012(cfg.gt_2012_dir, img_hw=cfg.img_hw)
    flow_list = [_pair_flow(infer_fn, dataset[i]) for i in range(len(dataset))]
    res = eval_flow_avg(gt_flows, noc_masks, flow_list, cfg, write_img=False)
    print(f"CONFIG: {cfg.config_file}, mode: {cfg.mode}")
    print("[EVAL] [KITTI 2012]")
    print(res)
    return res


def test_kitti_2015(cfg, infer_fn, gt_flows, noc_masks, gt_masks, depth_save_dir=None):
    """EPE/outlier/moving-static eval on KITTI 2015 (reference test.py:43-76)."""
    from unopticalflow_tpu.data import KITTI_2015
    from unopticalflow_tpu.evaluation import eval_flow_avg

    dataset = KITTI_2015(cfg.gt_2015_dir, img_hw=cfg.img_hw)
    flow_list = [_pair_flow(infer_fn, dataset[i]) for i in range(len(dataset))]
    res = eval_flow_avg(
        gt_flows, noc_masks, flow_list, cfg, moving_masks=gt_masks, write_img=False
    )
    print(f"CONFIG: {cfg.config_file}, mode: {cfg.mode}")
    print("[EVAL] [KITTI 2015]")
    print(res)
    return res


def test_single_pair(cfg, infer_fn, img1_path, img2_path, save_dir="./"):
    """Flow demo on one image pair: saves the color-wheel visualization."""
    import cv2

    from unopticalflow_tpu.utils.visualizer import VisualizerDebug

    h, w = cfg.img_hw
    imgs = []
    for p in (img1_path, img2_path):
        img = cv2.imread(p)
        imgs.append(cv2.resize(img, (w, h)).astype(np.float32) / 255.0)
    flow = _pair_flow(infer_fn, np.concatenate(imgs, 0))
    VisualizerDebug(dump_dir=save_dir).save_flow_img(flow, "demo")
    print("Flow prediction saved in " + save_dir)
    return flow


def build_arg_parser():
    p = argparse.ArgumentParser(description="tpu-unflow testing.")
    p.add_argument("-c", "--config_file", default=None)
    p.add_argument("-g", "--gpu", type=str, default="0",
                   help="accepted for reference-CLI compatibility.")
    p.add_argument("--mode", type=str, default="flow")
    p.add_argument("--task", type=str, default="kitti_flow",
                   help="kitti_flow | demo (flow pair)")
    p.add_argument("--image_path", type=str, default=None)
    p.add_argument("--image_path2", type=str, default=None)
    p.add_argument("--pretrained_model", type=str, default=None)
    p.add_argument("--result_dir", type=str, default=None)
    p.add_argument("--precision", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--pallas_corr", type=str, default="auto",
                   choices=["auto", "on", "off"])
    return p


if __name__ == "__main__":
    args = build_arg_parser().parse_args()
    if not args.config_file or not os.path.exists(args.config_file):
        raise ValueError("config file not found.")
    cfg_dict = load_yaml_config(args.config_file)
    cfg_dict["model_dir"] = args.result_dir
    cfg = merge_cli_args(cfg_dict, args)

    import jax

    from unopticalflow_tpu.evaluation import load_gt_flow_kitti, load_gt_mask
    from unopticalflow_tpu.models import FlowModelConfig, get_model, inference_flow
    from unopticalflow_tpu.utils import checkpoint as ckpt

    if args.mode != "flow":
        raise ValueError(
            f"mode '{args.mode}' is not runnable: the reference's depth/"
            "flowposenet classes do not exist (its test.py:236-242 raises "
            "NameError) — only --mode flow is supported."
        )

    from unopticalflow_tpu.utils.platform import resolve_pallas

    use_pallas = resolve_pallas(args.pallas_corr)
    model_cfg = FlowModelConfig(
        num_scales=cfg.num_scales,
        compute_dtype=args.precision,
        use_pallas_corr=use_pallas,
    )
    params = get_model("flow")(jax.random.PRNGKey(0))
    if args.pretrained_model:
        _, params = ckpt.load_pretrained(args.pretrained_model, params)
        print("Model Loaded.")

    infer = jax.jit(lambda i1, i2: inference_flow(params, model_cfg, i1, i2))

    if args.task == "kitti_flow":
        gt_flows_2015, noc_masks_2015 = load_gt_flow_kitti(cfg.gt_2015_dir, "kitti_2015")
        gt_masks_2015 = load_gt_mask(cfg.gt_2015_dir)
        test_kitti_2015(cfg, infer, gt_flows_2015, noc_masks_2015, gt_masks_2015)
    elif args.task == "demo":
        if not (args.image_path and args.image_path2):
            raise ValueError("--task demo needs --image_path and --image_path2")
        test_single_pair(
            cfg, infer, args.image_path, args.image_path2,
            save_dir=args.result_dir or "./",
        )
    else:
        raise ValueError(
            f"task '{args.task}' requires depth inference, which no model in "
            "the reference repo implements (SURVEY.md §3.2)."
        )
