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


def _batched_flows(infer_fn, stacks_iter, n, batch=8):
    """All pair flows as a list, batched into fixed-shape dispatches.

    The reference evaluates one image at a time (test.py:16-76); here chunks
    of ``batch`` pairs share one dispatch of a single compiled shape (the
    last chunk pads by repetition and drops the extras).  On a remote/
    tunneled runtime each dispatch pays a host round trip, so this is ~8x
    fewer round trips; on any backend it amortizes dispatch overhead and
    fills the MXU batch dimension.
    """
    import jax.numpy as jnp

    it = iter(stacks_iter)
    flows = []
    done = 0
    while done < n:
        stacks = [np.asarray(next(it)) for _ in range(min(batch, n - done))]
        k = len(stacks)
        if k < batch:
            stacks += [stacks[-1]] * (batch - k)
        arr = np.stack(stacks)  # (B, 2H, W, 3)
        img_h = arr.shape[1] // 2
        out = infer_fn(jnp.asarray(arr[:, :img_h]), jnp.asarray(arr[:, img_h:]))
        flows.extend(np.asarray(out[:k]))
        done += k
    return flows


def test_kitti_2012(cfg, infer_fn, gt_flows, noc_masks):
    """EPE/outlier eval on KITTI 2012 train (reference test.py:16-41)."""
    from unopticalflow_tpu.data import KITTI_2012
    from unopticalflow_tpu.evaluation import eval_flow_avg

    dataset = KITTI_2012(cfg.gt_2012_dir, img_hw=cfg.img_hw)
    flow_list = _batched_flows(
        infer_fn, (dataset[i] for i in range(len(dataset))), len(dataset)
    )
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
    flow_list = _batched_flows(
        infer_fn, (dataset[i] for i in range(len(dataset))), len(dataset)
    )
    res = eval_flow_avg(
        gt_flows, noc_masks, flow_list, cfg, moving_masks=gt_masks, write_img=False
    )
    print(f"CONFIG: {cfg.config_file}, mode: {cfg.mode}")
    print("[EVAL] [KITTI 2015]")
    print(res)
    return res


def test_sintel_flow(cfg, infer_fn, sintel_dir, passes=("clean", "final")):
    """EPE eval on the MPI-Sintel training set, per render pass.

    Completes the Sintel surface the reference leaves open (it trains on
    sintel_raw but ships no Sintel eval); uses the same vector-rescale +
    cv2.resize + EPE pipeline as the KITTI tasks (eval_flow_avg).  Images are
    read with cv2 (BGR) to match the training preprocessing.
    """
    import cv2

    from unopticalflow_tpu.evaluation import eval_flow_avg, load_gt_flow_sintel

    h, w = cfg.img_hw
    results = {}
    for pass_name in passes:
        gt_flows, noc_masks, pairs = load_gt_flow_sintel(sintel_dir, pass_name)
        if not gt_flows:
            print(f"[EVAL] [SINTEL {pass_name}] no frames found, skipping")
            continue
        def stacks():
            for p1, p2 in pairs:
                imgs = [
                    cv2.resize(cv2.imread(p), (w, h)).astype(np.float32) / 255.0
                    for p in (p1, p2)
                ]
                yield np.concatenate(imgs, 0)

        flow_list = _batched_flows(infer_fn, stacks(), len(pairs))
        res = eval_flow_avg(gt_flows, noc_masks, flow_list, cfg, write_img=False)
        print(f"CONFIG: {cfg.config_file}, mode: {cfg.mode}")
        print(f"[EVAL] [SINTEL {pass_name}] ({len(flow_list)} pairs)")
        print(res)
        results[pass_name] = res
    return results


def test_kitti_odo(cfg, pose_fn, seq_dir, result_txt):
    """PoseNet odometry over an image sequence -> KITTI-format pose file.

    Chains per-pair relative poses (``pose_fn(img_t, img_t+1)`` maps frame
    t+1 camera points into frame t, ops/geometry.py::pose_vec2mat) into
    camera-to-world matrices and writes one 3x4 row-major line per frame —
    the format ``evaluation/eval_odom.py --result_txt`` consumes.  Relative
    translations are written RAW: monocular scale is ONE global unknown, and
    eval_odom's Umeyama Sim(3) alignment recovers exactly that global factor;
    per-frame unit-norming (an earlier revision) destroys the inter-frame
    scale *ratios* the network does estimate and caps trajectory accuracy.
    """
    import cv2

    import numpy as np

    from unopticalflow_tpu.ops.geometry import pose_vec2mat

    img_dir = os.path.join(seq_dir, "image_2")
    if not os.path.isdir(img_dir):
        img_dir = seq_dir
    names = sorted(
        n for n in os.listdir(img_dir) if n.endswith((".png", ".jpg"))
    )
    if len(names) < 2:
        raise ValueError(f"need >= 2 frames in {img_dir}")
    h, w = cfg.img_hw

    def load(n):
        img = cv2.imread(os.path.join(img_dir, n))
        return cv2.resize(img, (w, h)).astype(np.float32)[None] / 255.0

    t_wc = np.eye(4)
    lines = [" ".join(f"{v:.6e}" for v in t_wc[:3].reshape(-1))]
    prev = load(names[0])
    for n in names[1:]:
        cur = load(n)
        pose = np.asarray(pose_fn(prev, cur))  # (1, 6), cam_cur -> cam_prev
        rel = np.eye(4)
        rel[:3] = np.asarray(pose_vec2mat(pose))[0]
        t_wc = t_wc @ rel
        lines.append(" ".join(f"{v:.6e}" for v in t_wc[:3].reshape(-1)))
        prev = cur
    os.makedirs(os.path.dirname(os.path.abspath(result_txt)), exist_ok=True)
    with open(result_txt, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"odometry: {len(lines)} poses -> {result_txt}")
    print("evaluate with: python -m unopticalflow_tpu.evaluation.eval_odom "
          f"--gt_txt <gt poses> --result_txt {result_txt}")
    return result_txt


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
                   help="kitti_flow | sintel_flow | demo (flow pair) | "
                        "export_pth (write a reference-loadable .pth)")
    p.add_argument("--output_pth", type=str, default=None,
                   help="output path for --task export_pth")
    p.add_argument("--sintel_dir", type=str, default=None,
                   help="MPI-Sintel training/ dir for --task sintel_flow "
                        "(defaults to the yaml's sintel_training_dir)")
    p.add_argument("--seq_dir", type=str, default=None,
                   help="odometry sequence dir (with image_2/) for "
                        "--task kitti_odo")
    p.add_argument("--result_txt", type=str, default=None,
                   help="output pose file for --task kitti_odo")
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

    if args.mode not in ("flow", "flowposenet"):
        raise ValueError(
            f"mode '{args.mode}' is not runnable: the reference's depth "
            "classes do not exist (its test.py:236-242 raises NameError) — "
            "only --mode flow / flowposenet are supported.  To evaluate an "
            "external depth model against the reference protocols, use "
            "unopticalflow_tpu.evaluation.depth_harness "
            "(test_eigen_depth / test_nyu / test_single_image)."
        )

    from unopticalflow_tpu.utils.platform import resolve_pallas

    use_pallas = resolve_pallas(args.pallas_corr)
    model_cfg = FlowModelConfig(
        num_scales=cfg.num_scales,
        compute_dtype=args.precision,
        use_pallas_corr=use_pallas,
    )
    params = get_model(args.mode)(jax.random.PRNGKey(0))
    ckpt_iteration = 0
    if args.pretrained_model:
        ckpt_iteration, params = ckpt.load_pretrained(args.pretrained_model, params)
        print("Model Loaded.")

    flow_params = params["flow"] if args.mode == "flowposenet" else params

    if args.task == "export_pth":
        # Interop exit ramp: a checkpoint trained here loads into the
        # reference's Model_flow with strict=True (reverse of .pth ingestion).
        from unopticalflow_tpu.utils.torch_convert import export_torch_checkpoint

        out = args.output_pth or os.path.join(
            args.result_dir or ".", "exported_model.pth"
        )
        export_torch_checkpoint(out, flow_params, iteration=ckpt_iteration)
        print(f"wrote reference-format checkpoint: {out}")
        raise SystemExit(0)

    infer = jax.jit(lambda i1, i2: inference_flow(flow_params, model_cfg, i1, i2))

    if args.task == "kitti_flow":
        gt_flows_2015, noc_masks_2015 = load_gt_flow_kitti(cfg.gt_2015_dir, "kitti_2015")
        gt_masks_2015 = load_gt_mask(cfg.gt_2015_dir)
        test_kitti_2015(cfg, infer, gt_flows_2015, noc_masks_2015, gt_masks_2015)
    elif args.task == "kitti_odo":
        if args.mode != "flowposenet":
            raise ValueError("--task kitti_odo needs --mode flowposenet")
        if not args.seq_dir:
            raise ValueError("--task kitti_odo needs --seq_dir")
        from unopticalflow_tpu.models import inference_pose

        pose_fn = jax.jit(
            lambda i1, i2: inference_pose(params, model_cfg, i1, i2)
        )
        out = args.result_txt or os.path.join(
            args.result_dir or ".", "odometry_result.txt"
        )
        test_kitti_odo(cfg, pose_fn, args.seq_dir, out)
    elif args.task == "sintel_flow":
        sintel_dir = args.sintel_dir or cfg.get("sintel_training_dir")
        if not sintel_dir:
            raise ValueError(
                "--task sintel_flow needs --sintel_dir or a "
                "sintel_training_dir yaml key"
            )
        test_sintel_flow(cfg, infer, sintel_dir)
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
            "the reference repo implements (SURVEY.md §3.2).  The working "
            "eval harnesses for any external depth callable live in "
            "unopticalflow_tpu.evaluation.depth_harness."
        )
