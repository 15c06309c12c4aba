"""Sintel eval harness on a synthetic MPI-Sintel-layout fixture.

Builds a tiny training/ tree ({clean,final,flow,occlusions}/<scene>/...) with
a known constant GT flow, runs ``test_sintel_flow`` with an inference stub,
and checks the formatted metric string reports the expected EPE.
"""

import os
import types

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from unopticalflow_tpu.evaluation import load_gt_flow_sintel
from unopticalflow_tpu.evaluation.flowlib import write_flow

GT_H, GT_W = 40, 64
IMG_HW = (32, 64)
GT_U, GT_V = 3.0, -1.5


@pytest.fixture(scope="module")
def sintel_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("sintel") / "training"
    rng = np.random.RandomState(0)
    for scene in ("alley_1", "bandage_2"):
        for sub in ("clean", "final", "flow", "occlusions"):
            os.makedirs(root / sub / scene, exist_ok=True)
        for n in (1, 2, 3):
            img = (rng.rand(GT_H, GT_W, 3) * 255).astype(np.uint8)
            for sub in ("clean", "final"):
                cv2.imwrite(str(root / sub / scene / f"frame_{n:04d}.png"), img)
        for n in (1, 2):  # flow for N -> N+1 pairs only
            gt = np.zeros((GT_H, GT_W, 2), np.float32)
            gt[:, :, 0] = GT_U
            gt[:, :, 1] = GT_V
            write_flow(gt, str(root / "flow" / scene / f"frame_{n:04d}.flo"))
            occ = np.zeros((GT_H, GT_W), np.uint8)
            occ[: GT_H // 2] = 255  # top half occluded
            cv2.imwrite(
                str(root / "occlusions" / scene / f"frame_{n:04d}.png"), occ
            )
    return str(root)


def test_load_gt_flow_sintel(sintel_dir):
    gt_flows, noc_masks, pairs = load_gt_flow_sintel(sintel_dir, "clean")
    assert len(gt_flows) == len(noc_masks) == len(pairs) == 4  # 2 scenes x 2
    assert gt_flows[0].shape == (GT_H, GT_W, 3)
    np.testing.assert_allclose(gt_flows[0][:, :, 0], GT_U)
    assert gt_flows[0][:, :, 2].min() == 1.0  # dense validity
    assert noc_masks[0][: GT_H // 2].max() == 0.0  # occluded top half
    assert noc_masks[0][GT_H // 2 :].min() == 1.0
    assert all(os.path.exists(p) for pair in pairs for p in pair)


def test_load_gt_flow_sintel_missing_dir(tmp_path):
    assert load_gt_flow_sintel(str(tmp_path)) == ([], [], [])


@pytest.mark.parametrize("exact", [True, False])
def test_sintel_flow_task_epe(sintel_dir, exact):
    """A stub predicting the exact GT yields EPE 0; a biased one, the bias."""
    import test as test_cli

    test_sintel_flow = test_cli.test_sintel_flow

    h, w = IMG_HW
    # prediction at network resolution whose rescale-to-GT equals GT (+bias):
    # eval_flow_avg scales u by GT_W/img_hw[1], v by GT_H/img_hw[0]
    bias = 0.0 if exact else 2.0
    pred_u = (GT_U + bias) * w / GT_W
    pred_v = (GT_V + bias) * h / GT_H

    def infer(i1, i2):
        # batch-polymorphic like the real jitted inference (test.py batches
        # eval pairs into fixed-shape dispatches)
        out = np.zeros((np.asarray(i1).shape[0], h, w, 2), np.float32)
        out[..., 0] = pred_u
        out[..., 1] = pred_v
        return out

    cfg = types.SimpleNamespace(
        img_hw=IMG_HW, config_file="cfg.yaml", mode="flow", model_dir="/tmp"
    )
    res = test_sintel_flow(cfg, lambda i1, i2: infer(i1, i2), sintel_dir)
    assert set(res) == {"clean", "final"}
    for text in res.values():
        vals = [float(x) for x in text.splitlines()[1].split(",")]
        epe = vals[0]
        want = 0.0 if exact else abs(bias) * np.sqrt(2.0)
        np.testing.assert_allclose(epe, want, atol=1e-4)
