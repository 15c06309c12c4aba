"""Generator invariants for the synthetic occlusion benchmark.

benchmarks/synthetic_epe.py is the framework's strongest locally-runnable
accuracy evidence (piecewise motion + real occlusions, analytic GT); these
tests pin the generator's contract so the on-chip benchmark numbers stay
meaningful: GT flow must be photometrically exact on non-occluded pixels and
every snippet must actually contain occlusion.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmarks"))

from synthetic_epe import make_batch, make_snippet  # noqa: E402


def test_gt_flow_is_photometrically_exact_on_nonoccluded():
    rng = np.random.RandomState(7)
    for _ in range(10):
        h, w = 64, 96
        stacked, gt, noc = make_snippet(rng, h, w)
        f1, f2 = stacked[h : 2 * h], stacked[2 * h :]
        ys, xs = np.mgrid[0:h, 0:w]
        ty = ys + gt[..., 1].astype(int)
        tx = xs + gt[..., 0].astype(int)
        m = noc & (ty >= 0) & (ty < h) & (tx >= 0) & (tx < w)
        assert m.any()
        assert np.abs(f1[m] - f2[ty[m], tx[m]]).max() < 1e-6


def test_snippets_contain_occlusion_and_two_motions():
    rng = np.random.RandomState(0)
    occ_fracs = []
    n_two_motion = 0
    for _ in range(20):
        _, gt, noc = make_snippet(rng, 96, 192)
        occ_fracs.append(1.0 - noc.mean())
        if len(np.unique(gt.reshape(-1, 2), axis=0)) > 1:
            n_two_motion += 1
    # occlusion must exist on average (bands where bg gets covered)
    assert np.mean(occ_fracs) > 0.01
    # nearly every snippet has distinct fg/bg motion
    assert n_two_motion >= 15


def test_linear_motion_across_the_three_frames():
    # frame t-1 -> t must obey the same GT flow as t -> t+1
    rng = np.random.RandomState(3)
    h, w = 64, 96
    stacked, gt, _ = make_snippet(rng, h, w)
    f0, f1 = stacked[:h], stacked[h : 2 * h]
    ys, xs = np.mgrid[0:h, 0:w]
    # for the BACKWARD pair the center content at (y,x) came from
    # (y - v, x - u) in f0; check bg-region pixels far from the rectangle
    bg = np.linalg.norm(gt - gt[:1, :1], axis=-1) == 0
    sy = ys - gt[..., 1].astype(int)
    sx = xs - gt[..., 0].astype(int)
    m = bg & (sy >= 0) & (sy < h) & (sx >= 0) & (sx < w)
    # exclude pixels whose source in f0 was covered by the rectangle there
    diff = np.abs(f1[m] - f0[sy[m], sx[m]])
    # the vast majority must match exactly (only fg-covered sources differ)
    assert (diff.max(axis=-1) < 1e-6).mean() > 0.9


def test_batch_shapes():
    rng = np.random.RandomState(1)
    stacked, gt, noc = make_batch(rng, 3, 32, 64)
    assert stacked.shape == (3, 96, 64, 3)
    assert gt.shape == (3, 32, 64, 2)
    assert noc.shape == (3, 32, 64)
    assert stacked.dtype == np.float32
