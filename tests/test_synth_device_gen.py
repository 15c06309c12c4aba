"""On-device synthetic snippet generator (benchmarks/synth_device_gen.py).

The generator exists so 256x832 campaign legs can train on FRESH data at
device speed (the 1-core host's numpy generator costs ~0.4 s/snippet there,
and the round-4 fixed-pool workaround capped learning).  These tests pin the
generative process to the host generator's spec.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from benchmarks.synth_device_gen import make_device_batch  # noqa: E402
from benchmarks.synthetic_epe import make_batch  # noqa: E402

H, W = 64, 128


@pytest.fixture(scope="module")
def batch():
    import jax

    return tuple(
        np.asarray(x)
        for x in make_device_batch(
            jax.random.PRNGKey(7), 6, H, W, max_bg=2, max_fg=4
        )
    )


def test_shapes_and_range(batch):
    stacked, flow, nonocc = batch
    assert stacked.shape == (6, 3 * H, W, 3)
    assert flow.shape == (6, H, W, 2)
    assert nonocc.shape == (6, H, W)
    assert stacked.dtype == np.float32
    assert 0.0 <= stacked.min() and stacked.max() <= 1.0
    # textures are contrast-normalized per frame source: real spread
    assert stacked.std() > 0.05


def test_motion_bounds_and_regions(batch):
    stacked, flow, nonocc = batch
    assert np.all(flow == np.round(flow))  # integer motions
    bg = flow[:, :1, :1]  # corner is always background
    assert np.abs(bg).max() <= 2
    assert np.abs(flow).max() <= 4
    fg_frac = (np.abs(flow - bg).max(-1) > 0).mean(axis=(1, 2))
    # rect extent: rh in [H/4, H/2], rw in [W/6, W/3] => area in [1/24, 1/6]
    # (zero only if fg motion == bg motion, possible but rare across 6)
    assert fg_frac.max() <= 1 / 6 + 1e-6
    assert fg_frac.sum() > 0


def test_exact_warp_invariant(batch):
    """frame_{t+1}[p + flow(p)] == frame_t[p] exactly on non-occluded px.

    Motions are integers and all three frames crop the SAME smoothed
    texture, so the forward-warp equality is bit-near-exact — the strongest
    possible pin on offsets/masks/occlusion bookkeeping.
    """
    stacked, flow, nonocc = batch
    ys, xs = np.mgrid[0:H, 0:W]
    for i in range(len(stacked)):
        f_t = stacked[i, H : 2 * H]
        f_n = stacked[i, 2 * H :]
        dy = ys + flow[i, ..., 1].astype(int)
        dx = xs + flow[i, ..., 0].astype(int)
        ok = nonocc[i]
        np.testing.assert_allclose(
            f_n[dy[ok], dx[ok]], f_t[ok], rtol=0, atol=1e-6
        )
        # occluded bg pixels land ON the moved fg rect: values must differ
        occ = ~ok & (dy >= 0) & (dy < H) & (dx >= 0) & (dx < W)
        if occ.any():
            diff = np.abs(f_n[dy[occ], dx[occ]] - f_t[occ]).max(-1)
            assert (diff > 1e-4).mean() > 0.5


def test_distribution_matches_host_generator():
    """Device and host generators sample the same distribution family."""
    import jax

    dev = np.asarray(
        make_device_batch(jax.random.PRNGKey(3), 8, H, W, max_bg=2, max_fg=4)[0]
    )
    host = make_batch(
        np.random.RandomState(3), 8, H, W, max_bg=2, max_fg=4
    )[0]
    # same support and similar first/second moments (texture pipeline parity)
    assert abs(dev.mean() - host.mean()) < 0.05
    assert abs(dev.std() - host.std()) < 0.04
