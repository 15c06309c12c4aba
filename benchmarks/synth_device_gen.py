"""On-device (TPU) synthetic snippet generator for the EPE benchmark.

``synthetic_epe.make_snippet`` generates piecewise-motion snippets with the
host's numpy — fine at 64x128 (~25 it/s), but at the production 256x832 a
single snippet costs ~0.4 s of single-core host time, which bounds training
at ~0.3 it/s (the round-4 campaign's workaround, a fixed pregenerated pool,
was shown by its own p10 probes to CAP learning: the net memorizes the pool).

This module is the TPU-native answer: the identical generative process —
multi-octave 1/f-ish texture, integer background translation, an
independently-translating textured foreground rectangle, 3 frames at
t-1/t/t+1 — expressed as a jittable JAX function.  Fresh data every step at
device speed; the host only splits PRNG keys.

Distribution parity with the host generator (same octave mix, same motion /
rectangle bounds, same box smoothing and contrast normalization) is tested in
tests/test_synth_device_gen.py, including the exact-warp invariant: frame t+1
gathered at x + flow_gt equals frame t on non-occluded pixels bit-near-exactly
(motions are integers).

Reference context: the benchmark stands in for the reference's KITTI recipe
(/root/reference/train.py:120-155, config/kitti.yaml) under the no-egress
constraint; the occlusion bands it creates are what the paper's diff-weight
masks (reference model_flow_paper.py:101-134) must gate out.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _texture(key, h, w, octaves, power):
    """Multi-octave texture, device twin of synthetic_epe._texture."""
    t = jnp.zeros((h, w, 3), jnp.float32)
    keys = jax.random.split(key, octaves)
    for o in range(octaves):
        s = 2 ** o
        small = jax.random.uniform(
            keys[o], (h // s + 2, w // s + 2, 3), jnp.float32
        )
        up = jnp.repeat(jnp.repeat(small, s, 0), s, 1)[:h, :w]
        t = t + (s ** power) * up
    # light box smooth (wraparound rolls, same as the host's np.roll)
    t = (
        t
        + jnp.roll(t, 1, 0) + jnp.roll(t, -1, 0)
        + jnp.roll(t, 1, 1) + jnp.roll(t, -1, 1)
    ) / 5.0
    t = t - t.min()
    # clip: f32 rounding can land ~1e-9 outside [0,1] after the divide
    return jnp.clip(t / jnp.maximum(t.max(), 1e-6), 0.0, 1.0)


def _randint(key, lo, hi):
    """Scalar int32 uniform on [lo, hi) — lo/hi may be traced."""
    return jax.random.randint(key, (), lo, hi, jnp.int32)


def make_snippet_device(key, h, w, max_bg=4, max_fg=8, tex_power=0.5):
    """One snippet on device: (3h, w, 3) stacked frames, GT flow, nonocc.

    Matches synthetic_epe.make_snippet's generative process with traced
    randomness: background translates by integer (u_b, v_b) in [-max_bg,
    max_bg], a textured rectangle (rh in [h/4, h/2], rw in [w/6, w/3]) by
    (u_f, v_f) in [-max_fg', max_fg'] where max_fg' = min(max_fg, h//8,
    w//8); the rectangle stays in-frame at every t by construction.
    """
    max_fg = min(max_fg, h // 8, w // 8)
    pad = 2 * max(max_bg, max_fg) + 2
    k_tex, k_fgt, k_mb, k_mf, k_rh, k_rw, k_ry, k_rx = jax.random.split(key, 8)

    big = _texture(k_tex, h + 2 * pad, w + 2 * pad, octaves=6, power=tex_power)
    u_b = _randint(k_mb, -max_bg, max_bg + 1)
    v_b = _randint(jax.random.fold_in(k_mb, 1), -max_bg, max_bg + 1)
    u_f = _randint(k_mf, -max_fg, max_fg + 1)
    v_f = _randint(jax.random.fold_in(k_mf, 1), -max_fg, max_fg + 1)

    rh = _randint(k_rh, h // 4, h // 2 + 1)
    rw = _randint(k_rw, w // 6, w // 3 + 1)
    # fg texture at its maximum extent; the paste mask crops it to (rh, rw)
    fg_tex = _texture(k_fgt, h // 2 + 1, w // 3 + 1, octaves=4, power=tex_power)
    ry = _randint(k_ry, jnp.abs(v_f) + 1, h - rh - jnp.abs(v_f))
    rx = _randint(k_rx, jnp.abs(u_f) + 1, w - rw - jnp.abs(u_f))

    ys, xs = jnp.mgrid[0:h, 0:w]

    def frame_and_mask(k):
        y0 = pad - k * v_b
        x0 = pad - k * u_b
        fr = jax.lax.dynamic_slice(big, (y0, x0, 0), (h, w, 3))
        fy, fx = ry + k * v_f, rx + k * u_f
        m = (ys >= fy) & (ys < fy + rh) & (xs >= fx) & (xs < fx + rw)
        # gather the fg texture at its local coordinates (clipped outside m)
        ly = jnp.clip(ys - fy, 0, h // 2)
        lx = jnp.clip(xs - fx, 0, w // 3)
        fr = jnp.where(m[..., None], fg_tex[ly, lx], fr)
        return fr, m

    frames, fg_masks = zip(*(frame_and_mask(k) for k in (-1, 0, 1)))

    flow_gt = jnp.where(
        fg_masks[1][..., None],
        jnp.stack([u_f, v_f]).astype(jnp.float32),
        jnp.stack([u_b, v_b]).astype(jnp.float32),
    )

    # center pixels whose destination at t+1 is covered by the fg (or leaves
    # the frame) are occluded; fg pixels stay visible by construction
    dst_y = ys + flow_gt[..., 1].astype(jnp.int32)
    dst_x = xs + flow_gt[..., 0].astype(jnp.int32)
    inside = (dst_y >= 0) & (dst_y < h) & (dst_x >= 0) & (dst_x < w)
    covered = (
        fg_masks[2][jnp.clip(dst_y, 0, h - 1), jnp.clip(dst_x, 0, w - 1)]
        & inside
        & ~fg_masks[1]
    )
    nonocc = inside & ~covered

    return jnp.concatenate(frames, axis=0), flow_gt, nonocc


@functools.partial(
    jax.jit, static_argnames=("batch", "h", "w", "max_bg", "max_fg", "tex_power")
)
def make_device_batch(key, batch, h, w, max_bg=4, max_fg=8, tex_power=0.5):
    """(B, 3h, w, 3) fresh snippets + GT flow (B,h,w,2) + nonocc (B,h,w)."""
    keys = jax.random.split(key, batch)
    return jax.vmap(
        lambda k: make_snippet_device(
            k, h, w, max_bg=max_bg, max_fg=max_fg, tex_power=tex_power
        )
    )(keys)
