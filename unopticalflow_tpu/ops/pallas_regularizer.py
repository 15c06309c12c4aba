"""Fused smoothness + consistency regularizer kernel (one pass per scale).

Reference semantics being fused (model_flow_paper.py:152-195):

    smooth  (per packed half d):  sum wx[.,j+1] |dx2(f_d/20)| over j in
            [0, W-3] and sum wy[i+1,.] |dy2(f_d/20)| over i in [0, H-3],
            with wx/wy = exp(-10 mean_c |grad img|) — the caller divides by
            the reference's mean denominators and by 2;
    consis  (fwd half only):      sum |n(f_fwd) + n(f_bwd)| * (1 - w_fwd),
            n(f) = f / (sqrt(f.f + 1e-24) + 1e-12), bwd detached.

The XLA composition walks several full-resolution f32 tensors per scale for
these terms plus their transposes in the backward; here the stencils live in
VMEM row-tiles (two-consecutive-blocks halo trick, ops/pallas_kernels.py) and
only five per-sample partial sums leave the forward kernel.

Differentiability: flows only.  The image (edge weights) is a stop-gradient
pyramid and the occlusion weights are detached by reference semantics, so the
hand VJP emits d(flow_bwd), d(flow_fwd):

    d/dg of sum w |D2 g|  =  D2^T (w sign(D2 g))        (zero-padded shifts)
    d/df of |n_f + n_b| occ = occ [ sgn(r)/(N+e) - f (sgn(r).f)/(N (N+e)^2) ]

with D2 the 1-D (+1, -2, +1) second-difference stencil and N = ||f||.

Layout: channel-major (B, C, H, W), W in lanes.  Grid (B, H/TILE_H); the fwd
flow rides block index maps offset by B so one grid visits both packed halves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_H = 8
_EPS_N = 1e-12


def _window(a_ref, b_ref, rows: int, tile_h: int):
    a = a_ref[0]
    if rows <= tile_h:
        return a[:, :rows]
    b = b_ref[0]
    return jnp.concatenate([a, b[:, : rows - tile_h]], axis=1)


def _edge_w(im_pair_a, im_pair_b):
    """exp(-10 mean_c |a - b|) of two (3, R, W) image slices -> (R, W)."""
    return jnp.exp(-10.0 * jnp.mean(jnp.abs(im_pair_a - im_pair_b), axis=0))


def _shift_right(x, k):
    """Zero-fill lane shift: out[..., j] = x[..., j-k]."""
    if k == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (k, 0)))[:, :, : x.shape[-1]]


def _smooth_terms(g, img, row0, h_img):
    """Forward smoothness partial sums of one half over the center rows.

    g: (2, TH+4, W) flow/20 window (rows [t0-2, t0+TH+2), zero outside img);
    img: (3, TH+4, W) matching image window; row0 = t0 (global row of the
    first CENTER row).  Returns (S_x, S_y) scalars for rows [t0, t0+TH).
    """
    th = g.shape[1] - 4
    w = g.shape[-1]
    cc = slice(2, th + 2)

    gc = g[:, cc]  # (2, TH, W)
    dx2 = gc[:, :, 2:] - 2.0 * gc[:, :, 1:-1] + gc[:, :, :-2]  # (2, TH, W-2)
    imc = img[:, cc]
    wx = _edge_w(imc[:, :, 1:], imc[:, :, :-1])  # (TH, W-1), col j = edge j->j+1
    s_x = jnp.sum(wx[:, 1 : w - 1] * jnp.sum(jnp.abs(dx2), axis=0))

    # y stencil for term rows i = t0 + il, il in [0, TH): g rows il+2..il+4
    dy2 = g[:, 4 : th + 4] - 2.0 * g[:, 3 : th + 3] + g[:, 2 : th + 2]
    wy = _edge_w(img[:, 4 : th + 4], img[:, 3 : th + 3])  # wy[i+1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (th, w), 0) + jnp.int32(row0)
    ymask = (row_ids <= h_img - 3).astype(jnp.float32)
    s_y = jnp.sum(ymask * wy * jnp.sum(jnp.abs(dy2), axis=0))
    return s_x, s_y


def _smooth_dflow(g, img, row0, h_img, cot_x, cot_y):
    """d(sum cot_x S_x + cot_y S_y)/d g for the center rows -> (2, TH, W).

    The x-stencil runs over the FULL (TH+4)-row window and row-slices at the
    end: lane pads of a row-sliced operand carry a sublane vpad offset that
    Mosaic's concat lowering rejects ("offset mismatch on non-concat
    dimension"); at offset 0 the same pad lowers fine.
    """
    th = g.shape[1] - 4
    w = g.shape[-1]
    cc = slice(2, th + 2)

    dx2w = g[:, :, 2:] - 2.0 * g[:, :, 1:-1] + g[:, :, :-2]  # (2, TH+4, W-2)
    wxw = _edge_w(img[:, :, 1:], img[:, :, :-1])  # (TH+4, W-1)
    # sx[., j] = wx[., j+1] sign(dx2[., j]) on lanes [0, W-3], zero beyond.
    # (slice-then-expand: wx[None, :, sl] lowers to a Mosaic-rejected gather)
    sxw = jnp.pad(
        jnp.sign(dx2w) * wxw[:, 1 : w - 1][None], ((0, 0), (0, 0), (0, 2))
    )
    dgx_w = sxw - 2.0 * _shift_right(sxw, 1) + _shift_right(sxw, 2)
    dgx = dgx_w[:, cc]

    # sy over term rows i = t0 - 2 + il, il in [0, TH+2)
    dy2w = g[:, 2 : th + 4] - 2.0 * g[:, 1 : th + 3] + g[:, 0 : th + 2]
    wyw = _edge_w(img[:, 2 : th + 4], img[:, 1 : th + 3])  # wy[i+1]
    rw = th + 2
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rw, w), 0) + jnp.int32(row0) - 2
    ymask = ((row_ids >= 0) & (row_ids <= h_img - 3)).astype(jnp.float32)
    sy = jnp.sign(dy2w) * (wyw * ymask)[None]  # (2, TH+2, W)
    dgy = sy[:, 2 : th + 2] - 2.0 * sy[:, 1 : th + 1] + sy[:, 0:th]
    return cot_x * dgx + cot_y * dgy


def _consis_terms(fb, ff, wf):
    """(S_c scalar, and the pieces reused by the VJP) over center rows.

    fb/ff: (2, TH, W) f32 raw flows (not /20); wf: (TH, W) detached weight.
    """
    nf = jnp.sqrt(ff[0] * ff[0] + ff[1] * ff[1] + 1e-24)
    nb = jnp.sqrt(fb[0] * fb[0] + fb[1] * fb[1] + 1e-24)
    n_f = ff / (nf + _EPS_N)[None]
    n_b = fb / (nb + _EPS_N)[None]
    r = n_f + n_b
    occ = 1.0 - wf
    s_c = jnp.sum((jnp.abs(r[0]) + jnp.abs(r[1])) * occ)
    return s_c, r, nf, occ


def _consis_dflow(ff, r, nf, occ, cot):
    sgn = jnp.sign(r)
    dot = sgn[0] * ff[0] + sgn[1] * ff[1]
    inv = 1.0 / (nf + _EPS_N)
    return (cot * occ)[None] * (
        sgn * inv[None] - ff * (dot * inv * inv / nf)[None]
    )


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _reg_fwd_kernel(fb_a, fb_b, ff_a, ff_b, im_a, im_b, wf_a, wf_b, sums_out,
                    *, tile_h, h_img):
    i = pl.program_id(1)
    rows = tile_h + 4
    fb = _window(fb_a, fb_b, rows, tile_h).astype(jnp.float32)
    ff = _window(ff_a, ff_b, rows, tile_h).astype(jnp.float32)
    img = _window(im_a, im_b, rows, tile_h).astype(jnp.float32)
    wf = _window(wf_a, wf_b, rows, tile_h).astype(jnp.float32)
    row0 = i * tile_h

    inv20 = 1.0 / 20.0
    sxb, syb = _smooth_terms(fb * inv20, img, row0, h_img)
    sxf, syf = _smooth_terms(ff * inv20, img, row0, h_img)
    cc = slice(2, tile_h + 2)
    s_c, _, _, _ = _consis_terms(fb[:, cc], ff[:, cc], wf[0][cc])

    vec = jnp.concatenate(
        [
            sxb.reshape(1, 1), syb.reshape(1, 1),
            sxf.reshape(1, 1), syf.reshape(1, 1),
            s_c.reshape(1, 1),
            jnp.zeros((3, 1), jnp.float32),
        ],
        axis=0,
    )
    sums_out[0, 0] = jnp.broadcast_to(vec, (8, 128))


def _reg_bwd_kernel(fb_a, fb_b, ff_a, ff_b, im_a, im_b, wf_a, wf_b, g_ref,
                    dflow_out, *, tile_h, h_img):
    i = pl.program_id(1)
    rows = tile_h + 4
    fb = _window(fb_a, fb_b, rows, tile_h).astype(jnp.float32)
    ff = _window(ff_a, ff_b, rows, tile_h).astype(jnp.float32)
    img = _window(im_a, im_b, rows, tile_h).astype(jnp.float32)
    wf = _window(wf_a, wf_b, rows, tile_h).astype(jnp.float32)
    row0 = i * tile_h
    inv20 = 1.0 / 20.0

    g_sxb = g_ref[0, 0, 0]
    g_syb = g_ref[0, 0, 1]
    g_sxf = g_ref[0, 0, 2]
    g_syf = g_ref[0, 0, 3]
    g_c = g_ref[0, 0, 4]

    d_fb = _smooth_dflow(fb * inv20, img, row0, h_img, g_sxb, g_syb) * inv20
    d_ff = _smooth_dflow(ff * inv20, img, row0, h_img, g_sxf, g_syf) * inv20

    cc = slice(2, tile_h + 2)
    _, r, nf, occ = _consis_terms(fb[:, cc], ff[:, cc], wf[0][cc])
    d_ff = d_ff + _consis_dflow(ff[:, cc], r, nf, occ, g_c)

    dflow_out[0, 0:2] = d_fb.astype(dflow_out.dtype)
    dflow_out[0, 2:4] = d_ff.astype(dflow_out.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _two_blocks(x, tile_h, pad):
    b, c, h, w = x.shape
    n_tiles = h // tile_h
    rows = (n_tiles + 1) * tile_h
    return jnp.pad(x, ((0, 0), (0, 0), (pad, rows - h - pad), (0, 0)))


def _in_specs(ch, tile_h, w, batch_off=0):
    def blk(off):
        return pl.BlockSpec(
            (1, ch, tile_h, w),
            lambda b, i, off=off: (b + batch_off, 0, i + off, 0),
            memory_space=pltpu.VMEM,
        )

    return blk(0), blk(1)


def supported(h: int) -> bool:
    return h % _TILE_H == 0


@jax.custom_vjp
def regularizer_pack(flow_b, flow_f, img, w_fwd):
    """Fused per-scale smoothness + consistency sums.

    Args (NHWC):
        flow_b / flow_f: (B, H, W, 2) f32 — the differentiable inputs
            (consistency treats flow_b as detached, matching the reference).
        img: (B, H, W, 3) center-frame pyramid level (stop-gradient).
        w_fwd: (B, H, W, 1) detached fwd occlusion weight.

    Returns dict of raw f32 sums — the caller applies the reference's mean
    denominators: ``s_sx``/``s_sy`` (2B,) packed [bwd; fwd] smoothness sums,
    ``s_consis`` (B,).
    """
    out, _ = _reg_fwd(flow_b, flow_f, img, w_fwd)
    return out


def _pack(flow_b, flow_f, img, w_fwd, tile_h):
    fl = jnp.concatenate([flow_b, flow_f], 0).transpose(0, 3, 1, 2)
    im = img.transpose(0, 3, 1, 2)
    wf = w_fwd.transpose(0, 3, 1, 2)
    return (
        _two_blocks(fl, tile_h, 2),
        _two_blocks(im, tile_h, 2),
        _two_blocks(wf, tile_h, 2),
    )


def _reg_run_fwd(flow_b, flow_f, img, w_fwd):
    bsz, h, w, _ = img.shape
    tile_h = _TILE_H
    n_tiles = h // tile_h
    flq, imq, wfq = _pack(flow_b, flow_f, img, w_fwd, tile_h)
    fb_s = _in_specs(2, tile_h, w)
    ff_s = _in_specs(2, tile_h, w, batch_off=bsz)
    im_s = _in_specs(3, tile_h, w)
    wf_s = _in_specs(1, tile_h, w)
    sums = pl.pallas_call(
        functools.partial(_reg_fwd_kernel, tile_h=tile_h, h_img=h),
        grid=(bsz, n_tiles),
        in_specs=[*fb_s, *ff_s, *im_s, *wf_s],
        out_specs=pl.BlockSpec(
            (1, 1, 8, 128), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, n_tiles, 8, 128), jnp.float32),
    )(flq, flq, flq, flq, imq, imq, wfq, wfq)
    tots = jnp.sum(sums[..., 0], axis=1)  # (B, 8)
    return {
        "s_sx": jnp.concatenate([tots[:, 0], tots[:, 2]], 0),
        "s_sy": jnp.concatenate([tots[:, 1], tots[:, 3]], 0),
        "s_consis": tots[:, 4],
    }


def _reg_fwd(flow_b, flow_f, img, w_fwd):
    return _reg_run_fwd(flow_b, flow_f, img, w_fwd), (
        flow_b, flow_f, img, w_fwd,
    )


def _reg_bwd(res, g):
    flow_b, flow_f, img, w_fwd = res
    bsz, h, w, _ = img.shape
    tile_h = _TILE_H
    n_tiles = h // tile_h
    flq, imq, wfq = _pack(flow_b, flow_f, img, w_fwd, tile_h)
    fb_s = _in_specs(2, tile_h, w)
    ff_s = _in_specs(2, tile_h, w, batch_off=bsz)
    im_s = _in_specs(3, tile_h, w)
    wf_s = _in_specs(1, tile_h, w)
    g_sx = g["s_sx"].astype(jnp.float32)
    g_sy = g["s_sy"].astype(jnp.float32)
    g_c = g["s_consis"].astype(jnp.float32)
    gpack = jnp.stack(
        [g_sx[:bsz], g_sy[:bsz], g_sx[bsz:], g_sy[bsz:], g_c,
         jnp.zeros((bsz,), jnp.float32), jnp.zeros((bsz,), jnp.float32),
         jnp.zeros((bsz,), jnp.float32)],
        axis=1,
    ).reshape(bsz, 1, 8)
    dflow = pl.pallas_call(
        functools.partial(_reg_bwd_kernel, tile_h=tile_h, h_img=h),
        grid=(bsz, n_tiles),
        in_specs=[
            *fb_s, *ff_s, *im_s, *wf_s,
            pl.BlockSpec((1, 1, 8), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 4, tile_h, w), lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, 4, h, w), jnp.float32),
    )(flq, flq, flq, flq, imq, imq, wfq, wfq, gpack)
    dflow = dflow.transpose(0, 2, 3, 1)
    return (
        dflow[..., 0:2].astype(flow_b.dtype),
        dflow[..., 2:4].astype(flow_f.dtype),
        jnp.zeros_like(img),
        jnp.zeros_like(w_fwd),
    )


regularizer_pack.defvjp(_reg_fwd, _reg_bwd)


# ---------------------------------------------------------------------------
# pure-JAX reference composition (testing / CPU fallback)
# ---------------------------------------------------------------------------


def regularizer_pack_reference(flow_b, flow_f, img, w_fwd):
    """Same contract as regularizer_pack via the existing losses ops."""
    from unopticalflow_tpu.models import losses

    h, w = img.shape[1:3]
    flows = jnp.concatenate([flow_b, flow_f], 0)
    imgs2 = jnp.concatenate([img, img], 0).astype(jnp.float32)
    g = flows.astype(jnp.float32) / 20.0
    wx = jnp.exp(
        -10.0 * jnp.mean(jnp.abs(losses._grad_x(imgs2)), -1, keepdims=True)
    )
    wy = jnp.exp(
        -10.0 * jnp.mean(jnp.abs(losses._grad_y(imgs2)), -1, keepdims=True)
    )
    dx2 = losses._grad_x(losses._grad_x(g))
    dy2 = losses._grad_y(losses._grad_y(g))
    s_sx = jnp.sum(wx[:, :, 1:, :] * jnp.abs(dx2), axis=(1, 2, 3))
    s_sy = jnp.sum(wy[:, 1:, :, :] * jnp.abs(dy2), axis=(1, 2, 3))

    n_f = losses.flow_normalization(flow_f.astype(jnp.float32))
    n_b = jax.lax.stop_gradient(
        losses.flow_normalization(flow_b.astype(jnp.float32))
    )
    occ = 1.0 - w_fwd.astype(jnp.float32)
    s_c = jnp.sum(jnp.abs(n_f + n_b) * occ, axis=(1, 2, 3))
    return {"s_sx": s_sx, "s_sy": s_sy, "s_consis": s_c}
