"""Fused photometric-loss kernel: warp blend + occlusion weights + SSIM.

One Pallas pass per scale replaces the scale's entire photometric stack
(reference semantics: model_flow_paper.py:90-148 + net_utils.py:16-54):

    warped   = bilinear blend of pre-gathered corner values, border-masked
    valid    = warped pixel != 0 in any channel
    diff     = mean_c |img - warped|
    weight   = 2 exp(-((1 - softmax([diff_bwd, diff_fwd])) - 0.5)^2 / .03) * valid
    S_dw     = sum diff * weight                (-> masked L1, per sample)
    S_w      = sum weight                        (normalizer)
    S_cl     = sum clamp((1 - SSIM(img*w, warped*w)) / 2, 0, 1)

The XLA formulation materializes ~a dozen full-resolution f32/bf16 tensors
per scale per direction (plus their backward); here everything lives in VMEM
tiles and only the occlusion-weight map and six per-sample partial sums leave
the kernel.

Differentiability: the ONLY differentiable input is the flow.  The corner
values reach the kernel pre-gathered and carry no gradient (the loss-warp
images are stop_gradient'd pyramids), the occlusion weights are detached by
reference semantics (model_flow_paper.py:122), and integer floor indices have
zero gradient — so the hand-written VJP emits d(flow) only: the pixel path
chains through sign(img - warped) and the bilinear-weight derivatives; the
SSIM path uses the self-adjointness of the 3x3 box filter (the pool adjoint
is the same zero-padded pool applied to the cotangent-weighted maps).

Layout: channel-major (B, C, H, W) with W in lanes.  Row halos (1 for the
forward pools, 2 for the backward pool-of-cotangents) use the two-consecutive
-row-blocks trick from ops/pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# A/B knobs (UNFLOW_DIMSEM / UNFLOW_INFUSE): see ops/_tuning.py
from unopticalflow_tpu.ops._tuning import cparams as _cparams


_C1 = 0.01**2
_C2 = 0.03**2
_EPS_DIV = 1e-12


# ---------------------------------------------------------------------------
# shared in-kernel math
# ---------------------------------------------------------------------------


def _window2(a, b_blk, rows: int, tile_h: int):
    """First ``rows`` rows of the (2*TH)-row span of two consecutive blocks."""
    if rows <= tile_h:
        return a[:, :rows]
    return jnp.concatenate([a, b_blk[:, : rows - tile_h]], axis=1)


def _window(a_ref, b_ref, rows: int, tile_h: int):
    return _window2(a_ref[0], b_ref[0] if rows > tile_h else a_ref[0],
                    rows, tile_h)


def _unpack_pairs(u):
    """(P, R, W) u32 of little-endian bf16 pairs -> (2P, R, W) f32 (exact).

    bf16 is truncated f32, so placing the 16 bf16 bits in the high half of a
    u32 word and bitcasting IS the bf16 -> f32 conversion — two VPU integer
    ops per pair, no relayout (the channel-major gather contract of
    ops/warp.py::warp_corners_cm).
    """
    lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    chans = []
    for p in range(u.shape[0]):
        chans.append(lo[p])
        chans.append(hi[p])
    return jnp.stack(chans, axis=0)


def _pool3(x):
    """3x3 zero-padded box sum over (rows, lanes); divisor 9 applied by caller.

    Valid output rows are [1, rows-1) of the input window.
    """
    ry = x[:, :-2] + x[:, 1:-1] + x[:, 2:]
    col = jnp.pad(ry, ((0, 0), (0, 0), (1, 1)))
    return col[:, :, :-2] + col[:, :, 1:-1] + col[:, :, 2:]


def _blend(four, flow, row0, h_img, w_img, rows):
    """Recompute the masked bilinear blend from corners + flow (f32).

    four: (12, rows, W) corner values (4 corners x 3 channels, corner-major);
    flow: (2, rows, W); row0: global image row of window row 0.
    Returns (warped (3, rows, W), d_dx (3, rows, W), d_dy, valid (rows, W),
    mask) — d_dx/d_dy are d(warped)/d(frac) for the VJP.
    """
    w = w_img
    # Mosaic requires integer iota; cast after
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1).astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 0).astype(jnp.float32) + row0
    x = col + flow[0]
    y = row + flow[1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    def inb(xi, yi):
        return (
            (xi >= 0.0) & (xi <= w_img - 1.0) & (yi >= 0.0) & (yi <= h_img - 1.0)
        ).astype(jnp.float32)

    i00 = inb(x0, y0)
    i01 = inb(x0 + 1.0, y0)
    i10 = inb(x0, y0 + 1.0)
    i11 = inb(x0 + 1.0, y0 + 1.0)
    w00 = (1.0 - dy) * (1.0 - dx) * i00
    w01 = (1.0 - dy) * dx * i01
    w10 = dy * (1.0 - dx) * i10
    w11 = dy * dx * i11
    mask = ((w00 + w01 + w10 + w11) >= 0.9999).astype(jnp.float32)

    c00, c01, c10, c11 = four[0:3], four[3:6], four[6:9], four[9:12]
    warped = (
        w00[None] * c00 + w01[None] * c01 + w10[None] * c10 + w11[None] * c11
    ) * mask[None]
    # d warped / d dx and / d dy (mask and inb constant a.e.)
    d_dx = (
        (-(1.0 - dy) * i00)[None] * c00
        + ((1.0 - dy) * i01)[None] * c01
        + (-dy * i10)[None] * c10
        + (dy * i11)[None] * c11
    ) * mask[None]
    d_dy = (
        (-(1.0 - dx) * i00)[None] * c00
        + (-dx * i01)[None] * c01
        + ((1.0 - dx) * i10)[None] * c10
        + (dx * i11)[None] * c11
    ) * mask[None]
    valid = 1.0 - (
        (warped[0] == 0.0) & (warped[1] == 0.0) & (warped[2] == 0.0)
    ).astype(jnp.float32)
    return warped, d_dx, d_dy, valid, mask


def _weights_pair(img, warped_b, warped_f, valid_b, valid_f):
    """diff pair + sharpened 1-softmax occlusion weights (both halves)."""
    diff_b = jnp.mean(jnp.abs(img - warped_b), axis=0)
    diff_f = jnp.mean(jnp.abs(img - warped_f), axis=0)
    m = jnp.maximum(diff_b, diff_f)
    eb = jnp.exp(diff_b - m)
    ef = jnp.exp(diff_f - m)
    inv = 1.0 / (eb + ef)
    wb = 1.0 - eb * inv
    wf = 1.0 - ef * inv
    wb = 2.0 * jnp.exp(-jnp.square(wb - 0.5) / 0.03)
    wf = 2.0 * jnp.exp(-jnp.square(wf - 0.5) / 0.03)
    return diff_b, diff_f, wb * valid_b, wf * valid_f


def _ssim_terms(img, warped, weight):
    """Pooled SSIM quantities of x = img*w, y = warped*w over a window.

    Input rows R; pooled outputs have R-2 valid rows.  Returns the per-pixel
    maps (x, y) and pooled (mu_x, mu_y, px2, py2, pxy) — sums/9.
    """
    x = img * weight[None]
    y = warped * weight[None]
    ninth = 1.0 / 9.0
    mu_x = _pool3(x) * ninth
    mu_y = _pool3(y) * ninth
    px2 = _pool3(x * x) * ninth
    py2 = _pool3(y * y) * ninth
    pxy = _pool3(x * y) * ninth
    return x, y, mu_x, mu_y, px2, py2, pxy


def _ssim_map(mu_x, mu_y, px2, py2, pxy):
    sigma_x = px2 - mu_x * mu_x
    sigma_y = py2 - mu_y * mu_y
    sigma_xy = pxy - mu_x * mu_y
    num = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    den = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    return num, den


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(ff_a, ff_b, fl_a, fl_b, im_a, im_b, w_out, sums_out,
                *, tile_h, h_img, w_img):
    rows = tile_h + 2
    ff = _window(ff_a, ff_b, rows, tile_h).astype(jnp.float32)  # (24, R, W)
    _fwd_body(ff, fl_a, fl_b, im_a, im_b, w_out, sums_out,
              tile_h=tile_h, h_img=h_img, w_img=w_img)


def _fwd_kernel_cm(ff_a, ff_b, fl_a, fl_b, im_a, im_b, w_out, sums_out,
                   *, tile_h, h_img, w_img):
    # ff blocks are channel-major u32 pairs (12, 1, TH, W): unpack in-register
    rows = tile_h + 2
    ffu = _window2(ff_a[:, 0], ff_b[:, 0] if rows > tile_h else ff_a[:, 0],
                   rows, tile_h)
    _fwd_body(_unpack_pairs(ffu), fl_a, fl_b, im_a, im_b, w_out, sums_out,
              tile_h=tile_h, h_img=h_img, w_img=w_img)


def _fwd_body(ff, fl_a, fl_b, im_a, im_b, w_out, sums_out,
              *, tile_h, h_img, w_img):
    i = pl.program_id(1)
    rows = tile_h + 2
    fl = _window(fl_a, fl_b, rows, tile_h).astype(jnp.float32)  # (4, R, W)
    img = _window(im_a, im_b, rows, tile_h).astype(jnp.float32)  # (3, R, W)
    row0 = (i * tile_h - 1).astype(jnp.float32)

    wb_, db_, yb_, vb_, _ = _blend(ff[0:12], fl[0:2], row0, h_img, w_img, rows)
    wf_, df_, yf_, vf_, _ = _blend(ff[12:24], fl[2:4], row0, h_img, w_img, rows)
    diff_b, diff_f, wgt_b, wgt_f = _weights_pair(img, wb_, wf_, vb_, vf_)

    cl = []
    for warped, wgt in ((wb_, wgt_b), (wf_, wgt_f)):
        _, _, mu_x, mu_y, px2, py2, pxy = _ssim_terms(img, warped, wgt)
        num, den = _ssim_map(mu_x, mu_y, px2, py2, pxy)
        s = num / den
        cl.append(jnp.clip((1.0 - s) * 0.5, 0.0, 1.0))

    c = slice(1, tile_h + 1)  # central TH rows of the window
    w_out[0, 0] = wgt_b[c].astype(w_out.dtype)
    w_out[0, 1] = wgt_f[c].astype(w_out.dtype)
    # per-tile partial sums: one legal (8, 128) f32 tile per grid cell
    # (smaller blocks are rejected by the TPU tiling rules); lane 0 carries
    # the values, the host side reads [..., 0]
    vec = jnp.concatenate(
        [
            jnp.sum(diff_b[c] * wgt_b[c]).reshape(1, 1),
            jnp.sum(wgt_b[c]).reshape(1, 1),
            (jnp.sum(cl[0]) / 3.0).reshape(1, 1),  # pooled maps: 3 channels
            jnp.sum(diff_f[c] * wgt_f[c]).reshape(1, 1),
            jnp.sum(wgt_f[c]).reshape(1, 1),
            (jnp.sum(cl[1]) / 3.0).reshape(1, 1),
            jnp.zeros((2, 1), jnp.float32),
        ],
        axis=0,
    )  # (8, 1)
    sums_out[0, 0] = jnp.broadcast_to(vec, (8, 128))


# ---------------------------------------------------------------------------
# backward kernel (d flow only)
# ---------------------------------------------------------------------------


def _bwd_kernel(ff_a, ff_b, fl_a, fl_b, im_a, im_b, g_ref, dflow_out,
                *, tile_h, h_img, w_img):
    rows = tile_h + 4
    ff = _window(ff_a, ff_b, rows, tile_h).astype(jnp.float32)
    _bwd_body(ff, fl_a, fl_b, im_a, im_b, g_ref, dflow_out,
              tile_h=tile_h, h_img=h_img, w_img=w_img)


def _bwd_kernel_cm(ff_a, ff_b, fl_a, fl_b, im_a, im_b, g_ref, dflow_out,
                   *, tile_h, h_img, w_img):
    rows = tile_h + 4
    ffu = _window2(ff_a[:, 0], ff_b[:, 0] if rows > tile_h else ff_a[:, 0],
                   rows, tile_h)
    _bwd_body(_unpack_pairs(ffu), fl_a, fl_b, im_a, im_b, g_ref, dflow_out,
              tile_h=tile_h, h_img=h_img, w_img=w_img)


def _bwd_body(ff, fl_a, fl_b, im_a, im_b, g_ref, dflow_out,
              *, tile_h, h_img, w_img):
    i = pl.program_id(1)
    rows = tile_h + 4
    fl = _window(fl_a, fl_b, rows, tile_h).astype(jnp.float32)
    img = _window(im_a, im_b, rows, tile_h).astype(jnp.float32)
    row0 = (i * tile_h - 2).astype(jnp.float32)

    wb_, dxb, dyb, vb_, _ = _blend(ff[0:12], fl[0:2], row0, h_img, w_img, rows)
    wf_, dxf, dyf, vf_, _ = _blend(ff[12:24], fl[2:4], row0, h_img, w_img, rows)
    diff_b, diff_f, wgt_b, wgt_f = _weights_pair(img, wb_, wf_, vb_, vf_)

    for half, (warped, wgt, d_dx, d_dy, g_dw, g_cl, out_c) in enumerate((
        (wb_, wgt_b, dxb, dyb, g_ref[0, 0, 0], g_ref[0, 0, 2], 0),
        (wf_, wgt_f, dxf, dyf, g_ref[0, 0, 3], g_ref[0, 0, 5], 2),
    )):
        x, y, mu_x, mu_y, px2, py2, pxy = _ssim_terms(img, warped, wgt)
        num, den = _ssim_map(mu_x, mu_y, px2, py2, pxy)
        s = num / den
        cl_act = ((1.0 - s) * 0.5 > 0.0) & ((1.0 - s) * 0.5 < 1.0)
        # d(sum clamp)/d s on SSIM rows (window rows [1, rows-1)).  SSIM
        # outputs only exist on image rows [0, H): rows outside (the halo's
        # virtual rows) have no forward output, but their pooled stats touch
        # real boundary pixels — mask them or the boundary rows' flow grad
        # picks up phantom contributions.
        img_row = (
            jax.lax.broadcasted_iota(jnp.int32, s.shape[1:], 0).astype(jnp.float32)
            + (i * tile_h - 1).astype(jnp.float32)
        )
        in_image = ((img_row >= 0.0) & (img_row <= h_img - 1.0))[None]
        gs = jnp.where(cl_act & in_image, -0.5 * (g_cl / 3.0), 0.0)

        # quotient-rule partials w.r.t. the pooled quantities
        sigma_x = px2 - mu_x * mu_x
        sigma_y = py2 - mu_y * mu_y
        sigma_xy = pxy - mu_x * mu_y
        a1 = 2.0 * mu_x * mu_y + _C1
        a2 = 2.0 * sigma_xy + _C2
        b1 = mu_x * mu_x + mu_y * mu_y + _C1
        b2 = sigma_x + sigma_y + _C2
        inv_d = 1.0 / den
        # s = a1 a2 / (b1 b2)
        ds_dmuy = (2.0 * mu_x * a2 + a1 * (-2.0 * mu_x) * 1.0) * inv_d - (
            s * inv_d
        ) * (2.0 * mu_y * b2 + b1 * (-2.0 * mu_y))
        # note: d sigma_xy / d mu_y = -mu_x, folded above via a2 term:
        # d num/d mu_y = 2 mu_x a2 + a1 * 2 * (-mu_x) = 2 mu_x (a2 - a1)
        ds_dpy2 = -(s * inv_d) * b1
        ds_dpxy = a1 * 2.0 * inv_d

        gq_mu = gs * ds_dmuy
        gq_py2 = gs * ds_dpy2
        gq_pxy = gs * ds_dpxy

        # pool adjoint: dL/dy(p) = (1/9) [ P(gq_mu) + 2 y P(gq_py2) + x P(gq_pxy) ]
        # pools of the cotangent maps: gq_* live on rows [1, rows-1); pad one
        # zero row each side so _pool3's output lands on rows [2, rows-2).
        ninth = 1.0 / 9.0

        def padded_pool(q):
            q = jnp.pad(q, ((0, 0), (1, 1), (0, 0)))
            return _pool3(q) * ninth

        # padded_pool output row j sums gq rows j-1..j+1 (gq row g = window
        # row g+1); dL/dy at central window row r in [2, TH+2) needs gq rows
        # r-2..r, i.e. pool row j = r-1 in [1, TH+1).
        p_mu = padded_pool(gq_mu)[:, 1 : tile_h + 1]
        p_py2 = padded_pool(gq_py2)[:, 1 : tile_h + 1]
        p_pxy = padded_pool(gq_pxy)[:, 1 : tile_h + 1]
        cc = slice(2, tile_h + 2)  # central TH rows of the window
        dL_dy = p_mu + 2.0 * y[:, cc] * p_py2 + x[:, cc] * p_pxy
        wgt_c = wgt[cc][None]  # slice-then-expand: [None, cc] lowers to a
        # dynamic gather Mosaic rejects
        dL_dwarped_ssim = dL_dy * wgt_c

        # pixel path: dL/d diff = g_dw * wgt; d diff/d warped = -sign/3
        sgn = jnp.sign(img[:, cc] - warped[:, cc])
        dL_dwarped = dL_dwarped_ssim + g_dw * wgt_c * (-sgn / 3.0)

        du = jnp.sum(dL_dwarped * d_dx[:, cc], axis=0)
        dv = jnp.sum(dL_dwarped * d_dy[:, cc], axis=0)
        dflow_out[0, out_c] = du.astype(dflow_out.dtype)
        dflow_out[0, out_c + 1] = dv.astype(dflow_out.dtype)


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

_TILE_H = 8


def _tile_h(h: int, w: int) -> int:
    """Largest supported tile height under a VMEM budget.

    Taller tiles amortize the fixed halo rows (+2 fwd, +4 bwd — at TH=8 the
    bwd window is 50% halo) and cut grid dispatches; capped at 16 — TH=32
    at the recipe's full-res scale blows the 16 MB scoped-VMEM stack in the
    bwd kernel (22.5M, measured) — and bounded by a temporary-budget check
    for wide rows.
    """
    for th in (16, 8):
        if h % th == 0 and 26 * 4 * (th + 4) * w * 2 <= 8 * 1024 * 1024:
            return th
    return _TILE_H


def _two_blocks(x, tile_h, pad):
    """Pad rows by ``pad`` top (+ tail) so blocks (i, i+1) cover any window."""
    b, c, h, w = x.shape
    n_tiles = h // tile_h
    rows = (n_tiles + 1) * tile_h
    return jnp.pad(x, ((0, 0), (0, 0), (pad, rows - h - pad), (0, 0)))


def _in_specs(ch, tile_h, w):
    def blk(off):
        return pl.BlockSpec(
            (1, ch, tile_h, w),
            lambda b, i, off=off: (b, 0, i + off, 0),
            memory_space=pltpu.VMEM,
        )

    return blk(0), blk(1)


def _pack_inputs(four_b, four_f, flow_b, flow_f, img):
    """NHWC inputs -> channel-major packed (FF (B,24,H,W), FL, IM)."""
    ff = jnp.concatenate([four_b, four_f], axis=-1).transpose(0, 3, 1, 2)
    fl = jnp.concatenate([flow_b, flow_f], axis=-1).transpose(0, 3, 1, 2)
    im = img.transpose(0, 3, 1, 2)
    return ff, fl, im


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def photometric_pack(four_b, four_f, flow_b, flow_f, img):
    """Fused per-scale photometric stack.

    Args (all NHWC):
        four_b/four_f: (B, H, W, 12) packed corner values of the bwd/fwd
            loss warps (ops/warp.py::warp_corners) — NOT differentiated.
        flow_b/flow_f: (B, H, W, 2) flows — the differentiable inputs.
        img: (B, H, W, 3) center-frame pyramid level (stop-gradient).

    Returns:
        dict: loss sums per half ``s_dw``/``s_w``/``s_cl`` each (2B,) packed
        [bwd; fwd] (f32), and ``weights`` (2B, H, W, 1) detached.
    """
    out, _ = _pp_fwd(four_b, four_f, flow_b, flow_f, img)
    return out


def _pp_run_fwd(four_b, four_f, flow_b, flow_f, img):
    bsz, h, w, _ = img.shape
    tile_h = _tile_h(h, w)
    n_tiles = h // tile_h
    ff, fl, im = _pack_inputs(four_b, four_f, flow_b, flow_f, img)
    ffq = _two_blocks(ff, tile_h, 1)
    flq = _two_blocks(fl, tile_h, 1)
    imq = _two_blocks(im, tile_h, 1)
    ff_s = _in_specs(24, tile_h, w)
    fl_s = _in_specs(4, tile_h, w)
    im_s = _in_specs(3, tile_h, w)
    w_out, sums = pl.pallas_call(
        functools.partial(_fwd_kernel, tile_h=tile_h, h_img=h, w_img=w),
        grid=(bsz, n_tiles),
        in_specs=[*ff_s, *fl_s, *im_s],
        out_specs=(
            pl.BlockSpec((1, 2, tile_h, w), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, 2, h, w), img.dtype),
            jax.ShapeDtypeStruct((bsz, n_tiles, 8, 128), jnp.float32),
        ),
        compiler_params=_cparams(6),
    )(ffq, ffq, flq, flq, imq, imq)
    tots = jnp.sum(sums[..., 0], axis=1)  # (B, 8)
    out = {
        "s_dw": jnp.concatenate([tots[:, 0], tots[:, 3]], 0),
        "s_w": jnp.concatenate([tots[:, 1], tots[:, 4]], 0),
        "s_cl": jnp.concatenate([tots[:, 2], tots[:, 5]], 0),
        "weights": jnp.concatenate(
            [w_out[:, 0:1], w_out[:, 1:2]], 0
        ).transpose(0, 2, 3, 1),
    }
    return out


def _pp_fwd(four_b, four_f, flow_b, flow_f, img):
    out = _pp_run_fwd(four_b, four_f, flow_b, flow_f, img)
    out = {
        k: (jax.lax.stop_gradient(v) if k in ("s_w", "weights") else v)
        for k, v in out.items()
    }
    return out, (four_b, four_f, flow_b, flow_f, img)


def _pp_bwd(res, g):
    four_b, four_f, flow_b, flow_f, img = res
    bsz, h, w, _ = img.shape
    tile_h = _tile_h(h, w)
    n_tiles = h // tile_h
    ff, fl, im = _pack_inputs(four_b, four_f, flow_b, flow_f, img)
    ffq = _two_blocks(ff, tile_h, 2)
    flq = _two_blocks(fl, tile_h, 2)
    imq = _two_blocks(im, tile_h, 2)
    # cotangents: only s_dw and s_cl can carry gradient (s_w/weights are
    # emitted pre-detached). Pack per-sample values in the fwd sums layout.
    g_dw = g["s_dw"].astype(jnp.float32)
    g_cl = g["s_cl"].astype(jnp.float32)
    zeros = jnp.zeros((bsz,), jnp.float32)
    gpack = jnp.stack(
        [g_dw[:bsz], zeros, g_cl[:bsz], g_dw[bsz:], zeros, g_cl[bsz:],
         zeros, zeros],
        axis=1,
    ).reshape(bsz, 1, 8)
    ff_s = _in_specs(24, tile_h, w)
    fl_s = _in_specs(4, tile_h, w)
    im_s = _in_specs(3, tile_h, w)
    dflow = pl.pallas_call(
        functools.partial(_bwd_kernel, tile_h=tile_h, h_img=h, w_img=w),
        grid=(bsz, n_tiles),
        in_specs=[
            *ff_s, *fl_s, *im_s,
            pl.BlockSpec((1, 1, 8), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, tile_h, w), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 4, h, w), jnp.float32),
        compiler_params=_cparams(7),
    )(ffq, ffq, flq, flq, imq, imq, gpack)
    dflow = dflow.transpose(0, 2, 3, 1)  # (B, H, W, 4)
    d_flow_b = dflow[..., 0:2].astype(flow_b.dtype)
    d_flow_f = dflow[..., 2:4].astype(flow_f.dtype)
    zero4 = jnp.zeros_like(four_b)
    return zero4, jnp.zeros_like(four_f), d_flow_b, d_flow_f, jnp.zeros_like(img)


photometric_pack.defvjp(_pp_fwd, _pp_bwd)


# ---------------------------------------------------------------------------
# channel-major variant: corner values arrive as (12, B, H, W) u32 bf16-pairs
# straight from ops/warp.py::warp_corners_cm — no NHWC->NCHW boundary
# transpose on the 24-channel tensor (the kernel's largest input) in either
# pass; pairs unpack in-register (bf16 -> f32 is a 16-bit shift).
# ---------------------------------------------------------------------------


def _in_specs_cm(ch, tile_h, w):
    def blk(off):
        return pl.BlockSpec(
            (ch, 1, tile_h, w),
            lambda b, i, off=off: (0, b, i + off, 0),
            memory_space=pltpu.VMEM,
        )

    return blk(0), blk(1)


def _pp_run_fwd_cm(ffu, flow_b, flow_f, img):
    bsz, h, w, _ = img.shape
    tile_h = _tile_h(h, w)
    n_tiles = h // tile_h
    fl = jnp.concatenate([flow_b, flow_f], axis=-1).transpose(0, 3, 1, 2)
    im = img.transpose(0, 3, 1, 2)
    ffq = _two_blocks(ffu, tile_h, 1)  # pads axis 2 (= H here too)
    flq = _two_blocks(fl, tile_h, 1)
    imq = _two_blocks(im, tile_h, 1)
    ff_s = _in_specs_cm(12, tile_h, w)
    fl_s = _in_specs(4, tile_h, w)
    im_s = _in_specs(3, tile_h, w)
    w_out, sums = pl.pallas_call(
        functools.partial(_fwd_kernel_cm, tile_h=tile_h, h_img=h, w_img=w),
        grid=(bsz, n_tiles),
        in_specs=[*ff_s, *fl_s, *im_s],
        out_specs=(
            pl.BlockSpec((1, 2, tile_h, w), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, 2, h, w), img.dtype),
            jax.ShapeDtypeStruct((bsz, n_tiles, 8, 128), jnp.float32),
        ),
        compiler_params=_cparams(6),
    )(ffq, ffq, flq, flq, imq, imq)
    tots = jnp.sum(sums[..., 0], axis=1)  # (B, 8)
    return {
        "s_dw": jnp.concatenate([tots[:, 0], tots[:, 3]], 0),
        "s_w": jnp.concatenate([tots[:, 1], tots[:, 4]], 0),
        "s_cl": jnp.concatenate([tots[:, 2], tots[:, 5]], 0),
        "weights": jnp.concatenate(
            [w_out[:, 0:1], w_out[:, 1:2]], 0
        ).transpose(0, 2, 3, 1),
    }


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def photometric_pack_cm(ffu, flow_b, flow_f, img):
    """``photometric_pack`` with channel-major u32 corner pairs.

    Args:
        ffu: (12, B, H, W) uint32 — bf16 corner pairs [bwd 6; fwd 6]
            (warp_corners_cm output per direction, concatenated on axis 0) —
            NOT differentiated (integer; loss-warp images are
            stop_gradient'd pyramids).
        flow_b/flow_f/img: as in photometric_pack (NHWC).
    Returns: identical contract to photometric_pack; values bit-equal (the
        in-kernel pair unpack is exactly the bf16->f32 astype of the packed
        path).
    """
    out, _ = _ppc_fwd(ffu, flow_b, flow_f, img)
    return out


def _ppc_fwd(ffu, flow_b, flow_f, img):
    out = _pp_run_fwd_cm(ffu, flow_b, flow_f, img)
    out = {
        k: (jax.lax.stop_gradient(v) if k in ("s_w", "weights") else v)
        for k, v in out.items()
    }
    return out, (ffu, flow_b, flow_f, img)


def _ppc_bwd(res, g):
    import numpy as _np

    from jax import dtypes as _dtypes

    ffu, flow_b, flow_f, img = res
    bsz, h, w, _ = img.shape
    tile_h = _tile_h(h, w)
    n_tiles = h // tile_h
    fl = jnp.concatenate([flow_b, flow_f], axis=-1).transpose(0, 3, 1, 2)
    im = img.transpose(0, 3, 1, 2)
    ffq = _two_blocks(ffu, tile_h, 2)
    flq = _two_blocks(fl, tile_h, 2)
    imq = _two_blocks(im, tile_h, 2)
    g_dw = g["s_dw"].astype(jnp.float32)
    g_cl = g["s_cl"].astype(jnp.float32)
    zeros = jnp.zeros((bsz,), jnp.float32)
    gpack = jnp.stack(
        [g_dw[:bsz], zeros, g_cl[:bsz], g_dw[bsz:], zeros, g_cl[bsz:],
         zeros, zeros],
        axis=1,
    ).reshape(bsz, 1, 8)
    ff_s = _in_specs_cm(12, tile_h, w)
    fl_s = _in_specs(4, tile_h, w)
    im_s = _in_specs(3, tile_h, w)
    dflow = pl.pallas_call(
        functools.partial(_bwd_kernel_cm, tile_h=tile_h, h_img=h, w_img=w),
        grid=(bsz, n_tiles),
        in_specs=[
            *ff_s, *fl_s, *im_s,
            pl.BlockSpec((1, 1, 8), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, tile_h, w), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 4, h, w), jnp.float32),
        compiler_params=_cparams(7),
    )(ffq, ffq, flq, flq, imq, imq, gpack)
    dflow = dflow.transpose(0, 2, 3, 1)  # (B, H, W, 4)
    d_flow_b = dflow[..., 0:2].astype(flow_b.dtype)
    d_flow_f = dflow[..., 2:4].astype(flow_f.dtype)
    d_ffu = _np.zeros(ffu.shape, _dtypes.float0)
    return d_ffu, d_flow_b, d_flow_f, jnp.zeros_like(img)


photometric_pack_cm.defvjp(_ppc_fwd, _ppc_bwd)


# ---------------------------------------------------------------------------
# pure-JAX reference composition (testing / CPU fallback)
# ---------------------------------------------------------------------------


def photometric_pack_reference(four_b, four_f, flow_b, flow_f, img):
    """Same contract as photometric_pack, via the existing JAX ops."""
    from unopticalflow_tpu.models import losses
    from unopticalflow_tpu.ops.ssim import ssim
    from unopticalflow_tpu.ops.warp import blend_corners

    b = img.shape[0]
    warped_b = blend_corners(four_b, flow_b, img.shape[1:3], use_mask=True)
    warped_f = blend_corners(four_f, flow_f, img.shape[1:3], use_mask=True)
    warped = jnp.concatenate([warped_b, warped_f], 0)
    diffs, weights = losses.diff_and_occlusion_weights_packed(
        [warped], [img], 1
    )
    diff, weight = diffs[0], weights[0]
    img2 = jnp.concatenate([img, img], 0)
    s_map = ssim(img2 * weight, warped * weight)
    cl = jnp.clip((1.0 - s_map) / 2.0, 0.0, 1.0)
    return {
        "s_dw": jnp.sum((diff * weight).astype(jnp.float32), axis=(1, 2, 3)),
        "s_w": jax.lax.stop_gradient(
            jnp.sum(weight.astype(jnp.float32), axis=(1, 2, 3))
        ),
        "s_cl": jnp.sum(cl.astype(jnp.float32), axis=(1, 2, 3)) / 3.0,
        "weights": jax.lax.stop_gradient(weight),
    }
