"""Functional torch-CPU oracle of the documented model semantics.

Used only by tests: given a state dict produced by
``params_to_torch_state_dict``, runs the same computation the reference
defines (feature encoder, PWC decoder, loss stack) as plain functional torch
calls, providing a numerical ground truth for the JAX implementation.
"""

import numpy as np
import torch
import torch.nn.functional as F


def _conv(sd, name, x, stride=1, dilation=1, relu=True):
    w = sd[f"{name}.0.weight"] if f"{name}.0.weight" in sd else sd[f"{name}.weight"]
    b = sd[f"{name}.0.bias"] if f"{name}.0.bias" in sd else sd[f"{name}.bias"]
    out = F.conv2d(x, w, b, stride=stride, padding=dilation, dilation=dilation)
    return F.leaky_relu(out, 0.1) if relu else out


def feature_pyramid(sd, img):
    strides = [2, 1, 2, 1, 2, 1, 2, 1, 2, 1, 2, 1]
    feats, x = [], img
    for i, s in enumerate(strides):
        x = _conv(sd, f"fpyramid.conv{i + 1}", x, stride=s)
        if s == 1:
            feats.append(x)
    return feats


def warp(x, flow, use_mask=False):
    b, _, h, w = x.shape
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack([gx, gy]).float()[None].repeat(b, 1, 1, 1)
    v = grid + flow
    v = torch.stack(
        [2.0 * v[:, 0] / max(w - 1, 1) - 1.0, 2.0 * v[:, 1] / max(h - 1, 1) - 1.0], 1
    ).permute(0, 2, 3, 1)
    out = F.grid_sample(x, v, align_corners=True)
    if use_mask:
        mask = F.grid_sample(torch.ones_like(x), v, align_corners=True)
        mask = (mask >= 0.9999).float()
        out = out * mask
    return out


def corr(f1, f2, d=4):
    b, c, h, w = f1.shape
    f2p = F.pad(f2, (d, d, d, d))
    return torch.cat(
        [
            (f1 * f2p[:, :, i : i + h, j : j + w]).mean(1, keepdim=True)
            for i in range(2 * d + 1)
            for j in range(2 * d + 1)
        ],
        1,
    )


def _estimate(sd, lvl, inp):
    x0 = _conv(sd, f"pwc_model.conv{lvl}_0", inp)
    x1 = _conv(sd, f"pwc_model.conv{lvl}_1", x0)
    x2 = _conv(sd, f"pwc_model.conv{lvl}_2", torch.cat([x0, x1], 1))
    x3 = _conv(sd, f"pwc_model.conv{lvl}_3", torch.cat([x1, x2], 1))
    x4 = _conv(sd, f"pwc_model.conv{lvl}_4", torch.cat([x2, x3], 1))
    flow = _conv(sd, f"pwc_model.predict_flow{lvl}", torch.cat([x3, x4], 1), relu=False)
    return x4, flow


def pwc_decoder(sd, feats1, feats2, img_hw):
    up = lambda f: F.interpolate(f, scale_factor=2.0, mode="bilinear") * 2.0
    x4, flow6 = _estimate(sd, 6, corr(feats1[5], feats2[5]))
    flows = {6: flow6}
    prev = flow6
    for lvl, fidx in ((5, 4), (4, 3), (3, 2), (2, 1)):
        upf = up(prev)
        warped = warp(feats2[fidx], upf)
        inp = torch.cat([corr(feats1[fidx], warped), feats1[fidx], upf], 1)
        x4, res = _estimate(sd, lvl, inp)
        prev = res + upf
        flows[lvl] = prev
    x = torch.cat([flows[2], x4], 1)
    dil = [1, 2, 4, 8, 16, 1]
    for i in range(6):
        x = _conv(sd, f"pwc_model.dc_conv{i + 1}", x, dilation=dil[i])
    flows[2] = flows[2] + _conv(sd, "pwc_model.dc_conv7", x, relu=False)
    h, w = img_hw
    interp = lambda f, s: F.interpolate(f * 4.0, [h // s, w // s], mode="bilinear")
    return [interp(flows[2], 1), interp(flows[3], 2), interp(flows[4], 4), interp(flows[5], 8)]


def img_pyramid(img, n):
    h, w = img.shape[2], img.shape[3]
    return [
        F.adaptive_avg_pool2d(img, [int(h / 2**s), int(w / 2**s)]).data
        for s in range(n)
    ]


def ssim(x, y):
    pool = torch.nn.AvgPool2d(3, 1, padding=1)
    mx, my = pool(x), pool(y)
    sx, sy = pool(x**2) - mx**2, pool(y**2) - my**2
    sxy = pool(x * y) - mx * my
    return ((2 * mx * my + 1e-4) * (2 * sxy + 9e-4)) / (
        (mx**2 + my**2 + 1e-4) * (sx + sy + 9e-4)
    )


def loss_pack(sd, images, num_scales=3):
    """Full training forward: images (B, 3, 3H, W) -> 4 per-sample losses."""
    img_h, img_w = images.shape[2] // 3, images.shape[3]
    imgl, img, imgr = (
        images[:, :, :img_h],
        images[:, :, img_h : 2 * img_h],
        images[:, :, 2 * img_h :],
    )
    fl, fc, fr = (feature_pyramid(sd, i) for i in (imgl, img, imgr))
    flows_bwd = pwc_decoder(sd, fc, fl, (img_h, img_w))
    flows_fwd = pwc_decoder(sd, fc, fr, (img_h, img_w))
    n_lvl = len(flows_fwd)
    pyr_l, pyr_c, pyr_r = (img_pyramid(i, n_lvl) for i in (imgl, img, imgr))
    from_l = [warp(i, f, True) for i, f in zip(pyr_l, flows_bwd)]
    from_r = [warp(i, f, True) for i, f in zip(pyr_r, flows_fwd)]

    diff_bwd, diff_fwd, w_bwd, w_fwd = [], [], [], []
    for s in range(num_scales):
        vf = 1 - (from_r[s] == 0).prod(1, keepdim=True).float()
        vb = 1 - (from_l[s] == 0).prod(1, keepdim=True).float()
        dl = (pyr_c[s] - from_l[s]).abs().mean(1, True)
        dr = (pyr_c[s] - from_r[s]).abs().mean(1, True)
        wgt = (1 - F.softmax(torch.cat([dl, dr], 1), 1)).detach()
        wgt = 2 * torch.exp(-((wgt - 0.5) ** 2) / 0.03)
        w_bwd.append(wgt[:, 0:1] * vb)
        w_fwd.append(wgt[:, 1:2] * vf)
        diff_bwd.append(dl)
        diff_fwd.append(dr)

    def masked(diffs, occs):
        tot = 0
        for s in range(num_scales):
            div = occs[s].mean((1, 2, 3))
            tot = tot + (diffs[s] * occs[s].repeat(1, 3, 1, 1)).mean((1, 2, 3)) / (
                div + 1e-12
            )
        return tot

    def ssim_loss(imgs, warped, occs):
        tot = 0
        for s in range(num_scales):
            div = occs[s].mean((1, 2, 3))
            occ3 = occs[s].repeat(1, 3, 1, 1)
            sm = ssim(imgs[s] * occ3, warped[s] * occ3)
            tot = tot + torch.clamp((1 - sm) / 2.0, 0, 1).mean((1, 2, 3)) / (div + 1e-12)
        return tot

    def grad2(flow, img):
        gx = lambda t: t[:, :, :, 1:] - t[:, :, :, :-1]
        gy = lambda t: t[:, :, 1:, :] - t[:, :, :-1, :]
        wx = torch.exp(-10.0 * gx(img).abs().mean(1, True))
        wy = torch.exp(-10.0 * gy(img).abs().mean(1, True))
        dx2 = gx(gx(flow))
        dy2 = gy(gy(flow))
        return (
            (wx[:, :, :, 1:] * dx2.abs()).mean((1, 2, 3))
            + (wy[:, :, 1:, :] * dy2.abs()).mean((1, 2, 3))
        ) / 2.0

    def smooth(flows, imgs):
        return sum(grad2(flows[s] / 20.0, imgs[s]) for s in range(num_scales))

    def consis(fwd, bwd, occs):
        tot = 0
        for s in range(num_scales):
            fn = fwd[s] / (fwd[s].norm(2, 1, keepdim=True) + 1e-12)
            bn = (bwd[s] / (bwd[s].norm(2, 1, keepdim=True) + 1e-12)).detach()
            occ = 1 - occs[s]
            tot = tot + ((fn + bn).abs() * occ).mean((1, 2, 3)) / (
                occ.mean((1, 2, 3)) + 1e-12
            )
        return tot

    return {
        "loss_pixel": masked(diff_fwd, w_fwd) + masked(diff_bwd, w_bwd),
        "loss_ssim": ssim_loss(pyr_c, from_r, w_fwd) + ssim_loss(pyr_c, from_l, w_bwd),
        "loss_flow_smooth": smooth(flows_fwd, pyr_c) + smooth(flows_bwd, pyr_c),
        "loss_flow_consis": consis(flows_fwd, flows_bwd, w_fwd),
    }


def state_dict_from_params(params):
    from unopticalflow_tpu.utils.torch_convert import params_to_torch_state_dict

    return {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in params_to_torch_state_dict(params).items()
    }
