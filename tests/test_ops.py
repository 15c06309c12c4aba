"""Unit tests for core ops against torch-CPU oracles.

Each oracle below is an independent torch expression of the documented
reference semantics (grid_sample defaults, AvgPool2d divisors, interpolate
half-pixel rule, adaptive pooling) used purely as a numerical ground truth.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from unopticalflow_tpu.ops import (
    adaptive_avg_pool,
    avg_pool_pyramid,
    bilinear_warp,
    cost_volume_xla,
    resize_bilinear,
    ssim,
    upsample2x_double,
)

RNG = np.random.RandomState(0)


def nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def to_nhwc(t_nchw):
    return np.transpose(t_nchw.detach().numpy(), (0, 2, 3, 1))


def torch_warp(x_nhwc, flow_nhwc, use_mask):
    """Oracle: mesh-grid + (W-1)-normalized grid_sample, torch-1.2 defaults."""
    x = nchw(x_nhwc)
    flow = nchw(flow_nhwc)
    b, _, h, w = x.shape
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack([gx, gy]).float()[None].repeat(b, 1, 1, 1)
    v = grid + flow
    v = torch.stack(
        [2.0 * v[:, 0] / max(w - 1, 1) - 1.0, 2.0 * v[:, 1] / max(h - 1, 1) - 1.0], 1
    )
    v = v.permute(0, 2, 3, 1)
    out = F.grid_sample(x, v, align_corners=True)
    if use_mask:
        mask = F.grid_sample(torch.ones_like(x), v, align_corners=True)
        mask = (mask >= 0.9999).float()
        out = out * mask
    return to_nhwc(out)


@pytest.mark.parametrize("use_mask", [False, True])
@pytest.mark.parametrize("channels", [3, 32])  # image-like and feature-like
def test_warp_matches_grid_sample(use_mask, channels):
    img = RNG.randn(2, 13, 17, channels).astype(np.float32)
    flow = (RNG.randn(2, 13, 17, 2) * 4.0).astype(np.float32)
    got = np.asarray(bilinear_warp(jnp.asarray(img), jnp.asarray(flow), use_mask))
    want = torch_warp(img, flow, use_mask)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_warp_integer_shift():
    # shifting a ramp right by 3 px must reproduce values 3 columns over
    img = np.tile(np.arange(10, dtype=np.float32)[None, None, :, None], (1, 10, 1, 1))
    flow = np.zeros((1, 10, 10, 2), dtype=np.float32)
    flow[..., 0] = 3.0
    out = np.asarray(bilinear_warp(jnp.asarray(img), jnp.asarray(flow), False))
    np.testing.assert_allclose(out[0, :, :7, 0], img[0, :, 3:, 0])
    np.testing.assert_allclose(out[0, :, 7:, 0], 0.0)  # zero padding outside


def test_cost_volume_matches_torch():
    f1 = RNG.randn(2, 9, 11, 7).astype(np.float32)
    f2 = RNG.randn(2, 9, 11, 7).astype(np.float32)
    d = 3
    t1, t2 = nchw(f1), nchw(f2)
    t2p = F.pad(t2, (d, d, d, d))
    planes = []
    for i in range(2 * d + 1):
        for j in range(2 * d + 1):
            planes.append((t1 * t2p[:, :, i : i + 9, j : j + 11]).mean(1, keepdim=True))
    want = to_nhwc(torch.cat(planes, 1))
    got = np.asarray(cost_volume_xla(jnp.asarray(f1), jnp.asarray(f2), md=d))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_ssim_matches_torch():
    x = RNG.rand(2, 12, 16, 3).astype(np.float32)
    y = RNG.rand(2, 12, 16, 3).astype(np.float32)
    tx, ty = nchw(x), nchw(y)
    pool = torch.nn.AvgPool2d(3, 1, padding=1)
    mx, my = pool(tx), pool(ty)
    sx = pool(tx**2) - mx**2
    sy = pool(ty**2) - my**2
    sxy = pool(tx * ty) - mx * my
    want = to_nhwc(
        ((2 * mx * my + 1e-4) * (2 * sxy + 9e-4))
        / ((mx**2 + my**2 + 1e-4) * (sx + sy + 9e-4))
    )
    got = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(8, 16), (6, 13), (5, 7)])
def test_adaptive_avg_pool_matches_torch(out_hw):
    x = RNG.randn(2, 16, 26, 3).astype(np.float32)
    want = to_nhwc(F.adaptive_avg_pool2d(nchw(x), out_hw))
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pyramid_shapes_and_values():
    x = RNG.rand(1, 32, 64, 3).astype(np.float32)
    pyr = avg_pool_pyramid(jnp.asarray(x), 4)
    assert [p.shape for p in pyr] == [
        (1, 32, 64, 3),
        (1, 16, 32, 3),
        (1, 8, 16, 3),
        (1, 4, 8, 3),
    ]
    want = to_nhwc(F.adaptive_avg_pool2d(nchw(x), (8, 16)))
    np.testing.assert_allclose(np.asarray(pyr[2]), want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("out_hw", [(26, 34), (13, 17), (20, 40)])
def test_resize_matches_interpolate(out_hw):
    x = RNG.randn(2, 13, 17, 3).astype(np.float32)
    want = to_nhwc(
        F.interpolate(nchw(x), size=out_hw, mode="bilinear", align_corners=False)
    )
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upsample2x_double():
    x = RNG.randn(1, 8, 12, 2).astype(np.float32)
    want = to_nhwc(
        F.interpolate(nchw(x), scale_factor=2.0, mode="bilinear", align_corners=False)
        * 2.0
    )
    got = np.asarray(upsample2x_double(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("use_mask", [False, True])
def test_warp_gradients_match_torch(use_mask):
    """VJPs of bilinear_warp (img AND flow) vs torch grid_sample autodiff.

    Exercises the custom-VJP gather (_gather_hw_diff: flat-take forward,
    batched-scatter backward) on the differentiable decoder-warp path.
    """
    import jax

    rng = np.random.RandomState(7)
    img = rng.randn(2, 9, 13, 4).astype(np.float32)
    # keep sampling positions off exact integers where the bilinear kink
    # makes the subgradient convention-dependent
    flow = (rng.randn(2, 9, 13, 2) * 3.0 + 0.3).astype(np.float32)
    g = rng.randn(2, 9, 13, 4).astype(np.float32)  # fixed cotangent

    # torch oracle
    x = nchw(img).requires_grad_(True)
    fl = nchw(flow).requires_grad_(True)
    b, _, h, w = x.shape
    gy, gx = torch.meshgrid(torch.arange(h), torch.arange(w), indexing="ij")
    grid = torch.stack([gx, gy]).float()[None].repeat(b, 1, 1, 1)
    v = grid + fl
    v = torch.stack(
        [2.0 * v[:, 0] / max(w - 1, 1) - 1.0, 2.0 * v[:, 1] / max(h - 1, 1) - 1.0], 1
    ).permute(0, 2, 3, 1)
    out = F.grid_sample(x, v, align_corners=True)
    if use_mask:
        with torch.no_grad():
            m = F.grid_sample(torch.ones_like(x), v, align_corners=True)
            m = (m >= 0.9999).float()
        out = out * m
    out.backward(nchw(g))
    want_dimg = to_nhwc(x.grad)
    want_dflow = to_nhwc(fl.grad)

    # jax VJP through the custom-VJP gather
    _, vjp = jax.vjp(
        lambda i, f: bilinear_warp(i, f, use_mask), jnp.asarray(img), jnp.asarray(flow)
    )
    got_dimg, got_dflow = vjp(jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(got_dimg), want_dimg, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dflow), want_dflow, rtol=1e-4, atol=1e-3)


def test_gather_hw_diff_vjp_matches_autodiff():
    """The hand-written scatter VJP equals take_along_axis autodiff exactly."""
    import jax

    from unopticalflow_tpu.ops.warp import _gather_hw, _gather_hw_diff

    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.randn(3, 6, 8, 5).astype(np.float32))
    iy = jnp.asarray(rng.randint(0, 6, (3, 4, 7)), jnp.int32)
    ix = jnp.asarray(rng.randint(0, 8, (3, 4, 7)), jnp.int32)
    g = jnp.asarray(rng.randn(3, 4, 7, 5).astype(np.float32))

    out, vjp = jax.vjp(lambda im: _gather_hw_diff(im, iy, ix), img)
    ref_out, ref_vjp = jax.vjp(lambda im: _gather_hw(im, iy, ix), img)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref_out))
    np.testing.assert_allclose(
        np.asarray(vjp(g)[0]), np.asarray(ref_vjp(g)[0]), rtol=1e-6, atol=1e-6
    )


def test_warp_gather_u32_path_matches():
    """The u32-bitcast gather path is bit-identical to the bf16 gather."""
    rng = np.random.RandomState(5)
    img = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32), jnp.bfloat16)
    flow = jnp.asarray(rng.uniform(-6, 6, (2, 16, 24, 2)).astype(np.float32))
    a = bilinear_warp(img, flow, use_mask=True, gather_u32=False)
    b = bilinear_warp(img, flow, use_mask=True, gather_u32=True)
    np.testing.assert_array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))


def test_warp_gather_u8_path_close():
    """u8-quantized loss-warp gathers: exact for 8-bit-sourced images,
    <= 1/510 per-channel otherwise (ops/warp.py::_gather_corners)."""
    rng = np.random.RandomState(7)
    # 8-bit-sourced image: quantization is exact, only the bf16 dequant
    # rounding differs from the bf16 input rounding (1 ulp)
    img8 = rng.randint(0, 256, (2, 16, 24, 3)).astype(np.float32) / 255.0
    img = jnp.asarray(img8, jnp.bfloat16)
    flow = jnp.asarray(rng.uniform(-6, 6, (2, 16, 24, 2)).astype(np.float32))
    a = bilinear_warp(img, flow, use_mask=True, gather_u32=True)
    b = bilinear_warp(img, flow, use_mask=True, gather_u8=True)
    np.testing.assert_allclose(
        np.asarray(a, np.float32), np.asarray(b, np.float32),
        rtol=0, atol=2.0 / 255.0,
    )
    # arbitrary [0,1] image in f32: bounded by the quantization step
    imgf = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32))
    af = bilinear_warp(imgf, flow, use_mask=True)
    bf = bilinear_warp(imgf, flow, use_mask=True, gather_u8=True)
    assert bf.dtype == imgf.dtype
    np.testing.assert_allclose(
        np.asarray(af), np.asarray(bf), rtol=0, atol=2.5 / 255.0
    )


def test_flow_model_quantized_loss_warps_close():
    """The quantize_loss_warps config produces the same loss pack within
    quantization tolerance (both fused and XLA photometric paths)."""
    import jax

    from unopticalflow_tpu.models import FlowModelConfig, init_flow_model
    from unopticalflow_tpu.models.flow_model import forward

    rng = np.random.RandomState(3)
    b, h, w = 2, 64, 128
    images = jnp.asarray(
        rng.randint(0, 256, (b, 3 * h, w, 3)).astype(np.float32) / 255.0
    )
    params = init_flow_model(jax.random.PRNGKey(0))
    base = FlowModelConfig(num_scales=3)
    quant = base._replace(quantize_loss_warps=True)
    ref = forward(params, base, images)
    got = forward(params, quant, images)
    for k in ref:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(ref[k]), rtol=0.02, atol=5e-3
        )


def test_warp_corners_cm_matches_packed():
    """Channel-major corner fetch carries the exact same bf16 corner values
    as the row-major packed gather (ops/warp.py::warp_corners_cm)."""
    import jax

    from unopticalflow_tpu.ops.warp import warp_corners, warp_corners_cm

    rng = np.random.RandomState(11)
    img = jnp.asarray(rng.rand(2, 16, 24, 3).astype(np.float32), jnp.bfloat16)
    flow = jnp.asarray(rng.uniform(-7, 7, (2, 16, 24, 2)).astype(np.float32))
    packed = warp_corners(img, flow, gather_u32=True)  # (B, H, W, 12)
    cm = warp_corners_cm(img, flow)  # (6, B, H, W) u32
    unpacked = jax.lax.bitcast_convert_type(
        cm.transpose(1, 2, 3, 0), jnp.bfloat16
    ).reshape(packed.shape)
    np.testing.assert_array_equal(
        np.asarray(unpacked, np.float32), np.asarray(packed, np.float32)
    )


def test_bilinear_warp_nchw_matches_nhwc():
    """bilinear_warp_nchw == transpose(bilinear_warp): forward bit-equal,
    grads equal up to scatter-accumulation order (ops/warp.py)."""
    import jax

    from unopticalflow_tpu.ops.warp import bilinear_warp, bilinear_warp_nchw

    rng = np.random.RandomState(3)
    for dt, tol in ((jnp.float32, 2e-6), (jnp.bfloat16, 5e-2)):
        img = jnp.asarray(rng.randn(2, 16, 24, 12).astype(np.float32), dt)
        flow = jnp.asarray(rng.uniform(-6, 6, (2, 16, 24, 2)).astype(np.float32))
        a = bilinear_warp(img, flow, use_mask=False)
        b = bilinear_warp_nchw(img, flow).transpose(0, 2, 3, 1)
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32)
        )

        def la(i, f):
            return jnp.sum(
                bilinear_warp(i, f, use_mask=False).astype(jnp.float32) ** 2
            )

        def lb(i, f):
            return jnp.sum(
                bilinear_warp_nchw(i, f)
                .transpose(0, 2, 3, 1)
                .astype(jnp.float32) ** 2
            )

        ga = jax.grad(la, (0, 1))(img, flow)
        gb = jax.grad(lb, (0, 1))(img, flow)
        for x, y in zip(ga, gb):
            np.testing.assert_allclose(
                np.asarray(x, np.float32), np.asarray(y, np.float32),
                rtol=tol, atol=tol,
            )


def test_warp_bf16_flow_coords_stay_f32():
    """bf16 flow must not quantize sampling coordinates (ops/warp.py::_coords_f32).

    Regression: coordinates were computed in flow.dtype, so under bf16 the
    ulp of x = gx + flow_x near W=832 is 4 px and the fractional bilinear
    weights collapse to 0 over most of the frame — photometric gradients
    w.r.t. flow vanish and production-recipe training silently stalls
    (round-4 synthetic-EPE campaign, benchmarks/synth_epe_r04/).
    """
    import jax

    w = 832
    # O(1)-amplitude pattern: adjacent-pixel differences survive bf16
    # value quantization, isolating the *coordinate* precision under test
    vals = np.sin(np.arange(w, dtype=np.float32) * 1.7)
    img = np.tile(vals[None, None, :, None], (1, 8, 1, 1))
    flow = np.zeros((1, 8, w, 2), dtype=np.float32)
    flow[..., 0] = 0.5  # half-pixel shift: pure fractional sampling
    out16 = bilinear_warp(
        jnp.asarray(img, jnp.bfloat16), jnp.asarray(flow, jnp.bfloat16), False
    )
    # interior: value at x must be (img[x] + img[x+1]) / 2, including the
    # right side of the frame (x in [512, 830): bf16 coord ulp there is
    # 4.0 px — the buggy path returned img[x] exactly)
    got = np.asarray(out16[0, 0, :-2, 0], np.float32)
    want = (vals[:-2] + vals[1:-1]) / 2.0
    np.testing.assert_allclose(got, want, atol=2e-2)
    buggy = vals[:-2]  # what coordinate-quantized sampling returns
    assert np.abs(got - buggy).max() > 0.3, "test not sensitive to the bug"

    # gradient w.r.t. flow must not vanish on the right half of the frame
    def loss(f):
        warped = bilinear_warp(jnp.asarray(img, jnp.bfloat16), f, False)
        return jnp.sum(warped.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(jnp.asarray(flow, jnp.bfloat16))
    g_right = np.abs(np.asarray(g[0, :, w // 2 : -2, 0], np.float32))
    assert (g_right > 0).mean() > 0.99, "flow gradient vanished on right half"
