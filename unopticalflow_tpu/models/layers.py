"""Functional conv blocks and PyTorch-compatible initialization.

Parameters live in plain nested dicts (pytrees) — no module state — so the
whole model is a pure function ``f(params, x)`` that jit/grad/shard_map
compose over.  Weight layout is HWIO (TPU-native); the torch-checkpoint
converter transposes from OIHW (see utils/torch_convert.py).

Initialization (scheme="torch", the default) matches torch.nn.Conv2d
defaults (kaiming_uniform(a=sqrt(5)) for weights, uniform(+-1/sqrt(fan_in))
for bias — both reduce to uniform(+-1/sqrt(fan_in))), which is what the
reference trains from (net_utils.py:7-14 builds plain Conv2d blocks with
default init; the kaiming override blocks at feature_pyramid.py:22-28 and
pwc_tf.py:83-89 are commented out).

scheme="pwc" is the official PWC-Net initialization (kaiming_normal,
mode=fan_in, with the LeakyReLU(0.1) gain; zero bias).  Measured at init on
this network, torch-default init collapses the *input-dependent* feature
signal by ~0.41x per conv while biases re-inject O(1e-2) constants every
layer: after the 12-conv pyramid the signal std is 1.9e-7 vs a 8.7e-3 bias
floor, the cost volume (quadratic in features) carries ~1e-10 of signal, and
the decoder output is input-independent to 4e-6 px — the net is born blind
and Adam at lr 1e-4 cannot escape at <=12k-iter horizons (every synth-EPE leg in
benchmarks/synth_epe_r0{4,5} plateaued at the constant-predictor optimum,
*including supervised L1 probes*).  kaiming_normal keeps the signal std at
1.3e-2 at the coarsest level and the same probes learn.  Use "pwc" for
from-scratch training; "torch" is kept as the default for bit-parity with
reference checkpoints and trajectories.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LEAKY_SLOPE = 0.1  # nn.LeakyReLU(0.1), net_utils.py:11 / pwc_tf.py:21


def conv_init(
    key, in_ch: int, out_ch: int, ksize: int = 3, dtype=jnp.float32,
    scheme: str = "torch",
):
    """Initialize one conv's {w: HWIO, b}; scheme in {"torch", "pwc"}."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * ksize * ksize
    if scheme == "pwc":
        # kaiming_normal(mode=fan_in) with the LeakyReLU(0.1) gain; zero bias.
        std = math.sqrt(2.0 / (1.0 + LEAKY_SLOPE**2)) / math.sqrt(fan_in)
        w = std * jax.random.normal(kw, (ksize, ksize, in_ch, out_ch), dtype)
        return {"w": w, "b": jnp.zeros((out_ch,), dtype)}
    if scheme != "torch":
        raise ValueError(f"unknown init scheme {scheme!r} (torch|pwc)")
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(
        kw, (ksize, ksize, in_ch, out_ch), dtype, minval=-bound, maxval=bound
    )
    b = jax.random.uniform(kb, (out_ch,), dtype, minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def raw_conv(x, w, stride=1, padding=None, dilation=1):
    """conv_general_dilated with this framework's dtype/precision policy.

    float32 inputs must not be silently truncated to bf16 by the default
    precision; explicit bf16 compute is requested via compute_dtype instead.
    For bf16 inputs, the MXU accumulates in fp32 internally; requesting an
    f32 preferred_element_type there breaks the conv transpose (VJP) rule.
    """
    if padding is None:
        pad = dilation * (w.shape[0] // 2)
        padding = ((pad, pad), (pad, pad))
    f32_in = x.dtype == jnp.float32
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if f32_in else None,
        precision=jax.lax.Precision.HIGHEST if f32_in else jax.lax.Precision.DEFAULT,
    )


def conv_apply(
    p,
    x: jax.Array,
    stride: int = 1,
    dilation: int = 1,
    compute_dtype=None,
) -> jax.Array:
    """3x3 conv, SAME-style padding = dilation (torch padding=d convention)."""
    w = p["w"]
    b = p["b"]
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        x = x.astype(compute_dtype)
    out = raw_conv(x, w, stride=stride, dilation=dilation)
    out = out.astype(x.dtype) + b.astype(x.dtype)
    return out


def conv_block(p, x, stride=1, dilation=1, compute_dtype=None):
    """conv + LeakyReLU(0.1) — the reference's ``conv`` helper."""
    out = conv_apply(p, x, stride=stride, dilation=dilation, compute_dtype=compute_dtype)
    return jax.nn.leaky_relu(out, LEAKY_SLOPE)


def deconv_init(key, in_ch: int, out_ch: int, ksize: int = 4, dtype=jnp.float32):
    """Transposed-conv params (the reference defines ``deconv`` at
    net_utils.py:13-14; unused by its live path, kept for API parity)."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * ksize * ksize
    bound = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(
        kw, (ksize, ksize, out_ch, in_ch), dtype, minval=-bound, maxval=bound
    )
    b = jax.random.uniform(kb, (out_ch,), dtype, minval=-bound, maxval=bound)
    return {"w": w, "b": b}


def deconv_apply(p, x: jax.Array, stride: int = 2, padding: int = 1) -> jax.Array:
    """ConvTranspose2d(k=4, s=2, p=1)-equivalent upsampling conv (NHWC)."""
    w = p["w"]
    k = w.shape[0]
    # kernel stored (k, k, out, in); with transpose_kernel=True and HWIO
    # dimension numbers this reproduces torch ConvTranspose2d exactly, with
    # jax padding = k - 1 - torch_padding
    out = jax.lax.conv_transpose(
        x,
        w,
        strides=(stride, stride),
        padding=((k - 1 - padding, k - 1 - padding),) * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True,
    )
    return out + p["b"].astype(out.dtype)
