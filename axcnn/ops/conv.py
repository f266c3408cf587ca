"""Convolution / dense primitives, NHWC, TPU-first.

Semantics parity notes (vs reference ``nets/resnet_model.py``-style
``conv2d_fixed_padding``; SURVEY.md §2 item 2):

The TF-official builder pads explicitly by ``(k-1)//2 , k-1-(k-1)//2`` and
runs a VALID conv when stride > 1 (so output geometry is input-size
independent), and uses SAME when stride == 1. For stride 1, SAME produces
exactly that same explicit padding; therefore a single explicit-padding conv
reproduces both paths bit-for-bit. We always emit the explicit form, which
XLA maps straight onto the MXU with no layout surprises.

Layout: NHWC activations, HWIO weights — the native TPU convolution layout.
Weights are stored fp32 and cast to the compute dtype at use (bf16 for
training; the MXU natively consumes bf16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.ad_checkpoint import checkpoint_name

_DIMSPEC = ("NHWC", "HWIO", "NHWC")


def he_normal(key, shape, dtype=jnp.float32):
    """He (fan-in, scale=2) truncated-normal init — TF official ResNet's
    ``variance_scaling_initializer`` lineage."""
    fan_in = shape[0] * shape[1] * shape[2] if len(shape) == 4 else shape[0]
    std = (2.0 / fan_in) ** 0.5
    # truncated normal at 2 sigma, corrected std (matches TF semantics)
    x = jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)
    return (x * std / 0.87962566103423978).astype(dtype)


def conv_init(key, kernel_size, in_ch, out_ch, *, dtype=jnp.float32):
    if isinstance(kernel_size, int):
        kernel_size = (kernel_size, kernel_size)
    w = he_normal(key, (*kernel_size, in_ch, out_ch), dtype)
    return {"w": w}


def fixed_pad_amounts(kernel_size: int, dilation: int = 1):
    eff = dilation * (kernel_size - 1) + 1
    pad_total = eff - 1
    pad_beg = pad_total // 2
    return (pad_beg, pad_total - pad_beg)


def _dynamic_int8_conv(x, w, *, stride, dilation, groups, pad, out_dtype):
    """Serving-path conv: symmetric dynamic int8 quantization.

    Per-TENSOR activation scale (one fp32 max-abs reduction, computed on the
    fly each batch — no calibration state to manage) and per-OUT-CHANNEL
    weight scales (weights are static, so the per-channel precision is free).
    The int8xint8->int32 conv runs on the MXU's double-rate int8 path; the
    dequantize is one fused elementwise multiply. Symmetric (no zero point)
    keeps the conv free of zero-point correction terms.
    """
    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-12) / 127.0
    xq = jnp.round(xf / sx).astype(jnp.int8)  # max-abs scaling: already in range
    wq = jnp.round(wf / sw).astype(jnp.int8)
    acc = lax.conv_general_dilated(
        xq,
        wq,
        window_strides=(stride, stride),
        padding=pad,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMSPEC,
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (sx * sw)).astype(out_dtype)


def conv_apply(params, x, *, stride=1, dilation=1, groups=1, compute_dtype=None,
               quantize=False):
    """2-D conv, explicit TF-``fixed_padding`` scheme (see module docstring).

    ``quantize=True`` (Policy.quantize_conv, serving only) routes through the
    dynamic int8 path instead of the float MXU path.
    """
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    else:
        w = w.astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    pad = (fixed_pad_amounts(kh, dilation), fixed_pad_amounts(kw, dilation))
    if quantize:
        return checkpoint_name(
            _dynamic_int8_conv(x, w, stride=stride, dilation=dilation,
                               groups=groups, pad=pad, out_dtype=x.dtype),
            "conv_out")
    # fp32 means fp32: request full precision so the fp32 parity path is not
    # silently computed in bf16 passes. bf16 inputs keep the native MXU path.
    precision = lax.Precision.HIGHEST if w.dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=pad,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMSPEC,
        feature_group_count=groups,
        precision=precision,
    )
    # Inert identity tag; under ModelConfig.remat='conv' the block-level
    # jax.checkpoint policy saves exactly these (compute-dtype) conv outputs
    # as backward residuals and recomputes the BN/ReLU/attention chains,
    # which at the HBM roofline trades free VPU FLOPs for saved bytes.
    return checkpoint_name(y, "conv_out")


def dense_init(key, in_ch, out_ch, *, stddev=0.01, dtype=jnp.float32):
    """Final classifier head — reference uses normal(stddev=.01) + zero bias."""
    kw, _ = jax.random.split(key)
    return {
        "w": (jax.random.normal(kw, (in_ch, out_ch), jnp.float32) * stddev).astype(dtype),
        "b": jnp.zeros((out_ch,), dtype),
    }


def dense_apply(params, x, *, compute_dtype=None):
    w, b = params["w"], params["b"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        b = b.astype(compute_dtype)
    else:
        w = w.astype(x.dtype)
        b = b.astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype) + b
