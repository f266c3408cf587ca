"""Pooling primitives (NHWC)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _same_pads(size, kernel, stride):
    out = -(-size // stride)  # ceil
    pad_total = max((out - 1) * stride + kernel - size, 0)
    pad_beg = pad_total // 2
    return (pad_beg, pad_total - pad_beg)


def max_pool_same(x, *, window=3, stride=2):
    """TF 'SAME' max pool (the reference stem's 3x3/2 pool)."""
    ph = _same_pads(x.shape[1], window, stride)
    pw = _same_pads(x.shape[2], window, stride)
    # -inf init is required for autodiff to recognize the max monoid
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x,
        neg,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), ph, pw, (0, 0)),
    )


def avg_pool(x, *, window=2, stride=2, padding="VALID"):
    """Average pool; the ResNet-D downsample shortcut uses 2x2/2 VALID
    (with TF 'SAME' semantics when the spatial dim is odd)."""
    if padding == "SAME":
        ph = _same_pads(x.shape[1], window, stride)
        pw = _same_pads(x.shape[2], window, stride)
        pads = ((0, 0), ph, pw, (0, 0))
    else:
        pads = ((0, 0), (0, 0), (0, 0), (0, 0))
    x32 = x.astype(jnp.float32)
    summed = lax.reduce_window(
        x32,
        0.0,
        lax.add,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pads,
    )
    if padding == "SAME":
        # TF averages over the actual (unpadded) element count per window.
        ones = jnp.ones((1, x.shape[1], x.shape[2], 1), jnp.float32)
        counts = lax.reduce_window(
            ones, 0.0, lax.add,
            window_dimensions=(1, window, window, 1),
            window_strides=(1, stride, stride, 1),
            padding=pads,
        )
        summed = summed / counts
    else:
        summed = summed / float(window * window)
    return summed.astype(x.dtype)


def global_avg_pool(x, keepdims=False):
    """GAP over H,W in fp32 (feeds SE/SK attention and the classifier)."""
    y = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=keepdims)
    return y.astype(x.dtype)
