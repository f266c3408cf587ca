"""Pallas TPU kernel: anti-alias BlurPool (3x3 binomial, stride 2).

Replaces the XLA depthwise-conv lowering of ``axcnn.ops.blurpool`` — the
profile showed XLA's depthwise conv costing ~11 ms/step on the assembled
ResNet-50 even though BlurPool touches <2 MB per call; a bandwidth-shaped
VPU kernel is the right tool.

Formulation (no strided loads — Mosaic-friendly):
With TF fixed padding (1,1) and stride 2 on even H, W:

    out[i,j] = sum_{a,b in 0..2} w[a] w[b] x[2i-1+a, 2j-1+b],  w = [1,2,1]/4

Split rows into even/odd phases: x[2i]=E[i], x[2i+1]=O[i]. The row pass is
    t[i] = (O[i-1] + 2 E[i] + O[i]) / 4        (O[-1] = 0)
— a reshape to (H/2, 2, W, C), two static slices, one shift (concat), and
adds. Same again for columns. Everything is VPU elementwise work on
contiguous tiles; the C (lane) dimension is untouched.

Grid: one program per batch element; the whole (H, W, C) slice lives in VMEM
(largest real use is the stem 'max' path at 112x112x64 fp32 = 3.2 MB; the
sconv/proj uses are <=1.6 MB). Accumulation in fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_down(a):
    """b[i] = a[i-1] along axis 0 (zero at i=0)."""
    return jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]], axis=0)


def _shift_right(a):
    """b[:, j] = a[:, j-1] along axis 1 (zero at j=0)."""
    return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)


def _blur3_s2_kernel(x_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)  # (H, W, C)
    h, w, c = x.shape
    # rows: t = (O[i-1] + 2 E[i] + O[i]) / 4
    xr = x.reshape(h // 2, 2, w, c)
    e, o = xr[:, 0], xr[:, 1]
    t = (_shift_down(o) + 2.0 * e + o) * 0.25  # (H/2, W, C)
    # cols: out = (O'[j-1] + 2 E'[j] + O'[j]) / 4
    tc = t.reshape(h // 2, w // 2, 2, c)
    e2, o2 = tc[:, :, 0], tc[:, :, 1]
    out = (_shift_right(o2) + 2.0 * e2 + o2) * 0.25  # (H/2, W/2, C)
    o_ref[0] = out.astype(o_ref.dtype)


def blurpool_supported(x, *, stride: int = 2, filter_size: int = 3) -> bool:
    if stride != 2 or filter_size != 3 or x.ndim != 4:
        return False
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        return False
    # whole-sample block must fit comfortably in VMEM (fp32 accumulation)
    return h * w * c * 4 <= 8 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def blur_pool_pallas(x, *, interpret: bool = False):
    """3x3/2 BlurPool, NHWC. Semantics identical to
    ``axcnn.ops.blurpool.blur_pool(x, stride=2, filter_size=3)``."""
    n, h, w, c = x.shape
    return pl.pallas_call(
        _blur3_s2_kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h // 2, w // 2, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c), x.dtype),
        interpret=interpret,
    )(x)


# ---------------------------------------------------------------------------
# backward kernel: dx = Dᵀ g for the linear map D = blur3 ∘ subsample2.
#
# Per axis (w = [1,2,1]/4, stride 2, pad (1,1), even extent): input pixel p
# contributes to output i iff 2i-1+a = p for a tap a∈{0,1,2}, so
#   even p: only a=1 → dx[2i]   = (2/4)·g[i]
#   odd  p: a∈{0,2}  → dx[2i+1] = (1/4)·(g[i] + g[i+1]),  g[H/2] ≡ 0
# — an interleave of two cheap VPU expressions, applied per axis.
# ---------------------------------------------------------------------------

def _shift_up(a):
    """b[i] = a[i+1] along axis 0 (zero at the end)."""
    return jnp.concatenate([a[1:], jnp.zeros_like(a[:1])], axis=0)


def _shift_left(a):
    """b[:, j] = a[:, j+1] along axis 1 (zero at the end)."""
    return jnp.concatenate([a[:, 1:], jnp.zeros_like(a[:, :1])], axis=1)


def _blur3_s2_bwd_kernel(g_ref, o_ref):
    g = g_ref[0].astype(jnp.float32)  # (H/2, W/2, C)
    hh, hw, c = g.shape
    # cols first (mirror of the forward's row-then-col order; D is separable
    # so the order is irrelevant mathematically)
    e = 0.5 * g
    o = 0.25 * (g + _shift_left(g))
    t = jnp.stack([e, o], axis=2).reshape(hh, 2 * hw, c)  # (H/2, W, C)
    e2 = 0.5 * t
    o2 = 0.25 * (t + _shift_up(t))
    dx = jnp.stack([e2, o2], axis=1).reshape(2 * hh, 2 * hw, c)
    o_ref[0] = dx.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def blur_pool_pallas_bwd(g, *, interpret: bool = False):
    """Transpose of blur_pool_pallas: cotangent (N,H/2,W/2,C) → (N,H,W,C)."""
    n, hh, hw, c = g.shape
    return pl.pallas_call(
        _blur3_s2_bwd_kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, hh, hw, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 2 * hh, 2 * hw, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 2 * hh, 2 * hw, c), g.dtype),
        interpret=interpret,
    )(g)


@jax.custom_vjp
def blur_pool_pallas_grad(x):
    """blur_pool_pallas with a Pallas backward (both directions stay off the
    XLA depthwise-conv lowering). Used by the ops-level dispatch."""
    return blur_pool_pallas(x)


def _bp_fwd(x):
    return blur_pool_pallas(x), None


def _bp_bwd(_, g):
    return (blur_pool_pallas_bwd(g),)


blur_pool_pallas_grad.defvjp(_bp_fwd, _bp_bwd)
