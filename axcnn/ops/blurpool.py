"""Anti-alias BlurPool downsampling (Zhang 2019), TPU-native.

Reference capability (SURVEY.md §2 item 2/3, BASELINE config 2): a fixed
binomial low-pass filter applied depthwise before every stride-2 reduction,
gated by ``--anti_alias_type {sconv,proj,max,none}`` and
``--anti_alias_filter_size`` (default 3).

Two implementations behind one interface (SURVEY.md §7.1):

- XLA (semantics reference): a depthwise ``lax.conv_general_dilated`` with
  ``feature_group_count=C`` and the same explicit fixed-padding scheme as
  our convs.
- Pallas (``axcnn.pallas.blurpool``): even/odd-phase VPU kernel with a
  matching hand-derived Pallas backward — bit-identical to the XLA conv in
  fp32 on CPU/interpret; on the TPU the Pallas kernel does true fp32 VPU
  math while XLA's ``Precision.HIGHEST`` conv is multi-pass MXU emulation
  (agree to ~2e-7; scripts/tpu_selftest.py — the Pallas kernel is the more
  exact one). NOT selected by ``auto`` dispatch: measured on the real
  chip, the pallas_call boundary breaks XLA's fusion around each BlurPool
  site and regresses the (HBM-bound) step 80.2→87.9 ms; ``AXCNN_PALLAS=on``
  forces it (numbers in docs/DESIGN.md).

The filter is a constant (not a parameter): it is never trained and is
excluded from weight decay / EMA by construction.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax
from jax.ad_checkpoint import checkpoint_name

from axcnn.ops.conv import fixed_pad_amounts
from axcnn.ops.dispatch import use_pallas


def blur_kernel(filter_size: int = 3) -> np.ndarray:
    """Normalized 2-D binomial kernel, e.g. size 3 → outer([1,2,1])/16."""
    if filter_size < 1 or filter_size > 7:
        raise ValueError(f"anti_alias_filter_size must be in [1,7], got {filter_size}")
    a = np.array([1.0])
    for _ in range(filter_size - 1):
        a = np.convolve(a, [1.0, 1.0])
    k2d = np.outer(a, a)
    return (k2d / k2d.sum()).astype(np.float32)


def blur_pool(x, *, stride: int = 2, filter_size: int = 3):
    """Depthwise blur + stride-``stride`` subsample, NHWC."""
    if use_pallas("blurpool"):
        from axcnn.pallas.blurpool import blurpool_supported, blur_pool_pallas_grad

        if blurpool_supported(x, stride=stride, filter_size=filter_size):
            # same residual tag as the XLA path so remat='conv' saves the
            # stride-2 output regardless of dispatch mode
            return checkpoint_name(blur_pool_pallas_grad(x), "conv_out")
    c = x.shape[-1]
    k = jnp.asarray(blur_kernel(filter_size), x.dtype)
    # depthwise HWIO with feature_group_count=C: (H, W, 1, C)
    w = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    pad = fixed_pad_amounts(filter_size)
    # fp32 means fp32 (same rule as ops/conv.py): on TPU the default conv
    # precision is bf16 passes, which for fp32 inputs would silently lose
    # ~3 decimal digits (measured 3e-3 abs on N(0,1) inputs vs the exact
    # fp32 Pallas kernel — scripts/tpu_selftest.py).
    precision = lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=(pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=precision,
    )
    # Saved under remat='conv': BlurPool is linear (constant filter), so its
    # backward never needs the primal input — saving the stride-2 output (4x
    # smaller) lets the following conv's weight-grad read it directly instead
    # of rematerializing the blur from the mid-conv chain.
    return checkpoint_name(y, "conv_out")
