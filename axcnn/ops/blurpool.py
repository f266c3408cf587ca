"""Anti-alias BlurPool downsampling (Zhang 2019), TPU-native.

Reference capability (SURVEY.md §2 item 2/3, BASELINE config 2): a fixed
binomial low-pass filter applied depthwise before every stride-2 reduction,
gated by ``--anti_alias_type {sconv,proj,max,none}`` and
``--anti_alias_filter_size`` (default 3).

Implementation: a depthwise ``lax.conv_general_dilated`` with
``feature_group_count=C`` and the same explicit fixed-padding scheme as our
convs. The filter is a constant (not a parameter): it is never trained and is
excluded from weight decay / EMA by construction. XLA lowers depthwise convs
to VPU-friendly elementwise FMAs; a fused Pallas variant lives in
``axcnn.pallas.blurpool`` for the perf path.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from axcnn.ops.conv import fixed_pad_amounts


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
    c = x.shape[-1]
    k = jnp.asarray(blur_kernel(filter_size), x.dtype)
    # depthwise HWIO with feature_group_count=C: (H, W, 1, C)
    w = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    pad = fixed_pad_amounts(filter_size)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=(pad, pad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
