"""DropBlock regularization (Ghiasi et al. 2018).

Reference capability (SURVEY.md §2 item 2/3, §3.5): DropBlock in ResNet
stages 3-4 with ``block_size=7`` and a keep-prob linearly scheduled toward
its final value (``--dropblock_kp``) over training; a no-op at eval.

Implementation: sample Bernoulli "block centers" in the valid region with

    gamma = (1-kp)/bs^2 * fm^2/(fm-bs+1)^2

then expand each center to a bs x bs zero-block via a stride-1 max-pool
(``lax.reduce_window``), and rescale by count ratio so activations keep their
expectation. Fully jittable: keep_prob may be a traced scalar (the schedule
runs inside the train step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def dropblock(key, x, *, keep_prob, block_size: int = 7, train: bool,
              shared_channels: bool = True):
    """``shared_channels=True`` (default, and the TF-TPU reference behavior)
    samples one spatial mask per example shared across channels — C-fold fewer
    random bits and a broadcastable mask. ``False`` gives per-channel masks.

    TPU notes: the block expansion is a *separable* max pool (bs x 1 then
    1 x bs — 2*bs comparisons/element instead of bs^2), and the mask is
    sampled at (N,H,W,1) by default; together these took DropBlock from 36%
    of the assembled train step to noise. A fused Pallas variant with
    on-chip PRNG lives in axcnn.pallas.dropblock.
    """
    if not train:
        return x
    n, h, w, c = x.shape
    bs = min(block_size, h, w)
    kp = jnp.asarray(keep_prob, jnp.float32)

    gamma = ((1.0 - kp) / (bs * bs)) * ((h * w) / max((h - bs + 1) * (w - bs + 1), 1))

    # Valid center region: centers must allow a full bs x bs block inside fm.
    row = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, h, w, 1), 2)
    half0, half1 = (bs - 1) // 2, bs // 2
    valid = (
        (row >= half0) & (row < h - half1) & (col >= half0) & (col < w - half1)
    )

    mask_c = 1 if shared_channels else c
    seeds = jax.random.uniform(key, (n, h, w, mask_c), jnp.float32)
    centers = (seeds < gamma) & valid  # True = drop-center

    # Expand centers to blocks: separable max-pool of the indicator.
    block_hit = centers.astype(jnp.float32)
    for dims, pads in (((1, bs, 1, 1), ((0, 0), (half0, half1), (0, 0), (0, 0))),
                       ((1, 1, bs, 1), ((0, 0), (0, 0), (half0, half1), (0, 0)))):
        block_hit = lax.reduce_window(
            block_hit, 0.0, lax.max,
            window_dimensions=dims, window_strides=(1, 1, 1, 1), padding=pads)
    mask = 1.0 - block_hit  # 1 = keep

    denom = jnp.maximum(jnp.sum(mask), 1.0) * (c if shared_channels else 1)
    scale = (x.size / denom).astype(jnp.float32)
    return (x.astype(jnp.float32) * mask * scale).astype(x.dtype)


def dropblock_keep_prob(progress, final_keep_prob: float):
    """Linear 1.0 → final_kp schedule over training progress in [0, 1]."""
    p = jnp.clip(jnp.asarray(progress, jnp.float32), 0.0, 1.0)
    return 1.0 - p * (1.0 - final_keep_prob)
