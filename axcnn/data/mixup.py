"""Batch-level mixup (Zhang et al. 2018) — device-side, jittable.

Parity target: the reference applies mixup at the batch level inside its
tf.data pipeline (``--mixup_type``; SURVEY.md §3.1). TPU-first, we move it
*inside the jitted train step*: the uint8 batch lands on device, is
normalized, then mixed with a reversed copy of itself — zero extra host work
and XLA fuses the lerp into the input normalization.

Labels are mixed in soft form; ``axcnn.train.losses`` consumes the pair
(labels, permuted labels, lam) so label smoothing composes exactly as
CE(lam*y1 + (1-lam)*y2) = lam*CE(y1) + (1-lam)*CE(y2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mixup_batch(key, images, labels, *, alpha: float = 0.2):
    """Returns (mixed_images, labels_a, labels_b, lam).

    One lambda per batch (the original-paper and reference recipe). The
    pairing permutation is the batch reversal — equivalent in distribution to
    a random permutation for a shuffled batch, and collective-free under
    data-parallel sharding (each shard mixes locally).
    """
    if alpha <= 0:
        return images, labels, labels, jnp.float32(1.0)
    lam = jax.random.beta(key, alpha, alpha, dtype=jnp.float32)
    # symmetrize so lam >= 0.5; removes the double-counting ambiguity
    lam = jnp.maximum(lam, 1.0 - lam)
    flipped = images[::-1]
    mixed = images * lam + flipped * (1.0 - lam)
    return mixed.astype(images.dtype), labels, labels[::-1], lam
