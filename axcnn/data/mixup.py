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


def mixup_batch(key, images, labels, *, alpha: float = 0.2,
                symmetric: bool = False):
    """Returns (mixed_images, labels_a, labels_b, lam).

    One lambda per batch (the original-paper and reference recipe: lam ~
    Beta(alpha, alpha), NOT symmetrized). The pairing permutation is the
    batch reversal — equivalent in distribution to a random permutation for
    a shuffled batch, and collective-free under data-parallel sharding (each
    shard mixes locally; the caller controls whether lam is shared across
    shards by where it draws ``key`` from).

    ``symmetric=True`` applies lam <- max(lam, 1-lam), halving the lambda
    distribution so the "primary" label always dominates. This is a
    deliberate DEVIATION from the reference recipe (kept from round 1 as an
    opt-in; see docs/PARITY.md) — default off for recipe parity.
    """
    if alpha <= 0:
        return images, labels, labels, jnp.float32(1.0)
    lam = jax.random.beta(key, alpha, alpha, dtype=jnp.float32)
    if symmetric:
        lam = jnp.maximum(lam, 1.0 - lam)
    flipped = images[::-1]
    mixed = images * lam + flipped * (1.0 - lam)
    return mixed.astype(images.dtype), labels, labels[::-1], lam
