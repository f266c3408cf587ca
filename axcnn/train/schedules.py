"""Learning-rate schedules: linear warmup → cosine / step / constant.

Parity target (SURVEY.md §3.1, §5.6): the reference's
``learning_rate_decay_type {cosine, step}`` with ~5-epoch linear warmup and a
base LR scaled by global batch (0.1 * bs/256 lineage). All schedules are pure
functions of the (traced) step so they live inside the jitted train step.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def make_lr_schedule(
    *,
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    decay_type: str = "cosine",
    boundaries=(0.3, 0.6, 0.8),
    decay_rate: float = 0.1,
    end_lr: float = 0.0,
):
    """Returns ``lr(step) -> fp32 scalar`` (step may be traced).

    decay_type:
      - 'cosine': half-cosine from base_lr to end_lr after warmup
      - 'step'  : piecewise * decay_rate^k at the given progress boundaries
      - 'constant'
    """
    if decay_type not in ("cosine", "step", "constant"):
        raise ValueError(f"unknown decay_type {decay_type!r}")
    total_steps = max(int(total_steps), 1)
    warmup_steps = min(int(warmup_steps), total_steps)

    def lr(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / max(warmup_steps, 1)
        decay_progress = (step - warmup_steps) / max(total_steps - warmup_steps, 1)
        decay_progress = jnp.clip(decay_progress, 0.0, 1.0)
        if decay_type == "cosine":
            main = end_lr + (base_lr - end_lr) * 0.5 * (
                1.0 + jnp.cos(math.pi * decay_progress))
        elif decay_type == "step":
            k = jnp.zeros((), jnp.float32)
            for b in boundaries:
                k = k + (decay_progress >= b).astype(jnp.float32)
            main = base_lr * jnp.power(decay_rate, k)
        else:
            main = jnp.float32(base_lr)
        return jnp.where(step < warmup_steps, warm, main).astype(jnp.float32)

    return lr


def scale_lr_for_batch(base_lr_per_256: float, global_batch_size: int) -> float:
    """The reference's linear-scaling rule: lr = base * batch/256."""
    return base_lr_per_256 * global_batch_size / 256.0
