"""Exponential moving average of model weights.

Parity target (SURVEY.md §3.1, §5.4): the reference applies
``tf.train.ExponentialMovingAverage(ema_decay≈0.9999)`` to model variables
after each apply_gradients; evaluation restores the shadow (EMA) variables in
place of the raw weights; shadows are stored in the checkpoint (our orbax
checkpoint carries an explicit ``ema`` subtree — the "checkpoint-compatible
EMA weights" requirement in BASELINE.json).

``adjust=True`` reproduces TF's ``num_updates`` ramp:
    decay_t = min(decay, (1 + t) / (10 + t))
which warms the average up fast early in training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params):
    # explicit copy: astype(fp32) on fp32 params would alias the same buffer,
    # and params+ema aliasing breaks donation (same buffer donated twice)
    return jax.tree.map(lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params)


def ema_update(ema_params, params, *, decay: float = 0.9999, step=None,
               adjust: bool = True):
    if step is not None and adjust:
        t = jnp.asarray(step, jnp.float32)
        d = jnp.minimum(decay, (1.0 + t) / (10.0 + t))
    else:
        d = jnp.float32(decay)
    return jax.tree.map(
        lambda e, p: e * d + p.astype(jnp.float32) * (1.0 - d), ema_params, params)
