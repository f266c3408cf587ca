"""Momentum SGD with L2 weight decay — first-party pytree updates.

Parity target (SURVEY.md §3.1): the reference's ``MomentumOptimizer(0.9)``
with L2 added to the loss over non-BN variables. For SGD(+momentum), adding
``wd * ||w||^2 / 2`` to the loss is identical to adding ``wd * w`` to the
gradient — we do the latter analytically (one fused multiply-add per leaf,
no extra backward work), with the same variable mask
(``axcnn.train.losses.decay_mask``).

TF semantics preserved: ``v <- m*v + g;  w <- w - lr*v`` (TF's
``use_nesterov=False`` form — note TF folds lr at application, not into v).
All optimizer math in fp32 on fp32 master params.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from axcnn.train.losses import decay_mask


def momentum_init(params):
    return jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), params)


def momentum_update(
    params,
    grads,
    velocity,
    *,
    lr,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    nesterov: bool = False,
):
    """Returns (new_params, new_velocity)."""
    mask = decay_mask(params) if weight_decay else None

    def _upd(p, g, v, decayed):
        p32 = p.astype(jnp.float32)
        g32 = g.astype(jnp.float32)
        if weight_decay and decayed:
            g32 = g32 + weight_decay * p32
        v_new = momentum * v + g32
        step_dir = g32 + momentum * v_new if nesterov else v_new
        p_new = p32 - lr * step_dir
        return p_new.astype(p.dtype), v_new

    if mask is None:
        out = jax.tree.map(lambda p, g, v: _upd(p, g, v, False), params, grads, velocity)
    else:
        out = jax.tree.map(_upd, params, grads, velocity, mask)
    new_params = jax.tree.map(lambda x: x[0], out, is_leaf=lambda x: isinstance(x, tuple))
    new_velocity = jax.tree.map(lambda x: x[1], out, is_leaf=lambda x: isinstance(x, tuple))
    return new_params, new_velocity
