"""Batch normalization with TF1-parity semantics, functional state.

Reference behavior (SURVEY.md §2 item 2, §3.1): ``tf.layers.batch_normalization``
with flags for momentum (``bn_momentum``) and zero-gamma init of the last BN
in each residual block; moving stats updated via UPDATE_OPS during training;
eval uses moving stats. BN statistics are **per-replica** in the reference
(MirroredStrategy does not sync BN) — we keep that default and expose
``axis_name`` for opt-in cross-replica sync under ``shard_map``.

TPU notes: statistics are always computed in fp32 even for bf16 activations
(bf16 mean/var loses too much precision at batch 256×56×56); the normalize
itself is a fused scale+shift that XLA folds into the preceding conv's
epilogue.
"""

from __future__ import annotations

import jax
from jax.ad_checkpoint import checkpoint_name
import jax.numpy as jnp

BN_EPS = 1e-5
BN_MOMENTUM = 0.997  # TF-official default; reference exposes --bn_momentum


def bn_init(num_ch, *, zero_gamma=False, dtype=jnp.float32):
    params = {
        "gamma": jnp.zeros((num_ch,), dtype) if zero_gamma else jnp.ones((num_ch,), dtype),
        "beta": jnp.zeros((num_ch,), dtype),
    }
    state = {
        "mean": jnp.zeros((num_ch,), jnp.float32),
        "var": jnp.ones((num_ch,), jnp.float32),
    }
    return params, state


def bn_apply(
    params,
    state,
    x,
    *,
    train: bool,
    momentum: float = BN_MOMENTUM,
    eps: float = BN_EPS,
    axis_name: str | None = None,
):
    """Returns ``(y, new_state)``. ``new_state is state`` when not training."""
    x32 = x.astype(jnp.float32)
    if train:
        reduce_axes = tuple(range(x.ndim - 1))  # N, H, W (channels-last)
        mean = jnp.mean(x32, axis=reduce_axes)
        # E[x^2] - E[x]^2 (TF uses the biased estimator for normalization)
        mean2 = jnp.mean(jnp.square(x32), axis=reduce_axes)
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean2 = jax.lax.pmean(mean2, axis_name)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        # Under remat='conv' the per-channel stats are saved (they are tiny
        # but each costs a full re-read of x to recompute — and a replayed
        # pmean collective when sync_bn is on).
        mean = checkpoint_name(mean, "bn_stats")
        var = checkpoint_name(var, "bn_stats")
        new_state = {
            "mean": state["mean"] * momentum + mean * (1.0 - momentum),
            "var": state["var"] * momentum + var * (1.0 - momentum),
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state

    gamma = params["gamma"].astype(jnp.float32)
    beta = params["beta"].astype(jnp.float32)
    # Fold into one scale/shift so XLA emits a single fused multiply-add.
    scale = gamma * jax.lax.rsqrt(var + eps)
    shift = beta - mean * scale
    y = x32 * scale + shift
    return y.astype(x.dtype), new_state
