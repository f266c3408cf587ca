"""Squeeze-and-Excitation channel attention (Hu et al. 2018).

Reference capability (SURVEY.md §2 item 2, §3.5): per-bottleneck SE applied
after the last conv-BN, gated by ``--use_se_block``; squeeze = GAP, excite =
FC(C→C/r)-ReLU → FC(C/r→C)-sigmoid, channel-wise rescale. r defaults to 16.

The two FCs operate on a (N, C) vector — tiny matmuls that XLA schedules on
the MXU alongside the main convs; the attention math runs in fp32 (sigmoid of
bf16 logits costs real top-1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from axcnn.ops.pooling import global_avg_pool


def se_init(key, num_ch: int, *, ratio: int = 16, dtype=jnp.float32):
    mid = max(num_ch // ratio, 1)
    k1, k2 = jax.random.split(key)
    # He init on the reduce FC, Xavier-ish on the expand (sigmoid gate).
    w1 = jax.random.normal(k1, (num_ch, mid), jnp.float32) * (2.0 / num_ch) ** 0.5
    w2 = jax.random.normal(k2, (mid, num_ch), jnp.float32) * (1.0 / mid) ** 0.5
    return {
        "w1": w1.astype(dtype),
        "b1": jnp.zeros((mid,), dtype),
        "w2": w2.astype(dtype),
        "b2": jnp.zeros((num_ch,), dtype),
    }


def se_apply(params, x):
    z = global_avg_pool(x).astype(jnp.float32)  # (N, C)
    h = jnp.dot(z, params["w1"].astype(jnp.float32)) + params["b1"].astype(jnp.float32)
    h = jax.nn.relu(h)
    s = jnp.dot(h, params["w2"].astype(jnp.float32)) + params["b2"].astype(jnp.float32)
    gate = jax.nn.sigmoid(s).astype(x.dtype)  # (N, C)
    return x * gate[:, None, None, :]
