"""Selective-Kernel unit (Li et al. 2019, SKNet) — the reference's SK block.

Reference capability (SURVEY.md §2 item 2, §3.5, BASELINE config 3): the
bottleneck's 3x3 conv is replaced (``--use_sk_block``) by a two-branch
multi-kernel unit: a 3x3 branch and a 3x3-dilation-2 branch (5x5 receptive
field at 3x3 cost), fused by softmax channel attention:

    U = sum_b conv_b(x);  z = FC_reduce(GAP(U)) (BN+ReLU);
    a_b = softmax_b(FC_b(z));  y = sum_b a_b * conv_b(x)

Exact upstream hyperparameters are [K-med] (SURVEY.md §0); we implement the
canonical SKNet recipe — reduce dim d = max(C // r, L), r=16, L=32 — with all
knobs exposed.

TPU notes: both branches share one grouped weight layout so XLA can batch the
two 3x3 convs; attention math in fp32. BN inside the fuse module follows the
same functional-state convention as ``axcnn.ops.norm``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from axcnn.ops.conv import conv_init, conv_apply
from axcnn.ops.norm import bn_init, bn_apply
from axcnn.ops.pooling import global_avg_pool

NUM_BRANCHES = 2


def sk_init(key, in_ch: int, out_ch: int, *, ratio: int = 16, min_dim: int = 32,
            dtype=jnp.float32):
    d = max(out_ch // ratio, min_dim)
    keys = jax.random.split(key, NUM_BRANCHES + 2)
    params = {}
    state = {}
    for b in range(NUM_BRANCHES):
        params[f"conv{b}"] = conv_init(keys[b], 3, in_ch, out_ch, dtype=dtype)
        pb, sb = bn_init(out_ch, dtype=dtype)
        params[f"bn{b}"] = pb
        state[f"bn{b}"] = sb
    # fuse: z = W_z * GAP(U)  (with BN+ReLU), then per-branch select FC
    wz = jax.random.normal(keys[-2], (out_ch, d), jnp.float32) * (2.0 / out_ch) ** 0.5
    params["fc_z"] = {"w": wz.astype(dtype)}
    pz, sz = bn_init(d, dtype=dtype)
    params["bn_z"] = pz
    state["bn_z"] = sz
    ws = jax.random.normal(keys[-1], (d, NUM_BRANCHES * out_ch), jnp.float32) * (1.0 / d) ** 0.5
    params["fc_select"] = {"w": ws.astype(dtype), "b": jnp.zeros((NUM_BRANCHES * out_ch,), dtype)}
    return params, state


def _merged_sk_kernel(w0, w1):
    """Embed both SK branches in ONE 5x5 kernel with 2C output channels.

    The dense 3x3 (dilation 1) sits at the center taps [1:4, 1:4]; the
    dilated-2 3x3 sits at the even taps [::2, ::2] (its effective 5x5
    footprint). With the explicit TF-fixed-padding scheme (conv.py:
    pad = (eff-1)//2 both sides, eff = 5 for all three variants) the merged
    conv is tap-for-tap identical to the two separate convs for ANY stride
    — the extra taps contract exact zeros. One conv instead of two reads
    the (large) input activation once instead of twice; the price is 25/18x
    the MXU FLOPs on zero taps. Which side of that trade wins is measured
    on the chip (scripts/opt_experiments.py), not assumed.
    """
    five0 = jnp.zeros((5, 5) + w0.shape[2:], w0.dtype).at[1:4, 1:4].set(w0)
    five1 = jnp.zeros((5, 5) + w1.shape[2:], w1.dtype).at[::2, ::2].set(w1)
    return jnp.concatenate([five0, five1], axis=-1)


def sk_apply(params, state, x, *, stride: int = 1, train: bool,
             bn_momentum: float = 0.997, axis_name=None, compute_dtype=None,
             merged: bool = False, quantize: bool = False):
    """Returns (y, new_state). Branch b uses dilation b+1 (3x3, then 3x3 d2).

    ``merged=True`` computes both branches in one 5x5 conv (see
    ``_merged_sk_kernel``) — numerically identical, different perf shape.
    """
    out_ch = params["conv0"]["w"].shape[-1]
    new_state = {}
    branches = []
    if merged:
        w = _merged_sk_kernel(params["conv0"]["w"], params["conv1"]["w"])
        h2 = conv_apply({"w": w}, x, stride=stride, compute_dtype=compute_dtype,
                        quantize=quantize)
        raw = [h2[..., :out_ch], h2[..., out_ch:]]
    else:
        raw = [conv_apply(params[f"conv{b}"], x, stride=stride, dilation=b + 1,
                          compute_dtype=compute_dtype, quantize=quantize)
               for b in range(NUM_BRANCHES)]
    for b in range(NUM_BRANCHES):
        h, new_state[f"bn{b}"] = bn_apply(
            params[f"bn{b}"], state[f"bn{b}"], raw[b], train=train,
            momentum=bn_momentum, axis_name=axis_name)
        branches.append(jax.nn.relu(h))

    u = branches[0] + branches[1]
    z = global_avg_pool(u).astype(jnp.float32)  # (N, C)
    z = jnp.dot(z, params["fc_z"]["w"].astype(jnp.float32))  # (N, d)
    # BN over the (N, d) vector: reuse bn_apply via a (N,1,1,d) view.
    z4, new_state["bn_z"] = bn_apply(
        params["bn_z"], state["bn_z"], z[:, None, None, :], train=train,
        momentum=bn_momentum, axis_name=axis_name)
    z = jax.nn.relu(z4[:, 0, 0, :].astype(jnp.float32))

    logits = jnp.dot(z, params["fc_select"]["w"].astype(jnp.float32))
    logits = logits + params["fc_select"]["b"].astype(jnp.float32)
    logits = logits.reshape(-1, NUM_BRANCHES, out_ch)
    attn = jax.nn.softmax(logits, axis=1).astype(u.dtype)  # (N, B, C)

    y = branches[0] * attn[:, 0, None, None, :] + branches[1] * attn[:, 1, None, None, :]
    return y, new_state
