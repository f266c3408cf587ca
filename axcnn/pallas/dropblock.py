"""Pallas TPU kernel: DropBlock mask generation with on-chip PRNG.

Generates the (N, H, W) keep-mask and per-sample drop counts in one kernel:
random bits come from the TPU core PRNG (``pltpu.prng_random_bits``) —
nothing but the final mask ever touches HBM, vs the XLA path's
sample-uniform → compare → two reduce_windows chain. The block expansion is
a 7-tap shifted max per axis (separable, matching the XLA reference
implementation in ``axcnn.ops.dropblock`` bit-for-bit in structure, not in
RNG stream — both are golden-tested for distributional properties).

Channel-shared masks only (the default everywhere); application
``x * mask * scale`` stays in XLA where it fuses into neighboring
elementwise work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift0(a, d):
    """shift along axis 0 by d (positive = take from smaller index), zeros in."""
    if d == 0:
        return a
    z = jnp.zeros_like(a[:abs(d)])
    return (jnp.concatenate([z, a[:-d]], 0) if d > 0
            else jnp.concatenate([a[-d:], z], 0))


def _shift1(a, d):
    if d == 0:
        return a
    z = jnp.zeros_like(a[:, :abs(d)])
    return (jnp.concatenate([z, a[:, :-d]], 1) if d > 0
            else jnp.concatenate([a[:, -d:], z], 1))


def _make_kernel(h: int, w: int, bs: int):
    half0, half1 = (bs - 1) // 2, bs // 2

    def kernel(seed_ref, gamma_ref, mask_ref, count_ref):
        i = pl.program_id(0)
        pltpu.prng_seed(seed_ref[i, 0])
        gamma = gamma_ref[0, 0]
        bits = pltpu.bitcast(pltpu.prng_random_bits((h, w)), jnp.uint32)
        # uniform in [0,1) from the top 24 bits; Mosaic has no uint32→f32
        # cast, so reinterpret the (always < 2^24, hence non-negative)
        # shifted bits as int32 first
        u = pltpu.bitcast(bits >> 8, jnp.int32).astype(jnp.float32) * (1.0 / (1 << 24))

        row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
        valid = ((row >= half0) & (row < h - half1)
                 & (col >= half0) & (col < w - half1))
        centers = jnp.where(valid & (u < gamma), 1.0, 0.0)

        # separable bs-tap max: offsets -half1..half0 (window centered like
        # reduce_window with padding (half0, half1))
        hit = centers
        acc = jnp.zeros_like(hit)
        for d in range(-half1, half0 + 1):
            acc = jnp.maximum(acc, _shift0(hit, d))
        hit = acc
        acc = jnp.zeros_like(hit)
        for d in range(-half1, half0 + 1):
            acc = jnp.maximum(acc, _shift1(hit, d))

        mask = 1.0 - acc
        mask_ref[0] = mask
        count_ref[i, 0] = jnp.sum(mask)

    return kernel


def dropblock_supported(x, block_size: int) -> bool:
    if x.ndim != 4:
        return False
    n, h, w, c = x.shape
    return min(h, w) >= block_size and h * w * 4 <= 4 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("h", "w", "block_size", "interpret"))
def dropblock_mask_pallas(seeds, gamma, *, h: int, w: int, block_size: int,
                          interpret: bool = False):
    """Returns (mask (N,H,W) fp32, keep_counts (N,) fp32).

    ``seeds``: (N,) int32 per-sample PRNG seeds. ``gamma``: scalar fp32 drop
    rate (may be traced).
    """
    n = seeds.shape[0]
    # scalars ride whole-array in SMEM (per-block SMEM slices must tile to
    # (8,128) on TPU); the kernel indexes by program_id
    seeds2 = seeds.astype(jnp.int32).reshape(n, 1)
    gamma_arr = jnp.asarray(gamma, jnp.float32).reshape(1, 1)
    mask, counts = pl.pallas_call(
        _make_kernel(h, w, block_size),
        grid=(n,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # whole (n,1) array
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, 1), jnp.float32),
        ),
        interpret=interpret,
    )(seeds2, gamma_arr)
    return mask, counts[:, 0]


def dropblock_pallas(key, x, *, keep_prob, block_size: int = 7,
                     interpret: bool = False):
    """Drop-in replacement for ``axcnn.ops.dropblock.dropblock`` (train mode,
    shared channels). Same gamma/rescale math; TPU-core RNG stream."""
    n, h, w, c = x.shape
    bs = min(block_size, h, w)
    kp = jnp.asarray(keep_prob, jnp.float32)
    gamma = ((1.0 - kp) / (bs * bs)) * ((h * w) / max((h - bs + 1) * (w - bs + 1), 1))
    seeds = jax.random.randint(key, (n,), minval=jnp.iinfo(jnp.int32).min,
                               maxval=jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    mask, counts = dropblock_mask_pallas(seeds, gamma, h=h, w=w, block_size=bs,
                                         interpret=interpret)
    total_keep = jnp.maximum(jnp.sum(counts), 1.0) * c
    scale = x.size / total_keep
    return (x.astype(jnp.float32) * mask[..., None] * scale).astype(x.dtype)
