"""On-device Pallas self-test — run on the REAL TPU (no JAX_PLATFORMS).

The CPU test suite can only exercise the Pallas kernels in interpret mode,
where `pltpu.prng_random_bits` is a zero stub — so the DropBlock kernel's
actual randomness (and the BlurPool kernel pair's compiled numerics) need an
on-device check. This script is that check; the verify drive runs it and the
PASS/FAIL lines are the recorded artifact (docs/PARITY.md).

Checks:
1. BlurPool Pallas fwd == XLA depthwise conv, bit-exact (fp32) on device.
2. BlurPool Pallas custom-vjp bwd == XLA autodiff, bit-exact.
3. DropBlock mask kernel on device: masks are NOT all-ones/zeros (PRNG
   live), per-sample seeds decorrelate, the keep fraction tracks keep_prob,
   counts agree with the mask sum, and the same seed reproduces the same
   mask (determinism).
4. ops-level dispatch: with AXCNN_PALLAS=on, ops.dropblock/blur_pool take
   the Pallas path on TPU and produce sane outputs inside a jitted fn.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

FAILURES = []


def check(name, ok, detail=""):
    print(f"{'PASS' if ok else 'FAIL'}: {name}" + (f"  ({detail})" if detail else ""))
    if not ok:
        FAILURES.append(name)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.platform} / {dev.device_kind}")
    if dev.platform != "tpu":
        print("not a TPU — this self-test is for the real chip; aborting")
        return 2

    from axcnn.ops.blurpool import blur_pool
    from axcnn.ops.dispatch import set_pallas_mode
    from axcnn.pallas.blurpool import blur_pool_pallas, blur_pool_pallas_grad
    from axcnn.pallas.dropblock import dropblock_mask_pallas

    rng = np.random.default_rng(0)

    # 1-2: BlurPool fwd/bwd vs the XLA conv at fp32 precision. Not asserted
    # bit-exact on TPU: XLA's Precision.HIGHEST fp32 conv is multi-pass bf16
    # emulation on the MXU, while the Pallas kernel does true fp32 VPU
    # adds/multiplies — the Pallas kernel is the MORE exact one. (Bit-exact
    # equality IS asserted in fp32 interpret mode by tests/test_pallas.py.)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 256)), jnp.float32)
    set_pallas_mode("off")
    ref = jax.jit(lambda a: blur_pool(a, stride=2, filter_size=3))(x)
    got = jax.jit(blur_pool_pallas)(x)
    fwd_diff = float(jnp.max(jnp.abs(ref - got)))
    check("blurpool fwd matches XLA fp32 conv", fwd_diff < 1e-5,
          f"maxdiff={fwd_diff:.2e}")

    def loss_ref(a):
        return jnp.sum(blur_pool(a, stride=2, filter_size=3) ** 2)

    def loss_pal(a):
        return jnp.sum(blur_pool_pallas_grad(a) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(x)
    g_pal = jax.jit(jax.grad(loss_pal))(x)
    bwd_diff = float(jnp.max(jnp.abs(g_ref - g_pal)))
    check("blurpool bwd matches XLA autodiff", bwd_diff < 1e-4,
          f"maxdiff={bwd_diff:.2e}")

    # 3: DropBlock mask PRNG on device
    n, h, w, bs = 64, 28, 28, 7
    seeds = jnp.asarray(rng.integers(-2**31, 2**31 - 1, (n,), dtype=np.int64),
                        jnp.int32)
    keep_prob = 0.9
    gamma = ((1 - keep_prob) / (bs * bs)) * ((h * w) / ((h - bs + 1) * (w - bs + 1)))
    mask, counts = dropblock_mask_pallas(seeds, gamma, h=h, w=w, block_size=bs)
    mask = np.asarray(mask)
    counts = np.asarray(counts)
    check("dropblock PRNG live (not the zero stub)",
          0 < mask.mean() < 1, f"mean={mask.mean():.4f}")
    keep_frac = mask.mean()
    check("keep fraction tracks keep_prob",
          abs(keep_frac - keep_prob) < 0.05, f"{keep_frac:.3f} vs {keep_prob}")
    check("counts agree with mask sum",
          np.allclose(counts, mask.reshape(n, -1).sum(1)),
          f"max err {np.max(np.abs(counts - mask.reshape(n, -1).sum(1))):.1f}")
    per_sample = mask.reshape(n, -1).mean(1)
    check("per-sample seeds decorrelate",
          np.unique((per_sample * h * w).round().astype(int)).size > 5,
          f"{np.unique((per_sample * h * w).round().astype(int)).size} distinct keep counts")
    mask2, _ = dropblock_mask_pallas(seeds, gamma, h=h, w=w, block_size=bs)
    check("same seed -> same mask (determinism)",
          bool(np.array_equal(mask, np.asarray(mask2))))
    values = np.unique(mask)
    check("mask is binary", set(values.tolist()) <= {0.0, 1.0}, str(values[:4]))

    # 4: dispatch path on TPU
    set_pallas_mode("on")
    try:
        from axcnn.ops.dropblock import dropblock

        y = jax.jit(lambda k, a: dropblock(k, a, keep_prob=0.9, block_size=7,
                                           train=True))(
            jax.random.key(1), jnp.ones((8, 28, 28, 32), jnp.bfloat16))
        y = np.asarray(y, np.float32)
        check("ops.dropblock dispatches to Pallas on TPU and is sane",
              np.isfinite(y).all() and 0.5 < y.mean() < 1.5,
              f"mean={y.mean():.3f}")
        z = jax.jit(lambda a: blur_pool(a, stride=2, filter_size=3))(x)
        check("ops.blur_pool (mode=on) runs the Pallas kernel",
              bool(jnp.all(z == got)))  # == the Pallas output, not XLA's
    finally:
        set_pallas_mode("auto")

    print("SELFTEST:", "FAIL" if FAILURES else "PASS",
          f"({len(FAILURES)} failures)" if FAILURES else "")
    return 1 if FAILURES else 0


if __name__ == "__main__":
    raise SystemExit(main())
