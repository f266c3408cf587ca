"""Measured-achievable roofline denominators (VERDICT r3 #5).

bench.py's speed-of-light used PAPER SPEC walls (197 TFLOP/s bf16,
819 GB/s HBM). Real chips sustain less than spec even on ideal streams, so
"0.605 of speed of light" had an uncalibrated denominator. These two probes
measure what THIS chip actually achieves on the friendliest possible
programs; bench.py reports both spec- and achievable-relative fractions.

- **HBM stream**: STREAM-"scale" (x <- a*x) over a 1 GiB fp32 array, far
  beyond VMEM, iterated inside ONE jit (per-call dispatch through the axon
  tunnel is ~28 ms — lax.fori_loop amortizes it). Traffic = 2 bytes moved
  per byte of array per iteration (read + write).
- **MXU matmul**: C <- C @ B at 8192^2 bf16 (MXU-native tiling, fp32
  accumulation), iterated the same way. B is scaled by 1/sqrt(N) so values
  stay bounded; MXU timing is value-independent.

Timing fetches a scalar data-dependent on the loop result —
block_until_ready does not reliably wait through the axon tunnel
(.claude/skills/verify gotcha; same convention as bench.py).

Run standalone:  python scripts/calibrate_roofline.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _best_of(fn, repeats=3):
    return max(fn() for _ in range(repeats))


def measure_hbm_gbps(*, elems=1 << 28, iters=200, repeats=3) -> float:
    """Sustained HBM GB/s on a STREAM-scale kernel (1 GiB fp32 array)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    x = jnp.ones((elems,), jnp.float32)

    @jax.jit
    def scale(x):
        return lax.fori_loop(
            0, iters, lambda i, v: v * np.float32(1.0000001), x)

    x = scale(x)  # warmup (compile + first run)
    float(x[0])

    def once():
        nonlocal x
        t0 = time.perf_counter()
        x = scale(x)
        s = float(x[0])
        dt = time.perf_counter() - t0
        assert np.isfinite(s)
        return iters * 2 * elems * 4 / dt / 1e9

    return _best_of(once, repeats)


def measure_matmul_tflops(*, n=8192, iters=100, repeats=3) -> float:
    """Sustained bf16 TFLOP/s on a square MXU-native matmul chain."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal((n, n)) / np.sqrt(n), jnp.bfloat16)
    c = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    @jax.jit
    def chain(c, b):
        return lax.fori_loop(0, iters, lambda i, v: v @ b, c)

    c0 = chain(c, b)  # warmup
    float(c0[0, 0])

    def once():
        t0 = time.perf_counter()
        out = chain(c, b)
        s = float(out[0, 0])
        dt = time.perf_counter() - t0
        assert np.isfinite(s)
        return iters * 2 * n**3 / dt / 1e12

    return _best_of(once, repeats)


def main():
    import json

    import jax

    print(f"devices: {jax.devices()}", flush=True)
    gbps = measure_hbm_gbps()
    tflops = measure_matmul_tflops()
    print(json.dumps({
        "measured_hbm_gbps": round(gbps, 1),
        "measured_tflops_bf16": round(tflops, 1),
        "hbm_fraction_of_spec_819": round(gbps / 819.0, 3),
        "mxu_fraction_of_spec_197": round(tflops / 197.0, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
