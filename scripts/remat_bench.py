"""Measure ModelConfig.remat modes on the real chip (round-2 byte-reduction
experiment; docs/DESIGN.md roofline section records the results).

The full assembled train step is HBM-bandwidth-bound at ~100% of the 819 GB/s
spec, so the only lever left is BYTES. remat='conv' saves exactly the bf16
conv outputs + BN stats as residuals and recomputes the elementwise /
attention chains in backward — trading VPU FLOPs (free at the roofline) for
residual traffic.

Usage: python scripts/remat_bench.py [--batches 128,256] [--modes none,conv,blocks]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np

PEAK_TFLOPS_BF16 = 197.0
PEAK_HBM_GBPS = 819.0
WARMUP = 3
TIMED = 15


def measure(mode: str, batch_size: int):
    import jax

    from axcnn.core.dtypes import BF16_POLICY
    from axcnn.models.resnet import ModelConfig
    from axcnn.train.schedules import make_lr_schedule
    from axcnn.train.train_step import make_train_step, create_train_state

    cfg = ModelConfig(
        resnet_size=50, num_classes=1000,
        use_resnet_d=True, use_se_block=True, use_sk_block=True,
        anti_alias_type="sconv", use_dropblock=True, zero_gamma=True,
        remat=mode)
    step = make_train_step(
        cfg, lr_schedule=make_lr_schedule(base_lr=0.4, total_steps=1000,
                                          warmup_steps=100),
        total_steps=1000, policy=BF16_POLICY, label_smoothing=0.1,
        mixup_alpha=0.2, weight_decay=1e-4, use_ema=True)
    state = create_train_state(jax.random.key(0), cfg, use_ema=True)
    rng = np.random.default_rng(0)
    batch = {
        "images": jax.device_put(
            rng.integers(0, 256, (batch_size, 224, 224, 3), dtype=np.uint8)),
        "labels": jax.device_put(
            rng.integers(0, 1000, (batch_size,), dtype=np.int32)),
    }
    key = jax.random.key(1)

    step_fn = jax.jit(step, donate_argnums=(0,)).lower(
        state, batch, key).compile()
    ca = step_fn.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", float("nan")))
    gbytes = float(ca.get("bytes accessed", float("nan"))) / 1e9
    try:
        mem = step_fn.memory_analysis()
        temp_gb = float(mem.temp_size_in_bytes) / 1e9
    except Exception:
        temp_gb = float("nan")

    # time the SAME compiled executable (a fresh jax.jit would recompile)
    for _ in range(WARMUP):
        state, metrics = step_fn(state, batch, key)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(TIMED):
        state, metrics = step_fn(state, batch, key)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / TIMED
    assert np.isfinite(loss)
    return {
        "mode": mode, "batch": batch_size,
        "ms": round(dt * 1e3, 1),
        "img_s": round(batch_size / dt, 0),
        "gflop": round(flops / 1e9, 0),
        "gb": round(gbytes, 2),
        "temp_gb": round(temp_gb, 2),
        "tflops": round(flops / dt / 1e12, 1),
        "mfu": round(flops / dt / 1e12 / PEAK_TFLOPS_BF16, 3),
        "gbps": round(gbytes / dt, 0),
        "hbm_util": round(gbytes / dt / PEAK_HBM_GBPS, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,256")
    ap.add_argument("--modes", default="none,conv,blocks")
    args = ap.parse_args()
    for b in [int(x) for x in args.batches.split(",")]:
        for mode in args.modes.split(","):
            try:
                print(json.dumps(measure(mode, b)), flush=True)
            except Exception as exc:
                print(json.dumps({"mode": mode, "batch": b,
                                  "error": f"{type(exc).__name__}: {exc}"}),
                      flush=True)


if __name__ == "__main__":
    main()
