"""Data-echoing throughput measurement on the real chip (DataConfig.echo_factor).

The bench's weakest number is loader-fed training: this 1-CPU-core host
feeds ~300-480 img/s into a chip that computes ~1600 (bench.py). Data
echoing (Choi et al. 2019) is the TPU-first lever for exactly this regime —
each host batch is fed to ``factor`` consecutive steps (already on device,
so host decode + AA + transfer all drop to 1/factor), while per-step RNG
keeps mixup/DropBlock/device-AA fresh.

Two echo placements are measured, factor in {1, 2, 4, 8}:

- host-AA  : native loader does decode + C++ AutoAugment; echoed steps share
             augmented pixels ("echoing after augmentation" — cheapest, but
             repeats see identical pixels up to mixup/DropBlock).
- device-AA: native loader decodes only; AutoAugment runs inside the jitted
             step (autoaugment_device), so every echoed step draws a fresh
             policy ("echoing before augmentation" — the variant the paper
             finds nearly accuracy-free). Costs device compute per step.

Recorded results: docs/SCALING.md (data echoing section).

Run:  python scripts/echo_bench.py   (on the TPU, ~5 min warm)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import jax

from axcnn.utils.cache import cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import bench
from axcnn.core.dtypes import BF16_POLICY
from axcnn.data.autoaugment_device import make_device_autoaugment
from axcnn.data.datasets import DatasetInfo
from axcnn.data.pipeline import (EchoIterator, TFRecordImageLoader,
                                 device_prefetch)
from axcnn.train.schedules import make_lr_schedule
from axcnn.train.train_step import create_train_state, make_train_step

FACTORS = (1, 2, 4, 8)
TIMED = 24


def _step_fn(device_aa: bool):
    cfg = bench._model_cfg()
    return jax.jit(make_train_step(
        cfg,
        lr_schedule=make_lr_schedule(base_lr=0.4, total_steps=1000,
                                     warmup_steps=100),
        total_steps=1000, policy=BF16_POLICY, label_smoothing=0.1,
        mixup_alpha=0.2, weight_decay=1e-4, use_ema=True,
        autoaugment_fn=make_device_autoaugment("v0") if device_aa else None,
    ), donate_argnums=(0,)), cfg


def measure(device_aa: bool):
    bench._ensure_bench_data()
    info = DatasetInfo("bench", 1000, bench.N_BENCH_IMAGES,
                       bench.N_BENCH_IMAGES, train_prefix="train",
                       eval_prefix="train")
    step_fn, cfg = _step_fn(device_aa)
    out = {}
    for factor in FACTORS:
        loader = TFRecordImageLoader(
            bench.BENCH_DATA, info, batch_size=bench.BATCH, train=True,
            image_size=bench.IMAGE,
            autoaugment_type="none" if device_aa else "v0",
            seed=1, num_workers=os.cpu_count() or 8, use_native=True)
        it = EchoIterator(device_prefetch(iter(loader), size=4), factor)
        state = create_train_state(jax.random.key(0), cfg, use_ema=True)
        key = jax.random.key(1)
        for _ in range(bench.WARMUP):
            state, metrics = step_fn(state, next(it), key)
        float(metrics["loss"])
        best = 0.0
        for _ in range(3):  # best-of-3: 1-core scheduler noise (bench.py)
            ips, state = bench._timed_steps(step_fn, state, it, key, TIMED)
            best = max(best, ips)
        out[f"echo{factor}"] = round(best, 1)
        print(f"[{'device' if device_aa else 'host'}-AA] echo={factor}: "
              f"{best:.1f} img/s", flush=True)
    return out


def main():
    print(f"devices: {jax.devices()}", flush=True)
    results = {"host_aa": measure(device_aa=False),
               "device_aa": measure(device_aa=True)}
    results["host_cores"] = os.cpu_count() or 1
    print(json.dumps(results, indent=2), flush=True)


if __name__ == "__main__":
    main()
