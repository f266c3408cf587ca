"""Optimization experiments against the measured roofline (VERDICT r2 #1:
"attempt >=2 concrete optimizations chosen from the profile and record
win/loss for each").

Each experiment recompiles the flagship train step under one variation and
times a dependent 10-step chain (scalar-fetch terminated — block_until_ready
is unreliable through the axon tunnel):

- batch sweep around the b128 operating point (96/128/160/192);
- XLA compiler-option variants (latency-hiding scheduler, aggressive
  fusion / scheduling knobs) — unknown flags are reported as 'rejected',
  not silently skipped;
- DropBlock Pallas on/off (the auto-dispatch default, re-validated);
- bf16 batch-norm statistics (fp32 stats are the default; measures what the
  extra precision costs).

Prints one JSON block; win/loss recorded in docs/DESIGN.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np

from axcnn.utils.cache import cache_dir  # noqa: E402


def time_step(batch_size, *, compiler_options=None, pallas_mode=None,
              sk_merged=False, scan_blocks=False, resnet_size=50,
              warm=3, timed=10):
    import jax

    from axcnn.ops import dispatch

    old_mode = dispatch.pallas_mode()
    if pallas_mode is not None:
        dispatch.set_pallas_mode(pallas_mode)
    try:
        from axcnn.core.dtypes import BF16_POLICY
        from axcnn.models.resnet import ModelConfig
        from axcnn.train.schedules import make_lr_schedule
        from axcnn.train.train_step import create_train_state, make_train_step

        cfg = ModelConfig(
            resnet_size=resnet_size, num_classes=1000,
            use_resnet_d=True, use_se_block=True, use_sk_block=True,
            sk_merged_conv=sk_merged, scan_blocks=scan_blocks,
            anti_alias_type="sconv", use_dropblock=True, zero_gamma=True)
        state = create_train_state(jax.random.key(0), cfg, use_ema=True)
        rng = np.random.default_rng(0)
        data = {
            "images": jax.device_put(rng.integers(
                0, 256, (batch_size, 224, 224, 3), dtype=np.uint8)),
            "labels": jax.device_put(rng.integers(
                0, 1000, (batch_size,), dtype=np.int32)),
        }
        step = make_train_step(
            cfg, lr_schedule=make_lr_schedule(base_lr=0.4, total_steps=1000,
                                              warmup_steps=100),
            total_steps=1000, policy=BF16_POLICY, label_smoothing=0.1,
            mixup_alpha=0.2, weight_decay=1e-4, use_ema=True)
        lowered = jax.jit(step, donate_argnums=(0,)).lower(
            state, data, jax.random.key(1))
        t_c = time.perf_counter()
        compiled = lowered.compile(compiler_options=compiler_options) \
            if compiler_options else lowered.compile()
        compile_s = time.perf_counter() - t_c
        key = jax.random.key(1)
        for _ in range(warm):
            state, metrics = compiled(state, data, key)
        float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(timed):
            state, metrics = compiled(state, data, key)
        float(metrics["loss"])
        dt = (time.perf_counter() - t0) / timed
        return {"step_ms": round(dt * 1e3, 2),
                "images_per_sec": round(batch_size / dt, 1),
                "compile_s": round(compile_s, 1)}
    finally:
        dispatch.set_pallas_mode(old_mode)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/axcnn_opt_experiments.json")
    ap.add_argument("--skip_flags", action="store_true")
    args = ap.parse_args()
    results = {}

    for b in (96, 128, 160, 192):
        results[f"batch_{b}"] = time_step(b)
        print(f"batch_{b}: {results[f'batch_{b}']}", flush=True)

    results["pallas_off_b128"] = time_step(128, pallas_mode="off")
    print(f"pallas_off_b128: {results['pallas_off_b128']}", flush=True)

    # SK branch batching: both branches in ONE 5x5 conv (input read once,
    # 25/18x MXU zero-tap FLOPs) — numerically identical (tests/test_ops.py)
    results["sk_merged_b128"] = time_step(128, sk_merged=True)
    print(f"sk_merged_b128: {results['sk_merged_b128']}", flush=True)

    # scan_blocks (models/resnet.py): the compile-time lever. Record BOTH
    # sides of the trade on the chip: step time (scan adds per-iteration
    # bookkeeping and blocks cross-block scheduling) and compile wall time
    # (one tail body per stage instead of one per block). compile_s is only
    # meaningful on a cold persistent cache — the JSON records it per run.
    for name, kw in (("scan_r50_b128", dict(scan_blocks=True)),
                     ("unrolled_r152_b64", dict(resnet_size=152)),
                     ("scan_r152_b64", dict(resnet_size=152,
                                            scan_blocks=True))):
        b = 64 if "r152" in name else 128
        results[name] = time_step(b, **kw)
        print(f"{name}: {results[name]}", flush=True)

    if not args.skip_flags:
        flag_sets = {
            "latency_hiding": {
                "xla_tpu_enable_latency_hiding_scheduler": "true"},
            "async_all_fusion": {
                "xla_tpu_enable_async_collective_fusion": "true"},
            "flash_vmem": {
                "xla_tpu_scoped_vmem_limit_kib": "65536"},
        }
        for name, opts in flag_sets.items():
            try:
                results[f"flags_{name}"] = time_step(128, compiler_options=opts)
            except Exception as exc:
                results[f"flags_{name}"] = {
                    "rejected": f"{type(exc).__name__}: {str(exc)[:200]}"}
            print(f"flags_{name}: {results[f'flags_{name}']}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
