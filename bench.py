"""Benchmark: Assemble-ResNet-50 training throughput, images/sec/chip.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Protocol: full training step (bf16 compute, mixup + label smoothing + EMA +
momentum/WD; the BASELINE config-4 recipe) on synthetic data, single chip,
224x224, donated state. Warmup 3 steps, then timed steps.

Baseline: the reference (TF1, 8xV100) publishes no per-chip training
throughput for Assemble-ResNet-50; SURVEY.md §6 reconstructs ~O(300) img/s
*inference* on 1xV100 [K-lo]. We use 170 img/s/GPU as the assumed TF1-GPU
*training* throughput for the assembled model (vanilla R50 trains ~360-400
img/s on V100; the assembled model is ~2x heavier). BASELINE.json's target is
>=2x that per chip → vs_baseline >= 2.0 is the goal.
"""

import json
import time

import numpy as np

BASELINE_TRAIN_IPS = 170.0  # assumed TF1 V100 Assemble-R50 train img/s [K-lo]
BATCH = 128
IMAGE = 224
WARMUP = 3
TIMED = 20


def main():
    import jax

    from axcnn.core.dtypes import BF16_POLICY
    from axcnn.models.resnet import ModelConfig
    from axcnn.train.schedules import make_lr_schedule
    from axcnn.train.train_step import create_train_state, make_train_step

    cfg = ModelConfig(
        resnet_size=50, num_classes=1000,
        use_resnet_d=True, use_se_block=True, use_sk_block=True,
        anti_alias_type="sconv", use_dropblock=True, zero_gamma=True)

    total_steps = 1000
    train_step = make_train_step(
        cfg,
        lr_schedule=make_lr_schedule(base_lr=0.4, total_steps=total_steps,
                                     warmup_steps=100),
        total_steps=total_steps,
        policy=BF16_POLICY,
        label_smoothing=0.1,
        mixup_alpha=0.2,
        weight_decay=1e-4,
        use_ema=True,
    )
    step_fn = jax.jit(train_step, donate_argnums=(0,))

    state = create_train_state(jax.random.key(0), cfg, use_ema=True)
    rng = np.random.default_rng(0)
    batch = {
        "images": jax.device_put(
            rng.integers(0, 256, (BATCH, IMAGE, IMAGE, 3), dtype=np.uint8)),
        "labels": jax.device_put(
            rng.integers(0, 1000, (BATCH,), dtype=np.int32)),
    }
    key = jax.random.key(1)

    for _ in range(WARMUP):
        state, metrics = step_fn(state, batch, key)
    # NOTE: jax.block_until_ready does not reliably wait through the axon
    # tunnel; fetching a scalar that depends on the final state of the
    # dependent step chain forces real completion of every step.
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(TIMED):
        state, metrics = step_fn(state, batch, key)
    final_loss = float(metrics["loss"])  # forces the whole chain
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    ips = BATCH * TIMED / dt
    print(json.dumps({
        "metric": "assemble_resnet50_train_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / BASELINE_TRAIN_IPS, 3),
    }))


if __name__ == "__main__":
    main()
