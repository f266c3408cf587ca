"""Capacity probe: HBM footprint of the BASELINE config-5 step on the chip.

Compiles (does NOT execute) the Assemble-R152 + frozen Assemble-R50-KD
training step at full 224² resolution for several batch sizes × remat modes
and reports XLA's static memory analysis — the evidence behind "remat=
'blocks' is the capacity lever for R152+KD / large batches" (docs/DESIGN.md).

Usage: python scripts/capacity_probe.py [--batches 64,128] [--modes none,blocks]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json

import numpy as np

HBM_GB = 16.0  # v5e-class chip


def probe(mode: str, batch: int):
    import jax

    from axcnn.core.dtypes import BF16_POLICY
    from axcnn.models.resnet import ModelConfig, resnet_init
    from axcnn.train.schedules import make_lr_schedule
    from axcnn.train.train_step import create_train_state, make_train_step

    common = dict(num_classes=1000, use_resnet_d=True, use_se_block=True,
                  use_sk_block=True, anti_alias_type="sconv",
                  use_dropblock=True, zero_gamma=True)
    cfg = ModelConfig(resnet_size=152, remat=mode, **common)
    t_cfg = ModelConfig(resnet_size=50, **common)
    t_params, t_state = jax.eval_shape(
        lambda k: resnet_init(k, t_cfg), jax.random.key(7))
    t_params = jax.tree.map(lambda a: jax.numpy.zeros(a.shape, a.dtype), t_params)
    t_state = jax.tree.map(lambda a: jax.numpy.zeros(a.shape, a.dtype), t_state)

    step = make_train_step(
        cfg, lr_schedule=make_lr_schedule(base_lr=0.1, total_steps=100,
                                          warmup_steps=10),
        total_steps=100, policy=BF16_POLICY, label_smoothing=0.1,
        mixup_alpha=0.2, weight_decay=1e-4, use_ema=True,
        teacher=(t_cfg, t_params, t_state), kd_temp=2.0, kd_alpha=0.5)

    state = jax.eval_shape(
        lambda k: create_train_state(k, cfg, use_ema=True), jax.random.key(0))
    batch_spec = {
        "images": jax.ShapeDtypeStruct((batch, 224, 224, 3), np.uint8),
        "labels": jax.ShapeDtypeStruct((batch,), np.int32),
    }
    compiled = jax.jit(step, donate_argnums=(0,)).lower(
        state, batch_spec, jax.random.key(1)).compile()
    mem = compiled.memory_analysis()
    temp = mem.temp_size_in_bytes / 1e9
    args = mem.argument_size_in_bytes / 1e9
    out = mem.output_size_in_bytes / 1e9
    alias = getattr(mem, "alias_size_in_bytes", 0) / 1e9
    total = temp + args + out - alias
    return {
        "mode": mode, "batch": batch,
        "temp_gb": round(temp, 2), "args_gb": round(args, 2),
        "out_gb": round(out, 2), "aliased_gb": round(alias, 2),
        "total_gb": round(total, 2),
        "fits_16gb": total < HBM_GB,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="64,128")
    ap.add_argument("--modes", default="none,blocks")
    args = ap.parse_args()
    for b in [int(x) for x in args.batches.split(",")]:
        for mode in args.modes.split(","):
            try:
                print(json.dumps(probe(mode, b)), flush=True)
            except Exception as exc:
                print(json.dumps({"mode": mode, "batch": b,
                                  "error": f"{type(exc).__name__}: {str(exc)[:200]}"}),
                      flush=True)


if __name__ == "__main__":
    main()
