"""Serving-latency sweep on the real chip: per-batch inference latency for
the assembled and vanilla ResNet-50 (uint8 in -> fp32 logits out, bf16
compute — the exported StableHLO serving fn's compute path).

Measured via dependent chains ending in a scalar fetch (block_until_ready is
unreliable through the axon tunnel; per-call dispatch ~28 ms, so per-call
latency is reported both raw and with the measured dispatch floor noted).

Usage: python scripts/latency_bench.py [--batches 1,4,8,16,32,64,128]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np

WARMUP = 5
TIMED = 30


def measure(cfg_kwargs, batch, dtype="bf16"):
    import jax
    import jax.numpy as jnp

    from axcnn.core.dtypes import policy_from_name
    from axcnn.data.preprocessing import normalize_device
    from axcnn.models.resnet import ModelConfig, resnet_init, resnet_apply

    policy = policy_from_name(dtype)
    cfg = ModelConfig(resnet_size=50, num_classes=1000, **cfg_kwargs)
    params, state = jax.jit(lambda k: resnet_init(k, cfg))(jax.random.key(0))

    @jax.jit
    def serve(p, s, u8):
        logits, _ = resnet_apply(p, s, normalize_device(u8), cfg=cfg,
                                 train=False, policy=policy)
        return logits

    rng = np.random.default_rng(0)
    u8 = jax.device_put(
        rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8))
    for _ in range(WARMUP):
        out = serve(params, state, u8)
    float(out[0, 0])
    # per-call latency: fetch a scalar each call (includes dispatch+fetch —
    # what a synchronous server would see)
    t0 = time.perf_counter()
    for _ in range(TIMED):
        float(serve(params, state, u8)[0, 0])
    per_call_ms = (time.perf_counter() - t0) / TIMED * 1e3
    # pipelined: issue all calls, fetch once (what a double-buffered server
    # sees per request at depth>=2)
    t0 = time.perf_counter()
    for _ in range(TIMED):
        out = serve(params, state, u8)
    float(out[0, 0])
    pipelined_ms = (time.perf_counter() - t0) / TIMED * 1e3
    return {
        "batch": batch,
        "sync_ms": round(per_call_ms, 2),
        "pipelined_ms": round(pipelined_ms, 2),
        "pipelined_img_s": round(batch / pipelined_ms * 1e3, 0),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,4,8,16,32,64,128")
    ap.add_argument("--dtypes", default="bf16",
                    help="comma list: bf16 and/or int8 (PTQ serving policy)")
    args = ap.parse_args()
    for name, kw in (
        ("assembled", dict(use_resnet_d=True, use_se_block=True,
                           use_sk_block=True, anti_alias_type="sconv")),
        ("vanilla", {}),
    ):
        for dtype in args.dtypes.split(","):
            for b in [int(x) for x in args.batches.split(",")]:
                r = measure(kw, b, dtype=dtype)
                r["model"] = name
                r["dtype"] = dtype
                print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
