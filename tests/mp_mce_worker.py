"""Worker for the multi-host ImageNet-C (mCE) evaluation test.

NOT a pytest module — spawned by tests/test_multiprocess.py as 2 OS
processes (2 virtual CPU devices each). Runs ``run_imagenet_c`` over a
miniature corruption layout (2 corruptions x 2 severities) on a 2-host x
2-device mesh, exactly the multi-host conventions loop.run() uses (per-host
batch division, host-sharded loaders, replicate_to_mesh) that VERDICT r3
flagged as untested beyond single-process (eval/imagenet_c.py).

The parent asserts: both hosts compute the IDENTICAL mCE (the eval psum is
replicated), and the per-(corruption,severity) record counts cover every
record exactly once across hosts (no double-count, no drop — the uneven
shard split is the regression trap).

Usage: python mp_mce_worker.py <pid> <nprocs> <data_dir> <port>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

_kept = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    _kept + ["--xla_force_host_platform_device_count=2"])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    data_dir, port = sys.argv[3], sys.argv[4]
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nprocs,
                               process_id=pid,
                               cluster_detection_method="deactivate")

    from axcnn.eval.imagenet_c import run_imagenet_c
    from axcnn.models.resnet import ModelConfig
    from axcnn.utils.config import (Config, DataConfig, RuntimeConfig,
                                    TrainConfig)

    cfg = Config(
        model=ModelConfig(resnet_size=50, num_classes=1001),
        data=DataConfig(dataset_name="imagenet_c", data_dir=data_dir,
                        image_size=32, resize_min=32, num_workers=2),
        train=TrainConfig(batch_size=8, dtype="fp32", use_ema=False, seed=0),
        runtime=RuntimeConfig(model_dir=os.path.join(data_dir, f"out{pid}"),
                              num_devices=2 * nprocs),
    )
    result = run_imagenet_c(cfg)

    # per-(corruption,severity) counts from this host's metrics log
    counts = {}
    with open(os.path.join(cfg.runtime.model_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") == "imagenet_c":
                # MetricLogger stores numerics as floats; re-int the severity
                counts[f"{rec['corruption']}/{int(rec['severity'])}"] = \
                    rec["count"]

    print("RESULT " + json.dumps({
        "pid": pid,
        "mce": result["mce"],
        "ces": {k: v for k, v in sorted(result.items()) if k.startswith("ce/")},
        "counts": counts,
    }), flush=True)


if __name__ == "__main__":
    main()
