"""Subprocess target for tests/test_loop.py::TestPreemption.

Runs a small synthetic-data training job; the parent test sends SIGTERM
mid-run and asserts the loop saves the consumed position and exits cleanly
(axcnn/train/loop.py preemption handling).

Usage: python tests/preempt_worker.py <model_dir> [train_steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from axcnn.utils.cache import cache_dir  # noqa: E402
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Reuse the parent suite's compile cache: the 1-core box takes minutes to
# compile the train step cold, and the test's "first train step" deadline
# assumes a warm cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

# The env var alone is NOT enough: the axon PJRT plugin prepends itself to
# jax_platforms ("axon,cpu" → TPU wins), so a worker that relies on
# JAX_PLATFORMS=cpu silently initializes the tunneled TPU client — and the
# tunnel is single-client, so the worker can block in make_c_api_client for
# the test's whole 600 s deadline. Force CPU via the config API, which the
# plugin cannot override (same pattern as tests/conftest.py).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    model_dir = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    from axcnn.models.resnet import ModelConfig
    from axcnn.train.loop import run
    from axcnn.utils.config import (Config, DataConfig, TrainConfig,
                                    RuntimeConfig)

    cfg = Config(
        model=ModelConfig(resnet_size=50, num_classes=1001),
        data=DataConfig(dataset_name="imagenet", use_synthetic_data=True,
                        image_size=32),
        train=TrainConfig(batch_size=4, train_steps=steps, base_lr=0.01,
                          lr_warmup_epochs=0, dtype="fp32", log_every=1,
                          use_ema=True, seed=0),
        runtime=RuntimeConfig(model_dir=model_dir, num_devices=1),
    )
    run(cfg)


if __name__ == "__main__":
    main()
