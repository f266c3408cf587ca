"""Train step with on-device AutoAugment (the XLA-preprocessing-graph path)."""

import numpy as np

import jax

from axcnn.data.autoaugment_device import make_device_autoaugment
from axcnn.models.resnet import ModelConfig
from axcnn.train.schedules import make_lr_schedule
from axcnn.train.train_step import create_train_state, make_train_step
import pytest

# train step with on-device AutoAugment — release tier; `-m 'not slow'` is the dev loop
pytestmark = pytest.mark.slow

SMALL = ModelConfig(resnet_size=50, num_classes=10)


def test_train_step_with_device_autoaugment():
    step_fn = jax.jit(make_train_step(
        SMALL,
        lr_schedule=make_lr_schedule(base_lr=0.01, total_steps=10, warmup_steps=0),
        total_steps=10, label_smoothing=0.1, mixup_alpha=0.2,
        weight_decay=1e-4, use_ema=False,
        autoaugment_fn=make_device_autoaugment("v0")))
    state = create_train_state(jax.random.key(0), SMALL, use_ema=False)
    rng = np.random.default_rng(0)
    batch = {"images": rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8),
             "labels": rng.integers(0, 10, (8,), dtype=np.int32)}
    state, m = step_fn(state, batch, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
    # augmentation varies with step: next step's loss differs even on the
    # same batch and params trajectory is well-defined
    state, m2 = step_fn(state, batch, jax.random.key(1))
    assert np.isfinite(float(m2["loss"]))
