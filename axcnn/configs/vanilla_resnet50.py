"""Vanilla ResNet-50 from scratch — mirrors the reference's
``train_vanilla_from_scratch.sh`` recipe (SURVEY.md §1 L5, §6: ~76.9% top-1).
BASELINE config 1 (fp32 CPU single-image inference) uses this model config
with --train.dtype=fp32 --runtime.eval_only."""

import dataclasses

from axcnn.models.resnet import ModelConfig
from axcnn.utils.config import Config, DataConfig, TrainConfig, RuntimeConfig


def get_config() -> Config:
    return Config(
        model=ModelConfig(resnet_size=50),
        data=DataConfig(dataset_name="imagenet"),
        train=TrainConfig(
            batch_size=1024,
            train_epochs=90,
            base_lr=0.1,
            lr_decay_type="cosine",
            lr_warmup_epochs=5.0,
            label_smoothing=0.0,
            weight_decay=1e-4,
            dtype="bf16",
        ),
        runtime=RuntimeConfig(),
    )
