"""Assemble-ResNet-152 with knowledge distillation — BASELINE config 5
(data-parallel ImageNet training on v5e-8). Set
``--train.kd_teacher_checkpoint`` to a trained Assemble-ResNet-50/152 run.

Recipe risk, measured (scripts/kd_drive.py, docs/CONVERGENCE.md round 4):
the T²·KL term roughly HALVES the maximum stable learning rate — at the
CE-stable base LR the KD run diverged while every CE control trained.
If loss spikes early with KD enabled, halve ``train.base_lr`` (or double
warmup) before touching anything else. KD's win also depends on the
label regime: under 40% label noise it beat the best per-LR CE control
by +28.2 held-out top-1, but on clean easily-separable data it was
neutral-to-harmful at equal budget (both results recorded)."""

from axcnn.models.resnet import ModelConfig
from axcnn.utils.config import Config, DataConfig, TrainConfig, RuntimeConfig


def get_config() -> Config:
    return Config(
        model=ModelConfig(
            resnet_size=152,
            use_resnet_d=True,
            use_se_block=True,
            use_sk_block=True,
            anti_alias_type="sconv",
            use_dropblock=True,
            dropblock_keep_prob=0.9,
            zero_gamma=True,
        ),
        data=DataConfig(
            dataset_name="imagenet",
            autoaugment_type="v0",
            mixup_alpha=0.2,
        ),
        train=TrainConfig(
            batch_size=1024,
            train_epochs=270,
            base_lr=0.1,
            lr_decay_type="cosine",
            lr_warmup_epochs=5.0,
            label_smoothing=0.1,
            weight_decay=1e-4,
            use_ema=True,
            dtype="bf16",
            kd_temp=1.0,
            kd_alpha=1.0,
        ),
        runtime=RuntimeConfig(),
    )
