"""Big-Little ResNet-50 (bL-Net, Chen et al. 2019) — the reference's
``bl_alpha``/``bl_beta`` flags (reference: nets/resnet_model.py [K-med];
SURVEY.md §2 item 2). The paper's standard setting: alpha=2 (little branch
at half width), beta=4 (little branch at quarter depth). Big-Little trades
a little accuracy for a large FLOP cut — the speed-oriented preset next to
``assemble_resnet50``'s accuracy-oriented one."""

from axcnn.models.resnet import ModelConfig
from axcnn.utils.config import Config, DataConfig, TrainConfig, RuntimeConfig


def get_config() -> Config:
    return Config(
        model=ModelConfig(
            resnet_size=50,
            bl_alpha=2,
            bl_beta=4,
            use_resnet_d=True,
            zero_gamma=True,
        ),
        data=DataConfig(
            dataset_name="imagenet",
            autoaugment_type="v0",
            mixup_alpha=0.2,
        ),
        train=TrainConfig(
            batch_size=1024,
            train_epochs=120,
            base_lr=0.1,
            lr_decay_type="cosine",
            lr_warmup_epochs=5.0,
            label_smoothing=0.1,
            weight_decay=1e-4,
            use_ema=True,
            dtype="bf16",
        ),
        runtime=RuntimeConfig(),
    )
