"""Dataset metadata registry — the reference's ``functions/data_config.py``
equivalent (SURVEY.md §2 item 6).

Covers ImageNet plus the FGVC transfer-learning suite used by the reference's
fine-tuning recipes. Exact upstream example counts tagged [K-med] in the
survey; the standard published splits are used.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class DatasetInfo:
    name: str
    num_classes: int
    num_train: int
    num_eval: int
    train_prefix: str = "train"
    eval_prefix: str = "validation"
    # default image stats (RGB 0-255 scale)
    mean_rgb: tuple = (123.68, 116.78, 103.94)
    stddev_rgb: tuple = (58.393, 57.12, 57.375)
    # TFRecord label offset: 1 only where the head reserves a background
    # class (the reference's 1001-way ImageNet head); FGVC heads are exactly
    # N-way, so their records must carry labels 0..N-1
    label_offset: int = 0


DATASETS = {
    "imagenet": DatasetInfo("imagenet", 1001, 1_281_167, 50_000, label_offset=1),
    # ImageNet-C shares classes with ImageNet; examples are per corruption x severity
    "imagenet_c": DatasetInfo("imagenet_c", 1001, 0, 50_000, label_offset=1),
    "food101": DatasetInfo("food101", 101, 75_750, 25_250),
    "stanford_cars": DatasetInfo("stanford_cars", 196, 8_144, 8_041),
    "cub200": DatasetInfo("cub200", 200, 5_994, 5_794),
    "oxford_flowers102": DatasetInfo("oxford_flowers102", 102, 2_040, 6_149),
    "fgvc_aircraft": DatasetInfo("fgvc_aircraft", 100, 6_667, 3_333),
    "oxford_iiit_pets": DatasetInfo("oxford_iiit_pets", 37, 3_680, 3_669),
}


def get_dataset(name: str) -> DatasetInfo:
    try:
        return DATASETS[name]
    except KeyError:
        raise ValueError(f"unknown dataset {name!r}; known: {sorted(DATASETS)}") from None
