"""Transfer-learning (warm-start) drive on the REAL TPU — the reference's
fine-tune path (SURVEY.md §3.3) end to end through ``run()``:

1. pretrain the assembled model on a 4-class color dataset (A) with
   checkpointing, via the same ``run()`` the CLI uses;
2. fine-tune on a DIFFERENT 3-class texture dataset (B) with
   ``--train.pretrained_checkpoint`` (head excluded, num_classes changes
   4 -> 3) for the same number of steps;
3. assert the fine-tune converges (top-1 >= 90% on B) and, for context,
   run B from scratch with the identical budget and report both.

Recorded results: docs/CONVERGENCE.md. Run: python scripts/finetune_drive.py
(on the TPU; ~12 min).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
from PIL import Image

from axcnn.data.build_tfrecords import write_shards

STEPS = 150
BATCH = 64


def _texture(rng, kind):
    """3 shape-defined classes (stripes-h, stripes-v, checker) with random
    colors — NOT separable by the color statistics dataset A trains on."""
    img = rng.integers(0, 60, (256, 320, 3)).astype(np.uint8)
    c = rng.integers(100, 255, (3,), dtype=np.uint8)
    period = int(rng.integers(12, 28))
    yy, xx = np.mgrid[0:256, 0:320]
    if kind == "hstripe":
        m = (yy // period) % 2 == 0
    elif kind == "vstripe":
        m = (xx // period) % 2 == 0
    else:  # checker
        m = ((yy // period) + (xx // period)) % 2 == 0
    # widen before adding: uint8 addition wraps mod 256 BEFORE any clamp,
    # which would turn bright stripes back into background-dark pixels
    img[m] = np.minimum(img[m].astype(np.int32) + c.astype(np.int32),
                        255).astype(np.uint8)
    return img


def make_color_dataset(root, n=64):
    rng = np.random.default_rng(0)
    items = []
    for label, cls in enumerate(("red", "green", "blue", "yellow")):
        d = os.path.join(root, "raw", cls)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 90, (256, 320, 3)).astype(np.uint8)
            ch = {"red": (0,), "green": (1,), "blue": (2,),
                  "yellow": (0, 1)}[cls]
            for c in ch:
                img[..., c] += 100
            p = os.path.join(d, f"{i}.jpg")
            Image.fromarray(img).save(p, "JPEG", quality=92)
            items.append((p, label, cls))
    out = os.path.join(root, "rec")
    write_shards(items, out, "train", 4)
    return out, 4, len(items)


def make_texture_dataset(root, n=64):
    rng = np.random.default_rng(1)
    items = []
    for label, kind in enumerate(("hstripe", "vstripe", "checker")):
        d = os.path.join(root, "raw", kind)
        os.makedirs(d, exist_ok=True)
        for i in range(n):
            p = os.path.join(d, f"{i}.jpg")
            Image.fromarray(_texture(rng, kind)).save(p, "JPEG", quality=92)
            items.append((p, label, kind))
    out = os.path.join(root, "rec")
    write_shards(items, out, "train", 4)
    return out, 3, len(items)


def _run(data_dir, num_classes, num_examples, model_dir, *, pretrained=""):
    import dataclasses

    from axcnn.data import datasets
    from axcnn.models.resnet import ModelConfig
    from axcnn.train.loop import run
    from axcnn.utils.config import (Config, DataConfig, RuntimeConfig,
                                    TrainConfig)

    name = f"drive{num_classes}"
    datasets.DATASETS[name] = datasets.DatasetInfo(
        name, num_classes=num_classes, num_train=num_examples,
        num_eval=num_examples, train_prefix="train", eval_prefix="train")
    cfg = Config(
        model=ModelConfig(resnet_size=50, num_classes=num_classes,
                          use_resnet_d=True, use_se_block=True,
                          use_sk_block=True, anti_alias_type="sconv",
                          use_dropblock=True, dropblock_keep_prob=0.9,
                          zero_gamma=True, bn_momentum=0.9),
        data=DataConfig(dataset_name=name, data_dir=data_dir,
                        autoaugment_type="v0", mixup_alpha=0.2,
                        num_workers=os.cpu_count() or 4, loader="cpp"),
        train=TrainConfig(batch_size=BATCH, train_steps=STEPS,
                          base_lr=0.05 * 256 / BATCH,  # undo per-256 scaling
                          lr_warmup_epochs=0.0, label_smoothing=0.1,
                          use_ema=True, ema_decay=0.99, dtype="bf16",
                          seed=3, log_every=50,
                          pretrained_checkpoint=pretrained),
        runtime=RuntimeConfig(model_dir=model_dir, num_devices=1),
    )
    # train_steps>0 makes steps_per_epoch=total -> warmup 0, one final eval
    return run(cfg)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/axcnn_finetune"
    os.makedirs(root, exist_ok=True)
    a_dir, a_nc, a_n = make_color_dataset(os.path.join(root, "colors"))
    b_dir, b_nc, b_n = make_texture_dataset(os.path.join(root, "textures"))

    t0 = time.time()
    m_a = _run(a_dir, a_nc, a_n, os.path.join(root, "run_a"))
    print(f"[pretrain A/colors] top1={m_a['top1']:.2f}% "
          f"({time.time() - t0:.0f}s)", flush=True)
    assert m_a["top1"] >= 90.0, m_a

    ckpt_a = os.path.join(root, "run_a", "checkpoints")
    t0 = time.time()
    m_ft = _run(b_dir, b_nc, b_n, os.path.join(root, "run_b_ft"),
                pretrained=ckpt_a)
    print(f"[fine-tune B/textures, warm-start from A] top1={m_ft['top1']:.2f}% "
          f"({time.time() - t0:.0f}s)", flush=True)

    t0 = time.time()
    m_cold = _run(b_dir, b_nc, b_n, os.path.join(root, "run_b_cold"))
    print(f"[cold-start B/textures, same budget] top1={m_cold['top1']:.2f}% "
          f"({time.time() - t0:.0f}s)", flush=True)

    assert m_ft["top1"] >= 90.0, m_ft
    print(f"FINETUNE DRIVE OK  (warm {m_ft['top1']:.1f}% vs cold "
          f"{m_cold['top1']:.1f}%)")


if __name__ == "__main__":
    main()
