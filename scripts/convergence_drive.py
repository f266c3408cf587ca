"""Full-recipe convergence drive on the REAL TPU (VERDICT r1 item #6).

Trains the complete config-4 stack — SK + SE + BlurPool(sconv) + ResNet-D +
DropBlock(scheduled) + zero-gamma + native-loader AutoAugment(v0) + mixup +
label smoothing + EMA, bf16 — for a few hundred steps on a generated
4-class dataset, then evaluates RAW vs EMA weights. Asserts the recipe
actually optimizes end to end (top-1 near ceiling; EMA eval >= raw eval).

This is the closest offline stand-in for the ImageNet top-1 acceptance run
(no ImageNet data is mounted in this environment — SURVEY.md §0). Recorded
results: docs/CONVERGENCE.md.

Run:  python scripts/convergence_drive.py  (on the TPU; ~10 min)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import io
import time

import numpy as np
from PIL import Image

import jax

from axcnn.data.build_tfrecords import write_shards
from axcnn.data.datasets import DatasetInfo
from axcnn.data.pipeline import TFRecordImageLoader, device_prefetch
from axcnn.core.dtypes import BF16_POLICY
from axcnn.models.resnet import ModelConfig
from axcnn.train.loop import evaluate
from axcnn.train.schedules import make_lr_schedule
from axcnn.train.train_step import (
    create_train_state, make_train_step, make_eval_step)

STEPS = 300
BATCH = 64
IMAGE = 224
CLASSES = (("red", 0), ("green", 1), ("blue", 2), ("yellow", 3))


def make_dataset(root, n_per_class=64):
    """4 color-dominant classes with textured noise — separable, but only
    through the full augmentation stack (AutoAugment color ops, mixup)."""
    rng = np.random.default_rng(0)
    items = []
    raw = os.path.join(root, "raw")
    for cls, label in CLASSES:
        d = os.path.join(raw, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(n_per_class):
            img = rng.integers(0, 90, (256, 320, 3)).astype(np.uint8)
            if cls == "red":
                img[..., 0] += 120
            elif cls == "green":
                img[..., 1] += 120
            elif cls == "blue":
                img[..., 2] += 120
            else:  # yellow
                img[..., 0] += 100
                img[..., 1] += 100
            path = os.path.join(d, f"{i}.jpg")
            Image.fromarray(img).save(path, "JPEG", quality=92)
            items.append((path, label, cls))
    out = os.path.join(root, "rec")
    write_shards(items, out, "train", 4)
    info = DatasetInfo("colors4", num_classes=4,
                       num_train=len(CLASSES) * n_per_class,
                       num_eval=len(CLASSES) * n_per_class,
                       train_prefix="train", eval_prefix="train")
    return out, info


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/axcnn_convergence"
    os.makedirs(root, exist_ok=True)
    data_dir, info = make_dataset(root)
    print(f"devices: {jax.devices()}")

    # full config-4 model; bn_momentum 0.9 so moving stats converge within
    # 300 steps (the 90-epoch recipe's 0.997 needs ~1k steps to settle)
    cfg = ModelConfig(resnet_size=50, num_classes=4, use_resnet_d=True,
                      use_se_block=True, use_sk_block=True,
                      anti_alias_type="sconv", use_dropblock=True,
                      dropblock_keep_prob=0.9, zero_gamma=True,
                      bn_momentum=0.9)
    loader = TFRecordImageLoader(
        data_dir, info, batch_size=BATCH, train=True, image_size=IMAGE,
        autoaugment_type="v0", seed=0, num_workers=os.cpu_count() or 4,
        use_native=True)
    assert loader._native and loader._aa_policy == 0

    train_step = make_train_step(
        cfg,
        lr_schedule=make_lr_schedule(base_lr=0.05, total_steps=STEPS,
                                     warmup_steps=20),
        total_steps=STEPS, policy=BF16_POLICY, label_smoothing=0.1,
        mixup_alpha=0.2, weight_decay=1e-4, use_ema=True, ema_decay=0.99,
        mean_rgb=info.mean_rgb, stddev_rgb=info.stddev_rgb)
    step_fn = jax.jit(train_step, donate_argnums=(0,))
    state = create_train_state(jax.random.key(0), cfg, use_ema=True)
    key = jax.random.key(1)

    it = device_prefetch(iter(loader), size=2)
    t0 = time.time()
    for step in range(1, STEPS + 1):
        state, m = step_fn(state, next(it), key)
        if step % 50 == 0 or step == 1:
            mm = jax.device_get(m)
            print(f"step {step:4d}: loss={float(mm['loss']):.4f} "
                  f"train_top1={float(mm['train_top1']):.3f} "
                  f"lr={float(mm['lr']):.4f}", flush=True)
    print(f"trained {STEPS} steps in {time.time() - t0:.0f}s")

    results = {}
    for name, use_ema in (("raw", False), ("ema", True)):
        eval_fn = jax.jit(make_eval_step(
            cfg, policy=BF16_POLICY, use_ema=use_ema,
            mean_rgb=info.mean_rgb, stddev_rgb=info.stddev_rgb))
        eval_loader = TFRecordImageLoader(
            data_dir, info, batch_size=BATCH, train=False, image_size=IMAGE,
            num_workers=os.cpu_count() or 4, use_native=True,
            drop_remainder=False)
        metrics = evaluate(eval_fn, state, eval_loader, batch_size=BATCH)
        results[name] = metrics
        print(f"eval[{name}]: top1={metrics['top1']:.2f}% "
              f"top5={metrics['top5']:.2f}% loss={metrics['loss']:.4f} "
              f"count={metrics['count']:.0f}", flush=True)

    assert results["raw"]["top1"] >= 90.0, results
    assert results["ema"]["top1"] >= results["raw"]["top1"] - 1.0, results
    print("CONVERGENCE DRIVE OK")


if __name__ == "__main__":
    main()
