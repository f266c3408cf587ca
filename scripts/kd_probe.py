"""Diagnose the KD underperformance: is the in-path teacher healthy?

Loads the teacher EXACTLY the way train/loop.py's _load_teacher does, then
measures, under the train-step's conditions (eval-mode apply, bf16 policy,
normalized images):

1. teacher top1 + mean max-softmax on clean EVAL batches (should match the
   recorded 100% held-out eval),
2. teacher top1 + mean max-softmax on TRAIN-augmented batches,
3. the same after mixup with lam drawn as in the drive.

If (1) fails, checkpoint loading through the KD path is broken. If (1) is
fine but (2)/(3) collapse, the teacher cannot supply signal under the
student's augmentation stream and the KL term is noise.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from axcnn.core.dtypes import BF16_POLICY
from axcnn.data.datasets import DatasetInfo
from axcnn.data.pipeline import TFRecordImageLoader
from axcnn.models.resnet import resnet_apply
from axcnn.data.preprocessing import normalize_device
from axcnn.train.loop import _load_teacher
from axcnn.utils.config import Config


def main():
    root = "/tmp/axcnn_kd"
    data_dir = "/tmp/axcnn_convergence_scale/rec"
    info = DatasetInfo("probe", num_classes=50, num_train=6000,
                       num_eval=1200, train_prefix="train",
                       eval_prefix="validation")

    import dataclasses

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train,
            kd_teacher_checkpoint=os.path.join(root, "teacher",
                                               "checkpoints")),
        model=dataclasses.replace(cfg.model, num_classes=50))
    teacher = _load_teacher(cfg)
    assert teacher is not None
    t_cfg, t_params, t_state = teacher
    print(f"[probe] teacher cfg: size={t_cfg.resnet_size} "
          f"classes={t_cfg.num_classes}", flush=True)

    @jax.jit
    def t_logits(images):
        images = normalize_device(images, info.mean_rgb, info.stddev_rgb)
        logits, _ = resnet_apply(t_params, t_state, images, cfg=t_cfg,
                                 train=False, policy=BF16_POLICY)
        return logits

    def report(tag, images, labels):
        lg = t_logits(images)
        p = jax.nn.softmax(lg.astype(jnp.float32), -1)
        top1 = jnp.mean((jnp.argmax(lg, -1) == labels).astype(jnp.float32))
        conf = jnp.mean(jnp.max(p, -1))
        ent = jnp.mean(-jnp.sum(p * jnp.log(p + 1e-9), -1))
        scale = jnp.mean(jnp.std(lg.astype(jnp.float32), -1))
        print(f"[{tag}] top1={float(top1)*100:.1f} mean_maxp={float(conf):.3f}"
              f" mean_entropy={float(ent):.3f} logit_std={float(scale):.2f}",
              flush=True)
        return float(top1)

    # 1. clean eval batches
    ev = TFRecordImageLoader(data_dir, info, batch_size=64, train=False,
                             image_size=224, num_workers=4, use_native=True,
                             drop_remainder=True)
    it = iter(ev)
    b = next(it)
    report("eval/clean", jnp.asarray(b["images"]), jnp.asarray(b["labels"]))
    b = next(it)
    t1 = report("eval/clean2", jnp.asarray(b["images"]),
                jnp.asarray(b["labels"]))

    # 2. train-augmented batches (same stream the students see)
    tr = TFRecordImageLoader(data_dir, info, batch_size=64, train=True,
                             image_size=224, num_workers=4, use_native=True,
                             seed=0)
    it = iter(tr)
    for i in range(2):
        b = next(it)
        report(f"train/aug{i}", jnp.asarray(b["images"]),
               jnp.asarray(b["labels"]))

    # 3. mixup on a train batch, lam ~ the drive's Beta(0.2, 0.2)
    b = next(it)
    img = jnp.asarray(b["images"], jnp.float32)
    lam = 0.7
    mixed = lam * img + (1 - lam) * img[::-1]
    report("train/mixup0.7 (vs label_a)", mixed, jnp.asarray(b["labels"]))

    assert t1 > 0.9, "teacher broken on clean eval through the KD load path"
    print("[probe] done", flush=True)


if __name__ == "__main__":
    main()
