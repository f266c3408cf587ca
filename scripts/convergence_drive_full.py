"""Long-horizon convergence drive with the PRODUCTION recipe constants
(VERDICT r2 missing #1 / weak #7).

The round-2 drive proved the plumbing but substituted short-horizon
constants (bn_momentum 0.9, ema_decay 0.99). This drive runs the full
config-4 stack with the real ones — ``bn_momentum=0.997``,
``ema_decay=0.9999`` (with the reference's num_updates ramp,
axcnn/train/ema.py) — long enough for them to be meaningful:

- 10 classes (5 hues x 2 stripe orientations: color AND spatial features
  required), 2400 train + 600 held-out eval images, generated JPEG shards.
- 1500 steps batch 64 at 224^2 on the real chip, native loader + C++
  AutoAugment(v0) + mixup + LS + DropBlock schedule + EMA, bf16.
- Eval on the HELD-OUT split, raw vs EMA weights (EMA must not lag).
- Fine-tune legs (reference §3.3 warm-start protocol): a 4-class task of
  UNSEEN hue x orientation combinations, 120-step budget chosen so a cold
  start cannot reach ceiling — warm-start (pretrained body, fresh head)
  must beat cold by a wide margin, demonstrating the BENEFIT, not mere
  functioning (round 2's cold control also hit 100%).

  Fine-tune class-design constraint (learned the hard way): the classes
  must be INVARIANT under the training augmentations. A first attempt used
  diagonal-stripe orientation (dl vs dr) — random horizontal flip maps one
  diagonal onto the other, so the task was unlearnable by construction and
  both legs pinned at exactly 50% (color learned, orientation at chance).
  h/v orientations and hues survive flips/crops; AutoAugment v0's color
  ops leave hue ordering learnable (the pretrain run proves it).

The pretrained state is checkpointed under <root>/pre_ckpt — a re-run
(e.g. after tuning the fine-tune legs) restores it instead of repeating
the 1500-step pretrain.

Run:  python scripts/convergence_drive_full.py   (on the TPU; ~10-15 min)
Recorded results: docs/CONVERGENCE.md.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np
from PIL import Image

import jax

from axcnn.utils.cache import cache_dir  # noqa: E402

# persistent compile cache: the cold compile of the full train step takes
# minutes through the tunnel and looks like a hang without it
jax.config.update("jax_compilation_cache_dir", cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from axcnn.data.build_tfrecords import write_shards
from axcnn.data.datasets import DatasetInfo
from axcnn.data.pipeline import TFRecordImageLoader, device_prefetch
from axcnn.core.dtypes import BF16_POLICY
from axcnn.models.resnet import ModelConfig, resnet_init
from axcnn.train.loop import evaluate
from axcnn.train.schedules import make_lr_schedule
from axcnn.train.train_step import (
    create_train_state, make_train_step, make_eval_step)

BATCH = 64
IMAGE = 224
STEPS = 1500
FT_STEPS = 120

HUES = {"red": (1, 0, 0), "green": (0, 1, 0), "blue": (0, 0, 1),
        "yellow": (1, 1, 0), "magenta": (1, 0, 1)}


def _striped(rng, hue, orient, h=256, w=320, band=18):
    """Noisy striped image: bands of the hue color alternating with dark."""
    img = rng.integers(0, 70, (h, w, 3)).astype(np.int16)
    yy, xx = np.mgrid[0:h, 0:w]
    if orient == "h":
        phase = yy
    elif orient == "v":
        phase = xx
    elif orient == "dl":  # diagonal ↘
        phase = xx + yy
    else:  # "dr" diagonal ↗
        phase = xx - yy
    on = ((phase // band) % 2).astype(bool)
    boost = rng.integers(90, 130)
    for c, active in enumerate(hue):
        if active:
            img[..., c] += np.where(on, boost, 0)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_set(root, classes, n_train, n_eval, seed):
    """classes: list of (name, hue_rgb, orient). Writes train+validation
    shards; returns (dir, DatasetInfo)."""
    rng = np.random.default_rng(seed)
    out = os.path.join(root, "rec")
    tag = "-".join(name for name, _, _ in classes)
    marker = os.path.join(out, f"ok-{tag}-{n_train}-{n_eval}")
    info = DatasetInfo(f"drive{len(classes)}", num_classes=len(classes),
                       num_train=n_train * len(classes),
                       num_eval=n_eval * len(classes),
                       train_prefix="train", eval_prefix="validation")
    if os.path.exists(marker):
        return out, info
    raw = os.path.join(root, "raw")
    items = {"train": [], "validation": []}
    for label, (name, hue, orient) in enumerate(classes):
        d = os.path.join(raw, name)
        os.makedirs(d, exist_ok=True)
        for i in range(n_train + n_eval):
            path = os.path.join(d, f"{i}.jpg")
            Image.fromarray(_striped(rng, hue, orient)).save(
                path, "JPEG", quality=92)
            split = "train" if i < n_train else "validation"
            items[split].append((path, label, name))
    write_shards(items["train"], out, "train", 4)
    write_shards(items["validation"], out, "validation", 2)
    open(marker, "w").close()
    return out, info


def _train(cfg, data_dir, info, steps, *, base_lr, seed, init_state=None,
           label=""):
    loader = TFRecordImageLoader(
        data_dir, info, batch_size=BATCH, train=True, image_size=IMAGE,
        autoaugment_type="v0", seed=seed, num_workers=os.cpu_count() or 4,
        use_native=True)
    assert loader._native and loader._aa_policy == 0
    train_step = make_train_step(
        cfg,
        lr_schedule=make_lr_schedule(base_lr=base_lr, total_steps=steps,
                                     warmup_steps=max(steps // 15, 10)),
        total_steps=steps, policy=BF16_POLICY, label_smoothing=0.1,
        mixup_alpha=0.2, weight_decay=1e-4, use_ema=True, ema_decay=0.9999,
        mean_rgb=info.mean_rgb, stddev_rgb=info.stddev_rgb)
    state = init_state if init_state is not None else \
        create_train_state(jax.random.key(seed), cfg, use_ema=True)
    key = jax.random.key(seed + 1)
    it = device_prefetch(iter(loader), size=2)
    t0 = time.time()
    print(f"[{label}] compiling train step...", flush=True)
    step_fn = jax.jit(train_step, donate_argnums=(0,)).lower(
        state, next(it), key).compile()
    print(f"[{label}] compiled in {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    for step in range(1, steps + 1):
        state, m = step_fn(state, next(it), key)
        if step % 250 == 0 or step == 1:
            mm = jax.device_get(m)
            print(f"[{label}] step {step:4d}: loss={float(mm['loss']):.4f} "
                  f"train_top1={float(mm['train_top1']):.3f} "
                  f"lr={float(mm['lr']):.4f}", flush=True)
    print(f"[{label}] {steps} steps in {time.time() - t0:.0f}s", flush=True)
    return state


def _eval(cfg, state, data_dir, info, use_ema):
    eval_fn = jax.jit(make_eval_step(
        cfg, policy=BF16_POLICY, use_ema=use_ema,
        mean_rgb=info.mean_rgb, stddev_rgb=info.stddev_rgb))
    loader = TFRecordImageLoader(
        data_dir, info, batch_size=BATCH, train=False, image_size=IMAGE,
        num_workers=os.cpu_count() or 4, use_native=True,
        drop_remainder=False)
    return evaluate(eval_fn, state, loader, batch_size=BATCH)


def drive_model_config():
    """The ONE pretrain ModelConfig for every drive script that restores the
    cached checkpoint under <root>/pre_ckpt (ablation_drive,
    int8_serving_drive import this). Orbax restore matches by tree SHAPE, so
    a silently-diverged copy would evaluate under wrong architecture flags
    without erroring — keep a single source of truth."""
    return ModelConfig(resnet_size=50, num_classes=10, use_resnet_d=True,
                       use_se_block=True, use_sk_block=True,
                       anti_alias_type="sconv", use_dropblock=True,
                       dropblock_keep_prob=0.9, zero_gamma=True,
                       bn_momentum=0.997)  # PRODUCTION constant


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/axcnn_convergence_full"
    os.makedirs(root, exist_ok=True)
    print(f"devices: {jax.devices()}", flush=True)

    # ---- pretrain: 10 classes, production constants -----------------------
    pre_classes = [(f"{h}_{o}", HUES[h], o) for h in HUES for o in ("h", "v")]
    pre_dir, pre_info = make_set(os.path.join(root, "pre"), pre_classes,
                                 n_train=240, n_eval=60, seed=0)
    cfg = drive_model_config()
    from axcnn.ckpt.checkpoint import CheckpointManager
    mgr = CheckpointManager(os.path.join(root, "pre_ckpt"), max_to_keep=1)
    template = create_train_state(jax.random.key(0), cfg, use_ema=True)
    restored = mgr.restore(template)
    if restored is not None:
        state = restored[0]
        print(f"[pretrain] restored cached state at step "
              f"{int(state.step)}", flush=True)
    else:
        state = _train(cfg, pre_dir, pre_info, STEPS, base_lr=0.05, seed=0,
                       label="pretrain")
        mgr.save(state, force=True)
        mgr.wait()

    results = {}
    for name, use_ema in (("raw", False), ("ema", True)):
        m = _eval(cfg, state, pre_dir, pre_info, use_ema)
        results[f"pretrain_{name}"] = m
        print(f"pretrain eval[{name}] (held-out): top1={m['top1']:.2f}% "
              f"loss={m['loss']:.4f} count={m['count']:.0f}", flush=True)

    # ---- fine-tune: 4 unseen hue x orientation classes --------------------
    # cyan/white hues never appear in pretraining; h/v orientation is
    # flip-invariant (see the module docstring for why diagonals are not)
    ft_classes = [("cyan_h", (0, 1, 1), "h"), ("cyan_v", (0, 1, 1), "v"),
                  ("white_h", (1, 1, 1), "h"), ("white_v", (1, 1, 1), "v")]
    ft_dir, ft_info = make_set(os.path.join(root, "ft"), ft_classes,
                               n_train=150, n_eval=50, seed=1)
    ft_cfg = ModelConfig(resnet_size=50, num_classes=4, use_resnet_d=True,
                         use_se_block=True, use_sk_block=True,
                         anti_alias_type="sconv", use_dropblock=True,
                         dropblock_keep_prob=0.9, zero_gamma=True,
                         bn_momentum=0.997)

    # warm leg: pretrained EMA body + settled BN stats, fresh head
    warm0 = create_train_state(jax.random.key(9), ft_cfg, use_ema=True)
    src = state.ema if state.ema is not None else state.params
    body = {k: v for k, v in src.items() if k != "head"}
    warm_params = dict(warm0.params)
    warm_params.update(jax.tree.map(jax.numpy.asarray, body))
    warm0 = warm0._replace(params=warm_params, model_state=state.model_state)
    from axcnn.train.ema import ema_init
    warm0 = warm0._replace(ema=ema_init(warm0.params))
    warm = _train(ft_cfg, ft_dir, ft_info, FT_STEPS, base_lr=0.01, seed=3,
                  init_state=warm0, label="warm")
    results["ft_warm"] = _eval(ft_cfg, warm, ft_dir, ft_info, use_ema=False)

    # cold control: same budget from scratch
    cold = _train(ft_cfg, ft_dir, ft_info, FT_STEPS, base_lr=0.01, seed=4,
                  label="cold")
    results["ft_cold"] = _eval(ft_cfg, cold, ft_dir, ft_info, use_ema=False)

    print(json.dumps({k: {m: round(v[m], 2) for m in ("top1", "loss")}
                      for k, v in results.items()}, indent=2), flush=True)

    raw1, ema1 = results["pretrain_raw"]["top1"], results["pretrain_ema"]["top1"]
    warm1, cold1 = results["ft_warm"]["top1"], results["ft_cold"]["top1"]
    assert raw1 >= 90.0, f"pretrain raw top-1 {raw1} < 90"
    assert ema1 >= raw1 - 1.0, f"EMA lags raw with production decay: {ema1} vs {raw1}"
    assert warm1 >= 85.0, f"warm fine-tune top-1 {warm1} < 85"
    assert warm1 >= cold1 + 5.0, (
        f"warm-start benefit not demonstrated: warm {warm1} vs cold {cold1}")
    print("CONVERGENCE DRIVE (production constants) OK", flush=True)


if __name__ == "__main__":
    main()
