"""BASELINE config-5 drive: Assemble-ResNet-152 + KD, trained FOR REAL.

Every prior piece of config-5 evidence was plumbing (1-step dryrun, capacity
probe, tiny CPU smoke). This drive trains the flagship through the LITERAL
shipped CLI (`python -m axcnn.cli.main_classification`) on the real chip:

1. **Teacher**: Assemble-ResNet-50 (`--config=assemble_resnet50`) on the
   FULL 50-class generated set (6000 images, clean labels, same data as
   convergence_drive_scale, production constants, echo x2) to high held-out
   accuracy, checkpoints saved.
2. **Student control**: Assemble-ResNet-152 (`--config=assemble_resnet152_kd`
   WITHOUT a teacher) on a small subset whose train labels carry
   ``noise_frac`` uniform label noise, at a fixed step budget.
3. **Student KD**: the identical command plus
   ``--train.kd_teacher_checkpoint`` — same seed, same subset, same noisy
   labels, same budget; the ONLY difference is the additive T^2*KL term
   (losses.py kd_loss).

Why label noise: the measured clean-task results (recorded in
docs/CONVERGENCE.md) are that on THIS generated set — where 4 images/class
already fully specify each class — distillation does not help and can hurt
(full set: 45.3 vs 77.5; n=12 subset: 83.8 vs 84.0 parity; n=4 subset:
88.6 vs 93.4; teacher healthy at 97-98% on the augmented train stream per
kd_probe.py). That matches Hinton et al.'s framing: soft targets pay when
the hard labels UNDER-specify the task — ImageNet's label noise/ambiguity
regime (the reference's config 5 trains against 1000 classes with
single-label annotations of multi-object images). The controlled offline
stand-in for that regime is uniform label noise: the teacher (trained on
clean, plentiful data) carries signal the student's corrupted labels
don't, and the KL term is the only difference between legs. The control
memorizes noise (64 epochs over 600 images); the KD leg is pulled toward
the teacher's clean decision function.

Pass criteria (recorded in docs/CONVERGENCE.md):
- KD leg beats EVERY control (including a second control at its own best
  LR) on held-out top-1 AND eval loss at equal budget — evidence that
  distillation *helps learning* here, not just compiles (reference:
  main_classification.py KD path, SURVEY §2 item 14,
  §6 "Assemble-ResNet-152 84.2%" row).
- Epilogue: EMA eval >= raw eval on the KD student (production EMA constant
  behaves at the R152 scale too).

Run:  python scripts/kd_drive.py [student_steps] [root] [n_subset]
          [base_lr] [noise_frac]          (~25 min on the TPU)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from axcnn.utils.cache import cache_dir  # noqa: E402

from convergence_drive_scale import HUES, PATTERNS, make_set

TEACHER_STEPS = 2500
BATCH = 64


def make_subset(full_root, out_root, n_per_class, noise_frac=0.0,
                noise_seed=1):
    """Subset TFRecords from the SAME raw images/label order as the full
    50-class set (the teacher's head indices must mean the same classes),
    with an optional deterministic uniform-label-noise fraction applied to
    the TRAIN split only (eval labels stay clean — held-out accuracy
    against TRUE labels is the signal)."""
    import numpy as np

    from axcnn.data.build_tfrecords import write_shards
    from axcnn.data.datasets import DatasetInfo

    tag = f"rec_sub{n_per_class}" + (
        f"_noise{noise_frac}" if noise_frac else "")
    out = os.path.join(out_root, tag)
    info = DatasetInfo(f"kd_{tag}", num_classes=50,
                       num_train=n_per_class * 50, num_eval=24 * 50,
                       train_prefix="train", eval_prefix="validation")
    marker = os.path.join(out, "ok")
    if os.path.exists(marker):
        return out, info
    raw = os.path.join(full_root, "raw")
    items = {"train": [], "validation": []}
    label = 0
    for hname in HUES:            # iteration order == make_set's label order
        for kind in PATTERNS:
            d = os.path.join(raw, f"{hname}_{kind}")
            for i in range(n_per_class):
                items["train"].append(
                    (os.path.join(d, f"{i}.jpg"), label, f"{hname}_{kind}"))
            for i in range(120, 144):   # the full set's eval split, unchanged
                items["validation"].append(
                    (os.path.join(d, f"{i}.jpg"), label, f"{hname}_{kind}"))
            label += 1
    if noise_frac:
        rng = np.random.default_rng(noise_seed)
        n = len(items["train"])
        idx = rng.choice(n, size=int(round(noise_frac * n)), replace=False)
        noised = []
        for j, (path, lab, txt) in enumerate(items["train"]):
            if j in set(idx.tolist()):
                # uniform WRONG label (never the true one)
                lab = int((lab + rng.integers(1, 50)) % 50)
            noised.append((path, lab, txt))
        items["train"] = noised
    write_shards(items["train"], out, "train", 4)
    write_shards(items["validation"], out, "validation", 2)
    open(marker, "w").close()
    return out, info



def cli(args, tag):
    cmd = [sys.executable, "-m", "axcnn.cli.main_classification"] + args
    print(f"[{tag}] $ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=cache_dir())
    r = subprocess.run(cmd, env=env)
    print(f"[{tag}] exit={r.returncode} in {time.time() - t0:.0f}s",
          flush=True)
    assert r.returncode == 0, f"{tag} failed"


def last_eval(model_dir):
    out = None
    with open(os.path.join(model_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") == "eval":
                out = rec
    assert out is not None, f"no eval record in {model_dir}"
    return out


def data_flags(data_dir, info):
    return [
        "--data.dataset_name=custom",
        f"--data.data_dir={data_dir}",
        f"--data.num_classes={info.num_classes}",
        f"--data.num_train_examples={info.num_train}",
        f"--data.num_eval_examples={info.num_eval}",
        "--data.loader=cpp",
        "--data.echo_factor=2",
        "--data.num_workers=4",
    ]


def main():
    student_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/axcnn_kd"
    n_subset = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    # student LR: kd_sweep measured lr=0.2 as past the R152's stability
    # edge WITH the additive KL term (42.2 vs 83.8 at lr=0.1, T=1 alpha=1);
    # both legs run at the KD-stable LR and the control ALSO gets its own
    # best LR (0.2) so KD is compared against the strongest control.
    base_lr = float(sys.argv[4]) if len(sys.argv) > 4 else 0.1
    # 40% uniform label noise: the controlled stand-in for the label-
    # ambiguity regime KD exists for (see module docstring). 0 reproduces
    # the recorded clean-task negative result.
    noise_frac = float(sys.argv[5]) if len(sys.argv) > 5 else 0.4
    os.makedirs(root, exist_ok=True)
    # reuse the scale drive's generated 50-class set (cached by marker file)
    full_root = "/tmp/axcnn_convergence_scale"
    data_dir, info = make_set(full_root, n_train=120, n_eval=24, seed=0)
    dflags = data_flags(data_dir, info)
    sub_dir, sub_info = make_subset(full_root, root, n_subset,
                                    noise_frac=noise_frac)
    sflags = data_flags(sub_dir, sub_info)

    teacher_dir = os.path.join(root, "teacher")
    teacher_ckpt = os.path.join(teacher_dir, "checkpoints")
    if not os.path.isdir(teacher_ckpt):
        cli(["--config=assemble_resnet50", *dflags,
             f"--runtime.model_dir={teacher_dir}",
             f"--train.batch_size={BATCH}",
             f"--train.train_steps={TEACHER_STEPS}",
             # train_steps>0 makes steps_per_epoch = total: warmup epochs
             # are fractions of the run, evals land only at the end
             "--train.lr_warmup_epochs=0.07",
             "--train.base_lr=0.2",  # drive LR (per-256; scaled to 0.05)
             ], "teacher")
    tm = last_eval(teacher_dir)
    print(f"[teacher] held-out top1={tm['top1']:.2f} top5={tm['top5']:.2f} "
          f"loss={tm['loss']:.4f}", flush=True)
    assert tm["top1"] >= 90.0, f"teacher too weak to distill from: {tm}"

    common = ["--config=assemble_resnet152_kd", *sflags,
              f"--train.batch_size={BATCH}",
              f"--train.train_steps={student_steps}",
              "--train.lr_warmup_epochs=0.07"]
    kd_flags = [f"--train.kd_teacher_checkpoint={teacher_ckpt}",
                "--train.kd_temp=1.0", "--train.kd_alpha=1.0"]
    leg_defs = [("control", base_lr, []),
                ("kd", base_lr, kd_flags)]
    if base_lr != 0.2:
        leg_defs.append(("control_lr0.2", 0.2, []))
    legs, leg_dirs = {}, {}
    suffix = f"_{student_steps}_sub{n_subset}" + (
        f"_noise{noise_frac}" if noise_frac else "")
    for tag, lr, extra in leg_defs:
        mdir = os.path.join(root, f"student_{tag}{suffix}"
                            + (f"_lr{lr}" if lr != 0.2 else ""))
        if not os.path.isdir(os.path.join(mdir, "checkpoints")):
            cli([*common, f"--train.base_lr={lr}",
                 f"--runtime.model_dir={mdir}", *extra], tag)
        legs[tag] = last_eval(mdir)
        leg_dirs[tag] = mdir
        print(f"[student/{tag}] held-out top1={legs[tag]['top1']:.2f} "
              f"top5={legs[tag]['top5']:.2f} loss={legs[tag]['loss']:.4f}",
              flush=True)

    # epilogue: raw-vs-EMA on the KD student (loop.run evals EMA when
    # use_ema; the raw read needs a library call on the saved state)
    import jax

    from axcnn.ckpt.checkpoint import CheckpointManager
    from axcnn.core.dtypes import BF16_POLICY
    from axcnn.data.pipeline import TFRecordImageLoader
    from axcnn.models.resnet import ModelConfig
    from axcnn.train.loop import evaluate
    from axcnn.train.train_step import create_train_state, make_eval_step

    mgr = CheckpointManager(os.path.join(leg_dirs["kd"], "checkpoints"))
    meta = mgr.model_config()
    mcfg = ModelConfig(**{k: (tuple(v) if isinstance(v, list) else v)
                          for k, v in meta.items()})
    state = mgr.restore(create_train_state(jax.random.key(0), mcfg,
                                           use_ema=True))[0]
    mgr.close()
    raw_ema = {}
    for name, use_ema in (("raw", False), ("ema", True)):
        loader = TFRecordImageLoader(data_dir, info, batch_size=BATCH,
                                     train=False, image_size=224,
                                     num_workers=4, use_native=True,
                                     drop_remainder=False)
        fn = jax.jit(make_eval_step(mcfg, policy=BF16_POLICY, use_ema=use_ema,
                                    mean_rgb=info.mean_rgb,
                                    stddev_rgb=info.stddev_rgb))
        raw_ema[name] = evaluate(fn, state, loader, batch_size=BATCH)
        print(f"[student/kd {name}] top1={raw_ema[name]['top1']:.2f} "
              f"loss={raw_ema[name]['loss']:.4f}", flush=True)

    # the bar: KD must beat the BEST control on each metric independently
    # (per-LR controls so the comparison is never against a handicapped leg)
    best_ctl_top1 = max(m["top1"] for t, m in legs.items() if t != "kd")
    best_ctl_loss = min(m["loss"] for t, m in legs.items() if t != "kd")
    summary = {
        "teacher_top1": round(tm["top1"], 2),
        "student_steps": student_steps,
        "n_subset": n_subset,
        "noise_frac": noise_frac,
        "base_lr": base_lr,
        **{f"{t}_top1": round(m["top1"], 2) for t, m in legs.items()},
        **{f"{t}_loss": round(m["loss"], 4) for t, m in legs.items()},
        "kd_raw_top1": round(raw_ema["raw"]["top1"], 2),
        "kd_ema_top1": round(raw_ema["ema"]["top1"], 2),
    }
    print(json.dumps(summary), flush=True)
    assert legs["kd"]["top1"] > best_ctl_top1, \
        f"KD did not beat the best control: {summary}"
    assert legs["kd"]["loss"] < best_ctl_loss, \
        f"KD eval loss not better than the best control: {summary}"
    assert raw_ema["ema"]["top1"] >= raw_ema["raw"]["top1"] - 1.0, \
        f"EMA lags raw: {summary}"
    print("KD DRIVE (config 5: R152 student + R50 teacher, literal CLI) OK",
          flush=True)


if __name__ == "__main__":
    main()
