"""KD hyperparameter sweep to diagnose the config-5 drive failure.

Measured so far (kd_drive.py, subset design, 600 steps, batch 64):
  control (CE only)            held-out top1 = 84.0   eval loss 2.93
  kd (alpha=1, T=1, lr=0.2)    held-out top1 = 42.2   eval loss 3.54
  teacher in-path (kd_probe.py): 100% clean eval, 97-98% on the augmented
  train stream, mean maxp 0.73 — the teacher is NOT the problem.

Hypothesis: the additive CE + KL term doubles the logit-gradient scale,
pushing the R152 student past its stability edge at the drive LR (the KD
run's train loss oscillates 3.5-4.3 instead of descending). Discriminating
legs:
  half_lr : alpha=1, T=1, lr=0.1  — same pull, restored effective scale
  alpha.3 : alpha=0.3, T=1, lr=0.2 — weaker pull at full LR
  temp2   : alpha=1, T=2, lr=0.2  — softer targets, same grad magnitude

Run: python scripts/kd_sweep.py [student_steps]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kd_drive import cli, data_flags, last_eval, make_subset
from convergence_drive_scale import make_set

BATCH = 64


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    root = "/tmp/axcnn_kd"
    full_root = "/tmp/axcnn_convergence_scale"
    make_set(full_root, n_train=120, n_eval=24, seed=0)
    sub_dir, sub_info = make_subset(full_root, root, 12)
    sflags = data_flags(sub_dir, sub_info)
    teacher_ckpt = os.path.join(root, "teacher", "checkpoints")

    legs = [
        ("half_lr", dict(kd_temp=1.0, kd_alpha=1.0, base_lr=0.1)),
        ("alpha.3", dict(kd_temp=1.0, kd_alpha=0.3, base_lr=0.2)),
        ("temp2", dict(kd_temp=2.0, kd_alpha=1.0, base_lr=0.2)),
    ]
    out = {}
    for tag, hp in legs:
        mdir = os.path.join(root, f"sweep_{tag}_{steps}")
        if not os.path.isdir(os.path.join(mdir, "checkpoints")):
            cli(["--config=assemble_resnet152_kd", *sflags,
                 f"--train.batch_size={BATCH}",
                 f"--train.train_steps={steps}",
                 "--train.lr_warmup_epochs=0.07",
                 f"--train.base_lr={hp['base_lr']}",
                 f"--train.kd_teacher_checkpoint={teacher_ckpt}",
                 f"--train.kd_temp={hp['kd_temp']}",
                 f"--train.kd_alpha={hp['kd_alpha']}",
                 f"--runtime.model_dir={mdir}"], tag)
        m = last_eval(mdir)
        out[tag] = {"top1": round(m["top1"], 2), "loss": round(m["loss"], 4),
                    **hp}
        print(f"[sweep/{tag}] top1={m['top1']:.2f} loss={m['loss']:.4f}",
              flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
