"""BASELINE acceptance drive: execute all five configs AS the shipped CLI.

docs/PARITY.md maps each BASELINE.json acceptance config to a command line,
but until this drive the on-chip evidence came from bespoke scripts calling
`make_train_step` directly. The product is the CLI + `train.loop.run`
(SURVEY §1 L4-L5: "the CLI itself is the public interface"), so this drive
executes each PARITY.md invocation LITERALLY — the recipe .sh wrappers
where PARITY.md names them — and asserts each config's exit code and
metric. Recorded output lives in docs/PARITY.md.

Legs (data: the 50-class generated set of convergence_drive_scale.py;
/tmp is wiped between sessions, so the set regenerates from its marker):

1. config 4 — `scripts/train_assemble_from_scratch.sh` (full assembled
   recipe: mixup + LS + AutoAugment + DropBlock + EMA, bf16) for a short
   REAL `run()` training on the chip with end-of-run checkpoint, eval and
   StableHLO export. Asserts: exit 0, held-out EMA top-1 >= 85, export
   reloads and serves (verified through `predict --export`).
2. config 3 — `scripts/eval.sh` (assembled eval) at batch 256 with
   `--train.use_ema` against config 4's checkpoint. Asserts: top-1 matches
   config 4's final eval to 0.5 and the full 1,200-image count is evaluated
   (batch-size independence + remainder padding).
3. config 2 — ResNet-50-D + BlurPool batch-128 eval via the literal
   `main_classification --runtime.eval_only` command (setup: a short
   training of that exact arch). Asserts: exit 0, top-1 >= 85, count 1200.
4. config 1 — `predict --cpu --train.dtype=fp32` single-224x224-image
   inference with the vanilla ResNet-50 (setup: a short vanilla training).
   Asserts: every probe image's top-1 equals its true class and the top-5
   posteriors are well-formed.
5. config 5 — Assemble-R152 + KD data-parallel on a virtual v5e-8
   (JAX_PLATFORMS=cpu + --xla_force_host_platform_device_count=8,
   `--runtime.num_devices=8`), teacher = config 4's checkpoint, 3 steps +
   eval at 64x64. Asserts: exit 0, finite losses, eval record present.
   (The REAL config-5 training evidence is scripts/kd_drive.py on the
   chip: KD beats its control by 28 points — docs/CONVERGENCE.md.)

Run:  python scripts/acceptance_drive.py [root]   (~15 min on the TPU)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from axcnn.utils.cache import cache_dir  # noqa: E402

from convergence_drive_scale import HUES, PATTERNS, make_set

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BATCH = 64
TRAIN_STEPS = 900
# Training-leg bar: the acceptance claim is "each config RUNS and TRAINS
# through the literal CLI", not peak accuracy (the dedicated convergence
# drives own that). 85 on 50 classes (2% chance) with margin: the first
# 600-step config-4 run measured 89.67.
ACC_BAR = 85.0



def run_cmd(cmd, tag, env_extra=None, capture=False, retries=2):
    """On the watchdog's exit 42 (hung device dispatch) re-invoke: the loop
    auto-resumes from its last checkpoint. Other nonzero exits are real."""
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=cache_dir())
    if env_extra:
        env.update(env_extra)
    for attempt in range(retries + 1):
        print(f"[{tag}] $ {' '.join(cmd)}", flush=True)
        t0 = time.time()
        r = subprocess.run(cmd, env=env,
                           stdout=subprocess.PIPE if capture else None,
                           text=capture)
        print(f"[{tag}] exit={r.returncode} in {time.time() - t0:.0f}s",
              flush=True)
        if r.returncode != 42:
            break
        print(f"[{tag}] hang detected (exit 42); "
              f"retry {attempt + 1}/{retries} resumes from checkpoint",
              flush=True)
    assert r.returncode == 0, f"{tag} failed (exit {r.returncode})"
    return r.stdout if capture else None


def last_eval(model_dir):
    out = None
    with open(os.path.join(model_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") == "eval":
                out = rec
    assert out is not None, f"no eval record in {model_dir}"
    return out


def train_final_eval(model_dir, steps=TRAIN_STEPS):
    """The training run's OWN final eval: the FIRST eval record at
    step >= steps. ``last_eval`` is wrong for this on a rerun — eval_only
    legs (config-3) append later records at the same step into the shared
    metrics.jsonl, so "latest" would compare config-3 with itself
    (round-4 advisor finding)."""
    with open(os.path.join(model_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") == "eval" and rec.get("step", 0) >= steps:
                return rec
    raise AssertionError(f"no final training eval in {model_dir}")


def training_done(model_dir, steps=TRAIN_STEPS):
    """True once the run's OWN final eval was logged (the loop evals at
    step == train_steps).  A bare checkpoints/ dir is NOT completion: the
    axon tunnel can wedge mid-run; the CLI auto-resumes on re-invocation."""
    path = os.path.join(model_dir, "metrics.jsonl")
    if not os.path.exists(path):
        return False
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") == "eval" and rec.get("step", 0) >= steps:
                return True
    return False


def data_flags(data_dir, info, echo=2):
    return [
        "--data.dataset_name=custom",
        f"--data.data_dir={data_dir}",
        f"--data.num_classes={info.num_classes}",
        f"--data.num_train_examples={info.num_train}",
        f"--data.num_eval_examples={info.num_eval}",
        "--data.loader=cpp",
        f"--data.echo_factor={echo}",
        "--data.num_workers=4",
    ]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/axcnn_acceptance"
    os.makedirs(root, exist_ok=True)
    full_root = "/tmp/axcnn_convergence_scale"
    data_dir, info = make_set(full_root, n_train=120, n_eval=24, seed=0)
    dflags = data_flags(data_dir, info)
    train_flags = [f"--train.batch_size={BATCH}",
                   f"--train.train_steps={TRAIN_STEPS}",
                   "--train.lr_warmup_epochs=0.07",
                   "--train.base_lr=0.2",  # per-256; scaled to 0.05 at b64
                   # hung-dispatch liveness probe: exit 42 -> run_cmd retries
                   "--runtime.hang_watchdog_s=600"]
    summary = {}

    # ---- config 4: full assembled training via the literal recipe script
    dir4 = os.path.join(root, "config4_assembled")
    export_dir = os.path.join(dir4, "export")
    if not training_done(dir4):
        run_cmd(["bash", os.path.join(REPO, "scripts",
                                      "train_assemble_from_scratch.sh"),
                 data_dir, dir4, *dflags[2:], *train_flags,
                 f"--runtime.export_dir={export_dir}",
                 "--data.dataset_name=custom"], "config4")
    ev4 = train_final_eval(dir4)
    print(f"[config4] held-out ema top1={ev4['top1']:.2f} "
          f"top5={ev4['top5']:.2f} loss={ev4['loss']:.4f}", flush=True)
    assert ev4["top1"] >= ACC_BAR, f"config-4 training too weak: {ev4}"
    assert os.path.isdir(export_dir) and os.listdir(export_dir), \
        "config-4 export missing"
    summary["config4"] = {"top1": round(ev4["top1"], 2),
                          "top5": round(ev4["top5"], 2),
                          "loss": round(ev4["loss"], 4)}

    # the export artifact must actually serve: reload it through predict
    probe = os.path.join(full_root, "raw", "red_hstripe", "121.jpg")
    out = run_cmd([sys.executable, "-m", "axcnn.cli.predict",
                   f"--image={probe}", f"--export={export_dir}"],
                  "config4-export", capture=True)
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["top5"][0][0] == 0, f"export top-1 != red_hstripe: {rec}"
    summary["config4"]["export_top1_ok"] = True

    # ---- config 3: assembled eval, batch 256, EMA weights (eval.sh)
    run_cmd(["bash", os.path.join(REPO, "scripts", "eval.sh"),
             data_dir, dir4, *dflags[2:], "--data.dataset_name=custom",
             "--train.batch_size=256", "--train.use_ema",
             # eval legs wedge too (the 2026-08-19 tunnel hang hit one);
             # run() arms the watchdog around eval_only since that incident
             "--runtime.hang_watchdog_s=600"], "config3")
    ev3 = last_eval(dir4)
    print(f"[config3] b256 ema top1={ev3['top1']:.2f} "
          f"count={ev3['count']:.0f}", flush=True)
    assert abs(ev3["top1"] - ev4["top1"]) <= 0.5, \
        f"b256 eval disagrees with training eval: {ev3['top1']} vs {ev4['top1']}"
    assert ev3["count"] == info.num_eval, ev3
    summary["config3"] = {"top1": round(ev3["top1"], 2),
                          "count": int(ev3["count"])}

    # ---- config 2: ResNet-50-D + BlurPool, batch-128 eval
    dir2 = os.path.join(root, "config2_resnetd_blurpool")
    # bn_momentum=0.9 for the SHORT vanilla setups: at 900 steps the
    # production 0.997 (tau=333 steps) averages BN stats over a window
    # where the raw weights are still moving fast — the stats pair with
    # mid-anneal weights, not the final ones, and eval collapses
    # (measured: 29.7 top-1 at loss 6.1 > ln(50), train ~100%). The
    # assembled legs don't hit this because their EMA weights are
    # averaged over the SAME window as the BN stats. The reference's
    # 90-epoch vanilla runs are ~300 tau deep, where this is invisible.
    arch2 = ["--model.use_resnet_d", "--model.anti_alias_type=sconv",
             "--model.bn_momentum=0.9"]
    if not training_done(dir2):
        run_cmd([sys.executable, "-m", "axcnn.cli.main_classification",
                 "--config=vanilla_resnet50", *arch2, *dflags,
                 f"--runtime.model_dir={dir2}", *train_flags], "config2-setup")
    run_cmd([sys.executable, "-m", "axcnn.cli.main_classification",
             "--config=vanilla_resnet50", *arch2, *dflags,
             "--train.batch_size=128", "--runtime.eval_only",
             "--runtime.hang_watchdog_s=600",
             f"--runtime.model_dir={dir2}"], "config2")
    ev2 = last_eval(dir2)
    print(f"[config2] b128 top1={ev2['top1']:.2f} count={ev2['count']:.0f}",
          flush=True)
    assert ev2["top1"] >= ACC_BAR and ev2["count"] == info.num_eval, ev2
    summary["config2"] = {"top1": round(ev2["top1"], 2),
                          "count": int(ev2["count"])}

    # ---- config 1: vanilla R50, single 224x224 image, fp32, CPU
    dir1 = os.path.join(root, "config1_vanilla")
    if not training_done(dir1):
        run_cmd([sys.executable, "-m", "axcnn.cli.main_classification",
                 "--config=vanilla_resnet50",
                 "--model.bn_momentum=0.9",  # short run; see arch2 comment
                 *dflags,
                 f"--runtime.model_dir={dir1}", *train_flags],
                "config1-setup")
    ev1 = last_eval(dir1)
    assert ev1["top1"] >= ACC_BAR, f"config-1 training too weak: {ev1}"
    # probe 5 held-out images of well-separated classes (label order is
    # hue-major then pattern, per make_set)
    probes, want = [], []
    classes = [("red", "hstripe"), ("green", "checker"), ("blue", "dots"),
               ("magenta", "rings"), ("cyan", "vstripe")]
    hue_idx = {h: i for i, h in enumerate(HUES)}
    pat_idx = {p: i for i, p in enumerate(PATTERNS)}
    for hue, pat in classes:
        probes.append(os.path.join(full_root, "raw", f"{hue}_{pat}",
                                   "130.jpg"))  # eval split starts at 120
        want.append(hue_idx[hue] * len(PATTERNS) + pat_idx[pat])
    out = run_cmd([sys.executable, "-m", "axcnn.cli.predict",
                   *[f"--image={p}" for p in probes], "--cpu",
                   "--train.dtype=fp32", "--config=vanilla_resnet50",
                   "--data.dataset_name=custom",
                   f"--data.num_classes={info.num_classes}",
                   f"--runtime.model_dir={dir1}"], "config1", capture=True)
    got = [json.loads(l) for l in out.strip().splitlines()]
    hits = 0
    for rec, w in zip(got, want):
        top5 = rec["top5"]
        mass = sum(p for _, p in top5)
        # well-formed posteriors: top-5 mass can't exceed 1, must carry
        # real confidence for a trained 50-class model (chance mass ~0.1),
        # every entry a probability, sorted descending (round-4 advisor:
        # the old |mass-1|<=1 bound was nearly vacuous)
        assert 0.5 <= mass <= 1.0 + 1e-4, f"bad posterior mass: {rec}"
        assert all(0.0 <= p <= 1.0 for _, p in top5), f"bad posterior: {rec}"
        assert all(top5[i][1] >= top5[i + 1][1]
                   for i in range(len(top5) - 1)), f"top5 unsorted: {rec}"
        hits += int(top5[0][0] == w)
    print(f"[config1] fp32 CPU predict: {hits}/{len(want)} top-1 correct",
          flush=True)
    assert hits == len(want), f"config-1 mispredicted: {got}"
    summary["config1"] = {"predict_correct": f"{hits}/{len(want)}",
                          "train_top1": round(ev1["top1"], 2)}

    # ---- config 5: R152 + KD data-parallel on the virtual v5e-8 mesh
    dir5 = os.path.join(root, "config5_kd_virtual8")
    run_cmd([sys.executable, "-m", "axcnn.cli.main_classification",
             "--config=assemble_resnet152_kd", *dflags,
             f"--train.kd_teacher_checkpoint={os.path.join(dir4, 'checkpoints')}",
             f"--runtime.model_dir={dir5}", "--runtime.num_devices=8",
             # --runtime.platform (not the JAX_PLATFORMS env var: the axon
             # plugin prepends itself and the TPU silently wins) forces the
             # CPU backend; XLA_FLAGS gives it 8 virtual devices
             "--runtime.platform=cpu",
             "--data.image_size=64", "--train.batch_size=16",
             "--train.train_steps=3", "--train.lr_warmup_epochs=0.4",
             "--data.echo_factor=1"], "config5",
            env_extra={"XLA_FLAGS":
                       "--xla_force_host_platform_device_count=8"})
    losses = []
    with open(os.path.join(dir5, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") == "train":
                losses.append(rec["loss"])
    ev5 = last_eval(dir5)
    import math
    assert losses and all(math.isfinite(l) for l in losses), losses
    print(f"[config5] virtual-8 KD: {len(losses)} steps, "
          f"loss[0]={losses[0]:.3f}, eval count={ev5['count']:.0f}",
          flush=True)
    summary["config5"] = {"steps": len(losses),
                          "finite": True,
                          "eval_count": int(ev5["count"]),
                          "on_chip_evidence": "scripts/kd_drive.py"}

    print(json.dumps(summary, indent=2), flush=True)
    print("ACCEPTANCE DRIVE (all five BASELINE configs, literal CLI) OK",
          flush=True)


if __name__ == "__main__":
    main()
