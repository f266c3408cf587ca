"""1001-way convergence drive: the accuracy contract's head geometry, for real.

Every prior accuracy drive tops out at 50 classes; the contract is a
1001-way head (BASELINE.json; reference README's 1000-class ImageNet table
with the background-class offset, SURVEY §6). Loss scale at ln(1001)=6.9,
top-5 dynamics, EMA behavior, label-offset plumbing and the head's
FLOP/HBM share at the real size were all extrapolated. This drive closes
the last offline-reachable accuracy-geometry gap:

- **1000 classes** = 10 foreground hues x 10 background hues x 10 spatial
  patterns — fully composable, so the generator stays small while every
  class needs THREE features recovered jointly. All three factors are
  invariant under the training augmentations:
  - hues are per-channel ratios (brightness/contrast AA ops scale channels
    together; Solarize/Posterize corrupt a minority of TRAIN draws — the
    tolerated label-noise regime of the 50-class drive — eval applies
    no AA);
  - the foreground boost range ([115,145]) sits strictly above the
    background's ([55,75]), so which hue is "foreground" survives any
    global intensity op;
  - patterns are periodic or center-randomized shapes (never absolute
    frequency — RandomResizedCrop magnifies up to ~2.8x), distinct by
    SHAPE at any zoom, and flip-closed ("diag" draws either diagonal
    direction per image, so a flip maps the class onto itself).
- Labels are stored 0..999 and the drive passes ``--data.label_offset=1``
  with ``--data.num_classes=1001`` — the exact ImageNet geometry (class 0
  = unused background), through the same plumbing
  (`loop._dataset_info` -> pipeline label validation) a real ImageNet run
  uses.
- Trained through the LITERAL shipped CLI (`python -m
  axcnn.cli.main_classification`, dataset_name=custom) with the
  production constants (preset defaults: bn_momentum 0.997, ema_decay
  0.9999 + ramp), native C++ loader + C++ AutoAugment(v0) + mixup + label
  smoothing + DropBlock, data echoing x4 (this host has ONE core; fresh
  demand at 64 img/step would put decode on the critical path).
- Eval on the held-out split (3 img/class = 3,000 images) with raw AND
  EMA weights, top-1 and top-5; throughput recorded from the run's own
  metrics.jsonl (the 1001-way head's cost is *in* the number).

Pass criteria (recorded in docs/CONVERGENCE.md): raw AND EMA top-1 >=
TOP1_BAR (chance is 0.1%), top-5 >= TOP5_BAR, and EMA within
EMA_LAG_TOL of raw. The tolerance is 2 points, not the short-drive
drives' "EMA >= raw": 10,000 updates is exactly ONE 1/(1-0.9999) time
constant, so the production shadow still carries mid-training mass
(measured: raw 93.2 vs EMA 91.63). The reference's 120-epoch ImageNet
runs sit at ~60x the time constant, where the average is over converged
weights only — the regime where EMA wins (and does win in the 2.5k-step
ramped drives, convergence_drive_scale.py).

Run:  python scripts/convergence_drive_1k.py [steps] [root]   (~20 min)
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from axcnn.utils.cache import cache_dir  # noqa: E402

import numpy as np
from PIL import Image

BATCH = 64
IMAGE = 224
ECHO = 4
N_TRAIN = 24   # per class
N_EVAL = 3     # per class
TOP1_BAR = 80.0
TOP5_BAR = 95.0
EMA_LAG_TOL = 2.0  # one-time-constant horizon; see the docstring

# 10 hues with distinct per-channel ratios (see convergence_drive_scale.py
# for the AA-invariance rationale). Used for BOTH foreground and background
# palettes; the boost ranges keep the roles unambiguous.
HUES = {
    "red": (1.0, 0.0, 0.0), "green": (0.0, 1.0, 0.0), "blue": (0.0, 0.0, 1.0),
    "yellow": (1.0, 1.0, 0.0), "magenta": (1.0, 0.0, 1.0),
    "cyan": (0.0, 1.0, 1.0), "orange": (1.0, 0.5, 0.0),
    "purple": (0.5, 0.0, 1.0), "spring": (0.0, 1.0, 0.5),
    "white": (1.0, 1.0, 1.0),
}
PATTERNS = ("hstripe", "vstripe", "checker", "dots", "rings",
            "diag", "dcheck", "squares", "grid", "waves")


def _pattern_mask(rng, kind, h, w):
    """Boolean foreground mask; every pattern is flip- and crop-invariant
    and distinguished by shape, not absolute scale (the crop zooms)."""
    band = int(rng.integers(14, 24))
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "hstripe":
        return (yy // band) % 2 == 0
    if kind == "vstripe":
        return (xx // band) % 2 == 0
    if kind == "checker":
        return ((yy // band) + (xx // band)) % 2 == 0
    if kind == "dots":
        p = 2 * band
        r = band * 0.55
        return ((yy % p - p / 2) ** 2 + (xx % p - p / 2) ** 2) < r * r
    if kind == "rings":
        # concentric circles around a random center: the class is the
        # pattern, not the position — invariant under flips/crops
        cy = int(rng.integers(h // 4, 3 * h // 4))
        cx = int(rng.integers(w // 4, 3 * w // 4))
        rad = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        return (rad // band) % 2 == 0
    if kind == "diag":
        # either diagonal direction per IMAGE: a horizontal flip maps one
        # direction onto the other, so the CLASS is flip-closed
        s = (yy + xx) if rng.integers(2) else (yy - xx)
        return (s // int(band * 1.5)) % 2 == 0
    if kind == "dcheck":
        # 45-degree-rotated checker (diamond tiling) — distinct from the
        # axis-aligned checker at any zoom
        b = int(band * 1.5)
        return (((yy + xx) // b) + ((yy - xx) // b)) % 2 == 0
    if kind == "squares":
        # concentric squares (Chebyshev rings): nested right angles vs
        # rings' curves
        cy = int(rng.integers(h // 4, 3 * h // 4))
        cx = int(rng.integers(w // 4, 3 * w // 4))
        rad = np.maximum(np.abs(yy - cy), np.abs(xx - cx))
        return (rad // band) % 2 == 0
    if kind == "grid":
        # thin-line lattice: mostly background with a bright mesh — distinct
        # from checker/stripes by coverage and connectivity
        p, t = 3 * band, max(6, band // 2)
        return (yy % p < t) | (xx % p < t)
    # waves: sinusoidally displaced horizontal stripes; flips only shift
    # the phase
    lam = 4 * band
    return ((yy + band * np.sin(2 * np.pi * xx / lam)).astype(np.int64)
            // band) % 2 == 0


def _image(rng, fg, bg, kind, h=256, w=320):
    img = rng.integers(0, 40, (h, w, 3)).astype(np.int16)
    mask = _pattern_mask(rng, kind, h, w)
    fg_boost = int(rng.integers(115, 146))
    bg_boost = int(rng.integers(55, 76))
    for c in range(3):
        add = np.where(mask, int(fg_boost * fg[c]), int(bg_boost * bg[c]))
        img[..., c] += add
    return np.clip(img, 0, 255).astype(np.uint8)


def make_set_1k(root, n_train, n_eval, seed):
    """1000-class set; stored labels 0..999 (the CLI adds label_offset=1)."""
    from axcnn.data.build_tfrecords import write_shards

    # the 24/3 set keeps its round-4 location ("rec"); other sizes get
    # their own shard dir so two sizes never mix in one directory
    out = os.path.join(root, "rec" if (n_train, n_eval) == (N_TRAIN, N_EVAL)
                       else f"rec_{n_train}_{n_eval}")
    marker = os.path.join(out, f"ok-1k-{n_train}-{n_eval}")
    if os.path.exists(marker):
        return out
    rng = np.random.default_rng(seed)
    raw = os.path.join(root, "raw")
    items = {"train": [], "validation": []}
    label = 0
    t0 = time.time()
    hues = list(HUES.items())
    for fname, fhue in hues:
        for bname, bhue in hues:
            for kind in PATTERNS:
                d = os.path.join(raw, f"{fname}_{bname}_{kind}")
                os.makedirs(d, exist_ok=True)
                for i in range(n_train + n_eval):
                    path = os.path.join(d, f"{i}.jpg")
                    if not os.path.exists(path):
                        Image.fromarray(_image(rng, fhue, bhue, kind)).save(
                            path, "JPEG", quality=92)
                    split = "train" if i < n_train else "validation"
                    items[split].append((path, label,
                                         f"{fname}_{bname}_{kind}"))
                label += 1
        print(f"[gen] fg={fname} done ({label} classes, "
              f"{time.time() - t0:.0f}s)", flush=True)
    print(f"[gen] {label} classes, {len(items['train'])} train / "
          f"{len(items['validation'])} eval in {time.time() - t0:.0f}s",
          flush=True)
    write_shards(items["train"], out, "train", 16)
    write_shards(items["validation"], out, "validation", 4)
    open(marker, "w").close()
    return out



def cli(args, tag, retries=2):
    """Run the CLI; on the watchdog's exit code 42 (hung device dispatch,
    utils/watchdog.py) re-invoke — the loop auto-resumes from the last
    periodic checkpoint. Any other nonzero exit is a real failure."""
    cmd = [sys.executable, "-m", "axcnn.cli.main_classification"] + args
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=cache_dir())
    for attempt in range(retries + 1):
        print(f"[{tag}] $ {' '.join(cmd)}", flush=True)
        t0 = time.time()
        r = subprocess.run(cmd, env=env)
        print(f"[{tag}] exit={r.returncode} in {time.time() - t0:.0f}s",
              flush=True)
        if r.returncode != 42:
            break
        print(f"[{tag}] hang detected (exit 42); "
              f"retry {attempt + 1}/{retries} resumes from checkpoint",
              flush=True)
    assert r.returncode == 0, f"{tag} failed"


def metrics(model_dir):
    evals, ips = [], []
    with open(os.path.join(model_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") == "eval":
                evals.append(rec)
            elif rec.get("tag") == "train" and rec.get("images_per_sec"):
                ips.append(rec["images_per_sec"])
    assert evals, f"no eval record in {model_dir}"
    return evals[-1], (float(np.median(ips)) if ips else 0.0)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/axcnn_drive_1k"
    # per-class train count (argv 3): 24 = the round-4 run; 48 doubles the
    # set (48k images) to shorten the extrapolation toward ImageNet scale
    # (VERDICT r4 next-round #8)
    n_per_class = int(sys.argv[3]) if len(sys.argv) > 3 else N_TRAIN
    os.makedirs(root, exist_ok=True)

    data_dir = make_set_1k(root, n_per_class, N_EVAL, seed=0)
    n_train, n_eval = n_per_class * 1000, N_EVAL * 1000
    model_dir = os.path.join(root, f"run_{steps}"
                             + (f"_n{n_per_class}"
                                if n_per_class != N_TRAIN else ""))

    def _train_complete():
        """True once the run's OWN final eval was logged (the loop evals at
        step == train_steps).  A bare checkpoints/ dir is NOT completion:
        the axon tunnel can wedge mid-run (observed at step 7700/10000,
        2026-08-19) and the CLI auto-resumes from the last periodic
        checkpoint on re-invocation."""
        path = os.path.join(model_dir, "metrics.jsonl")
        if not os.path.exists(path):
            return False
        with open(path) as f:
            return any(json.loads(l).get("tag") == "eval"
                       and json.loads(l)["step"] >= steps for l in f)

    if not _train_complete():
        cli(["--config=assemble_resnet50",
             "--data.dataset_name=custom",
             f"--data.data_dir={data_dir}",
             "--data.num_classes=1001",      # 1000 + background class 0
             "--data.label_offset=1",        # the ImageNet head geometry
             f"--data.num_train_examples={n_train}",
             f"--data.num_eval_examples={n_eval}",
             "--data.loader=cpp",
             f"--data.echo_factor={ECHO}",
             "--data.num_workers=4",
             f"--runtime.model_dir={model_dir}",
             # the tunnel can wedge (claim lost mid-run); bound the loss
             # and detect the hang in-process (exit 42 -> cli() retries)
             "--runtime.save_checkpoint_steps=1000",
             "--runtime.hang_watchdog_s=600",
             f"--train.batch_size={BATCH}",
             f"--train.train_steps={steps}",
             "--train.lr_warmup_epochs=0.05",
             "--train.base_lr=0.2",          # per-256; scaled to 0.05 at b64
             ], "1k")
    ev, med_ips = metrics(model_dir)
    print(f"[1k ema] held-out top1={ev['top1']:.2f} top5={ev['top5']:.2f} "
          f"loss={ev['loss']:.4f}  (median {med_ips:.0f} img/s end-to-end, "
          f"echo x{ECHO})", flush=True)

    # raw-vs-EMA on the saved state (run() evals EMA when use_ema)
    import jax

    from axcnn.ckpt.checkpoint import CheckpointManager
    from axcnn.core.dtypes import BF16_POLICY
    from axcnn.data.datasets import DatasetInfo
    from axcnn.data.pipeline import TFRecordImageLoader
    from axcnn.models.resnet import ModelConfig
    from axcnn.train.loop import evaluate
    from axcnn.train.train_step import create_train_state, make_eval_step

    info = DatasetInfo("drive1k", 1001, n_train, n_eval, label_offset=1,
                       train_prefix="train", eval_prefix="validation")
    mgr = CheckpointManager(os.path.join(model_dir, "checkpoints"))
    meta = mgr.model_config()
    mcfg = ModelConfig(**{k: (tuple(v) if isinstance(v, list) else v)
                          for k, v in meta.items()})
    state = mgr.restore(create_train_state(jax.random.key(0), mcfg,
                                           use_ema=True))[0]
    mgr.close()
    results = {}
    for name, use_ema in (("raw", False), ("ema", True)):
        loader = TFRecordImageLoader(data_dir, info, batch_size=BATCH,
                                     train=False, image_size=IMAGE,
                                     num_workers=4, use_native=True,
                                     drop_remainder=False)
        fn = jax.jit(make_eval_step(mcfg, policy=BF16_POLICY, use_ema=use_ema,
                                    mean_rgb=info.mean_rgb,
                                    stddev_rgb=info.stddev_rgb))
        results[name] = evaluate(fn, state, loader, batch_size=BATCH)
        print(f"[1k {name}] top1={results[name]['top1']:.2f} "
              f"top5={results[name]['top5']:.2f} "
              f"loss={results[name]['loss']:.4f} "
              f"count={results[name]['count']:.0f}", flush=True)

    summary = {
        "steps": steps, "echo": ECHO, "batch": BATCH,
        "median_img_per_sec": round(med_ips, 1),
        **{f"{n}_{k}": round(m[k], 2) for n, m in results.items()
           for k in ("top1", "top5", "loss")},
    }
    print(json.dumps(summary), flush=True)
    raw1, ema1 = results["raw"]["top1"], results["ema"]["top1"]
    assert raw1 >= TOP1_BAR, f"raw top-1 {raw1} < {TOP1_BAR} on 1001-way"
    assert ema1 >= TOP1_BAR, f"EMA top-1 {ema1} < {TOP1_BAR} on 1001-way"
    assert results["raw"]["top5"] >= TOP5_BAR, results["raw"]
    assert results["ema"]["top5"] >= TOP5_BAR, results["ema"]
    # The lag tolerance exists ONLY for the one-time-constant horizon
    # (10k updates at decay 0.9999): there the shadow still carries
    # mid-training mass and raw may lead. At >= 3 time constants the
    # average is over converged weights — the regime the reference ships
    # EMA eval FOR — so the production constant must WIN outright
    # (VERDICT r4 next-round #3: measure the crossover, don't tolerate it).
    time_constants = steps * (1.0 - 0.9999) if steps else 0.0
    ema_tol = EMA_LAG_TOL if time_constants < 3.0 else 0.0
    assert ema1 >= raw1 - ema_tol, \
        f"EMA vs raw at {time_constants:.1f} time constants: " \
        f"{ema1} vs {raw1} (tol {ema_tol})"
    print("1001-WAY CONVERGENCE DRIVE (contract head geometry, literal CLI) "
          "OK", flush=True)


if __name__ == "__main__":
    main()
