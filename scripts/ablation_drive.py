"""Assembled-vs-vanilla ablation drive: the reference's headline claim.

The reference's published results table (reference:README.md, SURVEY.md §6)
is two numbers per model: clean top-1 and corruption robustness (mCE, lower
is better) — and its core claim is that the assembled recipe improves BOTH
over a vanilla ResNet-50. With no ImageNet on this box the absolute numbers
are unreachable, but the *claim itself* is testable offline:

- Train BOTH recipes on the 10-class generated set of convergence_drive_full
  (same budget: 1500 steps x batch 64 @ 224^2 on the real chip):
    vanilla   — plain ResNet-50, flip/crop only, no LS/mixup/EMA/DropBlock,
                no zero-gamma (the reference's baseline row)
    assembled — full config-4 stack (ResNet-D + SE + SK + BlurPool +
                DropBlock + AutoAugment + mixup + LS + EMA, zero-gamma),
                restored from convergence_drive_full's cached checkpoint
                when present
- Evaluate clean held-out top-1 for both.
- Generate an ImageNet-C-layout corrupted copy of the held-out split with
  axcnn.data.build_imagenet_c (all 15 corruptions x severities {2,4}; the
  600-image split keeps generation O(10 min) on the 1-core host) and
  evaluate both models on the STORED corrupted pixels.
- Compute relative mCE with the VANILLA model as the normalizer (the role
  AlexNet plays in the published protocol): vanilla == 100 by construction;
  assembled < 100 demonstrates the robustness claim.

Results are recorded in docs/CONVERGENCE.md.

Run:  python scripts/ablation_drive.py   (on the TPU; ~25-40 min cold)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import json
import time

import jax

from axcnn.utils.cache import cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from axcnn.core.dtypes import BF16_POLICY
from axcnn.ckpt.checkpoint import CheckpointManager
from axcnn.data.build_imagenet_c import build_corrupted_set
from axcnn.data.pipeline import TFRecordImageLoader, device_prefetch
from axcnn.eval.imagenet_c import CORRUPTIONS, compute_mce
from axcnn.models.resnet import ModelConfig
from axcnn.train.loop import evaluate
from axcnn.train.schedules import make_lr_schedule
from axcnn.train.train_step import (create_train_state, make_eval_step,
                                    make_train_step)
from convergence_drive_full import HUES, drive_model_config, make_set

BATCH = 64
IMAGE = 224
STEPS = 1500
SEVERITIES = (2, 4)


def train_leg(cfg, data_dir, info, *, assembled: bool, seed: int, label: str):
    loader = TFRecordImageLoader(
        data_dir, info, batch_size=BATCH, train=True, image_size=IMAGE,
        autoaugment_type="v0" if assembled else "none", seed=seed,
        num_workers=os.cpu_count() or 4, use_native=True)
    train_step = make_train_step(
        cfg,
        lr_schedule=make_lr_schedule(base_lr=0.05, total_steps=STEPS,
                                     warmup_steps=100),
        total_steps=STEPS, policy=BF16_POLICY,
        label_smoothing=0.1 if assembled else 0.0,
        mixup_alpha=0.2 if assembled else 0.0,
        weight_decay=1e-4, use_ema=assembled, ema_decay=0.9999,
        mean_rgb=info.mean_rgb, stddev_rgb=info.stddev_rgb)
    state = create_train_state(jax.random.key(seed), cfg, use_ema=assembled)
    key = jax.random.key(seed + 1)
    it = device_prefetch(iter(loader), size=2)
    t0 = time.time()
    step_fn = jax.jit(train_step, donate_argnums=(0,)).lower(
        state, next(it), key).compile()
    print(f"[{label}] compiled in {time.time() - t0:.0f}s", flush=True)
    t0 = time.time()
    for step in range(1, STEPS + 1):
        state, m = step_fn(state, next(it), key)
        if step % 300 == 0 or step == 1:
            mm = jax.device_get(m)
            print(f"[{label}] step {step:4d}: loss={float(mm['loss']):.4f} "
                  f"train_top1={float(mm['train_top1']):.3f}", flush=True)
    print(f"[{label}] {STEPS} steps in {time.time() - t0:.0f}s", flush=True)
    return state


def eval_dir(eval_fn, state, data_dir, info, *, stored_pixels=False):
    loader = TFRecordImageLoader(
        data_dir, info, batch_size=BATCH, train=False, image_size=IMAGE,
        resize_min=IMAGE if stored_pixels else 256,
        num_workers=os.cpu_count() or 4, use_native=True,
        drop_remainder=False)
    return evaluate(eval_fn, state, loader, batch_size=BATCH)


def corruption_errors(eval_fn, state, c_root, info, label):
    """{corruption: mean top-1 error over SEVERITIES} on stored pixels."""
    per = {}
    for name in CORRUPTIONS:
        errs = []
        for sev in SEVERITIES:
            m = eval_dir(eval_fn, state, os.path.join(c_root, name, str(sev)),
                         info, stored_pixels=True)
            errs.append(1.0 - m["top1"] / 100.0)
        per[name] = sum(errs) / len(errs)
        print(f"[{label}] {name}: err@{SEVERITIES}="
              f"{[round(e, 3) for e in errs]}", flush=True)
    return per


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/axcnn_convergence_full"
    os.makedirs(root, exist_ok=True)
    print(f"devices: {jax.devices()}", flush=True)

    classes = [(f"{h}_{o}", HUES[h], o) for h in HUES for o in ("h", "v")]
    data_dir, info = make_set(os.path.join(root, "pre"), classes,
                              n_train=240, n_eval=60, seed=0)

    # ---- corrupted copy of the held-out split (one-time, cached) ----------
    c_root = os.path.join(root, "imagenet_c")
    marker = os.path.join(c_root, f"ok-{'-'.join(map(str, SEVERITIES))}")
    if not os.path.exists(marker):
        t0 = time.time()
        n = build_corrupted_set(data_dir, c_root, prefix="validation",
                                image_size=IMAGE, resize_min=256,
                                severities=SEVERITIES)
        print(f"generated {n} corrupted examples in {time.time()-t0:.0f}s",
              flush=True)
        open(marker, "w").close()

    # ---- assembled leg (reuses convergence_drive_full's checkpoint) -------
    asm_cfg = drive_model_config()
    mgr = CheckpointManager(os.path.join(root, "pre_ckpt"), max_to_keep=1)
    template = create_train_state(jax.random.key(0), asm_cfg, use_ema=True)
    restored = mgr.restore(template)
    if restored is not None:
        asm_state = restored[0]
        print(f"[assembled] restored cached state at step "
              f"{int(asm_state.step)}", flush=True)
    else:
        asm_state = train_leg(asm_cfg, data_dir, info, assembled=True,
                              seed=0, label="assembled")
        mgr.save(asm_state, force=True)
        mgr.wait()

    # ---- vanilla leg (cached separately) -----------------------------------
    van_cfg = ModelConfig(resnet_size=50, num_classes=10,
                          bn_momentum=0.997)  # everything else default-off
    assert not (van_cfg.use_resnet_d or van_cfg.use_se_block
                or van_cfg.use_sk_block or van_cfg.use_dropblock
                or van_cfg.zero_gamma)
    assert van_cfg.anti_alias_type in (None, "none")
    vmgr = CheckpointManager(os.path.join(root, "vanilla_ckpt"), max_to_keep=1)
    vtemplate = create_train_state(jax.random.key(0), van_cfg, use_ema=False)
    vrestored = vmgr.restore(vtemplate)
    if vrestored is not None:
        van_state = vrestored[0]
        print(f"[vanilla] restored cached state at step "
              f"{int(van_state.step)}", flush=True)
    else:
        van_state = train_leg(van_cfg, data_dir, info, assembled=False,
                              seed=0, label="vanilla")
        vmgr.save(van_state, force=True)
        vmgr.wait()

    # ---- evaluation ---------------------------------------------------------
    asm_eval = jax.jit(make_eval_step(asm_cfg, policy=BF16_POLICY,
                                      use_ema=True, mean_rgb=info.mean_rgb,
                                      stddev_rgb=info.stddev_rgb))
    van_eval = jax.jit(make_eval_step(van_cfg, policy=BF16_POLICY,
                                      use_ema=False, mean_rgb=info.mean_rgb,
                                      stddev_rgb=info.stddev_rgb))
    clean_asm = eval_dir(asm_eval, asm_state, data_dir, info)
    clean_van = eval_dir(van_eval, van_state, data_dir, info)
    print(f"clean top-1: assembled(EMA)={clean_asm['top1']:.2f}% "
          f"vanilla={clean_van['top1']:.2f}%", flush=True)

    van_err = corruption_errors(van_eval, van_state, c_root, info, "vanilla")
    asm_err = corruption_errors(asm_eval, asm_state, c_root, info, "assembled")

    # relative mCE: vanilla plays AlexNet's normalizer role; clamp the
    # normalizer at one wrong answer so a perfect vanilla row cannot blow up
    n_eval = info.num_eval
    norm = {c: max(e, 1.0 / n_eval) for c, e in van_err.items()}
    rel = compute_mce(asm_err, alexnet_err=norm)
    mean_asm = sum(asm_err.values()) / len(asm_err)
    mean_van = sum(van_err.values()) / len(van_err)

    out = {
        "clean_top1_assembled_ema": round(clean_asm["top1"], 2),
        "clean_top1_vanilla": round(clean_van["top1"], 2),
        "mean_corruption_err_assembled": round(mean_asm, 4),
        "mean_corruption_err_vanilla": round(mean_van, 4),
        "relative_mce_assembled_vs_vanilla": round(rel["mce"], 1),
        "per_corruption_ce": {c: round(rel[f"ce/{c}"], 1)
                              for c in CORRUPTIONS},
    }
    print(json.dumps(out, indent=2), flush=True)

    assert clean_asm["top1"] >= clean_van["top1"] - 1.0, (
        f"assembled clean top-1 {clean_asm['top1']} materially below "
        f"vanilla {clean_van['top1']}")
    assert mean_asm < mean_van, (
        f"assembled NOT more robust: mean err {mean_asm:.4f} vs "
        f"vanilla {mean_van:.4f}")
    assert rel["mce"] < 100.0, f"relative mCE {rel['mce']:.1f} >= 100"
    print("ABLATION DRIVE OK: assembled beats vanilla on robustness "
          f"(relative mCE {rel['mce']:.1f} < 100)", flush=True)


if __name__ == "__main__":
    main()
