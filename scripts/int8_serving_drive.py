"""On-chip validation of the int8 PTQ serving path (core/dtypes.py
INT8_SERVING_POLICY) against the trained convergence-drive model.

Three measurements on the real device:
1. Held-out accuracy of the trained 10-class assembled R50 under bf16 vs
   int8 (raw and EMA weights) — the PTQ accuracy contract.
2. Prediction agreement: top-1 match rate between the bf16 and int8 logits
   over the eval set (stronger than accuracy on a saturated task).
3. Serving throughput, assembled R50 @ 224 (1000-class), bf16 vs int8 —
   the MXU int8-path speedup.

Requires the cached drive state (scripts/convergence_drive_full.py writes
/tmp/axcnn_convergence_full). Run with the TPU free (single-client tunnel).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import json
import time

import numpy as np


def main():
    import jax

    from axcnn.core.dtypes import BF16_POLICY, INT8_SERVING_POLICY
    from axcnn.ckpt.checkpoint import CheckpointManager
    from axcnn.data.datasets import DatasetInfo
    from axcnn.data.pipeline import TFRecordImageLoader
    from axcnn.models.resnet import ModelConfig, resnet_init, resnet_apply
    from axcnn.train.loop import evaluate
    from axcnn.train.train_step import create_train_state, make_eval_step
    from convergence_drive_full import drive_model_config

    print(f"devices: {jax.devices()}", flush=True)
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/axcnn_convergence_full"
    pre_dir = os.path.join(root, "pre", "rec")
    cfg = drive_model_config()
    info = DatasetInfo("drive", num_classes=10, num_train=2400, num_eval=600,
                       train_prefix="train", eval_prefix="validation")
    state = CheckpointManager(os.path.join(root, "pre_ckpt"),
                              max_to_keep=1).restore(
        create_train_state(jax.random.key(0), cfg, use_ema=True))
    if state is None:
        raise SystemExit(f"no cached drive state under {root} — run "
                         "scripts/convergence_drive_full.py first")
    state = state[0]
    print(f"restored drive state at step {int(state.step)}", flush=True)

    results = {}
    # 1. accuracy under each policy ----------------------------------------
    for pname, policy in (("bf16", BF16_POLICY), ("int8", INT8_SERVING_POLICY)):
        for ename, use_ema in (("raw", False), ("ema", True)):
            fn = jax.jit(make_eval_step(cfg, policy=policy, use_ema=use_ema,
                                        mean_rgb=info.mean_rgb,
                                        stddev_rgb=info.stddev_rgb))
            loader = TFRecordImageLoader(pre_dir, info, batch_size=64,
                                         train=False, image_size=224,
                                         num_workers=os.cpu_count() or 4,
                                         use_native=True,
                                         drop_remainder=False)
            m = evaluate(fn, state, loader, batch_size=64)
            results[f"top1_{pname}_{ename}"] = m["top1"]
            print(f"eval[{pname}/{ename}]: top1={m['top1']:.2f}% "
                  f"loss={m['loss']:.4f} n={m['count']:.0f}", flush=True)

    # 2. top-1 agreement between the two policies (EMA weights) -------------
    from axcnn.data.preprocessing import normalize_device
    params = jax.tree.map(lambda e, p: e if e is not None else p,
                          state.ema, state.params,
                          is_leaf=lambda x: x is None) \
        if state.ema is not None else state.params

    def logits_fn(policy):
        @jax.jit
        def f(imgs):
            out, _ = resnet_apply(params, state.model_state, imgs, cfg=cfg,
                                  train=False, policy=policy)
            return out
        return f

    f_bf16, f_int8 = logits_fn(BF16_POLICY), logits_fn(INT8_SERVING_POLICY)
    loader = TFRecordImageLoader(pre_dir, info, batch_size=64, train=False,
                                 image_size=224,
                                 num_workers=os.cpu_count() or 4,
                                 use_native=True, drop_remainder=False)
    agree = total = 0
    max_dev = 0.0
    for batch in loader:
        imgs = normalize_device(batch["images"], mean=info.mean_rgb,
                                std=info.stddev_rgb)
        n = len(batch["labels"])
        a = np.asarray(f_bf16(imgs))[:n]
        b = np.asarray(f_int8(imgs))[:n]
        agree += int((a.argmax(-1) == b.argmax(-1)).sum())
        total += n
        max_dev = max(max_dev, float(np.abs(a - b).max()))
    results["top1_agreement_pct"] = 100.0 * agree / total
    results["max_logit_dev"] = max_dev
    print(f"top-1 agreement bf16 vs int8: {results['top1_agreement_pct']:.2f}% "
          f"({agree}/{total}); max |logit dev| {max_dev:.3f}", flush=True)

    # 3. serving throughput, 1000-class assembled R50 @ 224 ----------------
    serve_cfg = ModelConfig(resnet_size=50, num_classes=1000,
                            use_resnet_d=True, use_se_block=True,
                            use_sk_block=True, anti_alias_type="sconv")
    sp, ss = jax.jit(lambda k: resnet_init(k, serve_cfg))(jax.random.key(0))
    rng = np.random.default_rng(0)
    for pname, policy in (("bf16", BF16_POLICY), ("int8", INT8_SERVING_POLICY)):
        for batch in (32, 128, 256):
            @jax.jit
            def serve(p, s, u8):
                out, _ = resnet_apply(p, s, normalize_device(u8),
                                      cfg=serve_cfg, train=False,
                                      policy=policy)
                return out
            u8 = jax.device_put(rng.integers(
                0, 256, (batch, 224, 224, 3), dtype=np.uint8))
            for _ in range(5):
                out = serve(sp, ss, u8)
            float(out[0, 0])
            t0 = time.perf_counter()
            iters = 30
            for _ in range(iters):
                out = serve(sp, ss, u8)
            float(out[0, 0])
            dt = (time.perf_counter() - t0) / iters
            key = f"infer_{pname}_b{batch}"
            results[key] = round(batch / dt, 1)
            print(f"{key}: {results[key]} img/s ({dt * 1e3:.2f} ms)",
                  flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
