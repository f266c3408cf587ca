"""Single-image / batch inference CLI — BASELINE config 1
("vanilla ResNet-50 inference, single 224x224 image, fp32, CPU") and the
reference README's inference instructions.

Usage:
    python -m axcnn.cli.predict --image=cat.jpg \
        --config=assemble_resnet50 --runtime.model_dir=/tmp/run1

    # from a serving export (no checkpoint needed):
    python -m axcnn.cli.predict --image=cat.jpg --export=/tmp/run1/export

    # force fp32 CPU (config-1 parity):
    ... --train.dtype=fp32 --cpu

Prints one JSON line per image: {"image": ..., "top5": [[class, prob], ...]}.
"""

from __future__ import annotations

import json
import os
import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    images, export_dir, labels_file, use_cpu, rest = [], None, None, False, []
    for a in argv:
        if a.startswith("--image="):
            images.append(a.split("=", 1)[1])
        elif a.startswith("--export="):
            export_dir = a.split("=", 1)[1]
        elif a.startswith("--labels="):
            labels_file = a.split("=", 1)[1]
        elif a == "--cpu":
            use_cpu = True
        else:
            rest.append(a)
    if not images:
        print("usage: predict --image=FILE [--image=FILE ...] "
              "[--export=DIR | --config=... --runtime.model_dir=DIR] "
              "[--labels=FILE] [--cpu]", file=sys.stderr)
        return 2

    import jax

    if use_cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from axcnn.data.preprocessing import preprocess_eval

    def _load_batch(image_size=224):
        return np.stack([
            preprocess_eval(open(p, "rb").read(), image_size=image_size,
                            resize_min=max(image_size * 256 // 224, image_size))
            for p in images
        ])

    if export_dir:
        from axcnn.ckpt.export import load_serving

        fn, meta = load_serving(export_dir)
        batch = _load_batch(meta.get("image_size", 224))
        bs = meta["batch_size"]
        pad = (-len(batch)) % bs
        if pad:
            batch = np.concatenate([batch, np.zeros((pad,) + batch.shape[1:],
                                                    np.uint8)])
        logits = np.concatenate([
            np.asarray(fn(batch[i:i + bs])) for i in range(0, len(batch), bs)
        ])[: len(images)]
    else:
        from axcnn.utils.config import parse_cli
        from axcnn.core.dtypes import policy_from_name
        from axcnn.data.datasets import get_dataset
        from axcnn.data.preprocessing import normalize_device
        from axcnn.models.resnet import resnet_apply
        from axcnn.train.train_step import create_train_state
        from axcnn.ckpt.checkpoint import CheckpointManager

        cfg = parse_cli(rest)
        batch = _load_batch(cfg.data.image_size)
        if cfg.data.dataset_name == "custom":
            # user-built TFRecord sets predict the same way they train;
            # prediction only needs the head size (example counts are a
            # training concern — loop._dataset_info demands those too)
            from axcnn.data.datasets import DatasetInfo

            if cfg.data.num_classes <= 0:
                raise ValueError(
                    "dataset_name='custom' needs --data.num_classes")
            info = DatasetInfo("custom", cfg.data.num_classes,
                               max(cfg.data.num_train_examples, 0),
                               max(cfg.data.num_eval_examples, 0),
                               label_offset=cfg.data.label_offset)
        else:
            info = get_dataset(cfg.data.dataset_name)
        import dataclasses

        model_cfg = dataclasses.replace(cfg.model, num_classes=info.num_classes)
        policy = policy_from_name(cfg.train.dtype)
        state = create_train_state(jax.random.key(0), model_cfg,
                                   use_ema=cfg.train.use_ema)
        ckpt_dir = os.path.join(cfg.runtime.model_dir, "checkpoints")
        mgr = CheckpointManager(ckpt_dir)
        restored = mgr.restore(state)
        if restored is None:
            print(f"warning: no checkpoint in {ckpt_dir}; using random init",
                  file=sys.stderr)
        else:
            state = restored[0]
        mgr.close()
        params = state.ema if (cfg.train.use_ema and state.ema is not None) \
            else state.params

        @jax.jit
        def fwd(params, model_state, u8):
            x = normalize_device(u8, info.mean_rgb, info.stddev_rgb)
            return resnet_apply(params, model_state, x, cfg=model_cfg,
                                train=False, policy=policy)[0]

        logits = np.asarray(fwd(params, state.model_state, batch))

    class_names = None
    if labels_file:
        class_names = [l.strip() for l in open(labels_file)]

    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    probs = e / e.sum(axis=-1, keepdims=True)
    for path, p in zip(images, probs):
        top = np.argsort(p)[::-1][:5]
        entries = [
            [class_names[i] if class_names and i < len(class_names) else int(i),
             round(float(p[i]), 5)]
            for i in top
        ]
        print(json.dumps({"image": path, "top5": entries}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
