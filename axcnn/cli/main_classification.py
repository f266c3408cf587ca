"""Train/eval entrypoint — the reference's ``main_classification.py``.

Usage (mirrors the reference CLI; SURVEY.md §1 L4/L5):

    python -m axcnn.cli.main_classification --config=assemble_resnet50 \
        --data.data_dir=/data/imagenet --runtime.model_dir=/tmp/run1

    # quick synthetic smoke:
    python -m axcnn.cli.main_classification --data.use_synthetic_data \
        --train.train_steps=3 --train.batch_size=8 --data.image_size=64

    # eval only (EMA weights):
    ... --runtime.eval_only --train.use_ema

Presets in ``axcnn/configs`` replace the reference's ``scripts/*.sh``.
"""

from __future__ import annotations

import sys


def main(argv=None):
    from axcnn.utils.config import parse_cli

    cfg = parse_cli(sys.argv[1:] if argv is None else argv)
    print(cfg.to_json(), file=sys.stderr)

    if cfg.runtime.platform:
        # must land before the first device touch (see RuntimeConfig.platform:
        # the JAX_PLATFORMS env var loses to PJRT plugins, this doesn't)
        import jax

        jax.config.update("jax_platforms", cfg.runtime.platform)

    if cfg.runtime.eval_imagenet_c:
        from axcnn.eval.imagenet_c import run_imagenet_c

        metrics = run_imagenet_c(cfg)
    else:
        from axcnn.train.loop import run

        metrics = run(cfg)
    print({k: round(v, 4) if isinstance(v, float) else v
           for k, v in (metrics or {}).items()})
    return metrics


if __name__ == "__main__":
    main()
