"""ImageNet-C robustness evaluation (mCE) — SURVEY.md §3.4.

Protocol (Hendrycks & Dietterich 2019, as used by the reference):
for each of 15 corruptions × severities 1..5, compute top-1 error on the
corrupted validation set; per-corruption CE = mean error over severities
normalized by AlexNet's published error; mCE = mean CE over corruptions.

Expected layout: ``<data_dir>/<corruption>/<severity>/validation-*`` TFRecord
shards (same Example schema as ImageNet val). Images are already corrupted at
224x224 in the standard distribution, and the protocol evaluates those STORED
pixels — so the loaders here run with ``resize_min == image_size``, which
short-circuits resize/crop entirely for images already at the target size
(see preprocess_eval). Clean-eval preprocessing (resize-256 → crop-224) would
resample the corrupted pixels and shift mCE.
"""

from __future__ import annotations

import os

import jax

CORRUPTIONS = (
    "gaussian_noise", "shot_noise", "impulse_noise",
    "defocus_blur", "glass_blur", "motion_blur", "zoom_blur",
    "snow", "frost", "fog", "brightness",
    "contrast", "elastic_transform", "pixelate", "jpeg_compression",
)

# AlexNet top-1 error rates used as mCE normalizers (published constants).
ALEXNET_ERR = {
    "gaussian_noise": 0.886428, "shot_noise": 0.894468,
    "impulse_noise": 0.922640, "defocus_blur": 0.819880,
    "glass_blur": 0.826268, "motion_blur": 0.785948, "zoom_blur": 0.798360,
    "snow": 0.866816, "frost": 0.826572, "fog": 0.819324,
    "brightness": 0.564592, "contrast": 0.853204,
    "elastic_transform": 0.646056, "pixelate": 0.717840,
    "jpeg_compression": 0.606500,
}


def compute_mce(per_corruption_err: dict, *, alexnet_err=None) -> dict:
    """per_corruption_err: {corruption: mean top-1 error in [0,1] over
    severities}. Returns {'mce': %, 'ce/<corruption>': %}."""
    alexnet_err = alexnet_err or ALEXNET_ERR
    ces = {}
    for c, err in per_corruption_err.items():
        ces[f"ce/{c}"] = err / alexnet_err[c] * 100.0
    mce = sum(ces.values()) / len(ces) if ces else 0.0
    return {"mce": mce, **ces}


def run_imagenet_c(cfg):
    """Full mCE evaluation driven by a Config (runtime.eval_imagenet_c)."""
    from axcnn.core.dtypes import policy_from_name
    from axcnn.data.datasets import get_dataset
    from axcnn.data.pipeline import TFRecordImageLoader
    from axcnn.models.resnet import ModelConfig
    from axcnn.parallel.mesh import (
        detect_num_slices, make_hierarchical_mesh, make_mesh,
        replicate_to_mesh, shard_eval_step)
    from axcnn.train.train_step import create_train_state, make_eval_step
    from axcnn.train.loop import evaluate, _warm_start
    from axcnn.ckpt.checkpoint import CheckpointManager
    from axcnn.utils.logging import MetricLogger

    info = get_dataset("imagenet_c")
    policy = policy_from_name(cfg.train.dtype)
    logger = MetricLogger(cfg.runtime.model_dir)

    if cfg.runtime.spatial_partitions > 1:
        raise ValueError(
            "mCE evaluation does not support spatial partitioning (224^2 "
            "stored pixels never motivate it); run with "
            "--runtime.spatial_partitions=1")

    state = create_train_state(jax.random.key(cfg.train.seed), cfg.model,
                               use_ema=cfg.train.use_ema)
    ckpt_dir = os.path.join(cfg.runtime.model_dir, "checkpoints")
    if os.path.isdir(ckpt_dir):
        mgr = CheckpointManager(ckpt_dir)
        restored = mgr.restore(state)
        if restored is not None:
            state = restored[0]
        mgr.close()
    elif cfg.train.pretrained_checkpoint:
        state = _warm_start(state, cfg)

    # mesh construction mirrors train.loop.run(): hierarchical (dcn, data)
    # on multi-slice so the eval psum rides ICI, flat 'data' otherwise
    devices = jax.devices()
    n_dev = cfg.runtime.num_devices or len(devices)
    mesh = None
    if n_dev > 1:
        sel = devices[:n_dev]
        dcn = cfg.runtime.dcn_slices or detect_num_slices(sel)
        mesh = (make_hierarchical_mesh(dcn, devices=sel) if dcn > 1
                else make_mesh(n_dev))
    # loaders and evaluate() take the PER-HOST batch (each host feeds only
    # its addressable shards); cfg.train.batch_size is global, same
    # convention as loop.run()
    if cfg.train.batch_size % jax.process_count():
        raise ValueError(
            f"global batch {cfg.train.batch_size} not divisible by "
            f"{jax.process_count()} hosts")
    host_batch = cfg.train.batch_size // jax.process_count()
    eval_step = make_eval_step(cfg.model, policy=policy, use_ema=cfg.train.use_ema,
                               mean_rgb=info.mean_rgb, stddev_rgb=info.stddev_rgb)
    eval_step_fn = shard_eval_step(eval_step, mesh) if mesh else jax.jit(eval_step)
    if jax.process_count() > 1 and mesh is not None:
        state = replicate_to_mesh(state, mesh)

    per_corruption = {}
    for corruption in CORRUPTIONS:
        errs = []
        for severity in range(1, 6):
            d = os.path.join(cfg.data.data_dir, corruption, str(severity))
            if not os.path.isdir(d):
                continue
            loader = TFRecordImageLoader(
                d, info, batch_size=host_batch, train=False,
                image_size=cfg.data.image_size,
                resize_min=cfg.data.image_size,  # evaluate stored pixels
                drop_remainder=False,
                num_workers=cfg.data.num_workers,
                host_id=jax.process_index(), num_hosts=jax.process_count())
            m = evaluate(eval_step_fn, state, loader,
                         batch_size=host_batch, mesh=mesh)
            errs.append(1.0 - m["top1"] / 100.0)
            logger.log("imagenet_c", int(jax.device_get(state.step)),
                       corruption=corruption, severity=severity,
                       top1=m["top1"], count=m["count"])
        if errs:
            per_corruption[corruption] = sum(errs) / len(errs)

    result = compute_mce(per_corruption)
    logger.log("mce", int(jax.device_get(state.step)),
               **{k: v for k, v in result.items()})
    logger.close()
    return result
