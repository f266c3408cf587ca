"""The jitted training / evaluation steps.

Parity target: the reference ``model_fn`` TRAIN/EVAL paths (SURVEY.md §3.1,
§3.2): forward (mixup already applied), CE+LS (+KD), gradients, momentum SGD
with L2(no-BN), BN moving-stat update, EMA update, top-1/5 metrics, and
EMA-swapped evaluation.

TPU-first design:
- one pure function per step; everything (normalize, mixup, schedule, EMA)
  lives INSIDE the jit so XLA fuses the whole update into one program and
  the only host↔device traffic is the uint8 batch in and scalar metrics out;
- data parallelism is the same function with ``axis_name`` set, called under
  ``shard_map`` — gradients are ``lax.pmean``-ed over the mesh (the NCCL
  allreduce equivalent, SURVEY.md §5.8);
- ``donate_argnums`` on the state lets XLA update parameters in place
  (no 2x param memory).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from axcnn.core.dtypes import Policy, DEFAULT_POLICY
from axcnn.core.rng import RngStream
from axcnn.data.mixup import mixup_batch
from axcnn.data.preprocessing import normalize_device
from axcnn.models.resnet import ModelConfig, resnet_init, resnet_apply
from axcnn.train.losses import softmax_ce_loss, kd_loss
from axcnn.train.optimizer import momentum_init, momentum_update
from axcnn.train.ema import ema_init, ema_update


class TrainState(NamedTuple):
    step: Any
    params: Any
    model_state: Any  # BN moving stats (and SK-internal BN stats)
    velocity: Any
    ema: Any  # None when EMA disabled


def create_train_state(key, cfg: ModelConfig, *, use_ema: bool = True):
    # jit the whole init: eager init dispatches hundreds of tiny ops, which
    # costs ~50s through the tunneled TPU (one compile + one dispatch instead)
    @jax.jit
    def _init(key):
        params, model_state = resnet_init(key, cfg)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            model_state=model_state,
            velocity=momentum_init(params),
            ema=ema_init(params) if use_ema else None,
        )

    return _init(key)


def topk_correct(logits, labels, ks=(1, 5)):
    """Returns {f'top{k}': count of correct} (sums, not means — so shards /
    batches aggregate exactly)."""
    out = {}
    num_classes = logits.shape[-1]
    for k in ks:
        kk = min(k, num_classes)  # few-class datasets: top-5 of 3 classes
        if kk == 1:
            correct = jnp.argmax(logits, axis=-1) == labels
        else:
            _, topk = jax.lax.top_k(logits, kk)
            correct = jnp.any(topk == labels[:, None], axis=-1)
        out[f"top{k}"] = jnp.sum(correct.astype(jnp.float32))
    return out


def make_train_step(
    cfg: ModelConfig,
    *,
    lr_schedule,
    total_steps: int,
    policy: Policy = DEFAULT_POLICY,
    label_smoothing: float = 0.0,
    mixup_alpha: float = 0.0,
    mixup_per_shard: bool = False,
    mixup_symmetric: bool = False,
    weight_decay: float = 1e-4,
    momentum: float = 0.9,
    use_ema: bool = True,
    ema_decay: float = 0.9999,
    axis_name: str | None = None,
    sync_bn: bool = True,
    teacher: tuple | None = None,  # (teacher_cfg, teacher_params, teacher_state)
    kd_temp: float = 1.0,
    kd_alpha: float = 1.0,
    mean_rgb=None,
    stddev_rgb=None,
    autoaugment_fn=None,  # on-device AutoAugment (data.autoaugment_device)
    grad_accum_steps: int = 1,
):
    """Builds ``train_step(state, batch, root_key) -> (state, metrics)``.

    ``batch`` = {'images': uint8 NHWC, 'labels': int32 N}. ``root_key`` is a
    jax PRNG key; per-step streams are folded from it (deterministic resume:
    the key never advances, the step index does).

    ``grad_accum_steps`` > 1 splits the batch into that many micro-batches
    and runs them through a ``lax.scan`` — activation memory drops to one
    micro-batch (the capacity lever that composes with ``remat='blocks'``
    for batch sizes no single chip could hold), one optimizer/EMA update per
    step. Semantics under accumulation: gradients are the mean over
    micro-batches; BN batch statistics are per-micro-batch with moving stats
    updated sequentially (the same per-replica-BN semantic the reference's
    MirroredStrategy gives each GPU, here along the accumulation axis);
    mixup draws one lambda per micro-batch and mixes within it; DropBlock /
    device-AA randomness is folded per micro-batch. The default path
    (``grad_accum_steps == 1``) is unchanged.

    Keep the micro-batch large enough for BN: batch statistics are computed
    per micro-batch, and BN gradients scale as 1/sigma_micro — with few
    samples-per-channel (micro_batch x H x W at the deepest stage) the
    variance estimate collapses and gradients explode (measured: micro=2 at
    32x32 input, where stage 4 is 1x1 spatial, blows grads up 10^6x; at the
    production 224x224 geometry stage 4 contributes 7x7=49 samples per
    image and micro-batches >= 8 are well-conditioned).
    """
    if grad_accum_steps < 1:
        raise ValueError(f"grad_accum_steps must be >= 1, got {grad_accum_steps}")

    def train_step(state: TrainState, batch, root_key):
        step = state.step
        # rng_global is identical on every shard (root_key + step only);
        # rng is additionally folded by shard index so per-sample
        # stochasticity (DropBlock, augmentation) decorrelates across shards
        rng_global = RngStream(root_key).fold_step(step)
        rng = rng_global
        if axis_name is not None:
            rng = RngStream(jax.random.fold_in(
                rng_global("shard"), jax.lax.axis_index(axis_name)))

        raw = batch["images"]
        if autoaugment_fn is not None:
            # on-device AutoAugment: the whole augmentation policy runs as
            # part of this XLA program (BASELINE north star) — the host
            # loader only decodes/crops
            raw = autoaugment_fn(rng("autoaugment"), raw)
        images = normalize_device(raw, mean_rgb, stddev_rgb)
        labels = batch["labels"]
        if mixup_alpha > 0:
            # reference semantics: ONE lambda for the whole global batch, so
            # the key is drawn from the pre-fold stream (identical on every
            # shard); mixup_per_shard opts into independent per-shard lambdas
            mix_rng = rng if mixup_per_shard else rng_global
            images, labels_a, labels_b, lam = mixup_batch(
                mix_rng("mixup"), images, labels, alpha=mixup_alpha,
                symmetric=mixup_symmetric)
        else:
            labels_a, labels_b, lam = labels, None, 1.0

        progress = step.astype(jnp.float32) / max(total_steps, 1)

        # sync_bn=True: BN statistics are pmean-ed over the mesh inside the
        # forward (global-batch BN — better for small per-chip batches).
        # sync_bn=False reproduces the reference's per-replica BN
        # (MirroredStrategy semantics, SURVEY.md §7.3); moving stats are
        # averaged after the step either way so replicas stay consistent.
        bn_axis = axis_name if sync_bn else None

        def loss_fn(params):
            logits, new_mstate = resnet_apply(
                params, state.model_state, images, cfg=cfg, train=True,
                policy=policy, rng=rng, progress=progress, axis_name=bn_axis)
            loss = softmax_ce_loss(
                logits, labels_a, labels_b, lam, label_smoothing=label_smoothing)
            if teacher is not None:
                t_cfg, t_params, t_state = teacher
                t_logits, _ = resnet_apply(
                    t_params, t_state, images, cfg=t_cfg, train=False,
                    policy=policy)
                loss = loss + kd_alpha * kd_loss(
                    logits, jax.lax.stop_gradient(t_logits), temperature=kd_temp)
            return loss, (logits, new_mstate)

        (loss, (logits, new_mstate)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        top1 = jnp.mean(
            (jnp.argmax(logits, -1) == batch["labels"]).astype(jnp.float32))
        return _apply_update(state, grads, loss, new_mstate, top1,
                             jnp.asarray(lam, jnp.float32))

    def _apply_update(state, grads, loss, new_mstate, top1, lam_metric):
        step = state.step
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
            # BN moving stats: average the per-shard updates so every replica
            # carries identical state (reference keeps per-replica stats but
            # only checkpoints replica 0; averaging is strictly better and
            # keeps the state replicated-consistent for pjit)
            new_mstate = jax.lax.pmean(new_mstate, axis_name)

        lr = lr_schedule(step)
        new_params, new_velocity = momentum_update(
            state.params, grads, state.velocity,
            lr=lr, momentum=momentum, weight_decay=weight_decay)

        new_ema = state.ema
        if use_ema and state.ema is not None:
            new_ema = ema_update(state.ema, new_params, decay=ema_decay, step=step)

        metrics = {
            "loss": loss,
            "lr": lr,
            "train_top1": top1,
        }
        if mixup_alpha > 0:
            # observability + semantics pin: with the default (reference)
            # global-lambda mixup this equals the single shared draw on every
            # shard; with mixup_per_shard it is the shard mean (and under
            # grad accumulation, the micro-batch mean)
            metrics["mixup_lam"] = lam_metric
        if axis_name is not None:
            metrics["train_top1"] = jax.lax.pmean(metrics["train_top1"], axis_name)
            if "mixup_lam" in metrics:
                metrics["mixup_lam"] = jax.lax.pmean(metrics["mixup_lam"], axis_name)

        new_state = TrainState(
            step=step + 1,
            params=new_params,
            model_state=new_mstate,
            velocity=new_velocity,
            ema=new_ema,
        )
        return new_state, metrics

    def accum_train_step(state: TrainState, batch, root_key):
        A = grad_accum_steps
        step = state.step
        rng_global = RngStream(root_key).fold_step(step)
        rng = rng_global
        if axis_name is not None:
            rng = RngStream(jax.random.fold_in(
                rng_global("shard"), jax.lax.axis_index(axis_name)))
        n = batch["images"].shape[0]
        if n % A:
            raise ValueError(
                f"per-shard batch {n} not divisible by grad_accum_steps {A}")
        images_u8 = batch["images"].reshape(
            (A, n // A) + batch["images"].shape[1:])
        labels_all = batch["labels"].reshape((A, n // A))
        progress = step.astype(jnp.float32) / max(total_steps, 1)
        bn_axis = axis_name if sync_bn else None
        # two per-micro bases: shard-folded for per-sample stochasticity,
        # pre-fold for the (reference-global) mixup lambda stream
        accum_base = rng("accum")
        accum_base_global = rng_global("accum")

        def micro(carry, xs):
            mstate, gsum, loss_sum, top1_sum, lam_sum = carry
            i, raw, labels = xs
            rng_i = RngStream(jax.random.fold_in(accum_base, i))
            if autoaugment_fn is not None:
                raw = autoaugment_fn(rng_i("autoaugment"), raw)
            images = normalize_device(raw, mean_rgb, stddev_rgb)
            if mixup_alpha > 0:
                mix_rng = rng_i if mixup_per_shard else RngStream(
                    jax.random.fold_in(accum_base_global, i))
                images, labels_a, labels_b, lam = mixup_batch(
                    mix_rng("mixup"), images, labels, alpha=mixup_alpha,
                    symmetric=mixup_symmetric)
            else:
                labels_a, labels_b, lam = labels, None, 1.0

            def loss_fn(params):
                logits, new_mstate = resnet_apply(
                    params, mstate, images, cfg=cfg, train=True,
                    policy=policy, rng=rng_i, progress=progress,
                    axis_name=bn_axis)
                loss = softmax_ce_loss(
                    logits, labels_a, labels_b, lam,
                    label_smoothing=label_smoothing)
                if teacher is not None:
                    t_cfg, t_params, t_state = teacher
                    t_logits, _ = resnet_apply(
                        t_params, t_state, images, cfg=t_cfg, train=False,
                        policy=policy)
                    loss = loss + kd_alpha * kd_loss(
                        logits, jax.lax.stop_gradient(t_logits),
                        temperature=kd_temp)
                return loss, (logits, new_mstate)

            (loss, (logits, new_mstate)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            top1 = jnp.mean(
                (jnp.argmax(logits, -1) == labels).astype(jnp.float32))
            gsum = jax.tree.map(jnp.add, gsum, grads)
            return (new_mstate, gsum, loss_sum + loss, top1_sum + top1,
                    lam_sum + jnp.asarray(lam, jnp.float32)), None

        zero = jnp.zeros((), jnp.float32)
        carry0 = (state.model_state,
                  jax.tree.map(jnp.zeros_like, state.params),
                  zero, zero, zero)
        (new_mstate, gsum, loss_sum, top1_sum, lam_sum), _ = jax.lax.scan(
            micro, carry0, (jnp.arange(A), images_u8, labels_all))
        grads = jax.tree.map(lambda g: g / A, gsum)
        return _apply_update(state, grads, loss_sum / A, new_mstate,
                             top1_sum / A, lam_sum / A)

    return train_step if grad_accum_steps == 1 else accum_train_step


def make_eval_step(
    cfg: ModelConfig,
    *,
    policy: Policy = DEFAULT_POLICY,
    use_ema: bool = False,
    mean_rgb=None,
    stddev_rgb=None,
):
    """Builds ``eval_step(state, batch) -> metrics`` (sums + count, so the
    caller aggregates exactly over uneven final batches).

    ``use_ema=True`` evaluates the EMA shadow weights — the reference's
    EMA-swap Scaffold (SURVEY.md §3.2).
    """

    def eval_step(state: TrainState, batch):
        params = state.ema if (use_ema and state.ema is not None) else state.params
        images = normalize_device(batch["images"], mean_rgb, stddev_rgb)
        logits, _ = resnet_apply(
            params, state.model_state, images, cfg=cfg, train=False, policy=policy)
        labels = batch["labels"]
        # final batches are padded with label=-1: never matches argmax/top-k,
        # and the valid mask keeps loss/count exact
        valid = (labels >= 0).astype(jnp.float32)
        metrics = topk_correct(logits, labels)
        metrics["count"] = jnp.sum(valid)
        safe_labels = jnp.maximum(labels, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=1)[:, 0]
        metrics["loss_sum"] = jnp.sum(nll * valid)
        return metrics

    return eval_step


def pad_batch(batch, batch_size: int):
    """Pad a short final eval batch to ``batch_size`` (labels -> -1) so the
    jitted step sees one static shape."""
    import numpy as np

    n = batch["labels"].shape[0]
    if n == batch_size:
        return batch
    pad = batch_size - n
    return {
        "images": np.concatenate(
            [batch["images"],
             np.zeros((pad,) + batch["images"].shape[1:], batch["images"].dtype)]),
        "labels": np.concatenate(
            [batch["labels"], -np.ones((pad,), batch["labels"].dtype)]),
    }
