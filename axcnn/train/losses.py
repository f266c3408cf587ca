"""Loss assembly: CE + label smoothing + mixup + L2(no-BN) + KD.

Parity target: the reference ``model_fn`` loss (SURVEY.md §3.1):
    loss = CE(mixed labels, label_smoothing)
         + weight_decay * sum ||W||^2 over non-BN variables
         + KD: kd_temp^2 * KL(teacher || student)   (when distilling)

All losses are computed in fp32 from fp32 logits (the model returns fp32
logits regardless of compute dtype).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from axcnn.core.tree import tree_map_with_path


def _smoothed_ce(log_probs, labels, num_classes: int, label_smoothing: float):
    """CE against smoothed one-hot labels, from precomputed log-probs."""
    # q_c = ls/C + (1-ls)*onehot  →  CE = (1-ls)*nll + ls*mean_c(-log p_c)
    del num_classes
    on = 1.0 - label_smoothing
    nll = -jnp.take_along_axis(log_probs, labels[:, None], axis=1)[:, 0]
    uniform_term = -jnp.mean(log_probs, axis=1)
    return on * nll + label_smoothing * uniform_term


def softmax_ce_loss(
    logits,
    labels_a,
    labels_b=None,
    lam=1.0,
    *,
    label_smoothing: float = 0.0,
):
    """Mean mixup-weighted smoothed cross-entropy.

    CE(lam*ya + (1-lam)*yb) == lam*CE(ya) + (1-lam)*CE(yb) for soft targets,
    so mixup composes exactly with label smoothing.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    loss = _smoothed_ce(log_probs, labels_a, num_classes, label_smoothing)
    if labels_b is not None:
        loss_b = _smoothed_ce(log_probs, labels_b, num_classes, label_smoothing)
        loss = lam * loss + (1.0 - lam) * loss_b
    return jnp.mean(loss)


def _is_decayed(path: str) -> bool:
    """Weight decay applies to conv/dense kernels only — not BN gamma/beta,
    not biases (the reference's 'L2 on non-BN variables' rule; biases in this
    model exist only in SE/SK/head and the reference excludes them too via
    its 'weights only' filter [K-med])."""
    leaf = path.rsplit("/", 1)[-1]
    return leaf == "w" or leaf.startswith("w")


def l2_regularization(params, weight_decay: float):
    """0.5-less TF convention: wd * sum ||W||^2 (reference uses tf.nn.l2_loss
    which is sum(w^2)/2 — we fold the 1/2 into the flag the same way the
    published recipes do; see ``decay_mask`` for the variable filter)."""
    total = 0.0
    leaves = []

    def collect(path, leaf):
        if _is_decayed(path):
            leaves.append(leaf)
        return leaf

    tree_map_with_path(collect, params)
    for w in leaves:
        total = total + jnp.sum(jnp.square(w.astype(jnp.float32)))
    return weight_decay * 0.5 * total


def decay_mask(params):
    """Pytree of bools: True where weight decay applies."""
    return tree_map_with_path(lambda path, leaf: _is_decayed(path), params)


def kd_loss(student_logits, teacher_logits, *, temperature: float = 1.0):
    """Knowledge distillation: T^2 * KL(teacher_T || student_T).

    The T^2 factor keeps gradient magnitude independent of temperature
    (Hinton et al. 2015), matching the reference's ``kd_temp`` wiring
    (SURVEY.md §2 item 14).
    """
    t = temperature
    s = jax.nn.log_softmax(student_logits.astype(jnp.float32) / t, axis=-1)
    p = jax.nn.softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    logp = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    kl = jnp.sum(p * (logp - s), axis=-1)
    return (t * t) * jnp.mean(kl)
