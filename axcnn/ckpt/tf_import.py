"""TF1-checkpoint importer: reference ``Saver`` checkpoints → axcnn pytrees.

Purpose (SURVEY.md §5.4, §7.3): load the reference's published pretrained
checkpoints for numerics-parity testing and fine-tune warm starts, including
the EMA shadow variables (``<var>/ExponentialMovingAverage``).

Name scheme: the reference builds its model with the TF-official builder
(SURVEY.md §2 item 2), whose variables are auto-numbered in graph-creation
order under one scope:

    resnet_model/conv2d[_N]/kernel
    resnet_model/batch_normalization[_N]/{gamma,beta,moving_mean,moving_variance}
    resnet_model/dense/{kernel,bias}

Creation order per v1 bottleneck block: [projection conv + BN,] conv1+BN,
conv2+BN, conv3+BN — which is exactly our block-dict order. We therefore
*generate* the expected TF names by walking our own pytree in creation order
and join on names, verifying shapes. SE/SK/extra-FC variables (upstream names
[K-med], SURVEY.md §0) fall back to shape-and-order matching within a block.

Requires tensorflow (CPU build, present in the image) only at call time.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from axcnn.models.resnet import ModelConfig

SCOPE = "resnet_model"
EMA_SUFFIX = "/ExponentialMovingAverage"


class _Namer:
    """Reproduces TF's auto-numbering: first use bare, then _1, _2, ..."""

    def __init__(self):
        self._counts = {}

    def next(self, base: str) -> str:
        n = self._counts.get(base, 0)
        self._counts[base] = n + 1
        return f"{SCOPE}/{base}" if n == 0 else f"{SCOPE}/{base}_{n}"


def _iter_block_entries(block_params, block_state):
    """Yield (kind, param_subtree, state_subtree) in TF creation order."""
    order = ["proj_conv", "proj_bn", "conv1", "bn1", "conv2", "bn2",
             "sk", "conv3", "bn3", "se"]
    for name in order:
        if name in block_params:
            yield name, block_params[name], (block_state or {}).get(name)


def expected_tf_names(cfg: ModelConfig, params, state):
    """Walk (params, state) in creation order; returns
    [(tf_name, our_path, shape)] for conv/BN/dense variables.

    Big-Little stages follow OUR creation order (entry block, big blocks,
    little blocks, little-projection conv+BN — models/resnet.py
    ``_bl_stage_init``); the upstream BL variable layout is [K-med]
    (SURVEY.md §0), so as with the rest of the scheme the contract is
    "TF-official auto-numbering over this creation order", validated
    end-to-end in tests/test_tf_import_e2e.py against TF's own uniquing.
    """
    namer = _Namer()
    out = []

    def conv(path, p):
        name = namer.next("conv2d")
        out.append((f"{name}/kernel", f"{path}/w", tuple(p["w"].shape)))

    def bn(path, p, s):
        name = namer.next("batch_normalization")
        out.append((f"{name}/gamma", f"{path}/gamma", tuple(p["gamma"].shape)))
        out.append((f"{name}/beta", f"{path}/beta", tuple(p["beta"].shape)))
        out.append((f"{name}/moving_mean", f"{path}/mean@state",
                    tuple(s["mean"].shape)))
        out.append((f"{name}/moving_variance", f"{path}/var@state",
                    tuple(s["var"].shape)))

    # stem
    stem_p, stem_s = params["stem"], state["stem"]
    n_stem = 3 if cfg.use_resnet_d else 1
    for i in range(n_stem):
        conv(f"stem/conv{i}", stem_p[f"conv{i}"])
        bn(f"stem/bn{i}", stem_p[f"bn{i}"], stem_s[f"bn{i}"])

    def emit_block(base, bp, bs):
        for kind, p, st in _iter_block_entries(bp, bs):
            if kind.endswith("conv") or kind.startswith("conv"):
                conv(f"{base}/{kind}", p)
            elif kind.startswith("bn") or kind == "proj_bn":
                bn(f"{base}/{kind}", p, st)
            elif kind == "sk":
                # SK internals: branch convs+BNs in order, then FCs
                for b in range(2):
                    conv(f"{base}/sk/conv{b}", p[f"conv{b}"])
                    bn(f"{base}/sk/bn{b}", p[f"bn{b}"], st[f"bn{b}"])
                n = namer.next("dense")
                out.append((f"{n}/kernel", f"{base}/sk/fc_z/w",
                            tuple(p["fc_z"]["w"].shape)))
                bn(f"{base}/sk/bn_z", p["bn_z"], st["bn_z"])
                n = namer.next("dense")
                out.append((f"{n}/kernel", f"{base}/sk/fc_select/w",
                            tuple(p["fc_select"]["w"].shape)))
                out.append((f"{n}/bias", f"{base}/sk/fc_select/b",
                            tuple(p["fc_select"]["b"].shape)))
            elif kind == "se":
                for w, b in (("w1", "b1"), ("w2", "b2")):
                    n = namer.next("dense")
                    out.append((f"{n}/kernel", f"{base}/se/{w}",
                                tuple(p[w].shape)))
                    out.append((f"{n}/bias", f"{base}/se/{b}",
                                tuple(p[b].shape)))

    from axcnn.models.resnet import _BL_STAGES

    for s_idx in range(4):
        sname = f"stage{s_idx + 1}"
        sp, ss = params[sname], state[sname]
        if cfg.use_bl and s_idx in _BL_STAGES:
            emit_block(f"{sname}/entry", sp["entry"], ss["entry"])
            for branch in ("big", "little"):
                for b_idx in range(len(sp[branch])):
                    emit_block(f"{sname}/{branch}/block{b_idx}",
                               sp[branch][f"block{b_idx}"],
                               ss[branch][f"block{b_idx}"])
            conv(f"{sname}/little_proj", sp["little_proj"])
            bn(f"{sname}/little_proj_bn", sp["little_proj_bn"],
               ss["little_proj_bn"])
            continue
        for b_idx in range(cfg.blocks[s_idx]):
            bname = f"block{b_idx}"
            emit_block(f"{sname}/{bname}", sp[bname], ss[bname])

    n = namer.next("dense")
    out.append((f"{n}/kernel", "head/w", tuple(params["head"]["w"].shape)))
    out.append((f"{n}/bias", "head/b", tuple(params["head"]["b"].shape)))
    return out


def _set_path(tree, path, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node[k]
    node[keys[-1]] = jnp.asarray(value)


def import_tf_checkpoint(ckpt_path: str, cfg: ModelConfig, params, state,
                         *, use_ema: bool = False, strict: bool = True):
    """Returns (params, state) with values from the TF checkpoint.

    ``use_ema=True`` reads ``<var>/ExponentialMovingAverage`` shadows for
    trainable variables (BN moving stats have no shadows).
    """
    import tensorflow as tf

    reader = tf.train.load_checkpoint(ckpt_path)
    shape_map = reader.get_variable_to_shape_map()

    new_params = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    new_state = jax.tree.map(lambda x: np.asarray(x).copy(), state)

    missing = []
    for tf_name, our_path, shape in expected_tf_names(cfg, params, state):
        is_state = our_path.endswith("@state")
        lookup = tf_name
        if use_ema and not is_state:
            ema_name = tf_name + EMA_SUFFIX
            if ema_name in shape_map:
                lookup = ema_name
        if lookup not in shape_map:
            missing.append(tf_name)
            continue
        value = reader.get_tensor(lookup)
        if tuple(value.shape) != shape:
            raise ValueError(
                f"shape mismatch for {tf_name}: ckpt {value.shape} vs ours {shape}")
        if is_state:
            _set_path(new_state, our_path[: -len("@state")], value)
        else:
            _set_path(new_params, our_path, value)

    if missing and strict:
        raise KeyError(
            f"{len(missing)} variables not found in {ckpt_path}, e.g. {missing[:5]}")
    to_jnp = lambda t: jax.tree.map(jnp.asarray, t)
    return to_jnp(new_params), to_jnp(new_state), missing
