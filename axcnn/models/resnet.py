"""Assembled ResNet (v1 bottleneck family), TPU-first functional builder.

Capability parity with the reference model zoo (``nets/resnet_model.py``,
SURVEY.md §2 item 2 and §3.5): ResNet-50/101/152 v1 with the full assembly
knob surface —

- ``use_resnet_d``   : deep 3x(3x3) stem + avgpool-downsample projection
- ``use_se_block``   : Squeeze-Excite after the last conv of each bottleneck
- ``use_sk_block``   : Selective-Kernel unit replacing the 3x3 mid-conv
- ``anti_alias_type``: BlurPool before stride-2 reductions
                       ('sconv' = residual convs, 'proj' = +projection
                       shortcut, 'max' = +stem maxpool, 'none')
- ``use_dropblock``  : DropBlock(block_size=7) on stages 3-4 with scheduled
                       keep-prob
- ``zero_gamma``     : last-BN gamma zero-init per block
- ``bl_alpha/bl_beta``: Big-Little dual-resolution branches (wired per the
                       bLResNet paper — the upstream wiring is tagged K-med
                       in SURVEY.md §0, so details are paper-derived)

Design notes (TPU-first, not a TF translation):
- NHWC activations / HWIO weights end-to-end; bf16 compute via Policy with
  fp32 params and fp32 normalization statistics.
- Pure functions over nested-dict pytrees: ``resnet_init`` builds
  ``(params, state)``; ``resnet_apply`` returns ``(logits, new_state)``.
  No classes, no global state — the whole model jits and shards as data.
- Python loops over blocks unroll at trace time into a static XLA graph
  (shapes are static; XLA fuses BN+ReLU into conv epilogues on the MXU).
- ``scan_blocks``: ``lax.scan`` over each stage's shape-identical tail
  blocks (everything after the stage's projection block) with params
  STACKED along a leading block axis — the standard large-model JAX
  compile-time lever. XLA compiles ONE tail-block body per stage instead
  of one per block, shrinking an R152's HLO ~4x (50 block bodies → 8);
  numerics are identical (the scan replays the same ops in the same
  order; tests/test_resnet_scan.py asserts equivalence). Use for deep
  models where compile time matters (R152+KD first-compile, the
  multi-chip dryrun on a 1-core host). Checkpoint layouts differ;
  ``params_to_scan`` / ``params_from_scan`` convert both directions.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from axcnn.core.dtypes import Policy, DEFAULT_POLICY
from axcnn.ops.conv import conv_init, conv_apply, dense_init, dense_apply
from axcnn.ops.norm import bn_init, bn_apply
from axcnn.ops.pooling import max_pool_same, global_avg_pool, avg_pool
from axcnn.ops.blurpool import blur_pool
from axcnn.ops.se import se_init, se_apply
from axcnn.ops.sk import sk_init, sk_apply
from axcnn.ops.dropblock import dropblock, dropblock_keep_prob

RESNET_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}
_STAGE_FILTERS = (64, 128, 256, 512)
_EXPANSION = 4


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    resnet_size: int = 50
    num_classes: int = 1000
    use_resnet_d: bool = False
    use_se_block: bool = False
    use_sk_block: bool = False
    # Execution-path knob (weights/checkpoints unchanged): compute both SK
    # branches in ONE 5x5 conv with 2C outputs instead of two 3x3 convs —
    # reads the input activation once instead of twice at 25/18x the MXU
    # FLOPs (zero taps). Numerically identical (ops/sk.py); measured
    # head-to-head on the chip in scripts/opt_experiments.py.
    sk_merged_conv: bool = False
    se_ratio: int = 16
    anti_alias_type: str = "none"  # none | sconv | proj | max
    anti_alias_filter_size: int = 3
    use_dropblock: bool = False
    dropblock_block_size: int = 7
    dropblock_keep_prob: float = 0.9
    dropblock_stages: Sequence[int] = (3, 4)  # 1-indexed
    zero_gamma: bool = False
    bn_momentum: float = 0.997
    bl_alpha: int = 0  # Big-Little: 0 disables
    bl_beta: int = 0
    width_multiplier: float = 1.0
    # Rematerialization of the training backward pass. Semantically exact:
    # the recompute replays the identical ops (gradients are bit-equal when
    # evaluated eagerly; under jit the restructured graph may reassociate
    # fp32 reductions — the same class of drift as any XLA graph change).
    #   'none'   : plain autodiff residuals — the measured default. XLA's own
    #              residual selection is already tighter than either hand
    #              policy below (full table in docs/DESIGN.md).
    #   'conv'   : per-block jax.checkpoint saving ONLY the tagged bf16 conv
    #              outputs + BN statistics; BN-affine/ReLU/SE/SK-attention
    #              chains are recomputed in backward. MEASURED NEGATIVE on
    #              the chip (b128: 80.4->88.6 ms, bytes 67->77 GB — the
    #              recompute re-reads outweigh the saved residuals and the
    #              checkpoint barriers break cross-block fusion); kept as the
    #              reproducible experiment, not a recommendation.
    #   'blocks' : full per-block remat — the CAPACITY lever: temp arena
    #              5.63->1.71 GB (b128) for +26% step time. Use for
    #              R152+KD / large-batch configs that otherwise exceed HBM.
    remat: str = "none"
    # Compile-time lever (see module docstring): lax.scan over each stage's
    # tail blocks with stacked params. Weights/numerics unchanged; the
    # checkpoint LAYOUT differs (stacked leaves) — convert with
    # params_to_scan/params_from_scan. Composes with remat ('blocks'
    # checkpoints the scan body once).
    scan_blocks: bool = False

    def __post_init__(self):
        if self.resnet_size not in RESNET_BLOCKS:
            raise ValueError(f"resnet_size must be one of {sorted(RESNET_BLOCKS)}")
        if self.anti_alias_type not in ("none", "sconv", "proj", "max"):
            raise ValueError(f"bad anti_alias_type {self.anti_alias_type!r}")
        if (self.bl_alpha > 0) != (self.bl_beta > 0):
            raise ValueError("bl_alpha and bl_beta must be set together")
        if self.remat not in ("none", "conv", "conv_nocse", "blocks"):
            raise ValueError(
                f"remat must be none|conv|conv_nocse|blocks, got {self.remat!r}")

    @property
    def use_bl(self) -> bool:
        return self.bl_alpha > 0 and self.bl_beta > 0

    @property
    def blocks(self):
        return RESNET_BLOCKS[self.resnet_size]

    def stage_filters(self, stage_idx: int) -> int:
        return int(_STAGE_FILTERS[stage_idx] * self.width_multiplier)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _stem_init(key, cfg: ModelConfig, dtype):
    params, state = {}, {}
    if cfg.use_resnet_d:
        # ResNet-D deep stem: 3x3/2 (32) → 3x3 (32) → 3x3 (64)
        k0, k1, k2 = jax.random.split(key, 3)
        widths = [(3, 32), (32, 32), (32, 64)]
        for i, (cin, cout) in enumerate(widths):
            params[f"conv{i}"] = conv_init((k0, k1, k2)[i], 3, cin, cout, dtype=dtype)
            params[f"bn{i}"], state[f"bn{i}"] = bn_init(cout, dtype=dtype)
    else:
        params["conv0"] = conv_init(key, 7, 3, 64, dtype=dtype)
        params["bn0"], state["bn0"] = bn_init(64, dtype=dtype)
    return params, state


def _block_init(key, cfg: ModelConfig, in_ch, filters, *, has_proj, dtype):
    out_ch = filters * _EXPANSION
    keys = jax.random.split(key, 6)
    params, state = {}, {}

    if has_proj:
        params["proj_conv"] = conv_init(keys[0], 1, in_ch, out_ch, dtype=dtype)
        params["proj_bn"], state["proj_bn"] = bn_init(out_ch, dtype=dtype)

    params["conv1"] = conv_init(keys[1], 1, in_ch, filters, dtype=dtype)
    params["bn1"], state["bn1"] = bn_init(filters, dtype=dtype)

    if cfg.use_sk_block:
        params["sk"], state["sk"] = sk_init(keys[2], filters, filters, dtype=dtype)
    else:
        params["conv2"] = conv_init(keys[2], 3, filters, filters, dtype=dtype)
        params["bn2"], state["bn2"] = bn_init(filters, dtype=dtype)

    params["conv3"] = conv_init(keys[3], 1, filters, out_ch, dtype=dtype)
    params["bn3"], state["bn3"] = bn_init(out_ch, zero_gamma=cfg.zero_gamma, dtype=dtype)

    if cfg.use_se_block:
        params["se"] = se_init(keys[4], out_ch, ratio=cfg.se_ratio, dtype=dtype)
    return params, state


# ---------------------------------------------------------------------------
# Big-Little stages (bL-Net, Chen et al. 2019; reference flags bl_alpha /
# bl_beta — upstream wiring tagged K-med in SURVEY.md §0, so this follows the
# published bL-ResNet recipe):
#   Entry        : the stage's normal stride-2 projection block — input res R
#                  down to S, the resolution a STANDARD stage's blocks run at.
#   Big branch   : n-1 blocks ONE OCTAVE BELOW the stage resolution (first
#                  block strides S -> S/2), full width — the paper's FLOP cut:
#                  the bulk of the stage's blocks run at 1/4 the baseline cost.
#   Little branch: max(1, n//beta) blocks at the stage resolution S,
#                  width/alpha, then a 1x1 conv+BN up to the stage width.
#   Merge        : nearest-upsample big back to S, add, ReLU.
# Applied to stages 2-3 (stage 1 has no stride; stage 4's maps are already
# small — matching the paper's placement).
#
# Costing note (why the octaves are placed this way): an earlier wiring ran
# the little branch and a full-width transition block at the PRE-stride
# resolution and the big branch at the stage's normal resolution — measured
# 1.56x the FLOPs of its own bl_alpha=0 ablation (860 vs 552 fwd GFLOPs at
# b64/224², 50.3 vs 30.6 ms/step on the chip), i.e. an octave too expensive
# everywhere and no cut at all. With the stride at module entry and big one
# octave below normal, the module costs ~(1 + (n-1)/4 + (n/beta)/alpha²)/n
# of the baseline stage — the paper's advertised reduction.
# ---------------------------------------------------------------------------

_BL_STAGES = (1, 2)  # 0-indexed stage ids that get the dual branches


def _bl_little_width(cfg: ModelConfig, filters: int) -> int:
    return max(filters // max(cfg.bl_alpha, 1), 16)


def _bl_stage_init(key, cfg: ModelConfig, in_ch: int, filters: int,
                   n_blocks: int, *, dtype):
    out_ch = filters * _EXPANSION
    lf = _bl_little_width(cfg, filters)
    l_out = lf * _EXPANSION
    n_little = max(1, n_blocks // max(cfg.bl_beta, 1))
    keys = jax.random.split(key, 4)
    params, state = {}, {}

    # entry: the stage's normal stride-2 projection block (R -> S)
    params["entry"], state["entry"] = _block_init(
        keys[0], cfg, in_ch, filters, has_proj=True, dtype=dtype)

    # big: n-1 blocks one octave below the stage resolution; the first
    # strides S -> S/2 and projects (channels stay out_ch)
    bp, bs_ = {}, {}
    n_big = max(n_blocks - 1, 1)
    block_keys = jax.random.split(keys[1], n_big)
    for b in range(n_big):
        bp[f"block{b}"], bs_[f"block{b}"] = _block_init(
            block_keys[b], cfg, out_ch, filters, has_proj=b == 0, dtype=dtype)
    params["big"], state["big"] = bp, bs_

    # little: thin blocks at the stage resolution S
    lp, ls = {}, {}
    ch = out_ch
    little_keys = jax.random.split(keys[2], n_little)
    for b in range(n_little):
        lp[f"block{b}"], ls[f"block{b}"] = _block_init(
            little_keys[b], cfg, ch, lf, has_proj=b == 0, dtype=dtype)
        ch = l_out
    params["little"], state["little"] = lp, ls

    params["little_proj"] = conv_init(keys[3], 1, l_out, out_ch, dtype=dtype)
    params["little_proj_bn"], state["little_proj_bn"] = bn_init(out_ch, dtype=dtype)
    return params, state


def _bl_stage_apply(params, state, x, cfg: ModelConfig, *, train, policy,
                    axis_name):
    new_state = {"big": {}, "little": {}}
    cd = policy.compute_dtype
    qc = policy.quantize_conv

    def _blk(p, st, h, stride):
        fn = _remat_wrap(
            lambda pp, ss_, hh: _block_apply(
                pp, ss_, hh, cfg, stride=stride, train=train, policy=policy,
                axis_name=axis_name),
            cfg, train)
        return fn(p, st, h)

    x, new_state["entry"] = _blk(params["entry"], state["entry"], x, 2)

    big = x
    for b in range(len(params["big"])):
        big, new_state["big"][f"block{b}"] = _blk(
            params["big"][f"block{b}"], state["big"][f"block{b}"], big,
            2 if b == 0 else 1)

    little = x
    for b in range(len(params["little"])):
        little, new_state["little"][f"block{b}"] = _blk(
            params["little"][f"block{b}"], state["little"][f"block{b}"],
            little, 1)
    little = conv_apply(params["little_proj"], little, stride=1, compute_dtype=cd,
                        quantize=qc)
    little, new_state["little_proj_bn"] = bn_apply(
        params["little_proj_bn"], state["little_proj_bn"], little, train=train,
        momentum=cfg.bn_momentum, axis_name=axis_name)

    n, hh, ww, c = little.shape
    big_up = jax.image.resize(big, (n, hh, ww, c), method="nearest")
    return jax.nn.relu(big_up + little), new_state


def resnet_init(key, cfg: ModelConfig, *, dtype=jnp.float32):
    """Build (params, state) pytrees for the configured model."""
    k_stem, k_body, k_head = jax.random.split(key, 3)
    params, state = {}, {}
    params["stem"], state["stem"] = _stem_init(k_stem, cfg, dtype)

    in_ch = 64
    stage_keys = jax.random.split(k_body, 4)
    for s in range(4):
        filters = cfg.stage_filters(s)
        if cfg.use_bl and s in _BL_STAGES:
            params[f"stage{s + 1}"], state[f"stage{s + 1}"] = _bl_stage_init(
                stage_keys[s], cfg, in_ch, filters, cfg.blocks[s], dtype=dtype)
            in_ch = filters * _EXPANSION
            continue
        sp, ss = {}, {}
        block_keys = jax.random.split(stage_keys[s], cfg.blocks[s])
        if cfg.scan_blocks:
            # projection block unrolled, shape-identical tail stacked along a
            # leading block axis (vmap over per-block keys) for lax.scan
            sp["block0"], ss["block0"] = _block_init(
                block_keys[0], cfg, in_ch, filters, has_proj=True, dtype=dtype)
            in_ch = filters * _EXPANSION
            sp["tail"], ss["tail"] = jax.vmap(
                lambda k: _block_init(k, cfg, in_ch, filters, has_proj=False,
                                      dtype=dtype))(block_keys[1:])
            params[f"stage{s + 1}"], state[f"stage{s + 1}"] = sp, ss
            continue
        for b in range(cfg.blocks[s]):
            has_proj = b == 0  # first block of each stage projects (+ strides if s>0)
            sp[f"block{b}"], ss[f"block{b}"] = _block_init(
                block_keys[b], cfg, in_ch, filters, has_proj=has_proj, dtype=dtype)
            in_ch = filters * _EXPANSION
        params[f"stage{s + 1}"], state[f"stage{s + 1}"] = sp, ss

    params["head"] = dense_init(k_head, in_ch, cfg.num_classes, dtype=dtype)
    return params, state


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _stem_apply(params, state, x, cfg: ModelConfig, *, train, policy, axis_name):
    new_state = {}
    cd = policy.compute_dtype
    qc = policy.quantize_conv
    if cfg.use_resnet_d:
        for i in range(3):
            x = conv_apply(params[f"conv{i}"], x, stride=2 if i == 0 else 1,
                           compute_dtype=cd, quantize=qc)
            x, new_state[f"bn{i}"] = bn_apply(
                params[f"bn{i}"], state[f"bn{i}"], x, train=train,
                momentum=cfg.bn_momentum, axis_name=axis_name)
            x = jax.nn.relu(x)
    else:
        x = conv_apply(params["conv0"], x, stride=2, compute_dtype=cd,
                       quantize=qc)
        x, new_state["bn0"] = bn_apply(
            params["bn0"], state["bn0"], x, train=train,
            momentum=cfg.bn_momentum, axis_name=axis_name)
        x = jax.nn.relu(x)

    if cfg.anti_alias_type == "max":
        # anti-aliased stem pool: dense max then blur-subsample
        x = max_pool_same(x, window=3, stride=1)
        x = blur_pool(x, stride=2, filter_size=cfg.anti_alias_filter_size)
    else:
        x = max_pool_same(x, window=3, stride=2)
    return x, new_state


def _shortcut(params, state, x, cfg: ModelConfig, *, stride, train, policy, axis_name):
    new_state = {}
    if "proj_conv" not in params:
        return x, new_state
    cd = policy.compute_dtype
    qc = policy.quantize_conv
    h = x
    if stride > 1:
        if cfg.use_resnet_d:
            # ResNet-D: avgpool 2x2/2 then 1x1 conv stride 1
            h = avg_pool(h, window=stride, stride=stride, padding="SAME")
        elif cfg.anti_alias_type in ("proj", "max"):
            h = blur_pool(h, stride=stride, filter_size=cfg.anti_alias_filter_size)
        conv_stride = 1 if (cfg.use_resnet_d or cfg.anti_alias_type in ("proj", "max")) else stride
    else:
        conv_stride = 1
    h = conv_apply(params["proj_conv"], h, stride=conv_stride, compute_dtype=cd,
                   quantize=qc)
    h, new_state["proj_bn"] = bn_apply(
        params["proj_bn"], state["proj_bn"], h, train=train,
        momentum=cfg.bn_momentum, axis_name=axis_name)
    return h, new_state


def _remat_wrap(fn, cfg: ModelConfig, train: bool):
    """Wrap ``fn(params, state, x) -> (y, new_state)`` per ``cfg.remat``.

    Training only — eval saves no residuals. 'conv' saves exactly the tagged
    compute-dtype conv outputs and BN statistics (see ops/conv.py,
    ops/norm.py) and recomputes every elementwise/attention chain in the
    backward pass; 'blocks' is full per-region remat.
    """
    if not train or cfg.remat == "none":
        return fn
    if cfg.remat == "blocks":
        return jax.checkpoint(fn)
    policy = jax.checkpoint_policies.save_only_these_names("conv_out", "bn_stats")
    # 'conv_nocse' drops the optimization barriers (prevent_cse=False) to
    # isolate how much of the measured 'conv' regression is barrier-broken
    # fusion vs recompute reads — without barriers XLA is free to CSE the
    # recompute back into the forward (i.e. behave like 'none').
    return jax.checkpoint(fn, policy=policy,
                          prevent_cse=cfg.remat != "conv_nocse")


def _block_apply(params, state, x, cfg: ModelConfig, *, stride, train, policy, axis_name):
    new_state = {}
    cd = policy.compute_dtype
    qc = policy.quantize_conv
    shortcut, ns = _shortcut(params, state, x, cfg, stride=stride, train=train,
                             policy=policy, axis_name=axis_name)
    new_state.update(ns)

    h = conv_apply(params["conv1"], x, stride=1, compute_dtype=cd, quantize=qc)
    h, new_state["bn1"] = bn_apply(params["bn1"], state["bn1"], h, train=train,
                                   momentum=cfg.bn_momentum, axis_name=axis_name)
    h = jax.nn.relu(h)

    # mid conv (or SK unit); anti-alias 'sconv'/'proj'/'max' move the stride
    # into a BlurPool after the conv.
    aa = cfg.anti_alias_type != "none"
    mid_stride = 1 if (aa and stride > 1) else stride
    if cfg.use_sk_block:
        h, new_state["sk"] = sk_apply(
            params["sk"], state["sk"], h, stride=mid_stride, train=train,
            bn_momentum=cfg.bn_momentum, axis_name=axis_name, compute_dtype=cd,
            merged=cfg.sk_merged_conv, quantize=qc)
    else:
        h = conv_apply(params["conv2"], h, stride=mid_stride, compute_dtype=cd,
                       quantize=qc)
        h, new_state["bn2"] = bn_apply(params["bn2"], state["bn2"], h, train=train,
                                       momentum=cfg.bn_momentum, axis_name=axis_name)
        h = jax.nn.relu(h)
    if aa and stride > 1:
        h = blur_pool(h, stride=stride, filter_size=cfg.anti_alias_filter_size)

    h = conv_apply(params["conv3"], h, stride=1, compute_dtype=cd, quantize=qc)
    h, new_state["bn3"] = bn_apply(params["bn3"], state["bn3"], h, train=train,
                                   momentum=cfg.bn_momentum, axis_name=axis_name)

    if cfg.use_se_block:
        h = se_apply(params["se"], h)

    return jax.nn.relu(h + shortcut.astype(h.dtype)), new_state


def _scan_stage_apply(sp, ss, x, cfg: ModelConfig, s: int, *, train, policy,
                      axis_name, rng, keep_prob):
    """One stage under ``scan_blocks``: unrolled projection block, then
    ``lax.scan`` over the stacked tail. Replays exactly the ops of the
    unrolled path per block (same strides, same DropBlock placement), so
    numerics match the unrolled layout bit-for-bit given converted params
    (tests/test_resnet_scan.py)."""
    stage, sname = s + 1, f"stage{s + 1}"
    use_db = cfg.use_dropblock and train and stage in cfg.dropblock_stages
    if use_db and rng is None:
        raise ValueError("training with DropBlock requires rng")

    first_fn = _remat_wrap(
        lambda p, st, h: _block_apply(
            p, st, h, cfg, stride=2 if s > 0 else 1, train=train,
            policy=policy, axis_name=axis_name),
        cfg, train)
    x, ns0 = first_fn(sp["block0"], ss["block0"], x)
    if use_db:
        x = dropblock(rng(f"dropblock/{sname}/block0"), x, keep_prob=keep_prob,
                      block_size=cfg.dropblock_block_size, train=True)

    tail_fn = _remat_wrap(
        lambda p, st, h: _block_apply(
            p, st, h, cfg, stride=1, train=train, policy=policy,
            axis_name=axis_name),
        cfg, train)
    n_tail = cfg.blocks[s] - 1

    def body(h, xs):
        if use_db:
            p, st, k = xs
        else:
            p, st = xs
        h, ns = tail_fn(p, st, h)
        if use_db:
            h = dropblock(k, h, keep_prob=keep_prob,
                          block_size=cfg.dropblock_block_size, train=True)
        return h, ns

    xs = (sp["tail"], ss["tail"])
    if use_db:
        xs += (jax.random.split(rng(f"dropblock/{sname}/tail"), n_tail),)
    x, ns_tail = jax.lax.scan(body, x, xs)
    return x, {"block0": ns0, "tail": ns_tail}


# ---------------------------------------------------------------------------
# scan-layout converters: the weights are the same, only the tree layout
# differs (per-block dicts vs a stacked leading block axis). Used to move
# checkpoints / TF imports (which produce the unrolled layout) onto a
# scan_blocks config and back. Work on params AND model-state trees (both
# share the blockN structure).
# ---------------------------------------------------------------------------

def _stage_to_scan(stage_tree):
    n = len(stage_tree)
    tail = [stage_tree[f"block{b}"] for b in range(1, n)]
    return {"block0": stage_tree["block0"],
            "tail": jax.tree.map(lambda *xs: jnp.stack(xs), *tail)}


def _stage_from_scan(stage_tree):
    out = {"block0": stage_tree["block0"]}
    n_tail = jax.tree.leaves(stage_tree["tail"])[0].shape[0]
    for b in range(n_tail):
        out[f"block{b + 1}"] = jax.tree.map(lambda x: x[b],
                                            stage_tree["tail"])
    return out


def params_to_scan(tree, cfg: ModelConfig):
    """Unrolled-layout params/state tree → ``scan_blocks`` layout."""
    out = dict(tree)
    for s in range(4):
        if cfg.use_bl and s in _BL_STAGES:
            continue  # BL stages are heterogeneous; scan_blocks skips them
        out[f"stage{s + 1}"] = _stage_to_scan(tree[f"stage{s + 1}"])
    return out


def params_from_scan(tree, cfg: ModelConfig):
    """``scan_blocks``-layout params/state tree → unrolled layout."""
    out = dict(tree)
    for s in range(4):
        if cfg.use_bl and s in _BL_STAGES:
            continue
        out[f"stage{s + 1}"] = _stage_from_scan(tree[f"stage{s + 1}"])
    return out


def resnet_apply(
    params,
    state,
    images,
    *,
    cfg: ModelConfig,
    train: bool,
    policy: Policy = DEFAULT_POLICY,
    rng=None,
    progress=1.0,
    axis_name: str | None = None,
):
    """Forward pass. Returns ``(logits_fp32, new_state)``.

    ``progress`` in [0,1] drives the DropBlock keep-prob schedule (may be a
    traced scalar). ``rng`` is required when training with DropBlock.
    """
    x = policy.cast_to_compute(images)
    new_state = {}
    stem_fn = _remat_wrap(
        lambda p, st, h: _stem_apply(p, st, h, cfg, train=train, policy=policy,
                                     axis_name=axis_name),
        cfg, train)
    x, new_state["stem"] = stem_fn(params["stem"], state["stem"], x)

    kp = dropblock_keep_prob(progress, cfg.dropblock_keep_prob)
    for s in range(4):
        stage, sname = s + 1, f"stage{s + 1}"
        sp, ss = params[sname], state[sname]
        if cfg.use_bl and s in _BL_STAGES:
            x, new_state[sname] = _bl_stage_apply(
                sp, ss, x, cfg, train=train, policy=policy, axis_name=axis_name)
            if cfg.use_dropblock and train and stage in cfg.dropblock_stages:
                if rng is None:
                    raise ValueError("training with DropBlock requires rng")
                x = dropblock(rng(f"dropblock/{sname}/out"), x, keep_prob=kp,
                              block_size=cfg.dropblock_block_size, train=True)
            continue
        if cfg.scan_blocks:
            x, new_state[sname] = _scan_stage_apply(
                sp, ss, x, cfg, s, train=train, policy=policy,
                axis_name=axis_name, rng=rng, keep_prob=kp)
            continue
        ns = {}
        for b in range(cfg.blocks[s]):
            stride = 2 if (s > 0 and b == 0) else 1
            block_fn = _remat_wrap(
                lambda p, st, h, _stride=stride: _block_apply(
                    p, st, h, cfg, stride=_stride, train=train, policy=policy,
                    axis_name=axis_name),
                cfg, train)
            x, ns[f"block{b}"] = block_fn(sp[f"block{b}"], ss[f"block{b}"], x)
            if cfg.use_dropblock and train and stage in cfg.dropblock_stages:
                if rng is None:
                    raise ValueError("training with DropBlock requires rng")
                key = rng(f"dropblock/{sname}/block{b}")
                x = dropblock(key, x, keep_prob=kp,
                              block_size=cfg.dropblock_block_size, train=True)
        new_state[sname] = ns

    pooled = global_avg_pool(x)  # (N, C)
    logits = dense_apply(params["head"], pooled, compute_dtype=jnp.float32)
    return logits.astype(jnp.float32), new_state
