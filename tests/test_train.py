"""Training-system tests: loss goldens, schedules, optimizer semantics, EMA,
step tests (loss decreases, BN/EMA update), checkpoint round-trip, and
data-parallel equivalence on the 8-device CPU mesh (SURVEY.md §4 items 2/4)."""

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from axcnn.models.resnet import ModelConfig
from axcnn.train.losses import softmax_ce_loss, l2_regularization, kd_loss, decay_mask
from axcnn.train.schedules import make_lr_schedule, scale_lr_for_batch
from axcnn.train.optimizer import momentum_init, momentum_update
from axcnn.train.ema import ema_init, ema_update
from axcnn.train.train_step import (
    create_train_state, make_train_step, make_eval_step, pad_batch, topk_correct)
from axcnn.train.schedules import make_lr_schedule
from axcnn.parallel.mesh import make_mesh, shard_train_step, shard_eval_step, shard_batch, DATA_AXIS

# train-step integration (DP/grad-accum/KD/checkpoint) — release tier; `-m 'not slow'` is the dev loop
pytestmark = pytest.mark.slow


SMALL = ModelConfig(resnet_size=50, num_classes=10)


def _small_batch(n=8, size=32, num_classes=10, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8),
        "labels": rng.integers(0, num_classes, (n,), dtype=np.int32),
    }


class TestLosses:
    def test_ce_matches_manual(self):
        logits = jnp.array([[2.0, 1.0, 0.0], [0.0, 3.0, 0.0]])
        labels = jnp.array([0, 1])
        got = softmax_ce_loss(logits, labels)
        p = jax.nn.log_softmax(logits)
        want = -(p[0, 0] + p[1, 1]) / 2
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_label_smoothing_golden(self):
        logits = jnp.array([[1.0, 2.0, 3.0]])
        labels = jnp.array([2])
        ls = 0.3
        logp = np.asarray(jax.nn.log_softmax(logits))[0]
        q = np.full(3, ls / 3)
        q[2] += 1 - ls
        want = -(q * logp).sum()
        got = softmax_ce_loss(logits, labels, label_smoothing=ls)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_mixup_linearity(self):
        logits = jax.random.normal(jax.random.key(0), (4, 7))
        la = jnp.array([0, 1, 2, 3])
        lb = jnp.array([3, 2, 1, 0])
        lam = 0.7
        got = softmax_ce_loss(logits, la, lb, lam, label_smoothing=0.1)
        want = lam * softmax_ce_loss(logits, la, label_smoothing=0.1) + \
            (1 - lam) * softmax_ce_loss(logits, lb, label_smoothing=0.1)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_kd_zero_when_equal(self):
        logits = jax.random.normal(jax.random.key(0), (4, 7))
        np.testing.assert_allclose(kd_loss(logits, logits, temperature=2.0), 0.0,
                                   atol=1e-6)

    def test_kd_positive_and_temp_scaled(self):
        s = jax.random.normal(jax.random.key(0), (4, 7))
        t = jax.random.normal(jax.random.key(1), (4, 7))
        assert float(kd_loss(s, t)) > 0

    def test_decay_mask_excludes_bn(self):
        params = {"conv1": {"w": jnp.ones((3, 3, 4, 4))},
                  "bn1": {"gamma": jnp.ones(4), "beta": jnp.zeros(4)},
                  "head": {"w": jnp.ones((4, 10)), "b": jnp.zeros(10)}}
        mask = decay_mask(params)
        assert mask["conv1"]["w"] is True
        assert mask["bn1"]["gamma"] is False
        assert mask["head"]["w"] is True and mask["head"]["b"] is False

    def test_l2_value(self):
        params = {"conv": {"w": jnp.full((2, 2), 2.0)}, "bn": {"gamma": jnp.ones(5)}}
        # 0.5 * wd * sum(w^2) = 0.5 * 0.1 * 16
        np.testing.assert_allclose(l2_regularization(params, 0.1), 0.8, rtol=1e-6)


class TestSchedules:
    def test_warmup_cosine(self):
        lr = make_lr_schedule(base_lr=1.0, total_steps=100, warmup_steps=10)
        np.testing.assert_allclose(lr(0), 0.0)
        np.testing.assert_allclose(lr(5), 0.5, rtol=1e-6)
        np.testing.assert_allclose(lr(10), 1.0, rtol=1e-6)  # cosine start
        np.testing.assert_allclose(lr(55), 0.5, rtol=1e-5)  # cosine midpoint
        np.testing.assert_allclose(lr(100), 0.0, atol=1e-7)

    def test_step_decay(self):
        lr = make_lr_schedule(base_lr=1.0, total_steps=100, warmup_steps=0,
                              decay_type="step", boundaries=(0.3, 0.6, 0.8),
                              decay_rate=0.1)
        np.testing.assert_allclose(lr(10), 1.0)
        np.testing.assert_allclose(lr(35), 0.1, rtol=1e-6)
        np.testing.assert_allclose(lr(65), 0.01, rtol=1e-6)
        np.testing.assert_allclose(lr(90), 0.001, rtol=1e-6)

    def test_linear_scaling(self):
        assert scale_lr_for_batch(0.1, 1024) == pytest.approx(0.4)

    def test_bad_type(self):
        with pytest.raises(ValueError):
            make_lr_schedule(base_lr=1.0, total_steps=10, decay_type="exp")


class TestOptimizer:
    def test_momentum_semantics(self):
        # TF MomentumOptimizer: v <- m*v + g; w <- w - lr*v
        params = {"conv": {"w": jnp.array([1.0])}}
        grads = {"conv": {"w": jnp.array([0.5])}}
        vel = momentum_init(params)
        p1, v1 = momentum_update(params, grads, vel, lr=0.1, momentum=0.9,
                                 weight_decay=0.0)
        np.testing.assert_allclose(v1["conv"]["w"], 0.5)
        np.testing.assert_allclose(p1["conv"]["w"], 1.0 - 0.1 * 0.5)
        p2, v2 = momentum_update(p1, grads, v1, lr=0.1, momentum=0.9,
                                 weight_decay=0.0)
        np.testing.assert_allclose(v2["conv"]["w"], 0.9 * 0.5 + 0.5)
        np.testing.assert_allclose(p2["conv"]["w"],
                                   float(p1["conv"]["w"][0]) - 0.1 * 0.95)

    def test_weight_decay_equals_l2_loss_grad(self):
        # analytic wd on kernels == d/dw [0.5*wd*||w||^2]
        params = {"conv": {"w": jnp.array([2.0])}, "bn": {"gamma": jnp.array([2.0])}}
        grads = jax.tree.map(jnp.zeros_like, params)
        vel = momentum_init(params)
        p1, _ = momentum_update(params, grads, vel, lr=1.0, momentum=0.0,
                                weight_decay=0.1)
        np.testing.assert_allclose(p1["conv"]["w"], 2.0 - 0.1 * 2.0)
        np.testing.assert_allclose(p1["bn"]["gamma"], 2.0)  # BN not decayed


class TestEMA:
    def test_update_rule(self):
        ema = {"w": jnp.array([0.0])}
        params = {"w": jnp.array([1.0])}
        out = ema_update(ema, params, decay=0.9, adjust=False)
        np.testing.assert_allclose(out["w"], 0.1, rtol=1e-6)

    def test_adjusted_warmup(self):
        ema = {"w": jnp.array([0.0])}
        params = {"w": jnp.array([1.0])}
        # at step 0: decay = min(0.9999, 1/10) = 0.1 → fast warmup
        out = ema_update(ema, params, decay=0.9999, step=0, adjust=True)
        np.testing.assert_allclose(out["w"], 0.9, rtol=1e-6)

    def test_init_does_not_alias(self):
        params = {"w": jnp.array([1.0], jnp.float32)}
        ema = ema_init(params)
        assert ema["w"] is not params["w"]


def _mk_step(cfg=SMALL, **kw):
    defaults = dict(
        lr_schedule=make_lr_schedule(base_lr=0.01, total_steps=100, warmup_steps=0),
        total_steps=100, label_smoothing=0.1, mixup_alpha=0.0,
        weight_decay=1e-4, use_ema=True)
    defaults.update(kw)
    return make_train_step(cfg, **defaults)


class TestTrainStep:
    def test_loss_decreases_on_fixed_batch(self):
        step_fn = jax.jit(_mk_step())
        state = create_train_state(jax.random.key(0), SMALL, use_ema=True)
        batch = _small_batch()
        key = jax.random.key(7)
        losses = []
        for _ in range(5):
            state, metrics = step_fn(state, batch, key)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 5

    def test_ema_moves_toward_params(self):
        step_fn = jax.jit(_mk_step())
        state = create_train_state(jax.random.key(0), SMALL, use_ema=True)
        batch = _small_batch()
        state2, _ = step_fn(state, batch, jax.random.key(0))
        # EMA changed but less than params did
        d_ema = float(jnp.abs(state2.ema["head"]["w"] - state.ema["head"]["w"]).max())
        d_par = float(jnp.abs(state2.params["head"]["w"] - state.params["head"]["w"]).max())
        assert 0 < d_ema <= d_par + 1e-9

    def test_mixup_dropblock_path(self):
        cfg = ModelConfig(resnet_size=50, num_classes=10, use_dropblock=True)
        step_fn = jax.jit(_mk_step(cfg, mixup_alpha=0.2))
        state = create_train_state(jax.random.key(0), cfg, use_ema=False)
        state, metrics = step_fn(state, _small_batch(), jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))

    def test_kd_teacher(self):
        t_cfg = SMALL
        from axcnn.models.resnet import resnet_init

        t_params, t_state = resnet_init(jax.random.key(9), t_cfg)
        step_fn = jax.jit(_mk_step(teacher=(t_cfg, t_params, t_state), kd_temp=2.0))
        state = create_train_state(jax.random.key(0), SMALL, use_ema=True)
        state, metrics = step_fn(state, _small_batch(), jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
        # KD adds a positive term: loss must exceed the pure-CE run at step 1
        step_ce = jax.jit(_mk_step())
        _, m_ce = step_ce(create_train_state(jax.random.key(0), SMALL, use_ema=True),
                          _small_batch(), jax.random.key(1))
        assert float(metrics["loss"]) > float(m_ce["loss"])


class TestEvalStep:
    def test_topk_and_padding(self):
        eval_fn = jax.jit(make_eval_step(SMALL))
        state = create_train_state(jax.random.key(0), SMALL, use_ema=False)
        batch = pad_batch(_small_batch(n=5), 8)
        assert batch["labels"].shape == (8,)
        assert (batch["labels"][5:] == -1).all()
        m = jax.device_get(eval_fn(state, batch))
        assert m["count"] == 5.0
        assert 0 <= m["top1"] <= 5 and m["top1"] <= m["top5"]

    def test_topk_correct_golden(self):
        logits = jnp.array([[0.1, 0.9, 0.0, 0.0, 0.0, 0.0],
                            [0.9, 0.1, 0.0, 0.0, 0.0, 0.0]])
        labels = jnp.array([1, 1])
        m = topk_correct(logits, labels, ks=(1, 5))
        assert float(m["top1"]) == 1.0
        assert float(m["top5"]) == 2.0

    def test_ema_eval_uses_shadow(self):
        state = create_train_state(jax.random.key(0), SMALL, use_ema=True)
        # corrupt raw params; EMA still holds init → different outputs
        bad = jax.tree.map(lambda p: p * 0.0, state.params)
        state = state._replace(params=bad)
        batch = _small_batch()
        m_raw = jax.device_get(make_eval_step(SMALL, use_ema=False)(state, batch))
        m_ema = jax.device_get(make_eval_step(SMALL, use_ema=True)(state, batch))
        assert m_raw["loss_sum"] != m_ema["loss_sum"]


class TestDataParallel:
    def test_dp_matches_single_device(self):
        """8-way shard_map with sync BN == single-device on the same global
        batch (no stochastic ops), to fp tolerance."""
        cfg = SMALL
        kwargs = dict(
            lr_schedule=make_lr_schedule(base_lr=0.1, total_steps=10, warmup_steps=0),
            total_steps=10, label_smoothing=0.1, mixup_alpha=0.0,
            weight_decay=1e-4, use_ema=False)
        batch = _small_batch(n=16)
        key = jax.random.key(3)
        state0 = create_train_state(jax.random.key(0), cfg, use_ema=False)

        single = jax.jit(make_train_step(cfg, **kwargs))
        s1, m1 = single(state0, batch, key)

        mesh = make_mesh(8)
        dp_step = shard_train_step(
            make_train_step(cfg, axis_name=DATA_AXIS, sync_bn=True, **kwargs), mesh)
        state0b = create_train_state(jax.random.key(0), cfg, use_ema=False)
        s8, m8 = dp_step(jax.device_put(state0b), shard_batch(mesh, batch), key)

        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-4)
        a = np.asarray(s1.params["head"]["w"])
        b = np.asarray(jax.device_get(s8.params["head"]["w"]))
        np.testing.assert_allclose(a, b, atol=2e-4)

    def test_dp_mixup_lambda_is_global(self):
        """Reference semantics (VERDICT r1 weak #5): one mixup lambda for the
        whole global batch. Under shard_map the pmean-ed lambda metric must
        equal the single draw from the pre-fold stream — computed here
        independently — and per-shard mode must differ from it."""
        from axcnn.core.rng import RngStream

        cfg = SMALL
        kwargs = dict(
            lr_schedule=make_lr_schedule(base_lr=0.0, total_steps=10,
                                         warmup_steps=0),
            total_steps=10, label_smoothing=0.1, mixup_alpha=0.2,
            weight_decay=0.0, use_ema=False)
        batch = _small_batch(n=16)
        key = jax.random.key(11)
        mesh = make_mesh(8)

        dp = shard_train_step(
            make_train_step(cfg, axis_name=DATA_AXIS, **kwargs), mesh)
        state = jax.device_put(create_train_state(jax.random.key(0), cfg,
                                                  use_ema=False))
        _, m = dp(state, shard_batch(mesh, batch), key)
        got = float(jax.device_get(m["mixup_lam"]))

        # independent re-derivation of the step's global draw (step = 0)
        rng_global = RngStream(key).fold_step(jnp.int32(0))
        want = float(jax.random.beta(rng_global("mixup"), 0.2, 0.2))
        np.testing.assert_allclose(got, want, rtol=1e-5)

        dp_shard = shard_train_step(
            make_train_step(cfg, axis_name=DATA_AXIS, mixup_per_shard=True,
                            **kwargs), mesh)
        state = jax.device_put(create_train_state(jax.random.key(0), cfg,
                                                  use_ema=False))
        _, m2 = dp_shard(state, shard_batch(mesh, batch), key)
        assert abs(float(jax.device_get(m2["mixup_lam"])) - want) > 1e-6

    def test_dp_full_stochastic_stack_runs(self):
        """Full assembled config with every stochastic path ON (mixup,
        DropBlock, EMA) across the 8-device mesh: finite loss, replicated
        state, and bit-deterministic across identical runs (VERDICT r1
        weak #6)."""
        cfg = ModelConfig(resnet_size=50, num_classes=10, use_resnet_d=True,
                          use_se_block=True, use_sk_block=True,
                          anti_alias_type="sconv", use_dropblock=True,
                          zero_gamma=True)
        kwargs = dict(
            lr_schedule=make_lr_schedule(base_lr=0.1, total_steps=10,
                                         warmup_steps=0),
            total_steps=10, label_smoothing=0.1, mixup_alpha=0.2,
            weight_decay=1e-4, use_ema=True)
        batch = _small_batch(n=16)
        key = jax.random.key(5)
        mesh = make_mesh(8)
        dp = shard_train_step(
            make_train_step(cfg, axis_name=DATA_AXIS, **kwargs), mesh)

        outs = []
        for _ in range(2):
            state = jax.device_put(create_train_state(jax.random.key(0), cfg,
                                                      use_ema=True))
            s, m = dp(state, shard_batch(mesh, batch), key)
            assert np.isfinite(float(jax.device_get(m["loss"])))
            outs.append(np.asarray(jax.device_get(s.params["head"]["w"])))
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_dp_eval_counts(self):
        mesh = make_mesh(8)
        eval_fn = shard_eval_step(make_eval_step(SMALL), mesh)
        state = create_train_state(jax.random.key(0), SMALL, use_ema=False)
        batch = pad_batch(_small_batch(n=13), 16)
        m = jax.device_get(eval_fn(jax.device_put(state), shard_batch(mesh, batch)))
        assert m["count"] == 13.0


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from axcnn.ckpt.checkpoint import CheckpointManager
        from axcnn.data.pipeline import LoaderState

        state = create_train_state(jax.random.key(0), SMALL, use_ema=True)
        step_fn = jax.jit(_mk_step())
        state, _ = step_fn(state, _small_batch(), jax.random.key(1))

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(state, loader_state=LoaderState(2, 17), rng_seed=42, force=True)
        mgr.wait()

        template = create_train_state(jax.random.key(5), SMALL, use_ema=True)
        restored, loader_state, seed = mgr.restore(template)
        mgr.close()
        assert int(restored.step) == 1
        assert loader_state == LoaderState(2, 17)
        assert seed == 42
        for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(state.ema), jax.tree.leaves(restored.ema)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestConfig:
    def test_overrides(self):
        from axcnn.utils.config import Config, apply_overrides

        cfg = apply_overrides(Config(), [
            "--model.use_se_block=true", "--train.base_lr=0.4",
            "--data.mixup_alpha=0.2", "--batch_size=512", "--runtime.eval_only"])
        assert cfg.model.use_se_block is True
        assert cfg.train.base_lr == 0.4
        assert cfg.data.mixup_alpha == 0.2
        assert cfg.train.batch_size == 512
        assert cfg.runtime.eval_only is True

    def test_unknown_and_ambiguous(self):
        from axcnn.utils.config import Config, apply_overrides

        with pytest.raises(ValueError):
            apply_overrides(Config(), ["--nope=1"])
        with pytest.raises(ValueError):
            apply_overrides(Config(), ["--image_size=128", "--bogus.x=1"])

    def test_preprocessing_type(self):
        from axcnn.utils.config import (Config, apply_overrides,
                                        resolve_preprocessing)

        cfg = apply_overrides(Config(),
                              ["--data.preprocessing_type=imagenet_256_288a"])
        data = resolve_preprocessing(cfg.data)
        assert (data.image_size, data.resize_min) == (256, 288)
        # empty string: explicit fields win
        assert resolve_preprocessing(Config().data).image_size == 224
        with pytest.raises(ValueError, match="preprocessing_type"):
            resolve_preprocessing(apply_overrides(
                Config(), ["--data.preprocessing_type=cifar_32"]).data)

    def test_presets_load(self):
        from axcnn.utils.config import load_preset

        for name in ("vanilla_resnet50", "assemble_resnet50",
                      "assemble_resnet152_kd", "finetune_fgvc"):
            cfg = load_preset(name)
            assert cfg.train.batch_size > 0

    def test_mce_math(self):
        from axcnn.eval.imagenet_c import compute_mce

        out = compute_mce({"gaussian_noise": 0.886428, "fog": 0.4096620})
        np.testing.assert_allclose(out["ce/gaussian_noise"], 100.0)
        np.testing.assert_allclose(out["ce/fog"], 50.0)
        np.testing.assert_allclose(out["mce"], 75.0)


class TestGradAccum:
    def test_duplicated_halves_match_single_step(self):
        """With the second half of the batch identical to the first, per-
        micro BN statistics equal full-batch statistics, so accum=2 must
        produce the same parameter update as accum=1 (zero_gamma conditions
        the backward against fp32 reassociation noise; model_state is
        excluded — accumulation applies the BN moving-average twice by
        design)."""
        cfg = ModelConfig(resnet_size=50, num_classes=10, zero_gamma=True)
        half = _small_batch(n=4)
        batch = {
            "images": np.concatenate([half["images"], half["images"]]),
            "labels": np.concatenate([half["labels"], half["labels"]]),
        }
        key = jax.random.key(3)
        s1 = create_train_state(jax.random.key(0), cfg, use_ema=True)
        s1, m1 = jax.jit(_mk_step(cfg))(s1, batch, key)
        s2 = create_train_state(jax.random.key(0), cfg, use_ema=True)
        s2, m2 = jax.jit(_mk_step(cfg, grad_accum_steps=2))(s2, batch, key)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=2e-4),
            s1.params, s2.params)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(m1["train_top1"]),
                                   float(m2["train_top1"]))

    def test_stochastic_stack_runs_and_learns(self):
        """Micro-batch 8 — the documented BN floor (micro=2 at this 32x32
        geometry leaves stage 4 with 2 samples/channel and provably explodes;
        see make_train_step docstring)."""
        cfg = ModelConfig(resnet_size=50, num_classes=10, use_dropblock=True,
                          use_se_block=True)
        step_fn = jax.jit(_mk_step(cfg, grad_accum_steps=2, mixup_alpha=0.2))
        state = create_train_state(jax.random.key(0), cfg, use_ema=True)
        batch = _small_batch(n=16)
        losses = []
        for _ in range(4):
            state, metrics = step_fn(state, batch, jax.random.key(7))
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all() and losses[-1] < losses[0]
        assert "mixup_lam" in metrics

    def test_rejects_bad_factor_and_indivisible_batch(self):
        with pytest.raises(ValueError, match="grad_accum_steps"):
            _mk_step(grad_accum_steps=0)
        step_fn = _mk_step(grad_accum_steps=3)
        state = create_train_state(jax.random.key(0), SMALL, use_ema=True)
        with pytest.raises(ValueError, match="not divisible"):
            step_fn(state, _small_batch(n=8), jax.random.key(0))

    def test_loop_integration(self, tmp_path):
        import dataclasses

        from axcnn.train.loop import run
        from axcnn.utils.config import (Config, DataConfig, RuntimeConfig,
                                        TrainConfig)

        cfg = Config(
            model=ModelConfig(resnet_size=50, num_classes=1001),
            data=DataConfig(dataset_name="imagenet", use_synthetic_data=True,
                            image_size=32),
            train=TrainConfig(batch_size=4, train_steps=2, base_lr=0.01,
                              lr_warmup_epochs=0, dtype="fp32", log_every=1,
                              use_ema=True, seed=0, grad_accum_steps=2),
            runtime=RuntimeConfig(model_dir=str(tmp_path / "run"),
                                  num_devices=1),
        )
        m = run(cfg)
        assert m["count"] > 0
