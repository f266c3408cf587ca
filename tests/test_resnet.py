"""Model-level tests: shapes, param counts, assembly knobs, determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from axcnn.core.dtypes import BF16_POLICY
from axcnn.core.rng import RngStream
from axcnn.core.tree import tree_count_params
from axcnn.models.resnet import ModelConfig, resnet_init, resnet_apply


def _fwd(cfg, batch=2, size=64, train=False, policy=None, seed=0):
    params, state = resnet_init(jax.random.key(seed), cfg)
    x = jax.random.normal(jax.random.key(1), (batch, size, size, 3))
    kwargs = dict(cfg=cfg, train=train)
    if policy is not None:
        kwargs["policy"] = policy
    if train:
        kwargs["rng"] = RngStream(jax.random.key(2))
    return resnet_apply(params, state, x, **kwargs), (params, state)


class TestVanillaResNet50:
    def test_logits_shape(self):
        (logits, _), _ = _fwd(ModelConfig(resnet_size=50, num_classes=1000))
        assert logits.shape == (2, 1000)
        assert logits.dtype == jnp.float32

    def test_param_count_matches_reference(self):
        # canonical ResNet-50 v1 (1000 classes): 25,557,032 trainable params
        cfg = ModelConfig(resnet_size=50, num_classes=1000)
        params, _ = resnet_init(jax.random.key(0), cfg)
        assert tree_count_params(params) == 25_557_032

    def test_eval_deterministic(self):
        cfg = ModelConfig()
        (l1, _), _ = _fwd(cfg)
        (l2, _), _ = _fwd(cfg)
        np.testing.assert_allclose(l1, l2)

    def test_eval_state_unchanged(self):
        (_, new_state), (_, state) = _fwd(ModelConfig())
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(new_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_train_updates_bn_state(self):
        (_, new_state), (_, state) = _fwd(ModelConfig(), train=True, size=64)
        diffs = [
            float(jnp.abs(a - b).max())
            for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(new_state))
        ]
        assert max(diffs) > 0


class TestAssemblyKnobs:
    def test_resnet_d(self):
        (logits, _), (params, _) = _fwd(ModelConfig(use_resnet_d=True), size=64)
        assert logits.shape == (2, 1000)
        assert "conv2" in params["stem"]  # deep stem has 3 convs

    def test_blurpool_all_types(self):
        for aa in ("sconv", "proj", "max"):
            (logits, _), _ = _fwd(ModelConfig(anti_alias_type=aa), size=64)
            assert logits.shape == (2, 1000), aa

    def test_se_sk(self):
        cfg = ModelConfig(use_se_block=True, use_sk_block=True)
        (logits, _), (params, _) = _fwd(cfg, size=64)
        assert logits.shape == (2, 1000)
        b0 = params["stage1"]["block0"]
        assert "se" in b0 and "sk" in b0 and "conv2" not in b0

    def test_full_assemble(self):
        cfg = ModelConfig(
            use_resnet_d=True, use_se_block=True, use_sk_block=True,
            anti_alias_type="sconv", use_dropblock=True, zero_gamma=True)
        (logits, _), _ = _fwd(cfg, size=64, train=True)
        assert logits.shape == (2, 1000)
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_zero_gamma_blocks_identity_at_init(self):
        # with zero-gamma (and no SE), each residual block is identity+ReLU at
        # init → network output depends only on stem+projections; logits finite
        cfg = ModelConfig(zero_gamma=True)
        (logits, _), _ = _fwd(cfg, size=64)
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_resnet101_152_shapes(self):
        for size in (101, 152):
            cfg = ModelConfig(resnet_size=size)
            params, _ = resnet_init(jax.random.key(0), cfg)
            n = tree_count_params(params)
            # canonical counts: R101=44,549,160  R152=60,192,808
            assert n == {101: 44_549_160, 152: 60_192_808}[size]

    def test_big_little_forward(self):
        cfg = ModelConfig(bl_alpha=2, bl_beta=4, num_classes=1000)
        (logits, _), (params, _) = _fwd(cfg, size=64)
        assert logits.shape == (2, 1000)
        assert np.all(np.isfinite(np.asarray(logits)))
        # bL stages 2-3 have an entry block + dual branches
        s2 = params["stage2"]
        assert "big" in s2 and "little" in s2 and "entry" in s2
        assert "block0" in params["stage1"]  # stage 1 stays standard
        assert "block0" in params["stage4"]  # stage 4 stays standard

    def test_big_little_train_with_assembly(self):
        cfg = ModelConfig(bl_alpha=2, bl_beta=4, use_resnet_d=True,
                          use_se_block=True, use_sk_block=True,
                          anti_alias_type="sconv", use_dropblock=True)
        (logits, _), _ = _fwd(cfg, size=64, train=True)
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_big_little_validation(self):
        with pytest.raises(ValueError):
            ModelConfig(bl_alpha=2, bl_beta=0)


class TestPolicies:
    def test_bf16_forward_finite(self):
        cfg = ModelConfig(use_resnet_d=True, use_se_block=True)
        (logits, _), _ = _fwd(cfg, size=64, policy=BF16_POLICY)
        assert logits.dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(logits)))

    def test_jit_compiles(self):
        cfg = ModelConfig()
        params, state = resnet_init(jax.random.key(0), cfg)
        x = jnp.ones((1, 64, 64, 3))

        @jax.jit
        def f(p, s, x):
            return resnet_apply(p, s, x, cfg=cfg, train=False)[0]

        y = f(params, state, x)
        assert y.shape == (1, 1000)


@pytest.mark.slow  # minutes-long grad compiles per remat mode
class TestRemat:
    """ModelConfig.remat must be semantically exact: evaluated eagerly (no
    XLA rescheduling), forward, new BN state, and gradients are bit-equal
    across modes — the recompute replays the identical ops. (Under jit the
    restructured graph may reassociate fp32 reductions; that drift is the
    same class as any XLA graph change and is not asserted here.)"""

    @pytest.mark.parametrize("mode", ["conv", "blocks"])
    def test_bit_equal_eager(self, mode):
        base = dict(resnet_size=50, num_classes=5, width_multiplier=0.25,
                    use_resnet_d=True, use_se_block=True, use_sk_block=True,
                    anti_alias_type="sconv")
        x = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
        labels = jnp.array([1, 3])

        def run(remat):
            cfg = ModelConfig(**base, remat=remat)
            params, state = resnet_init(jax.random.key(1), cfg)

            def loss_fn(p):
                logits, ns = resnet_apply(p, state, x, cfg=cfg, train=True)
                nll = -jnp.mean(
                    jax.nn.log_softmax(logits)[jnp.arange(2), labels])
                return nll, (logits, ns)

            with jax.disable_jit():
                (l, (logits, ns)), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
            return l, logits, ns, g

        l0, lo0, ns0, g0 = run("none")
        l1, lo1, ns1, g1 = run(mode)
        assert float(l0) == float(l1)
        np.testing.assert_array_equal(np.asarray(lo0), np.asarray(lo1))
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            (ns0, g0), (ns1, g1))

    def test_remat_validation(self):
        with pytest.raises(ValueError):
            ModelConfig(remat="bogus")

    def test_remat_jit_train_step_runs(self):
        # plumbing: the full train step compiles and runs with remat='conv'
        from axcnn.train.schedules import make_lr_schedule
        from axcnn.train.train_step import (create_train_state,
                                            make_train_step)

        cfg = ModelConfig(resnet_size=50, num_classes=5,
                          width_multiplier=0.25, use_se_block=True,
                          remat="conv")
        step = jax.jit(make_train_step(
            cfg,
            lr_schedule=make_lr_schedule(base_lr=0.1, total_steps=10,
                                         warmup_steps=2),
            total_steps=10, mixup_alpha=0.2, use_ema=True))
        state = create_train_state(jax.random.key(0), cfg, use_ema=True)
        batch = {
            "images": np.zeros((2, 32, 32, 3), np.uint8),
            "labels": np.array([0, 1], np.int32),
        }
        state, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss"]))
