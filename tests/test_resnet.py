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
        # bL stages 2-3 have dual branches + transition block
        s2 = params["stage2"]
        assert "big" in s2 and "little" in s2 and "trans" in s2
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
