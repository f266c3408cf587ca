"""scan_blocks: lax.scan over stage tails must be a pure LAYOUT change.

The feature exists for compile time (one tail-block body per stage instead
of one per block — the standard large-model JAX lever; module docstring of
axcnn/models/resnet.py). These tests pin the contract that makes it safe
to flip on any config: given converted params, the scanned program
computes the SAME function as the unrolled one — logits, loss, gradients,
and BN-state updates all match.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from axcnn.core.dtypes import BF16_POLICY, DEFAULT_POLICY
from axcnn.models.resnet import (
    ModelConfig, params_from_scan, params_to_scan, resnet_apply, resnet_init)

CFG = ModelConfig(resnet_size=50, num_classes=16, width_multiplier=0.25,
                  use_resnet_d=True, use_se_block=True, use_sk_block=True,
                  anti_alias_type="sconv", zero_gamma=True)
SCAN_CFG = dataclasses.replace(CFG, scan_blocks=True)


def _images(n=2, hw=32):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(n, hw, hw, 3)), jnp.float32)


@pytest.fixture(scope="module")
def unrolled():
    params, state = jax.jit(lambda k: resnet_init(k, CFG))(jax.random.key(0))
    return jax.device_get(params), jax.device_get(state)


class TestLayout:
    def test_init_shapes_match_converted(self, unrolled):
        """Native scan init produces exactly the layout params_to_scan does."""
        params, state = unrolled
        sp, ss = jax.eval_shape(lambda k: resnet_init(k, SCAN_CFG),
                                jax.random.key(0))
        want_p = jax.tree.map(lambda x: (x.shape, x.dtype),
                              params_to_scan(params, CFG))
        got_p = jax.tree.map(lambda x: (x.shape, x.dtype), sp)
        assert want_p == got_p
        want_s = jax.tree.map(lambda x: (x.shape, x.dtype),
                              params_to_scan(state, CFG))
        got_s = jax.tree.map(lambda x: (x.shape, x.dtype), ss)
        assert want_s == got_s

    def test_tail_leading_dim_is_blocks_minus_one(self):
        sp, _ = jax.eval_shape(lambda k: resnet_init(k, SCAN_CFG),
                               jax.random.key(0))
        for s, n in enumerate(SCAN_CFG.blocks):
            leaf = jax.tree.leaves(sp[f"stage{s + 1}"]["tail"])[0]
            assert leaf.shape[0] == n - 1

    def test_roundtrip(self, unrolled):
        params, _ = unrolled
        back = params_from_scan(params_to_scan(params, CFG), CFG)
        jax.tree.map(np.testing.assert_array_equal, params, back)


class TestEquivalence:
    def test_eval_forward_identical(self, unrolled):
        params, state = unrolled
        ref, _ = jax.jit(lambda p, s, x: resnet_apply(
            p, s, x, cfg=CFG, train=False, policy=DEFAULT_POLICY))(
            params, state, _images())
        got, _ = jax.jit(lambda p, s, x: resnet_apply(
            p, s, x, cfg=SCAN_CFG, train=False, policy=DEFAULT_POLICY))(
            params_to_scan(params, CFG), params_to_scan(state, CFG),
            _images())
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.slow
    def test_train_loss_grads_and_bn_state_match(self, unrolled):
        """Same loss, same gradients (converted back), same BN updates —
        the scan transpose and stacked-state flow are exact."""
        params, state = unrolled
        x = _images()
        labels = jnp.array([1, 3])

        def loss_fn(cfg):
            def f(p, s):
                logits, ns = resnet_apply(p, s, x, cfg=cfg, train=True,
                                          policy=DEFAULT_POLICY)
                onehot = jax.nn.one_hot(labels, cfg.num_classes)
                return -jnp.mean(jnp.sum(
                    onehot * jax.nn.log_softmax(logits), -1)), ns
            return jax.jit(jax.value_and_grad(f, has_aux=True))

        (ref_loss, ref_ns), ref_g = loss_fn(CFG)(params, state)
        (got_loss, got_ns), got_g = loss_fn(SCAN_CFG)(
            params_to_scan(params, CFG), params_to_scan(state, CFG))

        np.testing.assert_allclose(float(got_loss), float(ref_loss),
                                   rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
            params_from_scan(got_g, CFG), ref_g)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
            params_from_scan(got_ns, CFG), ref_ns)

    @pytest.mark.slow
    def test_dropblock_and_bf16_path_runs(self):
        """The stochastic stack (DropBlock keys as scan xs) under bf16."""
        cfg = dataclasses.replace(SCAN_CFG, use_dropblock=True,
                                  dropblock_keep_prob=0.8)
        params, state = jax.jit(lambda k: resnet_init(k, cfg))(
            jax.random.key(1))
        base = jax.random.key(2)

        def rng(name):
            return jax.random.fold_in(base, hash(name) % (2 ** 31))

        logits, ns = jax.jit(lambda p, s, x: resnet_apply(
            p, s, x, cfg=cfg, train=True, policy=BF16_POLICY, rng=rng,
            progress=0.5))(params, state, _images())
        assert bool(jnp.all(jnp.isfinite(logits)))
        assert jax.tree.structure(ns) == jax.tree.structure(state)

    @pytest.mark.slow
    def test_remat_composes(self):
        cfg = dataclasses.replace(SCAN_CFG, remat="blocks")
        params, state = jax.jit(lambda k: resnet_init(k, cfg))(
            jax.random.key(3))

        def f(p):
            logits, _ = resnet_apply(p, state, _images(), cfg=cfg,
                                     train=True, policy=DEFAULT_POLICY)
            return jnp.sum(logits ** 2)

        g = jax.jit(jax.grad(f))(params)
        assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))
