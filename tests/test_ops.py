"""Numerics goldens for the op library (SURVEY.md §4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from axcnn.ops.conv import conv_init, conv_apply, fixed_pad_amounts
from axcnn.ops.norm import bn_init, bn_apply
from axcnn.ops.pooling import max_pool_same, avg_pool, global_avg_pool
from axcnn.ops.blurpool import blur_kernel, blur_pool
from axcnn.ops.se import se_init, se_apply
from axcnn.ops.sk import sk_init, sk_apply
from axcnn.ops.dropblock import dropblock, dropblock_keep_prob


class TestConv:
    def test_fixed_padding_amounts(self):
        assert fixed_pad_amounts(3) == (1, 1)
        assert fixed_pad_amounts(7) == (3, 3)
        assert fixed_pad_amounts(1) == (0, 0)
        # dilation-2 3x3 has a 5x5 receptive field
        assert fixed_pad_amounts(3, dilation=2) == (2, 2)

    def test_shapes_stride(self):
        key = jax.random.key(0)
        p = conv_init(key, 3, 8, 16)
        x = jnp.ones((2, 9, 9, 8))
        # stride 1 keeps size; stride 2 = ceil(9/2)=5 (TF fixed-padding parity)
        assert conv_apply(p, x, stride=1).shape == (2, 9, 9, 16)
        assert conv_apply(p, x, stride=2).shape == (2, 5, 5, 16)

    def test_identity_kernel_golden(self):
        # a 3x3 kernel with center=1 must reproduce the input exactly
        w = np.zeros((3, 3, 4, 4), np.float32)
        for c in range(4):
            w[1, 1, c, c] = 1.0
        x = jax.random.normal(jax.random.key(1), (2, 6, 6, 4))
        y = conv_apply({"w": jnp.asarray(w)}, x, stride=1)
        np.testing.assert_allclose(y, x, atol=1e-6)

    def test_matches_manual_valid_conv(self):
        # explicit-padding conv == numpy direct conv with zero padding
        key = jax.random.key(2)
        p = conv_init(key, 3, 2, 3)
        x = np.asarray(jax.random.normal(jax.random.key(3), (1, 5, 5, 2)))
        w = np.asarray(p["w"])
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        ref = np.zeros((1, 5, 5, 3), np.float32)
        for i in range(5):
            for j in range(5):
                patch = xp[0, i:i + 3, j:j + 3, :]
                ref[0, i, j] = np.tensordot(patch, w, axes=([0, 1, 2], [0, 1, 2]))
        y = conv_apply(p, jnp.asarray(x), stride=1)
        np.testing.assert_allclose(y, ref, atol=1e-4)


class TestBatchNorm:
    def test_train_normalizes(self):
        params, state = bn_init(4)
        x = jax.random.normal(jax.random.key(0), (8, 6, 6, 4)) * 3.0 + 5.0
        y, new_state = bn_apply(params, state, x, train=True)
        np.testing.assert_allclose(np.mean(np.asarray(y), axis=(0, 1, 2)), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.std(np.asarray(y), axis=(0, 1, 2)), 1.0, atol=1e-3)
        # moving stats moved toward batch stats with momentum 0.997
        assert np.all(np.asarray(new_state["mean"]) > 0)

    def test_moving_stats_update_rule(self):
        params, state = bn_init(2)
        x = jnp.ones((4, 2, 2, 2)) * 10.0
        _, ns = bn_apply(params, state, x, train=True, momentum=0.9)
        np.testing.assert_allclose(ns["mean"], 0.0 * 0.9 + 10.0 * 0.1, atol=1e-6)
        np.testing.assert_allclose(ns["var"], 1.0 * 0.9 + 0.0 * 0.1, atol=1e-6)

    def test_eval_uses_moving_stats(self):
        params, state = bn_init(2)
        state = {"mean": jnp.array([1.0, 2.0]), "var": jnp.array([4.0, 9.0])}
        x = jnp.ones((1, 1, 1, 2))
        y, ns = bn_apply(params, state, x, train=False, eps=0.0)
        np.testing.assert_allclose(y[0, 0, 0], [(1 - 1) / 2, (1 - 2) / 3], atol=1e-5)
        assert ns is state

    def test_zero_gamma(self):
        params, state = bn_init(3, zero_gamma=True)
        x = jax.random.normal(jax.random.key(0), (2, 4, 4, 3))
        y, _ = bn_apply(params, state, x, train=True)
        np.testing.assert_allclose(y, 0.0, atol=1e-6)

    def test_bf16_activations_fp32_stats(self):
        params, state = bn_init(4)
        x = jax.random.normal(jax.random.key(0), (8, 6, 6, 4)).astype(jnp.bfloat16)
        y, ns = bn_apply(params, state, x, train=True)
        assert y.dtype == jnp.bfloat16
        assert ns["mean"].dtype == jnp.float32


class TestPooling:
    def test_max_pool_same_shape(self):
        x = jax.random.normal(jax.random.key(0), (2, 112, 112, 64))
        assert max_pool_same(x, window=3, stride=2).shape == (2, 56, 56, 64)

    def test_max_pool_golden(self):
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        y = max_pool_same(x, window=3, stride=2)
        # TF SAME 3x3/2 on 4x4 → 2x2: windows centered per TF pad rules
        np.testing.assert_allclose(y[0, :, :, 0], [[10.0, 11.0], [14.0, 15.0]])

    def test_avg_pool_even(self):
        x = jnp.arange(16.0).reshape(1, 4, 4, 1)
        y = avg_pool(x, window=2, stride=2)
        np.testing.assert_allclose(y[0, :, :, 0], [[2.5, 4.5], [10.5, 12.5]])

    def test_gap(self):
        x = jnp.ones((2, 7, 7, 3)) * 2.0
        np.testing.assert_allclose(global_avg_pool(x), 2.0)


class TestBlurPool:
    def test_kernel_golden(self):
        k = blur_kernel(3)
        np.testing.assert_allclose(k, np.outer([1, 2, 1], [1, 2, 1]) / 16.0)
        k5 = blur_kernel(5)
        np.testing.assert_allclose(k5, np.outer([1, 4, 6, 4, 1], [1, 4, 6, 4, 1]) / 256.0)
        np.testing.assert_allclose(k5.sum(), 1.0, atol=1e-7)

    def test_constant_preserved_interior(self):
        # a constant image stays constant away from borders (low-pass, DC gain 1)
        x = jnp.ones((1, 8, 8, 4)) * 3.0
        y = blur_pool(x, stride=2, filter_size=3)
        assert y.shape == (1, 4, 4, 4)
        np.testing.assert_allclose(y[0, 1:3, 1:3, :], 3.0, atol=1e-6)

    def test_depthwise_channels_independent(self):
        x = np.zeros((1, 8, 8, 2), np.float32)
        x[0, :, :, 0] = 1.0  # channel 1 stays zero
        y = blur_pool(jnp.asarray(x), stride=2)
        assert np.all(np.asarray(y)[..., 1] == 0.0)
        assert np.any(np.asarray(y)[..., 0] > 0.0)


class TestSE:
    def test_shapes_and_range(self):
        p = se_init(jax.random.key(0), 64, ratio=16)
        assert p["w1"].shape == (64, 4)
        x = jax.random.normal(jax.random.key(1), (2, 8, 8, 64))
        y = se_apply(p, x)
        assert y.shape == x.shape
        # gate is sigmoid-bounded: |y| <= |x|
        assert np.all(np.abs(np.asarray(y)) <= np.abs(np.asarray(x)) + 1e-6)

    def test_zero_weights_give_half_gate(self):
        p = se_init(jax.random.key(0), 8, ratio=4)
        p = jax.tree.map(jnp.zeros_like, p)
        x = jnp.ones((1, 2, 2, 8))
        y = se_apply(p, x)
        np.testing.assert_allclose(y, 0.5, atol=1e-6)


class TestSK:
    def test_shapes_stride(self):
        p, s = sk_init(jax.random.key(0), 32, 32)
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 32))
        y, ns = sk_apply(p, s, x, stride=1, train=False)
        assert y.shape == (2, 16, 16, 32)
        y2, _ = sk_apply(p, s, x, stride=2, train=False)
        assert y2.shape == (2, 8, 8, 32)

    def test_attention_sums_to_one(self):
        # with equal branches, attention weights are a convex combo:
        # y must lie between min and max of branches; test via ReLU positivity
        p, s = sk_init(jax.random.key(0), 8, 8)
        x = jax.random.normal(jax.random.key(1), (2, 8, 8, 8))
        y, _ = sk_apply(p, s, x, stride=1, train=True)
        assert np.all(np.asarray(y) >= -1e-6)  # convex combo of ReLU outputs

    def test_state_updates_in_train(self):
        p, s = sk_init(jax.random.key(0), 8, 8)
        x = jax.random.normal(jax.random.key(1), (2, 8, 8, 8)) + 4.0
        _, ns = sk_apply(p, s, x, stride=1, train=True)
        assert not np.allclose(np.asarray(ns["bn0"]["mean"]), 0.0)

    def test_merged_kernel_conv_equivalent(self):
        # the one-5x5-conv execution path (sk_merged_conv) is tap-for-tap
        # identical to the two separate branch convs — the extra kernel
        # positions contract exact zeros — for both strides. Tolerance is
        # fp32 reassociation only (45- vs 9-tap contraction order).
        from axcnn.ops.conv import conv_apply
        from axcnn.ops.sk import _merged_sk_kernel

        p, _ = sk_init(jax.random.key(0), 16, 16)
        w0, w1 = p["conv0"]["w"], p["conv1"]["w"]
        x = jax.random.normal(jax.random.key(1), (2, 12, 12, 16))
        for stride in (1, 2):
            a0 = conv_apply({"w": w0}, x, stride=stride, dilation=1)
            a1 = conv_apply({"w": w1}, x, stride=stride, dilation=2)
            m = conv_apply({"w": _merged_sk_kernel(w0, w1)}, x, stride=stride)
            np.testing.assert_allclose(np.asarray(m[..., :16]),
                                       np.asarray(a0), rtol=2e-5, atol=2e-6)
            np.testing.assert_allclose(np.asarray(m[..., 16:]),
                                       np.asarray(a1), rtol=2e-5, atol=2e-6)

    def test_merged_block_equivalent(self):
        # full SK block, merged vs separate: train-mode BN normalization
        # amplifies the conv's ~1e-6 reassociation noise (rsqrt of batch
        # variance), so the block-level bound is looser by design
        p, s = sk_init(jax.random.key(0), 16, 16)
        x = jax.random.normal(jax.random.key(1), (2, 12, 12, 16))
        for stride in (1, 2):
            for train in (False, True):
                y, ns = sk_apply(p, s, x, stride=stride, train=train)
                ym, nsm = sk_apply(p, s, x, stride=stride, train=train,
                                   merged=True)
                np.testing.assert_allclose(np.asarray(ym), np.asarray(y),
                                           rtol=5e-3, atol=5e-3)
                np.testing.assert_allclose(
                    np.asarray(nsm["bn0"]["mean"]),
                    np.asarray(ns["bn0"]["mean"]), rtol=1e-4, atol=1e-5)


class TestDropBlock:
    def test_eval_noop(self):
        x = jax.random.normal(jax.random.key(0), (2, 14, 14, 8))
        y = dropblock(jax.random.key(1), x, keep_prob=0.5, train=False)
        assert y is x

    def test_keep_prob_one_noop(self):
        x = jax.random.normal(jax.random.key(0), (2, 14, 14, 8))
        y = dropblock(jax.random.key(1), x, keep_prob=1.0, train=True)
        np.testing.assert_allclose(y, x, atol=1e-6)

    def test_drops_blocks_and_rescales(self):
        x = jnp.ones((4, 28, 28, 16))
        y = np.asarray(dropblock(jax.random.key(3), x, keep_prob=0.8,
                                 block_size=7, train=True))
        zeros = (y == 0).mean()
        assert 0.02 < zeros < 0.6  # some blocks dropped
        # expectation preserved by rescale
        assert abs(y.mean() - 1.0) < 0.05

    def test_schedule(self):
        np.testing.assert_allclose(dropblock_keep_prob(0.0, 0.9), 1.0)
        np.testing.assert_allclose(dropblock_keep_prob(1.0, 0.9), 0.9)
        np.testing.assert_allclose(dropblock_keep_prob(0.5, 0.9), 0.95)
