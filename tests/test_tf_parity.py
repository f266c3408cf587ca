"""Cross-framework numerics parity: our vanilla ResNet-50 forward vs the
same network built from TensorFlow ops with TF-official semantics
(conv2d_fixed_padding, SAME maxpool, eval-mode batch_norm), sharing OUR
weights. This pins the padding / BN / pooling conventions that
"bitwise-comparable top-1" (BASELINE.json) depends on — the reference's
semantics ARE TF's (SURVEY.md §7.3 hard-part #1)."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from axcnn.models.resnet import ModelConfig, resnet_init, resnet_apply

BN_EPS = 1e-5


def _tf_fixed_pad(x, k):
    pad_total = k - 1
    beg = pad_total // 2
    end = pad_total - beg
    return tf.pad(x, [[0, 0], [beg, end], [beg, end], [0, 0]])


def _tf_conv(x, w, stride):
    k = w.shape[0]
    x = _tf_fixed_pad(x, k)
    return tf.nn.conv2d(x, w, strides=[1, stride, stride, 1], padding="VALID")


def _tf_bn(x, p, s):
    return tf.nn.batch_normalization(
        x, s["mean"], s["var"], p["beta"], p["gamma"], BN_EPS)


def _tf_block(x, bp, bs, stride):
    shortcut = x
    if "proj_conv" in bp:
        shortcut = _tf_conv(x, bp["proj_conv"]["w"], stride)
        shortcut = _tf_bn(shortcut, bp["proj_bn"], bs["proj_bn"])
    h = tf.nn.relu(_tf_bn(_tf_conv(x, bp["conv1"]["w"], 1), bp["bn1"], bs["bn1"]))
    h = tf.nn.relu(_tf_bn(_tf_conv(h, bp["conv2"]["w"], stride), bp["bn2"], bs["bn2"]))
    h = _tf_bn(_tf_conv(h, bp["conv3"]["w"], 1), bp["bn3"], bs["bn3"])
    return tf.nn.relu(h + shortcut)


def _tf_resnet(x, params, state, blocks):
    h = tf.nn.relu(_tf_bn(_tf_conv(x, params["stem"]["conv0"]["w"], 2),
                          params["stem"]["bn0"], state["stem"]["bn0"]))
    h = tf.nn.max_pool2d(h, ksize=3, strides=2, padding="SAME")
    for s in range(4):
        sp, ss = params[f"stage{s + 1}"], state[f"stage{s + 1}"]
        for b in range(blocks[s]):
            stride = 2 if (s > 0 and b == 0) else 1
            h = _tf_block(h, sp[f"block{b}"], ss[f"block{b}"], stride)
    h = tf.reduce_mean(h, axis=[1, 2])
    head = params["head"]
    return tf.matmul(h, head["w"]) + head["b"]


class TestTFParity:
    def test_vanilla_r50_logits_match_tf(self):
        cfg = ModelConfig(resnet_size=50, num_classes=13)
        params, state = resnet_init(jax.random.key(0), cfg)
        # give moving stats non-trivial values so BN eval math is exercised
        state = jax.tree.map(
            lambda x: x + 0.1 * jnp.arange(x.size, dtype=x.dtype).reshape(x.shape)
            / max(x.size, 1), state)
        x = np.asarray(jax.random.normal(jax.random.key(1), (2, 64, 64, 3)),
                       np.float32)

        ours = np.asarray(resnet_apply(params, state, x, cfg=cfg, train=False)[0])

        np_params = jax.tree.map(lambda t: np.asarray(t, np.float32), params)
        np_state = jax.tree.map(lambda t: np.asarray(t, np.float32), state)
        theirs = _tf_resnet(tf.constant(x), np_params, np_state,
                            cfg.blocks).numpy()

        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-3)
