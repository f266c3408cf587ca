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


# ---------------------------------------------------------------------------
# assembled-variant reconstruction (VERDICT r1 missing #4): ResNet-D stem &
# shortcut, SK unit, SE block, BlurPool 'sconv' — raw TF ops, our weights
# ---------------------------------------------------------------------------

def _tf_conv_dil(x, w, stride, dilation=1):
    k = int(w.shape[0])
    eff = dilation * (k - 1) + 1
    pad_total = eff - 1
    beg = pad_total // 2
    x = tf.pad(x, [[0, 0], [beg, pad_total - beg], [beg, pad_total - beg], [0, 0]])
    return tf.nn.conv2d(x, w, strides=[1, stride, stride, 1], padding="VALID",
                        dilations=[1, dilation, dilation, 1])


def _tf_blurpool(x):
    from axcnn.ops.blurpool import blur_kernel

    c = int(x.shape[-1])
    k = blur_kernel(3)  # (3,3) binomial/16
    w = np.tile(k[:, :, None, None], (1, 1, c, 1)).astype(np.float32)  # HWC1
    x = tf.pad(x, [[0, 0], [1, 1], [1, 1], [0, 0]])
    return tf.nn.depthwise_conv2d(x, w, strides=[1, 2, 2, 1], padding="VALID")


def _tf_se(x, p):
    z = tf.reduce_mean(x, axis=[1, 2])
    h = tf.nn.relu(tf.matmul(z, p["w1"]) + p["b1"])
    gate = tf.sigmoid(tf.matmul(h, p["w2"]) + p["b2"])
    return x * gate[:, None, None, :]


def _tf_sk(x, p, s, stride):
    out_ch = int(p["conv0"]["w"].shape[-1])
    branches = []
    for b in range(2):
        h = _tf_conv_dil(x, p[f"conv{b}"]["w"], stride, dilation=b + 1)
        branches.append(tf.nn.relu(_tf_bn(h, p[f"bn{b}"], s[f"bn{b}"])))
    u = branches[0] + branches[1]
    z = tf.reduce_mean(u, axis=[1, 2])
    z = tf.matmul(z, p["fc_z"]["w"])
    z = tf.nn.relu(_tf_bn(z, p["bn_z"], s["bn_z"]))
    logits = tf.matmul(z, p["fc_select"]["w"]) + p["fc_select"]["b"]
    attn = tf.nn.softmax(tf.reshape(logits, [-1, 2, out_ch]), axis=1)
    return branches[0] * attn[:, 0, None, None, :] + \
        branches[1] * attn[:, 1, None, None, :]


def _tf_assembled_block(x, bp, bs, stride):
    shortcut = x
    if "proj_conv" in bp:
        if stride > 1:  # ResNet-D: avgpool 2x2/2 SAME then 1x1 conv stride 1
            shortcut = tf.nn.avg_pool2d(shortcut, ksize=stride, strides=stride,
                                        padding="SAME")
        shortcut = _tf_conv(shortcut, bp["proj_conv"]["w"], 1)
        shortcut = _tf_bn(shortcut, bp["proj_bn"], bs["proj_bn"])
    h = tf.nn.relu(_tf_bn(_tf_conv(x, bp["conv1"]["w"], 1), bp["bn1"], bs["bn1"]))
    # anti_alias 'sconv': SK unit runs at stride 1, BlurPool takes the stride
    h = _tf_sk(h, bp["sk"], bs["sk"], 1)
    if stride > 1:
        h = _tf_blurpool(h)
    h = _tf_bn(_tf_conv(h, bp["conv3"]["w"], 1), bp["bn3"], bs["bn3"])
    h = _tf_se(h, bp["se"])
    return tf.nn.relu(h + shortcut)


def _tf_assembled_resnet(x, params, state, blocks):
    h = x
    for i in range(3):  # ResNet-D deep stem
        h = _tf_conv(h, params["stem"][f"conv{i}"]["w"], 2 if i == 0 else 1)
        h = tf.nn.relu(_tf_bn(h, params["stem"][f"bn{i}"], state["stem"][f"bn{i}"]))
    h = tf.nn.max_pool2d(h, ksize=3, strides=2, padding="SAME")
    for s in range(4):
        sp, ss = params[f"stage{s + 1}"], state[f"stage{s + 1}"]
        for b in range(blocks[s]):
            stride = 2 if (s > 0 and b == 0) else 1
            h = _tf_assembled_block(h, sp[f"block{b}"], ss[f"block{b}"], stride)
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

    def test_assembled_r50_logits_match_tf(self):
        """Config-3 model (ResNet-D + SK + SE + BlurPool sconv): our forward
        vs the raw-TF-ops reconstruction sharing our weights. Extends the
        'bitwise-comparable top-1' pin beyond vanilla (VERDICT r1 #5)."""
        cfg = ModelConfig(resnet_size=50, num_classes=13, use_resnet_d=True,
                          use_se_block=True, use_sk_block=True,
                          anti_alias_type="sconv", zero_gamma=True)
        params, state = resnet_init(jax.random.key(2), cfg)
        # non-trivial BN stats + nonzero gammas (zero-gamma init would zero
        # out every residual branch and mask wiring bugs)
        state = jax.tree.map(
            lambda x: x + 0.1 * jnp.arange(x.size, dtype=x.dtype).reshape(x.shape)
            / max(x.size, 1), state)
        params = jax.tree.map(
            lambda x: x + 0.05 * (x == 0.0).astype(x.dtype), params)
        x = np.asarray(jax.random.normal(jax.random.key(3), (2, 64, 64, 3)),
                       np.float32)

        ours = np.asarray(resnet_apply(params, state, x, cfg=cfg, train=False)[0])

        np_params = jax.tree.map(lambda t: np.asarray(t, np.float32), params)
        np_state = jax.tree.map(lambda t: np.asarray(t, np.float32), state)
        theirs = _tf_assembled_resnet(tf.constant(x), np_params, np_state,
                                      cfg.blocks).numpy()

        assert ours.shape == theirs.shape
        np.testing.assert_allclose(ours, theirs, atol=3e-3, rtol=1e-3)
