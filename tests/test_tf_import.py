"""TF-checkpoint importer tests: write a synthetic TF checkpoint with the
reference's (TF-official) naming scheme, import, check exact values
(SURVEY.md §5.4 / §7.3 "TF checkpoint import")."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax

from axcnn.models.resnet import ModelConfig, resnet_init
from axcnn.ckpt.tf_import import expected_tf_names, import_tf_checkpoint, EMA_SUFFIX


def _write_tf_ckpt(path, names_and_values):
    with tf.Graph().as_default():  # TF1-style checkpoint via compat
        tf_vars = []
        for name, value in names_and_values.items():
            tf_vars.append(tf.compat.v1.get_variable(
                name, initializer=tf.constant(value)))
        saver = tf.compat.v1.train.Saver(var_list=tf_vars)
        with tf.compat.v1.Session() as sess:
            sess.run(tf.compat.v1.global_variables_initializer())
            saver.save(sess, path)


class TestNameGeneration:
    def test_vanilla_r50_counts(self):
        cfg = ModelConfig(resnet_size=50, num_classes=10)
        params, state = resnet_init(jax.random.key(0), cfg)
        entries = expected_tf_names(cfg, params, state)
        convs = [e for e in entries if e[0].endswith("/kernel") and "conv2d" in e[0]]
        # R50: 1 stem + 16 blocks x 3 + 4 projections = 53 convs
        assert len(convs) == 53
        # first conv is the bare name, then numbered
        assert convs[0][0] == "resnet_model/conv2d/kernel"
        assert convs[1][0] == "resnet_model/conv2d_1/kernel"
        dense = [e for e in entries if "dense" in e[0]]
        assert dense[0][0] == "resnet_model/dense/kernel"
        # BNs: one per conv in v1
        bns = [e for e in entries if "batch_normalization" in e[0] and e[0].endswith("gamma")]
        assert len(bns) == 53

    def test_unique_names(self):
        cfg = ModelConfig(use_resnet_d=True, use_se_block=True, use_sk_block=True)
        params, state = resnet_init(jax.random.key(0), cfg)
        entries = expected_tf_names(cfg, params, state)
        names = [e[0] for e in entries]
        assert len(names) == len(set(names))


class TestImport:
    def _roundtrip(self, cfg, tmp_path, use_ema=False):
        params, state = resnet_init(jax.random.key(0), cfg)
        entries = expected_tf_names(cfg, params, state)
        rng = np.random.default_rng(1)
        values = {}
        for tf_name, _, shape in entries:
            values[tf_name] = rng.normal(size=shape).astype(np.float32)
            if use_ema and "moving_" not in tf_name:
                values[tf_name + EMA_SUFFIX] = rng.normal(size=shape).astype(np.float32)
        ckpt = str(tmp_path / "model.ckpt")
        _write_tf_ckpt(ckpt, values)
        new_params, new_state, missing = import_tf_checkpoint(
            ckpt, cfg, params, state, use_ema=use_ema)
        assert not missing
        # spot-check exact value placement
        for tf_name, our_path, _ in entries:
            want = values[tf_name + EMA_SUFFIX] if (
                use_ema and "moving_" not in tf_name) else values[tf_name]
            node = new_state if our_path.endswith("@state") else new_params
            for k in our_path.replace("@state", "").split("/"):
                node = node[k]
            np.testing.assert_array_equal(np.asarray(node), want)
        return new_params, new_state

    def test_vanilla_small(self, tmp_path):
        self._roundtrip(ModelConfig(resnet_size=50, num_classes=7), tmp_path)

    def test_assembled_with_ema(self, tmp_path):
        cfg = ModelConfig(resnet_size=50, num_classes=7, use_resnet_d=True,
                          use_se_block=True, use_sk_block=True,
                          anti_alias_type="sconv")
        self._roundtrip(cfg, tmp_path, use_ema=True)

    def test_shape_mismatch_raises(self, tmp_path):
        cfg = ModelConfig(resnet_size=50, num_classes=7)
        params, state = resnet_init(jax.random.key(0), cfg)
        entries = expected_tf_names(cfg, params, state)
        values = {n: np.zeros(s, np.float32) for n, _, s in entries}
        first = entries[0][0]
        values[first] = np.zeros((1, 1, 1, 1), np.float32)
        ckpt = str(tmp_path / "model.ckpt")
        _write_tf_ckpt(ckpt, values)
        with pytest.raises(ValueError, match="shape mismatch"):
            import_tf_checkpoint(ckpt, cfg, params, state)

    def test_missing_strict(self, tmp_path):
        cfg = ModelConfig(resnet_size=50, num_classes=7)
        params, state = resnet_init(jax.random.key(0), cfg)
        ckpt = str(tmp_path / "model.ckpt")
        _write_tf_ckpt(ckpt, {"resnet_model/conv2d/kernel":
                              np.zeros((7, 7, 3, 64), np.float32)})
        with pytest.raises(KeyError):
            import_tf_checkpoint(ckpt, cfg, params, state, strict=True)
        _, _, missing = import_tf_checkpoint(ckpt, cfg, params, state, strict=False)
        assert len(missing) > 0
