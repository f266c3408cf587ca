"""Serving export round-trip (SURVEY.md §2 item 10 equivalent)."""

import numpy as np
import pytest

import jax

from axcnn.ckpt.export import export_serving, load_serving
from axcnn.core.dtypes import DEFAULT_POLICY
from axcnn.models.resnet import ModelConfig, resnet_init, resnet_apply
from axcnn.data.preprocessing import normalize_device

# StableHLO export/reload round-trips — release tier; `-m 'not slow'` is the dev loop
pytestmark = pytest.mark.slow


class TestExport:
    def test_roundtrip_matches_direct(self, tmp_path):
        cfg = ModelConfig(resnet_size=50, num_classes=12, use_resnet_d=True,
                          use_se_block=True)
        params, state = resnet_init(jax.random.key(0), cfg)
        path = str(tmp_path / "export")
        export_serving(path, cfg, params, state, batch_size=2, image_size=64)

        fn, meta = load_serving(path)
        assert meta["model_config"]["num_classes"] == 12
        images = np.random.default_rng(0).integers(
            0, 256, (2, 64, 64, 3), dtype=np.uint8)
        got = np.asarray(fn(images))

        want = np.asarray(resnet_apply(
            params, state, normalize_device(images), cfg=cfg, train=False,
            policy=DEFAULT_POLICY)[0])
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_int8_export_roundtrip(self, tmp_path):
        """The int8 PTQ serving policy bakes quantization into the StableHLO
        graph: the reloaded fn must reproduce the direct quantized forward
        (and the metadata must say the export is quantized)."""
        from axcnn.core.dtypes import INT8_SERVING_POLICY

        cfg = ModelConfig(resnet_size=50, num_classes=7, use_resnet_d=True,
                          width_multiplier=0.25)
        params, state = resnet_init(jax.random.key(1), cfg)
        path = str(tmp_path / "export8")
        export_serving(path, cfg, params, state, batch_size=2, image_size=64,
                       policy=INT8_SERVING_POLICY)
        fn, meta = load_serving(path)
        assert meta["quantized_int8"] is True
        images = np.random.default_rng(1).integers(
            0, 256, (2, 64, 64, 3), dtype=np.uint8)
        got = np.asarray(fn(images), np.float32)
        want = np.asarray(resnet_apply(
            params, state, normalize_device(images), cfg=cfg, train=False,
            policy=INT8_SERVING_POLICY)[0], np.float32)
        # exported vs direct are SEPARATE XLA compilations of the same
        # quantized graph: 1-ulp reassociation drift in the dynamic max
        # reductions can flip round() boundaries, so the contract is
        # close-in-norm + same predictions, not bitwise logits
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 0.05, rel
        np.testing.assert_array_equal(got.argmax(-1), want.argmax(-1))

    def test_export_files(self, tmp_path):
        cfg = ModelConfig(resnet_size=50, num_classes=3)
        params, state = resnet_init(jax.random.key(0), cfg)
        path = str(tmp_path / "e2")
        export_serving(path, cfg, params, state, batch_size=1, image_size=32)
        import os

        assert os.path.exists(os.path.join(path, "serving.stablehlo"))
        assert os.path.exists(os.path.join(path, "config.json"))
        assert os.path.isdir(os.path.join(path, "params"))
