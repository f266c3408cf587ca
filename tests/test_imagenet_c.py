"""ImageNet-C mCE evaluation end-to-end on a tiny synthetic corruption tree
(SURVEY.md §3.4)."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from axcnn.data.tfrecord import TFRecordWriter, make_example
from axcnn.eval.imagenet_c import compute_mce, CORRUPTIONS, ALEXNET_ERR
from axcnn.models.resnet import ModelConfig
from axcnn.utils.config import Config, DataConfig, TrainConfig, RuntimeConfig


def _write_split(d, n=6, seed=0):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(seed)
    with TFRecordWriter(os.path.join(d, "validation-00000-of-00001")) as w:
        for i in range(n):
            arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, "JPEG")
            w.write(make_example({
                "image/encoded": [buf.getvalue()],
                "image/class/label": [int(rng.integers(0, 1001))],
            }))


class TestMCEMath:
    def test_all_normalizers_present(self):
        assert set(CORRUPTIONS) == set(ALEXNET_ERR)

    def test_alexnet_baseline_is_100(self):
        out = compute_mce(dict(ALEXNET_ERR))
        np.testing.assert_allclose(out["mce"], 100.0, rtol=1e-6)


class TestImageNetCEndToEnd:
    def test_run_imagenet_c(self, tmp_path):
        from axcnn.eval.imagenet_c import run_imagenet_c

        # two corruptions, two severities each
        for corruption in ("gaussian_noise", "fog"):
            for sev in (1, 2):
                _write_split(str(tmp_path / "c" / corruption / str(sev)),
                             seed=sev)

        cfg = Config(
            model=ModelConfig(resnet_size=50, num_classes=1001),
            data=DataConfig(dataset_name="imagenet_c",
                            data_dir=str(tmp_path / "c"), image_size=64),
            train=TrainConfig(batch_size=4, dtype="fp32", use_ema=False),
            runtime=RuntimeConfig(model_dir=str(tmp_path / "run"),
                                  num_devices=1, eval_imagenet_c=True),
        )
        result = run_imagenet_c(cfg)
        assert "mce" in result
        assert "ce/gaussian_noise" in result and "ce/fog" in result
        # random model on 1001 classes: error ~1.0 → CE ~ 1/alexnet_err
        assert result["ce/gaussian_noise"] > 50.0
        body = open(os.path.join(cfg.runtime.model_dir, "metrics.jsonl")).read()
        assert '"tag": "mce"' in body
