"""Corruption generators + ImageNet-C builder CLI (SURVEY.md §3.4 —
self-contained regeneration of the benchmark the reference assumes on disk)."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from axcnn.data.corruptions import CORRUPTION_FNS, corrupt
from axcnn.data.build_imagenet_c import build_corrupted_set, main as build_main
from axcnn.data.tfrecord import (TFRecordReader, TFRecordWriter, list_shards,
                                 make_example, parse_example)
from axcnn.eval.imagenet_c import CORRUPTIONS


def _img(seed=0, size=96):
    rng = np.random.default_rng(seed)
    # structured content (gradient + stripes), not pure noise — blur/contrast
    # corruptions are near-invisible on white noise
    yy, xx = np.mgrid[0:size, 0:size]
    base = np.stack([yy * 255 // size, xx * 255 // size,
                     ((yy // 8) % 2) * 200], axis=-1)
    return (base + rng.integers(0, 40, base.shape)).clip(0, 255).astype(np.uint8)


class TestCorruptions:
    def test_covers_all_benchmark_names(self):
        assert set(CORRUPTION_FNS) == set(CORRUPTIONS)

    @pytest.mark.parametrize("name", sorted(CORRUPTION_FNS))
    def test_shape_dtype_and_changes_pixels(self, name):
        img = _img()
        for sev in (1, 5):
            out = corrupt(img, name, sev, np.random.default_rng(7))
            assert out.shape == img.shape and out.dtype == np.uint8
            assert np.any(out != img), f"{name}@{sev} is a no-op"

    def test_deterministic_given_rng(self):
        img = _img(1)
        for name in ("gaussian_noise", "glass_blur", "snow", "fog",
                     "elastic_transform", "frost", "motion_blur"):
            a = corrupt(img, name, 3, np.random.default_rng(11))
            b = corrupt(img, name, 3, np.random.default_rng(11))
            np.testing.assert_array_equal(a, b)

    def test_severity_orders_damage(self):
        """Higher severity must move pixels further (monotone families)."""
        img = _img(2, size=128)
        for name in ("gaussian_noise", "shot_noise", "impulse_noise",
                     "defocus_blur", "contrast", "brightness"):
            deltas = [
                np.abs(corrupt(img, name, s, np.random.default_rng(3))
                       .astype(np.int32) - img.astype(np.int32)).mean()
                for s in (1, 3, 5)]
            assert deltas[0] < deltas[1] < deltas[2], (name, deltas)
        # pixelate's L1 damage is phase-sensitive on periodic patterns
        # (aliasing), so only the endpoints are ordered
        deltas = [
            np.abs(corrupt(img, "pixelate", s).astype(np.int32)
                   - img.astype(np.int32)).mean() for s in (1, 5)]
        assert deltas[0] < deltas[1], ("pixelate", deltas)

    def test_non_spatial_corruptions_preserve_rectangles(self):
        # noise/digital corruptions work on non-square inputs too
        img = np.asarray(_img(4, 64))[:48]  # 48x64
        for name in ("gaussian_noise", "contrast", "jpeg_compression",
                     "pixelate", "fog", "frost", "defocus_blur"):
            out = corrupt(img, name, 2, np.random.default_rng(5))
            assert out.shape == img.shape

    def test_input_validation(self):
        img = _img()
        with pytest.raises(ValueError, match="unknown corruption"):
            corrupt(img, "nope", 1)
        with pytest.raises(ValueError, match="severity"):
            corrupt(img, "fog", 0)
        with pytest.raises(ValueError, match="uint8"):
            corrupt(img.astype(np.float32), "fog", 1)


def _write_clean(d, n=5, size=(140, 180), prefix="validation", shards=2):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    per = -(-n // shards)
    idx = 0
    for s in range(shards):
        with TFRecordWriter(
                os.path.join(d, f"{prefix}-{s:05d}-of-{shards:05d}")) as w:
            for _ in range(min(per, n - idx)):
                buf = io.BytesIO()
                Image.fromarray(rng.integers(
                    0, 256, (*size, 3), dtype=np.uint8)).save(buf, "JPEG")
                w.write(make_example({
                    "image/encoded": [buf.getvalue()],
                    "image/class/label": [idx % 3],
                    "image/filename": [f"img{idx}.jpg".encode()],
                }))
                idx += 1


class TestBuildImageNetC:
    def test_layout_labels_and_determinism(self, tmp_path):
        clean = str(tmp_path / "clean")
        _write_clean(clean, n=5)
        out = str(tmp_path / "c")
        total = build_corrupted_set(
            clean, out, image_size=64, resize_min=72,
            corruptions=["gaussian_noise", "pixelate"], severities=[1, 3],
            progress=lambda *_: None)
        assert total == 5 * 2 * 2
        # layout matches run_imagenet_c's expectation
        for name in ("gaussian_noise", "pixelate"):
            for sev in (1, 3):
                shards = list_shards(os.path.join(out, name, str(sev)),
                                     "validation")
                assert len(shards) == 2  # input sharding preserved
                labels, sizes = [], []
                for sh in shards:
                    for payload in TFRecordReader(sh):
                        feats = parse_example(payload)
                        labels.append(feats["image/class/label"][0])
                        img = Image.open(io.BytesIO(
                            bytes(feats["image/encoded"][0])))
                        sizes.append(img.size)
                assert sorted(labels) == [0, 0, 1, 1, 2]
                assert set(sizes) == {(64, 64)}  # cropped then corrupted
        # regeneration is bit-identical (seeded per-record rng)
        out2 = str(tmp_path / "c2")
        build_corrupted_set(clean, out2, image_size=64, resize_min=72,
                            corruptions=["gaussian_noise"], severities=[3],
                            progress=lambda *_: None)
        a = open(os.path.join(out, "gaussian_noise", "3",
                              "validation-00000-of-00002"), "rb").read()
        b = open(os.path.join(out2, "gaussian_noise", "3",
                              "validation-00000-of-00002"), "rb").read()
        assert a == b

    def test_subset_regenerates_full_build_pixels(self, tmp_path):
        """Seeding uses the corruption's STABLE index in CORRUPTION_FNS, not
        its position in the requested subset: regenerating impulse_noise
        alone (subset index 0, stable index 2) must be bit-identical to its
        output from a multi-corruption build."""
        clean = str(tmp_path / "clean")
        _write_clean(clean, n=3, shards=1)
        full = str(tmp_path / "full")
        build_corrupted_set(
            clean, full, image_size=64, resize_min=72,
            corruptions=["gaussian_noise", "shot_noise", "impulse_noise"],
            severities=[2], progress=lambda *_: None)
        sub = str(tmp_path / "sub")
        build_corrupted_set(clean, sub, image_size=64, resize_min=72,
                            corruptions=["impulse_noise"], severities=[2],
                            progress=lambda *_: None)
        a = open(os.path.join(full, "impulse_noise", "2",
                              "validation-00000-of-00001"), "rb").read()
        b = open(os.path.join(sub, "impulse_noise", "2",
                              "validation-00000-of-00001"), "rb").read()
        assert a == b

    def test_parallel_build_is_bit_identical(self, tmp_path):
        """--num_workers fans input shards over a process pool; per-record
        seeds use the precomputed GLOBAL record offset, so every worker
        count produces the same bytes."""
        clean = str(tmp_path / "clean")
        _write_clean(clean, n=5, shards=3)  # uneven shards (2,2,1)
        serial, parallel = str(tmp_path / "s"), str(tmp_path / "p")
        kw = dict(image_size=64, resize_min=72,
                  corruptions=["gaussian_noise", "fog"], severities=[1, 4],
                  progress=lambda *_: None)
        total_s = build_corrupted_set(clean, serial, num_workers=1, **kw)
        total_p = build_corrupted_set(clean, parallel, num_workers=3, **kw)
        assert total_s == total_p == 5 * 2 * 2
        for name in ("gaussian_noise", "fog"):
            for sev in (1, 4):
                for si in range(3):
                    rel = os.path.join(name, str(sev),
                                       f"validation-{si:05d}-of-00003")
                    assert (open(os.path.join(serial, rel), "rb").read()
                            == open(os.path.join(parallel, rel), "rb").read()
                            ), rel

    def test_cli_and_eval_loader_roundtrip(self, tmp_path):
        """CLI output feeds the stored-pixel eval loader unchanged."""
        from axcnn.data.datasets import DatasetInfo
        from axcnn.data.pipeline import TFRecordImageLoader

        clean = str(tmp_path / "clean")
        _write_clean(clean, n=4, shards=1)
        out = str(tmp_path / "c")
        build_main(["--data_dir", clean, "--output_dir", out,
                    "--image_size", "64", "--resize_min", "72",
                    "--corruptions", "contrast", "--severities", "5",
                    "--jpeg_quality", "100"])
        d = os.path.join(out, "contrast", "5")
        info = DatasetInfo("tiny", 3, 4, 4, train_prefix="validation",
                           eval_prefix="validation")
        loader = TFRecordImageLoader(d, info, batch_size=4, train=False,
                                     image_size=64, resize_min=64,
                                     drop_remainder=False, num_workers=1)
        batch = next(iter(loader))
        assert batch["images"].shape == (4, 64, 64, 3)
        # stored-pixel protocol: loader pixels == JPEG-decoded stored pixels
        payload = next(iter(TFRecordReader(list_shards(d, "validation")[0])))
        stored = np.asarray(Image.open(io.BytesIO(
            bytes(parse_example(payload)["image/encoded"][0]))).convert("RGB"))
        assert any(np.array_equal(np.asarray(batch["images"][i]), stored)
                   for i in range(4))
