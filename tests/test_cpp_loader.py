"""Native (C++) loader tests: decode parity vs PIL, loader integration,
determinism, corrupt-record handling (SURVEY.md §2.9 native inventory)."""

import io

import numpy as np
import pytest
from PIL import Image

from axcnn.data import cpp_loader
from axcnn.data.tfrecord import make_example

if not cpp_loader.available():
    pytest.skip("native loader unavailable (no g++/libjpeg)", allow_module_level=True)


def _jpeg(rng, w=160, h=120, quality=95):
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


class TestNativeDecode:
    def test_jpeg_bit_exact_vs_pil(self):
        rng = np.random.default_rng(0)
        for q in (70, 95):
            jpg = _jpeg(rng, quality=q)
            native = cpp_loader.decode_jpeg_native(jpg)
            pil = np.asarray(Image.open(io.BytesIO(jpg)).convert("RGB"))
            np.testing.assert_array_equal(native, pil)

    def test_batch_shapes_and_labels(self):
        rng = np.random.default_rng(1)
        payloads = [make_example({"image/encoded": [_jpeg(rng)],
                                  "image/class/label": [i + 5]})
                    for i in range(4)]
        imgs, labels, ok = cpp_loader.decode_batch(
            payloads, image_size=48, resize_min=56, train=False,
            seeds=range(4), num_threads=2)
        assert ok == 4
        assert imgs.shape == (4, 48, 48, 3)
        assert labels.tolist() == [5, 6, 7, 8]

    def test_train_deterministic_per_seed(self):
        rng = np.random.default_rng(2)
        payloads = [make_example({"image/encoded": [_jpeg(rng)],
                                  "image/class/label": [0]})] * 3
        a = cpp_loader.decode_batch(payloads, image_size=32, resize_min=40,
                                    train=True, seeds=[7, 7, 8])[0]
        b = cpp_loader.decode_batch(payloads, image_size=32, resize_min=40,
                                    train=True, seeds=[7, 7, 8])[0]
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a[0], a[1])  # same seed, same record
        assert not np.array_equal(a[0], a[2])      # different seed

    def test_eval_close_to_pil_path(self):
        # same resize-shorter-side + center-crop geometry; bilinear kernels
        # match PIL's half-pixel convention → images should be very close
        from axcnn.data.preprocessing import preprocess_eval

        rng = np.random.default_rng(3)
        # use a smooth image (random noise maximizes resampler disagreement)
        x = np.linspace(0, 255, 160, dtype=np.float32)
        arr = np.stack([np.tile(x, (120, 1))] * 3, -1).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=98)
        jpg = buf.getvalue()
        payloads = [make_example({"image/encoded": [jpg],
                                  "image/class/label": [1]})]
        native = cpp_loader.decode_batch(payloads, image_size=64, resize_min=72,
                                         train=False, seeds=[0])[0][0]
        pil = preprocess_eval(jpg, image_size=64, resize_min=72)
        diff = np.abs(native.astype(int) - pil.astype(int))
        assert diff.mean() < 3.0, diff.mean()

    def test_corrupt_record(self):
        imgs, labels, ok = cpp_loader.decode_batch(
            [b"not a proto"], image_size=32, resize_min=40, train=False,
            seeds=[0])
        assert ok == 0 and labels[0] == -1 and imgs.sum() == 0

    def test_dct_fast_decodes_differently(self):
        """--dct_method=INTEGER_FAST (JDCT_IFAST): valid decode, different
        pixels than INTEGER_ACCURATE — the knob must actually reach libjpeg."""
        rng = np.random.default_rng(4)
        payloads = [make_example({"image/encoded": [_jpeg(rng, quality=80)],
                                  "image/class/label": [1]})]
        kw = dict(image_size=48, resize_min=56, train=False, seeds=[0])
        slow = cpp_loader.decode_batch(payloads, **kw)
        fast = cpp_loader.decode_batch(payloads, dct_fast=True, **kw)
        assert slow[2] == fast[2] == 1
        assert not np.array_equal(slow[0], fast[0])
        # but they are decodes of the same image: small mean difference
        diff = np.abs(slow[0].astype(int) - fast[0].astype(int))
        assert diff.mean() < 4.0


class TestLoaderIntegration:
    def test_native_loader_end_to_end(self, tmp_path):
        from tests.test_data import _make_dataset
        from axcnn.data.pipeline import TFRecordImageLoader

        data_dir, info = _make_dataset(tmp_path)
        loader = TFRecordImageLoader(
            data_dir, info, batch_size=8, train=True, image_size=32,
            seed=5, num_workers=2, use_native=True)
        it = iter(loader)
        b1, b2 = next(it), next(it)
        assert b1["images"].shape == (8, 32, 32, 3)
        assert not np.array_equal(b1["images"], b2["images"])
        # deterministic across loader instances
        loader2 = TFRecordImageLoader(
            data_dir, info, batch_size=8, train=True, image_size=32,
            seed=5, num_workers=2, use_native=True)
        b1b = next(iter(loader2))
        np.testing.assert_array_equal(b1["images"], b1b["images"])
        np.testing.assert_array_equal(b1["labels"], b1b["labels"])

    def test_native_falls_back_for_non_jpeg(self, tmp_path):
        """build_tfrecords accepts .png/.bmp; the C++ decoder is JPEG-only, so
        those slots must be re-decoded via PIL — never fed to training as
        zero images with label -1 (ADVICE r1)."""
        from axcnn.data.pipeline import TFRecordImageLoader
        from axcnn.data.tfrecord import TFRecordWriter
        from axcnn.data.datasets import DatasetInfo

        rng = np.random.default_rng(5)
        d = tmp_path / "rec"
        d.mkdir()
        with TFRecordWriter(str(d / "train-00000-of-00001")) as w:
            for i in range(8):
                if i == 3:
                    buf = io.BytesIO()
                    Image.fromarray(rng.integers(
                        0, 256, (40, 40, 3), dtype=np.uint8)).save(buf, "PNG")
                    enc = buf.getvalue()
                else:
                    enc = _jpeg(rng, 40, 40)
                w.write(make_example({"image/encoded": [enc],
                                      "image/class/label": [i % 4]}))
        info = DatasetInfo("mixed", num_classes=5, num_train=8, num_eval=8,
                           train_prefix="train", eval_prefix="train")
        loader = TFRecordImageLoader(
            str(d), info, batch_size=8, train=False, image_size=32,
            num_workers=2, use_native=True, drop_remainder=False)
        batch = next(iter(loader))
        assert batch["labels"].tolist() == [0, 1, 2, 3, 0, 1, 2, 3]
        assert batch["images"][3].sum() > 0  # the PNG slot got real pixels

    def test_same_labels_as_python_path(self, tmp_path):
        from tests.test_data import _make_dataset
        from axcnn.data.pipeline import TFRecordImageLoader

        data_dir, info = _make_dataset(tmp_path)
        kw = dict(batch_size=8, train=True, image_size=32, seed=5, num_workers=2)
        nat = next(iter(TFRecordImageLoader(data_dir, info, use_native=True, **kw)))
        py = next(iter(TFRecordImageLoader(data_dir, info, use_native=False, **kw)))
        # identical record order → identical labels (crops differ by RNG impl)
        np.testing.assert_array_equal(nat["labels"], py["labels"])
