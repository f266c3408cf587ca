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


class _PinnedRng:
    """Scripted RNG for the PIL ops: pins the sign draw and cutout center so
    C++ and PIL apply the identical transform."""

    def __init__(self, sign=1, center=(10, 12)):
        self._sign = sign
        self._center = list(center)

    def random(self):
        return 0.9 if self._sign > 0 else 0.1  # op keeps v when draw >= 0.5

    def integers(self, lo, hi):
        return self._center.pop(0)


class TestNativeAutoAugment:
    """Per-op parity: cpp/autoaugment.cpp vs the PIL reference implementation
    (axcnn/data/autoaugment.py). LUT/pointwise ops are BIT-EXACT; enhance
    ops match to <=1 LSB (blend rounding); geometry ops match to small
    tolerance (resampler boundary conventions)."""

    def _img(self, seed=0, w=64, h=48):
        rng = np.random.default_rng(seed)
        # piecewise-smooth image: keeps resampler disagreement visible but
        # bounded (pure noise maximizes legitimate bilinear disagreement)
        base = rng.integers(0, 256, (6, 8, 3)).astype(np.uint8)
        return np.asarray(
            Image.fromarray(base).resize((w, h), Image.BILINEAR), np.uint8)

    def _pil(self, arr, op, mag, rng):
        from axcnn.data.autoaugment import NAME_TO_OP

        return np.asarray(NAME_TO_OP[op](Image.fromarray(arr), mag, rng),
                          np.uint8)

    @pytest.mark.parametrize("op,mags", [
        ("Posterize", [0, 4, 6, 10]),
        ("Solarize", [0, 2, 5, 10]),
        ("SolarizeAdd", [0, 3, 7]),
        ("AutoContrast", [5]),
        ("Equalize", [5]),
        ("Invert", [5]),
    ])
    def test_lut_ops_bit_exact(self, op, mags):
        arr = self._img()
        for mag in mags:
            want = self._pil(arr, op, mag, _PinnedRng())
            got = cpp_loader.aa_op(arr, op, mag)
            np.testing.assert_array_equal(got, want, err_msg=f"{op} mag={mag}")

    def test_equalize_sparse_histogram(self):
        # few distinct values exercises the last-nonzero-bin rule
        arr = np.full((32, 32, 3), 7, np.uint8)
        arr[:8] = 200
        want = self._pil(arr, "Equalize", 5, _PinnedRng())
        got = cpp_loader.aa_op(arr, "Equalize", 5)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("op", ["Color", "Contrast", "Brightness",
                                     "Sharpness"])
    @pytest.mark.parametrize("mag", [0, 5, 10])
    def test_enhance_ops(self, op, mag):
        arr = self._img(1)
        want = self._pil(arr, op, mag, _PinnedRng()).astype(int)
        got = cpp_loader.aa_op(arr, op, mag).astype(int)
        assert np.abs(got - want).max() <= 1, (op, mag)

    @pytest.mark.parametrize("op", ["ShearX", "ShearY", "TranslateX",
                                     "TranslateY", "Rotate"])
    @pytest.mark.parametrize("sign", [1, -1])
    def test_geometry_ops_close(self, op, sign):
        arr = self._img(2)
        for mag in (3, 9):
            want = self._pil(arr, op, mag, _PinnedRng(sign=sign)).astype(int)
            got = cpp_loader.aa_op(arr, op, mag, sign=sign).astype(int)
            diff = np.abs(got - want)
            # same transform: tiny mean error, only isolated boundary pixels
            # may disagree (fill-edge handling)
            assert diff.mean() < 1.5, (op, mag, sign, diff.mean())
            assert (diff > 8).mean() < 0.02, (op, mag, sign)

    def test_cutout_exact(self):
        arr = self._img(3)
        want = self._pil(arr, "Cutout", 6, _PinnedRng(center=(20, 9)))
        got = cpp_loader.aa_op(arr, "Cutout", 6, cutout_xy=(20, 9))
        np.testing.assert_array_equal(got, want)

    def test_policy_in_decode_batch(self):
        rng = np.random.default_rng(6)
        payloads = [make_example({"image/encoded": [_jpeg(rng)],
                                  "image/class/label": [1]})] * 4
        kw = dict(image_size=48, resize_min=56, train=True,
                  seeds=[11, 11, 12, 13], num_threads=2)
        plain = cpp_loader.decode_batch(payloads, aa_policy=-1, **kw)
        aug = cpp_loader.decode_batch(payloads, aa_policy=0, **kw)
        aug2 = cpp_loader.decode_batch(payloads, aa_policy=0, **kw)
        assert plain[2] == aug[2] == 4
        # deterministic per seed, same seed → same augmentation
        np.testing.assert_array_equal(aug[0], aug2[0])
        np.testing.assert_array_equal(aug[0][0], aug[0][1])
        # most records get visibly augmented relative to the plain decode
        changed = [not np.array_equal(aug[0][i], plain[0][i]) for i in range(4)]
        assert sum(changed) >= 2

    def test_loader_serves_augmented_training_natively(self, tmp_path):
        """loader=cpp + autoaugment_type=v0 must run natively — no PIL
        fallback warning (VERDICT r1 missing #2)."""
        import warnings
        from tests.test_data import _make_dataset
        from axcnn.data.pipeline import TFRecordImageLoader

        data_dir, info = _make_dataset(tmp_path)
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any fallback warning = failure
            loader = TFRecordImageLoader(
                data_dir, info, batch_size=8, train=True, image_size=32,
                seed=5, num_workers=2, use_native=True, autoaugment_type="v0")
            assert loader._native and loader._aa_policy == 0
            b1 = next(iter(loader))
        assert b1["images"].shape == (8, 32, 32, 3)
        plain = TFRecordImageLoader(
            data_dir, info, batch_size=8, train=True, image_size=32,
            seed=5, num_workers=2, use_native=True, autoaugment_type="none")
        b0 = next(iter(plain))
        assert not np.array_equal(b1["images"], b0["images"])
        np.testing.assert_array_equal(b1["labels"], b0["labels"])


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
