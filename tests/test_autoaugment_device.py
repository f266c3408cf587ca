"""On-device AutoAugment vs the host (PIL) implementation.

Pixel-exact parity is expected for pointwise/color ops (posterize, solarize,
solarize-add, invert, autocontrast, equalize — the LUT construction matches
PIL's); geometric warps share geometry but not PIL's exact resampler, so
they are checked on smooth images with interior tolerance."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from axcnn.data import autoaugment as host_aa
from axcnn.data.autoaugment_device import (
    _OP_FNS, make_device_autoaugment, _affine_warp)


def _rand_img(seed=0, h=48, w=64):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)


def _smooth_img(h=48, w=64):
    x = np.linspace(0, 255, w, dtype=np.float32)
    y = np.linspace(0, 200, h, dtype=np.float32)
    img = (x[None, :, None] * 0.6 + y[:, None, None] * 0.4)
    img = np.concatenate([img, 255 - img, img * 0.5], axis=-1)
    return np.clip(img, 0, 255).astype(np.uint8)


def _host(name, img_u8, mag, rng_vals):
    """Run the host op with a rigged RNG (fixed sign / positions)."""
    class FixedRng:
        def __init__(self, vals):
            self.vals = list(vals)

        def random(self):
            return self.vals.pop(0)

        def integers(self, lo, hi=None):
            return (lo + hi) // 2 if hi else lo

    return np.asarray(host_aa.NAME_TO_OP[name](
        Image.fromarray(img_u8), mag, FixedRng(rng_vals)), np.float32)


class TestPointwiseOpsExact:
    @pytest.mark.parametrize("name,mag", [
        ("Posterize", 6), ("Solarize", 3), ("Solarize", 10),
        ("SolarizeAdd", 7), ("Invert", 0), ("AutoContrast", 0),
        ("Equalize", 0),
    ])
    def test_exact_match(self, name, mag):
        img = _rand_img(1)
        got = np.asarray(_OP_FNS[name](jnp.asarray(img, jnp.float32), jnp.float32(mag), 1.0))
        want = _host(name, img, mag, [0.9])  # sign draw unused for these
        np.testing.assert_allclose(got, want, atol=1.0)


class TestEnhanceOps:
    @pytest.mark.parametrize("name,mag", [
        ("Color", 9), ("Contrast", 8), ("Brightness", 5), ("Sharpness", 7),
    ])
    def test_close_to_pil(self, name, mag):
        img = _rand_img(2)
        got = np.asarray(_OP_FNS[name](jnp.asarray(img, jnp.float32), jnp.float32(mag), 1.0))
        want = _host(name, img, mag, [0.9])
        # PIL rounds per-pixel to uint8 and uses slightly different gray
        # weights; allow small per-pixel slack
        diff = np.abs(got - want)
        assert np.mean(diff) < 2.0, (name, np.mean(diff))
        assert np.percentile(diff, 99) <= 6.0, (name, np.percentile(diff, 99))


class TestGeometricOps:
    @pytest.mark.parametrize("name,mag", [
        ("ShearX", 5), ("ShearY", 5), ("TranslateX", 6), ("TranslateY", 6),
        ("Rotate", 6),
    ])
    def test_close_on_smooth(self, name, mag):
        img = _smooth_img()
        got = np.asarray(_OP_FNS[name](jnp.asarray(img, jnp.float32),
                                       jnp.float32(mag), 1.0))
        # host with positive sign (random() >= 0.5 keeps +v)
        want = _host(name, img, mag, [0.9])
        # compare on the interior (borders differ: fill handling/rounding)
        gi, wi = got[6:-6, 6:-6], want[6:-6, 6:-6]
        mask = np.all(np.abs(wi - 128.0) > 0.5, axis=-1)  # skip fill regions
        if mask.sum() > 100:
            diff = np.abs(gi - wi)[mask]
            assert np.mean(diff) < 8.0, (name, np.mean(diff))

    def test_identity_warp(self):
        img = jnp.asarray(_rand_img(3), jnp.float32)
        eye = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
        out = _affine_warp(img, eye)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)


class TestPolicyApplicator:
    def test_jit_shapes_determinism(self):
        fn = make_device_autoaugment("v0")
        images = jnp.asarray(np.stack([_rand_img(i) for i in range(4)]))
        f = jax.jit(fn)
        out1 = np.asarray(f(jax.random.key(0), images))
        out2 = np.asarray(f(jax.random.key(0), images))
        out3 = np.asarray(f(jax.random.key(1), images))
        assert out1.shape == images.shape
        np.testing.assert_array_equal(out1, out2)
        assert not np.array_equal(out1, out3)
        assert out1.min() >= 0.0 and out1.max() <= 255.0

    def test_changes_some_images(self):
        fn = make_device_autoaugment("imagenet")
        images = jnp.asarray(np.stack([_rand_img(i) for i in range(8)]))
        out = np.asarray(fn(jax.random.key(5), images))
        changed = [not np.allclose(out[i], np.asarray(images[i], np.float32))
                   for i in range(8)]
        assert any(changed)

    def test_none_policy(self):
        assert make_device_autoaugment("none") is None
