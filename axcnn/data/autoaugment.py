"""AutoAugment (Cubuk et al. 2019) — host-side PIL implementation.

Parity target: reference ``preprocessing/autoaugment.py`` (SURVEY.md §2
item 5): the Google-reference op set (shear/translate/rotate/color/posterize/
solarize/contrast/sharpness/brightness/autocontrast/equalize/invert/cutout/
solarize-add) with selectable policies via ``autoaugment_type``.

The upstream mount was empty this session, so the policy tables follow the
public Google reference (``policy_v0`` lineage, tagged [K-med] in SURVEY.md
§0); magnitudes use the standard level→value conversions (_MAX_LEVEL=10).

Design note: augmentation is host work by design — it operates on uint8
images pre-batch, overlapped with device compute by the loader's prefetch
pipeline. This module is the semantics reference; the same policies also
exist as an on-device XLA graph (autoaugment_device.py) and in the native
C++ loader (cpp/autoaugment.cpp — per-op parity-tested against this module,
LUT ops bit-exact), which is the full-rate training path.
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

_MAX_LEVEL = 10.0
_FILL = (128, 128, 128)


# --------------------------------------------------------------------------
# ops
# --------------------------------------------------------------------------

def _shear_x(img, mag, rng):
    v = mag / _MAX_LEVEL * 0.3
    if rng.random() < 0.5:
        v = -v
    return img.transform(img.size, Image.AFFINE, (1, v, 0, 0, 1, 0),
                         Image.BILINEAR, fillcolor=_FILL)


def _shear_y(img, mag, rng):
    v = mag / _MAX_LEVEL * 0.3
    if rng.random() < 0.5:
        v = -v
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, v, 1, 0),
                         Image.BILINEAR, fillcolor=_FILL)


def _translate_x(img, mag, rng):
    v = mag / _MAX_LEVEL * 100.0
    if rng.random() < 0.5:
        v = -v
    return img.transform(img.size, Image.AFFINE, (1, 0, v, 0, 1, 0),
                         Image.BILINEAR, fillcolor=_FILL)


def _translate_y(img, mag, rng):
    v = mag / _MAX_LEVEL * 100.0
    if rng.random() < 0.5:
        v = -v
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, v),
                         Image.BILINEAR, fillcolor=_FILL)


def _rotate(img, mag, rng):
    deg = mag / _MAX_LEVEL * 30.0
    if rng.random() < 0.5:
        deg = -deg
    return img.rotate(deg, Image.BILINEAR, fillcolor=_FILL)


def _enhance_factor(mag):
    return mag / _MAX_LEVEL * 1.8 + 0.1


def _color(img, mag, rng):
    return ImageEnhance.Color(img).enhance(_enhance_factor(mag))


def _contrast(img, mag, rng):
    return ImageEnhance.Contrast(img).enhance(_enhance_factor(mag))


def _brightness(img, mag, rng):
    return ImageEnhance.Brightness(img).enhance(_enhance_factor(mag))


def _sharpness(img, mag, rng):
    return ImageEnhance.Sharpness(img).enhance(_enhance_factor(mag))


def _posterize(img, mag, rng):
    bits = 8 - int(mag / _MAX_LEVEL * 4)  # keep 4..8 bits
    return ImageOps.posterize(img, bits)


def _solarize(img, mag, rng):
    threshold = 256 - int(mag / _MAX_LEVEL * 256)
    return ImageOps.solarize(img, threshold)


def _solarize_add(img, mag, rng):
    add = int(mag / _MAX_LEVEL * 110)
    arr = np.asarray(img, np.int32)
    added = np.clip(arr + add, 0, 255)
    out = np.where(arr < 128, added, arr).astype(np.uint8)
    return Image.fromarray(out)


def _autocontrast(img, mag, rng):
    return ImageOps.autocontrast(img)


def _equalize(img, mag, rng):
    return ImageOps.equalize(img)


def _invert(img, mag, rng):
    return ImageOps.invert(img)


def _cutout(img, mag, rng):
    size = int(mag / _MAX_LEVEL * 40)
    if size <= 0:
        return img
    w, h = img.size
    cx, cy = int(rng.integers(0, w)), int(rng.integers(0, h))
    x0, y0 = max(cx - size, 0), max(cy - size, 0)
    x1, y1 = min(cx + size, w), min(cy + size, h)
    arr = np.asarray(img, np.uint8).copy()
    arr[y0:y1, x0:x1] = _FILL
    return Image.fromarray(arr)


NAME_TO_OP = {
    "ShearX": _shear_x, "ShearY": _shear_y,
    "TranslateX": _translate_x, "TranslateY": _translate_y,
    "Rotate": _rotate, "Color": _color, "Contrast": _contrast,
    "Brightness": _brightness, "Sharpness": _sharpness,
    "Posterize": _posterize, "Solarize": _solarize,
    "SolarizeAdd": _solarize_add, "AutoContrast": _autocontrast,
    "Equalize": _equalize, "Invert": _invert, "Cutout": _cutout,
}


# --------------------------------------------------------------------------
# policies: list of sub-policies; each sub-policy = [(op, prob, magnitude) x2]
# --------------------------------------------------------------------------

POLICY_V0 = [
    [("Equalize", 0.8, 1), ("ShearY", 0.8, 4)],
    [("Color", 0.4, 9), ("Equalize", 0.6, 3)],
    [("Color", 0.4, 1), ("Rotate", 0.6, 8)],
    [("Solarize", 0.8, 3), ("Equalize", 0.4, 7)],
    [("Solarize", 0.4, 2), ("Solarize", 0.6, 2)],
    [("Color", 0.2, 0), ("Equalize", 0.8, 8)],
    [("Equalize", 0.4, 8), ("SolarizeAdd", 0.8, 3)],
    [("ShearX", 0.2, 9), ("Rotate", 0.6, 8)],
    [("Color", 0.6, 1), ("Equalize", 1.0, 2)],
    [("Invert", 0.4, 9), ("Rotate", 0.6, 0)],
    [("Equalize", 1.0, 9), ("ShearY", 0.6, 3)],
    [("Color", 0.4, 7), ("Equalize", 0.6, 0)],
    [("Posterize", 0.4, 6), ("AutoContrast", 0.4, 7)],
    [("Solarize", 0.6, 8), ("Color", 0.6, 9)],
    [("Solarize", 0.2, 4), ("Rotate", 0.8, 9)],
    [("Rotate", 1.0, 7), ("TranslateY", 0.8, 9)],
    [("ShearX", 0.0, 0), ("Solarize", 0.8, 4)],
    [("ShearY", 0.8, 0), ("Color", 0.6, 4)],
    [("Color", 1.0, 0), ("Rotate", 0.6, 2)],
    [("Equalize", 0.8, 4), ("Equalize", 0.0, 8)],
    [("Equalize", 1.0, 4), ("AutoContrast", 0.6, 2)],
    [("ShearY", 0.4, 7), ("SolarizeAdd", 0.6, 7)],
    [("Posterize", 0.8, 2), ("Solarize", 0.6, 10)],
    [("Solarize", 0.6, 8), ("Equalize", 0.6, 1)],
    [("Color", 0.8, 6), ("Rotate", 0.4, 5)],
]

# The original AutoAugment-paper ImageNet policy (Table 9 lineage).
POLICY_IMAGENET = [
    [("Posterize", 0.4, 8), ("Rotate", 0.6, 9)],
    [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
    [("Posterize", 0.6, 7), ("Posterize", 0.6, 6)],
    [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
    [("Equalize", 0.4, 4), ("Rotate", 0.8, 8)],
    [("Solarize", 0.6, 3), ("Equalize", 0.6, 7)],
    [("Posterize", 0.8, 5), ("Equalize", 1.0, 2)],
    [("Rotate", 0.2, 3), ("Solarize", 0.6, 8)],
    [("Equalize", 0.6, 8), ("Posterize", 0.4, 6)],
    [("Rotate", 0.8, 8), ("Color", 0.4, 0)],
    [("Rotate", 0.4, 9), ("Equalize", 0.6, 2)],
    [("Equalize", 0.0, 7), ("Equalize", 0.8, 8)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Rotate", 0.8, 8), ("Color", 1.0, 2)],
    [("Color", 0.8, 8), ("Solarize", 0.8, 7)],
    [("Sharpness", 0.4, 7), ("Invert", 0.6, 8)],
    [("ShearX", 0.6, 5), ("Equalize", 1.0, 9)],
    [("Color", 0.4, 0), ("Equalize", 0.6, 3)],
    [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
    [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
]

POLICIES = {"v0": POLICY_V0, "imagenet": POLICY_IMAGENET}


def make_autoaugment(policy_name: str = "v0"):
    """Returns ``fn(PIL.Image, np.random.Generator) -> PIL.Image`` applying a
    randomly-chosen sub-policy (or None for 'none')."""
    if policy_name in (None, "", "none"):
        return None
    try:
        policy = POLICIES[policy_name]
    except KeyError:
        raise ValueError(
            f"unknown autoaugment_type {policy_name!r}; known: {sorted(POLICIES)} or 'none'"
        ) from None

    def _apply(img: Image.Image, rng: np.random.Generator) -> Image.Image:
        sub = policy[int(rng.integers(0, len(policy)))]
        for op_name, prob, mag in sub:
            if rng.random() < prob:
                img = NAME_TO_OP[op_name](img, mag, rng)
        return img

    return _apply
