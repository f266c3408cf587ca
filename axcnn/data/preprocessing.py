"""ImageNet preprocessing — host-side decode/crop, device-side normalize.

Parity target: reference ``preprocessing/imagenet_preprocessing.py``
(SURVEY.md §2 item 4):

- train: decode JPEG → distorted bounding-box crop (area 8-100%, aspect
  3/4-4/3, the Inception/RandomResizedCrop sampler) → bilinear resize to
  ``image_size`` → random horizontal flip → [AutoAugment] → standardize.
- eval: decode → resize shorter side to ``resize_min`` (256 for 224 crops;
  the reference's ``preprocessing_type=imagenet_224_256a``) → central crop.

TPU-first split of work: JPEG decode + crop geometry run on the host (PIL
bootstrap; the C++ loader owns this on the perf path) because decode is
inherently byte-level; everything arithmetic (normalize, mixup, label
smoothing) runs on device inside the jitted step, so the H2D transfer ships
uint8 — 4x less PCIe/DMA traffic than fp32.
"""

from __future__ import annotations

import io

import numpy as np
from PIL import Image

IMAGE_SIZE = 224
RESIZE_MIN = 256
MEAN_RGB = np.array([123.68, 116.78, 103.94], np.float32)
STDDEV_RGB = np.array([58.393, 57.12, 57.375], np.float32)


def decode_jpeg(data: bytes) -> np.ndarray:
    img = Image.open(io.BytesIO(data))
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, np.uint8)


def distorted_bbox_crop(
    rng: np.random.Generator,
    width: int,
    height: int,
    *,
    area_range=(0.08, 1.0),
    aspect_range=(3.0 / 4.0, 4.0 / 3.0),
    max_attempts: int = 10,
):
    """Sample a crop box like TF's ``sample_distorted_bounding_box``.

    Returns (x, y, w, h). Falls back to a central crop when sampling fails —
    the same fallback the reference inherits from the Inception pipeline.
    """
    area = float(width * height)
    for _ in range(max_attempts):
        target_area = rng.uniform(*area_range) * area
        log_ratio = (np.log(aspect_range[0]), np.log(aspect_range[1]))
        aspect = float(np.exp(rng.uniform(*log_ratio)))
        w = int(round(np.sqrt(target_area * aspect)))
        h = int(round(np.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            x = int(rng.integers(0, width - w + 1))
            y = int(rng.integers(0, height - h + 1))
            return x, y, w, h
    # fallback: largest center crop with valid aspect
    in_ratio = width / height
    if in_ratio < aspect_range[0]:
        w, h = width, int(round(width / aspect_range[0]))
    elif in_ratio > aspect_range[1]:
        w, h = int(round(height * aspect_range[1])), height
    else:
        w, h = width, height
    return (width - w) // 2, (height - h) // 2, w, h


def preprocess_train(
    image_bytes: bytes,
    rng: np.random.Generator,
    *,
    image_size: int = IMAGE_SIZE,
    autoaugment_fn=None,
) -> np.ndarray:
    """Returns uint8 HWC (device does the normalize)."""
    img = Image.open(io.BytesIO(image_bytes))
    if img.mode != "RGB":
        img = img.convert("RGB")
    x, y, w, h = distorted_bbox_crop(rng, img.width, img.height)
    img = img.resize((image_size, image_size), Image.BILINEAR,
                     box=(x, y, x + w, y + h))
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    if autoaugment_fn is not None:
        img = autoaugment_fn(img, rng)
    return np.asarray(img, np.uint8)


def preprocess_eval(
    image_bytes: bytes,
    *,
    image_size: int = IMAGE_SIZE,
    resize_min: int = RESIZE_MIN,
) -> np.ndarray:
    """Resize shorter side to ``resize_min``, central crop. Returns uint8 HWC.

    When ``resize_min == image_size`` and the stored image is already exactly
    ``image_size`` square, the pixels pass through untouched — the ImageNet-C
    protocol evaluates the STORED corrupted pixels (224x224 in the standard
    distribution), and even a scale-1.0 resample could perturb them."""
    img = Image.open(io.BytesIO(image_bytes))
    if img.mode != "RGB":
        img = img.convert("RGB")
    if (resize_min == image_size and img.width == image_size
            and img.height == image_size):
        return np.asarray(img, np.uint8)
    scale = resize_min / min(img.width, img.height)
    nw, nh = int(round(img.width * scale)), int(round(img.height * scale))
    img = img.resize((nw, nh), Image.BILINEAR)
    left = (nw - image_size) // 2
    top = (nh - image_size) // 2
    img = img.crop((left, top, left + image_size, top + image_size))
    return np.asarray(img, np.uint8)


def normalize_device(images_u8, mean=None, std=None):
    """uint8 NHWC → standardized fp32, jittable (runs inside the train step)."""
    import jax.numpy as jnp

    mean = jnp.asarray(MEAN_RGB if mean is None else np.asarray(mean, np.float32))
    std = jnp.asarray(STDDEV_RGB if std is None else np.asarray(std, np.float32))
    return (images_u8.astype(jnp.float32) - mean) / std
