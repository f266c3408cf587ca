"""AutoAugment as an on-device XLA graph (the BASELINE north star: "the
tf.data input path (JPEG decode, AutoAugment, mixup, label smoothing)
becomes an on-device XLA preprocessing graph").

Every op is a pure jittable function on fp32 images in [0, 255]; the policy
applicator splits the batch into groups, draws one sub-policy per group, and
dispatches ops through group-level ``lax.switch`` so only selected branches
execute — no host work, no data-dependent shapes. Used inside the train step
right before normalization, which lets the native C++ loader (decode-only)
feed augmented training.

Measured on the axon chip (batch 128 @ 224²): ~61 ms at num_groups=1 up to
~144 ms at 16 (each switch level costs ~5 ms of conditional overhead here);
per-image vmap'd switch would run all 16 ops on every image (3.3 s). Host
(PIL) AutoAugment remains the default path — flip ``data.autoaugment_device``
when host CPUs are the bottleneck.

Semantics follow the Google-reference TF implementation (the reference's
``preprocessing/autoaugment.py`` lineage; host twin: axcnn/data/autoaugment.py):
geometric ops are inverse-affine warps with bilinear sampling and gray(128)
fill; equalize/autocontrast use the TF LUT construction. Pixel-exact parity
with PIL is not expected (resampler edge behavior differs); distribution
parity is tested against the host implementation in tests/test_autoaugment_device.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from axcnn.data.autoaugment import POLICIES, _MAX_LEVEL

_FILL = 128.0


# ---------------------------------------------------------------------------
# geometric ops: inverse affine warp, bilinear, gray fill
# ---------------------------------------------------------------------------

def _affine_warp(img, mat):
    """img (H,W,C) fp32; mat = inverse transform [[a,b,c],[d,e,f]] mapping
    OUTPUT (x,y) → SOURCE coords (PIL convention: x=col, y=row)."""
    h, w, c = img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    sx = mat[0, 0] * xs + mat[0, 1] * ys + mat[0, 2]
    sy = mat[1, 0] * xs + mat[1, 1] * ys + mat[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def gather(yc, xc):
        yi = jnp.clip(yc, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xc, 0, w - 1).astype(jnp.int32)
        return img[yi, xi]  # (H,W,C)

    p00 = gather(y0, x0)
    p01 = gather(y0, x0 + 1)
    p10 = gather(y0 + 1, x0)
    p11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    out = (p00 * (1 - fx) * (1 - fy) + p01 * fx * (1 - fy)
           + p10 * (1 - fx) * fy + p11 * fx * fy)

    valid = ((sx >= -0.5) & (sx <= w - 0.5) & (sy >= -0.5) & (sy <= h - 0.5))
    return jnp.where(valid[..., None], out, _FILL)


def _shear_x(img, mag, sign):
    v = mag / _MAX_LEVEL * 0.3 * sign
    return _affine_warp(img, jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) +
                        jnp.array([[0.0, 1.0, 0.0], [0.0, 0.0, 0.0]]) * v)


def _shear_y(img, mag, sign):
    v = mag / _MAX_LEVEL * 0.3 * sign
    return _affine_warp(img, jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) +
                        jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]) * v)


def _translate_x(img, mag, sign):
    v = mag / _MAX_LEVEL * 100.0 * sign
    return _affine_warp(img, jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) +
                        jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 0.0]]) * v)


def _translate_y(img, mag, sign):
    v = mag / _MAX_LEVEL * 100.0 * sign
    return _affine_warp(img, jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]) +
                        jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]]) * v)


def _rotate(img, mag, sign):
    # rotate around the image center by -deg (PIL rotates CCW; inverse map)
    deg = mag / _MAX_LEVEL * 30.0 * sign
    rad = deg * (3.14159265358979 / 180.0)
    h, w, _ = img.shape
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    mat = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    mat = mat.at[0, 0].set(cos).at[0, 1].set(-sin).at[1, 0].set(sin).at[1, 1].set(cos)
    mat = mat.at[0, 2].set(cx - cos * cx + sin * cy)
    mat = mat.at[1, 2].set(cy - sin * cx - cos * cy)
    return _affine_warp(img, mat)


# ---------------------------------------------------------------------------
# color ops
# ---------------------------------------------------------------------------

def _blend(a, b, factor):
    """factor=0 → a; 1 → b; extrapolates beyond 1 (PIL ImageEnhance)."""
    return jnp.clip(a + (b - a) * factor, 0.0, 255.0)


def _enh_factor(mag):
    return mag / _MAX_LEVEL * 1.8 + 0.1


def _grayscale(img):
    # PIL L-mode weights
    g = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    return jnp.broadcast_to(g[..., None], img.shape)


def _color(img, mag, sign):
    return _blend(_grayscale(img), img, _enh_factor(mag))


def _contrast(img, mag, sign):
    # PIL Contrast: blend with the mean of the grayscale image
    mean = jnp.mean(_grayscale(img)[..., 0])
    # PIL computes mean of the L image rounded; keep fp (tolerance tested)
    return _blend(jnp.full_like(img, mean), img, _enh_factor(mag))


def _brightness(img, mag, sign):
    return _blend(jnp.zeros_like(img), img, _enh_factor(mag))


def _sharpness(img, mag, sign):
    # PIL SMOOTH kernel [[1,1,1],[1,5,1],[1,1,1]]/13, border pixels kept
    k = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    c = img.shape[-1]
    w = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    smooth = lax.conv_general_dilated(
        img[None], w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)[0]
    h, wd, _ = img.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (h, wd), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, wd), 1)
    interior = ((row > 0) & (row < h - 1) & (col > 0) & (col < wd - 1))[..., None]
    smooth = jnp.where(interior, smooth, img)
    return _blend(smooth, img, _enh_factor(mag))


def _posterize(img, mag, sign):
    bits = 8 - (mag / _MAX_LEVEL * 4.0).astype(jnp.int32)
    shift = 8 - bits
    iv = img.astype(jnp.int32)
    return ((iv >> shift) << shift).astype(jnp.float32)


def _solarize(img, mag, sign):
    threshold = 256.0 - (mag / _MAX_LEVEL * 256.0).astype(jnp.int32).astype(jnp.float32)
    return jnp.where(img >= threshold, 255.0 - img, img)


def _solarize_add(img, mag, sign):
    add = (mag / _MAX_LEVEL * 110.0).astype(jnp.int32).astype(jnp.float32)
    return jnp.where(img < 128.0, jnp.clip(img + add, 0.0, 255.0), img)


def _autocontrast(img, mag, sign):
    lo = jnp.min(img, axis=(0, 1))
    hi = jnp.max(img, axis=(0, 1))
    scale = jnp.where(hi > lo, 255.0 / jnp.maximum(hi - lo, 1e-6), 1.0)
    off = jnp.where(hi > lo, -lo * scale, 0.0)
    return jnp.clip(img * scale + off, 0.0, 255.0)


def _equalize_batch(images):
    """Histogram equalization, TF/PIL-exact LUT, batch (N,H,W,C).

    TPU-shaped: the histogram is a 256-threshold compare-sweep (VPU; TPU
    scatters cost ~400ms/batch) and the LUT application is a 256-pass
    masked accumulate (per-pixel gathers cost ~250ms/batch; this is ~60ms
    worst case and usually runs on a fraction of the batch).
    """
    n, h, w, c = images.shape
    iv = jnp.clip(images, 0, 255).astype(jnp.int32)
    flat = iv.reshape(n, h * w, c)

    def hist_body(t, cum):
        cnt = jnp.sum((flat <= t).astype(jnp.float32), axis=1)  # (N,C)
        return cum.at[:, :, t].set(cnt)

    cum = lax.fori_loop(0, 256, hist_body, jnp.zeros((n, c, 256), jnp.float32),
                        unroll=16)
    cum = cum.astype(jnp.int32)
    histo = jnp.diff(
        jnp.concatenate([jnp.zeros((n, c, 1), jnp.int32), cum], axis=2), axis=2)
    # TF-reference: step = (total - last_nonzero_count) // 255
    nz_idx = jnp.max(jnp.where(histo > 0, jnp.arange(256)[None, None, :], 0),
                     axis=2)
    last = jnp.take_along_axis(histo, nz_idx[:, :, None], axis=2)[:, :, 0]
    step = (jnp.sum(histo, axis=2) - last) // 255  # (N,C)
    lut = (cum + (step[:, :, None] // 2)) // jnp.maximum(step[:, :, None], 1)
    lut = jnp.concatenate([jnp.zeros((n, c, 1), lut.dtype), lut[:, :, :-1]],
                          axis=2)
    lut = jnp.clip(lut, 0, 255)
    ident = jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32), (n, c, 256))
    lut = jnp.where((step == 0)[:, :, None], ident, lut).astype(jnp.float32)

    def apply_body(t, out):
        vals = lut[:, :, t][:, None, None, :]  # (N,1,1,C)
        return out + jnp.where(iv == t, vals, 0.0)

    return lax.fori_loop(0, 256, apply_body, jnp.zeros_like(images), unroll=16)


def _equalize(img, mag, sign):
    return _equalize_batch(img[None])[0]


def _invert(img, mag, sign):
    return 255.0 - img


def _cutout(img, mag, sign):
    # randomness comes via `sign` abuse? — cutout needs a position; handled
    # in the applicator by passing a position through closures is messy, so
    # device cutout uses the image center offset by sign-scaled magnitude.
    # The v0/imagenet policies don't include Cutout, so this path is only hit
    # by custom policies; center cutout is a reasonable stand-in.
    size = (mag / _MAX_LEVEL * 40.0).astype(jnp.int32)
    h, w, _ = img.shape
    cy, cx = h // 2, w // 2
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inside = ((row >= cy - size) & (row < cy + size)
              & (col >= cx - size) & (col < cx + size))[..., None]
    return jnp.where(inside, _FILL, img)


_OP_FNS = {
    "ShearX": _shear_x, "ShearY": _shear_y,
    "TranslateX": _translate_x, "TranslateY": _translate_y,
    "Rotate": _rotate, "Color": _color, "Contrast": _contrast,
    "Brightness": _brightness, "Sharpness": _sharpness,
    "Posterize": _posterize, "Solarize": _solarize,
    "SolarizeAdd": _solarize_add, "AutoContrast": _autocontrast,
    "Equalize": _equalize, "Invert": _invert, "Cutout": _cutout,
}
_OP_NAMES = list(_OP_FNS)
_SIGNED = {"ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate"}


def _compile_policy(policy_name: str):
    """Policy table → (op_idx, prob, magnitude) int/float arrays (P, 2)."""
    import numpy as np

    policy = POLICIES[policy_name]
    op_idx = np.zeros((len(policy), 2), np.int32)
    probs = np.zeros((len(policy), 2), np.float32)
    mags = np.zeros((len(policy), 2), np.float32)
    for i, sub in enumerate(policy):
        for j, (name, p, m) in enumerate(sub):
            op_idx[i, j] = _OP_NAMES.index(name)
            probs[i, j] = p
            mags[i, j] = m
    return jnp.asarray(op_idx), jnp.asarray(probs), jnp.asarray(mags)


def make_device_autoaugment(policy_name: str = "v0", *, num_groups: int = 8):
    """Returns a jittable ``fn(key, images_u8 NHWC) -> fp32 NHWC [0,255]``,
    or None for 'none'.

    TPU-shaped dispatch: the batch is split into ``num_groups`` groups, each
    drawing ONE random sub-policy; ops dispatch through ``lax.switch`` at
    group level, so only the *selected* branches execute (a per-image
    vmap'd switch runs every one of the 16 ops on every image — measured
    3.3 s/step vs <0.1 s this way). Within a group, apply-coins and
    magnitude signs stay per-image. One sub-policy per group instead of per
    image is a mild coarsening of the augmentation distribution (~8
    policies per batch, fresh every step).
    """
    if policy_name in (None, "", "none"):
        return None
    op_idx, probs, mags = _compile_policy(policy_name)
    num_sub = op_idx.shape[0]

    def _group_branch(name, f):
        if name == "Equalize":
            return lambda imgs, mag, signs: _equalize_batch(imgs)
        return lambda imgs, mag, signs: jax.vmap(
            lambda im, s: f(im, mag, s))(imgs, signs)

    branches = [_group_branch(name, f) for name, f in _OP_FNS.items()]

    def augment_group(key, imgs):
        """imgs (G,H,W,C) fp32; one sub-policy, per-image coins/signs."""
        g = imgs.shape[0]
        k_sub, k_coin, k_sign = jax.random.split(key, 3)
        sub = jax.random.randint(k_sub, (), 0, num_sub)
        coins = jax.random.uniform(k_coin, (2, g))
        signs = jnp.where(jax.random.uniform(k_sign, (2, g)) < 0.5, -1.0, 1.0)

        def apply_op(j, imgs):
            idx = op_idx[sub, j]
            mag = mags[sub, j]
            out = lax.switch(idx, branches, imgs, mag, signs[j])
            keep = (coins[j] < probs[sub, j])[:, None, None, None]
            return jnp.where(keep, out, imgs)

        imgs = apply_op(0, imgs)
        imgs = apply_op(1, imgs)
        return imgs

    def fn(key, images_u8):
        n = images_u8.shape[0]
        g = num_groups if n % num_groups == 0 else 1
        images = images_u8.astype(jnp.float32)
        grouped = images.reshape(g, n // g, *images.shape[1:])
        keys = jax.random.split(key, g)
        out = lax.map(lambda kg: augment_group(kg[0], kg[1]), (keys, grouped))
        return out.reshape(n, *images.shape[1:])

    return fn
