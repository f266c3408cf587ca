"""Generator invariants for the convergence-drive synthetic datasets.

The accuracy drives (scripts/convergence_drive_scale.py and
scripts/convergence_drive_1k.py) rest on the claim that every class factor
is invariant under the training augmentations (random flip,
RandomResizedCrop, AutoAugment). These tests pin the structural pieces of
that claim so a generator edit can't silently break a recorded drive:
mask determinism, coverage (a pattern that degenerates to near-empty or
near-full is unlearnable), flip-closure of the direction-randomized
"diag" class, and the fg/bg boost separation that keeps the foreground
role unambiguous under global intensity ops.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from convergence_drive_1k import HUES, PATTERNS, _image, _pattern_mask


def test_all_patterns_have_sane_coverage():
    rng = np.random.default_rng(0)
    for kind in PATTERNS:
        m = _pattern_mask(rng, kind, 256, 320)
        assert m.dtype == np.bool_ and m.shape == (256, 320)
        cov = m.mean()
        assert 0.15 <= cov <= 0.75, f"{kind}: coverage {cov:.2f}"


def test_masks_deterministic_given_rng_state():
    a = _pattern_mask(np.random.default_rng(7), "rings", 128, 160)
    b = _pattern_mask(np.random.default_rng(7), "rings", 128, 160)
    np.testing.assert_array_equal(a, b)


def test_diag_class_is_flip_closed():
    # "diag" draws either diagonal direction per image; a horizontal flip
    # of one direction must be (up to band phase) an instance of the other,
    # i.e. the flipped mask is still diagonal stripes: constant along one
    # diagonal. Check: every flipped mask has the property that m[y, x]
    # depends only on (y+x) or (y-x).
    rng = np.random.default_rng(3)
    for _ in range(8):
        m = _pattern_mask(rng, "diag", 96, 96)
        f = m[:, ::-1]
        s_plus = np.array([f[i, 0] for i in range(96)])
        # constant along one of the two diagonals <=> row 0 and column 0
        # determine the whole mask via y+x or y-x
        ok_plus = all(
            (f[y, x] == f[0, y + x] if y + x < 96 else True)
            for y in range(0, 96, 7) for x in range(0, 96, 7))
        ok_minus = all(
            (f[y, x] == (s_plus[y - x] if y >= x else f[0, x - y]))
            for y in range(0, 96, 7) for x in range(0, 96, 7))
        assert ok_plus or ok_minus, "flipped diag mask is not diagonal"


def test_fg_boost_strictly_above_bg():
    # which hue is "foreground" must survive any global intensity op: the
    # fg boost range sits strictly above the bg range in the generator
    rng = np.random.default_rng(0)
    img = _image(rng, (1.0, 0.0, 0.0), (0.0, 0.0, 1.0), "checker")
    assert img.shape == (256, 320, 3) and img.dtype == np.uint8
    # red channel's bright pixels (fg) must exceed the blue channel's
    # bright pixels (bg) in their 90th percentiles
    assert np.percentile(img[..., 0], 90) > np.percentile(img[..., 2], 90)


def test_1000_distinct_class_tuples():
    names = [f"{f}_{b}_{k}" for f in HUES for b in HUES for k in PATTERNS]
    assert len(names) == 1000 and len(set(names)) == 1000
