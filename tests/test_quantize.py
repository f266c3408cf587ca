"""Int8 post-training-quantized serving path (ops/conv.py _dynamic_int8_conv,
core/dtypes.py INT8_SERVING_POLICY).

The reference has no quantized inference; this is a TPU-native serving
extension (the MXU's int8 path doubles matmul throughput). These tests pin
the quantization semantics on CPU; the on-chip throughput/accuracy numbers
live in scripts/latency_bench.py and docs/DESIGN.md.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from axcnn.core.dtypes import (DEFAULT_POLICY, INT8_SERVING_POLICY,
                               policy_from_name)
from axcnn.ops.conv import conv_apply


class TestInt8Conv:
    def test_exact_on_representable_grid(self):
        """Inputs/weights that are exact multiples of their dynamic scales
        quantize losslessly: the int8 conv must equal the fp32 conv exactly
        (integer accumulation, sums << 2^24 so fp32 reference is exact)."""
        rng = np.random.default_rng(0)
        # power-of-two scales: max/127 then x/scale round-trip exactly in
        # fp32, so the only remaining difference would be quantization itself
        # activations: integers in [-127, 127] times one tensor-wide scale
        x = (rng.integers(-127, 128, (2, 8, 8, 8)).astype(np.float32)
             * 2.0 ** -5)
        # weights: integers times a DIFFERENT scale per output channel
        ch_scale = (2.0 ** rng.integers(-6, 0, (16,))).astype(np.float32)
        w = (rng.integers(-127, 128, (3, 3, 8, 16)).astype(np.float32)
             * ch_scale)
        # make sure every channel and the activation hit the full +/-127
        # range so scale = max/127 is exactly the grid pitch
        x.reshape(-1)[0] = 127 * 2.0 ** -5
        w.reshape(-1, 16)[0, :] = 127 * ch_scale
        params = {"w": jnp.asarray(w)}
        ref = conv_apply(params, jnp.asarray(x), stride=1)
        q = conv_apply(params, jnp.asarray(x), stride=1, quantize=True)
        np.testing.assert_allclose(np.asarray(q), np.asarray(ref),
                                   rtol=0, atol=1e-4)

    def test_error_bound_random(self):
        """On generic data the quantization error stays at the expected
        per-tensor-int8 level (~1% of the output norm for Gaussian data:
        max/rms ~ 4 sigma eats ~2 of the 8 bits)."""
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 16, 16, 32)).astype(np.float32)
        w = (rng.normal(size=(3, 3, 32, 64)) * 0.1).astype(np.float32)
        params = {"w": jnp.asarray(w)}
        ref = np.asarray(conv_apply(params, jnp.asarray(x), stride=1))
        q = np.asarray(conv_apply(params, jnp.asarray(x), stride=1,
                                  quantize=True))
        rel = np.linalg.norm(q - ref) / np.linalg.norm(ref)
        assert rel < 0.02, rel

    def test_stride_dilation_geometry(self):
        """The quantized path uses the same explicit fixed-padding scheme:
        output shapes match the float path for stride/dilation variants."""
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 9, 9, 4)).astype(np.float32))
        w = jnp.asarray((rng.normal(size=(3, 3, 4, 8)) * .1).astype(np.float32))
        for stride, dilation in ((1, 1), (2, 1), (1, 2), (2, 2)):
            ref = conv_apply({"w": w}, x, stride=stride, dilation=dilation)
            q = conv_apply({"w": w}, x, stride=stride, dilation=dilation,
                           quantize=True)
            assert q.shape == ref.shape, (stride, dilation)

    def test_output_dtype_follows_compute(self):
        x = jnp.ones((1, 4, 4, 2), jnp.float32)
        w = jnp.ones((1, 1, 2, 2), jnp.float32)
        y = conv_apply({"w": w}, x, compute_dtype=jnp.bfloat16, quantize=True)
        assert y.dtype == jnp.bfloat16
        y = conv_apply({"w": w}, x, quantize=True)
        assert y.dtype == jnp.float32


class TestInt8Policy:
    def test_policy_from_name(self):
        p = policy_from_name("int8")
        assert p.quantize_conv and p.compute_dtype == jnp.bfloat16
        assert not policy_from_name("bf16").quantize_conv
        assert not DEFAULT_POLICY.quantize_conv

    @pytest.mark.slow  # full-model fwd compile x2
    def test_model_forward_int8_tracks_fp32(self):
        """Full assembled forward under the int8 policy: logits stay close
        to the fp32 policy's (direction-wise) on a random-init model."""
        from axcnn.models.resnet import ModelConfig, resnet_init, resnet_apply

        cfg = ModelConfig(resnet_size=50, num_classes=10, use_resnet_d=True,
                          use_se_block=True, use_sk_block=True,
                          anti_alias_type="sconv", width_multiplier=0.25)
        params, state = resnet_init(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
        ref, _ = resnet_apply(params, state, x, cfg=cfg, train=False,
                              policy=DEFAULT_POLICY)
        q, _ = resnet_apply(params, state, x, cfg=cfg, train=False,
                            policy=INT8_SERVING_POLICY)
        ref, q = np.asarray(ref), np.asarray(q)
        assert np.all(np.isfinite(q))
        cos = (ref * q).sum() / (np.linalg.norm(ref) * np.linalg.norm(q))
        assert cos > 0.98, cos

    def test_train_loop_refuses_int8(self, tmp_path):
        from axcnn.train.loop import run
        from axcnn.utils.config import Config

        cfg = Config()
        cfg.data.use_synthetic_data = True
        cfg.train.dtype = "int8"
        cfg.runtime.model_dir = str(tmp_path)
        with pytest.raises(ValueError, match="serving-only"):
            run(cfg)
