"""Mixed-precision policy for TPU.

The reference exposes ``--dtype {fp16,fp32}`` + static ``--loss_scale``
(vendored ``official/utils/flags/_performance.py``; SURVEY.md §5.6). On TPU
the idiomatic equivalent is bf16 compute with fp32 master params — bf16 has
the fp32 exponent range so no loss scaling is needed (SURVEY.md §2.10).

Convention used throughout the framework:
- params/state are stored in ``param_dtype`` (fp32),
- activations and conv/matmul inputs are cast to ``compute_dtype``,
- normalization statistics and loss are always computed in fp32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    # Serving-only: run every model conv through the dynamic int8 path
    # (ops/conv.py _dynamic_int8_conv — per-tensor activation / per-channel
    # weight symmetric quantization feeding the MXU's int8 throughput).
    # Everything else (BN, attention, head, pooling) stays in compute_dtype.
    # Not differentiable: the train loop refuses this policy.
    quantize_conv: bool = False

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_param(self, x):
        return jnp.asarray(x, self.param_dtype)


DEFAULT_POLICY = Policy()
# TPU training policy: fp32 master weights, bf16 activations/matmuls (MXU-native).
BF16_POLICY = Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)
# Post-training-quantized serving: int8 convs, bf16 everything else. The
# reference has no quantized path; this is a TPU-native inference extension.
INT8_SERVING_POLICY = Policy(param_dtype=jnp.float32,
                             compute_dtype=jnp.bfloat16, quantize_conv=True)


def policy_from_name(name: str) -> Policy:
    """Map the reference's ``--dtype`` flag values onto TPU policies.

    ``fp16`` (reference: loss-scaled half precision) maps to bf16 on TPU.
    ``int8`` is the serving-only post-training-quantization policy.
    """
    name = name.lower()
    if name in ("fp32", "float32"):
        return DEFAULT_POLICY
    if name in ("bf16", "bfloat16", "fp16", "float16", "amp"):
        return BF16_POLICY
    if name == "int8":
        return INT8_SERVING_POLICY
    raise ValueError(f"unknown dtype policy: {name!r}")
