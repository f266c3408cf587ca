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

    def cast_to_compute(self, x):
        return jnp.asarray(x, self.compute_dtype)

    def cast_to_param(self, x):
        return jnp.asarray(x, self.param_dtype)


DEFAULT_POLICY = Policy()
# TPU training policy: fp32 master weights, bf16 activations/matmuls (MXU-native).
BF16_POLICY = Policy(param_dtype=jnp.float32, compute_dtype=jnp.bfloat16)


def policy_from_name(name: str) -> Policy:
    """Map the reference's ``--dtype`` flag values onto TPU policies.

    ``fp16`` (reference: loss-scaled half precision) maps to bf16 on TPU.
    """
    name = name.lower()
    if name in ("fp32", "float32"):
        return DEFAULT_POLICY
    if name in ("bf16", "bfloat16", "fp16", "float16", "amp"):
        return BF16_POLICY
    raise ValueError(f"unknown dtype policy: {name!r}")
