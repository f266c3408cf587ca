"""XLA-vs-Pallas dispatch for the assembly ops (SURVEY.md §7.1: "each with
XLA impl + Pallas fused variant behind one interface").

Policy is trace-time (shapes and backend are static under jit):

- ``auto`` (default): per-op defaults MEASURED on the real chip (full
  Assemble-R50 train step, batch 128, 2026-08-16; table in docs/DESIGN.md):

  * ``dropblock`` → Pallas on TPU. Neutral step time (80.5 vs 80.2 ms) and
    the random bits come from the TPU core PRNG instead of an HBM uniform
    tensor.
  * ``blurpool`` → XLA. The Pallas kernel pair (fwd + hand-derived
    transpose) is itself fast, but the ``pallas_call`` boundary forces its
    operands to materialize in HBM, breaking XLA's producer/consumer fusion
    around every BlurPool site: measured 80.2 → 87.9 ms train (bytes
    accessed 67.25 → 72.01 GB) and 21.7 → 24.0 ms infer. The step is
    HBM-bandwidth-bound, so any lost fusion is pure regression.

- ``off``: always XLA — the semantics reference, and the only choice on CPU;
- ``on``: force Pallas everywhere (perf experiments; interpret mode off-TPU
  is NOT implied — tests pass ``interpret=True`` to the kernels directly).

Selectable via the ``AXCNN_PALLAS`` env var or :func:`set_pallas_mode`.
"""

from __future__ import annotations

import contextlib
import contextvars
import os
import warnings

_VALID = ("auto", "on", "off")
_mode = os.environ.get("AXCNN_PALLAS", "auto")
if _mode not in _VALID:
    raise ValueError(f"AXCNN_PALLAS must be one of {_VALID}, got {_mode!r}")

# Trace-time override: inside a GSPMD-partitioned program (spatial
# partitioning, axcnn/parallel/spatial.py) a ``pallas_call`` is a custom
# call with NO SPMD partitioning rule — the partitioner would have to
# replicate its operands (an all-gather of every H-sharded DropBlock input)
# or fail outright. The spatial step builders wrap tracing in force_xla()
# so `auto`/`on` can never route an op into that footgun silently.
_force_xla: contextvars.ContextVar = contextvars.ContextVar(
    "axcnn_force_xla", default="")


@contextlib.contextmanager
def force_xla(reason: str = "partitioned program"):
    token = _force_xla.set(reason)
    try:
        yield
    finally:
        _force_xla.reset(token)

# measured per-op auto defaults (see module docstring / docs/DESIGN.md)
_AUTO_DEFAULTS = {"dropblock": True, "blurpool": False}


def set_pallas_mode(mode: str) -> None:
    global _mode
    if mode not in _VALID:
        raise ValueError(f"pallas mode must be one of {_VALID}, got {mode!r}")
    if mode == _mode:
        return
    _mode = mode
    # the mode is trace-time state that is NOT part of any jitted function's
    # cache key: a function traced under the old mode would silently keep its
    # old kernel choice. Dropping the caches forces a retrace at next call.
    import jax

    jax.clear_caches()


def pallas_mode() -> str:
    return _mode


def use_pallas(op: str = "") -> bool:
    """Trace-time decision: should ``op`` take its Pallas kernel now?"""
    reason = _force_xla.get()
    if reason:
        if _mode == "on":
            warnings.warn(
                f"AXCNN_PALLAS=on overridden for {op or 'op'}: {reason} "
                "(pallas_call cannot be SPMD-partitioned)")
        return False
    if _mode == "off":
        return False
    if _mode == "on":
        return True
    import jax

    return jax.default_backend() == "tpu" and _AUTO_DEFAULTS.get(op, False)
