"""Deterministic RNG plumbing for functional models.

The reference relies on TF1 graph-level seeds. Here every stochastic op
(DropBlock, mixup, augmentation) receives an explicit ``jax.random`` key,
derived deterministically from a root key by folding in a stable per-site
name hash — so adding/removing layers does not shuffle other layers' streams,
and the whole train step stays jittable and reproducible.
"""

from __future__ import annotations

import hashlib

import jax


def _stable_hash(name: str) -> int:
    # Python's hash() is salted per-process; use a stable digest instead.
    return int.from_bytes(hashlib.blake2s(name.encode()).digest()[:4], "little")


class RngStream:
    """Derives named, independent RNG keys from one root key.

    >>> rng = RngStream(jax.random.key(0))
    >>> k1 = rng("dropblock/stage3/block0")
    >>> k2 = rng("mixup")
    """

    def __init__(self, key):
        self._key = key

    def __call__(self, name: str):
        return jax.random.fold_in(self._key, _stable_hash(name))

    def fold_step(self, step) -> "RngStream":
        """Return a stream unique to a training step (step may be traced)."""
        return RngStream(jax.random.fold_in(self._key, step))
