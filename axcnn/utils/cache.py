"""Persistent XLA compile-cache location, overridable via ``AXCNN_CACHE_DIR``.

Every drive script and the driver entry (`__graft_entry__.py`) point JAX's
persistent compilation cache here so warm re-runs compile in seconds. The
round-4 review flagged the hard-coded ``/root/.cache`` paths; this is the
single source of truth.
"""

import os


def cache_dir() -> str:
    return os.environ.get(
        "AXCNN_CACHE_DIR", os.path.expanduser("~/.cache/axcnn_jax_cache"))
