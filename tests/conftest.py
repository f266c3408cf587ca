"""Test environment: force CPU with 8 virtual devices (SURVEY.md §4 item 2).

Tests never touch the real TPU — data-parallel semantics (psum, per-host
sharding) are validated on a simulated 8-device host mesh, exactly how the
driver's ``dryrun_multichip`` does it. Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# This machine has 1 CPU core and ~0.8s XLA compile latency per op; cache
# every compiled executable so test reruns skip compilation entirely.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.environ.get("AXCNN_CACHE_DIR",
                   os.path.expanduser("~/.cache/axcnn_jax_cache")))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

# The axon PJRT plugin PREPENDS itself to jax_platforms, overriding the env
# var ("axon,cpu" → TPU wins). Force CPU via the config API, which the plugin
# cannot override. Without this, "CPU" tests silently run on the tunneled TPU.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()
