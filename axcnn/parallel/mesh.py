"""Device mesh + data-parallel step sharding.

Parity target (SURVEY.md §2.10, §5.8): the reference's only distribution
strategy is single-node data parallelism (``MirroredStrategy`` + NCCL
allreduce). The TPU-native equivalent: a 1-D ``data`` mesh over all chips,
the train step wrapped in ``shard_map`` with the global batch sharded on its
leading axis, and gradients ``lax.pmean``-ed over ICI inside the step — XLA
schedules the allreduce; there is no separate communication layer.

The mesh is built 1-D today but the API carries named axes so TP/spatial
axes can be added without touching call sites (SURVEY.md §5.7: CNNs at
224² need no TP/PP for parity; hooks only).

Multi-host: ``initialize_distributed()`` wires ``jax.distributed`` (DCN);
each host feeds its local shard of the global batch (per-host input sharding
is in the data loader).
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

DATA_AXIS = "data"

# XLA:CPU in-process collectives ship a 40 s rendezvous termination timeout;
# on a 1-core host running many virtual devices, a large program's
# per-device threads reach the first collective staggered past it (fatal
# crash — measured with the R152+KD dryrun). Pass as per-compile
# ``compiler_options`` for big programs on virtual CPU meshes; other
# backends ignore the xla_cpu_* fields. (The XLA_FLAGS spelling differs —
# use compiler_options, which also works when JAX is already initialized.)
CPU_COLLECTIVE_TIMEOUT_OPTIONS = {
    "xla_cpu_collective_call_warn_stuck_seconds": "300",
    "xla_cpu_collective_call_terminate_timeout_seconds": "1800",
}


def make_mesh(num_devices: int = 0, *, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices
    (0 = all visible)."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def initialize_distributed(coordinator: str | None = None, *, num_processes=None,
                           process_id=None):
    """Multi-host bring-up (the reference's TF_CONFIG/grpc equivalent)."""
    if coordinator:
        jax.distributed.initialize(coordinator, num_processes, process_id)
    return jax.process_count(), jax.process_index()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_to_mesh(tree, mesh: Mesh):
    """Place a pytree replicated over ``mesh`` (any axis set).

    Multi-process: built with ``make_array_from_process_local_data`` — a
    purely LOCAL construction — instead of ``jax.device_put``, whose
    multihost path first runs ``multihost_utils.assert_equal`` (an
    allgather of the entire tree) as a cross-host collective; with ranks
    staggered in compilation that check can exceed the collective timeout
    and kill the run (observed). The values are equal on every host by
    construction here (seeded init / shared checkpoint).
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(tree, sharding)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)), tree)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch with leading dim sharded over the data axis.

    Single-process: a plain sharded device_put. Multi-host: each process
    passes its LOCAL shard (1/process_count of the global batch, read from
    its disjoint file shards) and the global array is assembled without any
    cross-host data movement."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(sharding, x), batch)
    return jax.device_put(batch, sharding)


def _shard_map(fn, mesh, in_specs, out_specs):
    try:  # jax >= 0.7 public API
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                             check_vma=False)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def shard_train_step(train_step, mesh: Mesh):
    """Wrap a per-shard ``train_step(state, batch, key)`` (built with
    ``axis_name=DATA_AXIS``) into a jitted global-batch step.

    State/key replicated; batch sharded on dim 0. Gradients/metrics are
    pmean-ed inside the step, so outputs are replicated. State buffers are
    donated — XLA updates params in place.
    """
    mapped = _shard_map(
        train_step, mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped, donate_argnums=(0,))


def shard_eval_step(eval_step, mesh: Mesh):
    """Eval metrics are sums — psum them across shards so the caller sees
    global counts."""

    def _step(state, batch):
        metrics = eval_step(state, batch)
        return jax.lax.psum(metrics, DATA_AXIS)

    mapped = _shard_map(_step, mesh, in_specs=(P(), P(DATA_AXIS)), out_specs=P())
    return jax.jit(mapped)
