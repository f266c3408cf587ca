"""Device mesh + data-parallel step sharding.

Parity target (SURVEY.md §2.10, §5.8): the reference's only distribution
strategy is single-node data parallelism (``MirroredStrategy`` + NCCL
allreduce). The TPU-native equivalent: a 1-D ``data`` mesh over all chips,
the train step wrapped in ``shard_map`` with the global batch sharded on its
leading axis, and gradients ``lax.pmean``-ed over ICI inside the step — XLA
schedules the allreduce; there is no separate communication layer.

The mesh is 1-D (``data``) on a single slice; on a multi-slice pod
``make_hierarchical_mesh`` builds a 2-D ``(dcn, data)`` mesh — slices on the
major axis, each slice's chips on the minor — and the train step pmean-s over
BOTH axes, so GSPMD lowers the gradient reduction hierarchically: a fast
all-reduce inside each slice over ICI, then one cross-slice exchange of the
already-reduced values over DCN (per-chip DCN traffic ~1/slice_size of a
flat all-reduce's). Spatial partitioning is a separate mesh style
(``axcnn.parallel.spatial``) with its own batch/step wrappers; the helpers
here treat EVERY mesh axis as a batch axis.

Multi-host: ``initialize_distributed()`` wires ``jax.distributed`` (DCN);
each host feeds its local shard of the global batch (per-host input sharding
is in the data loader).
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding

DATA_AXIS = "data"
DCN_AXIS = "dcn"

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


def _slice_key(d):
    """Grouping key for DCN topology: which ICI domain a device lives in.

    TPU multi-slice exposes ``slice_index``; single-slice devices (and CPU
    virtual devices) don't have it, in which case the process is the best
    available proxy for "connected by fast links" (CPU test meshes) — a
    single-process single-slice run collapses to one group either way.
    """
    s = getattr(d, "slice_index", None)
    return d.process_index if s is None else s


def detect_num_slices(devices=None) -> int:
    """Number of distinct ICI domains among the visible devices."""
    devices = devices if devices is not None else jax.devices()
    return len({_slice_key(d) for d in devices})


def make_hierarchical_mesh(dcn: int = 0, *, devices=None) -> Mesh:
    """(dcn, data) mesh: slices major, each slice's chips minor.

    ``dcn=0`` auto-detects the slice count. Devices are grouped by ICI
    domain (``_slice_key``) so every ``data`` row is one slice: the inner
    all-reduce rides ICI and only the ``dcn`` axis touches the slow
    cross-slice network. A row mixing slices is an error, not a silent
    DCN-inner-loop — with no slice structure (``dcn`` groups of equal size
    unavailable) the caller should use the flat ``make_mesh``.
    """
    devices = list(devices if devices is not None else jax.devices())
    devices = sorted(devices, key=lambda d: (_slice_key(d), d.process_index,
                                             d.id))
    dcn = dcn or detect_num_slices(devices)
    if dcn < 1 or len(devices) % dcn:
        raise ValueError(
            f"{len(devices)} devices not divisible into dcn={dcn} slices")
    grid = np.array(devices).reshape(dcn, len(devices) // dcn)
    keys = {_slice_key(d) for d in devices}
    if len(keys) == dcn:  # real slice structure: rows must be single-slice
        for row in grid:
            row_keys = {_slice_key(d) for d in row}
            if len(row_keys) > 1:
                raise ValueError(
                    f"dcn row spans ICI domains {sorted(row_keys)}: slice "
                    "sizes are uneven; pass an explicit device list")
    return Mesh(grid, (DCN_AXIS, DATA_AXIS))


def data_axes(mesh: Mesh) -> tuple:
    """Every axis of a DP mesh is a batch axis — ``('data',)`` flat,
    ``('dcn', 'data')`` hierarchical. Pass as ``axis_name`` to the step
    builders; ``lax.pmean``/``axis_index`` accept the tuple and GSPMD lowers
    the reduction hierarchically along the mesh's physical ordering."""
    return tuple(mesh.axis_names)


def initialize_distributed(coordinator: str | None = None, *, num_processes=None,
                           process_id=None):
    """Multi-host bring-up (the reference's TF_CONFIG/grpc equivalent)."""
    if coordinator:
        jax.distributed.initialize(coordinator, num_processes, process_id)
    return jax.process_count(), jax.process_index()


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(data_axes(mesh)))


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
    ``axis_name=data_axes(mesh)``) into a jitted global-batch step.

    State/key replicated; batch sharded on dim 0 over every mesh axis.
    Gradients/metrics are pmean-ed inside the step, so outputs are
    replicated. State buffers are donated — XLA updates params in place.
    """
    mapped = _shard_map(
        train_step, mesh,
        in_specs=(P(), P(data_axes(mesh)), P()),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped, donate_argnums=(0,))


def shard_eval_step(eval_step, mesh: Mesh):
    """Eval metrics are sums — psum them across shards so the caller sees
    global counts."""
    axes = data_axes(mesh)

    def _step(state, batch):
        metrics = eval_step(state, batch)
        return jax.lax.psum(metrics, axes)

    mapped = _shard_map(_step, mesh, in_specs=(P(), P(axes)), out_specs=P())
    return jax.jit(mapped)
