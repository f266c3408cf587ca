"""Spatial partitioning: shard the image H axis across chips (GSPMD).

SURVEY.md §5.7: the reference has no sequence/context parallelism (CNN
classifier, no sequence axis) — the honest analogue for CNNs is sharding the
SPATIAL axes of large images across chips, with the compiler exchanging
convolution halos over ICI. The reference cannot do this at all; here it is
an opt-in second parallelism axis (``--runtime.spatial_partitions``) for
high-resolution work (large-image FGVC fine-tune, 448²+ inputs) where one
chip's HBM or FLOPs are not enough per image.

TPU-first design — this is the *other* idiomatic JAX distribution style from
the shard_map DP path in ``axcnn.parallel.mesh``:

- The step function is built with ``axis_name=None`` (pure global-batch
  semantics — no explicit collectives in user code).
- A 2-D ``(data, spatial)`` mesh; images are placed with
  ``P('data', 'spatial', None, None)`` (batch over ``data``, H over
  ``spatial``), parameters replicated.
- ``jax.jit`` + GSPMD partitions every op: convolutions get halo exchanges
  on the H boundary, BN batch statistics become cross-device reductions
  (exactly global-batch sync-BN), gradient reductions fall out of the
  partitioned transpose — XLA schedules all communication over ICI.

Because the program is logically the single-device program, a spatial run is
numerically the global-batch computation (one mixup draw, global BN stats,
global DropBlock masks) — pinned against the unsharded step in
tests/test_spatial.py.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def order_spatial_devices(devices, spatial: int, data: int = 0, *,
                          sort: bool = True) -> np.ndarray:
    """Arrange devices into the (data, spatial) grid, host-contiguous rows.

    ``jax.devices()`` order is NOT guaranteed process-contiguous on a
    multi-host slice, but every spatial row must live on ONE host: the halo
    exchange is nearest-neighbor traffic that should ride ICI, and
    ``make_array_from_process_local_data`` requires each host's local batch
    rows to cover its addressable devices. Sorting by (process_index, id)
    makes rows process-local whenever ``spatial`` divides the per-host device
    count (enforced in loop.py); a row that still spans hosts is an error,
    not a silent DCN halo path. ``sort=False`` preserves the caller's
    explicit ordering (e.g. hand-placed ICI adjacency) — the host-spanning
    check below still applies.
    """
    if sort:
        devices = sorted(devices, key=lambda d: (d.process_index, d.id))
    if spatial < 1:
        raise ValueError(f"spatial must be >= 1, got {spatial}")
    if len(devices) % spatial:
        raise ValueError(
            f"{len(devices)} devices not divisible by spatial={spatial}")
    data = data or len(devices) // spatial
    grid = np.array(devices[: data * spatial]).reshape(data, spatial)
    for row in grid:
        hosts = {d.process_index for d in row}
        if len(hosts) > 1:
            raise ValueError(
                f"spatial row spans hosts {sorted(hosts)}: spatial={spatial} "
                "must divide each host's local device count so halo exchange "
                "stays on ICI")
    return grid


def make_spatial_mesh(spatial: int, data: int = 0, *, devices=None) -> Mesh:
    """(data, spatial) mesh. ``data=0`` uses all remaining visible devices.

    Keep ``spatial`` on the minor (fastest / most local) axis of the device
    order: halo exchange is nearest-neighbor traffic, so the spatially
    adjacent shards should sit on ICI neighbors. An explicitly passed
    ``devices`` list is honored in the caller's order (hand-placed ICI
    adjacency); only the default ``jax.devices()`` is re-sorted
    host-contiguously.
    """
    explicit = devices is not None
    devices = list(devices) if explicit else list(jax.devices())
    return Mesh(order_spatial_devices(devices, spatial, data,
                                      sort=not explicit),
                (DATA_AXIS, SPATIAL_AXIS))


def spatial_batch_sharding(mesh: Mesh):
    """Per-leaf shardings: images (N, H, W, C) split batch x height."""
    return {
        "images": NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS, None, None)),
        "labels": NamedSharding(mesh, P(DATA_AXIS)),
    }


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _trace_with_xla_dispatch(fn):
    """Trace ``fn`` with Pallas dispatch disabled: this jit is
    GSPMD-partitioned, and a ``pallas_call`` inside it has no SPMD
    partitioning rule — the partitioner would replicate its operands
    (all-gathering every H-sharded DropBlock input) or fail. The XLA
    implementations partition cleanly (ops/dispatch.py force_xla)."""
    from axcnn.ops.dispatch import force_xla

    def traced(*args):
        with force_xla("GSPMD spatial-partitioned program"):
            return fn(*args)

    return traced


def spatial_train_step(train_step, mesh: Mesh):
    """Jit a global-semantics ``train_step(state, batch, key)`` (built with
    ``axis_name=None``) over the (data, spatial) mesh.

    State and key replicated, batch spatially sharded; GSPMD inserts the
    halo exchanges / reductions. State buffers donated.
    """
    rep = replicated(mesh)
    return jax.jit(
        _trace_with_xla_dispatch(train_step),
        in_shardings=(rep, spatial_batch_sharding(mesh), rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )


def spatial_eval_step(eval_step, mesh: Mesh):
    rep = replicated(mesh)
    return jax.jit(
        _trace_with_xla_dispatch(eval_step),
        in_shardings=(rep, spatial_batch_sharding(mesh)),
        out_shardings=rep,
    )
