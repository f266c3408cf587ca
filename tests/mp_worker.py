"""Worker process for the real multi-process (multi-host) test.

NOT a pytest module — spawned by tests/test_multiprocess.py, two processes
on localhost, each with 2 virtual CPU devices (a 2-host x 2-device DP mesh:
the smallest topology that exercises jax.distributed bring-up, per-host
input sharding, make_array_from_process_local_data batch assembly, psum
gradient allreduce across HOSTS, and the uneven-eval-shard padding).

Usage: python mp_worker.py <pid> <nprocs> <data_dir> <port>
Prints 'RESULT <json>' on success; any exception exits nonzero.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

# 2 virtual devices per process (drop any inherited force flag, e.g. the
# test conftest's =8 — duplicated flags are ambiguous)
_kept = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    _kept + ["--xla_force_host_platform_device_count=2"])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    data_dir, port = sys.argv[3], sys.argv[4]
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nprocs,
                               process_id=pid,
                               cluster_detection_method="deactivate")
    assert jax.process_count() == nprocs
    assert jax.device_count() == 2 * nprocs

    def barrier(name, timeout_ms=900_000):
        # coordination-service barrier (NOT a Gloo collective): ranks can
        # arrive minutes apart without tripping any transport deadline.
        # Needed because Gloo context init has a hard 30 s key-exchange
        # timeout, and per-rank compile-cache asymmetry (one rank warm, the
        # other cold) was measured to stagger the ranks ~5 minutes at the
        # first collective. Internal API, acceptable in a test worker.
        from jax._src import distributed

        if distributed.global_state.client is not None:
            distributed.global_state.client.wait_at_barrier(name, timeout_ms)

    import numpy as np

    from axcnn.core.dtypes import BF16_POLICY
    from axcnn.data.datasets import DatasetInfo
    from axcnn.data.pipeline import TFRecordImageLoader, device_prefetch
    from axcnn.models.resnet import ModelConfig
    from axcnn.parallel.mesh import (
        make_mesh, shard_train_step, shard_eval_step, batch_sharding,
        replicate_to_mesh, DATA_AXIS)
    from axcnn.train.loop import evaluate
    from axcnn.train.schedules import make_lr_schedule
    from axcnn.train.train_step import (
        create_train_state, make_train_step, make_eval_step)

    info = DatasetInfo("tiny", num_classes=5, num_train=16, num_eval=16,
                       train_prefix="train", eval_prefix="validation")
    cfg = ModelConfig(resnet_size=50, num_classes=5, use_resnet_d=True,
                      use_se_block=True, zero_gamma=True)
    mesh = make_mesh()  # all 4 global devices
    global_bs = 8
    local_bs = global_bs // nprocs

    # --- per-host train loading + one DP step across hosts -----------------
    train_loader = TFRecordImageLoader(
        data_dir, info, batch_size=local_bs, train=True, image_size=32,
        seed=3, num_workers=2, host_id=pid, num_hosts=nprocs)
    train_step = make_train_step(
        cfg, lr_schedule=make_lr_schedule(base_lr=0.1, total_steps=10,
                                          warmup_steps=2),
        total_steps=10, policy=BF16_POLICY, label_smoothing=0.1,
        mixup_alpha=0.2, weight_decay=1e-4, use_ema=True, axis_name=DATA_AXIS)
    state = create_train_state(jax.random.key(0), cfg, use_ema=True)
    state = replicate_to_mesh(state, mesh)  # no cross-host assert collective

    it = device_prefetch(iter(train_loader), size=1,
                         sharding=batch_sharding(mesh))
    first = next(it)
    # AOT-compile BEFORE executing: compilation is collective-free, so both
    # processes finish it before either blocks in a cross-host allreduce —
    # with cold caches, lazy compile staggers the ranks by minutes on this
    # 1-core box and times out the Gloo collective (observed flake). The
    # raised in-process collective timeouts cover the intra-host legs.
    from axcnn.parallel.mesh import CPU_COLLECTIVE_TIMEOUT_OPTIONS as timeouts
    step_fn = shard_train_step(train_step, mesh).lower(
        state, first, jax.random.key(1)).compile(compiler_options=timeouts)
    barrier("dp_compiled")
    losses = []
    batch = first
    for i in range(2):
        state, metrics = step_fn(state, batch, jax.random.key(1))
        losses.append(float(jax.device_get(metrics["loss"])))
        if i == 0:
            batch = next(it)
    assert all(np.isfinite(l) for l in losses), losses

    # --- uneven-shard eval: host 0 owns 12 records, host 1 owns 4 ----------
    # (shards were built uneven by the parent; without batch-count agreement
    # the per-batch psum deadlocks — the padding fix makes this terminate)
    eval_loader = TFRecordImageLoader(
        data_dir, info, batch_size=local_bs, train=False, image_size=32,
        num_workers=2, host_id=pid, num_hosts=nprocs, drop_remainder=False)
    eval_step = make_eval_step(cfg, policy=BF16_POLICY)
    sample = {"images": np.zeros((local_bs, 32, 32, 3), np.uint8),
              "labels": -np.ones((local_bs,), np.int32)}
    # assemble the GLOBAL batch from the per-host shard, exactly like the
    # prefetcher does (device_put would treat the local array as the whole
    # global value and compile for the wrong shape)
    sample = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            batch_sharding(mesh), x), sample)
    eval_fn = shard_eval_step(eval_step, mesh).lower(
        state, sample).compile(compiler_options=timeouts)
    barrier("eval_compiled")
    metrics = evaluate(eval_fn, state, eval_loader, batch_size=local_bs,
                       mesh=mesh, prefetch=1)

    # --- spatial partitioning ACROSS hosts: (data=2 hosts, spatial=2) ------
    # mesh rows align with processes (2 local devices, spatial=2), so each
    # host feeds full-H rows and make_array_from_process_local_data slices
    # the H split onto its local devices; GSPMD halo exchange crosses only
    # intra-host device boundaries, BN stats/grad reductions cross hosts.
    from axcnn.parallel.spatial import (make_spatial_mesh,
                                        spatial_batch_sharding,
                                        spatial_train_step)

    smesh = make_spatial_mesh(2)  # (data=nprocs, spatial=2)
    sp_step = make_train_step(
        cfg, lr_schedule=make_lr_schedule(base_lr=0.1, total_steps=10,
                                          warmup_steps=2),
        total_steps=10, policy=BF16_POLICY, label_smoothing=0.1,
        mixup_alpha=0.2, weight_decay=1e-4, use_ema=True, axis_name=None)
    sp_state = create_train_state(jax.random.key(0), cfg, use_ema=True)
    sp_state = replicate_to_mesh(sp_state, smesh)
    sp_loader = TFRecordImageLoader(
        data_dir, info, batch_size=local_bs, train=True, image_size=32,
        seed=5, num_workers=2, host_id=pid, num_hosts=nprocs)
    sp_it = device_prefetch(iter(sp_loader), size=1,
                            sharding=spatial_batch_sharding(smesh))
    sp_batch = next(sp_it)
    sp_fn = spatial_train_step(sp_step, smesh).lower(
        sp_state, sp_batch, jax.random.key(2)).compile(
        compiler_options=timeouts)  # AOT: see the DP phase note
    barrier("spatial_compiled")
    sp_state, sp_metrics = sp_fn(sp_state, sp_batch, jax.random.key(2))
    sp_loss = float(jax.device_get(sp_metrics["loss"]))
    assert np.isfinite(sp_loss), sp_loss

    print("RESULT " + json.dumps({
        "pid": pid,
        "train_losses": [round(l, 6) for l in losses],
        "eval_count": metrics["count"],
        "eval_top1": round(metrics["top1"], 4),
        "spatial_loss": round(sp_loss, 6),
    }), flush=True)


if __name__ == "__main__":
    main()
