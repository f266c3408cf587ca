"""Worker for the multi-controller checkpoint save→kill→resume test.

NOT a pytest module — spawned by tests/test_multiprocess.py in three
phases, 2 OS processes each (2 virtual CPU devices per process):

- ``full``  : train 4 steps straight, record per-step losses;
- ``part1`` : train 2 steps, then ``CheckpointManager.save`` — an orbax
  COLLECTIVE under ``jax.process_count() == 2`` (the path loop.py's
  periodic/final saves take on real pods, unexercised before this test) —
  and exit (the "kill");
- ``part2`` : a FRESH pair of processes restores (local template →
  ``replicate_to_mesh``, exactly like loop.run), resumes the loader at the
  consumed position, and trains 2 more steps.

The parent asserts part1+part2 losses match ``full`` bitwise: checkpoint
round-trip, optimizer/EMA state, and the data stream all continue exactly.
(Reference parity: Estimator's auto-restore contract, SURVEY.md §5.3/§5.4.)

Usage: python mp_ckpt_worker.py <pid> <nprocs> <data_dir> <port> <phase> <ckpt_dir>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

_kept = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    _kept + ["--xla_force_host_platform_device_count=2"])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    data_dir, port, phase, ckpt_dir = sys.argv[3:7]
    jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=nprocs,
                               process_id=pid,
                               cluster_detection_method="deactivate")

    def barrier(name, timeout_ms=900_000):
        # coordination-service barrier; see mp_worker.py for the rationale
        from jax._src import distributed

        if distributed.global_state.client is not None:
            distributed.global_state.client.wait_at_barrier(name, timeout_ms)

    import dataclasses

    import numpy as np

    from axcnn.ckpt.checkpoint import CheckpointManager
    from axcnn.core.dtypes import BF16_POLICY
    from axcnn.data.datasets import DatasetInfo
    from axcnn.data.pipeline import TFRecordImageLoader, device_prefetch
    from axcnn.models.resnet import ModelConfig
    from axcnn.parallel.mesh import (
        make_mesh, shard_train_step, batch_sharding, replicate_to_mesh,
        DATA_AXIS, CPU_COLLECTIVE_TIMEOUT_OPTIONS as timeouts)
    from axcnn.train.schedules import make_lr_schedule
    from axcnn.train.train_step import create_train_state, make_train_step

    steps = {"full": 4, "part1": 2, "part2": 2}[phase]
    info = DatasetInfo("tiny", num_classes=5, num_train=24, num_eval=24,
                       train_prefix="train", eval_prefix="validation")
    # same cfg/hparams as mp_worker.py's DP phase (shared compile cache)
    cfg = ModelConfig(resnet_size=50, num_classes=5, use_resnet_d=True,
                      use_se_block=True, zero_gamma=True)
    mesh = make_mesh()
    local_bs = 8 // nprocs

    loader = TFRecordImageLoader(
        data_dir, info, batch_size=local_bs, train=True, image_size=32,
        seed=3, num_workers=2, host_id=pid, num_hosts=nprocs)
    train_step = make_train_step(
        cfg, lr_schedule=make_lr_schedule(base_lr=0.1, total_steps=10,
                                          warmup_steps=2),
        total_steps=10, policy=BF16_POLICY, label_smoothing=0.1,
        mixup_alpha=0.2, weight_decay=1e-4, use_ema=True, axis_name=DATA_AXIS)
    state = create_train_state(jax.random.key(0), cfg, use_ema=True)

    mgr = CheckpointManager(ckpt_dir, model_config=dataclasses.asdict(cfg)) \
        if phase != "full" else None
    if phase == "part2":
        restored = mgr.restore(state)
        assert restored is not None, f"no checkpoint in {ckpt_dir}"
        state, loader_state, _ = restored
        loader.state = loader_state
        assert int(state.step) == 2, int(state.step)
        # replicate_to_mesh's cross-process device_put creates a NEW Gloo
        # context whose init has a hard 30 s key-exchange timeout — on the
        # contended 1-core host a skewed peer (restore I/O, compile cache
        # misses) can exceed it, so re-align ranks first
        barrier("ckpt_restored")
    state = replicate_to_mesh(state, mesh)

    it = device_prefetch(iter(loader), size=1, sharding=batch_sharding(mesh),
                         state_fn=lambda: loader.state)
    first = next(it)
    step_fn = shard_train_step(train_step, mesh).lower(
        state, first, jax.random.key(1)).compile(compiler_options=timeouts)
    barrier(f"ckpt_compiled_{phase}")
    losses = []
    batch = first
    for i in range(steps):
        state, metrics = step_fn(state, batch, jax.random.key(1))
        losses.append(float(jax.device_get(metrics["loss"])))
        if i + 1 < steps:
            batch = next(it)
    assert all(np.isfinite(l) for l in losses), losses

    if phase == "part1":
        # the orbax save is a COLLECTIVE (and creates the 2-rank Gloo
        # context): re-align before entering so per-rank skew accumulated
        # over the train steps can't trip the 30 s context-init timeout
        barrier("ckpt_presave")
        mgr.save(state, loader_state=it.consumed_state or loader.state,
                 rng_seed=0)
        mgr.wait()
    if mgr is not None:
        mgr.close()

    print("RESULT " + json.dumps({"pid": pid, "phase": phase,
                                  "losses": losses}), flush=True)


if __name__ == "__main__":
    main()
