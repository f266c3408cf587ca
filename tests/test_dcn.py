"""Hierarchical multi-slice data parallelism (axcnn/parallel/mesh.py
make_hierarchical_mesh): device grouping by ICI domain, (dcn, data)
train/eval equivalence against the flat mesh on the 8-device CPU mesh, and
the --runtime.dcn_slices wiring through the run loop.

The reference's only distribution strategy is single-node NCCL data
parallelism (SURVEY.md §2.10); multi-slice DCN hierarchy is a TPU-native
extension — the numerics contract is that the hierarchical mesh computes
exactly the flat mesh's step (same shard groups, same per-shard RNG linear
index, pmean over both axes == pmean over one).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from axcnn.models.resnet import ModelConfig
from axcnn.parallel.mesh import (DATA_AXIS, DCN_AXIS, batch_sharding,
                                 data_axes, detect_num_slices, make_mesh,
                                 make_hierarchical_mesh, shard_batch,
                                 shard_eval_step, shard_train_step)
from axcnn.train.schedules import make_lr_schedule
from axcnn.train.train_step import (create_train_state, make_eval_step,
                                    make_train_step)

# hierarchical two-level mesh integration — release tier; `-m 'not slow'` is the dev loop
pytestmark = pytest.mark.slow

SMALL = ModelConfig(resnet_size=50, num_classes=10)


def _small_batch(n=16, size=32, num_classes=10, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "images": rng.integers(0, 256, (n, size, size, 3), dtype=np.uint8),
        "labels": rng.integers(0, num_classes, (n,), dtype=np.int32),
    }


@dataclasses.dataclass(frozen=True)
class FakeDev:
    id: int
    process_index: int
    slice_index: int


class TestMeshGrouping:
    def test_rows_are_single_slice(self):
        """Interleaved jax.devices() order must regroup so each data row is
        one ICI domain (slice), slice-major."""
        devs = [FakeDev(id=i, process_index=i // 4, slice_index=i % 2)
                for i in range(8)]  # slices interleaved in enumeration order
        mesh = make_hierarchical_mesh(devices=devs)  # dcn auto-detected = 2
        assert mesh.axis_names == (DCN_AXIS, DATA_AXIS)
        grid = np.asarray(mesh.devices)
        assert grid.shape == (2, 4)
        for row in grid:
            assert len({d.slice_index for d in row}) == 1
        # slice-major ordering
        assert [row[0].slice_index for row in grid] == [0, 1]

    def test_detect_num_slices(self):
        devs = [FakeDev(id=i, process_index=0, slice_index=i % 4)
                for i in range(8)]
        assert detect_num_slices(devs) == 4
        # CPU/virtual devices carry no slice_index → process is the proxy
        assert detect_num_slices(jax.devices()) == 1

    def test_uneven_slices_rejected(self):
        devs = ([FakeDev(id=i, process_index=0, slice_index=0)
                 for i in range(5)]
                + [FakeDev(id=5 + i, process_index=0, slice_index=1)
                   for i in range(3)])
        with pytest.raises(ValueError, match="uneven"):
            make_hierarchical_mesh(devices=devs)

    def test_indivisible_rejected(self):
        devs = [FakeDev(id=i, process_index=0, slice_index=0)
                for i in range(6)]
        with pytest.raises(ValueError, match="divisible"):
            make_hierarchical_mesh(dcn=4, devices=devs)

    def test_batch_sharding_spec(self):
        mesh = make_hierarchical_mesh(dcn=2, devices=jax.devices())
        assert data_axes(mesh) == (DCN_AXIS, DATA_AXIS)
        x = np.arange(16.0)
        arr = jax.device_put(x, batch_sharding(mesh))
        # dcn-major linear order: device k holds rows [2k, 2k+1]
        for k, shard in enumerate(sorted(arr.addressable_shards,
                                         key=lambda s: s.index[0].start)):
            np.testing.assert_array_equal(np.asarray(shard.data),
                                          x[2 * k: 2 * k + 2])


class TestHierarchicalEquivalence:
    def test_train_step_matches_flat(self):
        """(2, 4) hierarchical == flat 8-way: identical shard groups and
        per-shard RNG linear index, pmean over ('dcn','data') == pmean over
        'data'; only fp reassociation of the two-phase reduction differs."""
        kwargs = dict(
            lr_schedule=make_lr_schedule(base_lr=0.1, total_steps=10,
                                         warmup_steps=0),
            total_steps=10, label_smoothing=0.1, mixup_alpha=0.2,
            weight_decay=1e-4, use_ema=True)
        batch = _small_batch(n=16)
        key = jax.random.key(3)

        flat_mesh = make_mesh(8)
        flat = shard_train_step(
            make_train_step(SMALL, axis_name=DATA_AXIS, **kwargs), flat_mesh)
        s1, m1 = flat(jax.device_put(create_train_state(
            jax.random.key(0), SMALL, use_ema=True)),
            shard_batch(flat_mesh, batch), key)

        hmesh = make_hierarchical_mesh(dcn=2, devices=jax.devices())
        hier = shard_train_step(
            make_train_step(SMALL, axis_name=data_axes(hmesh), **kwargs),
            hmesh)
        s2, m2 = hier(jax.device_put(create_train_state(
            jax.random.key(0), SMALL, use_ema=True)),
            shard_batch(hmesh, batch), key)

        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=2e-4)
        np.testing.assert_allclose(float(m1["mixup_lam"]),
                                   float(m2["mixup_lam"]), rtol=1e-6)
        for name, a, b in (
                ("head.w", s1.params["head"]["w"], s2.params["head"]["w"]),
                ("ema head.w", s1.ema["head"]["w"], s2.ema["head"]["w"])):
            np.testing.assert_allclose(np.asarray(jax.device_get(a)),
                                       np.asarray(jax.device_get(b)),
                                       atol=2e-4, err_msg=name)

    def test_eval_step_matches_flat(self):
        batch = _small_batch(n=16)
        state = jax.device_put(create_train_state(jax.random.key(0), SMALL,
                                                  use_ema=False))
        flat_mesh = make_mesh(8)
        m1 = jax.device_get(shard_eval_step(
            make_eval_step(SMALL), flat_mesh)(
                state, shard_batch(flat_mesh, batch)))
        hmesh = make_hierarchical_mesh(dcn=2, devices=jax.devices())
        m2 = jax.device_get(shard_eval_step(
            make_eval_step(SMALL), hmesh)(state, shard_batch(hmesh, batch)))
        assert float(m1["count"]) == float(m2["count"]) == 16.0
        np.testing.assert_allclose(float(m1["loss_sum"]),
                                   float(m2["loss_sum"]), rtol=2e-5)
        assert float(m1["top1"]) == float(m2["top1"])


class TestRunLoopDCN:
    def test_run_loop_dcn_smoke(self, tmp_path):
        """--runtime.dcn_slices=2 end to end on synthetic data: the loop
        builds the (dcn, data) mesh, passes the tuple axis_name, trains and
        evals without error."""
        from axcnn.train.loop import run
        from axcnn.utils.config import (Config, DataConfig, RuntimeConfig,
                                        TrainConfig)

        cfg = Config(
            model=ModelConfig(resnet_size=50, num_classes=1001,
                              width_multiplier=0.25),
            data=DataConfig(dataset_name="imagenet", use_synthetic_data=True,
                            image_size=32),
            train=TrainConfig(batch_size=16, train_steps=2,
                              base_lr=0.01, lr_warmup_epochs=0, dtype="fp32",
                              log_every=1, use_ema=False, seed=0),
            runtime=RuntimeConfig(model_dir=str(tmp_path), dcn_slices=2),
        )
        run(cfg)
        metrics = os.path.join(str(tmp_path), "metrics.jsonl")
        assert os.path.exists(metrics)
        tags = [ln for ln in open(metrics)]
        assert any('"tag": "eval"' in ln for ln in tags)
