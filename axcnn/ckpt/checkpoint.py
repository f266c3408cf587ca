"""Checkpoint/resume via orbax — full training-state round-trip.

Parity target (SURVEY.md §5.4): the reference's ``Saver`` checkpoints carry
weights + momentum slots + EMA shadow variables + global_step, with
``keep_checkpoint_max`` retention; Estimator auto-restores the latest on
restart. We additionally checkpoint the **data-loader position** — the
reference silently restarts tf.data from scratch on resume (SURVEY.md §5.3);
our loader state is two integers, so resume is exact.

Checkpoint layout (an orbax pytree):
    step / params / model_state / velocity / ema / rng_seed / loader_state
The ``ema`` subtree is the "checkpoint-compatible EMA weights" surface from
BASELINE.json — ``axcnn.ckpt.tf_import`` maps the reference's
``<var>/ExponentialMovingAverage`` names onto it.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from axcnn.data.pipeline import LoaderState
from axcnn.train.train_step import TrainState


class CheckpointManager:
    def __init__(self, directory: str, *, max_to_keep: int = 5,
                 save_interval_steps: int = 1,
                 model_config: dict | None = None):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        if model_config is not None and jax.process_index() == 0:
            # architecture sidecar: lets a later run (e.g. KD teacher loading,
            # loop._load_teacher) rebuild this checkpoint's exact model
            # structure without guessing flags — the reference encodes this
            # only implicitly in the recipe script that produced the ckpt
            with open(os.path.join(self._dir, "model_config.json"), "w") as f:
                json.dump(model_config, f, indent=1, default=str)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, state: TrainState, *, loader_state: LoaderState | None = None,
             rng_seed: int = 0, force: bool = False):
        step = int(jax.device_get(state.step))
        payload = {
            "step": step,
            "params": state.params,
            "model_state": state.model_state,
            "velocity": state.velocity,
            "rng_seed": rng_seed,
            "loader_epoch": int(loader_state.epoch) if loader_state else 0,
            "loader_batches": int(loader_state.batches_yielded) if loader_state else 0,
        }
        if state.ema is not None:
            payload["ema"] = state.ema
        self._mgr.save(step, args=ocp.args.StandardSave(payload), force=force)
        return step

    def model_config(self) -> dict | None:
        """The architecture sidecar written by the producing run, or None
        (pre-sidecar checkpoints)."""
        path = os.path.join(self._dir, "model_config.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def wait(self):
        self._mgr.wait_until_finished()

    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, state: TrainState, *, step: int | None = None):
        """Restore into the structure of ``state``; returns
        (TrainState, LoaderState, rng_seed) or None if no checkpoint."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        template = {
            "step": 0,
            "params": state.params,
            "model_state": state.model_state,
            "velocity": state.velocity,
            "rng_seed": 0,
            "loader_epoch": 0,
            "loader_batches": 0,
        }
        if state.ema is not None:
            template["ema"] = state.ema
        # Abstract templates (jax.eval_shape leaves, e.g. the KD-teacher
        # load) carry sharding=None; orbax then reads the sharding file
        # written at save time, which names the SAVING topology's devices —
        # a TPU-written checkpoint restored on the CPU backend (acceptance
        # config-5: virtual-8 CPU mesh, teacher trained on the chip) fails
        # with "sharding ... Got None". Cross-topology restore is a
        # supported contract here, so pin abstract leaves to a concrete
        # sharding: REPLICATED over all global devices (the teacher/template
        # is replicated anyway; run() re-shards onto the mesh after restore).
        # jax.devices() is identical on every process, so the choice is
        # globally consistent in multi-controller runs — unlike the previous
        # SingleDeviceSharding(local_devices()[0]) pin, where each process
        # named a different device and a collective restore diverged (and a
        # large teacher was forced onto one device's HBM).
        import numpy as _np
        repl = jax.sharding.NamedSharding(
            jax.sharding.Mesh(_np.array(jax.devices()), ("all",)),
            jax.sharding.PartitionSpec())
        template = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=repl)
            if isinstance(x, jax.ShapeDtypeStruct) and x.sharding is None
            else x, template)
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        new_state = TrainState(
            step=np.int32(restored["step"]),
            params=restored["params"],
            model_state=restored["model_state"],
            velocity=restored["velocity"],
            ema=restored.get("ema"),
        )
        loader_state = LoaderState(
            epoch=restored["loader_epoch"], batches_yielded=restored["loader_batches"])
        return new_state, loader_state, restored["rng_seed"]

    def close(self):
        self._mgr.close()
