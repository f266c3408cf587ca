"""Run-loop integration tests on CPU: train→eval→checkpoint→resume→export,
warm-start fine-tune, and KD-teacher loading from a checkpoint
(SURVEY.md §3.1/§3.3 end-to-end paths)."""

import dataclasses
import os

import numpy as np
import pytest

import jax

from axcnn.models.resnet import ModelConfig
from axcnn.utils.config import Config, DataConfig, TrainConfig, RuntimeConfig

# full run-loop integration (train/eval/resume/export) — release tier; `-m 'not slow'` is the dev loop
pytestmark = pytest.mark.slow


def _tiny_cfg(tmp_path, **train_kw):
    train = dict(batch_size=4, train_steps=2, base_lr=0.01, lr_warmup_epochs=0,
                 dtype="fp32", log_every=1, use_ema=True, seed=0)
    train.update(train_kw)
    return Config(
        model=ModelConfig(resnet_size=50, num_classes=1001),
        data=DataConfig(dataset_name="imagenet", use_synthetic_data=True,
                        image_size=32),
        train=TrainConfig(**train),
        # num_devices=1: single-device loop semantics (the 8-way mesh path is
        # covered by tests/test_train.py::TestDataParallel)
        runtime=RuntimeConfig(model_dir=str(tmp_path / "run"), num_devices=1),
    )


class TestPreemption:
    def test_sigterm_handler_restored_on_loop_exception(self, tmp_path,
                                                        monkeypatch):
        """An exception escaping the training loop must not leave the
        process-wide SIGTERM handler pointing at the preemption lambda
        (whose Event no loop reads — graceful preemption would be silently
        swallowed until SIGKILL)."""
        import signal

        from axcnn.train import loop as loop_mod

        def boom(*a, **k):
            raise RuntimeError("eval exploded")

        monkeypatch.setattr(loop_mod, "evaluate", boom)
        prev = signal.getsignal(signal.SIGTERM)
        with pytest.raises(RuntimeError, match="eval exploded"):
            loop_mod.run(_tiny_cfg(tmp_path))
        assert signal.getsignal(signal.SIGTERM) is prev

    def test_sigterm_saves_and_exits_clean(self, tmp_path):
        """SIGTERM mid-training → the loop saves the consumed data position,
        logs preempt_save, and exits 0 (loop.py preemption handling — beyond
        the reference's crash-resume)."""
        import json
        import signal
        import subprocess
        import sys
        import time

        model_dir = str(tmp_path / "run")
        worker = os.path.join(os.path.dirname(__file__), "preempt_worker.py")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        proc = subprocess.Popen([sys.executable, worker, model_dir, "500"],
                                env=env, stdout=subprocess.DEVNULL,
                                stderr=subprocess.STDOUT)
        metrics = os.path.join(model_dir, "metrics.jsonl")
        try:
            # wait for the first completed train step, then signal
            deadline = time.time() + 600
            while time.time() < deadline:
                if os.path.exists(metrics) and any(
                        '"tag": "train"' in ln for ln in open(metrics)):
                    break
                if proc.poll() is not None:
                    raise AssertionError(
                        f"worker died early rc={proc.returncode}")
                time.sleep(1.0)
            else:
                raise AssertionError("worker never reached a train step")
            proc.send_signal(signal.SIGTERM)
            rc = proc.wait(timeout=300)
        finally:
            if proc.poll() is None:
                proc.kill()
        assert rc == 0, rc
        events = [json.loads(ln) for ln in open(metrics)]
        saves = [e for e in events if e["tag"] == "preempt_save"]
        assert saves, [e["tag"] for e in events]
        assert 0 < saves[0]["step"] < 500
        # the save is restorable and carries the preempted step
        from axcnn.ckpt.checkpoint import CheckpointManager
        from axcnn.train.train_step import create_train_state

        state = create_train_state(jax.random.key(0),
                                   ModelConfig(resnet_size=50,
                                               num_classes=1001),
                                   use_ema=True)
        restored = CheckpointManager(
            os.path.join(model_dir, "checkpoints")).restore(state)
        assert restored is not None
        assert int(restored[0].step) == saves[0]["step"]


class TestRunLoop:
    def test_train_eval_resume(self, tmp_path):
        from axcnn.train.loop import run

        cfg = _tiny_cfg(tmp_path)
        m1 = run(cfg)
        assert m1["count"] > 0
        # resume: bump steps, rerun — restores from the saved checkpoint
        cfg2 = dataclasses.replace(cfg)
        cfg2.train = dataclasses.replace(cfg.train, train_steps=4)
        m2 = run(cfg2)
        assert m2["count"] > 0
        metrics_path = os.path.join(cfg.runtime.model_dir, "metrics.jsonl")
        body = open(metrics_path).read()
        assert '"tag": "restore"' in body

    def test_eval_only(self, tmp_path):
        from axcnn.train.loop import run

        cfg = _tiny_cfg(tmp_path)
        run(cfg)
        cfg.runtime.eval_only = True
        m = run(cfg)
        assert set(m) >= {"top1", "top5", "loss", "count"}

    def test_eval_only_with_watchdog(self, tmp_path):
        """eval_only arms the hang watchdog (the 2026-08-19 tunnel wedge hit
        an eval leg) and the per-batch beats keep a healthy eval from
        false-firing — completion with the flag set IS the wiring check."""
        from axcnn.train.loop import run

        cfg = _tiny_cfg(tmp_path)
        run(cfg)
        cfg.runtime.eval_only = True
        cfg.runtime.hang_watchdog_s = 120
        m = run(cfg)
        assert set(m) >= {"top1", "top5", "loss", "count"}
        # the watchdog thread must not outlive run()
        import threading
        assert not any(t.name == "hang-watchdog"
                       for t in threading.enumerate())

    def test_custom_dataset_end_to_end(self, tmp_path):
        """dataset_name='custom' trains on user-built TFRecords through
        run(): build 2-class JPEGs -> write_shards -> train 2 steps -> eval.
        The model head must follow data.num_classes (dataset wins)."""
        from PIL import Image

        from axcnn.data.build_tfrecords import write_shards
        from axcnn.train.loop import run

        rng = np.random.default_rng(0)
        items = {"train": [], "validation": []}
        raw = tmp_path / "raw"
        raw.mkdir()
        for label, name in enumerate(("a", "b")):
            for i in range(6):
                p = str(raw / f"{name}{i}.jpg")
                Image.fromarray(rng.integers(0, 256, (40, 50, 3),
                                             dtype=np.uint8)).save(p, "JPEG")
                items["train" if i < 4 else "validation"].append(
                    (p, label, name))
        rec = str(tmp_path / "rec")
        write_shards(items["train"], rec, "train", 2)
        write_shards(items["validation"], rec, "validation", 1)

        cfg = _tiny_cfg(tmp_path)
        cfg.data = DataConfig(
            dataset_name="custom", data_dir=rec, image_size=32,
            resize_min=32, num_classes=2, num_train_examples=8,
            num_eval_examples=4)
        m = run(cfg)
        assert m["count"] == 4
        # the checkpoint sidecar must record the 2-way head, not the
        # ModelConfig default
        import json

        meta = json.load(open(os.path.join(
            cfg.runtime.model_dir, "checkpoints", "model_config.json")))
        assert meta["num_classes"] == 2

    def test_custom_dataset_requires_counts(self, tmp_path):
        from axcnn.train.loop import run

        cfg = _tiny_cfg(tmp_path)
        cfg.data = DataConfig(dataset_name="custom", data_dir="/nope")
        with pytest.raises(ValueError, match="custom"):
            run(cfg)

    def test_run_on_mesh(self, tmp_path):
        """run() end to end over the 8-device mesh: shard_map train + psum
        eval through the same loop code the CLI uses."""
        import dataclasses as dc

        from axcnn.train.loop import run

        cfg = _tiny_cfg(tmp_path, batch_size=8)
        cfg = dc.replace(cfg, runtime=dc.replace(cfg.runtime, num_devices=8))
        m = run(cfg)
        assert m["count"] > 0 and np.isfinite(m["loss"])

    def test_run_spatial(self, tmp_path):
        """run() with runtime.spatial_partitions=2: GSPMD (data=4, spatial=2)
        mesh through the same loop code the CLI uses."""
        import dataclasses as dc

        from axcnn.train.loop import run

        cfg = _tiny_cfg(tmp_path, batch_size=8)
        cfg = dc.replace(cfg, runtime=dc.replace(
            cfg.runtime, num_devices=8, spatial_partitions=2))
        m = run(cfg)
        assert m["count"] > 0 and np.isfinite(m["loss"])

    def test_predict_cli(self, tmp_path):
        """predict CLI end to end (random-init warning path): JPEG in,
        one JSON line with a 5-entry top-5 out."""
        import io as _io
        import json
        from contextlib import redirect_stdout

        from PIL import Image

        from axcnn.cli.predict import main as predict_main

        img = tmp_path / "in.jpg"
        Image.fromarray(
            np.random.default_rng(0).integers(0, 256, (48, 64, 3),
                                              dtype=np.uint8)).save(img, "JPEG")
        buf = _io.StringIO()
        with redirect_stdout(buf):
            rc = predict_main([f"--image={img}", "--data.image_size=32",
                               "--train.dtype=fp32",
                               f"--runtime.model_dir={tmp_path / 'norun'}"])
        assert rc == 0
        out = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert out["image"] == str(img) and len(out["top5"]) == 5
        probs = [p for _, p in out["top5"]]
        assert all(0.0 <= p <= 1.0 for p in probs)
        # custom datasets predict too (only the head size is needed)
        buf = _io.StringIO()
        with redirect_stdout(buf):
            rc = predict_main([f"--image={img}", "--data.image_size=32",
                               "--train.dtype=fp32",
                               "--data.dataset_name=custom",
                               "--data.num_classes=7",
                               f"--runtime.model_dir={tmp_path / 'norun'}"])
        assert rc == 0
        out = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert all(0 <= c < 7 for c, _ in out["top5"])

    def test_warm_start_excludes_head(self, tmp_path):
        from axcnn.train.loop import run, _warm_start
        from axcnn.train.train_step import create_train_state

        # pretrain a 1001-class model
        cfg = _tiny_cfg(tmp_path)
        run(cfg)
        ckpt_dir = os.path.join(cfg.runtime.model_dir, "checkpoints")

        # fine-tune config: different head size
        ft = _tiny_cfg(tmp_path / "ft")
        ft.model = ModelConfig(resnet_size=50, num_classes=7)
        ft.train = dataclasses.replace(ft.train, pretrained_checkpoint=ckpt_dir)
        state = create_train_state(jax.random.key(1), ft.model, use_ema=True)
        before_head = np.asarray(state.params["head"]["w"])
        before_stem = np.asarray(jax.tree.leaves(state.params["stem"])[0])
        state2 = _warm_start(state, ft)
        after_head = np.asarray(state2.params["head"]["w"])
        after_stem = np.asarray(jax.tree.leaves(state2.params["stem"])[0])
        np.testing.assert_array_equal(before_head, after_head)  # head kept
        assert not np.array_equal(before_stem, after_stem)      # body loaded

    def test_kd_teacher_from_checkpoint(self, tmp_path):
        from axcnn.train.loop import run, _load_teacher

        cfg = _tiny_cfg(tmp_path)
        run(cfg)
        ckpt_dir = os.path.join(cfg.runtime.model_dir, "checkpoints")
        kd = _tiny_cfg(tmp_path / "kd", kd_teacher_checkpoint=ckpt_dir)
        teacher = _load_teacher(kd)
        assert teacher is not None
        t_cfg, t_params, t_state = teacher
        assert t_cfg.num_classes == 1001
        # teacher forward runs
        from axcnn.models.resnet import resnet_apply

        x = np.zeros((1, 32, 32, 3), np.float32)
        logits, _ = resnet_apply(t_params, t_state, x, cfg=t_cfg, train=False)
        assert logits.shape == (1, 1001)

    def test_kd_teacher_architecture_independent(self, tmp_path):
        """VERDICT r2 missing #3: the teacher's assembly knobs must come from
        ITS checkpoint (model_config.json sidecar), not the student's config —
        an SE+ResNet-D teacher distills into a vanilla student and vice
        versa."""
        from axcnn.train.loop import run, _load_teacher
        from axcnn.models.resnet import resnet_apply

        cfg = _tiny_cfg(tmp_path)
        cfg.model = ModelConfig(resnet_size=50, num_classes=1001,
                                use_se_block=True, use_resnet_d=True)
        run(cfg)
        ckpt_dir = os.path.join(cfg.runtime.model_dir, "checkpoints")

        # student: plain vanilla — teacher must still come back assembled
        kd = _tiny_cfg(tmp_path / "kd", kd_teacher_checkpoint=ckpt_dir)
        t_cfg, t_params, t_state = _load_teacher(kd)
        assert t_cfg.use_se_block and t_cfg.use_resnet_d
        x = np.zeros((1, 32, 32, 3), np.float32)
        logits, _ = resnet_apply(t_params, t_state, x, cfg=t_cfg, train=False)
        assert logits.shape == (1, 1001)

        # end to end: full KD training run with teacher arch != student arch
        m = run(kd)
        assert m["count"] > 0 and np.isfinite(m["loss"])

    def test_kd_teacher_explicit_flags(self, tmp_path):
        """Without a sidecar (pre-sidecar checkpoints), the explicit
        kd_teacher_* flags pin the teacher architecture (the reference's
        teacher arch-flag surface)."""
        from axcnn.train.loop import run, _load_teacher, _teacher_model_config

        cfg = _tiny_cfg(tmp_path)
        cfg.model = ModelConfig(resnet_size=50, num_classes=1001,
                                use_se_block=True)
        run(cfg)
        ckpt_dir = os.path.join(cfg.runtime.model_dir, "checkpoints")
        os.remove(os.path.join(ckpt_dir, "model_config.json"))

        kd = _tiny_cfg(tmp_path / "kd",
                       kd_teacher_checkpoint=ckpt_dir,
                       kd_teacher_use_se_block="true")
        t_cfg, t_params, _ = _load_teacher(kd)  # restore must match SE shapes
        assert t_cfg.use_se_block and not kd.model.use_se_block
        # explicit flags also override a sidecar
        meta = {"resnet_size": 50, "num_classes": 1001,
                "use_se_block": True, "use_sk_block": True}
        kd2 = _tiny_cfg(tmp_path / "kd2", kd_teacher_checkpoint=ckpt_dir,
                        kd_teacher_use_sk_block="false")
        t2 = _teacher_model_config(kd2, meta)
        assert t2.use_se_block and not t2.use_sk_block
        # head mismatch is an error, not a silent KL shape break
        kd3 = _tiny_cfg(tmp_path / "kd3", kd_teacher_checkpoint=ckpt_dir)
        with pytest.raises(ValueError, match="head"):
            _teacher_model_config(kd3, {"num_classes": 10})

    def test_export_from_loop(self, tmp_path):
        from axcnn.train.loop import run
        from axcnn.ckpt.export import load_serving

        cfg = _tiny_cfg(tmp_path)
        cfg.runtime.export_dir = str(tmp_path / "export")
        run(cfg)
        fn, meta = load_serving(cfg.runtime.export_dir)
        imgs = np.zeros((8, 32, 32, 3), np.uint8)
        logits = np.asarray(fn(imgs))
        assert logits.shape == (8, 1001)


class TestDataEchoing:
    def test_echo_trains_and_logs(self, tmp_path):
        """--data.echo_factor=2: the loop runs the full step budget while
        pulling half the batches from the loader (DataConfig.echo_factor)."""
        from axcnn.train.loop import run

        cfg = _tiny_cfg(tmp_path, train_steps=4)
        cfg.data = dataclasses.replace(cfg.data, echo_factor=2)
        m = run(cfg)
        assert m["count"] > 0
        body = open(os.path.join(cfg.runtime.model_dir,
                                 "metrics.jsonl")).read()
        # all 4 train steps executed (echoing repeats batches, not steps)
        assert body.count('"tag": "train"') >= 4

    def test_echo_resume_matches_uninterrupted(self, tmp_path):
        """Echo-resume is EXACT, not drift-bounded: saves are deferred to
        echo-group boundaries, so save→restart→continue reproduces the
        uninterrupted run's per-step losses bitwise (VERDICT r3 weak #7).
        Also pins the deferral itself: save_checkpoint_steps=3 with echo x2
        must produce the checkpoint at step 4 (the boundary), not step 3."""
        import json

        from PIL import Image

        from axcnn.data.build_tfrecords import write_shards
        from axcnn.train.loop import run

        rng = np.random.default_rng(1)
        raw = tmp_path / "raw"
        raw.mkdir()
        items = {"train": [], "validation": []}
        for label in range(2):
            for i in range(10):
                p = str(raw / f"c{label}_{i}.jpg")
                Image.fromarray(rng.integers(0, 256, (40, 50, 3),
                                             dtype=np.uint8)).save(p, "JPEG")
                items["train" if i < 8 else "validation"].append(
                    (p, label, str(label)))
        rec = str(tmp_path / "rec")
        write_shards(items["train"], rec, "train", 2)
        write_shards(items["validation"], rec, "validation", 1)

        def cfg_for(d, steps, **runtime_kw):
            # constant LR: the interrupted run has a shorter train_steps, and
            # a cosine schedule would decay on a different horizon — the test
            # isolates echo/checkpoint alignment, not LR truncation
            cfg = _tiny_cfg(tmp_path / d, train_steps=steps,
                            lr_decay_type="constant")
            cfg.data = DataConfig(
                dataset_name="custom", data_dir=rec, image_size=32,
                resize_min=32, num_classes=2, num_train_examples=16,
                num_eval_examples=4, echo_factor=2)
            for k, v in runtime_kw.items():
                setattr(cfg.runtime, k, v)
            return cfg

        def train_losses(d):
            out = {}
            # _tiny_cfg puts model_dir at <base>/run
            with open(os.path.join(str(tmp_path / d), "run",
                                   "metrics.jsonl")) as f:
                for line in f:
                    r = json.loads(line)
                    if r.get("tag") == "train":
                        out[r["step"]] = r["loss"]
            return out

        run(cfg_for("uninterrupted", 8))
        run(cfg_for("resumed", 4, save_checkpoint_steps=3))
        # deferral: the periodic save trigger at step 3 (mid echo group)
        # must land at the step-4 boundary
        steps_dir = os.path.join(str(tmp_path / "resumed"), "run",
                                 "checkpoints")
        saved = {int(s) for s in os.listdir(steps_dir) if s.isdigit()}
        assert 4 in saved and 3 not in saved, saved
        run(cfg_for("resumed", 8))  # restores at step 4, trains 5..8
        full, resumed = train_losses("uninterrupted"), train_losses("resumed")
        assert [resumed[s] for s in (5, 6, 7, 8)] == \
               [full[s] for s in (5, 6, 7, 8)]

    def test_echoed_steps_are_not_identical_replays(self, tmp_path):
        """Per-step RNG folds the step index, so two steps on the SAME echoed
        batch produce different updates (mixup/DropBlock keep moving)."""
        import jax
        from axcnn.core.dtypes import DEFAULT_POLICY
        from axcnn.models.resnet import ModelConfig as MC
        from axcnn.train.schedules import make_lr_schedule
        from axcnn.train.train_step import create_train_state, make_train_step

        cfg = MC(resnet_size=50, num_classes=5, use_dropblock=True,
                 dropblock_keep_prob=0.8)
        step = make_train_step(
            cfg, lr_schedule=make_lr_schedule(base_lr=0.1, total_steps=10,
                                              warmup_steps=0),
            total_steps=10, policy=DEFAULT_POLICY, mixup_alpha=0.2,
            use_ema=False)
        state = create_train_state(jax.random.key(0), cfg, use_ema=False)
        rng = np.random.default_rng(0)
        batch = {"images": rng.integers(0, 256, (4, 32, 32, 3), np.uint8),
                 "labels": rng.integers(0, 5, (4,), np.int32)}
        key = jax.random.key(1)
        fn = jax.jit(step)
        state, m1 = fn(state, batch, key)   # step 0 -> 1
        _, m2 = fn(state, batch, key)       # step 1 on the SAME batch
        assert float(m1["loss"]) != float(m2["loss"])
