"""The training run loop — the reference's Estimator train/eval cycle.

Parity target (SURVEY.md §3.1 run loop, §2 item 1): epoch-grouped training
with evaluation every ``epochs_between_evals``, checkpoint save/auto-resume,
early stop on ``stop_threshold``, eval-only mode, EMA-swapped eval, KD
teacher, warm-start fine-tuning. One function, no framework classes: build
steps, jit (single device) or shard_map (mesh), iterate.
"""

from __future__ import annotations

import dataclasses
import math
import os
import signal
import threading

import jax
import jax.numpy as jnp
import numpy as np

from axcnn.core.dtypes import policy_from_name
from axcnn.data.datasets import get_dataset, DatasetInfo
from axcnn.data.pipeline import (
    TFRecordImageLoader, SyntheticLoader, device_prefetch, LoaderState)
from axcnn.models.resnet import ModelConfig, resnet_init
from axcnn.parallel.mesh import (
    make_mesh, shard_train_step, shard_eval_step, shard_batch, batch_sharding,
    DATA_AXIS)
from axcnn.train.schedules import make_lr_schedule, scale_lr_for_batch
from axcnn.train.train_step import (
    TrainState, create_train_state, make_train_step, make_eval_step, pad_batch)
from axcnn.ckpt.checkpoint import CheckpointManager
from axcnn.utils.config import Config
from axcnn.utils.logging import MetricLogger, Throughput


def _dataset_info(cfg: Config) -> DatasetInfo:
    if cfg.data.dataset_name == "custom":
        d = cfg.data
        if min(d.num_classes, d.num_train_examples, d.num_eval_examples) <= 0:
            raise ValueError(
                "dataset_name='custom' needs --data.num_classes, "
                "--data.num_train_examples and --data.num_eval_examples "
                f"(got {d.num_classes}/{d.num_train_examples}/"
                f"{d.num_eval_examples})")
        return DatasetInfo("custom", d.num_classes, d.num_train_examples,
                           d.num_eval_examples, label_offset=d.label_offset)
    return get_dataset(cfg.data.dataset_name)


def _make_loaders(cfg: Config, info: DatasetInfo):
    # each host loads its local slice of the global batch (per-host input
    # sharding; shard_batch/device_prefetch assemble the global array)
    local_bs = cfg.train.batch_size // jax.process_count()
    if cfg.data.use_synthetic_data:
        train_loader = SyntheticLoader(
            batch_size=local_bs, image_size=cfg.data.image_size,
            num_classes=cfg.model.num_classes, seed=cfg.train.seed)
        eval_loader = SyntheticLoader(
            batch_size=local_bs, image_size=cfg.data.image_size,
            num_classes=cfg.model.num_classes, seed=cfg.train.seed + 1,
            num_batches=4)
        return train_loader, eval_loader
    common = dict(image_size=cfg.data.image_size,
                  resize_min=cfg.data.resize_min,
                  dct_method=cfg.data.dct_method,
                  num_workers=cfg.data.num_workers,
                  use_native=cfg.data.loader == "cpp",
                  host_id=jax.process_index(), num_hosts=jax.process_count())
    # device AutoAugment: the host loader only decodes/crops (which also lets
    # the native C++ decode path serve augmented training)
    host_aa = "none" if cfg.data.autoaugment_device else cfg.data.autoaugment_type
    if cfg.data.num_producers > 1:
        # parallel-interleave scale-out: P independent shard-subset streams
        # (see MultiProducerLoader — exact resume, per-producer decode pools)
        from axcnn.data.pipeline import MultiProducerLoader

        host_id, num_hosts = common.pop("host_id"), common.pop("num_hosts")
        train_loader = MultiProducerLoader(
            cfg.data.data_dir, info, num_producers=cfg.data.num_producers,
            host_id=host_id, num_hosts=num_hosts, seed=cfg.train.seed,
            batch_size=local_bs, train=True, autoaugment_type=host_aa,
            shuffle_buffer=cfg.data.shuffle_buffer, **common)
        common.update(host_id=host_id, num_hosts=num_hosts)
    else:
        train_loader = TFRecordImageLoader(
            cfg.data.data_dir, info, batch_size=local_bs, train=True,
            autoaugment_type=host_aa, seed=cfg.train.seed,
            shuffle_buffer=cfg.data.shuffle_buffer, **common)
    eval_loader = TFRecordImageLoader(
        cfg.data.data_dir, info, batch_size=local_bs, train=False,
        drop_remainder=False, **common)
    return train_loader, eval_loader


def _teacher_model_config(cfg: Config, meta: dict | None) -> ModelConfig:
    """Resolve the KD teacher's architecture (SURVEY.md §2 item 14: the
    reference exposes independent teacher arch flags).

    Tiers: checkpoint ``model_config.json`` sidecar when present (covers
    every structural knob incl. Big-Little / width multiplier), else inherit
    the student's knobs; explicit ``train.kd_teacher_*`` flags override."""
    import dataclasses

    if meta is not None:
        fields = {f.name for f in dataclasses.fields(ModelConfig)}
        kw = {k: (tuple(v) if isinstance(v, list) else v)
              for k, v in meta.items() if k in fields}
        base = ModelConfig(**kw)
        if base.num_classes != cfg.model.num_classes:
            raise ValueError(
                f"KD teacher checkpoint has a {base.num_classes}-way head "
                f"but the student is {cfg.model.num_classes}-way — teacher "
                "and student logits must align for the KL loss")
    else:
        base = cfg.model

    def tri(raw: str, field: str):
        if raw == "":
            return {}
        low = raw.lower()
        if low not in ("true", "false", "1", "0", "yes", "no", "on", "off"):
            raise ValueError(
                f"train.kd_teacher_{field} must be ''/true/false, got {raw!r}")
        return {field: low in ("true", "1", "yes", "on")}

    over = {}
    if cfg.train.kd_teacher_resnet_size:
        over["resnet_size"] = cfg.train.kd_teacher_resnet_size
    over.update(tri(cfg.train.kd_teacher_use_resnet_d, "use_resnet_d"))
    over.update(tri(cfg.train.kd_teacher_use_se_block, "use_se_block"))
    over.update(tri(cfg.train.kd_teacher_use_sk_block, "use_sk_block"))
    if cfg.train.kd_teacher_anti_alias_type != "inherit":
        over["anti_alias_type"] = cfg.train.kd_teacher_anti_alias_type
    return dataclasses.replace(base, **over)


def _load_teacher(cfg: Config):
    """Build the frozen KD teacher from a checkpoint (SURVEY.md §2 item 14)."""
    if not cfg.train.kd_teacher_checkpoint:
        return None
    mgr = CheckpointManager(cfg.train.kd_teacher_checkpoint)
    t_cfg = _teacher_model_config(cfg, mgr.model_config())
    # abstract template (structure only): avoids eager init on device
    t_params, t_state = jax.eval_shape(
        lambda k: resnet_init(k, t_cfg), jax.random.key(0))
    template = TrainState(step=0, params=t_params, model_state=t_state,
                          velocity=t_params, ema=t_params)
    restored = mgr.restore(template)
    if restored is None:
        raise FileNotFoundError(
            f"no teacher checkpoint in {cfg.train.kd_teacher_checkpoint}")
    t_train_state = restored[0]
    mgr.close()
    # teach with EMA weights when present (the published recipes distill
    # from the EMA'd teacher)
    params = t_train_state.ema if t_train_state.ema is not None else t_train_state.params
    return t_cfg, params, t_train_state.model_state


def _warm_start(state: TrainState, cfg: Config) -> TrainState:
    """Fine-tune init: load all params except the classifier head
    (SURVEY.md §3.3)."""
    if not cfg.train.pretrained_checkpoint:
        return state
    mgr = CheckpointManager(cfg.train.pretrained_checkpoint)
    # restore into a template with the PRETRAINED head size by borrowing its
    # stored shapes: we restore lazily and copy intersecting subtrees
    latest = mgr.latest_step()
    if latest is None:
        raise FileNotFoundError(
            f"no checkpoint in {cfg.train.pretrained_checkpoint}")
    import orbax.checkpoint as ocp

    raw = mgr._mgr.restore(latest, args=ocp.args.StandardRestore())
    mgr.close()

    def _adapt_layout(tree):
        # checkpoints store either the unrolled per-block layout or the
        # scan_blocks stacked layout (models/resnet.py); warm-start across
        # the two is a pure re-stacking (stage1 is never a BL stage, so its
        # key set identifies the stored layout)
        from axcnn.models.resnet import params_from_scan, params_to_scan
        stored_scan = "tail" in tree.get("stage1", {})
        if stored_scan == cfg.model.scan_blocks:
            return tree
        conv = params_to_scan if cfg.model.scan_blocks else params_from_scan
        return conv(tree, dataclasses.replace(cfg.model,
                                              scan_blocks=stored_scan))

    src_params = _adapt_layout(raw.get("ema") or raw["params"])
    new_params = dict(state.params)
    for k, v in src_params.items():
        if k == "head" and cfg.train.warm_start_exclude_head:
            continue
        new_params[k] = jax.tree.map(jnp.asarray, v)
    new_mstate = jax.tree.map(jnp.asarray, _adapt_layout(raw["model_state"]))
    from axcnn.train.ema import ema_init  # explicit copy: astype would alias
    # params and ema buffers, which breaks donation in the train step

    return state._replace(params=new_params, model_state=new_mstate,
                          ema=ema_init(new_params)
                          if state.ema is not None else None)


def _eval_batches(eval_loader, batch_size):
    """Padded eval batch stream.

    Multi-host: the per-batch psum in shard_eval_step is a collective — every
    host must call it the SAME number of times, but hosts own disjoint shard
    subsets with (in general) different record counts. Hosts agree on the
    global max batch count up front (allgather of a framing-scan count) and
    hosts with fewer batches append all-padding batches (labels -1 → zero
    contribution to every metric), so uneven shards can never deadlock the
    mesh."""
    extra = 0
    local = None
    image_size = getattr(eval_loader, "image_size", None)
    if jax.process_count() > 1 and hasattr(eval_loader, "num_batches"):
        from jax.experimental import multihost_utils

        local = eval_loader.num_batches()
        counts = multihost_utils.process_allgather(np.int32(local))
        extra = int(np.max(counts)) - int(local)

    n = 0
    last = None
    for b in iter(eval_loader):
        last = b
        n += 1
        yield pad_batch(b, batch_size)
    if local is not None and n != local:
        # a mismatch would desynchronize the per-batch collective across
        # hosts — fail here, loudly, instead of hanging the mesh
        raise RuntimeError(
            f"eval loader yielded {n} batches but num_batches() promised "
            f"{local}")
    if extra:
        if last is not None:
            shape = last["images"].shape[1:]
            dtype = last["images"].dtype
        else:  # this host had zero batches; shape comes from the loader
            shape = (image_size, image_size, 3)
            dtype = np.uint8
        empty = {"images": np.zeros((batch_size,) + tuple(shape), dtype),
                 "labels": -np.ones((batch_size,), np.int32)}
        for _ in range(extra):
            yield empty


def evaluate(eval_step_fn, state, eval_loader, *, batch_size, mesh=None,
             prefetch=2, sharding=None, on_batch=None):
    """Full eval pass; returns {'top1': %, 'top5': %, 'loss': mean, 'count': N}.

    ``on_batch`` (optional thunk) is invoked after every completed batch —
    the hang-watchdog liveness beat. A full eval can legitimately outlast
    ``hang_watchdog_s`` (ImageNet val at small batch is minutes), so the
    beat must be per-batch, not per-eval: each device_get here proves the
    chip answered, which is exactly the liveness the watchdog probes.
    """
    totals = {}
    if sharding is None:
        sharding = batch_sharding(mesh) if mesh is not None else None
    for batch in device_prefetch(
            _eval_batches(eval_loader, batch_size), size=prefetch,
            sharding=sharding):
        m = jax.device_get(eval_step_fn(state, batch))
        if on_batch is not None:
            on_batch()
        for k, v in m.items():
            totals[k] = totals.get(k, 0.0) + float(v)
    count = max(totals.get("count", 0.0), 1.0)
    return {
        "top1": totals.get("top1", 0.0) / count * 100.0,
        "top5": totals.get("top5", 0.0) / count * 100.0,
        "loss": totals.get("loss_sum", 0.0) / count,
        "count": count,
    }


def run(cfg: Config):
    """Train (and periodically evaluate) per the config; returns final eval
    metrics dict (or eval metrics when runtime.eval_only)."""
    from axcnn.utils.config import resolve_preprocessing
    import dataclasses as _dc

    info = _dataset_info(cfg)
    model = cfg.model
    if cfg.model.num_classes != info.num_classes:
        # dataset wins (the reference derives num_classes from data_config)
        model = _dc.replace(cfg.model, num_classes=info.num_classes)
    cfg = Config(model=model, data=resolve_preprocessing(cfg.data),
                 train=cfg.train, runtime=cfg.runtime)

    policy = policy_from_name(cfg.train.dtype)
    if policy.quantize_conv and not cfg.runtime.eval_only:
        raise ValueError(
            "dtype=int8 is a serving-only post-training-quantization policy "
            "(the quantized conv is not differentiable); train in bf16/fp32 "
            "and pass --train.dtype=int8 with --runtime.eval_only or the "
            "predict CLI")
    logger = MetricLogger(cfg.runtime.model_dir,
                          tensorboard=cfg.runtime.tensorboard)

    devices = jax.devices()
    n_dev = cfg.runtime.num_devices or len(devices)
    spatial = max(cfg.runtime.spatial_partitions, 1)
    if spatial > 1:
        # GSPMD path: batch over 'data', image H over 'spatial'; the step is
        # the plain global-semantics function (axis_name=None) and XLA
        # inserts halo exchanges / reductions (axcnn/parallel/spatial.py).
        # Multi-host: each (data, spatial) mesh row must live on ONE host so
        # every host's local batch covers its addressable shards (the H split
        # is sliced from the host-local rows by
        # make_array_from_process_local_data).
        if n_dev % spatial:
            raise ValueError(
                f"{n_dev} devices not divisible by spatial={spatial}")
        if jax.process_count() > 1 and jax.local_device_count() % spatial:
            raise ValueError(
                f"spatial={spatial} must divide the per-host device count "
                f"({jax.local_device_count()}) so halo neighbors stay on-host "
                "rows")
    if cfg.runtime.dcn_slices > 1 and spatial > 1:
        raise ValueError(
            "dcn_slices > 1 cannot combine with spatial_partitions > 1")
    dp_shards = n_dev // spatial
    use_mesh = n_dev > 1 and spatial == 1
    mesh = None
    if use_mesh:
        from axcnn.parallel.mesh import detect_num_slices, make_hierarchical_mesh

        sel = devices[:n_dev]
        dcn = cfg.runtime.dcn_slices or detect_num_slices(sel)
        # multi-slice pod: hierarchical (dcn, data) mesh so the gradient
        # all-reduce stays on ICI inside each slice and crosses DCN once
        mesh = (make_hierarchical_mesh(dcn, devices=sel) if dcn > 1
                else make_mesh(n_dev))
    active_mesh = mesh  # replaced by the spatial mesh below when spatial > 1
    if cfg.train.batch_size % max(dp_shards, 1):
        raise ValueError(
            f"global batch {cfg.train.batch_size} not divisible by "
            f"{dp_shards} data-parallel shards")

    # steps accounting
    if cfg.train.train_steps > 0:
        total_steps = cfg.train.train_steps
        steps_per_epoch = total_steps
    else:
        steps_per_epoch = max(info.num_train // cfg.train.batch_size, 1)
        total_steps = steps_per_epoch * cfg.train.train_epochs

    base_lr = scale_lr_for_batch(cfg.train.base_lr, cfg.train.batch_size)
    lr_schedule = make_lr_schedule(
        base_lr=base_lr, total_steps=total_steps,
        warmup_steps=int(cfg.train.lr_warmup_epochs * steps_per_epoch),
        decay_type=cfg.train.lr_decay_type)

    teacher = _load_teacher(cfg)

    autoaugment_fn = None
    if cfg.data.autoaugment_device and cfg.data.autoaugment_type != "none" \
            and not cfg.data.use_synthetic_data:
        from axcnn.data.autoaugment_device import make_device_autoaugment

        autoaugment_fn = make_device_autoaugment(
            cfg.data.autoaugment_type, num_groups=cfg.data.aa_num_groups)

    train_step = make_train_step(
        cfg.model, lr_schedule=lr_schedule, total_steps=total_steps,
        policy=policy, label_smoothing=cfg.train.label_smoothing,
        mixup_alpha=cfg.data.mixup_alpha,
        mixup_per_shard=cfg.data.mixup_per_shard,
        mixup_symmetric=cfg.data.mixup_symmetric,
        weight_decay=cfg.train.weight_decay,
        momentum=cfg.train.momentum, use_ema=cfg.train.use_ema,
        ema_decay=cfg.train.ema_decay,
        axis_name=(None if mesh is None
                   else DATA_AXIS if len(mesh.axis_names) == 1
                   else tuple(mesh.axis_names)),
        teacher=teacher, kd_temp=cfg.train.kd_temp, kd_alpha=cfg.train.kd_alpha,
        mean_rgb=info.mean_rgb, stddev_rgb=info.stddev_rgb,
        autoaugment_fn=autoaugment_fn,
        grad_accum_steps=cfg.train.grad_accum_steps)
    eval_step = make_eval_step(
        cfg.model, policy=policy, use_ema=cfg.train.use_ema,
        mean_rgb=info.mean_rgb, stddev_rgb=info.stddev_rgb)

    batch_shd = None
    if spatial > 1:
        from axcnn.parallel.spatial import (
            make_spatial_mesh, spatial_batch_sharding, spatial_eval_step,
            spatial_train_step)

        # host-contiguous sort BEFORE building the mesh: jax.devices() order
        # is not process-contiguous on multi-host slices, and an explicit
        # devices= list is honored verbatim by make_spatial_mesh
        smesh = make_spatial_mesh(
            spatial, data=dp_shards,
            devices=sorted(devices[:n_dev],
                           key=lambda d: (d.process_index, d.id)))
        train_step_fn = spatial_train_step(train_step, smesh)
        eval_step_fn = spatial_eval_step(eval_step, smesh)
        batch_shd = spatial_batch_sharding(smesh)
        active_mesh = smesh
    elif use_mesh:
        train_step_fn = shard_train_step(train_step, mesh)
        eval_step_fn = shard_eval_step(eval_step, mesh)
    else:
        train_step_fn = jax.jit(train_step, donate_argnums=(0,))
        eval_step_fn = jax.jit(eval_step)

    state = create_train_state(jax.random.key(cfg.train.seed), cfg.model,
                               use_ema=cfg.train.use_ema)
    state = _warm_start(state, cfg)

    train_loader, eval_loader = _make_loaders(cfg, info)

    ckpt = CheckpointManager(
        os.path.join(cfg.runtime.model_dir, "checkpoints"),
        max_to_keep=cfg.runtime.keep_checkpoint_max,
        model_config=_dc.asdict(cfg.model))
    restored = ckpt.restore(state)
    if restored is not None:
        state, loader_state, _ = restored
        train_loader.state = loader_state
        logger.log("restore", int(state.step), epoch=loader_state.epoch)

    if jax.process_count() > 1 and active_mesh is not None:
        # multi-controller runs: the host-local state arrays must become a
        # replicated GLOBAL array before entering the mesh-wide jit (same on
        # every host by construction — seeded init / shared checkpoint);
        # replicate_to_mesh avoids device_put's cross-host assert collective
        from axcnn.parallel.mesh import replicate_to_mesh

        state = replicate_to_mesh(state, active_mesh)

    def _maybe_export():
        if not cfg.runtime.export_dir:
            return
        from axcnn.ckpt.export import export_serving

        infer_params = state.ema if (cfg.train.use_ema and state.ema is not None) \
            else state.params
        export_serving(cfg.runtime.export_dir, cfg.model, infer_params,
                       state.model_state, image_size=cfg.data.image_size,
                       policy=policy, mean=info.mean_rgb, std=info.stddev_rgb)
        logger.log("export", int(jax.device_get(state.step)),
                   path=cfg.runtime.export_dir)

    if cfg.runtime.eval_only:
        # Eval-only gets the same hung-dispatch watchdog as training (the
        # 2026-08-19 tunnel wedge hit an eval_only leg: futex-parked at 0%
        # CPU right after restore, which no train-loop watchdog covers).
        # The step is fetched BEFORE arming — device_get inside the hang
        # handler would itself wedge.
        eval_step_no = int(jax.device_get(state.step))
        watchdog = None
        if cfg.runtime.hang_watchdog_s > 0:
            from axcnn.utils.watchdog import HangWatchdog, exit_after

            def _on_eval_hang(stalled_s):
                # exit_after: the log runs on a bounded side thread so a
                # hang in the logging/filesystem layer cannot neutralize
                # the exit; jsonl_only skips the TB writer for the same
                # reason (round-4 review Weak #8)
                exit_after(lambda: logger.log(
                    "hang_detected", eval_step_no, jsonl_only=True,
                    stalled_s=round(stalled_s, 1),
                    timeout_s=cfg.runtime.hang_watchdog_s))

            watchdog = HangWatchdog(cfg.runtime.hang_watchdog_s,
                                    on_hang=_on_eval_hang).start()
        try:
            metrics = evaluate(
                eval_step_fn, state, eval_loader,
                batch_size=cfg.train.batch_size // jax.process_count(),
                mesh=mesh, sharding=batch_shd,
                prefetch=cfg.data.prefetch,
                on_batch=watchdog.beat if watchdog is not None else None)
        finally:
            if watchdog is not None:
                watchdog.stop()
        logger.log("eval", eval_step_no, **metrics)
        _maybe_export()
        ckpt.close()
        return metrics

    root_key = jax.random.key(cfg.train.seed + 1)
    sharding = batch_shd if batch_shd is not None else (
        batch_sharding(mesh) if mesh is not None else None)
    throughput = Throughput(cfg.train.batch_size)
    eval_metrics = {}

    step = int(jax.device_get(state.step))
    # state_fn: checkpoints must record the position of the batch the loop has
    # CONSUMED, not train_loader.state (which the prefetch producer thread runs
    # up to prefetch+1 batches ahead of — saving it would skip data on resume)
    train_iter = device_prefetch(iter(train_loader), size=cfg.data.prefetch,
                                 sharding=sharding,
                                 state_fn=lambda: train_loader.state)
    if cfg.data.echo_factor > 1:
        # data echoing: the wrapper sits ABOVE device_prefetch so repeats are
        # free on the host side (batch already resident on device)
        from axcnn.data.pipeline import EchoIterator

        train_iter = EchoIterator(train_iter, cfg.data.echo_factor)
    # Preemption-safe shutdown (beyond the reference's crash-resume): SIGTERM
    # — the grace signal every cluster manager sends before killing — sets a
    # flag; the loop finishes the in-flight step, saves the exact consumed
    # data position, and exits cleanly, so a preempted run resumes bit-where
    # it left off instead of replaying from the last periodic checkpoint.
    # Single-controller only: an orbax save is a collective under
    # multi-controller and only the signaled host would enter it.
    preempted = threading.Event()
    prev_sigterm = None
    if (jax.process_count() == 1
            and threading.current_thread() is threading.main_thread()):
        prev_sigterm = signal.signal(signal.SIGTERM,
                                     lambda *_: preempted.set())
    elif jax.process_count() > 1:
        # loud, not silent: multi-controller runs get NO graceful SIGTERM
        # save (orbax save is a collective; only the signaled host would
        # enter it) — recovery is the periodic-checkpoint resume path
        logger.log("preempt_unavailable", step,
                   reason="multi-controller: SIGTERM save disabled; rely on "
                          "save_checkpoint_steps + exact resume")
    profiled = False
    pending_save = pending_force = pending_preempt = False
    # Hung-step watchdog (failure detection, SURVEY §5.3): the axon-tunnel
    # wedge of 2026-08-19 (futex-parked dispatch, 0% CPU, no exception)
    # motivates an in-process liveness probe — a hang holds the device
    # claim and burns wall-clock silently, where a crash would have been
    # restarted. On deadline: log, then hard-exit 42 (the main thread is
    # wedged inside a C call; only os._exit releases the claim) so a
    # supervisor can re-invoke and auto-resume from the last checkpoint.
    watchdog = None
    if cfg.runtime.hang_watchdog_s > 0:
        from axcnn.utils.watchdog import HangWatchdog, exit_after

        def _on_hang(stalled_s):
            # exit_after: bounded side-thread log then unconditional
            # os._exit — a hang in the logging/filesystem layer must not
            # neutralize the exit (round-4 review Weak #8); jsonl_only
            # keeps the handler out of the TF summary writer
            exit_after(lambda: logger.log(
                "hang_detected", step, jsonl_only=True,
                stalled_s=round(stalled_s, 1),
                timeout_s=cfg.runtime.hang_watchdog_s))

        watchdog = HangWatchdog(cfg.runtime.hang_watchdog_s,
                                on_hang=_on_hang).start()

    def _beat():
        if watchdog is not None:
            watchdog.beat()

    try:
        while step < total_steps:
            if (cfg.runtime.profile_steps and not profiled and step > 0):
                jax.profiler.start_trace(
                    os.path.join(cfg.runtime.model_dir, "profile"))
            batch = next(train_iter)
            _beat()  # loader produced (host side is alive)
            state, metrics = train_step_fn(state, batch, root_key)
            # dispatch returned: once a wedged device backpressures the
            # queue, dispatch itself blocks and the beats stop
            _beat()
            step += 1
            if cfg.runtime.profile_steps and not profiled and \
                    step >= cfg.runtime.profile_steps + 1:
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                profiled = True
            ips = throughput.tick()
            if step % cfg.train.log_every == 0 or step == total_steps:
                m = jax.device_get(metrics)
                _beat()  # blocking fetch completed: the device is alive
                logger.log("train", step, epoch=step / steps_per_epoch,
                           images_per_sec=ips or 0.0,
                           **{k: float(v) for k, v in m.items()})
            # periodic checkpoints between evals (reference: save_checkpoint_steps)
            if (cfg.runtime.save_checkpoint_steps
                    and step % cfg.runtime.save_checkpoint_steps == 0):
                pending_save = True
            # eval + checkpoint at epoch boundaries (epochs_between_evals)
            at_eval = (step % (steps_per_epoch * cfg.train.epochs_between_evals) == 0
                       or step == total_steps)
            stopping = False
            if at_eval:
                eval_metrics = evaluate(
                    eval_step_fn, state, eval_loader,
                    batch_size=cfg.train.batch_size // jax.process_count(),
                    mesh=mesh, sharding=batch_shd,
                    prefetch=cfg.data.prefetch,
                    # per-batch beats: a full eval can legitimately outlast
                    # hang_watchdog_s (it's sized for a single train step)
                    on_batch=_beat)
                logger.log("eval", step, **eval_metrics)
                _beat()
                pending_force = True
                stopping = bool(cfg.train.stop_threshold
                                and eval_metrics["top1"] >= cfg.train.stop_threshold)
            if preempted.is_set():
                pending_preempt = True
            # saves are DEFERRED to echo-group boundaries (≤ factor-1 steps):
            # consumed_state counts fresh batches, so only at a boundary does
            # it resume the step/batch stream exactly (EchoIterator docstring;
            # echo_factor=1 is always at a boundary). Run-ending steps flush
            # regardless — a save must not be lost to alignment.
            aligned = getattr(train_iter, "at_boundary", True)
            if ((pending_save or pending_force or pending_preempt)
                    and (aligned or step == total_steps or stopping)):
                ckpt.save(state, loader_state=train_iter.consumed_state
                          or train_loader.state,
                          rng_seed=cfg.train.seed,
                          force=pending_force or pending_preempt)
                _beat()  # checkpoint save is a long legitimate pause
                if pending_preempt:
                    # a graceful SIGTERM save may legitimately outlast
                    # hang_watchdog_s (orbax async write of the full
                    # state); disarm the watchdog BEFORE blocking in
                    # wait() so the exit-0 preemption contract holds
                    if watchdog is not None:
                        watchdog.stop()
                    ckpt.wait()
                    logger.log("preempt_save", step)
                    break
                pending_save = pending_force = False
            if stopping:
                logger.log("early_stop", step, top1=eval_metrics["top1"])
                break
    finally:
        if watchdog is not None:
            watchdog.stop()
        # an escaping loader/step exception must not leave the process-wide
        # SIGTERM handler pointing at a lambda whose Event no loop reads —
        # graceful preemption would be silently swallowed until SIGKILL
        if prev_sigterm is not None:
            signal.signal(signal.SIGTERM, prev_sigterm)
    _maybe_export()
    ckpt.wait()
    ckpt.close()
    logger.close()
    return eval_metrics
