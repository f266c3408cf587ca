"""Config system: one dataclass tree + CLI overrides.

Parity target (SURVEY.md §5.6): the reference's two-tier absl flag surface
(vendored ``define_base``/``define_performance`` groups + repo-specific model
and recipe flags). Every reference knob has a field here with the same
meaning; ``configs/*.py`` presets mirror the reference's ``scripts/*.sh``
recipes 1:1.

CLI grammar: ``--field=value`` or ``--section.field=value`` (e.g.
``--model.use_se_block=true --train.base_lr=0.4``); unprefixed names resolve
if unambiguous across sections. ``--config=name`` loads a preset from
``axcnn/configs`` first, then overrides apply left to right.
"""

from __future__ import annotations

import dataclasses
import importlib
import json
from typing import Any, Sequence

from axcnn.models.resnet import ModelConfig


@dataclasses.dataclass
class DataConfig:
    dataset_name: str = "imagenet"
    data_dir: str = ""
    use_synthetic_data: bool = False
    # reference --preprocessing_type: 'imagenet_<size>_<min>[a]' sets
    # (image_size, resize_min) as one named variant (e.g. imagenet_224_256a);
    # '' keeps the explicit fields below
    preprocessing_type: str = ""
    image_size: int = 224
    resize_min: int = 256  # eval: shorter-side resize (preprocessing_type 224_256a)
    # JPEG IDCT method, reference --dct_method: 'INTEGER_ACCURATE' (islow,
    # the parity default — PIL always decodes this way) | 'INTEGER_FAST'
    # (ifast; only the native C++ loader honors it)
    dct_method: str = "INTEGER_ACCURATE"
    autoaugment_type: str = "none"  # none | v0 | imagenet
    # run AutoAugment on-device inside the jitted step (XLA preprocessing
    # graph; required for augmented training with the C++ loader). Costs
    # ~60-120ms/step on this chip (conditional overhead through the tunnel);
    # the host PIL path is the default and matches the reference exactly.
    autoaugment_device: bool = False
    aa_num_groups: int = 8  # device AA: sub-policies drawn per batch group
    mixup_alpha: float = 0.0
    # lambda scope under data parallelism: False (reference) = one lambda per
    # global batch; True = independent lambda per DP shard
    mixup_per_shard: bool = False
    # lambda <- max(lambda, 1-lambda): opt-in deviation from the reference
    # recipe (halves the lambda distribution; see docs/PARITY.md)
    mixup_symmetric: bool = False
    num_workers: int = 8
    # Train-path producer threads: >1 interleaves that many independent
    # shard-subset streams round-robin (tf.data parallel_interleave
    # equivalent). Moves the per-record stream framing (the measured
    # ~12.5 us/record serial section, docs/SCALING.md) into the producers;
    # the consumer's serial work drops to one queue pop per batch. Exact
    # resume preserved (pipeline.MultiProducerLoader). num_workers decode
    # threads are spawned PER producer.
    num_producers: int = 1
    shuffle_buffer: int = 4096
    prefetch: int = 2
    loader: str = "python"  # python | cpp (native loader, cpp/)
    # Data echoing (Choi et al. 2019, arXiv:1907.05550): feed each loaded
    # batch to ``echo_factor`` consecutive train steps. A TPU-first lever for
    # host-bound input pipelines (the echoed batch is already ON DEVICE — the
    # host and PCIe/tunnel see 1/factor of the traffic). Per-step RNG is
    # folded from the step index, so every echoed step draws fresh
    # mixup/DropBlock — and, with --data.autoaugment_device, fresh
    # AutoAugment — randomness ("echoing before augmentation", the variant
    # the paper finds nearly cost-free). Steps-per-epoch accounting is
    # step-based: one data epoch now spans factor x steps_per_epoch steps.
    # Checkpoint saves are deferred to the next echo-group boundary
    # (≤ factor-1 steps later) so resume replays the exact batch/step
    # stream (tests/test_loop.py::test_echo_resume_matches_uninterrupted).
    echo_factor: int = 1
    # dataset_name="custom": train/eval on user-built TFRecords (e.g. from
    # build_tfrecords.py --layout=folders) without editing the registry —
    # these three fields describe the set (all required > 0 for custom).
    # The reference's equivalent is editing functions/data_config.py.
    num_classes: int = 0
    num_train_examples: int = 0
    num_eval_examples: int = 0
    label_offset: int = 0  # custom only: add to stored labels (imagenet=1)


@dataclasses.dataclass
class TrainConfig:
    batch_size: int = 256  # GLOBAL batch (split across data-parallel shards)
    # Gradient accumulation: run each (per-shard) batch as this many
    # micro-batches through a lax.scan — activation memory drops to one
    # micro-batch (composes with --model.remat=blocks for effective batches
    # no chip could hold). One optimizer/EMA update per step; BN batch stats
    # are per-micro-batch (the reference's per-replica-BN semantic, here
    # along the accumulation axis). Per-shard batch must divide evenly.
    grad_accum_steps: int = 1
    train_epochs: int = 90
    train_steps: int = 0  # >0 overrides epochs (debug/bench)
    epochs_between_evals: int = 1
    stop_threshold: float = 0.0  # early-stop when eval top-1 reaches this
    base_lr: float = 0.1  # per-256; scaled linearly by global batch
    lr_decay_type: str = "cosine"  # cosine | step | constant
    lr_warmup_epochs: float = 5.0
    momentum: float = 0.9
    weight_decay: float = 1e-4
    label_smoothing: float = 0.1
    use_ema: bool = False
    ema_decay: float = 0.9999
    dtype: str = "bf16"  # bf16 | fp32  (reference: fp16|fp32 + loss_scale)
    seed: int = 42
    log_every: int = 100
    # KD (reference: kd_temp + teacher checkpoint/arch flags). The teacher's
    # architecture resolves in three tiers (loop._load_teacher): the
    # checkpoint's model_config.json sidecar when present (full structural
    # fidelity incl. Big-Little/width), else the student's knobs; the
    # explicit kd_teacher_* flags below override either — so a
    # differently-assembled teacher (e.g. vanilla R50 → assembled student)
    # works, matching the reference's independent teacher arch flags.
    kd_teacher_checkpoint: str = ""
    kd_teacher_resnet_size: int = 0  # 0 = from ckpt sidecar, else student's
    kd_teacher_use_resnet_d: str = ""     # '' auto | true | false
    kd_teacher_use_se_block: str = ""     # '' auto | true | false
    kd_teacher_use_sk_block: str = ""     # '' auto | true | false
    kd_teacher_anti_alias_type: str = "inherit"  # inherit|none|sconv|proj|max
    kd_temp: float = 1.0
    kd_alpha: float = 1.0
    # fine-tune / warm start (reference: pretrained_model_checkpoint_path)
    pretrained_checkpoint: str = ""
    warm_start_exclude_head: bool = True


@dataclasses.dataclass
class RuntimeConfig:
    model_dir: str = "/tmp/axcnn_model"
    save_checkpoint_steps: int = 0  # 0 = once per eval cycle
    keep_checkpoint_max: int = 5
    num_devices: int = 0  # 0 = all visible
    # JAX platform to run on: "" = default device selection; "cpu"/"tpu"
    # force a backend. The JAX_PLATFORMS env var is NOT equivalent: PJRT
    # plugins (e.g. the axon TPU tunnel) can prepend themselves and win, so
    # this knob applies jax.config.update("jax_platforms", ...) before the
    # first device touch — the only reliable way to run the CLI on host
    # CPUs (smoke tests, virtual multi-device meshes) on a TPU machine.
    platform: str = ""
    # >1: shard the image H axis over this many chips per data shard
    # (axcnn/parallel/spatial.py — GSPMD halo exchange; for large-image
    # work where one chip per image is not enough). Multi-host: must divide
    # the per-host device count so each (data, spatial) mesh row stays on
    # one host.
    spatial_partitions: int = 1
    # Multi-slice data parallelism (axcnn/parallel/mesh.py
    # make_hierarchical_mesh): 0 = auto-detect the pod's slice count and
    # build a (dcn, data) mesh when >1 so gradient all-reduces run
    # hierarchically (ICI inside each slice, one cross-slice DCN exchange);
    # 1 = force the flat single-axis mesh; N = force N slice groups.
    dcn_slices: int = 0
    # >0: in-process liveness probe (utils/watchdog.py). If no forward
    # progress is proven for this many seconds (step dispatch, metrics
    # fetch, eval, checkpoint save all beat it), log `hang_detected` and
    # hard-exit with code 42 so a supervisor restarts the run, which then
    # auto-resumes from the last periodic checkpoint. Set it LARGER than
    # the worst legitimate pause (first compile of a big model through
    # the tunnel can take minutes). 0 = off.
    hang_watchdog_s: int = 0
    profile_steps: int = 0  # >0: wrap N steps in jax.profiler.trace
    tensorboard: bool = False  # also write TB scalar summaries to <model_dir>/tb
    eval_only: bool = False
    eval_imagenet_c: bool = False  # mCE mode
    export_dir: str = ""


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    runtime: RuntimeConfig = dataclasses.field(default_factory=RuntimeConfig)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)


def resolve_preprocessing(data: DataConfig) -> DataConfig:
    """Expand ``preprocessing_type`` ('imagenet_<size>_<min>[variant]') into
    (image_size, resize_min); empty string keeps the explicit fields."""
    if not data.preprocessing_type:
        return data
    import re

    m = re.fullmatch(r"imagenet_(\d+)_(\d+)[a-z]?", data.preprocessing_type)
    if not m:
        raise ValueError(
            f"unknown preprocessing_type {data.preprocessing_type!r} "
            "(expected 'imagenet_<crop>_<resize_min>[variant]', "
            "e.g. 'imagenet_224_256a')")
    return dataclasses.replace(data, image_size=int(m.group(1)),
                               resize_min=int(m.group(2)))


def _parse_value(raw: str, typ) -> Any:
    if typ is bool:
        if raw.lower() in ("1", "true", "yes", "on"):
            return True
        if raw.lower() in ("0", "false", "no", "off"):
            return False
        raise ValueError(f"bad bool {raw!r}")
    if typ is int:
        return int(raw)
    if typ is float:
        return float(raw)
    if typ is str:
        return raw
    # tuples (e.g. dropblock_stages): comma-separated ints
    return tuple(int(x) for x in raw.split(",") if x)


def _field_map(cfg: Config):
    """{(section, field): (container_name, field_obj)} + ambiguity info."""
    out = {}
    for section in ("model", "data", "train", "runtime"):
        sub = getattr(cfg, section)
        for f in dataclasses.fields(sub):
            out[(section, f.name)] = f
    return out


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    """Apply ``--a.b=v`` / ``--b=v`` strings. Returns a new Config
    (ModelConfig is frozen, so model overrides rebuild it via replace)."""
    fields = _field_map(cfg)
    sections = {"model": dict(), "data": dict(), "train": dict(), "runtime": dict()}

    for item in overrides:
        if not item.startswith("--"):
            raise ValueError(f"override must start with --: {item!r}")
        body = item[2:]
        if "=" not in body:
            body += "=true"  # bare flag = bool true
        name, raw = body.split("=", 1)
        if "." in name:
            section, fname = name.split(".", 1)
            if (section, fname) not in fields:
                raise ValueError(f"unknown config field {name!r}")
        else:
            matches = [(s, f) for (s, f) in fields if f == name]
            if not matches:
                raise ValueError(f"unknown config field {name!r}")
            if len(matches) > 1:
                raise ValueError(
                    f"ambiguous field {name!r} (in {[s for s, _ in matches]}); "
                    f"qualify as --section.{name}")
            section, fname = matches[0]
        f = fields[(section, fname)]
        sections[section][fname] = _parse_value(raw, f.type if isinstance(f.type, type) else
                                                type(getattr(getattr(cfg, section), fname)))

    model = dataclasses.replace(cfg.model, **sections["model"]) if sections["model"] else cfg.model
    data = dataclasses.replace(cfg.data, **sections["data"])
    train = dataclasses.replace(cfg.train, **sections["train"])
    runtime = dataclasses.replace(cfg.runtime, **sections["runtime"])
    return Config(model=model, data=data, train=train, runtime=runtime)


def load_preset(name: str) -> Config:
    """Load ``axcnn/configs/<name>.py`` (must define ``get_config() -> Config``)."""
    mod = importlib.import_module(f"axcnn.configs.{name}")
    return mod.get_config()


def parse_cli(argv: Sequence[str]) -> Config:
    """argv: everything after the program name."""
    preset = None
    overrides = []
    for a in argv:
        if a.startswith("--config="):
            preset = a.split("=", 1)[1]
        elif a in ("-h", "--help"):
            _print_help()
            raise SystemExit(0)
        else:
            overrides.append(a)
    cfg = load_preset(preset) if preset else Config()
    return apply_overrides(cfg, overrides)


def _print_help():
    cfg = Config()
    print(__doc__)
    for section in ("model", "data", "train", "runtime"):
        sub = getattr(cfg, section)
        print(f"\n[{section}]")
        for f in dataclasses.fields(sub):
            print(f"  --{section}.{f.name}  (default: {getattr(sub, f.name)!r})")
