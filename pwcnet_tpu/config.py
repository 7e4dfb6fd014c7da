"""Config tree: dataclass sections + CLI overrides + named presets.

Replaces the reference's flat ~25-flag argparse surface
(``main.py:~1-90``) with a structured config (SURVEY.md §5 config system).
Every reference flag has a home here:

  --dataset/--dataset_dir      -> DataConfig.name / .root
  --crop_shape/--crop_type     -> DataConfig.crop_hw (+augment), eval pad
  --batch_size                 -> TrainConfig.global_batch
  --lr/--milestones/--gamma    -> TrainConfig.schedule
  --weight_decay               -> TrainConfig.weight_decay
  --total_step                 -> TrainConfig.schedule.total_steps
  --num_levels/--output_level  -> ModelConfig
  --search_range               -> ModelConfig.search_range
  --corr                       -> ModelConfig.corr_backend
  --residual                   -> ModelConfig.residual
  --input_norm/--batch_norm    -> ModelConfig.input_norm / .use_norm
  --log_dir                    -> TrainConfig.log_dir
  --summary_interval etc.      -> TrainConfig.*_interval
  --load                       -> TrainConfig.resume (auto-latest) / init_from
  --device/--num_workers       -> ParallelConfig / DataConfig.num_threads
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

from pwcnet_tpu.data.augment import AugmentConfig
from pwcnet_tpu.train.schedule import S_FINE, S_LONG, ScheduleConfig


@dataclass(frozen=True)
class ModelConfig:
    family: str = "pwcnet"            # pwcnet | raft
    raft_iters: int = 12
    raft_radius: int = 4
    num_levels: int = 6
    output_level: int = 4
    search_range: int = 4
    residual: bool = True
    use_norm: bool = False
    input_norm: bool = False
    input_center: bool = False        # PARITY row 18: feed [-1,1] images
    corr_backend: str = "pallas"
    stem_backend: str = "auto"        # fused pyramid-stem kernel (levels 1-2)
    # None = the model's measured default; True/False force the lowering.
    context_s2b: Any = None           # space-to-batch dilated context convs
    raft_gru_fuse: Any = None         # fused z/r gate convs in the ConvGRU
    flow_scale: float = 20.0
    resize_mode: str = "half_pixel"   # PARITY row 9: | "align_corners"
    dtype: str = "bfloat16"           # compute dtype: float32|bfloat16


@dataclass(frozen=True)
class DataConfig:
    name: str = "flyingchairs"
    root: str = "/data/FlyingChairs_release/data"
    crop_hw: Tuple[int, int] = (384, 448)
    sample_hw: Tuple[int, int] = (384, 512)   # host collation shape
    eval_batch: int = 4
    num_threads: int = 8
    # Synthetic dataset only: generate training batches *on device* inside
    # a jitted generator (no host<->device transfer in the hot loop).
    device_gen: bool = False
    # Synthetic dataset regime: "smooth" (<=~20 px, no occlusion — the
    # convention-proof setting) | "hard" (displacements to ~100 px + a
    # second moving layer with real occlusions).
    synthetic_regime: str = "smooth"
    # Synthetic val-split size (>= eval_limit; 512 backs the r5
    # sample-stderr eval protocol).
    synthetic_val_length: int = 512
    augment: AugmentConfig = field(default_factory=AugmentConfig)


@dataclass(frozen=True)
class ParallelConfig:
    data: int = -1
    spatial: int = 1
    model: int = 1
    coordinator: Optional[str] = None
    num_processes: Optional[int] = None
    process_id: Optional[int] = None


@dataclass(frozen=True)
class TrainConfig:
    global_batch: int = 8
    schedule: ScheduleConfig = field(default_factory=lambda: S_LONG)
    weight_decay: float = 4e-4
    # torch Adam's weight_decay is COUPLED L2 (decay into the gradient);
    # default here is decoupled AdamW. Flip for exact reference-optimizer
    # parity (PARITY.md row 16; pinned against torch in tests).
    coupled_l2: bool = False
    grad_clip: float = 0.0
    loss: str = "multiscale"          # multiscale | robust
    # Override the paper's per-level loss weights (coarsest first; None =
    # losses.LEVEL_WEIGHTS). Knob for the hard-regime plateau recipe
    # experiments (VERDICT r4 weak #3).
    level_weights: Optional[Tuple[float, ...]] = None
    seed: int = 0
    log_dir: str = "runs/default"
    summary_interval: int = 100
    eval_interval: int = 5000
    checkpoint_interval: int = 5000
    max_to_keep: int = 5
    resume: bool = True               # auto-resume from latest in log_dir
    init_from: Optional[str] = None   # warm-start params from a checkpoint
    eval_limit: Optional[int] = None  # cap val samples (speed)
    profile_dir: Optional[str] = None # jax.profiler trace output
    # Debug mode (SURVEY.md §5 sanitizers): every jitted computation is
    # NaN-checked; a NaN anywhere raises FloatingPointError at the op that
    # produced it (re-run de-optimized). Large slowdown — debugging only.
    debug_nans: bool = False


@dataclass(frozen=True)
class Config:
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)


def _replace(cfg, **kw):
    return dataclasses.replace(cfg, **kw)


# Presets for the BASELINE.json configs (SURVEY.md §5 "presets").
PRESETS = {
    # config 1: one FlyingChairs pair on CPU — handled by `pwcnet predict`.
    "chairs-1chip": Config(
        train=TrainConfig(global_batch=8, log_dir="runs/chairs"),
    ),
    "chairs-quick": Config(  # smoke-scale run
        train=TrainConfig(
            global_batch=4,
            schedule=ScheduleConfig(base_lr=1e-4, milestones=(800, 900),
                                    total_steps=1000),
            summary_interval=20, eval_interval=200, checkpoint_interval=200,
            eval_limit=64, log_dir="runs/chairs-quick"),
    ),
    "things-ft": Config(
        data=DataConfig(name="flyingthings", root="/data/FlyingThings3D",
                        crop_hw=(384, 768), sample_hw=(540, 960)),
        train=TrainConfig(global_batch=8, schedule=S_FINE, loss="multiscale",
                          log_dir="runs/things-ft"),
    ),
    "sintel-eval": Config(
        data=DataConfig(name="sintel", root="/data/Sintel",
                        sample_hw=(448, 1024)),
        train=TrainConfig(log_dir="runs/sintel-eval"),
    ),
    # End-to-end learning proof on procedural data with exact GT (no /data
    # needed): validates warp direction, u/v order, flow_scale, loss scaling.
    "synthetic-proof": Config(
        data=DataConfig(name="synthetic", root="-", crop_hw=(384, 448),
                        sample_hw=(384, 448), eval_batch=8, device_gen=True),
        train=TrainConfig(
            global_batch=8,
            schedule=ScheduleConfig(base_lr=1e-4,
                                    milestones=(60_000, 90_000, 110_000),
                                    total_steps=125_000),
            summary_interval=200, eval_interval=2500,
            checkpoint_interval=5000, eval_limit=128,
            log_dir="runs/synthetic-proof"),
    ),
    # Hard synthetic regime: large displacements (to ~100 px) + occlusions
    # from a second moving layer — the Sintel-difficulty proxy while /data
    # is absent (eval reports EPE by displacement-magnitude bin).
    "synthetic-hard": Config(
        data=DataConfig(name="synthetic", root="-", crop_hw=(384, 448),
                        sample_hw=(384, 448), eval_batch=8, device_gen=True,
                        synthetic_regime="hard"),
        train=TrainConfig(
            global_batch=8,
            schedule=ScheduleConfig(base_lr=1e-4,
                                    milestones=(60_000, 90_000, 110_000),
                                    total_steps=125_000),
            summary_interval=200, eval_interval=2500,
            # 512 val samples: halves the s40+ bin stderr vs 128 (VERDICT
            # r4 weak #6); samples are memoized after the first eval.
            checkpoint_interval=5000, eval_limit=512,
            log_dir="runs/synthetic-hard"),
    ),
    "raft-chairs": Config(  # stretch: RAFT-style iterative head
        model=ModelConfig(family="raft"),
        train=TrainConfig(global_batch=8, loss="sequence",
                          log_dir="runs/raft-chairs"),
    ),
    "kitti-multihost": Config(
        data=DataConfig(name="kitti", root="/data/KITTI2015",
                        crop_hw=(320, 896), sample_hw=(384, 1280)),
        train=TrainConfig(global_batch=16, schedule=S_FINE, loss="robust",
                          log_dir="runs/kitti-ft"),
    ),
}


def apply_overrides(cfg: Config, overrides: list[str]) -> Config:
    """Apply ``section.field=value`` CLI overrides (nested via dots)."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got {ov!r}")
        key, val = ov.split("=", 1)
        parts = key.split(".")
        cfg = _set_nested(cfg, parts, val)
    return cfg


def _coerce(current, val: str):
    import ast
    if isinstance(current, bool):
        return val.lower() in ("1", "true", "yes")
    if val.lower() in ("none", "null"):
        return None
    if isinstance(current, str):
        return val
    if current is None:
        # Optional field with no type witness: booleans first (CLI spelling
        # is lowercase true/false, which ast.literal_eval rejects — and a
        # surviving "false" string is truthy downstream), then literals
        # (ints, tuples, ...), keeping unparseable values as strings
        # (paths etc.).
        if val.lower() in ("true", "yes"):
            return True
        if val.lower() in ("false", "no"):
            return False
        try:
            return ast.literal_eval(val)
        except (ValueError, SyntaxError):
            return val
    try:
        return type(current)(ast.literal_eval(val))
    except (ValueError, SyntaxError):
        return type(current)(val)


def _set_nested(obj, parts, val):
    name = parts[0]
    if not hasattr(obj, name):
        raise AttributeError(
            f"{type(obj).__name__} has no field {name!r}; have "
            f"{[f.name for f in dataclasses.fields(obj)]}")
    cur = getattr(obj, name)
    if len(parts) == 1:
        return dataclasses.replace(obj, **{name: _coerce(cur, val)})
    return dataclasses.replace(obj, **{name: _set_nested(cur, parts[1:], val)})
