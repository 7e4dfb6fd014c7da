"""The training driver: wiring data, model, step, eval, checkpoints,
metrics (the reference's ``main.py:~90-200`` train loop, SURVEY.md §3.1 —
rebuilt around jit/sharding/Orbax).
"""

from __future__ import annotations

import logging
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pwcnet_tpu.config import Config
from pwcnet_tpu.data.base import get_dataset
from pwcnet_tpu.data.pipeline import Loader
from pwcnet_tpu.models import PWCNet
from pwcnet_tpu.parallel import (
    MeshConfig,
    initialize_distributed,
    make_mesh,
    replicate,
    shard_batch,
)
from pwcnet_tpu.train.checkpoint import (CheckpointManager,
                                          abstract_like)
from pwcnet_tpu.train.evaluate import evaluate_dataset
from pwcnet_tpu.train.metrics import MetricsWriter
from pwcnet_tpu.train.schedule import make_lr_schedule, optimizer_from_config
from pwcnet_tpu.train.state import TrainState
from pwcnet_tpu.train.step import make_train_step
from pwcnet_tpu.io import flow_to_rgb

_log = logging.getLogger(__name__)


def _flag(v) -> bool:
    """Robust tri-state-to-bool: accepts bools and the CLI's lowercase
    string spellings (a raw "false" string is truthy under bool())."""
    if isinstance(v, str):
        return v.lower() in ("1", "true", "yes")
    return bool(v)


def build_model(cfg: Config):
    m = cfg.model
    if m.family == "raft":
        from pwcnet_tpu.models.raft import RAFT
        kw = {} if m.raft_gru_fuse is None else {
            "gru_fuse_zr": _flag(m.raft_gru_fuse)}
        return RAFT(
            num_iters=m.raft_iters,
            corr_radius=m.raft_radius,
            corr_backend=m.corr_backend,
            dtype=jnp.bfloat16 if m.dtype == "bfloat16" else jnp.float32,
            **kw,
        )
    if m.family != "pwcnet":
        raise ValueError(f"unknown model family {m.family!r}")
    kw = {} if m.context_s2b is None else {
        "context_s2b": _flag(m.context_s2b)}
    return PWCNet(
        num_levels=m.num_levels,
        output_level=m.output_level,
        search_range=m.search_range,
        residual=m.residual,
        use_norm=m.use_norm,
        input_norm=m.input_norm,
        input_center=m.input_center,
        corr_backend=m.corr_backend,
        stem_backend=m.stem_backend,
        flow_scale=m.flow_scale,
        resize_mode=m.resize_mode,
        dtype=jnp.bfloat16 if m.dtype == "bfloat16" else jnp.float32,
        **kw,
    )


def apply_debug_config(cfg: Config) -> None:
    """Wire the config's debug switches into jax (SURVEY.md §5 sanitizers:
    the functional-JAX analog of a NaN sanitizer — ``train.debug_nans=true``
    makes any NaN in any jitted computation raise FloatingPointError at the
    producing op instead of silently corrupting training)."""
    jax.config.update("jax_debug_nans", bool(cfg.train.debug_nans))


def train(cfg: Config, max_steps: Optional[int] = None) -> dict:
    """Run training per config; returns final metrics dict."""
    apply_debug_config(cfg)
    _summary_error_logged = [False]
    p = cfg.parallel
    initialize_distributed(p.coordinator, p.num_processes, p.process_id)
    mesh = make_mesh(MeshConfig(data=p.data, spatial=p.spatial,
                                model=p.model))

    model = build_model(cfg)
    tx = optimizer_from_config(cfg.train)
    lr_sched = make_lr_schedule(cfg.train.schedule)

    # --- datasets ---
    use_devgen = cfg.data.device_gen and cfg.data.name == "synthetic"
    # The synthetic dataset takes its sample size from the config (file
    # datasets get theirs from the files + host collation).
    ds_kw = ({"hw": cfg.data.sample_hw,
              "regime": cfg.data.synthetic_regime,
              "val_length": cfg.data.synthetic_val_length}
             if cfg.data.name == "synthetic" else {})
    train_ds = (None if use_devgen else
                get_dataset(cfg.data.name, cfg.data.root, split="train",
                            **ds_kw))
    try:
        val_ds = get_dataset(cfg.data.name, cfg.data.root, split="val",
                             **ds_kw)
    except (FileNotFoundError, ValueError):
        val_ds = None

    # --- init state (replicated over the mesh) ---
    crop = cfg.data.augment.crop_hw
    dummy = jnp.zeros((1, crop[0], crop[1], 3), jnp.float32)

    @jax.jit
    def init_params(key):
        return model.init(key, dummy, dummy)

    key = jax.random.key(cfg.train.seed)
    params = replicate(mesh, init_params(key))
    state = TrainState.create(params, tx, jax.random.fold_in(key, 1))
    state = replicate(mesh, state)

    ckpt = CheckpointManager(cfg.train.log_dir + "/ckpt",
                             max_to_keep=cfg.train.max_to_keep)
    if cfg.train.init_from:
        warm = CheckpointManager(cfg.train.init_from)
        restored = warm.restore(abstract_like(state))
        state = replicate(mesh, state.replace(params=restored.params))
        warm.close()
    if cfg.train.resume and ckpt.latest_step is not None:
        # Abstract template: no device->host round trip (the state is
        # ~60 MB of params+moments — very expensive through a remote-TPU
        # tunnel); Orbax materializes directly on device.
        state = ckpt.restore_latest_or(abstract_like(state))
        state = replicate(mesh, state)
    start_step = int(jax.device_get(state.step))

    # Device-generated synthetic batches need no augmentation (every sample
    # is a fresh draw already) and no host loader at all.
    step_fn = make_train_step(model, tx,
                              aug=None if use_devgen else cfg.data.augment,
                              loss_kind=cfg.train.loss, mesh=mesh,
                              level_weights=cfg.train.level_weights)

    if use_devgen:
        from pwcnet_tpu.data.synthetic import make_device_batcher
        batcher = make_device_batcher(
            cfg.train.global_batch, cfg.data.augment.crop_hw,
            seed=cfg.train.seed, mesh=mesh,
            regime=cfg.data.synthetic_regime)
        loader = None
    else:
        loader = Loader(
            train_ds, cfg.train.global_batch,
            sample_hw=cfg.data.sample_hw, seed=cfg.train.seed,
            num_threads=cfg.data.num_threads, start_step=start_step,
            process_index=jax.process_index(),
            process_count=jax.process_count())

    writer = MetricsWriter(cfg.train.log_dir)
    total = cfg.train.schedule.total_steps
    if max_steps is not None:
        total = min(total, start_step + max_steps)

    if cfg.train.profile_dir and jax.process_index() == 0:
        jax.profiler.start_trace(cfg.train.profile_dir)

    t_last = time.time()
    pairs_since = 0
    final_metrics: dict = {}
    step = start_step
    try:
        while step < total:
            if loader is None:
                gbatch = batcher(jnp.uint32(step))
            else:
                gbatch = shard_batch(mesh, next(loader))
            state, metrics = step_fn(state, gbatch)
            step += 1
            pairs_since += cfg.train.global_batch

            if step % cfg.train.summary_interval == 0 or step == total:
                metrics = {k: float(jax.device_get(v))
                           for k, v in metrics.items()}
                dt = time.time() - t_last
                n_dev = max(jax.device_count(), 1)
                metrics.update(
                    lr=float(lr_sched(step)),
                    pairs_per_sec=pairs_since / dt,
                    pairs_per_sec_per_chip=pairs_since / dt / n_dev,
                )
                writer.scalars(step, metrics)
                final_metrics = metrics
                t_last = time.time()
                pairs_since = 0

            if val_ds is not None and step % cfg.train.eval_interval == 0:
                ev = evaluate_dataset(model, state.params, val_ds,
                                      batch=cfg.data.eval_batch, mesh=mesh,
                                      limit=cfg.train.eval_limit)
                writer.scalars(step, {
                    "val_epe": ev["epe"], "val_fl_all": ev["fl_all"],
                    **{f"val_{k}": v for k, v in ev.items()
                       if k.startswith("epe_s")}})
                final_metrics["val_epe"] = ev["epe"]
                final_metrics["val_fl_all"] = ev["fl_all"]
                # Qualitative flow summaries (reference main.py:~160-185
                # vis_flow images): prediction vs GT on one val sample.
                if jax.process_index() == 0:
                    try:
                        from pwcnet_tpu.train.evaluate import predict_flow
                        s0 = val_ds[0]
                        pred = predict_flow(model, state.params,
                                            s0["im1"], s0["im2"])
                        mm = float(np.abs(s0["flow"]).max()) or None
                        writer.flow_image(step, "val/flow_pred", pred,
                                          max_mag=mm)
                        writer.flow_image(step, "val/flow_gt", s0["flow"],
                                          max_mag=mm)
                        writer.image(step, "val/im1",
                                     (s0["im1"] * 255).astype(np.uint8))
                    except Exception:
                        # Summaries must never kill training, but a silent
                        # pass hides real vis/IO bugs — log the first one.
                        if not _summary_error_logged[0]:
                            _summary_error_logged[0] = True
                            _log.exception(
                                "eval image summary failed (logged once; "
                                "further failures are suppressed)")

            if step % cfg.train.checkpoint_interval == 0 or step == total:
                # Async Orbax save on the device arrays (no host gather
                # here): orbax copies to host once, then writes in the
                # background while training continues (SURVEY §5
                # "sharded-save aware"; VERDICT r3 missing #6).
                ckpt.save(state)
    finally:
        if loader is not None:
            loader.close()
        if cfg.train.profile_dir and jax.process_index() == 0:
            jax.profiler.stop_trace()
        ckpt.wait()
        ckpt.close()
        writer.close()
    final_metrics["step"] = step
    return final_metrics
