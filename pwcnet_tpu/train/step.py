"""The jitted train/eval steps — one XLA computation each.

Distribution model (SURVEY.md §2b): with a mesh, the step body runs under
``jax.shard_map`` so every op (including the Pallas correlation kernel,
which XLA cannot auto-partition) is shard-local; gradients and metrics are
explicitly ``pmean``/``psum``-ed over the ``data`` axis (the ICI all-reduce),
and the optimizer update is computed identically on every device, keeping
params/opt-state replicated. Single-device falls back to plain ``jit``.

Augmentation runs inside the step (on device); state buffers are donated.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from pwcnet_tpu.data.augment import AugmentConfig, augment_batch
from pwcnet_tpu.losses import (epe, fl_outliers, multiscale_loss,
                               robust_loss, sequence_loss)
from pwcnet_tpu.models import PWCNet
from pwcnet_tpu.parallel import DATA_AXIS
from pwcnet_tpu.train.state import TrainState


def _make_loss(loss_kind: str, model, level_weights=None) -> Callable:
    """loss(flows, gt, valid) for the model family / loss kind."""
    from pwcnet_tpu.losses import LEVEL_WEIGHTS
    weights = tuple(level_weights) if level_weights else LEVEL_WEIGHTS
    if loss_kind == "multiscale":
        return lambda flows, gt, v: multiscale_loss(
            flows, gt, v, weights=weights, flow_scale=model.flow_scale)
    if loss_kind == "robust":
        return lambda flows, gt, v: robust_loss(
            flows, gt, v, weights=weights, flow_scale=model.flow_scale)
    if loss_kind == "sequence":  # RAFT per-iteration loss
        return sequence_loss
    if loss_kind == "sequence_inscan":
        # Handled structurally in local_step (the model computes the loss
        # inside its lax.scan; see models/raft.py in-scan docstring).
        return None
    raise ValueError(f"unknown loss kind {loss_kind!r}")


def make_train_step(model, tx: optax.GradientTransformation,
                    aug: Optional[AugmentConfig] = None,
                    loss_kind: str = "multiscale",
                    mesh=None, level_weights=None
                    ) -> Callable[[TrainState, Dict[str, Any]],
                                  tuple]:
    """Build the jitted train step (PWCNet or RAFT family).

    batch: dict of f32 arrays — im1, im2 (N,H,W,3), flow (N,H,W,2),
    valid (N,H,W); N is the global batch (sharded over ``data`` when a mesh
    is given). Returns (new_state, metrics).
    """
    loss_fn_inner = _make_loss(loss_kind, model, level_weights)
    distributed = mesh is not None

    def local_step(state: TrainState, batch: Dict[str, Any]):
        rng, aug_key = jax.random.split(state.rng)
        if distributed:
            # Distinct augmentation randomness per data shard.
            aug_key = jax.random.fold_in(
                aug_key, jax.lax.axis_index(DATA_AXIS))
        if aug is not None:
            batch = augment_batch(batch, aug_key, aug)

        def loss_fn(params):
            if loss_kind == "sequence_inscan":
                # RAFT computes the sequence loss inside its scan — the
                # per-iteration full-res flows never materialize
                # (profile_r5: saves the stacked-output writes + loss
                # re-reads); returns ([final_flow], loss).
                flows, loss = model.apply(
                    params, batch["im1"], batch["im2"],
                    gt=batch["flow"], valid=batch["valid"])
            else:
                flows = model.apply(params, batch["im1"], batch["im2"])
                loss = loss_fn_inner(flows, batch["flow"], batch["valid"])
            return loss, flows

        (loss, flows), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if distributed:
            # The ICI gradient all-reduce (GSPMD-free, explicit).
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, rng=rng)

        # Train-time EPE proxy: finest level vs downsampled GT, rescaled to
        # full-res pixels (cheap; exact full-res EPE lives in evaluate.py).
        # PWCNet: scaled units * flow_scale; RAFT: level-res pixels * stride.
        finest = flows[-1]
        to_px = (model.flow_scale if hasattr(model, "flow_scale")
                 else batch["im1"].shape[1] / finest.shape[1])
        # Mask-weighted GT downsample (continuous fractional weights — keeps
        # sparse-GT supervision meaningful; see losses.downsample_gt).
        from pwcnet_tpu.losses import downsample_gt
        gt_small, v_small = downsample_gt(
            batch["flow"], finest.shape[1:3], flow_scale=1.0,
            valid=batch["valid"])
        train_epe = epe(finest * to_px, gt_small, v_small)
        grad_norm = optax.global_norm(grads)
        if distributed:
            train_epe = jax.lax.pmean(train_epe, DATA_AXIS)
        metrics = {"loss": loss, "train_epe": train_epe,
                   "grad_norm": grad_norm}
        return new_state, metrics

    if not distributed:
        return jax.jit(local_step, donate_argnums=(0,))

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


# GT-magnitude bin edges for the eval EPE breakdown (Sintel's s0-10 /
# s10-40 / s40+ convention — the displacement regimes where PWC-style
# models differ most; VERDICT r2 next #10).
EPE_MAG_BINS = (10.0, 40.0)


def make_eval_step(model: PWCNet, mesh=None) -> Callable:
    """Jitted eval: forward + full-res EPE / Fl-outlier sums on an (already
    padded) batch.

    Returns (sum_epe, sum_outliers, num_valid, bins, per_sample) so
    callers average over a dataset exactly; ``bins`` is a (2, 3) array of
    per-magnitude-bin [epe-sum, valid-count] rows over GT magnitude in
    [0,10) / [10,40) / [40,inf) px. ``per_sample`` is a (B, 8) array of
    per-sample [epe_sum, valid_count, bin epe-sums x3, bin counts x3] —
    the basis for sample-level error bars (VERDICT r4 weak #6). With a
    mesh the scalars are psum-ed and ``per_sample`` all-gathered over the
    data axis. Outliers follow the KITTI Fl-all definition (devkit):
    EPE > 3 px AND EPE > 5% of the GT flow magnitude.
    """

    def local_step(params, batch):
        flows = model.apply(params, batch["im1"], batch["im2"], train=False)
        hw = batch["im1"].shape[1:3]
        full = model.full_res_flow(flows, hw)
        diff = full - batch["flow"]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-16)
        outlier = fl_outliers(full, batch["flow"])
        v = batch["valid"]
        s, o, c = jnp.sum(dist * v), jnp.sum(outlier * v), jnp.sum(v)
        mag = jnp.sqrt(jnp.sum(batch["flow"] ** 2, axis=-1) + 1e-16)
        lo, hi = EPE_MAG_BINS
        masks = ((mag < lo).astype(v.dtype) * v,
                 ((mag >= lo) & (mag < hi)).astype(v.dtype) * v,
                 (mag >= hi).astype(v.dtype) * v)
        bins = jnp.stack([
            jnp.stack([jnp.sum(dist * m) for m in masks]),
            jnp.stack([jnp.sum(m) for m in masks]),
        ])
        sample_axes = tuple(range(1, dist.ndim))
        per_sample = jnp.concatenate([
            jnp.sum(dist * v, axis=sample_axes)[:, None],
            jnp.sum(v, axis=sample_axes)[:, None],
            jnp.stack([jnp.sum(dist * m, axis=sample_axes) for m in masks],
                      axis=1),
            jnp.stack([jnp.sum(m, axis=sample_axes) for m in masks],
                      axis=1),
        ], axis=1)
        if mesh is not None:
            s = jax.lax.psum(s, DATA_AXIS)
            o = jax.lax.psum(o, DATA_AXIS)
            c = jax.lax.psum(c, DATA_AXIS)
            bins = jax.lax.psum(bins, DATA_AXIS)
        return s, o, c, bins, per_sample

    if mesh is None:
        return jax.jit(local_step)
    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P(), P(), P(), P(DATA_AXIS)),
        check_vma=False,
    )
    return jax.jit(sharded)
