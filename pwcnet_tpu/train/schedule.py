"""Learning-rate schedules: the paper's S_long / S_fine step schedules.

Reference behavior (``main.py``: Adam + lr halving at milestone steps):
- S_long (train from scratch on Chairs/Things): lr 1e-4, halved at
  400k/600k/800k/1M steps, 1.2M steps total.
- S_fine (fine-tune): lr 1e-5, halved at 200k/300k/400k/500k of the
  fine-tune run.
Weight decay 4e-4 via AdamW-style decoupled decay (the reference passes
``weight_decay`` to torch Adam, which is L2-coupled; we keep a flag).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence, Tuple

import optax


@dataclass(frozen=True)
class ScheduleConfig:
    base_lr: float = 1e-4
    milestones: Tuple[int, ...] = (400_000, 600_000, 800_000, 1_000_000)
    gamma: float = 0.5
    total_steps: int = 1_200_000
    warmup_steps: int = 0


S_LONG = ScheduleConfig()
S_FINE = ScheduleConfig(base_lr=1e-5,
                        milestones=(200_000, 300_000, 400_000, 500_000),
                        total_steps=600_000)


def make_lr_schedule(cfg: ScheduleConfig) -> optax.Schedule:
    sched = optax.piecewise_constant_schedule(
        init_value=cfg.base_lr,
        boundaries_and_scales={m: cfg.gamma for m in cfg.milestones},
    )
    if cfg.warmup_steps:
        warm = optax.linear_schedule(0.0, cfg.base_lr, cfg.warmup_steps)
        return optax.join_schedules([warm, sched], [cfg.warmup_steps])
    return sched


def make_optimizer(cfg: ScheduleConfig, weight_decay: float = 4e-4,
                   grad_clip: float = 0.0,
                   coupled_l2: bool = False) -> optax.GradientTransformation:
    """Adam + weight decay with the milestone schedule, matching the
    reference's ``Adam(lr, weight_decay=4e-4)`` (``main.py:~100``).

    ``coupled_l2=True`` reproduces torch Adam's *coupled* L2 exactly
    (decay added to the gradient BEFORE the Adam moments — what the
    reference actually ran; pinned against torch.optim.Adam in
    tests/test_config.py). The default stays decoupled (AdamW), the
    better-behaved modern choice — PARITY.md row 16, now a one-line flip.
    """
    parts = []
    if grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if coupled_l2:
        parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.adam(learning_rate=make_lr_schedule(cfg)))
    else:
        parts.append(optax.adamw(learning_rate=make_lr_schedule(cfg),
                                 weight_decay=weight_decay))
    return optax.chain(*parts)


def optimizer_from_config(train_cfg) -> optax.GradientTransformation:
    """Build the optimizer from a full ``TrainConfig``.

    The optax chain's *structure* depends on grad_clip/coupled_l2, so a
    checkpoint-restore template MUST be built with the same flags the run
    was trained with — every restore site goes through this helper so the
    pytree structure always matches (a grad_clip=1.0 checkpoint has an
    extra clip state entry that a bare ``make_optimizer(schedule)``
    template would lack)."""
    return make_optimizer(train_cfg.schedule, train_cfg.weight_decay,
                          train_cfg.grad_clip, train_cfg.coupled_l2)
