"""Train state: the full pytree that is stepped, sharded, and checkpointed.

Unlike the reference (which checkpoints ``model.state_dict()`` only,
reference ``main.py:~150-160``), the state carries params, optimizer
moments, the step counter, and the PRNG key — so resume is exactly
deterministic (SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array                     # int32 scalar
    params: Any
    opt_state: Any
    rng: jax.Array                      # PRNG key for augmentation/dropout

    @classmethod
    def create(cls, params: Any, tx: optax.GradientTransformation,
               rng: jax.Array) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            rng=rng,
        )
