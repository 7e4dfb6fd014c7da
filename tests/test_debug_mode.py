"""Debug-mode sanitizers (SURVEY.md §5; VERDICT r2 missing #7).

Two mechanisms:
- ``train.debug_nans`` config flag -> ``jax_debug_nans``: a NaN produced
  anywhere inside the jitted train step raises FloatingPointError instead
  of silently propagating into the weights.
- Donated-buffer aliasing: the train step donates the TrainState
  (``donate_argnums=(0,)``); the pre-step state buffers are invalidated by
  XLA and any later use must fail loudly (RuntimeError), never silently
  read stale memory. This pins the documented semantics the training loop
  relies on when it threads ``state`` through.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.config import Config, ModelConfig, TrainConfig
from pwcnet_tpu.models import PWCNet
from pwcnet_tpu.train.schedule import ScheduleConfig, make_optimizer
from pwcnet_tpu.train.state import TrainState
from pwcnet_tpu.train.step import make_train_step


def _tiny_setup(rng):
    model = PWCNet(num_levels=3, output_level=2, search_range=2,
                   corr_backend="lax", dtype=jnp.float32)
    tx = make_optimizer(ScheduleConfig(base_lr=1e-4, milestones=(10,),
                                       total_steps=20))
    h = w = 32
    batch = {
        "im1": jnp.asarray(rng.random((2, h, w, 3)), jnp.float32),
        "im2": jnp.asarray(rng.random((2, h, w, 3)), jnp.float32),
        "flow": jnp.asarray(rng.standard_normal((2, h, w, 2)), jnp.float32),
        "valid": jnp.ones((2, h, w), jnp.float32),
    }
    params = jax.jit(model.init)(
        jax.random.key(0), batch["im1"][:1], batch["im2"][:1])
    state = TrainState.create(params, tx, jax.random.key(1))
    return model, tx, state, batch


def test_debug_nans_flag_raises_on_nan_batch(rng):
    from pwcnet_tpu.train.loop import apply_debug_config

    model, tx, state, batch = _tiny_setup(rng)
    # Build the poisoned batch on the host BEFORE enabling the sanitizer
    # (any jitted op producing the NaN would already trip it).
    im1 = np.asarray(batch["im1"]).copy()
    im1[0, 0, 0, 0] = np.nan
    batch = dict(batch, im1=jnp.asarray(im1))
    step = make_train_step(model, tx, aug=None)
    cfg = Config(train=TrainConfig(debug_nans=True))
    apply_debug_config(cfg)
    try:
        with pytest.raises(FloatingPointError):
            state, metrics = step(state, batch)
            jax.block_until_ready(metrics)
    finally:
        apply_debug_config(Config())  # restore: flag defaults to off
    assert not jax.config.jax_debug_nans


def test_debug_nans_off_is_silent(rng):
    """Default mode: the same NaN batch runs to completion (loss is NaN,
    nothing raises) — pins that the sanitizer is opt-in."""
    model, tx, state, batch = _tiny_setup(rng)
    batch = dict(batch, im1=batch["im1"].at[0, 0, 0, 0].set(jnp.nan))
    step = make_train_step(model, tx, aug=None)
    state, metrics = step(state, batch)
    assert not np.isfinite(float(metrics["loss"]))


def test_donated_state_buffers_are_invalidated(rng):
    model, tx, state, batch = _tiny_setup(rng)
    step = make_train_step(model, tx, aug=None)
    old_leaf = jax.tree_util.tree_leaves(state.params)[0]
    new_state, _ = step(state, batch)
    # XLA reused the old state's memory for the new state (donation).
    assert old_leaf.is_deleted()
    with pytest.raises(RuntimeError, match="deleted"):
        _ = float(jnp.sum(old_leaf))
    # The threaded-through new state is intact and steppable again.
    newer, metrics = step(new_state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(newer.step) == 2
