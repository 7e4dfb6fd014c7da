"""End-to-end training-loop tests: smoke run, checkpoint, deterministic
resume (the fault-injection analog from SURVEY.md §5: kill + restart must
reproduce the uninterrupted run exactly).
"""

import glob
import os

import jax
import numpy as np
import pytest

from pwcnet_tpu.config import (
    Config,
    DataConfig,
    ModelConfig,
    ParallelConfig,
    TrainConfig,
    apply_overrides,
)
from pwcnet_tpu.data.augment import AugmentConfig
from pwcnet_tpu.train.schedule import ScheduleConfig
from pwcnet_tpu.train.loop import train


def _tiny_cfg(chairs_dir, log_dir, total_steps=6):
    return Config(
        model=ModelConfig(num_levels=3, output_level=2, search_range=2,
                          corr_backend="lax", dtype="float32"),
        data=DataConfig(
            name="flyingchairs", root=chairs_dir,
            sample_hw=(64, 96), eval_batch=2,
            augment=AugmentConfig(crop_hw=(32, 32), photometric=False)),
        train=TrainConfig(
            global_batch=2,
            schedule=ScheduleConfig(base_lr=1e-4, milestones=(1000,),
                                    total_steps=total_steps),
            summary_interval=2, eval_interval=1000,
            checkpoint_interval=3, eval_limit=2,
            log_dir=log_dir, seed=11),
        parallel=ParallelConfig(data=2),
    )


@pytest.mark.slow
def test_train_smoke_and_resume(chairs_dir, tmp_path):
    log_a = str(tmp_path / "run_a")
    log_b = str(tmp_path / "run_b")

    # Uninterrupted 6-step run.
    m_a = train(_tiny_cfg(chairs_dir, log_a, total_steps=6))
    assert m_a["step"] == 6
    assert np.isfinite(m_a["loss"])
    assert os.path.isdir(os.path.join(log_a, "ckpt"))
    assert glob.glob(os.path.join(log_a, "metrics.jsonl"))

    # Interrupted run: 3 steps (checkpoint lands at 3), then resume to 6.
    m_b1 = train(_tiny_cfg(chairs_dir, log_b, total_steps=3))
    assert m_b1["step"] == 3
    m_b2 = train(_tiny_cfg(chairs_dir, log_b, total_steps=6))
    assert m_b2["step"] == 6

    # Deterministic resume: same loss trajectory at step 6.
    np.testing.assert_allclose(m_b2["loss"], m_a["loss"], rtol=1e-4)
    np.testing.assert_allclose(m_b2["train_epe"], m_a["train_epe"],
                               rtol=1e-4)


@pytest.mark.slow
def test_eval_during_training(chairs_dir, tmp_path):
    cfg = _tiny_cfg(chairs_dir, str(tmp_path / "run_ev"), total_steps=2)
    cfg = apply_overrides(cfg, ["train.eval_interval=2"])
    m = train(cfg)
    assert "val_epe" in m and np.isfinite(m["val_epe"])


@pytest.mark.slow
def test_synthetic_learning_regression():
    """Fixed-seed short regression on *real-GT* synthetic-motion scenes
    (the dataset behind the committed runs/synthetic-proof learning proof).
    Unlike a random-GT overfit, the GT here is physically consistent with
    the image pair, so descent catches a wrong warp direction, flipped u/v
    channels, or a bad flow_scale convention — the loss cannot descend with
    any of those broken. A fixed 2-scene batch keeps the trajectory
    deterministic and the descent signal noise-free."""
    import jax.numpy as jnp
    import optax

    from pwcnet_tpu.data.synthetic import SyntheticFlow
    from pwcnet_tpu.losses import multiscale_loss
    from pwcnet_tpu.models import PWCNet

    ds = SyntheticFlow(hw=(64, 96), length=2, seed=23)
    batch = {k: jnp.stack([jnp.asarray(ds[i][k]) for i in range(2)])
             for k in ("im1", "im2", "flow", "valid")}
    model = PWCNet(num_levels=3, output_level=2, search_range=2,
                   corr_backend="lax")
    params = jax.jit(model.init)(jax.random.key(3), batch["im1"],
                                 batch["im2"])
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            flows = model.apply(p, batch["im1"], batch["im2"])
            return multiscale_loss(flows, batch["flow"], batch["valid"],
                                   flow_scale=model.flow_scale)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, loss

    losses = []
    for _ in range(80):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * np.mean(losses[:3]), losses[::10]


@pytest.mark.slow
def test_raft_family_trains(chairs_dir, tmp_path):
    cfg = _tiny_cfg(chairs_dir, str(tmp_path / "run_raft"), total_steps=3)
    from pwcnet_tpu.config import apply_overrides
    cfg = apply_overrides(cfg, [
        "model.family=raft", "model.raft_iters=3", "model.raft_radius=2",
        "train.loss=sequence",
    ])
    m = train(cfg)
    assert m["step"] == 3
    assert np.isfinite(m["loss"])


def test_restore_template_matches_grad_clip_coupled_l2_checkpoint(tmp_path):
    """ADVICE r3 (medium): a checkpoint trained with grad_clip>0 /
    coupled_l2=true has extra optax chain state; every CLI restore site
    now builds its template via optimizer_from_config(cfg.train), so the
    pytree structure must round-trip for any flag combination."""
    import dataclasses

    import jax.numpy as jnp

    from pwcnet_tpu.config import Config
    from pwcnet_tpu.train.checkpoint import CheckpointManager, abstract_like
    from pwcnet_tpu.train.schedule import optimizer_from_config
    from pwcnet_tpu.train.state import TrainState

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_clip=1.0,
                                       coupled_l2=True))
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    tx = optimizer_from_config(cfg.train)
    state = TrainState.create(params, tx, jax.random.key(0))

    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    assert mgr.save(state, force=True)
    mgr.wait()

    # Restore through a template built EXACTLY as the CLI sites build it.
    tx2 = optimizer_from_config(cfg.train)
    template = TrainState.create(params, tx2, jax.random.key(0))
    restored = mgr.restore(abstract_like(template))
    mgr.close()
    assert (jax.tree_util.tree_structure(restored)
            == jax.tree_util.tree_structure(state))
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(state.params["w"]))
