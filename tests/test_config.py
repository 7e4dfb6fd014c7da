"""Config tree + override parsing tests."""

import pytest

from pwcnet_tpu.config import PRESETS, Config, apply_overrides


def test_defaults():
    cfg = Config()
    assert cfg.model.num_levels == 6
    assert cfg.model.corr_backend == "pallas"
    assert cfg.train.schedule.total_steps == 1_200_000


def test_presets_exist():
    for name in ("chairs-1chip", "chairs-quick", "things-ft",
                 "sintel-eval", "kitti-multihost"):
        assert name in PRESETS


def test_overrides():
    cfg = apply_overrides(Config(), [
        "model.num_levels=7",
        "model.corr_backend=lax",
        "train.global_batch=32",
        "train.schedule.base_lr=0.001",
        "train.schedule.milestones=(10,20)",
        "data.crop_hw=(256,256)",
        "data.augment.photometric=false",
        "train.init_from=none",
    ])
    assert cfg.model.num_levels == 7
    assert cfg.model.corr_backend == "lax"
    assert cfg.train.global_batch == 32
    assert cfg.train.schedule.base_lr == 0.001
    assert cfg.train.schedule.milestones == (10, 20)
    assert cfg.data.crop_hw == (256, 256)
    assert cfg.data.augment.photometric is False
    assert cfg.train.init_from is None


def test_bad_override_rejected():
    with pytest.raises(AttributeError, match="no field"):
        apply_overrides(Config(), ["model.nope=1"])
    with pytest.raises(ValueError, match="key=value"):
        apply_overrides(Config(), ["model.num_levels"])


def test_coupled_l2_matches_torch_adam_exactly():
    """PARITY.md row 16: train.coupled_l2=true reproduces torch
    Adam(weight_decay=...) — the optimizer the reference actually ran —
    to float tolerance over several steps; the default (AdamW) diverges
    from it (sanity that the flag changes semantics)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from pwcnet_tpu.train.schedule import ScheduleConfig, make_optimizer

    lr, wd, steps = 1e-2, 4e-2, 5
    w0 = np.asarray([[0.5, -1.2], [2.0, 0.3]], np.float32)
    grads = [np.asarray([[0.1 * (i + 1), -0.2], [0.05, 0.4 - 0.1 * i]],
                        np.float32) for i in range(steps)]

    # torch reference: coupled-L2 Adam.
    tw = torch.nn.Parameter(torch.tensor(w0))
    opt = torch.optim.Adam([tw], lr=lr, weight_decay=wd)
    for g in grads:
        tw.grad = torch.tensor(g)
        opt.step()
    want = tw.detach().numpy()

    def run(coupled):
        sched = ScheduleConfig(base_lr=lr, milestones=(10**6,),
                               total_steps=10**6)
        tx = make_optimizer(sched, weight_decay=wd, coupled_l2=coupled)
        params = {"w": jnp.asarray(w0)}
        state = tx.init(params)
        for g in grads:
            upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
            params = jax.tree.map(lambda p, u: p + u, params, upd)
        return np.asarray(params["w"])

    got = run(coupled=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert not np.allclose(run(coupled=False), want, atol=1e-5)


def test_override_none_typed_bool_coercion():
    """Tri-state (None-default) fields parse CLI true/false as real bools —
    a surviving "false" STRING is truthy and would silently invert the
    flag downstream."""
    from pwcnet_tpu.config import PRESETS, apply_overrides
    from pwcnet_tpu.train.loop import build_model

    base = PRESETS["chairs-1chip"]
    on = apply_overrides(base, ["model.context_s2b=true"])
    off = apply_overrides(base, ["model.context_s2b=false"])
    assert on.model.context_s2b is True
    assert off.model.context_s2b is False
    assert build_model(on).context_s2b is True
    assert build_model(off).context_s2b is False
    assert build_model(base).context_s2b is False  # module default

    raft = apply_overrides(PRESETS["raft-chairs"],
                           ["model.raft_gru_fuse=false"])
    assert raft.model.raft_gru_fuse is False
    assert build_model(raft).gru_fuse_zr is False
