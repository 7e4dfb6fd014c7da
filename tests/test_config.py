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
