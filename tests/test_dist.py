"""Distributed tests on the fake 8-device CPU mesh (SURVEY.md §4):
DP-sharded train step equals the single-device step; mesh/sharding API.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.data.augment import AugmentConfig
from pwcnet_tpu.models import PWCNet
from pwcnet_tpu.parallel import (
    MeshConfig,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
)
from pwcnet_tpu.train.schedule import ScheduleConfig, make_optimizer
from pwcnet_tpu.train.state import TrainState
from pwcnet_tpu.train.step import make_train_step


def _tiny_model():
    # 3 levels / 16x16 inputs keep the CPU compile small.
    return PWCNet(num_levels=3, output_level=2, search_range=2,
                  corr_backend="lax")


def _batch(rng, n, h=32, w=32):
    return {
        "im1": jnp.asarray(rng.random((n, h, w, 3)), jnp.float32),
        "im2": jnp.asarray(rng.random((n, h, w, 3)), jnp.float32),
        "flow": jnp.asarray(rng.standard_normal((n, h, w, 2)), jnp.float32),
        "valid": jnp.ones((n, h, w), jnp.float32),
    }


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig())
    assert mesh.devices.shape == (8, 1, 1)
    mesh2 = make_mesh(MeshConfig(data=4, spatial=2))
    assert mesh2.devices.shape == (4, 2, 1)
    # Fully-specified sub-mesh uses a device subset.
    assert make_mesh(MeshConfig(data=3)).devices.shape == (3, 1, 1)
    with pytest.raises(ValueError, match="devices"):
        make_mesh(MeshConfig(data=16))
    with pytest.raises(ValueError, match="divisible"):
        make_mesh(MeshConfig(data=-1, spatial=3))


def test_dp_step_matches_single_device(rng):
    assert jax.device_count() == 8
    model = _tiny_model()
    tx = make_optimizer(ScheduleConfig(base_lr=1e-4), weight_decay=0.0)
    batch = _batch(rng, 8)

    params = jax.jit(model.init)(
        jax.random.key(0), batch["im1"][:1], batch["im2"][:1])
    key = jax.random.key(1)

    # Build both states up front: the steps donate their input state, so
    # params must be copied per state.
    mesh = make_mesh(MeshConfig())
    s1 = TrainState.create(jax.tree.map(jnp.copy, params), tx,
                           jax.random.key(1))
    s8 = jax.device_put(TrainState.create(params, tx, jax.random.key(1)),
                        replicated(mesh))
    del key

    # Single device (no mesh), no augmentation for exactness.
    step_1 = make_train_step(model, tx, aug=None)
    s1_new, m1 = step_1(s1, batch)

    # 8-way DP over the mesh.
    step_8 = make_train_step(model, tx, aug=None, mesh=mesh)
    s8_new, m8 = step_8(s8, shard_batch(mesh, batch))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1_new.params),
                    jax.tree.leaves(s8_new.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_dp_step_with_augmentation_runs_sharded(rng):
    model = _tiny_model()
    tx = make_optimizer(ScheduleConfig(base_lr=1e-4))
    mesh = make_mesh(MeshConfig())
    aug = AugmentConfig(crop_hw=(16, 16), photometric=True)
    step = make_train_step(model, tx, aug=aug, mesh=mesh)
    batch = _batch(rng, 8, 32, 32)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1, 16, 16, 3)))
    state = jax.device_put(
        TrainState.create(params, tx, jax.random.key(1)), replicated(mesh))
    state, metrics = step(state, shard_batch(mesh, batch))
    assert np.isfinite(float(metrics["loss"]))
    assert int(jax.device_get(state.step)) == 1
    # Output state stays replicated (usable for the next step directly).
    state, metrics = step(state, shard_batch(mesh, batch))
    assert int(jax.device_get(state.step)) == 2


def test_batch_sharding_layout(rng):
    mesh = make_mesh(MeshConfig())
    batch = _batch(rng, 8, 16, 16)
    g = shard_batch(mesh, batch)
    sh = g["im1"].sharding
    assert sh == batch_sharding(mesh)
    # Each device holds exactly one sample.
    assert g["im1"].addressable_shards[0].data.shape == (1, 16, 16, 3)
