"""Pallas cost-volume kernel vs the lax oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.ops.cost_volume import cost_volume_lax
from pwcnet_tpu.ops.pallas.cost_volume_kernel import cost_volume_pallas


@pytest.mark.parametrize("shape", [
    (1, 8, 8, 4),
    (2, 10, 12, 8),
    (1, 7, 9, 3),    # ragged H/W, odd channel count
    (1, 16, 24, 16),
])
def test_forward_matches_lax(rng, shape):
    f1 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    got = cost_volume_pallas(f1, f2, interpret=True)
    want = cost_volume_lax(f1, f2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("d", [1, 2])
def test_other_displacements(rng, d):
    f1 = jnp.asarray(rng.standard_normal((1, 6, 7, 5)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 6, 7, 5)), jnp.float32)
    got = cost_volume_pallas(f1, f2, max_displacement=d, interpret=True)
    want = cost_volume_lax(f1, f2, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_grads_match_lax(rng):
    f1 = jnp.asarray(rng.standard_normal((1, 8, 10, 4)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 8, 10, 4)), jnp.float32)
    co = jnp.asarray(rng.standard_normal((1, 8, 10, 81)), jnp.float32)

    def loss_pallas(a, b):
        return jnp.sum(cost_volume_pallas(a, b, interpret=True) * co)

    def loss_lax(a, b):
        return jnp.sum(cost_volume_lax(a, b) * co)

    gp1, gp2 = jax.grad(loss_pallas, argnums=(0, 1))(f1, f2)
    gl1, gl2 = jax.grad(loss_lax, argnums=(0, 1))(f1, f2)
    np.testing.assert_allclose(np.asarray(gp1), np.asarray(gl1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp2), np.asarray(gl2),
                               rtol=1e-4, atol=1e-5)


def test_bf16_forward_close_to_f32(rng):
    f1 = rng.standard_normal((1, 8, 8, 8)).astype(np.float32)
    f2 = rng.standard_normal((1, 8, 8, 8)).astype(np.float32)
    got = cost_volume_pallas(jnp.asarray(f1, jnp.bfloat16),
                             jnp.asarray(f2, jnp.bfloat16), interpret=True)
    assert got.dtype == jnp.bfloat16
    want = cost_volume_lax(jnp.asarray(f1), jnp.asarray(f2))
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.05, atol=0.05)


def test_oversize_falls_back_to_lax(rng, monkeypatch):
    import pwcnet_tpu.ops.pallas.cost_volume_kernel as m
    monkeypatch.setattr(m, "_VMEM_BUDGET_BYTES", 1024)
    f1 = jnp.asarray(rng.standard_normal((1, 16, 16, 8)), jnp.float32)
    out = cost_volume_pallas(f1, f1, interpret=True)
    want = cost_volume_lax(f1, f1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-5)


def test_batch_width_packing_matches_lax_forward_and_grads():
    """r4 lane-fill packing (cost_volume_kernel.PACK_MIN_LANES): narrow-W
    multi-sample batches are packed along width with 2d-zero separators;
    outputs and BOTH input grads must match the lax oracle exactly as in
    the unpacked case."""
    from pwcnet_tpu.ops.cost_volume import cost_volume_lax
    from pwcnet_tpu.ops.pallas.cost_volume_kernel import (
        PACK_MIN_LANES, cost_volume_pallas)

    rng = np.random.default_rng(5)
    n, h, w, c, d = 3, 24, 40, 16, 4
    assert w < PACK_MIN_LANES  # the packed route must trigger
    f1 = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)

    out = cost_volume_pallas(f1, f2, max_displacement=d)
    ref = cost_volume_lax(f1, f2, d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_pallas(a, b):
        return jnp.sum(jnp.sin(
            cost_volume_pallas(a, b, max_displacement=d)))

    def loss_lax(a, b):
        return jnp.sum(jnp.sin(cost_volume_lax(a, b, d)))

    g1 = jax.grad(loss_pallas, argnums=(0, 1))(f1, f2)
    g2 = jax.grad(loss_lax, argnums=(0, 1))(f1, f2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-5, rtol=3e-5)


def test_small_shape_backward_lax_route_matches(monkeypatch):
    """The BWD_LAX_MAX_PIXELS env knob (default OFF since r5: the r4
    routing measured +2.2 ms/step in the full graph, profile_r5) still
    routes tiny-shape backwards to lax when enabled; grads must be
    identical to the pallas backward path, bf16 included."""
    from pwcnet_tpu.ops.cost_volume import cost_volume_lax
    from pwcnet_tpu.ops.pallas import cost_volume_kernel as cvk

    monkeypatch.setattr(cvk, "BWD_LAX_MAX_PIXELS", 1024)
    rng = np.random.default_rng(11)
    n, h, w, c, d = 1, 8, 16, 196, 4  # level-6-like; h*w=128 <= threshold
    assert h * w <= cvk.BWD_LAX_MAX_PIXELS
    for dt in (jnp.float32, jnp.bfloat16):
        f1 = jnp.asarray(rng.standard_normal((n, h, w, c)), dt)
        f2 = jnp.asarray(rng.standard_normal((n, h, w, c)), dt)

        def loss_p(a, b):
            return jnp.sum(jnp.sin(cvk.cost_volume_pallas(
                a, b, max_displacement=d).astype(jnp.float32)))

        def loss_l(a, b):
            return jnp.sum(jnp.sin(cost_volume_lax(
                a, b, d).astype(jnp.float32)))

        gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(f1, f2)
        gl = jax.jit(jax.grad(loss_l, argnums=(0, 1)))(f1, f2)
        tol = 1e-5 if dt == jnp.float32 else 2e-2
        for a, b in zip(gp, gl):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=tol, rtol=tol)


def test_big_channel_forward_pallas_bwd_fallback():
    """Shapes whose BACKWARD tile overflows VMEM (RAFT's C=128 fine
    scale at W>=128 with f32 streams) still run the Pallas FORWARD, and
    the lax-autodiff backward fallback produces oracle-exact grads."""
    from pwcnet_tpu.ops.cost_volume import cost_volume_lax
    from pwcnet_tpu.ops.pallas import cost_volume_kernel as cvk

    n, h, w, c, d = 1, 16, 128, 128, 4
    assert not cvk._bwd_tile_fits(w, c, d, 2)
    rng = np.random.default_rng(3)
    f1 = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)
    f2 = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)

    out_p = cvk.cost_volume_pallas(f1, f2, max_displacement=d)
    out_l = cost_volume_lax(f1, f2, d)
    np.testing.assert_allclose(np.asarray(out_p, np.float32),
                               np.asarray(out_l, np.float32),
                               atol=2e-2, rtol=2e-2)

    def loss_p(a, b):
        return jnp.sum(jnp.sin(cvk.cost_volume_pallas(
            a, b, max_displacement=d).astype(jnp.float32)))

    def loss_l(a, b):
        return jnp.sum(jnp.sin(cost_volume_lax(
            a, b, d).astype(jnp.float32)))

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(f1, f2)
    gl = jax.jit(jax.grad(loss_l, argnums=(0, 1)))(f1, f2)
    for a, b in zip(gp, gl):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=2e-2, rtol=2e-2)
