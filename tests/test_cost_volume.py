"""Unit tests for the local cost volume (correlation) op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.ops import cost_volume, cost_volume_lax


def _np_cost_volume(f1, f2, d=4):
    """Per-pixel oracle: out[..., (dy+d)*(2d+1)+(dx+d)] = mean_c f1*shift(f2)."""
    n, h, w, c = f1.shape
    side = 2 * d + 1
    out = np.zeros((n, h, w, side * side), np.float32)
    f2p = np.pad(f2, ((0, 0), (d, d), (d, d), (0, 0)))
    for dy in range(-d, d + 1):
        for dx in range(-d, d + 1):
            k = (dy + d) * side + (dx + d)
            shifted = f2p[:, d + dy:d + dy + h, d + dx:d + dx + w]
            out[..., k] = (f1 * shifted).mean(-1)
    return out


def test_matches_oracle(rng):
    f1 = rng.standard_normal((2, 10, 12, 8)).astype(np.float32)
    f2 = rng.standard_normal((2, 10, 12, 8)).astype(np.float32)
    got = np.asarray(cost_volume_lax(jnp.asarray(f1), jnp.asarray(f2)))
    np.testing.assert_allclose(got, _np_cost_volume(f1, f2), rtol=1e-5,
                               atol=1e-6)


def test_output_shape_and_channel_order(rng):
    f1 = rng.standard_normal((1, 9, 9, 4)).astype(np.float32)
    out = np.asarray(cost_volume_lax(jnp.asarray(f1), jnp.asarray(f1)))
    assert out.shape == (1, 9, 9, 81)
    # Center channel (dy=dx=0) of self-correlation is mean(f1^2) >= all others
    # in aggregate.
    center = out[..., 40]
    np.testing.assert_allclose(center, (f1 ** 2).mean(-1), rtol=1e-5)


@pytest.mark.parametrize("d", [1, 2])
def test_other_displacements(rng, d):
    f1 = rng.standard_normal((1, 6, 7, 3)).astype(np.float32)
    f2 = rng.standard_normal((1, 6, 7, 3)).astype(np.float32)
    got = np.asarray(cost_volume_lax(jnp.asarray(f1), jnp.asarray(f2), d))
    np.testing.assert_allclose(got, _np_cost_volume(f1, f2, d), rtol=1e-5,
                               atol=1e-6)


def test_zero_padding_at_borders(rng):
    f1 = np.ones((1, 5, 5, 2), np.float32)
    f2 = np.ones((1, 5, 5, 2), np.float32)
    out = np.asarray(cost_volume_lax(jnp.asarray(f1), jnp.asarray(f2), 2))
    # Displacement (dy=-2, dx=-2) at pixel (0, 0) samples entirely OOB -> 0.
    assert out[0, 0, 0, 0] == 0.0
    # Center displacement is 1 everywhere.
    np.testing.assert_allclose(out[..., 12], 1.0)


def test_grads_finite(rng):
    f1 = jnp.asarray(rng.standard_normal((1, 6, 6, 4)), jnp.float32)
    f2 = jnp.asarray(rng.standard_normal((1, 6, 6, 4)), jnp.float32)

    def loss(a, b):
        return jnp.sum(cost_volume_lax(a, b) ** 2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(f1, f2)
    assert np.isfinite(np.asarray(g1)).all()
    assert np.isfinite(np.asarray(g2)).all()


def test_dispatch_lax(rng):
    f1 = jnp.asarray(rng.standard_normal((1, 6, 6, 4)), jnp.float32)
    out = cost_volume(f1, f1, backend="lax")
    assert out.shape == (1, 6, 6, 81)
