"""Width-folded Pallas conv vs the lax oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.ops.pallas.conv_kernel import (conv2d_folded, conv_ref,
                                               pick_g, unfold_w)


def _w(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.float32)


@pytest.mark.parametrize("stride,ci,co,hw", [
    (2, 3, 16, (32, 64)),
    (1, 16, 16, (16, 64)),
    (2, 16, 32, (32, 128)),
    (1, 32, 32, (16, 64)),
])
def test_folded_conv_matches_lax(stride, ci, co, hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, *hw, ci)), jnp.float32)
    w, b = _w(rng, 3, 3, ci, co), _w(rng, co)
    got = conv2d_folded(x, w, b, stride=stride, slope=0.1, interpret=True)
    g = pick_g(hw[1] // stride, co)
    got = unfold_w(got, g)
    want = conv_ref(x, w, b, stride=stride, slope=0.1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_folded_conv_chains_and_grads():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 32, 64, 3)), jnp.float32)
    w1, b1 = _w(rng, 3, 3, 3, 16), _w(rng, 16)
    w2, b2 = _w(rng, 3, 3, 16, 16), _w(rng, 16)
    g1 = pick_g(32, 16)

    def loss_p(ws):
        y = conv2d_folded(x, ws[0], b1, stride=2, slope=0.1, interpret=True)
        y = conv2d_folded(y, ws[1], b2, slope=0.1, in_g=g1, interpret=True)
        return jnp.sum(y ** 2)

    def loss_r(ws):
        y = conv_ref(x, ws[0], b1, stride=2, slope=0.1)
        y = conv_ref(y, ws[1], b2, slope=0.1)
        return jnp.sum(y ** 2)

    gp = jax.grad(loss_p)((w1, w2))
    gr = jax.grad(loss_r)((w1, w2))
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
