"""Fused warp+correlation kernel vs the composed oracle.

Oracle: ``cost_volume_lax(f1, warp_bilinear(f2, flow))`` — the lax
composition whose pieces are themselves oracle-tested against numpy
pixel math (test_warp.py) and the CUDA channel ordering
(test_cost_volume.py). Covers forward (f32 exact, bf16 to rounding),
gradients through the custom VJP including d_flow, the VMEM-overflow
fallback, and the model-level 'fused' backend dispatch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.ops.cost_volume import cost_volume_lax
from pwcnet_tpu.ops.pallas.warp_corr_kernel import (
    _gather_corners,
    _blend,
    warp_corr_fused,
)
from pwcnet_tpu.ops.warp import warp_bilinear


def composed(f1, f2, flow, d=4):
    return cost_volume_lax(f1, warp_bilinear(f2, flow), d)


@pytest.mark.parametrize("shape,dtype,tol", [
    ((2, 24, 40, 16), jnp.float32, 1e-5),
    ((1, 17, 33, 24), jnp.float32, 1e-5),   # ragged tiles
    ((1, 32, 48, 32), jnp.bfloat16, 2e-2),
])
def test_fused_matches_composed(shape, dtype, tol):
    n, h, w, c = shape
    k = jax.random.split(jax.random.key(0), 3)
    f1 = jax.random.normal(k[0], shape, dtype)
    f2 = jax.random.normal(k[1], shape, dtype)
    flow = 5.0 * jax.random.normal(k[2], (n, h, w, 2), jnp.float32)
    ref = composed(f1, f2, flow)
    out = warp_corr_fused(f1, f2, flow)
    assert out.dtype == f1.dtype
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


def test_blend_of_gather_is_warp():
    """blend(gather_corners(f2, flow)) must equal warp_bilinear exactly —
    the invariant the fused kernel's in-VMEM blend relies on."""
    k = jax.random.split(jax.random.key(1), 2)
    f2 = jax.random.normal(k[0], (2, 20, 28, 8), jnp.float32)
    flow = 7.0 * jax.random.normal(k[1], (2, 20, 28, 2), jnp.float32)
    g, wm = _gather_corners(f2, flow)
    warped = _blend(g, wm, 8)
    np.testing.assert_allclose(np.asarray(warped),
                               np.asarray(warp_bilinear(f2, flow)),
                               atol=1e-6)


def test_fused_gradients_match_composed():
    n, h, w, c = 1, 16, 24, 8
    k = jax.random.split(jax.random.key(2), 3)
    f1 = jax.random.normal(k[0], (n, h, w, c), jnp.float32)
    f2 = jax.random.normal(k[1], (n, h, w, c), jnp.float32)
    flow = 3.0 * jax.random.normal(k[2], (n, h, w, 2), jnp.float32)

    def loss(fn):
        def L(a, b, fl):
            o = fn(a, b, fl).astype(jnp.float32)
            cos = jnp.cos(jnp.arange(o.size, dtype=jnp.float32)
                          ).reshape(o.shape)
            return jnp.sum(o * cos)
        return L

    g_ref = jax.grad(loss(composed), argnums=(0, 1, 2))(f1, f2, flow)
    g_out = jax.grad(loss(warp_corr_fused), argnums=(0, 1, 2))(f1, f2, flow)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_fused_fallback_on_oversized_width():
    """A width whose fused tile cannot fit VMEM must route to the
    composed path and still match the oracle."""
    from pwcnet_tpu.ops.pallas import warp_corr_kernel as wck
    n, h, w, c = 1, 16, 8192, 8   # absurd W: _pick_tile_fused -> None
    assert wck._pick_tile_fused(w, c, 4, 2) is None
    k = jax.random.split(jax.random.key(3), 3)
    f1 = jax.random.normal(k[0], (n, h, w, c), jnp.bfloat16)
    f2 = jax.random.normal(k[1], (n, h, w, c), jnp.bfloat16)
    flow = 2.0 * jax.random.normal(k[2], (n, h, w, 2), jnp.float32)
    out = warp_corr_fused(f1, f2, flow)
    ref = composed(f1, f2, flow)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)


def test_fused_prepadded_matches_composed_prepadded():
    """warp_corr_fused_prepadded(f1, g, wm) == prepadded lax correlation of
    blend(g, wm) — real halo rows consumed, plus gradients (lax-composed
    backward)."""
    from pwcnet_tpu.ops.cost_volume import cost_volume_prepadded_lax
    from pwcnet_tpu.ops.pallas.warp_corr_kernel import (
        warp_corr_fused_prepadded)

    n, h, w, c, d = 1, 16, 24, 8, 2
    k = jax.random.split(jax.random.key(6), 3)
    f1 = jax.random.normal(k[0], (n, h, w, c), jnp.float32)
    # Fabricate corner/weight tensors with d real halo rows each side.
    g = jax.random.normal(k[1], (n, h + 2 * d, w, 4 * c), jnp.float32)
    wm = jax.nn.softmax(
        jax.random.normal(k[2], (n, 4, h + 2 * d, w), jnp.float32), axis=1)

    ref_fn = lambda a, gg, ww: cost_volume_prepadded_lax(
        a, _blend(gg, ww, c).astype(a.dtype), d)
    ref = ref_fn(f1, g, wm)
    out = warp_corr_fused_prepadded(f1, g, wm, max_displacement=d)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss(fn):
        return lambda *a: jnp.sum(jnp.sin(fn(*a).astype(jnp.float32)))

    g_ref = jax.grad(loss(ref_fn), argnums=(0, 1, 2))(f1, g, wm)
    g_out = jax.grad(
        loss(lambda a, gg, ww: warp_corr_fused_prepadded(
            a, gg, ww, max_displacement=d)), argnums=(0, 1, 2))(f1, g, wm)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_fused_is_profitable_threshold():
    """Measured dispatch heuristic: fuse only at/above the level-2-sized
    crossover (roofline_v5e_448x1024_r3.json)."""
    from pwcnet_tpu.ops.pallas.warp_corr_kernel import fused_is_profitable
    assert fused_is_profitable(112, 256)       # Sintel level 2
    assert not fused_is_profitable(56, 128)    # level 3: composed wins/ties


def test_model_fused_backend_matches_lax(monkeypatch):
    """PWCNet(corr_backend='fused') forward == corr_backend='lax' with the
    same params (dispatch-only difference). The profitability threshold is
    lowered so the test shapes actually exercise the fused kernel."""
    from pwcnet_tpu.models import PWCNet
    from pwcnet_tpu.ops.pallas import warp_corr_kernel as wck
    monkeypatch.setattr(wck, "FUSED_MIN_PIXELS", 0)
    im = jax.random.uniform(jax.random.key(4), (1, 64, 64, 3), jnp.float32)
    im2 = jax.random.uniform(jax.random.key(5), (1, 64, 64, 3), jnp.float32)
    m_lax = PWCNet(corr_backend="lax", dtype=jnp.float32)
    m_fused = PWCNet(corr_backend="fused", dtype=jnp.float32)
    params = jax.jit(m_lax.init)(jax.random.key(0), im, im2)
    f_lax = m_lax.apply(params, im, im2, train=False)
    f_fused = m_fused.apply(params, im, im2, train=False)
    for a, b in zip(f_fused, f_lax):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4)
