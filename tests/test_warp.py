"""Unit tests for bilinear backward warping (zero-OOB grid_sample semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.ops import warp_bilinear


def _np_warp(feat, flow):
    """Slow per-pixel oracle with zero padding + reference ones-mask."""
    n, h, w, c = feat.shape
    out = np.zeros_like(feat, dtype=np.float32)
    for b in range(n):
        for y in range(h):
            for x in range(w):
                xs = x + flow[b, y, x, 0]
                ys = y + flow[b, y, x, 1]
                x0, y0 = int(np.floor(xs)), int(np.floor(ys))
                wx, wy = xs - x0, ys - y0
                acc = np.zeros(c, np.float32)
                cov = 0.0
                for (yy, xx, wgt) in [
                    (y0, x0, (1 - wy) * (1 - wx)),
                    (y0, x0 + 1, (1 - wy) * wx),
                    (y0 + 1, x0, wy * (1 - wx)),
                    (y0 + 1, x0 + 1, wy * wx),
                ]:
                    if 0 <= yy < h and 0 <= xx < w:
                        acc += wgt * feat[b, yy, xx]
                        cov += wgt
                out[b, y, x] = acc if cov >= 0.9999 else 0.0
    return out


def test_zero_flow_identity(rng):
    feat = rng.standard_normal((2, 8, 9, 3)).astype(np.float32)
    out = warp_bilinear(jnp.asarray(feat), jnp.zeros((2, 8, 9, 2)))
    np.testing.assert_allclose(np.asarray(out), feat, atol=1e-6)


def test_integer_shift(rng):
    feat = rng.standard_normal((1, 6, 7, 2)).astype(np.float32)
    # flow (u=2, v=1): out[y, x] = feat[y+1, x+2]
    flow = np.zeros((1, 6, 7, 2), np.float32)
    flow[..., 0] = 2.0
    flow[..., 1] = 1.0
    out = np.asarray(warp_bilinear(jnp.asarray(feat), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, :5, :5], feat[0, 1:6, 2:7], atol=1e-6)
    # OOB rows/cols are zero.
    assert np.abs(out[0, 5:]).max() == 0.0
    assert np.abs(out[0, :, 5:]).max() == 0.0


@pytest.mark.parametrize("scale", [0.5, 3.0, 20.0])
def test_matches_pixel_oracle(rng, scale):
    feat = rng.standard_normal((2, 7, 9, 4)).astype(np.float32)
    flow = (rng.standard_normal((2, 7, 9, 2)) * scale).astype(np.float32)
    got = np.asarray(warp_bilinear(jnp.asarray(feat), jnp.asarray(flow)))
    want = _np_warp(feat, flow)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grad_flows(rng):
    feat = jnp.asarray(rng.standard_normal((1, 6, 6, 3)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((1, 6, 6, 2)) * 0.3, jnp.float32)

    def loss(feat, flow):
        return jnp.sum(warp_bilinear(feat, flow) ** 2)

    gf, gl = jax.grad(loss, argnums=(0, 1))(feat, flow)
    assert np.isfinite(np.asarray(gf)).all()
    assert np.isfinite(np.asarray(gl)).all()
    assert float(jnp.abs(gl).max()) > 0.0  # flow gradient is non-trivial


def test_bf16_path(rng):
    feat = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.bfloat16)
    flow = jnp.asarray(rng.standard_normal((1, 8, 8, 2)), jnp.float32)
    out = warp_bilinear(feat, flow)
    assert out.dtype == jnp.bfloat16


def test_fast_path_matches_ref_gather(rng):
    from pwcnet_tpu.ops.warp import warp_bilinear_ref
    feat = jnp.asarray(rng.standard_normal((2, 9, 13, 5)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((2, 9, 13, 2)) * 6, jnp.float32)
    a = warp_bilinear(feat, flow)
    b = warp_bilinear_ref(feat, flow)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("impl", ["scatter", "sorted"])
def test_backward_impls_match_autodiff(rng, impl):
    """The selectable d_feat backends (ops/warp.py WARP_BWD) are exact
    vs XLA's autodiff scatter — values and BOTH grads."""
    from pwcnet_tpu.ops import warp as warp_mod

    feat = jnp.asarray(rng.standard_normal((2, 9, 13, 5)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((2, 9, 13, 2)) * 6, jnp.float32)
    ct = jnp.asarray(rng.standard_normal((2, 9, 13, 5)), jnp.float32)

    def run(impl):
        old = warp_mod.WARP_BWD
        warp_mod.WARP_BWD = impl
        try:
            out, vjp = jax.vjp(warp_bilinear, feat, flow)
            gf, gl = vjp(ct)
        finally:
            warp_mod.WARP_BWD = old
        return np.asarray(out), np.asarray(gf), np.asarray(gl)

    out0, gf0, gl0 = run("autodiff")
    out1, gf1, gl1 = run(impl)
    np.testing.assert_allclose(out1, out0, atol=1e-6)
    np.testing.assert_allclose(gf1, gf0, atol=1e-5)
    np.testing.assert_allclose(gl1, gl0, atol=1e-5)


@pytest.mark.parametrize("impl", ["scatter", "sorted"])
def test_backward_impls_bf16(rng, impl):
    from pwcnet_tpu.ops import warp as warp_mod

    feat = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.bfloat16)
    flow = jnp.asarray(rng.standard_normal((1, 8, 8, 2)) * 3, jnp.float32)

    def gsum(impl):
        old = warp_mod.WARP_BWD
        warp_mod.WARP_BWD = impl
        try:
            g = jax.grad(lambda f: jnp.sum(
                warp_bilinear(f, flow).astype(jnp.float32) ** 2))(feat)
        finally:
            warp_mod.WARP_BWD = old
        return np.asarray(g.astype(jnp.float32))

    np.testing.assert_allclose(gsum(impl), gsum("autodiff"),
                               atol=1e-2, rtol=1e-2)


def test_split_formulations_identical(rng):
    """WARP_SPLIT='slice' is a bitcast/slice reassociation of the 5-D
    reshape formulation — values and grads must be bit-identical."""
    from pwcnet_tpu.ops import warp as warp_mod

    feat = jnp.asarray(rng.standard_normal((2, 9, 13, 5)), jnp.float32)
    flow = jnp.asarray(rng.standard_normal((2, 9, 13, 2)) * 6, jnp.float32)
    ct = jnp.asarray(rng.standard_normal((2, 9, 13, 5)), jnp.float32)

    def run(split):
        old = warp_mod.WARP_SPLIT
        warp_mod.WARP_SPLIT = split
        try:
            out, vjp = jax.vjp(warp_bilinear, feat, flow)
            gf, gl = vjp(ct)
        finally:
            warp_mod.WARP_SPLIT = old
        return np.asarray(out), np.asarray(gf), np.asarray(gl)

    out0, gf0, gl0 = run("reshape5d")
    out1, gf1, gl1 = run("slice")
    np.testing.assert_array_equal(out1, out0)
    np.testing.assert_array_equal(gf1, gf0)
    np.testing.assert_array_equal(gl1, gl0)
