"""Fused pyramid-stem Pallas kernel vs the lax conv chain (SURVEY.md §4:
every Pallas kernel is paired with a lax oracle; kernels run with
interpret=True on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.ops.pallas.stem_kernel import stem_pallas, stem_ref


def _params(rng, c1=16, c2=32, dtype=jnp.float32):
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, dtype)
    return ((mk(3, 3, 3, c1), mk(c1)), (mk(3, 3, c1, c1), mk(c1)),
            (mk(3, 3, c1, c2), mk(c2)), (mk(3, 3, c2, c2), mk(c2)))


@pytest.mark.parametrize("hw", [(64, 96), (32, 128), (64, 256), (36, 96),
                                (40, 112)])  # 112 lane-fill-pads to 128/g=8
def test_stem_matches_lax(hw):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, *hw, 3)), jnp.float32)
    p = _params(rng)
    got = stem_pallas(x, p, interpret=True)
    want = stem_ref(x, p)
    assert got.shape == want.shape == (2, hw[0] // 4, hw[1] // 4, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_stem_bf16_close_to_f32_oracle():
    rng = np.random.default_rng(1)
    x32 = jnp.asarray(rng.random((1, 64, 128, 3)), jnp.float32)
    p32 = _params(rng)
    want = stem_ref(x32, p32)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), p32)
    got = stem_pallas(x32.astype(jnp.bfloat16), p16,
                      interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0.1, atol=0.1)


@pytest.mark.parametrize("w", [70, 72])
def test_stem_unfoldable_width_falls_back(w, monkeypatch):
    """Widths whose fold is invalid (W=70: W/2 odd; W=72: wg=18 not
    sublane-aligned) must take the stem_ref fallback — asserted by making
    the Pallas implementation explode if entered (ADVICE r1: the previous
    test passed even when the kernel WAS invoked)."""
    import pwcnet_tpu.ops.pallas.stem_kernel as sk

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("Pallas stem entered for unfoldable width")

    monkeypatch.setattr(sk, "_stem", boom)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 64, w, 3)), jnp.float32)
    p = _params(rng)
    got = sk.stem_pallas(x, p)
    want = stem_ref(x, p)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
    assert sk._pick_g1(w, 16) == 0


def test_stem_gradients_match_lax():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 32, 96, 3)), jnp.float32)
    p = _params(rng)

    def loss_p(pp):
        return jnp.sum(stem_pallas(x, pp, interpret=True) ** 2)

    def loss_r(pp):
        return jnp.sum(stem_ref(x, pp) ** 2)

    gp = jax.grad(loss_p)(p)
    gr = jax.grad(loss_r)(p)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("hw", [(40, 64), (36, 96), (96, 256),
                                (40, 112)])  # 112: padded-fold path (g=8)
def test_stem_backward_kernel_matches_lax_vjp(hw):
    """The hand-written flash-style backward kernel (recompute in VMEM,
    in-kernel transposed convs + dW transpose-matmuls) matches XLA
    autodiff of the chain for BOTH d_im and d_params, including ragged
    tile rows and the g1=8 full-lane fold (VERDICT r2 missing #4)."""
    from pwcnet_tpu.ops.pallas.stem_kernel import _stem_backward_pallas

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.random((2, *hw, 3)), jnp.float32)
    p = _params(rng)
    grad = jnp.asarray(
        rng.standard_normal((2, hw[0] // 4, hw[1] // 4, 32)), jnp.float32)
    out = _stem_backward_pallas(x, p, grad, interpret=True)
    assert out is not None, "expected the kernel path at this shape"
    d_im, d_params = out
    _, vjp = jax.vjp(stem_ref, x, p)
    r_im, r_params = vjp(grad)
    np.testing.assert_allclose(np.asarray(d_im), np.asarray(r_im),
                               rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree.leaves(d_params), jax.tree.leaves(r_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_stem_backward_bf16_comparable_to_xla_bf16():
    """bf16-grade check: the kernel's bf16 grads sit as close to the f32
    oracle as XLA's own bf16 backward does (same rounding regime)."""
    from pwcnet_tpu.ops.pallas.stem_kernel import _stem_backward_pallas

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.random((1, 40, 64, 3)), jnp.bfloat16)
    p = _params(rng, dtype=jnp.bfloat16)
    grad = jnp.asarray(rng.standard_normal((1, 10, 16, 32)), jnp.bfloat16)
    d_im, d_params = _stem_backward_pallas(x, p, grad, interpret=True)

    p32 = jax.tree.map(lambda t: t.astype(jnp.float32), p)
    _, vjp32 = jax.vjp(stem_ref, x.astype(jnp.float32), p32)
    ref32 = vjp32(grad.astype(jnp.float32))
    _, vjp16 = jax.vjp(stem_ref, x, p)
    ref16 = vjp16(grad)
    for a, b16, b32 in zip(jax.tree.leaves((d_im, d_params)),
                           jax.tree.leaves(ref16), jax.tree.leaves(ref32)):
        scale = np.abs(np.asarray(b32, np.float64)).max() + 1e-9
        err_k = np.abs(np.asarray(a, np.float64) - b32).max() / scale
        err_x = np.abs(np.asarray(b16, np.float64) - b32).max() / scale
        assert err_k < max(3 * err_x, 5e-3), (err_k, err_x)


def test_stem_vmem_fallback_after_lane_fill_pad_uses_unpadded_image():
    """A width that both lane-fill-pads (2496 -> 2560, g=8) AND overflows
    the f32 VMEM estimate must fall back to the XLA chain on the ORIGINAL
    image — the padded image would give the wrong output width and
    lrelu(bias) edge columns (code-review r3 finding #1)."""
    from pwcnet_tpu.ops.pallas import stem_kernel as sk

    rng = np.random.default_rng(11)
    w = 2496
    assert sk._pick_g1(w, 16) == 4 and sk._fold_pad(w, 16) == (2560, 8)
    x = jnp.asarray(rng.random((1, 32, w, 3)), jnp.float32)
    p = _params(rng)
    got = sk.stem_pallas(x, p, interpret=True)
    want = sk.stem_ref(x, p)
    assert got.shape == want.shape == (1, 8, w // 4, 32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_stem_grad_through_public_entry_uses_kernel_and_matches():
    """grad(stem_pallas) routes through the Pallas backward (foldable
    shape) and agrees with grad(stem_ref) for image AND params."""
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((1, 40, 64, 3)), jnp.float32)
    p = _params(rng)

    def loss(f):
        return lambda xx, pp: jnp.sum(jnp.sin(f(xx, pp)))

    gp = jax.grad(loss(lambda a, b: stem_pallas(a, b, interpret=True)),
                  argnums=(0, 1))(x, p)
    gr = jax.grad(loss(stem_ref), argnums=(0, 1))(x, p)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_extractor_fused_stem_matches_plain():
    from pwcnet_tpu.models.pwcnet import FeaturePyramidExtractor
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((1, 64, 128, 3)), jnp.float32)
    ext_p = FeaturePyramidExtractor(channels=(16, 32, 64), min_level=2,
                                    stem_backend="pallas")
    ext_l = FeaturePyramidExtractor(channels=(16, 32, 64), min_level=2,
                                    stem_backend="lax")
    params = ext_p.init(jax.random.key(0), x)
    fp = ext_p.apply(params, x)
    fl = ext_l.apply(params, x)  # same tree: backends share parameters
    assert [tuple(f.shape) for f in fp] == [(1, 8, 16, 64), (1, 16, 32, 32)]
    for a, b in zip(fp, fl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_remap_stem_params_roundtrip_and_equivalence():
    """Checkpoints written with the plain ConvBlock extractor layout load
    into the fused StemConvs layout (and back) via remap_stem_params."""
    from pwcnet_tpu.models.pwcnet import FeaturePyramidExtractor
    from pwcnet_tpu.train.checkpoint import remap_stem_params

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    ext_plain = FeaturePyramidExtractor(channels=(16, 32, 64), min_level=1)
    ext_fused = FeaturePyramidExtractor(channels=(16, 32, 64), min_level=2,
                                        stem_backend="lax")
    p_plain = ext_plain.init(jax.random.key(0), x)["params"]
    p_fused = remap_stem_params(p_plain, to_fused=True)
    feats_plain = ext_plain.apply({"params": p_plain}, x)
    feats_fused = ext_fused.apply({"params": p_fused}, x)
    for a, b in zip(feats_plain[:2], feats_fused):  # shared levels 3, 2
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    back = remap_stem_params(p_fused, to_fused=False)
    for pa, pb in zip(jax.tree.leaves(p_plain), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_extractor_min_level_one_keeps_full_pyramid():
    from pwcnet_tpu.models.pwcnet import FeaturePyramidExtractor
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    ext = FeaturePyramidExtractor(channels=(16, 32, 64))
    params = ext.init(jax.random.key(0), x)
    feats = ext.apply(params, x)
    assert [tuple(f.shape) for f in feats] == [
        (1, 8, 8, 64), (1, 16, 16, 32), (1, 32, 32, 16)]
