"""Resize-convention tests (PARITY.md row 9).

Both alignment conventions are pinned against the actual torch semantics
(``torch.nn.functional.interpolate``, CPU) so that whichever convention
the reference fork used, `model.resize_mode` reproduces it exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.ops.resize import resize_bilinear


def _torch_resize(x: np.ndarray, hw, align_corners: bool) -> np.ndarray:
    import torch
    import torch.nn.functional as F

    t = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    out = F.interpolate(t, size=hw, mode="bilinear",
                        align_corners=align_corners)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("in_hw,out_hw", [
    ((7, 9), (14, 18)),    # exact 2x
    ((8, 8), (32, 32)),    # 4x (full_res_flow path)
    ((5, 11), (13, 7)),    # ragged up/down mix
])
def test_align_corners_matches_torch(in_hw, out_hw, rng):
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw,
                                     "align_corners"))
    want = _torch_resize(x, out_hw, align_corners=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((7, 9), (14, 18)),
    ((8, 8), (32, 32)),
])
def test_half_pixel_matches_torch(in_hw, out_hw, rng):
    """Upsampling only: torch align_corners=False == jax.image.resize
    half-pixel (downsampling differs — jax antialiases)."""
    x = rng.standard_normal((2, *in_hw, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, "half_pixel"))
    want = _torch_resize(x, out_hw, align_corners=False)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_identity_and_bad_mode(rng):
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    assert resize_bilinear(x, (4, 4), "align_corners") is x
    with pytest.raises(ValueError, match="resize mode"):
        resize_bilinear(x, (8, 8), "nearest")


def test_model_resize_mode_flag(rng):
    """The flag reaches the model: align_corners changes the output, and
    both modes run through the full forward."""
    import jax

    from pwcnet_tpu.models import PWCNet

    im1 = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    im2 = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    m_hp = PWCNet(num_levels=3, output_level=2, search_range=2,
                  corr_backend="lax")
    m_ac = PWCNet(num_levels=3, output_level=2, search_range=2,
                  corr_backend="lax", resize_mode="align_corners")
    params = jax.jit(m_hp.init)(jax.random.key(0), im1, im2)
    f_hp = m_hp.apply(params, im1, im2, train=False)
    f_ac = m_ac.apply(params, im1, im2, train=False)
    assert f_hp[-1].shape == f_ac[-1].shape
    assert not np.allclose(np.asarray(f_hp[-1]), np.asarray(f_ac[-1]))
    # Coarsest level has no upsample yet -> identical.
    np.testing.assert_allclose(np.asarray(f_hp[0]), np.asarray(f_ac[0]))


def test_model_input_center_flag(rng):
    """PARITY row 18: input_center feeds [-1,1]; changes outputs, runs."""
    import jax

    from pwcnet_tpu.models import PWCNet

    im1 = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    im2 = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    m0 = PWCNet(num_levels=3, output_level=2, search_range=2,
                corr_backend="lax")
    m1 = PWCNet(num_levels=3, output_level=2, search_range=2,
                corr_backend="lax", input_center=True)
    params = jax.jit(m0.init)(jax.random.key(0), im1, im2)
    f0 = m0.apply(params, im1, im2, train=False)
    f1 = m1.apply(params, im1, im2, train=False)
    assert not np.allclose(np.asarray(f0[-1]), np.asarray(f1[-1]))
    # centered(x) == standard forward on pre-centered images.
    f2 = m0.apply(params, im1 * 2.0 - 1.0, im2 * 2.0 - 1.0, train=False)
    np.testing.assert_allclose(np.asarray(f1[-1]), np.asarray(f2[-1]),
                               atol=1e-6)
