"""Model shape/dtype contracts and a small overfit test (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pwcnet_tpu.losses import multiscale_loss
from pwcnet_tpu.models import PWCNet


def _make_inputs(rng, n=1, h=64, w=64):
    im1 = jnp.asarray(rng.random((n, h, w, 3)), jnp.float32)
    im2 = jnp.asarray(rng.random((n, h, w, 3)), jnp.float32)
    return im1, im2


def test_forward_shapes(rng):
    model = PWCNet()
    im1, im2 = _make_inputs(rng, n=2, h=64, w=128)
    params = jax.jit(model.init)(jax.random.key(0), im1, im2)
    flows = jax.jit(model.apply)(params, im1, im2)
    # output_level=4 -> 5 levels of flow, coarsest (1/64) first.
    assert len(flows) == 5
    expected = [(2, 1, 2, 2), (2, 2, 4, 2), (2, 4, 8, 2),
                (2, 8, 16, 2), (2, 16, 32, 2)]
    assert [f.shape for f in flows] == expected
    for f in flows:
        assert f.dtype == jnp.float32
        assert np.isfinite(np.asarray(f)).all()


def test_param_count_close_to_paper(rng):
    """Plain (non-DenseNet-estimator) PWC-Net is ~5M params; the paper's
    8.75M includes dense estimator connections the reference also lacks."""
    model = PWCNet()
    im1, im2 = _make_inputs(rng)
    params = jax.jit(model.init)(jax.random.key(0), im1, im2)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    assert 3e6 < n_params < 11e6, n_params


def test_full_res_flow(rng):
    model = PWCNet()
    im1, im2 = _make_inputs(rng, h=64, w=64)
    params = jax.jit(model.init)(jax.random.key(0), im1, im2)
    flows = jax.jit(model.apply)(params, im1, im2)
    full = model.full_res_flow(flows, (64, 64))
    assert full.shape == (1, 64, 64, 2)


def test_bf16_forward(rng):
    model = PWCNet(dtype=jnp.bfloat16)
    im1, im2 = _make_inputs(rng)
    params = jax.jit(model.init)(jax.random.key(0), im1, im2)
    flows = jax.jit(model.apply)(params, im1, im2)
    # Flow outputs stay f32 even with bf16 compute.
    assert all(f.dtype == jnp.float32 for f in flows)
    assert np.isfinite(np.asarray(flows[-1])).all()


def test_non_residual_and_levels(rng):
    model = PWCNet(residual=False, output_level=3)
    im1, im2 = _make_inputs(rng)
    params = jax.jit(model.init)(jax.random.key(0), im1, im2)
    flows = jax.jit(model.apply)(params, im1, im2)
    assert len(flows) == 4  # output at level 3 (1/8 res)
    assert flows[-1].shape == (1, 8, 8, 2)


@pytest.mark.slow
def test_overfit_two_samples(rng):
    """Loss decreases markedly over a few dozen steps on a tiny batch."""
    model = PWCNet()
    im1, im2 = _make_inputs(rng, n=2, h=64, w=64)
    gt = jnp.asarray(rng.standard_normal((2, 64, 64, 2)) * 2.0, jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), im1, im2)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            flows = model.apply(p, im1, im2)
            return multiscale_loss(flows, gt)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], losses[::8]


def test_use_norm_and_seven_levels(rng):
    model = PWCNet(num_levels=7, output_level=4, use_norm=True,
                   input_norm=True)
    im1, im2 = _make_inputs(rng, h=128, w=128)
    params = jax.jit(model.init)(jax.random.key(0), im1, im2)
    flows = jax.jit(model.apply)(params, im1, im2)
    assert len(flows) == 5
    # finest at level 7-4=3 -> 1/8 resolution
    assert flows[-1].shape == (1, 16, 16, 2)
    assert np.isfinite(np.asarray(flows[-1])).all()


def test_loss_with_extra_levels(rng):
    """output_level=5 yields 6 flows; the loss must weight all of them."""
    from pwcnet_tpu.losses import multiscale_loss
    gt = jnp.zeros((1, 64, 64, 2), jnp.float32)
    flows = [jnp.ones((1, 2 ** i, 2 ** i, 2), jnp.float32)
             for i in range(6)]
    loss6 = float(multiscale_loss(flows, gt))
    loss5 = float(multiscale_loss(flows[:5], gt))
    assert loss6 > loss5  # the 6th level contributes


def test_context_s2b_exact(rng):
    """Space-to-batch lowering of the context net's dilated convs is
    exact: same params (identical tree by construction), same output to
    fp tolerance, including at dil=8/16 with zero-padded borders."""
    from pwcnet_tpu.models.layers import ConvBlock
    from pwcnet_tpu.models.pwcnet import ContextNetwork

    # Single dilated block, both phases of the claim: divisible shapes.
    x = jnp.asarray(rng.normal(size=(2, 32, 48, 24)), jnp.float32)
    for dil in (2, 8, 16):
        native = ConvBlock(16, dilation=dil, s2b=False)
        s2b = ConvBlock(16, dilation=dil, s2b=True)
        p = native.init(jax.random.key(dil), x)
        np.testing.assert_allclose(
            np.asarray(s2b.apply(p, x)), np.asarray(native.apply(p, x)),
            rtol=1e-5, atol=1e-5, err_msg=f"dil={dil}")

    # Full context head (concat + 6 blocks + flow conv), f32.
    feat = jnp.asarray(rng.normal(size=(1, 32, 64, 32)), jnp.float32)
    flow = jnp.asarray(rng.normal(size=(1, 32, 64, 2)), jnp.float32)
    pn = ContextNetwork(s2b=False).init(jax.random.key(0), feat, flow)
    out_n = ContextNetwork(s2b=False).apply(pn, feat, flow)
    out_s = ContextNetwork(s2b=True).apply(pn, feat, flow)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_n),
                               rtol=1e-5, atol=1e-5)

    # Non-divisible shapes fall back to the native dilated conv.
    xo = jnp.asarray(rng.normal(size=(1, 30, 46, 8)), jnp.float32)
    blk = ConvBlock(8, dilation=8, s2b=True)
    pb = blk.init(jax.random.key(1), xo)
    ref = ConvBlock(8, dilation=8, s2b=False).apply(pb, xo)
    np.testing.assert_allclose(np.asarray(blk.apply(pb, xo)),
                               np.asarray(ref), rtol=1e-6)
