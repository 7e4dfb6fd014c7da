"""torch->flax weight import: round-trip + forward parity vs the torch
mirror of the SURVEY §2 reference architecture (VERDICT r4 missing #5)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pwcnet_tpu.compat import (import_torch_checkpoint,  # noqa: E402
                               import_torch_state_dict)
from pwcnet_tpu.compat.torch_ref import Net  # noqa: E402
from pwcnet_tpu.models import PWCNet  # noqa: E402


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(0)
    return Net().eval()


@pytest.fixture(scope="module")
def flax_model():
    return PWCNet(corr_backend="lax", stem_backend="lax")


def test_round_trip_values(torch_net, flax_model):
    variables = import_torch_state_dict(torch_net.state_dict(), flax_model)
    p = variables["params"]
    sd = torch_net.state_dict()
    # First pyramid conv -> stem conv1 (torch OIHW -> flax HWIO).
    w0 = sd["feature_pyramid_extractor.convs.0.0.0.weight"].numpy()
    np.testing.assert_array_equal(
        p["FeaturePyramidExtractor_0"]["StemConvs_0"]["conv1_kernel"],
        w0.transpose(2, 3, 1, 0))
    # Coarsest estimator (index 0) lands on estimator_l6.
    we = sd["flow_estimators.0.convs.0.0.weight"].numpy()
    np.testing.assert_array_equal(
        p["estimator_l6"]["ConvStack_0"]["ConvBlock_0"]["Conv_0"]["kernel"],
        we.transpose(2, 3, 1, 0))
    # Context final conv.
    wc = sd["context_networks.flow_conv.weight"].numpy()
    np.testing.assert_array_equal(p["context"]["Conv_0"]["kernel"],
                                  wc.transpose(2, 3, 1, 0))


def test_forward_parity(torch_net, flax_model):
    """Identical weights + input -> per-level flows agree to f32 tolerance."""
    variables = import_torch_state_dict(torch_net.state_dict(), flax_model)
    rng = np.random.default_rng(7)
    im1 = rng.random((1, 64, 64, 3), np.float32)
    im2 = rng.random((1, 64, 64, 3), np.float32)
    with torch.no_grad():
        t_flows = torch_net(
            torch.from_numpy(im1.transpose(0, 3, 1, 2)),
            torch.from_numpy(im2.transpose(0, 3, 1, 2)))
    j_flows = flax_model.apply(variables, jnp.asarray(im1), jnp.asarray(im2),
                               train=False)
    assert len(t_flows) == len(j_flows)
    for t, j in zip(t_flows, j_flows):
        t = t.numpy().transpose(0, 2, 3, 1)
        j = np.asarray(j)
        assert t.shape == j.shape
        np.testing.assert_allclose(j, t, atol=2e-4, rtol=0)


def test_checkpoint_file_and_wrappers(tmp_path, torch_net, flax_model):
    ref = import_torch_state_dict(torch_net.state_dict(), flax_model)
    leaf = ref["params"]["context"]["Conv_0"]["kernel"]

    p1 = tmp_path / "plain.pth"
    torch.save(torch_net.state_dict(), p1)
    v1 = import_torch_checkpoint(str(p1), flax_model)
    np.testing.assert_array_equal(v1["params"]["context"]["Conv_0"]["kernel"],
                                  leaf)

    # DataParallel 'module.' prefix + {'state_dict': ...} wrapper.
    wrapped = {"state_dict": {f"module.{k}": v for k, v in
                              torch_net.state_dict().items()}}
    p2 = tmp_path / "wrapped.pth"
    torch.save(wrapped, p2)
    v2 = import_torch_checkpoint(str(p2), flax_model)
    np.testing.assert_array_equal(v2["params"]["context"]["Conv_0"]["kernel"],
                                  leaf)


def test_wrong_estimator_order_is_caught(torch_net, flax_model):
    """fine_first on a coarse-first checkpoint must fail shape checks (the
    per-level estimator input widths 115..279 are all distinct)."""
    with pytest.raises(ValueError, match="expects"):
        import_torch_state_dict(torch_net.state_dict(), flax_model,
                                estimator_order="fine_first")


def test_unmatched_keys_reported(torch_net, flax_model):
    sd = dict(torch_net.state_dict())
    sd["totally_unknown.weight"] = torch.zeros(3)
    with pytest.raises(ValueError, match="unmatched source key"):
        import_torch_state_dict(sd, flax_model)
