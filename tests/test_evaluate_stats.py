"""evaluate_dataset sample-level statistics (VERDICT r4 weak #6)."""

import jax.numpy as jnp
import numpy as np

from pwcnet_tpu.data.base import FlowDataset
from pwcnet_tpu.train.evaluate import evaluate_dataset


class _ZeroModel:
    """Predicts zero flow -> per-sample EPE == mean |gt| magnitude."""

    flow_scale = 1.0
    pad_divisor = 1

    def apply(self, params, im1, im2, train=False):
        return [jnp.zeros(im1.shape[:3] + (2,), jnp.float32)]

    def full_res_flow(self, flows, hw):
        return flows[-1]


class _ConstFlow(FlowDataset):
    """Sample i has constant GT magnitude i+1 px."""

    def __init__(self, n=6, hw=(8, 12)):
        self.n, self.hw = n, hw

    def __len__(self):
        return self.n

    def _load(self, rec):
        raise NotImplementedError

    def __getitem__(self, i):
        h, w = self.hw
        flow = np.zeros((h, w, 2), np.float32)
        flow[..., 0] = i + 1.0
        return {"im1": np.zeros((h, w, 3), np.float32),
                "im2": np.zeros((h, w, 3), np.float32),
                "flow": flow, "valid": np.ones((h, w), np.float32)}


def test_sample_mean_and_stderr():
    res = evaluate_dataset(_ZeroModel(), None, _ConstFlow(n=6), batch=4)
    # Per-sample EPEs are exactly 1..6.
    assert res["num_samples"] == 6
    vals = np.arange(1.0, 7.0)
    np.testing.assert_allclose(res["epe_sample_mean"], vals.mean(),
                               rtol=1e-5)
    np.testing.assert_allclose(
        res["epe_sample_stderr"], vals.std(ddof=1) / np.sqrt(6), rtol=1e-5)
    # Pixel-weighted headline agrees here (equal pixel counts).
    np.testing.assert_allclose(res["epe"], vals.mean(), rtol=1e-5)
    # Final-batch all-invalid padding dups were dropped (6 % 4 != 0).
    assert res["num_valid_px"] == 6 * 8 * 12
    # Magnitude-binned stderr present for the populated bin (<10 px).
    assert "epe_s0_10_sample_stderr" in res
    assert "epe_s40plus_sample_mean" not in res  # empty bin -> absent
