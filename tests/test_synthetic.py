"""Synthetic-motion dataset tests — including the convention check that no
oracle-vs-oracle test can provide: the generated (im1, im2, flow) triple must
satisfy ``warp(im2, flow) ~= im1``, which pins the warp direction, u/v channel
order and the sign conventions end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pwcnet_tpu.data.base import get_dataset
from pwcnet_tpu.data.synthetic import (SyntheticFlow, device_sample,
                                       make_device_batcher)
from pwcnet_tpu.ops.warp import warp_bilinear


def test_registered_and_shapes():
    ds = get_dataset("synthetic", "-", split="train", hw=(64, 96), length=10)
    assert len(ds) == 10
    s = ds[3]
    assert s["im1"].shape == (64, 96, 3)
    assert s["im2"].shape == (64, 96, 3)
    assert s["flow"].shape == (64, 96, 2)
    assert s["valid"].shape == (64, 96)
    assert s["im1"].min() >= 0.0 and s["im1"].max() <= 1.0
    assert np.all(np.isfinite(s["flow"]))


def test_deterministic_and_split_disjoint():
    tr = SyntheticFlow(hw=(48, 64), split="train", length=8)
    tr2 = SyntheticFlow(hw=(48, 64), split="train", length=8)
    va = SyntheticFlow(hw=(48, 64), split="val", val_length=8)
    a, b = tr[2], tr2[2]
    for k in ("im1", "im2", "flow"):
        np.testing.assert_array_equal(a[k], b[k])
    # Val stream is disjoint from train (different key stream, not offset).
    assert not np.allclose(tr[0]["im1"], va[0]["im1"])


def test_flow_magnitude_sane():
    ds = SyntheticFlow(hw=(96, 128), length=4)
    mags = [np.sqrt((ds[i]["flow"] ** 2).sum(-1)).mean() for i in range(4)]
    # Affine shift alone is uniform(-8, 8) per axis; mean magnitude across
    # samples should be a few pixels, never degenerate-zero or huge.
    assert 0.5 < float(np.mean(mags)) < 20.0


@pytest.mark.parametrize("idx", [0, 1])
def test_warp_convention(idx):
    """warp_bilinear(im2, flow) must reconstruct im1 (interior pixels).

    The only error source is bilinear interpolation of the band-limited
    texture (wavelengths >= 8 px), so the tolerance can be tight. A flipped
    warp direction or swapped u/v channels fails catastrophically (the
    texture decorrelates in ~a wavelength)."""
    ds = SyntheticFlow(hw=(96, 128), length=4)
    s = ds[idx]
    warped = np.asarray(warp_bilinear(jnp.asarray(s["im2"][None]),
                                      jnp.asarray(s["flow"][None]))[0])
    # Ignore the OOB-zeroed border: mask where warp coverage exists.
    mask = (np.abs(warped).sum(-1) > 0)
    err = np.abs(warped - s["im1"])[mask]
    assert float(err.mean()) < 0.02, float(err.mean())
    # Control: the *wrong* direction (forward warp) must be much worse.
    wrong = np.asarray(warp_bilinear(jnp.asarray(s["im2"][None]),
                                     jnp.asarray(-s["flow"][None]))[0])
    err_wrong = np.abs(wrong - s["im1"])[(np.abs(wrong).sum(-1) > 0)]
    assert err_wrong.mean() > 5 * err.mean()


def test_device_sample_matches_family():
    s = jax.jit(lambda k: device_sample(k, (64, 96)))(jax.random.key(0))
    assert s["im1"].shape == (64, 96, 3)
    assert s["flow"].shape == (64, 96, 2)
    assert bool(jnp.all(jnp.isfinite(s["flow"])))
    # Same warp-convention property for the device path.
    warped = warp_bilinear(s["im2"][None], s["flow"][None])[0]
    mask = jnp.abs(warped).sum(-1) > 0
    err = jnp.abs(warped - s["im1"]).mean(-1)
    assert float(jnp.where(mask, err, 0).sum() / mask.sum()) < 0.02


def test_device_batcher_deterministic_and_sharded():
    from pwcnet_tpu.parallel import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data=8))
    gen = make_device_batcher(8, (32, 64), seed=3, mesh=mesh)
    b1 = gen(jnp.uint32(7))
    b2 = gen(jnp.uint32(7))
    b3 = gen(jnp.uint32(8))
    assert b1["im1"].shape == (8, 32, 64, 3)
    np.testing.assert_array_equal(np.asarray(b1["im1"]),
                                  np.asarray(b2["im1"]))
    assert not np.allclose(np.asarray(b1["im1"]), np.asarray(b3["im1"]))
    # Sharded over the data axis of the mesh.
    assert len(b1["im1"].sharding.device_set) == 8
