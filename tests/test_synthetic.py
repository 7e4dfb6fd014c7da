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


def test_hard_regime_large_displacement_and_occlusion():
    """The 'hard' regime (VERDICT r2 next #10) must actually produce
    large displacements (>40 px somewhere) and a genuine occluding second
    layer: a nonempty foreground region whose motion differs from the
    background, and an invalid band at the motion boundary."""
    ds = SyntheticFlow(hw=(128, 160), length=8, regime="hard")
    saw_large = saw_band = saw_two_motions = False
    for i in range(8):
        s = ds[i]
        mag = np.sqrt((s["flow"] ** 2).sum(-1))
        saw_large |= bool((mag > 40.0).any())
        saw_band |= bool((s["valid"] < 1.0).any())
        v = s["valid"] > 0
        if v.any():
            # Two motion modes: the flow field has a large spread
            # somewhere (fg vs bg differ by tens of px) in some scene.
            spread = mag[v].max() - mag[v].min()
            saw_two_motions |= bool(spread > 20.0)
    assert saw_large and saw_band and saw_two_motions


def test_hard_regime_warp_convention_on_valid_background():
    """Exact-GT property must still hold where nothing occludes: on valid
    pixels that are background in BOTH frames and whose target is not
    covered by the foreground, warp(im2, flow) == im1 to interpolation
    error. (Occluded pixels are supervised through occlusion, like
    Sintel GT — they intentionally do NOT match.)"""
    ds = SyntheticFlow(hw=(96, 128), length=4, regime="hard")
    ok_any = False
    for i in range(4):
        s = ds[i]
        warped = np.asarray(warp_bilinear(jnp.asarray(s["im2"][None]),
                                          jnp.asarray(s["flow"][None]))[0])
        err = np.abs(warped - s["im1"]).mean(-1)
        cov = np.abs(warped).sum(-1) > 0
        # Median over valid covered pixels: occluded pixels are a minority,
        # so a correct convention gives a small median while a flipped
        # convention decorrelates everywhere.
        m = (s["valid"] > 0) & cov
        if m.sum() > 1000:
            # 25th percentile: occluded pixels can be a large fraction
            # (seed 0 has a 49x82-px ellipse moving opposite to the
            # background — >50% of valid pixels occluded, by design), but
            # the never-occluded portion must match to interpolation
            # error; a flipped convention decorrelates even the q25.
            assert float(np.percentile(err[m], 25)) < 0.02
            ok_any = True
    assert ok_any


def test_hard_regime_device_host_same_family():
    s = jax.jit(lambda k: device_sample(k, (96, 128), "hard"))(
        jax.random.key(1))
    assert s["flow"].shape == (96, 128, 2)
    assert bool(jnp.all(jnp.isfinite(s["flow"])))
    assert s["valid"].shape == (96, 128)


def test_eval_epe_magnitude_bins():
    """make_eval_step's magnitude-bin sums: a constant-error prediction
    lands its EPE in the right GT-magnitude bins."""
    from pwcnet_tpu.train.step import make_eval_step

    class Dummy:
        flow_scale = 1.0

        def apply(self, params, im1, im2, train=False):
            return [jnp.zeros(im1.shape[:3] + (2,), jnp.float32)]

        def full_res_flow(self, flows, hw):
            return flows[-1]

    gt = np.zeros((1, 8, 12, 2), np.float32)
    gt[0, :, :4, 0] = 5.0    # bin 0: |gt| < 10
    gt[0, :, 4:8, 0] = 20.0  # bin 1: 10 <= |gt| < 40
    gt[0, :, 8:, 0] = 50.0   # bin 2: |gt| >= 40
    batch = {"im1": jnp.zeros((1, 8, 12, 3)), "im2": jnp.zeros((1, 8, 12, 3)),
             "flow": jnp.asarray(gt), "valid": jnp.ones((1, 8, 12))}
    s, o, c, bins, per_sample = make_eval_step(Dummy())(None, batch)
    assert per_sample.shape == (1, 8)
    bins = np.asarray(bins)
    np.testing.assert_allclose(bins[1], [32.0, 32.0, 32.0])  # counts
    np.testing.assert_allclose(bins[0] / bins[1], [5.0, 20.0, 50.0],
                               rtol=1e-5)
    assert float(s) == pytest.approx(32 * (5 + 20 + 50), rel=1e-5)


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


def test_hard_regime_natural_statistics():
    """r4: hard textures must be broadband (energy below the smooth
    regime's 8 px wavelength cutoff) and carry a ~1/f^2 spectrum with
    sharp luminance boundaries — the natural-image statistics the r3
    verdict found missing (synthetic.py HARD_WAVELEN_RANGE/BND_EDGE)."""
    from pwcnet_tpu.data.synthetic import SyntheticFlow

    ds = SyntheticFlow(hw=(192, 256), length=8, regime="hard")
    slopes, fine_fracs = [], []
    for i in range(4):
        im = ds[i]["im1"].mean(-1)
        F = np.abs(np.fft.rfft2(im)) ** 2
        fy = np.fft.fftfreq(192)[:, None]
        fx = np.fft.rfftfreq(256)[None, :]
        r = np.sqrt(fy ** 2 + fx ** 2).ravel()
        P = F.ravel()
        m = (r > 0.01) & (r < 0.4)
        slopes.append(np.polyfit(np.log(r[m]), np.log(P[m] + 1e-20), 1)[0])
        # fraction of non-DC energy at wavelengths < 8 px (f > 0.125):
        # identically ~0 for the old band-limited sinusoids.
        nz = r > 1e-6
        fine_fracs.append(P[nz & (r > 0.125)].sum() / P[nz].sum())
    assert -4.5 < np.mean(slopes) < -1.5, slopes
    assert np.mean(fine_fracs) > 0.005, fine_fracs

    # Smooth regime remains band-limited (its committed learning proofs
    # depend on an unchanged stream).
    ds_s = SyntheticFlow(hw=(192, 256), length=8, regime="smooth")
    im = ds_s[0]["im1"].mean(-1)
    F = np.abs(np.fft.rfft2(im)) ** 2
    r2 = np.sqrt(np.fft.fftfreq(192)[:, None] ** 2
                 + np.fft.rfftfreq(256)[None, :] ** 2)
    nz = r2 > 1e-6
    frac = F[nz & (r2 > 0.2)].sum() / F[nz].sum()
    assert frac < 0.01, frac


def test_val_cache_byte_cap_and_immutability():
    """ADVICE r4: the val-split sample cache is byte-capped, and cached
    arrays are frozen so an in-place consumer mutation raises instead of
    silently corrupting later evals."""
    from pwcnet_tpu.data.synthetic import SyntheticFlow

    ds = SyntheticFlow(split="val", hw=(32, 40), val_length=8, seed=5)
    one = ds[0]
    nbytes = sum(v.nbytes for v in one.values())
    # Cap to exactly two samples' bytes: only two entries may be cached.
    ds2 = SyntheticFlow(split="val", hw=(32, 40), val_length=8, seed=5,
                        cache_bytes=2 * nbytes)
    got = [ds2[i] for i in range(8)]
    assert len(ds2._cache) == 2
    # Every sample (cached or not) is still correct and deterministic.
    again = [ds2[i] for i in range(8)]
    for a, b in zip(got, again):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    # Cached returns share frozen arrays: in-place writes must raise.
    with pytest.raises(ValueError):
        ds2[0]["im1"][0, 0, 0] = 7.0
    # Non-cached returns (over the cap) are fresh and writable.
    ds2[7]["im1"][0, 0, 0] = 7.0
