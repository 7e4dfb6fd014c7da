"""Two-view matching front-end tests (BASELINE north star: SLAM-style
two-view matching on top of the flow engine)."""

import numpy as np
import pytest

from pwcnet_tpu.frontend import fb_consistency, match_two_view


class _StubModel:
    """Flow 'model' producing a fixed field per batch element: element 0
    gets ``fw``, element 1 gets ``bw`` — isolates the matcher logic from
    training quality."""

    def __init__(self, fw, bw):
        self._fw, self._bw = fw, bw

    def apply(self, params, a, b, train=False):
        import jax.numpy as jnp
        h, w = a.shape[1:3]
        fw = jnp.asarray(self._fw)[None, :h, :w]
        bw = jnp.asarray(self._bw)[None, :h, :w]
        return [jnp.concatenate([fw, bw], axis=0)]

    def full_res_flow(self, flows, hw):
        return flows[-1]


def test_consistent_translation_matches_everywhere():
    h, w = 32, 48
    fw = np.zeros((h, w, 2), np.float32)
    fw[..., 0] = 3.0  # +3 px in x
    bw = -fw          # perfectly consistent
    model = _StubModel(fw, bw)
    im = np.zeros((h, w, 3), np.float32)
    out = match_two_view(model, None, im, im, grid_step=8, fb_threshold=1.0)
    assert len(out["pts1"]) > 0
    # pts2 = pts1 + flow, confidence ~1, in-bounds targets only.
    np.testing.assert_allclose(out["pts2"][:, 0], out["pts1"][:, 0] + 3.0)
    np.testing.assert_allclose(out["pts2"][:, 1], out["pts1"][:, 1])
    assert np.all(out["confidence"] > 0.9)
    assert np.all(out["pts2"][:, 0] <= w - 1)
    # Grid points whose +3px target leaves the image were dropped.
    assert np.all(out["pts1"][:, 0] + 3.0 <= w - 1)


def test_inconsistent_flow_is_rejected():
    h, w = 32, 48
    fw = np.zeros((h, w, 2), np.float32)
    fw[..., 0] = 3.0
    bw = np.zeros_like(fw)  # backward says "no motion": fb error = 3 px
    model = _StubModel(fw, bw)
    im = np.zeros((h, w, 3), np.float32)
    out = match_two_view(model, None, im, im, grid_step=8, fb_threshold=1.0)
    assert len(out["pts1"]) == 0
    assert float(np.median(out["fb_error"])) == pytest.approx(3.0, abs=1e-4)


def test_occlusion_localizes_in_fb_error():
    """A region with contradictory motion shows high fb error there and
    low elsewhere (the occlusion-detection mechanism)."""
    h, w = 40, 40
    fw = np.zeros((h, w, 2), np.float32)
    bw = np.zeros((h, w, 2), np.float32)
    fw[10:20, 10:20, 0] = 4.0  # block moves; backward field disagrees
    err = fb_consistency(fw, bw)
    assert err[15, 15] == pytest.approx(4.0, abs=1e-3)
    assert err[30, 30] == pytest.approx(0.0, abs=1e-5)


def test_end_to_end_with_real_model_api():
    """API smoke with an actual PWCNet (untrained — only shapes/dtypes
    and the padding path are under test)."""
    import jax

    from pwcnet_tpu.models import PWCNet

    rng = np.random.default_rng(0)
    im1 = rng.random((40, 56, 3)).astype(np.float32)  # pad path: not /8
    im2 = np.roll(im1, 2, axis=1)
    model = PWCNet(num_levels=3, output_level=2, search_range=2,
                   corr_backend="lax", dtype=np.float32)
    import jax.numpy as jnp
    p1, = [jax.jit(model.init)(jax.random.key(0),
                               jnp.zeros((1, 64, 64, 3)),
                               jnp.zeros((1, 64, 64, 3)))]
    out = match_two_view(model, p1, im1, im2, grid_step=8,
                         fb_threshold=1e9)  # keep all: untrained flow
    assert out["flow"].shape == (40, 56, 2)
    assert out["fb_error"].shape == (40, 56)
    assert out["pts1"].shape == out["pts2"].shape
    assert out["confidence"].ndim == 1


def test_match_cli(tmp_path, capsys):
    import imageio.v2 as imageio
    import json as _json

    from pwcnet_tpu.cli import main

    rng = np.random.default_rng(0)
    im1 = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
    im2 = np.roll(im1, 2, axis=1)
    p1, p2 = str(tmp_path / "a.png"), str(tmp_path / "b.png")
    imageio.imwrite(p1, im1)
    imageio.imwrite(p2, im2)
    out = str(tmp_path / "m.txt")
    rc = main(["match", "--im1", p1, "--im2", p2, "--out", out,
               "--fb-threshold", "1e9",
               "model.num_levels=3", "model.output_level=2",
               "model.search_range=2", "model.corr_backend=lax",
               "model.dtype=float32"])
    assert rc == 0
    rep = _json.loads(capsys.readouterr().out)
    assert rep["num_matches"] > 0
    rows = np.loadtxt(out)
    assert rows.shape[1] == 5
