"""Golden-file / round-trip tests for the L0 flow I/O layer."""

import numpy as np
import pytest

from pwcnet_tpu.io import (
    flow_to_rgb,
    load_flow,
    make_color_wheel,
    read_flo,
    read_kitti_png,
    read_pfm,
    save_flow,
    write_flo,
    write_kitti_png,
    write_pfm,
)


def _rand_flow(rng, h=17, w=23, scale=10.0):
    return (rng.standard_normal((h, w, 2)) * scale).astype(np.float32)


def test_flo_roundtrip(tmp_path, rng):
    flow = _rand_flow(rng)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    out = read_flo(p)
    np.testing.assert_array_equal(out, flow)


def test_flo_magic_rejected(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"\x00" * 32)
    with pytest.raises(ValueError, match="magic"):
        read_flo(str(p))


def test_pfm_roundtrip_color(tmp_path, rng):
    img = rng.standard_normal((11, 7, 3)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img)
    np.testing.assert_array_equal(read_pfm(p), img)


def test_pfm_roundtrip_gray(tmp_path, rng):
    img = rng.standard_normal((5, 9)).astype(np.float32)
    p = str(tmp_path / "g.pfm")
    write_pfm(p, img)
    np.testing.assert_array_equal(read_pfm(p), img)


def test_kitti_png_roundtrip(tmp_path, rng):
    flow = _rand_flow(rng, scale=30.0)
    valid = (rng.random(flow.shape[:2]) > 0.3).astype(np.float32)
    p = str(tmp_path / "k.png")
    write_kitti_png(p, flow, valid)
    out_flow, out_valid = read_kitti_png(p)
    np.testing.assert_array_equal(out_valid, valid)
    # Quantized to 1/64 px; invalid pixels are zeroed on read.
    np.testing.assert_allclose(
        out_flow, flow * valid[..., None], atol=1.0 / 64
    )


def test_load_save_dispatch(tmp_path, rng):
    flow = _rand_flow(rng)
    for name in ["a.flo", "a.pfm", "a.png"]:
        p = str(tmp_path / name)
        save_flow(p, flow)
        out = load_flow(p)
        assert out.shape == flow.shape
        np.testing.assert_allclose(out, flow, atol=1.0 / 64)
    with pytest.raises(ValueError, match="unknown flow format"):
        load_flow(str(tmp_path / "a.xyz"))


def test_color_wheel_shape():
    wheel = make_color_wheel()
    assert wheel.shape == (55, 3)
    assert wheel.dtype == np.uint8
    # First entry is pure red, segment boundaries hit the primaries.
    np.testing.assert_array_equal(wheel[0], [255, 0, 0])


def test_flow_to_rgb_basic(rng):
    flow = _rand_flow(rng)
    img = flow_to_rgb(flow)
    assert img.shape == flow.shape[:2] + (3,)
    assert img.dtype == np.uint8
    # Zero flow renders (near-)white.
    white = flow_to_rgb(np.zeros((4, 4, 2), np.float32))
    assert (white > 240).all()
    # NaNs render black.
    f = np.full((2, 2, 2), np.nan, np.float32)
    assert (flow_to_rgb(f) == 0).all()
