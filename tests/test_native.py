"""Native C++ decoder vs the pure-Python io layer."""

import numpy as np
import pytest

from pwcnet_tpu import native
from pwcnet_tpu.io import read_flo as py_read_flo
from pwcnet_tpu.io import read_pfm as py_read_pfm
from pwcnet_tpu.io import write_flo, write_pfm

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def test_flo_matches_python(tmp_path, rng):
    flow = rng.standard_normal((13, 17, 2)).astype(np.float32)
    p = str(tmp_path / "x.flo")
    write_flo(p, flow)
    out = native.read_flo(p)
    np.testing.assert_array_equal(out, py_read_flo(p))
    np.testing.assert_array_equal(out, flow)


def test_ppm_matches_imageio(tmp_path, rng):
    import imageio.v2 as imageio

    img = (rng.random((11, 7, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "x.ppm")
    imageio.imwrite(p, img)
    out = native.read_ppm(p)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0,
                               atol=1e-6)


def test_ppm_comment_header(tmp_path):
    p = tmp_path / "c.ppm"
    p.write_bytes(b"P6\n# a comment\n2 2\n255\n" + bytes(range(12)))
    out = native.read_ppm(str(p))
    assert out.shape == (2, 2, 3)
    np.testing.assert_allclose(out.ravel() * 255.0, np.arange(12), atol=1e-4)


def test_pfm_matches_python(tmp_path, rng):
    img = rng.standard_normal((9, 5, 3)).astype(np.float32)
    p = str(tmp_path / "x.pfm")
    write_pfm(p, img)
    np.testing.assert_array_equal(native.read_pfm(p), py_read_pfm(p))
    gray = rng.standard_normal((4, 6)).astype(np.float32)
    p2 = str(tmp_path / "g.pfm")
    write_pfm(p2, gray)
    np.testing.assert_array_equal(native.read_pfm(p2), gray)


def test_batch_decode_matches_pipeline(chairs_dir):
    from pwcnet_tpu.data import get_dataset
    from pwcnet_tpu.data.pipeline import _fit_to_shape

    ds = get_dataset("flyingchairs", chairs_dir, split="all")
    recs = ds.records[:4]
    hw = (72, 80)  # pad both dims
    out = native.decode_batch([r.im1 for r in recs], [r.im2 for r in recs],
                              [r.flow for r in recs], hw)
    assert out["im1"].shape == (4, 72, 80, 3)
    for i, r in enumerate(recs):
        want = _fit_to_shape(ds[i], hw)
        for k in ("im1", "im2", "flow", "valid"):
            np.testing.assert_allclose(out[k][i], want[k], atol=1e-6,
                                       err_msg=f"sample {i} key {k}")


def test_batch_decode_crop(chairs_dir):
    from pwcnet_tpu.data import get_dataset
    from pwcnet_tpu.data.pipeline import _fit_to_shape

    ds = get_dataset("flyingchairs", chairs_dir, split="all")
    recs = ds.records[:2]
    hw = (32, 40)  # center crop
    out = native.decode_batch([r.im1 for r in recs], [r.im2 for r in recs],
                              [r.flow for r in recs], hw)
    for i in range(2):
        want = _fit_to_shape(ds[i], hw)
        np.testing.assert_allclose(out["im1"][i], want["im1"], atol=1e-6)
        assert out["valid"][i].all()


def test_missing_file_errors(tmp_path):
    with pytest.raises(IOError):
        native.decode_batch([str(tmp_path / "no1.ppm")],
                            [str(tmp_path / "no2.ppm")],
                            [str(tmp_path / "no.flo")], (8, 8))
