"""Parity-harness tests (BASELINE config 1; VERDICT r2 missing #5)."""

import dataclasses
import json

import numpy as np
import pytest

from pwcnet_tpu.config import Config, ModelConfig


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    """A tiny image pair + GT .flo + fake 'reference prediction' .flo."""
    import imageio.v2 as imageio

    from pwcnet_tpu.io import write_flo

    d = tmp_path_factory.mktemp("parity")
    rng = np.random.default_rng(0)
    h, w = 40, 56  # deliberately not /2**L-divisible: pad path exercised
    im1 = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    im2 = np.roll(im1, 2, axis=1)
    gt = np.zeros((h, w, 2), np.float32)
    gt[..., 0] = 2.0
    imageio.imwrite(str(d / "im1.png"), im1)
    imageio.imwrite(str(d / "im2.png"), im2)
    write_flo(str(d / "gt.flo"), gt)
    ref = gt + rng.standard_normal(gt.shape).astype(np.float32) * 0.1
    write_flo(str(d / "ref.flo"), ref)
    return d


def _cfg():
    return Config(model=ModelConfig(
        num_levels=3, output_level=2, search_range=2,
        corr_backend="lax", dtype="float32"))


def test_parity_report_vs_gt_and_reference(pair):
    from pwcnet_tpu.train.parity import parity_report

    out = parity_report(_cfg(), str(pair / "im1.png"),
                        str(pair / "im2.png"), gt_path=str(pair / "gt.flo"),
                        ref_flow_path=str(pair / "ref.flo"))
    assert np.isfinite(out["epe_vs_gt"])
    assert np.isfinite(out["epe_vs_reference"])
    assert len(out["per_level"]) == 3
    for lv in out["per_level"]:
        assert np.isfinite(lv["epe_vs_gt"])
    json.dumps(out)  # must be JSON-serializable (CLI prints it)


def test_parity_sweep_covers_uncertain_conventions(pair):
    """The sweep reports all 4 resize_mode x input_center combinations and
    picks a best by epe (the one-line flip for PARITY rows 9/18)."""
    from pwcnet_tpu.train.parity import parity_report

    out = parity_report(_cfg(), str(pair / "im1.png"),
                        str(pair / "im2.png"), gt_path=str(pair / "gt.flo"),
                        sweep=True)
    combos = {(r["resize_mode"], r["input_center"]) for r in out["sweep"]}
    assert combos == {("half_pixel", False), ("half_pixel", True),
                      ("align_corners", False), ("align_corners", True)}
    assert out["best"] is not None
    assert "epe_vs_gt" in out["best"]
    json.dumps(out)


def test_parity_cli(pair, capsys):
    from pwcnet_tpu.cli import main

    rc = main(["parity", "--im1", str(pair / "im1.png"),
               "--im2", str(pair / "im2.png"),
               "--gt", str(pair / "gt.flo"),
               "model.num_levels=3", "model.output_level=2",
               "model.search_range=2", "model.corr_backend=lax",
               "model.dtype=float32"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert "epe_vs_gt" in out
