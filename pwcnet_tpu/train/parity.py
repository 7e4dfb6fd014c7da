"""Reference-parity harness (BASELINE.json config 1; VERDICT r2 missing #5).

Takes one image pair plus ground-truth (or reference-predicted) ``.flo``
[+ optionally a checkpoint] and reports:

- full-resolution EPE of this framework's prediction vs the GT flow;
- EPE vs a *reference prediction* ``.flo`` when one is supplied (the
  direct implementation-vs-implementation number once the reference
  mount / a reference checkpoint exists);
- per-level diffs: each predicted level, upsampled to full res and
  rescaled to pixels, vs the GT;
- with ``sweep=True``, the same report for all four combinations of the
  two conventions PARITY.md still marks ``[uncertain vs fork]`` —
  row 9 (``resize_mode`` half_pixel/align_corners) and row 18
  (``input_center``) — so whichever convention the reference actually
  uses is a one-line config flip away (``model.resize_mode=...``,
  ``model.input_center=...``).

CLI: ``pwcnet parity --im1 a.png --im2 b.png --gt gt.flo [--ref-flow
ref.flo] [--ckpt DIR] [--sweep] [overrides ...]``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np


def _epe(pred: np.ndarray, ref: np.ndarray) -> float:
    return float(np.sqrt(((pred - ref) ** 2).sum(-1)).mean())


def parity_report(cfg, im1_path: str, im2_path: str,
                  gt_path: Optional[str] = None,
                  ref_flow_path: Optional[str] = None,
                  ckpt: Optional[str] = None,
                  sweep: bool = False) -> Dict:
    """Run the parity harness; returns a JSON-serializable report dict."""
    import jax
    import jax.numpy as jnp

    from pwcnet_tpu.data.base import read_image
    from pwcnet_tpu.io import load_flow
    from pwcnet_tpu.train.evaluate import pad_to_divisible
    from pwcnet_tpu.train.loop import build_model

    im1, im2 = read_image(im1_path), read_image(im2_path)
    gt = load_flow(gt_path) if gt_path else None
    ref = load_flow(ref_flow_path) if ref_flow_path else None

    def run(model_cfg) -> Dict:
        model = build_model(dataclasses.replace(cfg, model=model_cfg))
        div = 2 ** model_cfg.num_levels
        p1, (h, w) = pad_to_divisible(im1[None], div)
        p2, _ = pad_to_divisible(im2[None], div)
        a, b = jnp.asarray(p1), jnp.asarray(p2)
        params = jax.jit(model.init)(jax.random.key(0), a, b)
        if ckpt and ckpt.endswith((".pth", ".pt")):
            # A reference torch checkpoint: import directly (compat/
            # torch_import.py; SURVEY §6 operational parity).
            from pwcnet_tpu.compat import import_torch_checkpoint
            params = import_torch_checkpoint(ckpt, model)
        elif ckpt:
            from pwcnet_tpu.train.checkpoint import (CheckpointManager,
                                              abstract_like)
            from pwcnet_tpu.train.schedule import optimizer_from_config
            from pwcnet_tpu.train.state import TrainState
            tx = optimizer_from_config(cfg.train)
            template = TrainState.create(params, tx, jax.random.key(0))
            mgr = CheckpointManager(ckpt)
            params = mgr.restore(abstract_like(template)).params
            mgr.close()
        flows = jax.jit(lambda p, x, y: model.apply(p, x, y, train=False))(
            params, a, b)
        full = np.asarray(model.full_res_flow(flows, a.shape[1:3])
                          )[0, :h, :w]
        out: Dict = {
            "resize_mode": model_cfg.resize_mode,
            "input_center": model_cfg.input_center,
            "mean_flow_magnitude":
                float(np.sqrt((full ** 2).sum(-1)).mean()),
        }
        if gt is not None:
            out["epe_vs_gt"] = _epe(full, gt)
            # Per-level diffs: level prediction -> full-res pixels vs GT.
            per_level = []
            for fl in flows:
                up = np.asarray(model.full_res_flow([fl], a.shape[1:3])
                                )[0, :h, :w]
                per_level.append({
                    "level_hw": list(fl.shape[1:3]),
                    "epe_vs_gt": _epe(up, gt),
                })
            out["per_level"] = per_level
        if ref is not None:
            out["epe_vs_reference"] = _epe(full, ref)
        return out

    base = cfg.model
    if not sweep:
        return run(base)
    combos = []
    for mode in ("half_pixel", "align_corners"):
        for center in (False, True):
            combos.append(run(dataclasses.replace(
                base, resize_mode=mode, input_center=center)))
    best = None
    key = ("epe_vs_reference" if ref is not None
           else "epe_vs_gt" if gt is not None else None)
    if key:
        best = min(combos, key=lambda r: r[key])
        best = {k: best[k] for k in ("resize_mode", "input_center", key)}
    return {"sweep": combos, "best": best}
