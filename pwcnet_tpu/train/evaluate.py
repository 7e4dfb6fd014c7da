"""Evaluation: dataset EPE (masked for KITTI) and single-pair inference.

Parity with the reference's val-EPE block (``main.py:~160-185``) and
``predict.py`` inference path (SURVEY.md §3.4/§3.5): pad to /64-divisible,
forward, upsample finest flow to full res, undo the supervision scale.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pwcnet_tpu.data.base import FlowDataset
from pwcnet_tpu.data.pipeline import eval_batches
from pwcnet_tpu.models import PWCNet
from pwcnet_tpu.train.step import make_eval_step


def pad_to_divisible(img: np.ndarray, div: int = 64
                     ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Zero-pad (bottom/right) H, W to multiples of ``div``; returns the
    padded array and the original (H, W)."""
    h, w = img.shape[-3:-1]
    ph, pw = -(-h // div) * div, -(-w // div) * div
    if (ph, pw) == (h, w):
        return img, (h, w)
    pad = [(0, 0)] * (img.ndim - 3) + [(0, ph - h), (0, pw - w), (0, 0)]
    return np.pad(img, pad), (h, w)


def predict_flow(model: PWCNet, params, im1: np.ndarray, im2: np.ndarray
                 ) -> np.ndarray:
    """Single-pair inference: (H, W, 3) images in [0,1] -> (H, W, 2) pixel
    flow at input resolution."""
    div = getattr(model, "pad_divisor", 64)
    p1, (h, w) = pad_to_divisible(im1[None], div)
    p2, _ = pad_to_divisible(im2[None], div)

    @jax.jit
    def fwd(params, a, b):
        flows = model.apply(params, a, b, train=False)
        return model.full_res_flow(flows, a.shape[1:3])

    full = fwd(params, jnp.asarray(p1), jnp.asarray(p2))
    return np.asarray(full[0, :h, :w])


def evaluate_dataset(model: PWCNet, params, dataset: FlowDataset,
                     batch: int = 4, mesh=None,
                     pad_to: Optional[Tuple[int, int]] = None,
                     limit: Optional[int] = None) -> Dict[str, float]:
    """Mean EPE + Fl-all over a dataset (validity-masked; padding too).

    The per-batch sums are accumulated ON DEVICE and fetched once at the
    end: a per-batch ``float()`` would synchronize the host every batch and
    serialize eval through a high-latency device link (e.g. a remote-TPU
    tunnel); async accumulation lets batch k+1 upload while k computes.
    """
    step = make_eval_step(model, mesh=mesh)
    s_tot = o_tot = c_tot = b_tot = None
    samples = []
    from pwcnet_tpu.parallel import shard_batch
    for b in eval_batches(dataset, batch, pad_to=pad_to, limit=limit,
                          div=getattr(model, "pad_divisor", 64)):
        if mesh is not None:
            b = shard_batch(mesh, b)
        else:
            b = jax.device_put(b)
        s, o, c, bins, per_sample = step(params, b)
        samples.append(per_sample)
        if s_tot is None:
            s_tot, o_tot, c_tot, b_tot = s, o, c, bins
        else:  # device-side lazy accumulate — no host sync per batch
            s_tot, o_tot, c_tot = s_tot + s, o_tot + o, c_tot + c
            b_tot = b_tot + bins
    num, out, den, bt, ps = jax.device_get(
        (s_tot, o_tot, c_tot, b_tot, jnp.concatenate(samples)))
    num, out, den = float(num), float(out), max(float(den), 1.0)
    res = {"epe": num / den, "fl_all": 100.0 * out / den,
           "num_valid_px": den}
    # EPE by GT displacement magnitude (Sintel s0-10/s10-40/s40+ style).
    for name, (se, ce) in zip(("epe_s0_10", "epe_s10_40", "epe_s40plus"),
                              np.asarray(bt).T):
        res[name] = float(se) / max(float(ce), 1.0)
    # Sample-level mean +/- stderr (VERDICT r4 weak #6): all-invalid rows
    # are the final-batch padding dups — drop them. The per-sample mean
    # weights every frame equally (vs the pixel-weighted headline EPE);
    # both are reported.
    ps = np.asarray(ps, np.float64)
    ps = ps[ps[:, 1] > 0]
    n = len(ps)
    res["num_samples"] = n
    if n:
        for name, (s_col, c_col) in (("epe", (0, 1)), ("epe_s0_10", (2, 5)),
                                     ("epe_s10_40", (3, 6)),
                                     ("epe_s40plus", (4, 7))):
            has = ps[:, c_col] > 0
            if not has.any():
                continue
            vals = ps[has, s_col] / ps[has, c_col]
            res[f"{name}_sample_mean"] = float(vals.mean())
            res[f"{name}_sample_stderr"] = float(
                vals.std(ddof=1) / np.sqrt(len(vals))) if len(vals) > 1 \
                else 0.0
    return res
