"""Two-view matching front-end (BASELINE north star: "expose the flow
engine as a front-end module for SLAM-style two-view matching").

Dense flow -> sparse, confidence-scored correspondences:

1. ONE batched forward computes both directions (the pair is stacked as
   a batch of two — the model's both-frame batching makes this a single
   XLA computation, no second dispatch).
2. Forward-backward consistency: e(x) = |F_fw(x) + F_bw(x + F_fw(x))|,
   with the backward field sampled by the framework's own bilinear warp
   (``ops/warp.py``). Occlusions and mismatches produce large e.
3. Matches are sampled on a regular grid (SLAM front-ends track a
   bounded feature budget), keeping points whose consistency error
   passes ``fb_threshold`` px and whose forward target lands in-bounds.

Returns plain numpy (host-side API like ``predict_flow``): pts1/pts2 as
(M, 2) x-y pixel coordinates and a confidence in (0, 1] derived from the
consistency error. The dense fields are returned too so callers can do
their own sampling.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _both_flows(model, params, im1: np.ndarray, im2: np.ndarray,
                ) -> Tuple[np.ndarray, np.ndarray]:
    """(H, W, 2) forward and backward pixel flow in one batched forward."""
    import jax
    import jax.numpy as jnp

    from pwcnet_tpu.train.evaluate import pad_to_divisible

    h, w = im1.shape[:2]
    pair = np.stack([im1, im2]), np.stack([im2, im1])
    div = getattr(model, "pad_divisor", 64)
    a, _ = pad_to_divisible(pair[0], div)
    b, _ = pad_to_divisible(pair[1], div)

    @jax.jit
    def fwd(params, a, b):
        flows = model.apply(params, a, b, train=False)
        return model.full_res_flow(flows, a.shape[1:3])

    full = np.asarray(fwd(params, jnp.asarray(a), jnp.asarray(b)))
    return full[0, :h, :w], full[1, :h, :w]


def fb_consistency(flow_fw: np.ndarray, flow_bw: np.ndarray) -> np.ndarray:
    """Per-pixel forward-backward error |F_fw(x) + F_bw(x + F_fw(x))|."""
    import jax.numpy as jnp

    from pwcnet_tpu.ops.warp import warp_bilinear

    bw_at_target = np.asarray(warp_bilinear(
        jnp.asarray(flow_bw[None]), jnp.asarray(flow_fw[None]))[0])
    return np.sqrt(((flow_fw + bw_at_target) ** 2).sum(-1))


def match_two_view(model, params, im1: np.ndarray, im2: np.ndarray, *,
                   grid_step: int = 8,
                   fb_threshold: float = 1.5) -> Dict[str, np.ndarray]:
    """SLAM-style sparse matches between one image pair.

    Args:
      model/params: a trained flow model (PWCNet or RAFT family).
      im1, im2: (H, W, 3) float images in [0, 1].
      grid_step: sampling stride in pixels (feature budget ~ H*W/step^2).
      fb_threshold: max forward-backward error in px for a valid match.

    Returns dict with ``pts1``/``pts2`` (M, 2) float32 x-y coordinates,
    ``confidence`` (M,) in (0, 1] (1 / (1 + fb_error)), and the dense
    ``flow`` (H, W, 2) + ``fb_error`` (H, W) fields.
    """
    h, w = im1.shape[:2]
    flow_fw, flow_bw = _both_flows(model, params, im1, im2)
    err = fb_consistency(flow_fw, flow_bw)

    ys, xs = np.mgrid[grid_step // 2:h:grid_step,
                      grid_step // 2:w:grid_step]
    ys, xs = ys.ravel(), xs.ravel()
    u = flow_fw[ys, xs, 0]
    v = flow_fw[ys, xs, 1]
    tx, ty = xs + u, ys + v
    e = err[ys, xs]
    keep = ((e <= fb_threshold)
            & (tx >= 0) & (tx <= w - 1) & (ty >= 0) & (ty <= h - 1))
    return {
        "pts1": np.stack([xs[keep], ys[keep]], -1).astype(np.float32),
        "pts2": np.stack([tx[keep], ty[keep]], -1).astype(np.float32),
        "confidence": (1.0 / (1.0 + e[keep])).astype(np.float32),
        "flow": flow_fw,
        "fb_error": err,
    }
