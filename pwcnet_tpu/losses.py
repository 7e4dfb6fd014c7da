"""Multi-scale training losses and the EPE metric (reference ``losses.py``).

- ``multiscale_loss``: sum_l alpha_l * ||flow_l - gt_l||_2 with the PWC-Net
  paper's level weights (coarsest-first ``0.32, 0.08, 0.02, 0.01, 0.005``);
  the L2 norm is taken per pixel and summed over pixels, averaged over batch
  (paper eq. 1; reference ``losses.py:~10-35``).
- ``robust_loss``: fine-tuning loss (|Delta|_1 + eps)^q with q=0.4,
  eps=0.01 (paper S_fine; reference ``losses.py``).
- ``epe``: mean end-point error with optional validity mask (KITTI sparse
  ground truth; reference ``losses.py:~45-60``).

Ground-truth preparation follows the flow-unit convention in
``pwcnet_tpu/models/pwcnet.py``: per-level GT = full-res GT bilinearly
downsampled to the level's resolution, divided by ``flow_scale``.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

# Coarsest-first level weights (PWC-Net paper §4).
LEVEL_WEIGHTS: Tuple[float, ...] = (0.32, 0.08, 0.02, 0.01, 0.005)


def _weights_for(flows: List[jax.Array],
                 weights: Sequence[float]) -> Sequence[float]:
    """Match the weight list to the number of predicted levels: extra fine
    levels reuse the finest weight (never silently drop a level)."""
    n = len(flows)
    if len(weights) >= n:
        return weights[:n]
    return tuple(weights) + (weights[-1],) * (n - len(weights))


def downsample_gt(gt: jax.Array, hw: Tuple[int, int],
                  flow_scale: float = 20.0,
                  valid: jax.Array | None = None
                  ) -> Tuple[jax.Array, jax.Array | None]:
    """Downsample full-res GT flow (N, H, W, 2) to ``hw`` in scaled units.

    With a validity mask (sparse KITTI GT, reference ``datasets.py:~185-230``)
    the GT is downsampled *mask-weighted*: each coarse pixel is the average of
    the valid fine pixels under its bilinear support, and the returned weight
    is the (continuous) fraction of valid support. This keeps supervision
    alive at coarse levels — a hard ``>= 0.999`` threshold on the bilinear
    mask would zero essentially every coarse pixel for scattered sparse GT
    (any invalid neighbor taints the mix), silently removing the strongly
    weighted coarse loss terms.
    """
    n = gt.shape[0]
    if valid is None:
        gt_l = jax.image.resize(gt, (n, hw[0], hw[1], 2), method="bilinear")
        return gt_l / flow_scale, None
    v = valid.astype(jnp.float32)
    v_l = jax.image.resize(v, (n, hw[0], hw[1]), method="bilinear")
    gt_w = jax.image.resize(gt * v[..., None], (n, hw[0], hw[1], 2),
                            method="bilinear")
    gt_l = gt_w / jnp.maximum(v_l, 1e-6)[..., None]
    return gt_l / flow_scale, v_l


def _masked_pixel_sum(per_pixel: jax.Array,
                      valid: jax.Array | None) -> jax.Array:
    """Per-level loss term: sum over (H, W), mean over batch.

    With a (possibly fractional) validity weight the term is
    *count-normalized*: ``mean_over_valid * H * W`` — identical to the plain
    sum for dense GT, and scale-consistent across levels and mask densities
    for sparse GT (the sum is estimated as if the GT were dense)."""
    if valid is None:
        return jnp.mean(jnp.sum(per_pixel, axis=(1, 2)))
    hw = per_pixel.shape[1] * per_pixel.shape[2]
    num = jnp.sum(per_pixel * valid, axis=(1, 2))
    den = jnp.maximum(jnp.sum(valid, axis=(1, 2)), 1.0)
    return jnp.mean(num / den * hw)


def multiscale_loss(flows: List[jax.Array], gt: jax.Array,
                    valid: jax.Array | None = None,
                    weights: Sequence[float] = LEVEL_WEIGHTS,
                    flow_scale: float = 20.0) -> jax.Array:
    """Paper training loss over the coarsest-first per-level flow list."""
    total = jnp.float32(0.0)
    for flow_l, w in zip(flows, _weights_for(flows, weights)):
        gt_l, v_l = downsample_gt(gt, flow_l.shape[1:3], flow_scale, valid)
        diff = flow_l.astype(jnp.float32) - gt_l
        # Per-pixel L2 norm of the 2-vector error.
        mag = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-16)
        total = total + w * _masked_pixel_sum(mag, v_l)
    return total


def robust_loss(flows: List[jax.Array], gt: jax.Array,
                valid: jax.Array | None = None,
                weights: Sequence[float] = LEVEL_WEIGHTS,
                flow_scale: float = 20.0,
                eps: float = 0.01, q: float = 0.4) -> jax.Array:
    """Fine-tuning loss: (|Delta|_1 + eps)^q per pixel (paper S_fine)."""
    total = jnp.float32(0.0)
    for flow_l, w in zip(flows, _weights_for(flows, weights)):
        gt_l, v_l = downsample_gt(gt, flow_l.shape[1:3], flow_scale, valid)
        diff = jnp.abs(flow_l.astype(jnp.float32) - gt_l).sum(-1)
        total = total + w * _masked_pixel_sum((diff + eps) ** q, v_l)
    return total


def epe(pred: jax.Array, gt: jax.Array,
        valid: jax.Array | None = None) -> jax.Array:
    """Mean end-point error. ``pred``/``gt``: (N, H, W, 2) in pixels.

    With ``valid`` (N, H, W), the mean runs over valid pixels only.
    """
    diff = pred.astype(jnp.float32) - gt.astype(jnp.float32)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-16)
    if valid is None:
        return jnp.mean(dist)
    v = valid.astype(jnp.float32)
    return jnp.sum(dist * v) / jnp.maximum(jnp.sum(v), 1.0)


def fl_outliers(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """KITTI Fl outlier indicator per pixel (devkit definition): a pixel is
    an outlier when EPE > 3 px AND EPE > 5% of the GT flow magnitude.
    ``pred``/``gt``: (..., 2) pixel flow; returns (...) float32 in {0, 1}.
    (Reference capability: KITTI-2015 Fl-all headline metric, BASELINE.md.)
    """
    diff = pred.astype(jnp.float32) - gt.astype(jnp.float32)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-16)
    gt_mag = jnp.sqrt(jnp.sum(gt.astype(jnp.float32) ** 2, axis=-1) + 1e-16)
    return ((dist > 3.0) & (dist > 0.05 * gt_mag)).astype(jnp.float32)


def sequence_loss(flows: List[jax.Array], gt: jax.Array,
                  valid: jax.Array | None = None,
                  gamma: float = 0.8,
                  max_flow: float = 400.0) -> jax.Array:
    """RAFT's exponentially-weighted sequence loss (Teed & Deng 2020).

    ``flows``: per-iteration predictions at 1/8 resolution (pixels at that
    resolution); each is upsampled to the GT resolution (with magnitude
    rescale) and compared with L1. Weight gamma^(N-1-i) emphasizes later
    iterations. Pixels with |gt| > max_flow are excluded (standard RAFT
    practice).
    """
    n_iters = len(flows)
    hw = gt.shape[1:3]
    mag = jnp.sqrt(jnp.sum(gt.astype(jnp.float32) ** 2, axis=-1))
    v = (mag < max_flow).astype(jnp.float32)
    if valid is not None:
        v = v * valid.astype(jnp.float32)
    total = jnp.float32(0.0)
    for i, flow in enumerate(flows):
        scale = hw[0] / flow.shape[1]
        up = jax.image.resize(
            flow.astype(jnp.float32),
            (flow.shape[0], hw[0], hw[1], 2), "bilinear") * scale
        l1 = jnp.sum(jnp.abs(up - gt.astype(jnp.float32)), axis=-1)
        w = gamma ** (n_iters - 1 - i)
        total = total + w * jnp.sum(l1 * v) / jnp.maximum(jnp.sum(v), 1.0)
    return total
