"""Backward bilinear warping (the TPU replacement for ``F.grid_sample``).

Semantics replicated from the reference ``WarpingLayer``
(reference ``modules.py:~45-80``): backward warp of ``feat`` by ``flow``
(in pixels at the feature's resolution), bilinear interpolation, and
**zero padding** for out-of-bounds samples — a sample contributes only
where the sampling point lands inside the image; fully OOB points produce 0.

Layouts are channels-last (N, H, W, C) throughout — TPU-native.

Implementation notes (TPU-first):
- There is no ``grid_sample`` primitive in XLA. The lax implementation
  gathers the 4 bilinear taps with ``jnp.take`` on the flattened (H*W)
  axis, which XLA lowers to an efficient single-axis gather with the
  channel axis vectorized along lanes.
- PyTorch's ``grid_sample(..., padding_mode='zeros', align_corners=True)``
  semantics on the *mask*: the reference builds a validity mask by warping
  an all-ones tensor and thresholding at ``0.9999``, zeroing partially-OOB
  pixels. We replicate that exactly (it measurably changes EPE).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def warp_bilinear(feat: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward-warp ``feat`` by ``flow``.

    Args:
      feat: (N, H, W, C) features of frame 2.
      flow: (N, H, W, 2) flow in pixels at this resolution; channel 0 is
        horizontal (x / width) displacement, channel 1 vertical (y).

    Returns:
      (N, H, W, C): ``out[n, y, x] ≈ feat[n, y + v, x + u]`` bilinearly
      interpolated, zero outside, with the reference's ones-mask applied.
    """
    n, h, w, c = feat.shape
    dtype = feat.dtype
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)

    xs = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2) + fx
    ys = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1) + fy

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]

    def tap(yi, xi):
        """Gather feat[n, yi, xi, :] with zero OOB, plus in-bounds weight 1."""
        inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat_idx = yc * w + xc  # (N, H, W)
        flat = feat.reshape(n, h * w, c)
        g = jnp.take_along_axis(
            flat, flat_idx.reshape(n, h * w, 1), axis=1
        ).reshape(n, h, w, c)
        m = inb.astype(jnp.float32)[..., None]
        return g.astype(jnp.float32) * m, m

    g00, m00 = tap(y0, x0)
    g01, m01 = tap(y0, x0 + 1)
    g10, m10 = tap(y0 + 1, x0)
    g11, m11 = tap(y0 + 1, x0 + 1)

    w00 = (1 - wy) * (1 - wx)
    w01 = (1 - wy) * wx
    w10 = wy * (1 - wx)
    w11 = wy * wx

    out = w00 * g00 + w01 * g01 + w10 * g10 + w11 * g11
    # Reference mask: warp ones the same way, zero where coverage < 1
    # (reference modules.py:~70-78 — mask = grid_sample(ones); mask<0.9999→0).
    ones_cov = w00 * m00 + w01 * m01 + w10 * m10 + w11 * m11
    mask = (ones_cov >= 0.9999).astype(jnp.float32)
    return (out * mask).astype(dtype)
