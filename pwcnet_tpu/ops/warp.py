"""Backward bilinear warping (the TPU replacement for ``F.grid_sample``).

Semantics replicated from the reference ``WarpingLayer``
(reference ``modules.py:~45-80``): backward warp of ``feat`` by ``flow``
(in pixels at the feature's resolution), bilinear interpolation, **zero
padding** for out-of-bounds samples, and the reference's ones-mask (warp an
all-ones tensor the same way; zero output where coverage < 0.9999 — it
measurably changes EPE at image borders).

Layouts are channels-last (N, H, W, C) throughout — TPU-native.

TPU implementation notes (measured on v5e, design rationale):
- There is no ``grid_sample`` primitive in XLA, and Mosaic (Pallas) has no
  vectorized in-kernel dynamic gather in this toolchain (probed: both
  ``jnp.take`` and ``jnp.take_along_axis`` fail to lower), so a Pallas
  warp kernel would have to gather via one-hot MXU matmuls — measured to
  cost more in one-hot *construction* (VPU iota/compare over W x W2 per
  row) than the gather it replaces. The XLA single-axis gather IS the
  TPU-native production path.
- The production path (:func:`warp_bilinear`) makes the gather as cheap as
  possible: instead of 4 separate bilinear-corner gathers it builds a
  4-corner table ``concat([f2, roll_x(f2), roll_y(f2), roll_xy(f2)])``
  (sequential-access construction, cheap) and performs ONE gather of
  4C-wide rows — 2.3x faster than the 4-gather formulation at PWC-Net
  level-2 shapes and bit-exact against it.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

# Backward (d_feat) implementation for the warp's single gather — the only
# expensive piece of the warp VJP (an XLA scatter-add; 931 us for the L2
# train shape alone, profile_r4.md). Selectable for A/B measurement
# (benchmarks/warp_bwd_probe.py):
#   'autodiff' — XLA's default gather-VJP scatter (r1-r4 behavior).
#   'scatter'  — explicit lax.scatter-add with promise_in_bounds (indices
#                are clipped in the forward, so bounds checks are dead
#                weight) + int32 index vector.
#   'sorted'   — per-image radix of the destination row: argsort the
#                indices, permutation-gather the update rows, then a
#                segment-sum with indices_are_sorted=True. Turns the
#                random-destination scatter into (sort small keys +
#                sequential-ish gather + sorted accumulate).
# All three are numerically exact (scatter-add reassociation only).
WARP_BWD = os.environ.get("PWCNET_WARP_BWD", "scatter")

# Corner extraction from the gathered 4C-wide rows (profile_r4 found the
# (n,h,w,4,c) 5-D reshape gets an off-standard T(4,128) tiling, forcing
# ~55-80 us relayout copies per level in BOTH directions of the train
# step — part of the 1958 us "data formatting" budget):
#   'reshape5d' — r1-r4 formulation: reshape to (..., 4, c), index axis 3.
#   'slice'     — keep (..., 4c) (a pure bitcast off the gather) and take
#                 four c-wide lane slices; exact same values.
WARP_SPLIT = os.environ.get("PWCNET_WARP_SPLIT", "slice")


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gather_rows(flat: jax.Array, idx: jax.Array, impl: str, p: int
                 ) -> jax.Array:
    """``take_along_axis(flat, idx, axis=1)`` with a selectable VJP.

    ``p`` must equal ``flat.shape[1]`` (static; the backward reconstructs
    the operand shape from it plus the cotangent's shape/dtype).
    """
    return jnp.take_along_axis(flat, idx, axis=1)


def _gather_rows_fwd(flat, idx, impl, p):
    return _gather_rows(flat, idx, impl, p), idx


def _gather_rows_bwd(impl, p, idx, g):
    n, _, c = g.shape
    shape = (n, p, c)
    if impl == "scatter":
        dnums = jax.lax.ScatterDimensionNumbers(
            update_window_dims=(2,), inserted_window_dims=(1,),
            operand_batching_dims=(0,), scatter_indices_batching_dims=(0,),
            scatter_dims_to_operand_dims=(1,))
        d_flat = jax.lax.scatter_add(
            jnp.zeros(shape, g.dtype), idx.astype(jnp.int32), g,
            dimension_numbers=dnums, indices_are_sorted=False,
            unique_indices=False,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS)
    elif impl == "sorted":
        keys = idx[..., 0].astype(jnp.int32)            # (n, t)
        order = jnp.argsort(keys, axis=1)
        sorted_keys = jnp.take_along_axis(keys, order, axis=1)
        sorted_g = jnp.take_along_axis(g, order[..., None], axis=1)

        def one(k, u):
            return jax.ops.segment_sum(u, k, num_segments=p,
                                       indices_are_sorted=True)
        d_flat = jax.vmap(one)(sorted_keys, sorted_g)
    else:  # 'autodiff'
        _, vjp = jax.vjp(lambda f: jnp.take_along_axis(f, idx, axis=1),
                         jnp.zeros(shape, g.dtype))
        (d_flat,) = vjp(g)
    return d_flat, None


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


def _sample_coords(feat: jax.Array, flow: jax.Array):
    n, h, w, _ = feat.shape
    return _sample_coords_hw(n, h, w, flow)


def _sample_coords_hw(n: int, h: int, w: int, flow: jax.Array):
    fx = flow[..., 0].astype(jnp.float32)
    fy = flow[..., 1].astype(jnp.float32)
    xs = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2) + fx
    ys = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1) + fy
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    return x0, y0, wx, wy


def _corner_masks(x0, y0, h: int, w: int):
    inb_x0 = ((x0 >= 0) & (x0 <= w - 1)).astype(jnp.float32)[..., None]
    inb_x1 = ((x0 + 1 >= 0) & (x0 + 1 <= w - 1)).astype(
        jnp.float32)[..., None]
    inb_y0 = ((y0 >= 0) & (y0 <= h - 1)).astype(jnp.float32)[..., None]
    inb_y1 = ((y0 + 1 >= 0) & (y0 + 1 <= h - 1)).astype(
        jnp.float32)[..., None]
    return (inb_y0 * inb_x0, inb_y0 * inb_x1,
            inb_y1 * inb_x0, inb_y1 * inb_x1)


def warp_table(feat: jax.Array) -> jax.Array:
    """Precompute the warp's 4-corner gather table for ``feat``.

    Flow-independent — callers that warp the SAME features repeatedly
    with different flows (RAFT's per-iteration lookup) build this once
    outside the loop; XLA does not hoist the pad/concat chain out of a
    ``lax.scan`` body on its own (measured r5: the in-loop construction
    cost ~0.27 ms/iteration at RAFT's 1/8-scale shapes).

    Returns (N, (H+2)*(W+2), 4C): channel block k holds the
    (dy, dx) = (k//2, k%2) corner neighbor of each 1-px-zero-ring-padded
    pixel. The rolls never wrap into gathered positions because gather
    rows/columns are clipped to <= padded_size - 2.
    """
    n, h, w, c = feat.shape
    fp = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    tx = jnp.concatenate([fp, jnp.roll(fp, -1, axis=2)], axis=-1)
    txy = jnp.concatenate([tx, jnp.roll(tx, -1, axis=1)], axis=-1)
    return txy.reshape(n, (h + 2) * (w + 2), 4 * c)


def warp_bilinear(feat: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward-warp ``feat`` by ``flow`` (production single-gather path).

    Args:
      feat: (N, H, W, C) features of frame 2.
      flow: (N, H, W, 2) flow in pixels at this resolution; channel 0 is
        horizontal (x / width) displacement, channel 1 vertical (y).

    Returns:
      (N, H, W, C): ``out[n, y, x] ≈ feat[n, y + v, x + u]`` bilinearly
      interpolated, zero outside, with the reference's ones-mask applied.
    """
    return warp_bilinear_from_table(warp_table(feat), feat.shape, flow,
                                    feat.dtype)


def warp_bilinear_from_table(flat: jax.Array, feat_shape, flow: jax.Array,
                             dtype=None) -> jax.Array:
    """:func:`warp_bilinear` given a precomputed :func:`warp_table`."""
    n, h, w, c = feat_shape
    dtype = flat.dtype if dtype is None else dtype
    hp, wp = h + 2, w + 2
    x0, y0, wx, wy = _sample_coords_hw(n, h, w, flow)

    xc = jnp.clip(x0 + 1, 0, wp - 2).astype(jnp.int32)
    yc = jnp.clip(y0 + 1, 0, hp - 2).astype(jnp.int32)
    idx = (yc * wp + xc).reshape(n, h * w, 1)
    g = _gather_rows(flat, idx, WARP_BWD, hp * wp)
    if WARP_SPLIT == "slice":
        g4 = g.reshape(n, h, w, 4 * c).astype(jnp.float32)
        corners = [g4[..., k * c:(k + 1) * c] for k in range(4)]
    else:
        g = g.reshape(n, h, w, 4, c).astype(jnp.float32)
        corners = [g[..., k, :] for k in range(4)]

    m00, m01, m10, m11 = _corner_masks(x0, y0, h, w)
    w00 = (1 - wy) * (1 - wx)
    w01 = (1 - wy) * wx
    w10 = wy * (1 - wx)
    w11 = wy * wx
    out = (w00 * corners[0] * m00 + w01 * corners[1] * m01
           + w10 * corners[2] * m10 + w11 * corners[3] * m11)
    # Reference mask: coverage of a warped all-ones tensor, zeroed < 0.9999.
    cov = w00 * m00 + w01 * m01 + w10 * m10 + w11 * m11
    mask = (cov >= 0.9999).astype(jnp.float32)
    return (out * mask).astype(dtype)


def warp_bilinear_ref(feat: jax.Array, flow: jax.Array) -> jax.Array:
    """Reference implementation: 4 independent corner gathers (used as the
    numeric oracle for :func:`warp_bilinear` in tests)."""
    n, h, w, c = feat.shape
    dtype = feat.dtype
    x0, y0, wx, wy = _sample_coords(feat, flow)

    def tap(yi, xi):
        inb = ((xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1))
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat_idx = yc * w + xc
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
    cov = w00 * m00 + w01 * m01 + w10 * m10 + w11 * m11
    mask = (cov >= 0.9999).astype(jnp.float32)
    return (out * mask).astype(dtype)
