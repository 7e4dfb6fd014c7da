"""Hand-written Pallas TPU kernel for the local cost volume (correlation).

This is the TPU-native replacement for the reference's CUDA extension
(reference ``correlation_package/correlation_cuda_kernel.cu``:
``correlation_forward``, ``correlation_backward_input1/2`` — SURVEY.md §2a):
a fused local correlation with ``max_displacement=d`` (output channels
``(2d+1)^2``), channels-last layout, f32 accumulation, and a
``jax.custom_vjp`` whose backward passes are also Pallas kernels.

Kernel strategy (TPU-first, not a CUDA translation):
- Frame-2 features are zero-padded by ``d`` in XLA and the *whole padded
  image* is kept resident in VMEM per grid step (PWC-Net pyramid levels are
  small: e.g. Sintel level 2 is 109x256x32 bf16 ≈ 1.8 MB; a VMEM budget
  check falls back to the lax implementation for oversized inputs).
- The grid tiles (batch, H-rows); each program computes a
  ``(TILE_H, W, D^2)`` output tile. The 81 displacement taps are a static
  Python loop — 81 VPU multiply-reduce ops over the channel axis, unrolled
  by Mosaic, each reading a shifted window of the resident f2 block
  (``f1``/``f2`` are each read from HBM exactly once — the HBM
  speed-of-light target from BASELINE.json).
- Backward-wrt-f1 has the same shifted-window gather structure as the
  forward; backward-wrt-f2 (a scatter in the CUDA version) is recast as a
  gather from the *opposite* displacement of the padded ``g * f1`` product
  (SURVEY.md §7 "hard parts" #1).

Displacement channel ordering matches the lax reference and the CUDA
kernel's ``top_channel`` layout: ``k = (dy + d) * (2d + 1) + (dx + d)``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default VMEM budget for resident blocks (per-core VMEM is ~16 MB; leave
# headroom for double buffering and the output tile).
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pick_tile_h(h: int, w: int, c: int, d: int, itemsize: int) -> int:
    """Choose the per-program row-tile so all resident buffers fit VMEM."""
    f2_bytes = (h + 2 * d) * (w + 2 * d) * c * itemsize
    side = 2 * d + 1
    for tile_h in (32, 16, 8, 4, 2, 1):
        tile_bytes = (
            tile_h * w * c * itemsize            # f1 tile
            + tile_h * w * side * side * 4       # f32 out tile
        )
        # Grid pipelining double-buffers the tiles.
        if f2_bytes + 2 * tile_bytes <= _VMEM_BUDGET_BYTES:
            return min(tile_h, h)
    return 1


def _fits_vmem(h: int, w: int, c: int, d: int, itemsize: int) -> bool:
    return (h + 2 * d) * (w + 2 * d) * c * itemsize <= _VMEM_BUDGET_BYTES // 2


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _corr_fwd_kernel(f1_ref, f2p_ref, out_ref, *, d: int, tile_h: int,
                     w: int, c: int):
    """out[y, x, k] = (1/C) sum_c f1[y, x, c] * f2p[y+dy, x+dx, c]."""
    row0 = pl.program_id(1) * tile_h
    f1b = f1_ref[0].astype(jnp.float32)  # (TILE_H, W, C)
    side = 2 * d + 1
    inv_c = 1.0 / c
    taps = []
    for dy in range(side):
        for dx in range(side):
            f2w = f2p_ref[0, pl.ds(row0 + dy, tile_h),
                          pl.ds(dx, w), :].astype(jnp.float32)
            taps.append(jnp.sum(f1b * f2w, axis=-1) * inv_c)
    out_ref[0] = jnp.stack(taps, axis=-1)


def _corr_forward_pallas(f1: jax.Array, f2: jax.Array, d: int,
                         interpret: bool) -> jax.Array:
    n, h, w, c = f1.shape
    side = 2 * d + 1
    itemsize = f1.dtype.itemsize
    tile_h = _pick_tile_h(h, w, c, d, itemsize)
    n_tiles = _cdiv(h, tile_h)
    # Pad so the kernel's shifted row-windows never run past the buffer even
    # for a ragged final tile (dynamic_slice would otherwise clamp the start
    # and silently misalign the last rows).
    pad_h = n_tiles * tile_h - h
    f2p = jnp.pad(f2, ((0, 0), (d, d + pad_h), (d, d), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_corr_fwd_kernel, d=d, tile_h=tile_h, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((n, h, w, side * side), jnp.float32),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * d + pad_h, w + 2 * d, c),
                         lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, side * side),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * side * side * c,
            bytes_accessed=(2 * n * h * w * c * itemsize
                            + n * h * w * side * side * 4),
            transcendentals=0,
        ),
    )(f1, f2p)
    return out.astype(f1.dtype)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _corr_bwd_f1_kernel(g_ref, f2p_ref, out_ref, *, d: int, tile_h: int,
                        w: int, c: int):
    """df1[y, x, c] = (1/C) sum_k g[y, x, k] * f2p[y+dy, x+dx, c]."""
    row0 = pl.program_id(1) * tile_h
    g = g_ref[0].astype(jnp.float32)  # (TILE_H, W, D^2)
    side = 2 * d + 1
    acc = jnp.zeros((tile_h, w, c), jnp.float32)
    for dy in range(side):
        for dx in range(side):
            k = dy * side + dx
            f2w = f2p_ref[0, pl.ds(row0 + dy, tile_h),
                          pl.ds(dx, w), :].astype(jnp.float32)
            acc = acc + g[:, :, k:k + 1] * f2w
    out_ref[0] = acc * (1.0 / c)


def _corr_bwd_f2_kernel(gf1p_ref, out_ref, *, d: int, tile_h: int,
                        w: int, c: int, side2: int):
    """df2[y, x, c] = (1/C) sum_k gp[y+sy, x+sx, k] * f1p[y+sy, x+sx, c]
    with (sy, sx) = (d - dy, d - dx) — the scatter recast as a gather from
    the opposite shift. ``gf1p`` packs [g (D^2) | f1 (C)] padded by d."""
    row0 = pl.program_id(1) * tile_h
    side = 2 * d + 1
    acc = jnp.zeros((tile_h, w, c), jnp.float32)
    for dy in range(side):
        for dx in range(side):
            k = dy * side + dx
            sy, sx = 2 * d - dy, 2 * d - dx
            win = gf1p_ref[0, pl.ds(row0 + sy, tile_h), pl.ds(sx, w), :]
            gk = win[:, :, k:k + 1].astype(jnp.float32)
            f1w = win[:, :, side2:].astype(jnp.float32)
            acc = acc + gk * f1w
    out_ref[0] = acc * (1.0 / c)


def _corr_backward_pallas(f1: jax.Array, f2: jax.Array, g: jax.Array,
                          d: int, interpret: bool
                          ) -> Tuple[jax.Array, jax.Array]:
    n, h, w, c = f1.shape
    side = 2 * d + 1
    side2 = side * side
    itemsize = 4
    tile_h = _pick_tile_h(h, w, max(c, side2 + c), d, itemsize)
    n_tiles = _cdiv(h, tile_h)
    pad_h = n_tiles * tile_h - h

    g32 = g.astype(jnp.float32)

    # --- df1: same windowed-gather structure as the forward. ---
    f2p = jnp.pad(f2.astype(jnp.float32),
                  ((0, 0), (d, d + pad_h), (d, d), (0, 0)))
    df1 = pl.pallas_call(
        functools.partial(_corr_bwd_f1_kernel, d=d, tile_h=tile_h, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.float32),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_h, w, side2), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h + 2 * d + pad_h, w + 2 * d, c),
                         lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(g32, f2p)

    # --- df2: gather from opposite shifts of padded [g | f1]. ---
    gf1 = jnp.concatenate([g32, f1.astype(jnp.float32)], axis=-1)
    gf1p = jnp.pad(gf1, ((0, 0), (d, d + pad_h), (d, d), (0, 0)))
    df2 = pl.pallas_call(
        functools.partial(_corr_bwd_f2_kernel, d=d, tile_h=tile_h, w=w,
                          c=c, side2=side2),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.float32),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, h + 2 * d + pad_h, w + 2 * d, side2 + c),
                         lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(gf1p)
    return df1.astype(f1.dtype), df2.astype(f2.dtype)


# ---------------------------------------------------------------------------
# custom_vjp wiring + public entry point
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _cost_volume_pallas(f1, f2, d, interpret):
    return _corr_forward_pallas(f1, f2, d, interpret)


def _cv_fwd(f1, f2, d, interpret):
    return _corr_forward_pallas(f1, f2, d, interpret), (f1, f2)


def _cv_bwd(d, interpret, res, g):
    f1, f2 = res
    return _corr_backward_pallas(f1, f2, g, d, interpret)


_cost_volume_pallas.defvjp(_cv_fwd, _cv_bwd)


def cost_volume_pallas(f1: jax.Array, f2: jax.Array, *,
                       max_displacement: int = 4,
                       interpret: bool | None = None) -> jax.Array:
    """Pallas cost volume; falls back to the lax path for oversized inputs.

    ``interpret=None`` auto-selects interpreter mode off-TPU so the same
    code path runs in CPU tests (SURVEY.md §4).
    """
    if f1.shape != f2.shape:
        raise ValueError(f"shape mismatch {f1.shape} vs {f2.shape}")
    n, h, w, c = f1.shape
    d = max_displacement
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if not _fits_vmem(h, w, c, d, f1.dtype.itemsize):
        from pwcnet_tpu.ops.cost_volume import cost_volume_lax
        return cost_volume_lax(f1, f2, d)
    return _cost_volume_pallas(f1, f2, d, interpret)
