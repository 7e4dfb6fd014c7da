"""Hand-written Pallas TPU kernel for the local cost volume (correlation).

This is the TPU-native replacement for the reference's CUDA extension
(reference ``correlation_package/correlation_cuda_kernel.cu``:
``correlation_forward``, ``correlation_backward_input1/2`` — SURVEY.md §2a):
a fused local correlation with ``max_displacement=d`` (output channels
``(2d+1)^2``), f32 accumulation, and a ``jax.custom_vjp`` whose backward
passes are also Pallas kernels.

Kernel strategy (TPU-first, not a CUDA translation; measured on v5e):
- Inside the kernel, tensors are **channel-first** ``(C, H, W)``: W rides
  the 128-lane dimension (PWC-Net level widths are 100-500 px so lanes
  stay busy), H rides sublanes, and the channel reduction runs over the
  leading, untiled axis — no lane padding when C < 128 (pyramid channels
  are 16-196) and no cross-lane reduction shuffles. The NHWC<->NCHW
  transposes happen in XLA around the kernel.
- The grid tiles (batch, H-rows). The ±d halo that displacement taps need
  is provided by passing the padded frame-2 features twice with **adjacent
  row-block index maps** (blocks i and i+1): Pallas' normal grid pipelining
  keeps the double-buffered DMAs, and every in-kernel tap slice is fully
  static. (Earlier designs — whole-image VMEM residency, or dynamic
  ``row0+dy`` sublane offsets — OOM scoped VMEM at the finest level or
  fail Mosaic's alignment checks.)
- Loop order is dx-outer / dy-inner: the unaligned **lane**-offset slice
  (the expensive cross-lane rotation) happens once per dx into a VMEM
  scratch (9 rotations per tile instead of 81); dy offsets are cheap
  static sublane slices. Products stay in the input dtype (bf16 in the
  production model) and accumulate in f32 via ``jnp.sum(dtype=f32)``,
  matching the CUDA kernel's f32 accumulate.
- Backward-wrt-f1 has the same shifted-window gather structure as the
  forward; backward-wrt-f2 (a scatter in the CUDA version) is recast as a
  gather from the *opposite* displacement of the padded ``[g | f1]`` stack
  (SURVEY.md §7 "hard parts" #1).

Displacement channel ordering matches the lax reference and the CUDA
kernel's ``top_channel`` layout: ``k = (dy + d) * (2d + 1) + (dx + d)``.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-core VMEM budget (hardware has ~16 MB of scoped VMEM; the estimate
# below already counts the double-buffered grid pipeline, so only a small
# margin for Mosaic scratch is reserved).
_VMEM_BUDGET_BYTES = int(11.5 * 1024 * 1024)

# Backward compute dtype. "f32" (default, r1-r3 behavior) upcasts the
# backward streams; "input" keeps them in the input dtype with f32
# accumulation only. Measured on v5e (benchmarks/results/bwd_dtype_r4.md):
# end-to-end TIE (the kernels are VPU-compute-bound, not bandwidth-bound)
# — and the bf16 variant's misaligned sublane-packed dy-slices OOM
# Mosaic's scoped VMEM at the tiny level-6 shape when the batch is not
# width-packed. f32 is the robust default; the flag stays for wide-shape
# experiments.
CORR_BWD_COMPUTE_DTYPE = "f32"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _pick_tile(w: int, c_in: int, c_out: int, d: int,
               itemsize: int) -> int | None:
    """Row-tile height so that all double-buffered blocks fit VMEM.

    Mosaic tiling: a (C, H, W) buffer pads H to 8 sublanes, W to 128 lanes.
    """
    wl = _round_up(w, 128)
    wp = _round_up(w + 2 * d, 128)
    for tile in (32, 16, 8):
        per_step = (
            c_in * tile * wl * itemsize        # f1 / g row block
            + 2 * c_in * tile * wp * itemsize  # two halo row blocks
            + c_out * tile * wl * 4            # f32 out block
        )
        scratch = c_in * 2 * tile * wl * itemsize + c_in * tile * wl * 4
        if 2 * per_step + scratch <= _VMEM_BUDGET_BYTES:
            return tile
    return None


def _to_cf(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, C, H, W)."""
    return jnp.transpose(x, (0, 3, 1, 2))


def _from_cf(x: jax.Array) -> jax.Array:
    """(N, C, H, W) -> (N, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 1))


def _pad_rows(x_cf: jax.Array, d: int, tile: int, n_tiles: int,
              h: int) -> jax.Array:
    """Pad (N, C, H, W) rows so block ``i+1`` of the halo spec is always in
    range: top d, bottom d + ragged-tile slack + one extra tile."""
    bottom = d + (n_tiles * tile - h) + tile
    return jnp.pad(x_cf, ((0, 0), (0, 0), (d, bottom), (d, d)))


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _corr_fwd_kernel(f1_ref, f2a_ref, f2b_ref, out_ref, f2x, *, d: int,
                     tile: int, w: int, c: int):
    """out[k, y, x] = (1/C) sum_c f1[c, y, x] * f2p[c, y+dy, x+dx]."""
    side = 2 * d + 1
    inv_c = jnp.float32(1.0 / c)
    f1b = f1_ref[0]  # (C, TILE, W)
    for dx in range(side):
        # The one cross-lane rotation for this dx, materialized to scratch
        # half-by-half (concatenating the halo halves first would double
        # VMEM pressure).
        f2x[:, :tile, :] = f2a_ref[0, :, :, dx:dx + w]
        f2x[:, tile:, :] = f2b_ref[0, :, :, dx:dx + w]
        for dy in range(side):
            out_ref[0, dy * side + dx] = (
                jnp.sum(f1b * f2x[:, dy:dy + tile, :], axis=0,
                        dtype=jnp.float32) * inv_c).astype(out_ref.dtype)


def _corr_forward_pallas(f1: jax.Array, f2: jax.Array, d: int,
                         interpret: bool,
                         rows_prepadded: bool = False) -> jax.Array:
    """Forward kernel launch. With ``rows_prepadded`` the caller supplies
    ``f2`` with d REAL rows above and below (halo rows in the spatially
    sharded path) instead of this function zero-padding them."""
    n, h, w, c = f1.shape
    side = 2 * d + 1
    itemsize = f1.dtype.itemsize
    tile = min(_pick_tile(w, c, side * side, d, itemsize),
               _round_up(h, 8))
    n_tiles = _cdiv(h, tile)
    f1cf = _to_cf(f1)
    if rows_prepadded:
        bottom = (n_tiles * tile - h) + tile
        f2cf = jnp.pad(_to_cf(f2),
                       ((0, 0), (0, 0), (0, bottom), (d, d)))
    else:
        f2cf = _pad_rows(_to_cf(f2), d, tile, n_tiles, h)
    wp = w + 2 * d

    halo_spec = lambda off: pl.BlockSpec(
        (1, c, tile, wp), lambda b, i, _o=off: (b, 0, i + _o, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_corr_fwd_kernel, d=d, tile=tile, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((n, side * side, h, w), f1.dtype),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, c, tile, w), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            halo_spec(0),
            halo_spec(1),
        ],
        out_specs=pl.BlockSpec((1, side * side, tile, w),
                               lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c, 2 * tile, w), f1.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h * w * side * side * c,
            bytes_accessed=(3 * n * h * w * c * itemsize
                            + n * h * w * side * side * itemsize),
            transcendentals=0,
        ),
    )(f1cf, f2cf, f2cf)
    return _from_cf(out).astype(f1.dtype)


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _corr_bwd_f1_kernel(g_ref, f2a_ref, f2b_ref, out_ref, f2x, acc, *,
                        d: int, tile: int, w: int, c: int):
    """df1[c, y, x] = (1/C) sum_k g[k, y, x] * f2p[c, y+dy, x+dx]."""
    side = 2 * d + 1
    gb = g_ref[0]  # (D^2, TILE, W) input dtype
    acc[...] = jnp.zeros_like(acc)
    for dx in range(side):
        f2x[:, :tile, :] = f2a_ref[0, :, :, dx:dx + w]
        f2x[:, tile:, :] = f2b_ref[0, :, :, dx:dx + w]
        for dy in range(side):
            k = dy * side + dx
            acc[...] += (gb[k:k + 1]
                         * f2x[:, dy:dy + tile, :]).astype(jnp.float32)
    out_ref[0] = (acc[...] * (1.0 / c)).astype(out_ref.dtype)


def _corr_bwd_f2_kernel(ga_ref, gb_ref, f1a_ref, f1b_ref, out_ref, gx, f1x,
                        acc, *, d: int, tile: int, w: int, c: int):
    """df2[c, y, x] = (1/C) sum_k gp[k, y+sy, x+sx] * f1p[c, y+sy, x+sx]
    with (sy, sx) = (2d - dy, 2d - dx) — the CUDA scatter recast as a
    gather from the opposite shift of d-padded g and f1."""
    side = 2 * d + 1
    acc[...] = jnp.zeros_like(acc)
    for dx in range(side):
        sx = 2 * d - dx
        gx[:, :tile, :] = ga_ref[0, :, :, sx:sx + w]
        gx[:, tile:, :] = gb_ref[0, :, :, sx:sx + w]
        f1x[:, :tile, :] = f1a_ref[0, :, :, sx:sx + w]
        f1x[:, tile:, :] = f1b_ref[0, :, :, sx:sx + w]
        for dy in range(side):
            k = dy * side + dx
            sy = 2 * d - dy
            acc[...] += (gx[k:k + 1, sy:sy + tile, :]
                         * f1x[:, sy:sy + tile, :]).astype(jnp.float32)
    out_ref[0] = (acc[...] * (1.0 / c)).astype(out_ref.dtype)


def _corr_backward_pallas(f1: jax.Array, f2: jax.Array, g: jax.Array,
                          d: int, interpret: bool
                          ) -> Tuple[jax.Array, jax.Array]:
    n, h, w, c = f1.shape
    side = 2 * d + 1
    side2 = side * side
    wp = w + 2 * d
    # Stream dtype: match the forward's precision model (input-dtype
    # products, f32 accumulation) unless CORR_BWD_COMPUTE_DTYPE == "f32".
    cdt = (jnp.float32 if CORR_BWD_COMPUTE_DTYPE == "f32"
           else f1.dtype)
    itemsize = jnp.dtype(cdt).itemsize
    gs = _to_cf(g.astype(cdt))

    tile = min(_pick_tile(w, side2 + c, c, d, itemsize), _round_up(h, 8))
    n_tiles = _cdiv(h, tile)

    halo = lambda ch, off: pl.BlockSpec(
        (1, ch, tile, wp), lambda b, i, _o=off: (b, 0, i + _o, 0),
        memory_space=pltpu.VMEM)

    # --- df1: same windowed-gather structure as the forward. ---
    f2cf = _pad_rows(_to_cf(f2.astype(cdt)), d, tile, n_tiles, h)
    df1 = pl.pallas_call(
        functools.partial(_corr_bwd_f1_kernel, d=d, tile=tile, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), cdt),
        grid=(n, n_tiles),
        in_specs=[
            pl.BlockSpec((1, side2, tile, w), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
            halo(c, 0),
            halo(c, 1),
        ],
        out_specs=pl.BlockSpec((1, c, tile, w), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c, 2 * tile, w), cdt),
                        pltpu.VMEM((c, tile, w), jnp.float32)],
        interpret=interpret,
    )(gs, f2cf, f2cf)

    # --- df2: gather from opposite shifts of padded g and f1. ---
    gp = _pad_rows(gs, d, tile, n_tiles, h)
    f1p = _pad_rows(_to_cf(f1.astype(cdt)), d, tile, n_tiles, h)
    df2 = pl.pallas_call(
        functools.partial(_corr_bwd_f2_kernel, d=d, tile=tile, w=w, c=c),
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), cdt),
        grid=(n, n_tiles),
        in_specs=[halo(side2, 0), halo(side2, 1), halo(c, 0), halo(c, 1)],
        out_specs=pl.BlockSpec((1, c, tile, w), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((side2, 2 * tile, w), cdt),
                        pltpu.VMEM((c, 2 * tile, w), cdt),
                        pltpu.VMEM((c, tile, w), jnp.float32)],
        interpret=interpret,
    )(gp, gp, f1p, f1p)
    return (_from_cf(df1).astype(f1.dtype), _from_cf(df2).astype(f2.dtype))


# ---------------------------------------------------------------------------
# custom_vjp wiring + public entry point
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _cost_volume_pallas(f1, f2, d, interpret, bwd="auto"):
    return _corr_forward_pallas(f1, f2, d, interpret)


def _cv_fwd(f1, f2, d, interpret, bwd):
    return _corr_forward_pallas(f1, f2, d, interpret), (f1, f2)


# Below this many pixels (post-packing shape), route the BACKWARD to lax
# autodiff. r4 set 1024 from isolated rooflines (L6 batch-1: 53 us pallas
# vs 8 us lax) — but the full-graph r5 profile measured that routing at
# **+2.2 ms/step** on the batch-8 train graph (corr_bwd 3906 -> 6061 us,
# profile_r5 vs r4; XLA's 81-tap pad+add autodiff schedules terribly in
# the full graph, the same isolated-vs-full inversion as the forward
# note below and stem_backward_r3). Disabled by default; kept as an env
# knob for single-sample training experiments.
BWD_LAX_MAX_PIXELS = int(os.environ.get("PWCNET_CORR_BWD_LAX_MAX_PX", "0"))


def _bwd_tile_fits(w: int, c: int, d: int, itemsize: int) -> bool:
    side = 2 * d + 1
    item = 4 if CORR_BWD_COMPUTE_DTYPE == "f32" else itemsize
    return _pick_tile(w, side * side + c, c, d, item) is not None


def _cv_bwd(d, interpret, bwd, res, g):
    f1, f2 = res
    n, h, w, c = f1.shape
    if (bwd == "lax"
            or (BWD_LAX_MAX_PIXELS and h * w <= BWD_LAX_MAX_PIXELS)
            or not _bwd_tile_fits(w, c, d, f1.dtype.itemsize)):
        # lax-autodiff backward: the tiny-shape env knob, or shapes whose
        # backward tile overflows VMEM (e.g. RAFT's C=128 fine scale with
        # f32 streams). The FORWARD stays Pallas either way — r5 measured
        # the old all-or-nothing fallback at 7.4 ms/frame on RAFT
        # inference (lax's 81 per-channel outputs force a scalarized
        # 162-way concat downstream; profile_r5 concatenate.163).
        from pwcnet_tpu.ops.cost_volume import cost_volume_lax
        _, vjp = jax.vjp(lambda a, b: cost_volume_lax(a, b, d), f1, f2)
        return vjp(g.astype(f1.dtype))  # cotangent dtype = lax out dtype
    return _corr_backward_pallas(f1, f2, g, d, interpret)


_cost_volume_pallas.defvjp(_cv_fwd, _cv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _cost_volume_pallas_pre(f1, f2e, d, interpret):
    return _corr_forward_pallas(f1, f2e, d, interpret, rows_prepadded=True)


def _cv_pre_fwd(f1, f2e, d, interpret):
    return _cost_volume_pallas_pre(f1, f2e, d, interpret), (f1, f2e)


def _cv_pre_bwd(d, interpret, res, g):
    # Backward composes from lax ops (exact; the spatially-sharded path is
    # inference-first — a hand-written prepadded backward kernel can land
    # later without changing this interface).
    f1, f2e = res
    from pwcnet_tpu.ops.cost_volume import cost_volume_prepadded_lax
    _, vjp = jax.vjp(
        lambda a, b: cost_volume_prepadded_lax(a, b, d), f1, f2e)
    return vjp(g)


_cost_volume_pallas_pre.defvjp(_cv_pre_fwd, _cv_pre_bwd)


def cost_volume_pallas_prepadded(f1: jax.Array, f2e: jax.Array, *,
                                 max_displacement: int = 4,
                                 interpret: bool | None = None) -> jax.Array:
    """Pallas correlation with d REAL halo rows already attached to ``f2e``
    (rows [-d, H+d); see ``pwcnet_tpu/parallel/halo.py``)."""
    n, h, w, c = f1.shape
    d = max_displacement
    side = 2 * d + 1
    if f2e.shape[1] != h + 2 * d:
        raise ValueError(
            f"f2e must have H + 2d = {h + 2 * d} rows, got {f2e.shape[1]}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if _pick_tile(w, c, side * side, d, f1.dtype.itemsize) is None:
        from pwcnet_tpu.ops.cost_volume import cost_volume_prepadded_lax
        return cost_volume_prepadded_lax(f1, f2e, d)
    return _cost_volume_pallas_pre(f1, f2e, d, interpret)


# Lane-fill packing: with W below this, multi-sample batches are packed
# along the width (2d-zero separators) so the kernel's 128-lane rows stay
# busy — PWC levels 4-6 at training batch sizes, and RAFT's 1/8- and
# 1/16-res lookups, otherwise leave 50-90% of lanes idle.
PACK_MIN_LANES = 128


def _pack_width(x: jax.Array, d: int) -> jax.Array:
    """(N, H, W, C) -> (1, H, N*(W+2d), C): samples side by side along W,
    each followed by 2d zero columns. A tap at |dx| <= d from a sample
    edge reads separator zeros — exactly what the zero-padded correlation
    of the unpacked sample would read, so packed outputs at sample
    columns equal unpacked outputs (separator columns are discarded)."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 2 * d), (0, 0)))
    return xp.transpose(1, 0, 2, 3).reshape(1, h, n * (w + 2 * d), c)


def _unpack_width(out: jax.Array, n: int, w: int, d: int) -> jax.Array:
    """(1, H, N*(W+2d), K) -> (N, H, W, K)."""
    _, h, wp, k = out.shape
    out = out.reshape(h, n, w + 2 * d, k).transpose(1, 0, 2, 3)
    return out[:, :, :w, :]


def cost_volume_pallas(f1: jax.Array, f2: jax.Array, *,
                       max_displacement: int = 4,
                       interpret: bool | None = None,
                       bwd: str = "auto") -> jax.Array:
    """Pallas cost volume; falls back to the lax path for oversized inputs.

    ``interpret=None`` auto-selects interpreter mode off-TPU so the same
    code path runs in CPU tests (SURVEY.md §4).
    """
    if f1.shape != f2.shape:
        raise ValueError(f"shape mismatch {f1.shape} vs {f2.shape}")
    n, h, w, c = f1.shape
    d = max_displacement
    side = 2 * d + 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if w < PACK_MIN_LANES and n > 1:
        # Batch-to-width packing (see _pack_width). The pack/unpack sits
        # OUTSIDE the custom_vjp, so the backward kernels also run on the
        # lane-filled layout and XLA autodiffs the pad/transpose/reshape
        # wrappers (their transposes are slices/transposes — cheap).
        fp1, fp2 = _pack_width(f1, d), _pack_width(f2, d)
        wp = fp1.shape[2]
        # The packed branch keeps the r4 both-directions requirement: the
        # forward _pick_tile estimate under-counts Mosaic's actual kernel
        # stack at packed big-C shapes (measured r5: packed L5
        # bf16[1,128,12,176] compiles to an 18.2M stack vs the 16M scoped
        # limit), and every r4-proven packed config satisfied both checks.
        if (_pick_tile(wp, c, side * side, d,
                       f1.dtype.itemsize) is not None
                and _bwd_tile_fits(wp, c, d, f1.dtype.itemsize)):
            out = _cost_volume_pallas(fp1, fp2, d, interpret, bwd)
            return _unpack_width(out, n, w, d)
    # Dispatch on the FORWARD tile only; when the backward tile overflows
    # VMEM the custom_vjp backward falls back to lax autodiff per
    # direction (_cv_bwd). The old all-or-nothing requirement cost RAFT
    # inference 7.4 ms/frame (profile_r5: its C=128 fine-scale corr
    # failed the backward check and the lax FORWARD's 81 per-channel
    # outputs forced a scalarized 162-way concat).
    # NOTE: standalone microbenchmarks suggest lax wins at small widths
    # (idle lanes), but in the full model routing small levels to lax was
    # measured 25% SLOWER end-to-end on v5e (398 -> 307 fps at Sintel res)
    # — scheduling/fusion effects dominate; keep the kernel everywhere.
    if _pick_tile(w, c, side * side, d, f1.dtype.itemsize) is None:
        from pwcnet_tpu.ops.cost_volume import cost_volume_lax
        return cost_volume_lax(f1, f2, d)
    return _cost_volume_pallas(f1, f2, d, interpret, bwd)
