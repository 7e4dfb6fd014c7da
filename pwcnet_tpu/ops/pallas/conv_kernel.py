"""Pallas TPU conv engine for small-channel convs: width-folded im2col -> MXU.

Why this exists (measured on v5e at the 448x1024 PWC-Net forward):
- XLA's conv lowering collapses to <3 TF/s on the small-channel pyramid
  convs (C in 3..32): with channels riding the 128-wide lane dimension, a
  C=16 conv pads its layout 8x and the C=3 stem conv ~40x, so levels 1-2
  of the feature pyramid cost more than the entire 65-GFLOP decoder.
  (The big estimator/context convs reach ~68 TF/s under XLA — measured at
  parity with the best Pallas formulation we found, so those stay on XLA.)
- This kernel works on a *width-folded* layout: G consecutive image
  columns are packed into the lane dimension, `(N, H, W, C) ->
  (N, H, W/G, G*C)`, so tensors stay 96-128 lanes dense in HBM and VMEM
  no matter how small C is, and the matmul output `(rows*W/G, G*Cout)`
  fills the MXU's lanes.
- Per output group of G columns, the G+kw-1 consecutive input columns its
  packed outputs read are gathered into an extended tensor E (each tap
  one static lane slice); the conv is then kh dots of row-slices of E
  against a scattered weight matrix.

Internals compute a VALID conv; the wrapper pre-pads rows/columns to
reproduce lax 'SAME' semantics exactly. Stride-2 convs are pre-folded
space-to-depth ((H,W,C) -> (H/2+1,W/2+1,4C), channel order (py,px,c)) and
become 2x2-window stride-1 convs; the weight embedding scatters the
logical 3x3 kernel into the folded layout, so the parameter tree and the
math are exactly those of the plain conv.

Gradients: `jax.custom_vjp` whose backward is XLA autodiff of
:func:`conv_ref` — the same convolution, so gradients are exact.

The reference repo has no analog of this file (its convs are cuDNN via
torch.nn.Conv2d, reference ``modules.py:~10-45``); this is TPU-native
infrastructure in the same spirit as its hand-written CUDA correlation
kernel (``correlation_package/correlation_cuda_kernel.cu``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = int(11.5 * 1024 * 1024)
_LANES = 128
_SUBLANES = 8


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Reference XLA implementation (backward, fallback, and test oracle)
# ---------------------------------------------------------------------------

def conv_ref(x: jax.Array, w: jax.Array, b: jax.Array | None, *,
             stride: int = 1, dilation: int = 1,
             slope: float | None = None) -> jax.Array:
    """NHWC 'SAME' conv (+bias, +LeakyReLU when ``slope``) via lax — the
    exact semantics the Pallas path reproduces."""
    # No preferred_element_type: with one, the conv's transpose (backward)
    # mixes f32 cotangents with bf16 weights and lax rejects it. Matches
    # flax nn.Conv(dtype=...) semantics (promote all operands to x.dtype).
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), "SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        out = out + b.astype(x.dtype)
    if slope is not None:
        out = jnp.where(out >= 0, out, jnp.asarray(slope, x.dtype) * out)
    return out


# ---------------------------------------------------------------------------
# Trace-time weight embeddings (tiny; differentiable but only used under
# custom_vjp so they never appear in the backward graph)
# ---------------------------------------------------------------------------

def _embed_s2d(w: jax.Array) -> jax.Array:
    """(3,3,Ci,Co) stride-2 kernel -> (2,2,4Ci,Co) kernel on s2d input.

    lax SAME for stride 2 / kernel 3 on even extents pads (0,1): output y
    reads rows 2y..2y+2 = s2d rows {y (py in 0,1), y+1 (py=0)} -> a 2x2
    VALID window. Folded channel order is (py, px, c).
    """
    kh, kw, ci, co = w.shape
    assert kh == 3 and kw == 3
    out = jnp.zeros((2, 2, 4 * ci, co), w.dtype)
    for u in range(3):
        for v in range(3):
            dy, py = divmod(u, 2)
            dx, px = divmod(v, 2)
            c0 = (py * 2 + px) * ci
            out = out.at[dy, dx, c0:c0 + ci, :].set(w[u, v])
    return out


def _embed_folded(w: jax.Array, g: int) -> jax.Array:
    """(kh,kw,Ci,Co) -> (kh, (G+kw-1)*Ci, G*Co) for the folded matmul.

    E column j' of output group gg holds input column gg*G + j' of the
    pl-left-padded array; output lane (j, co) = unpadded column gg*G + j
    takes its dx tap from E column j' = j + dx.
    """
    kh, kw, ci, co = w.shape
    ecols = g + kw - 1
    out = jnp.zeros((kh, ecols, ci, g, co), w.dtype)
    for j in range(g):
        for dx in range(kw):
            out = out.at[:, j + dx, :, j, :].add(w[:, dx])
    return out.reshape(kh, ecols * ci, g * co)


# ---------------------------------------------------------------------------
# Folded layout helpers (pure reshapes)
# ---------------------------------------------------------------------------

def fold_w(x: jax.Array, g: int) -> jax.Array:
    """(N, H, W, C) -> (N, H, W/G, G*C)."""
    n, h, w, c = x.shape
    return x.reshape(n, h, w // g, g * c)


def unfold_w(x: jax.Array, g: int) -> jax.Array:
    """(N, H, W/G, G*C) -> (N, H, W, C)."""
    n, h, wg, gc = x.shape
    return x.reshape(n, h, wg * g, gc // g)


def _space_to_depth(x: jax.Array) -> jax.Array:
    """(N,H,W,C) -> (N,H/2+1,W/2+1,4C) for the stride-2 VALID 2x2 window
    (lax SAME stride-2 pads (0,1) on even extents -> one extra s2d
    row/column at the bottom/right). Channel order (py, px, c)."""
    n, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, 2), (0, 2), (0, 0)))
    x = x.reshape(n, h // 2 + 1, 2, w // 2 + 1, 2, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        n, h // 2 + 1, w // 2 + 1, 4 * c)


# ---------------------------------------------------------------------------
# Kernel (VALID conv over pre-padded folded input)
# ---------------------------------------------------------------------------

def _kernel_folded(x0_ref, x1_ref, wm_ref, b_ref, out_ref, xs, e_ref, *,
                   tile: int, wg: int, kh: int, kw: int, ci: int,
                   g: int, cof: int, pw_lo: int, slope: float | None):
    erows = tile + kh - 1
    ecols = g + kw - 1
    xs[:tile] = x0_ref[0]
    xs[tile:] = x1_ref[0]
    for j in range(ecols):
        # E column j of output group gg = input column gg*G + j - pw_lo;
        # the input carries one zero pad-group on each side. Within a
        # group, column `lane` occupies lanes [lane*ci, (lane+1)*ci).
        grp, lane = divmod(j - pw_lo + g, g)
        e_ref[:, :, j * ci:(j + 1) * ci] = (
            xs[:erows, grp:grp + wg, lane * ci:(lane + 1) * ci])
    acc = jnp.zeros((tile * wg, cof), jnp.float32)
    for dy in range(kh):
        pm = e_ref[dy:dy + tile].reshape(tile * wg, ecols * ci)
        acc = acc + jnp.dot(pm, wm_ref[dy],
                            preferred_element_type=jnp.float32)
    acc = acc + b_ref[...].astype(jnp.float32)
    if slope is not None:
        acc = jnp.where(acc >= 0, acc, slope * acc)
    out_ref[0] = acc.reshape(tile, wg, cof).astype(out_ref.dtype)


def pick_g(w_out: int, co: int) -> int:
    """Largest power-of-two fold G with G*Co <= 128 lanes and a
    sublane-aligned folded width."""
    g = 1
    while (g < 16 and co * g * 2 <= _LANES and w_out % (g * 2) == 0
           and (w_out // (g * 2)) % _SUBLANES == 0):
        g *= 2
    return g


def _pick_tile(per_row_bytes: int, h_out: int) -> int | None:
    for tile in (32, 16, 8):
        if tile > max(h_out, 8):
            continue
        if tile * per_row_bytes <= _VMEM_BUDGET:
            return tile
    return None


def _conv_folded_impl(x: jax.Array, w: jax.Array, b: jax.Array, *,
                      stride: int, slope: float | None, in_g: int,
                      interpret: bool) -> jax.Array:
    """x: NHWC (in_g=1) or already folded by ``in_g``. Returns folded
    output (N, H_out, W_out/G, G*Co) with G = pick_g(W_out, Co).

    The unfold/s2d/fold/pad prep is pure jnp reshape/transpose/pad — XLA
    fuses it into the single relayout that materializes the kernel
    operand (always >= 96 lanes dense)."""
    kh, kw, ci, co = w.shape
    if in_g > 1:
        x = unfold_w(x, in_g)
    if stride == 2:
        x = _space_to_depth(x)
        w = _embed_s2d(w)
        kh = kw = 2
        h_out = x.shape[1] - 1
        w_out = x.shape[2] - 1
        ci = w.shape[2]
        pl_lo = pw_lo = 0
    else:
        h_out, w_out = x.shape[1], x.shape[2]
        pl_lo = pw_lo = kh // 2  # 3x3 SAME
    n = x.shape[0]
    g = pick_g(w_out, co)
    wg = w_out // g
    cif, cof = g * ci, g * co
    ecols = g + kw - 1
    itemsize = x.dtype.itemsize

    # Columns: one full zero group on the left (the kernel's group
    # arithmetic assumes it), zeros on the right up to wg + 2 total groups
    # (the widest group read is [2, 2 + wg)); then fold.
    x = jnp.pad(x, ((0, 0), (0, 0), (g, (wg + 1) * g - x.shape[2]), (0, 0)))
    xp = x.reshape(n, x.shape[1], wg + 2, cif)

    tile = _pick_tile(
        2 * 2 * (wg + 2) * cif * itemsize          # two blocks, dbl-buffered
        + 2 * (wg + 2) * cif * itemsize            # xs scratch
        + 2 * wg * ecols * ci * itemsize           # E (erows ~ tile + kh)
        + 2 * 2 * wg * cof * itemsize + 2 * wg * cof * 4, h_out)
    if tile is None:
        raise ValueError("folded conv tile does not fit VMEM")
    n_tiles = _cdiv(h_out, tile)
    # Rows: top pad pl_lo; bottom pad so block i+1 is always in range.
    bot = (n_tiles + 1) * tile - xp.shape[1] - pl_lo
    xp = jnp.pad(xp, ((0, 0), (pl_lo, bot), (0, 0), (0, 0)))

    wm = _embed_folded(w, g).astype(x.dtype)
    bf = jnp.tile(b.astype(jnp.float32), g).reshape(1, cof)

    blk = lambda off: pl.BlockSpec(
        (1, tile, wg + 2, cif), lambda bb, i, _o=off: (bb, i + _o, 0, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_folded, tile=tile, wg=wg, kh=kh, kw=kw,
                          ci=ci, g=g, cof=cof, pw_lo=pw_lo, slope=slope),
        out_shape=jax.ShapeDtypeStruct((n, n_tiles * tile, wg, cof),
                                       x.dtype),
        grid=(n, n_tiles),
        in_specs=[
            blk(0), blk(1),
            pl.BlockSpec((kh, ecols * ci, cof), lambda bb, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cof), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, wg, cof),
                               lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2 * tile, wg + 2, cif), x.dtype),
            pltpu.VMEM((tile + kh - 1, wg, ecols * ci), x.dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * h_out * wg * kh * ecols * ci * cof,
            bytes_accessed=(2 * n * h_out * wg * (cif + cof) * itemsize),
            transcendentals=0,
        ),
    )(xp, xp, wm, bf)
    return out[:, :h_out]


# ---------------------------------------------------------------------------
# custom_vjp + public entry
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _conv_folded(x, w, b, stride, slope, in_g, interpret):
    return _conv_folded_impl(x, w, b, stride=stride, slope=slope,
                             in_g=in_g, interpret=interpret)


def _conv_fwd(x, w, b, stride, slope, in_g, interpret):
    return _conv_folded(x, w, b, stride, slope, in_g, interpret), (x, w, b)


def _conv_bwd(stride, slope, in_g, interpret, res, grad):
    x, w, b = res
    co = w.shape[-1]
    w_in = x.shape[2] * in_g
    g = pick_g(w_in // stride, co)

    def ref(xx, ww, bb):
        xx = unfold_w(xx, in_g) if in_g > 1 else xx
        return fold_w(conv_ref(xx, ww, bb, stride=stride, slope=slope), g)

    _, vjp = jax.vjp(ref, x, w, b)
    return vjp(grad)


_conv_folded.defvjp(_conv_fwd, _conv_bwd)


def conv2d_folded(x: jax.Array, w: jax.Array, b: jax.Array, *,
                  stride: int = 1, slope: float | None = None,
                  in_g: int = 1,
                  interpret: bool | None = None) -> jax.Array:
    """'SAME' 3x3 conv + bias (+LeakyReLU) for small channel counts.

    ``x`` is NHWC when ``in_g == 1``, else the folded output of a previous
    call with fold ``in_g``. Returns the output in *folded* layout
    (N, H, W/G, G*Co), G = ``pick_g(W_out, Co)``; use :func:`unfold_w` to
    recover NHWC. Keeping activations folded between consecutive
    small-channel convs is the point — NHWC round-trips reintroduce XLA's
    lane padding.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _conv_folded(x, w, b, stride, slope, in_g, interpret)
