"""What bounds the correlation kernel: decomposition experiments (VERDICT
r2 missing #3 / r1 next #3).

The "HBM speed-of-light" framing in the roofline is the wrong ceiling for
this op: at d=4 the correlation performs 2*(2d+1)^2*C flops per pixel
while reading 2*C*2 bytes and writing (2d+1)^2*2 bytes — an arithmetic
intensity of ~18 flops/byte at C=32 against a v5e VPU:HBM balance point
of ~5 flops/byte. The op is **VPU-compute-bound**, and its channel
reduction cannot ride the MXU (each output pixel dots its own private
pair of C-vectors; there is no shared operand to feed the systolic
array, exactly as in the reference's CUDA kernel, which also uses plain
per-thread MACs — ``correlation_cuda_kernel.cu`` per SURVEY.md §2).

This script times structural variants of the production kernel at the
level-2 shape to decompose where the time goes:

  full     production kernel (9 dx lane-rotations into scratch, 81
           dy-sliced multiply-reduces, f32 accumulate, bf16 out)
  norot    single rotation reused for all dx (WRONG numerics; isolates
           the cost of the 8 extra per-dx rotations)
  macfloor single rotation AND single dy slice reused for all 81 taps
           (WRONG numerics; the pure multiply-reduce + out-write floor
           of this loop structure — the achievable "speed of light")

and prints the analytic bounds next to them.

Run on TPU: python benchmarks/corr_limit.py
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0
# v5e VPU: 8 sublanes x 128 lanes x 4 ALUs at ~0.94 GHz ~= 3.85 Top/s
# (f32 elementwise ops; an FMA that retires mul+add in one op would double
# the effective rate — Mosaic's actual schedule sits between the two).
VPU_TOPS = 3.85


def main() -> int:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache = os.path.expanduser("~/.cache/pwcnet_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)

    from benchmarks.kernel_roofline import bench_marginal
    from pwcnet_tpu.ops.pallas.cost_volume_kernel import (
        _cdiv, _pad_rows, _pick_tile, _to_cf, _from_cf)

    d = 4
    side = 2 * d + 1
    n, h, w, c = 1, 112, 256, 32  # PWC level 2 at Sintel res
    rng = np.random.default_rng(0)
    f1 = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)
    f2 = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)

    def kernel(f1_ref, f2a_ref, f2b_ref, out_ref, f2x, *, tile, mode):
        inv_c = jnp.float32(1.0 / c)
        f1b = f1_ref[0]
        if mode == "macfloor":
            f2x[:, :tile, :] = f2a_ref[0, :, :, 0:w]
            f2x[:, tile:, :] = f2b_ref[0, :, :, 0:w]
            sl = f2x[:, 0:tile, :]
            for k in range(side * side):
                out_ref[0, k] = (jnp.sum(f1b * sl, axis=0,
                                         dtype=jnp.float32)
                                 * inv_c).astype(out_ref.dtype)
            return
        if mode == "norot":
            f2x[:, :tile, :] = f2a_ref[0, :, :, 0:w]
            f2x[:, tile:, :] = f2b_ref[0, :, :, 0:w]
        for dx in range(side):
            if mode == "full":
                f2x[:, :tile, :] = f2a_ref[0, :, :, dx:dx + w]
                f2x[:, tile:, :] = f2b_ref[0, :, :, dx:dx + w]
            for dy in range(side):
                out_ref[0, dy * side + dx] = (
                    jnp.sum(f1b * f2x[:, dy:dy + tile, :], axis=0,
                            dtype=jnp.float32) * inv_c).astype(out_ref.dtype)

    def launch(mode):
        def run(a, b):
            itemsize = a.dtype.itemsize
            tile = _pick_tile(w, c, side * side, d, itemsize)
            n_tiles = _cdiv(h, tile)
            f1cf = _to_cf(a)
            f2cf = _pad_rows(_to_cf(b), d, tile, n_tiles, h)
            wp = w + 2 * d
            halo = lambda off: pl.BlockSpec(
                (1, c, tile, wp), lambda bb, i, _o=off: (bb, 0, i + _o, 0),
                memory_space=pltpu.VMEM)
            out = pl.pallas_call(
                functools.partial(kernel, tile=tile, mode=mode),
                out_shape=jax.ShapeDtypeStruct((n, side * side, h, w),
                                               a.dtype),
                grid=(n, n_tiles),
                in_specs=[pl.BlockSpec((1, c, tile, w),
                                       lambda bb, i: (bb, 0, i, 0),
                                       memory_space=pltpu.VMEM),
                          halo(0), halo(1)],
                out_specs=pl.BlockSpec((1, side * side, tile, w),
                                       lambda bb, i: (bb, 0, i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((c, 2 * tile, w), a.dtype)],
            )(f1cf, f2cf, f2cf)
            return _from_cf(out)
        return run

    # --- MXU band-diagonal formulation (VERDICT r3 missing #4): per dy,
    # batched row matmuls (W, C) @ (C, W+2d) on the MXU, then extract the
    # 9-wide diagonal band. Extraction uses the flat-stride trick:
    # P[x, x+dx] has flat index x*(W+2d) + x + dx = x*(W+2d+1) + dx, so a
    # reshape to row-stride W+2d+1 makes the band the first ``side``
    # columns — no gather, just pad+reshape (XLA lowers it to one
    # relayout). Computes W/(2d+1) ~ 28x more MACs than needed; the
    # question the analysis could not settle is whether MXU rate + cheap
    # extraction beats the VPU kernel doing only the useful MACs.
    def corr_banded_mxu(a, b):
        f2p = jnp.pad(b, ((0, 0), (d, d), (d, d), (0, 0)))
        wp2 = w + 2 * d
        outs = []
        for dy in range(side):
            f2w = jax.lax.slice_in_dim(f2p, dy, dy + h, axis=1)
            p = jnp.einsum("nhxc,nhyc->nhxy", a, f2w,
                           preferred_element_type=jnp.float32)
            pf = p.reshape(n, h, w * wp2)
            pf = jnp.pad(pf, ((0, 0), (0, 0), (0, w)))
            band = pf.reshape(n, h, w, wp2 + 1)[..., :side]
            outs.append(band)
        return (jnp.concatenate(outs, axis=-1) / c).astype(a.dtype)

    # Numeric check vs the composed lax reference before timing (jitted:
    # eager op-by-op dispatch through the axon tunnel compiles each tiny
    # op separately and effectively hangs).
    from pwcnet_tpu.ops.cost_volume import cost_volume_lax
    ref = np.asarray(jax.jit(
        lambda a, b: cost_volume_lax(a, b, d))(f1, f2), np.float32)
    got = np.asarray(jax.jit(corr_banded_mxu)(f1, f2), np.float32)
    band_err = float(np.abs(ref - got).max())
    assert band_err < 0.05, band_err  # bf16 product tolerance

    times = {m: bench_marginal(launch(m), f1, f2)
             for m in ("full", "norot", "macfloor")}
    times["mxu_band"] = bench_marginal(jax.jit(corr_banded_mxu), f1, f2)
    from pwcnet_tpu.ops.cost_volume import cost_volume_lax as _cvl
    times["lax_composed"] = bench_marginal(
        jax.jit(lambda a, b: _cvl(a, b, d)), f1, f2)

    n_px = n * h * w
    flops = 2 * n_px * side * side * c          # mul + add per tap-channel
    bytes_min = n_px * c * 2 * 2 + n_px * side * side * 2
    t_vpu_2op = flops / (VPU_TOPS * 1e12)       # mul and add separate ops
    t_vpu_fma = t_vpu_2op / 2                   # ideal fused mul-add
    t_hbm = bytes_min / (HBM_GBPS * 1e9)

    out = {
        "device": str(jax.devices()[0]),
        "shape": [n, h, w, c], "d": d,
        "measured_us": {k: round(v * 1e6, 1) for k, v in times.items()},
        "mxu_band_max_abs_err_vs_lax": band_err,
        "derived_us": {
            "rotation_cost": round((times["full"] - times["norot"]) * 1e6,
                                   1),
            "dy_slice_cost": round((times["norot"] - times["macfloor"])
                                   * 1e6, 1),
        },
        "bounds_us": {
            "vpu_2op": round(t_vpu_2op * 1e6, 1),
            "vpu_fma": round(t_vpu_fma * 1e6, 1),
            "hbm": round(t_hbm * 1e6, 1),
        },
        "arithmetic_intensity_flops_per_byte": round(flops / bytes_min, 1),
        "vpu_balance_flops_per_byte": round(VPU_TOPS * 1e12
                                            / (HBM_GBPS * 1e9), 1),
    }
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
