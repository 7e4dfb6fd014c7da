"""Component-level timing of the warp+corr path (VERDICT r1 items #2/#3).

Breaks the level-2/3 warp+correlation into its primitive costs on real TPU:
the XLA gather itself (at several slice widths, to find the index-rate
curve), the 4-corner table construction, the bilinear blend, the Pallas
correlation kernel, and a pure-VPU fma kernel of equivalent arithmetic
(the VPU roofline for the correlation's dot structure).

Run:  python benchmarks/warp_corr_probe.py [--iters 50]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pwcnet_tpu.ops.warp import warp_bilinear
from pwcnet_tpu.ops.cost_volume import cost_volume_lax
from pwcnet_tpu.ops.pallas.cost_volume_kernel import cost_volume_pallas


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--level", type=int, default=2)
    args = ap.parse_args()

    # Sintel-res pyramid shapes (448x1024 input).
    shapes = {2: (1, 112, 256, 32), 3: (1, 56, 128, 64)}
    n, h, w, c = shapes[args.level]
    d = 4
    key = jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    f1 = jax.random.normal(k1, (n, h, w, c), jnp.bfloat16)
    f2 = jax.random.normal(k2, (n, h, w, c), jnp.bfloat16)
    flow = 6.0 * jax.random.normal(k3, (n, h, w, 2), jnp.float32)
    res = {}

    # --- full ops ---
    res["warp_full_us"] = timeit(jax.jit(warp_bilinear), f2, flow,
                                 iters=args.iters)
    res["corr_pallas_us"] = timeit(
        jax.jit(functools.partial(cost_volume_pallas, max_displacement=d)),
        f1, f2, iters=args.iters)
    res["corr_lax_us"] = timeit(
        jax.jit(functools.partial(cost_volume_lax, max_displacement=d)),
        f1, f2, iters=args.iters)
    res["warp_corr_composed_us"] = timeit(
        jax.jit(lambda a, b, fl: cost_volume_pallas(
            a, warp_bilinear(b, fl), max_displacement=d)),
        f1, f2, flow, iters=args.iters)

    # --- gather-only at several slice widths (index-rate curve) ---
    # Gather HW rows of `width` channels from a (HW_src, width) table.
    hw = h * w
    for width in (32, 64, 128, 256):
        tbl = jax.random.normal(jax.random.key(1), (1, hw, width),
                                jnp.bfloat16)
        idx = jax.random.randint(jax.random.key(2), (1, hw, 1), 0, hw)

        def g(t, i):
            return jnp.take_along_axis(t, i, axis=1)

        res[f"gather_{width}ch_us"] = timeit(jax.jit(g), tbl, idx,
                                             iters=args.iters)

    # Fewer indices, wider rows (constant total bytes = hw * 64 ch):
    for frac, width in ((1, 64), (2, 128), (4, 256), (8, 512)):
        rows = hw // frac
        tbl = jax.random.normal(jax.random.key(1), (1, rows, width),
                                jnp.bfloat16)
        idx = jax.random.randint(jax.random.key(2), (1, rows, 1), 0, rows)

        def g(t, i):
            return jnp.take_along_axis(t, i, axis=1)

        res[f"gather_{rows}idx_{width}ch_us"] = timeit(
            jax.jit(g), tbl, idx, iters=args.iters)

    # --- warp sub-stages ---
    def table_only(feat):
        fp = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))
        tx = jnp.concatenate([fp, jnp.roll(fp, -1, axis=2)], axis=-1)
        txy = jnp.concatenate([tx, jnp.roll(tx, -1, axis=1)], axis=-1)
        return txy.reshape(n, (h + 2) * (w + 2), 4 * c)

    res["warp_table_us"] = timeit(jax.jit(table_only), f2, iters=args.iters)

    flat = table_only(f2)
    idx = jax.random.randint(jax.random.key(3), (n, hw, 1), 0,
                             (h + 2) * (w + 2))
    res["warp_gather4c_us"] = timeit(
        jax.jit(lambda t, i: jnp.take_along_axis(t, i, axis=1)), flat, idx,
        iters=args.iters)

    # --- VPU roofline for the corr dot: same fma count, no shifts ---
    # corr does 81 taps x C fma per pixel. Equivalent streaming fma kernel:
    side2 = (2 * d + 1) ** 2

    def fma_kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros(o_ref.shape, jnp.float32)
        av = a_ref[...]
        bv = b_ref[...]
        for k in range(side2):
            acc += jnp.sum(av * bv, axis=0, dtype=jnp.float32)
        o_ref[...] = acc.astype(o_ref.dtype)

    a_cf = jnp.transpose(f1, (0, 3, 1, 2))[0]
    b_cf = jnp.transpose(f2, (0, 3, 1, 2))[0]

    def vpu_fma(a, b):
        return pl.pallas_call(
            fma_kernel,
            out_shape=jax.ShapeDtypeStruct((h, w), jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    res["vpu_fma_equiv_us"] = timeit(jax.jit(vpu_fma), a_cf, b_cf,
                                     iters=args.iters)
    res["fma_count_g"] = side2 * c * h * w / 1e9

    # f32 variant of the same
    res["vpu_fma_equiv_f32_us"] = timeit(
        jax.jit(vpu_fma), a_cf.astype(jnp.float32).astype(jnp.bfloat16),
        b_cf, iters=args.iters)

    for k, v in res.items():
        print(f"{k:36s} {v:10.2f}")
    print(json.dumps({"level": args.level, **{k: round(v, 2)
                                              for k, v in res.items()}}))


if __name__ == "__main__":
    main()
