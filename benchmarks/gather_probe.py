"""Marginal-cost probe of warp sub-stages and gather formulations (TPU).

Finds what actually bounds the warp: the 4-corner table construction, the
row gather's index rate, or the bilinear blend. Methodology identical to
kernel_roofline.py (marginal scan cost).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pwcnet_tpu.ops.warp import warp_bilinear, warp_bilinear_ref
from pwcnet_tpu.ops.pallas.cost_volume_kernel import cost_volume_pallas

SCAN = 10


def bench_marginal(op, *args, iters=10):
    def make(reps):
        @jax.jit
        def f(*a):
            def body(c, _):
                cc = c
                for _ in range(reps):
                    out = op(*[x + cc.astype(x.dtype) for x in a])
                    cc = jnp.max(out).astype(jnp.float32) * 1e-9
                return cc, None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=SCAN)
            return c
        return f

    f1, f2 = make(1), make(2)
    for f in (f1, f2):
        float(f(*args))
    def t(f):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(iters):
                r = f(*args)
            float(r)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best
    return (t(f2) - t(f1)) / SCAN * 1e6  # us per application


def main():
    n, h, w, c = 1, 112, 256, 32   # level-2 Sintel-res shape
    d = 4
    hw = h * w
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    f1 = jax.random.normal(k1, (n, h, w, c), jnp.bfloat16)
    f2 = jax.random.normal(k2, (n, h, w, c), jnp.bfloat16)
    flow = 6.0 * jax.random.normal(k3, (n, h, w, 2), jnp.float32)
    res = {}

    res["warp_full"] = bench_marginal(warp_bilinear, f2, flow)
    res["warp_ref_4gather"] = bench_marginal(warp_bilinear_ref, f2, flow)
    res["corr_pallas"] = bench_marginal(
        functools.partial(cost_volume_pallas, max_displacement=d), f1, f2)
    res["warp_corr_composed"] = bench_marginal(
        lambda a, b, fl: cost_volume_pallas(a, warp_bilinear(b, fl),
                                            max_displacement=d),
        f1, f2, flow)

    # table construction alone
    def table_only(feat):
        fp = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))
        tx = jnp.concatenate([fp, jnp.roll(fp, -1, axis=2)], axis=-1)
        return jnp.concatenate([tx, jnp.roll(tx, -1, axis=1)], axis=-1)

    res["warp_table"] = bench_marginal(table_only, f2)

    # raw row-gathers: vary index count and row width
    for rows_w, tag in (((hw, 4 * c), "28672idx_128ch"),
                        ((hw, c), "28672idx_32ch"),
                        ((hw // 4, 4 * c), "7168idx_128ch")):
        nr, wd = rows_w
        tbl = jax.random.normal(jax.random.key(1), (1, hw + 300, wd),
                                jnp.bfloat16)
        idx = jax.random.randint(jax.random.key(2), (1, nr, 1), 0, hw)
        res[f"gather_{tag}"] = bench_marginal(
            lambda t, i: jnp.take_along_axis(t, i.astype(jnp.int32), axis=1),
            tbl, idx)

    # gather along lanes (channel-first table), idx shared across rows
    tbl_cf = jax.random.normal(jax.random.key(1), (4 * c, hw + 300),
                               jnp.bfloat16)
    idx_l = jax.random.randint(jax.random.key(2), (4 * c, hw), 0, hw)
    res["gather_lanes_cf"] = bench_marginal(
        lambda t, i: jnp.take_along_axis(t, i.astype(jnp.int32), axis=1),
        tbl_cf, idx_l)

    for k, v in res.items():
        print(f"{k:28s} {v:9.2f} us")
    print(json.dumps({k: round(v, 2) for k, v in res.items()}))


if __name__ == "__main__":
    main()
