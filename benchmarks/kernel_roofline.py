"""Correlation-kernel roofline: effective bandwidth / FLOPs vs hardware
ceilings at every PWC-Net pyramid-level shape (BASELINE.json north-star
"warp+corr kernel GB/s").

Run on TPU:  python benchmarks/kernel_roofline.py [--input H W]

Methodology note (remote-TPU tunnel): ``block_until_ready`` does not hard
-sync and any host fetch costs a ~28 ms round trip, so every timed figure
dispatches many iterations and fetches one scalar at the end
(see bench.py).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# v5e per-chip ceilings (public figures).
HBM_GBPS = 819.0
BF16_TFLOPS = 197.0


def bench_scalar(fn, *args, inner=20, outer=10, warmup=2):
    """Per-invocation time with dispatch overhead amortized away.

    Each jit call runs ``inner`` kernel invocations under ``lax.scan`` over
    ``inner`` *distinct* inputs (stacked leading axis; distinct data stops
    XLA from CSE-ing the repeats), so the ~0.5 ms per-dispatch floor of
    the remote-TPU tunnel divides by ``inner``.
    """
    import jax
    import jax.numpy as jnp

    stacked = tuple(
        jnp.stack([a + (i % 7) * 1e-3 for i in range(inner)])
        for a in args)

    @jax.jit
    def f(*st):
        def body(acc, xs):
            return acc + jnp.sum(fn(*xs).astype(jnp.float32)), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), st)
        return acc

    for _ in range(warmup):
        r = f(*stacked)
    float(r)
    t0 = time.perf_counter()
    for _ in range(outer):
        r = f(*stacked)
    float(r)
    return (time.perf_counter() - t0) / (outer * inner)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", nargs=2, type=int, default=(448, 1024),
                    help="full-res input H W (Sintel-padded default)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--d", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pwcnet_tpu.models.pwcnet import DEFAULT_PYRAMID_CHANNELS
    from pwcnet_tpu.ops.cost_volume import cost_volume_lax
    from pwcnet_tpu.ops.pallas.cost_volume_kernel import cost_volume_pallas
    from pwcnet_tpu.ops.warp import warp_bilinear

    rng = np.random.default_rng(0)
    h0, w0 = args.input
    d = args.d
    side2 = (2 * d + 1) ** 2
    rows = []
    # Model levels: num_levels .. num_levels-output_level (6..2 default).
    for level in range(2, 7):
        c = DEFAULT_PYRAMID_CHANNELS[level - 1]
        h, w = h0 >> level, w0 >> level
        shape = (args.batch, h, w, c)
        f1 = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        f2 = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        flow = jnp.asarray(rng.standard_normal(
            (args.batch, h, w, 2)) * 3, jnp.float32)

        t_pal = bench_scalar(
            jax.jit(lambda a, b: cost_volume_pallas(a, b)), f1, f2)
        t_lax = bench_scalar(
            jax.jit(lambda a, b: cost_volume_lax(a, b)), f1, f2)
        t_warp = bench_scalar(
            jax.jit(lambda a, b: warp_bilinear(a, b)), f2, flow)

        n_px = args.batch * h * w
        bytes_min = n_px * c * 2 * 2 + n_px * side2 * 2  # f1+f2 in, corr out
        flops = 2 * n_px * side2 * c
        rows.append({
            "level": level, "shape": list(shape),
            "corr_pallas_us": round(t_pal * 1e6, 1),
            "corr_lax_us": round(t_lax * 1e6, 1),
            "warp_us": round(t_warp * 1e6, 1),
            "corr_eff_gbps": round(bytes_min / t_pal / 1e9, 1),
            "corr_pct_hbm_sol": round(100 * bytes_min / t_pal / 1e9
                                      / HBM_GBPS, 1),
            "corr_tflops": round(flops / t_pal / 1e12, 2),
        })

    total_pal = sum(r["corr_pallas_us"] for r in rows)
    total_lax = sum(r["corr_lax_us"] for r in rows)
    print(json.dumps({
        "device": str(jax.devices()[0]),
        "input_hw": [h0, w0],
        "levels": rows,
        "corr_total_us": {"pallas": round(total_pal, 1),
                          "lax": round(total_lax, 1),
                          "speedup": round(total_lax / total_pal, 2)},
        "note": ("per-level timings include one fixed dispatch overhead "
                 "each; totals overstate in-model cost accordingly"),
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
