"""Measure the channel-expanded im2col stem layout family (VERDICT r4
weak #5 / next #6).

profile_r4.md dismissed "im2col with C>=128" in one sentence after the
in-VMEM tap-merge probe wedged the Mosaic compiler (16-lane scratch
writes; axon-compile-wedge protocol). This measures the family at the
level that carries NO wedge risk: XLA-materialized patch tensors
(concat of 9 shifted slices -> one K=27..288 matmul per conv). That is
the layout family's realistic bound without in-VMEM patch construction:

  - K fills the MXU contraction dim (27/144/144/288 vs the Pallas
    stem's padded 54-192 at ~29% of padded peak), but
  - patches cost 9x the activation HBM traffic (conv2: ~33 MB/img).

Variants (stem-only fwd and fwd+bwd, 2 images of the bench headline
frame, bf16): 'pallas' (production kernel), 'xla_conv' (stem_ref),
'im2col'. Exactness of im2col vs stem_ref is asserted before timing.

Usage: python benchmarks/stem_im2col_r5.py [--reps 20] [--hw 448 1024]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _im2col_conv(x, w, b, stride=1, slope=0.1):
    """3x3 'SAME' conv as patch-concat + one matmul (K = 9*Cin)."""
    import jax.numpy as jnp

    n, h, wd, ci = x.shape
    kh, kw, _, co = w.shape
    pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = []
    for dy in range(kh):
        for dx in range(kw):
            cols.append(pad[:, dy:dy + h:stride, dx:dx + wd:stride, :])
    patches = jnp.concatenate(cols, axis=-1)          # (n, h/s, w/s, 9ci)
    wm = w.reshape(kh * kw * ci, co)
    y = jnp.einsum("nhwk,kc->nhwc", patches, wm) + b
    return jnp.where(y >= 0, y, slope * y).astype(x.dtype)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--hw", type=int, nargs=2, default=(448, 1024))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/pwcnet_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pwcnet_tpu.ops.pallas.stem_kernel import stem_pallas, stem_ref

    rng = np.random.default_rng(0)
    h, w = args.hw
    # 2 images = the production batched-extractor layout at batch 1.
    x = jnp.asarray(rng.random((2, h, w, 3)), jnp.bfloat16)
    dt = jnp.bfloat16
    params = []
    for ci, co in ((3, 16), (16, 16), (16, 32), (32, 32)):
        params.append((jnp.asarray(rng.standard_normal((3, 3, ci, co))
                                   * 0.05, dt),
                       jnp.asarray(rng.standard_normal((co,)) * 0.01, dt)))

    def stem_im2col(x, params):
        (w1, b1), (w2, b2), (w3, b3), (w4, b4) = params
        y = _im2col_conv(x, w1, b1, stride=2)
        y = _im2col_conv(y, w2, b2)
        y = _im2col_conv(y, w3, b3, stride=2)
        return _im2col_conv(y, w4, b4)

    fns = {"pallas": stem_pallas, "xla_conv": stem_ref,
           "im2col": stem_im2col}

    # Exactness: im2col vs the XLA conv chain (same math, reassociated).
    a = np.asarray(stem_ref(x, params), np.float32)
    bq = np.asarray(stem_im2col(x, params), np.float32)
    err = np.abs(a - bq).max()
    print(f"im2col vs xla_conv max |diff| = {err:.2e}", flush=True)
    assert err < 0.1, "im2col formulation mismatch"

    report = {"hw": [h, w], "fwd_us": {}, "fwdbwd_us": {}}
    jfns, gfns = {}, {}
    for name, fn in fns.items():
        jf = jax.jit(lambda x, p, fn=fn: jnp.sum(
            fn(x, p).astype(jnp.float32)))
        float(jf(x, params))
        jfns[name] = jf

        def loss(x, p, fn=fn):
            return jnp.sum(fn(x, p).astype(jnp.float32) ** 2)
        jg = jax.jit(jax.grad(loss, argnums=(0, 1)))
        gx, gp = jg(x, params)
        float(jnp.sum(gx.astype(jnp.float32)))
        gfns[name] = jg
        print(f"compiled {name}", flush=True)

    for phase, table in (("fwd", jfns), ("fwdbwd", gfns)):
        times = {k: [] for k in table}
        for rep in range(args.reps):
            for name, fn in table.items():
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    r = fn(x, params)
                if phase == "fwd":
                    float(r)
                else:
                    float(jnp.sum(r[0].astype(jnp.float32)))
                times[name].append((time.perf_counter() - t0) / args.iters)
        for name, ts in times.items():
            us = float(np.median(np.asarray(ts[2:])) * 1e6)
            report[f"{phase}_us"][name] = us
            print(f"{phase} {name}: {us:.1f} us", flush=True)

    out = os.path.join(os.path.dirname(__file__), "results",
                       "stem_im2col_r5.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
