"""Space-to-batch vs native dilated conv for the dil-16 context layer.

profile_r4 spot-check: context ConvBlock_4 (96->64ch, dilation 16,
112x256) runs at 21% of MXU peak (74.7 us vs 16.1 SoL) while its dil-2/4
siblings hit 85-89%. Hypothesis: XLA's native dilated conv shreds the
MXU at dil=16; the classic space-to-batch re-expression (d^2 phase
images, dense 3x3 conv, inverse gather) restores dense-conv efficiency.

Exactness: with H, W divisible by d and SAME zero padding, phase-domain
SAME padding reproduces the dilated conv's taps exactly (asserted before
timing). Also times the dil-8 layer (96ch, 112x256) for the crossover.

Usage: python benchmarks/dilconv_probe.py [--reps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def dilated_ref(x, w, dil):
    import jax
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dil, dil),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dilated_s2b(x, w, dil):
    """Space-to-batch: phases become batch, conv densifies."""
    import jax
    import jax.numpy as jnp

    n, h, wd, c = x.shape
    hb, wb = h // dil, wd // dil
    xp = x.reshape(n, hb, dil, wb, dil, c)
    xp = xp.transpose(0, 2, 4, 1, 3, 5).reshape(n * dil * dil, hb, wb, c)
    y = jax.lax.conv_general_dilated(
        xp, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    co = y.shape[-1]
    y = y.reshape(n, dil, dil, hb, wb, co).transpose(0, 3, 1, 4, 2, 5)
    return y.reshape(n, h, wd, co)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/pwcnet_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    report = {}
    # (name, H, W, cin, cout, dil) — the two weakest context layers at
    # the 448x1024 headline's level-2 resolution.
    cases = (("dil16_96to64", 112, 256, 96, 64, 16),
             ("dil8_128to96", 112, 256, 128, 96, 8))
    for name, h, wd, ci, co, dil in cases:
        x = jnp.asarray(rng.standard_normal((1, h, wd, ci)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((3, 3, ci, co)) * 0.05,
                        jnp.bfloat16)
        a = np.asarray(dilated_ref(x, w, dil), np.float32)
        b = np.asarray(dilated_s2b(x, w, dil), np.float32)
        err = np.abs(a - b).max()
        print(f"{name}: max |diff| {err:.3e}", flush=True)
        assert err < 0.1

        fns = {}
        for label, fn in (("native", dilated_ref), ("s2b", dilated_s2b)):
            jf = jax.jit(lambda x, w, fn=fn: jnp.sum(
                fn(x, w, dil).astype(jnp.float32)))
            float(jf(x, w))
            fns[label] = jf
        times = {k: [] for k in fns}
        for rep in range(args.reps):
            for label, fn in fns.items():
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    r = fn(x, w)
                float(r)
                times[label].append((time.perf_counter() - t0) / args.iters)
        row = {}
        for label, ts in times.items():
            us = float(np.median(np.asarray(ts[2:])) * 1e6)
            row[label] = us
            print(f"{name} {label}: {us:.1f} us", flush=True)
        report[name] = row

    # ---- end-to-end interleaved A/B: the model flag (context_s2b) ----
    # Isolated-op rankings have flipped in the full graph before (stem
    # backward, r4); the promotion decision uses these numbers.
    from pwcnet_tpu.models import PWCNet
    from pwcnet_tpu.train.schedule import S_LONG, make_optimizer
    from pwcnet_tpu.train.state import TrainState
    from pwcnet_tpu.train.step import make_train_step

    ih, iw = 448, 1024
    i1 = jnp.asarray(rng.random((1, ih, iw, 3)), jnp.float32)
    i2 = jnp.asarray(rng.random((1, ih, iw, 3)), jnp.float32)
    infer = {}
    for label, flag in (("native", False), ("s2b", True)):
        m = PWCNet(corr_backend="pallas", context_s2b=flag,
                   dtype=jnp.bfloat16)
        p = jax.jit(m.init)(jax.random.key(0), i1, i2)
        fn = jax.jit(lambda p, a, b, m=m: jnp.sum(
            m.full_res_flow(m.apply(p, a, b, train=False), (ih, iw))))
        float(fn(p, i1, i2))
        infer[label] = (fn, p)
        print(f"compiled e2e infer/{label}", flush=True)
    CHAIN = 16
    times = {k: [] for k in infer}
    for rep in range(args.reps):
        for label, (fn, p) in infer.items():
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                r = fn(p, i1, i2)
            float(r)
            times[label].append((time.perf_counter() - t0) / CHAIN)
    report["e2e_inference_448x1024_b1"] = {
        k: {"us_median": float(np.median(np.asarray(ts[2:])) * 1e6)}
        for k, ts in times.items()}
    for k, v in report["e2e_inference_448x1024_b1"].items():
        print(f"e2e infer {k}: {v['us_median']:.0f} us", flush=True)

    bh, bw, bs = 384, 448, 8
    batch = {
        "im1": jnp.asarray(rng.random((bs, bh, bw, 3)), jnp.float32),
        "im2": jnp.asarray(rng.random((bs, bh, bw, 3)), jnp.float32),
        "flow": jnp.asarray(rng.standard_normal((bs, bh, bw, 2)),
                            jnp.float32),
        "valid": jnp.ones((bs, bh, bw), jnp.float32),
    }
    tx = make_optimizer(S_LONG)
    train = {}
    for label, flag in (("native", False), ("s2b", True)):
        m = PWCNet(corr_backend="pallas", context_s2b=flag,
                   dtype=jnp.bfloat16)
        p = jax.jit(m.init)(jax.random.key(0), batch["im1"][:1],
                            batch["im2"][:1])
        step = make_train_step(m, tx, aug=None)
        state = TrainState.create(p, tx, jax.random.key(1))
        state, mm = step(state, batch)
        float(mm["loss"])
        train[label] = (step, state)
        print(f"compiled e2e train/{label}", flush=True)
    CHAIN = 5
    times = {k: [] for k in train}
    for rep in range(args.reps):
        for label, (step, state) in train.items():
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                state, mm = step(state, batch)
            float(mm["loss"])
            times[label].append((time.perf_counter() - t0) / CHAIN)
            train[label] = (step, state)
    report["e2e_train_384x448_b8"] = {
        k: {"ms_median": float(np.median(np.asarray(ts[2:])) * 1e3)}
        for k, ts in times.items()}
    for k, v in report["e2e_train_384x448_b8"].items():
        print(f"e2e train {k}: {v['ms_median']:.2f} ms", flush=True)

    out = os.path.join(os.path.dirname(__file__), "results",
                       "dilconv_r5.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
