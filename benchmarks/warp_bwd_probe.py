"""Warp-backward alternatives on the real chip (VERDICT r4 next #1).

The L2 train-shape warp backward is an XLA scatter-add measured at 931 us
(~12x off HBM speed-of-light; profile_r4.md). A truly scatter-free Pallas
backward needs a static bound on |flow| (the inverse windows are
flow-bounded) which PWC/RAFT warps do not have, so the exact candidates
are reassociations of the same scatter (ops/warp.py WARP_BWD):

  autodiff : XLA's default gather-VJP scatter (r1-r4 behavior)
  scatter  : explicit scatter-add, promise_in_bounds, i32 indices
  sorted   : per-image argsort + permutation gather + sorted segment-sum

Phase 1 times the isolated warp VJP per decoder level (the scatter
dominates); phase 2 interleaves full train steps A/B/C per rep (the
promotion methodology: process fps varies +/-1.5-3%, interleaving
cancels it; isolated-op rankings have flipped sign end-to-end before —
see stem_backward_r3.md).

Usage: python benchmarks/warp_bwd_probe.py [--reps 20] [--skip-train]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Train-shape warp sites: (level, h, w, c) at 384x448 batch 8; flow at
# level l has magnitude ~ flow_scale/2^l * O(1) — use +/-8 px, matching
# the trained-model regime.
LEVELS = ((2, 96, 112, 32), (3, 48, 56, 64), (4, 24, 28, 96))
BATCH = 8


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-isolated", action="store_true")
    ap.add_argument("--skip-infer", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/pwcnet_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pwcnet_tpu.ops import warp as warp_mod

    rng = np.random.default_rng(0)
    impls = ("autodiff", "scatter", "sorted")
    report = {"levels": {}, "train": None}

    if not args.skip_isolated:
        for level, h, w, c in LEVELS:
            feat = jnp.asarray(rng.standard_normal((BATCH, h, w, c)),
                               jnp.bfloat16)
            flow = jnp.asarray(rng.standard_normal((BATCH, h, w, 2)) * 8,
                               jnp.float32)
            ct = jnp.asarray(rng.standard_normal((BATCH, h, w, c)),
                             jnp.bfloat16)
            fns = {}
            for impl in impls:
                warp_mod.WARP_BWD = impl

                @jax.jit
                def bwd(feat, flow, ct):
                    _, vjp = jax.vjp(warp_mod.warp_bilinear, feat, flow)
                    gf, gl = vjp(ct)
                    return (jnp.sum(gf.astype(jnp.float32))
                            + jnp.sum(gl))
                r = bwd(feat, flow, ct)
                float(r)
                fns[impl] = bwd
                print(f"compiled L{level} {impl}", flush=True)
            warp_mod.WARP_BWD = "autodiff"
            times = {k: [] for k in impls}
            for rep in range(args.reps):
                for impl, fn in fns.items():
                    t0 = time.perf_counter()
                    for _ in range(args.iters):
                        r = fn(feat, flow, ct)
                    float(r)
                    times[impl].append(
                        (time.perf_counter() - t0) / args.iters)
            row = {}
            for impl, ts in times.items():
                us = float(np.median(np.asarray(ts[2:])) * 1e6)
                row[impl] = us
                print(f"L{level} {impl}: {us:.1f} us/call "
                      f"(fwd+bwd, {BATCH}x{h}x{w}x{c})", flush=True)
            report["levels"][f"L{level}"] = row

    if not args.skip_infer:
        # Headline-graph A/B of the corner-extraction formulation (the
        # inference profile has 146 us of layout copies; VERDICT #9).
        from pwcnet_tpu.models import PWCNet

        model = PWCNet(corr_backend="pallas", dtype=jnp.bfloat16)
        h, w = 448, 1024
        i1 = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)
        i2 = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)
        iparams = jax.jit(model.init)(jax.random.key(0), i1, i2)
        ifns = {}
        for split in ("reshape5d", "slice"):
            warp_mod.WARP_SPLIT = split

            @jax.jit
            def infer(params, a, b):
                flows = model.apply(params, a, b, train=False)
                return jnp.sum(model.full_res_flow(flows, (h, w)))
            float(infer(iparams, i1, i2))
            ifns[split] = infer
            print(f"compiled infer {split}", flush=True)
        warp_mod.WARP_SPLIT = "reshape5d"
        itimes = {k: [] for k in ifns}
        for rep in range(args.reps):
            for split, fn in ifns.items():
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    r = fn(iparams, i1, i2)
                float(r)
                itimes[split].append((time.perf_counter() - t0) / args.iters)
        report["infer"] = {}
        for split, ts in itimes.items():
            us = float(np.median(np.asarray(ts[2:])) * 1e6)
            report["infer"][split] = us
            print(f"infer {split}: {us:.1f} us/frame", flush=True)

    if not args.skip_train:
        from pwcnet_tpu.models import PWCNet
        from pwcnet_tpu.train.schedule import S_LONG, make_optimizer
        from pwcnet_tpu.train.state import TrainState
        from pwcnet_tpu.train.step import make_train_step

        bh, bw, bs = 384, 448, 8
        batch = {
            "im1": jnp.asarray(rng.random((bs, bh, bw, 3)), jnp.float32),
            "im2": jnp.asarray(rng.random((bs, bh, bw, 3)), jnp.float32),
            "flow": jnp.asarray(rng.standard_normal((bs, bh, bw, 2)),
                                jnp.float32),
            "valid": jnp.ones((bs, bh, bw), jnp.float32),
        }
        model = PWCNet(corr_backend="pallas", dtype=jnp.bfloat16)
        tx = make_optimizer(S_LONG)
        params = jax.jit(model.init)(
            jax.random.key(0), batch["im1"][:1], batch["im2"][:1])
        variants = {}
        # (name, WARP_BWD, WARP_SPLIT): the bwd scatter candidates plus
        # the corner-extraction reformulation that targets the profile's
        # T(4,128) relayout copies (exact in all combinations).
        combos = (("base", "autodiff", "reshape5d"),
                  ("scatter", "scatter", "reshape5d"),
                  ("sorted", "sorted", "reshape5d"),
                  ("slice", "autodiff", "slice"),
                  ("scatter_slice", "scatter", "slice"))
        for name, impl, split in combos:
            warp_mod.WARP_BWD = impl
            warp_mod.WARP_SPLIT = split
            step = make_train_step(model, tx, aug=None)
            own = jax.tree_util.tree_map(jnp.copy, params)
            state = TrainState.create(own, tx, jax.random.key(1))
            state, m = step(state, batch)
            float(m["loss"])
            variants[name] = (step, state)
            print(f"compiled train {name}", flush=True)
        warp_mod.WARP_BWD = "autodiff"
        warp_mod.WARP_SPLIT = "reshape5d"
        for name, (step, state) in variants.items():  # second warm pass
            state, m = step(state, batch)
            float(m["loss"])
            variants[name] = (step, state)
        CHAIN = 5
        times = {k: [] for k in variants}
        for rep in range(args.reps):
            for name, (step, state) in variants.items():
                t0 = time.perf_counter()
                for _ in range(CHAIN):
                    state, m = step(state, batch)
                float(m["loss"])
                times[name].append((time.perf_counter() - t0) / CHAIN)
                variants[name] = (step, state)
        out = {}
        for name, ts in times.items():
            ts = np.asarray(ts[2:]) * 1e3
            out[name] = {"ms_median": float(np.median(ts)),
                         "ms_mean": float(ts.mean()),
                         "ms_std": float(ts.std())}
            print(f"train {name}: median {np.median(ts):.2f} ms "
                  f"mean {ts.mean():.2f}±{ts.std():.2f}", flush=True)
        report["train"] = {"batch": [bs, bh, bw], "chain": CHAIN,
                           "variants": out}

    path = os.path.join(os.path.dirname(__file__), "results",
                        "warp_bwd_r5.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
