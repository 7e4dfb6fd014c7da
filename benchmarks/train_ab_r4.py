"""Interleaved A/B of train-step variants on the real chip (r4).

Variants (each its own jitted step; reps alternate A/B/A/B... in one
process per the project's promotion methodology — process-level step time
varies ±1.5-3%, interleaving cancels it):

  base       : HEAD defaults with CORR_BWD_COMPUTE_DTYPE="f32" (r1-r3)
  bwd_bf16   : corr backward streams in input dtype (bf16), f32 accum
  warp_ref   : + warp_bilinear_ref (4 separate C-wide gathers; its VJP
               scatters 4 C-wide corner grads instead of one 4C-wide
               table + roll/concat transpose — probes the 931 us L2
               scatter fusion seen in profile_r4)

Usage: python benchmarks/train_ab_r4.py [--reps 30]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/pwcnet_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pwcnet_tpu.models import PWCNet
    from pwcnet_tpu.models import pwcnet as pwcnet_mod
    from pwcnet_tpu.ops.pallas import cost_volume_kernel as cvk
    from pwcnet_tpu.ops.warp import warp_bilinear, warp_bilinear_ref
    from pwcnet_tpu.train.schedule import S_LONG, make_optimizer
    from pwcnet_tpu.train.state import TrainState
    from pwcnet_tpu.train.step import make_train_step

    rng = np.random.default_rng(0)
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

    def build(name, bwd_dtype, warp_fn):
        cvk.CORR_BWD_COMPUTE_DTYPE = bwd_dtype
        pwcnet_mod.warp_bilinear = warp_fn
        step = make_train_step(model, tx, aug=None)
        # The step donates its state: every variant needs its own buffers.
        own = jax.tree_util.tree_map(jnp.copy, params)
        state = TrainState.create(own, tx, jax.random.key(1))
        state, m = step(state, batch)  # compile + warm
        float(m["loss"])
        variants[name] = (step, state)
        print(f"compiled {name}", flush=True)

    try:
        build("base", "f32", warp_bilinear)
        build("bwd_bf16", "input", warp_bilinear)
        build("warp_ref", "input", warp_bilinear_ref)
    finally:
        cvk.CORR_BWD_COMPUTE_DTYPE = "input"
        pwcnet_mod.warp_bilinear = warp_bilinear

    # Second warmup round so every compiled graph is hot.
    for name, (step, state) in variants.items():
        state, m = step(state, batch)
        float(m["loss"])
        variants[name] = (step, state)

    # Each timing rep chains CHAIN steps and fetches ONE scalar: the
    # ~28 ms axon host-fetch cost amortizes to ~6 ms/rep and is identical
    # across variants (it still inflates the absolute number; deltas and
    # ratios are what this script is for).
    CHAIN = 5
    times = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, (step, state) in variants.items():
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                state, m = step(state, batch)
            float(m["loss"])  # hard sync (one scalar fetch)
            times[name].append((time.perf_counter() - t0) / CHAIN)
            variants[name] = (step, state)

    out = {}
    for name, ts in times.items():
        ts = np.asarray(ts[2:]) * 1e3  # drop first alternations
        out[name] = {"ms_mean": float(ts.mean()),
                     "ms_median": float(np.median(ts)),
                     "ms_std": float(ts.std()),
                     "pairs_per_sec": float(bs / (np.median(ts) / 1e3))}
        print(f"{name}: median {np.median(ts):.2f} ms  mean "
              f"{ts.mean():.2f}±{ts.std():.2f}  "
              f"{bs / (np.median(ts) / 1e3):.1f} pairs/s", flush=True)
    path = os.path.join(os.path.dirname(__file__), "results",
                        "train_ab_r4.json")
    with open(path, "w") as f:
        json.dump({"batch": [bs, bh, bw], "reps": args.reps,
                   "variants": out}, f, indent=1)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
