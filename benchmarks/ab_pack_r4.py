"""Interleaved A/B: batch-to-width lane packing for narrow-W correlation.

Variants (PWC train step 384x448 b8, and a RAFT train step):
  nopack : PACK_MIN_LANES=0  (r1-r3 behavior — per-sample narrow rows)
  pack   : PACK_MIN_LANES=128 (levels with W<128 pack the batch along W
           with 2d-zero separators; kernels run lane-filled)

Timing: chained steps, one scalar fetch per rep (axon fetch ~28 ms).

Usage: python benchmarks/ab_pack_r4.py [--reps 16]
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
    ap.add_argument("--reps", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/pwcnet_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pwcnet_tpu.models import PWCNet
    from pwcnet_tpu.models.raft import RAFT
    from pwcnet_tpu.ops.pallas import cost_volume_kernel as cvk
    from pwcnet_tpu.losses import sequence_loss
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
    tx = make_optimizer(S_LONG)

    variants = {}

    def build_pwc(name, pack):
        cvk.PACK_MIN_LANES = 128 if pack else 0
        model = PWCNet(corr_backend="pallas", dtype=jnp.bfloat16)
        params = jax.jit(model.init)(
            jax.random.key(0), batch["im1"][:1], batch["im2"][:1])
        step = make_train_step(model, tx, aug=None)
        state = TrainState.create(params, tx, jax.random.key(1))
        state, m = step(state, batch)
        float(m["loss"])
        variants[name] = (step, state, batch)
        print(f"compiled {name}", flush=True)

    # RAFT: raw loss/grad step (the train loop's step works too, but a
    # minimal step isolates the model cost).
    rb, rh, rw = 4, 256, 256
    rbatch = {
        "im1": jnp.asarray(rng.random((rb, rh, rw, 3)), jnp.float32),
        "im2": jnp.asarray(rng.random((rb, rh, rw, 3)), jnp.float32),
        "flow": jnp.asarray(rng.standard_normal((rb, rh, rw, 2)),
                            jnp.float32),
        "valid": jnp.ones((rb, rh, rw), jnp.float32),
    }

    def build_raft(name, pack):
        cvk.PACK_MIN_LANES = 128 if pack else 0
        model = RAFT(corr_backend="pallas", dtype=jnp.bfloat16,
                     num_iters=12)
        params = jax.jit(model.init)(
            jax.random.key(0), rbatch["im1"][:1], rbatch["im2"][:1])
        step = make_train_step(model, tx, aug=None, loss_kind="sequence")
        state = TrainState.create(params, tx, jax.random.key(1))
        state, m = step(state, rbatch)
        float(m["loss"])
        variants[name] = (step, state, rbatch)
        print(f"compiled {name}", flush=True)

    try:
        build_pwc("pwc_nopack", False)
        build_pwc("pwc_pack", True)
        build_raft("raft_nopack", False)
        build_raft("raft_pack", True)
    finally:
        cvk.PACK_MIN_LANES = 128

    for name, (step, state, b) in variants.items():
        state, m = step(state, b)
        float(m["loss"])
        variants[name] = (step, state, b)

    CHAIN = 5
    times = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, (step, state, b) in variants.items():
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                state, m = step(state, b)
            float(m["loss"])
            times[name].append((time.perf_counter() - t0) / CHAIN)
            variants[name] = (step, state, b)

    out = {}
    for name, ts in times.items():
        ts = np.asarray(ts[2:]) * 1e3
        out[name] = {"ms_median": float(np.median(ts)),
                     "ms_mean": float(ts.mean()),
                     "ms_std": float(ts.std())}
        print(f"{name}: median {np.median(ts):.2f} ms "
              f"mean {ts.mean():.2f}±{ts.std():.2f}", flush=True)
    path = os.path.join(os.path.dirname(__file__), "results",
                        "ab_pack_r4.json")
    with open(path, "w") as f:
        json.dump({"pwc_batch": [bs, bh, bw], "raft_batch": [rb, rh, rw],
                   "chain": CHAIN, "reps": args.reps, "variants": out},
                  f, indent=1)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
