"""Interleaved A/B: external vs in-scan RAFT sequence loss (r5).

profile_r5's RAFT train budget charges 923.6 us/step to the scan's
stacked full-res output writes (``divide_dynamic-update-slice``), plus
the loss's re-read of the (iters, N, H, W, 2) tensor and its backward
scatter. ``loss_kind='sequence_inscan'`` reduces each iteration's
upsampled flow to a masked-L1 scalar inside the scan body (exactness:
tests/test_raft.py::test_inscan_sequence_loss_exact / _train_step_
matches_sequence), so the stacked tensor never exists. This measures
the end-to-end step-time effect at the bench shape (256x256 b4,
12 iters) and a larger 384x512 b4 shape where the stacked tensor is
4x bigger. Writes benchmarks/results/raft_inscan_ab_r5.json.

Usage: python benchmarks/raft_inscan_ab.py [--reps 30]
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

    from pwcnet_tpu.models.raft import RAFT
    from pwcnet_tpu.train.schedule import S_LONG, make_optimizer
    from pwcnet_tpu.train.state import TrainState
    from pwcnet_tpu.train.step import make_train_step

    rng = np.random.default_rng(0)
    model = RAFT(corr_backend="pallas", dtype=jnp.bfloat16)
    tx = make_optimizer(S_LONG)
    results = {}

    for th, tw, tb in ((256, 256, 4), (384, 512, 4)):
        shape_key = f"train_{th}x{tw}_b{tb}_12it"
        batch = {
            "im1": jnp.asarray(rng.random((tb, th, tw, 3)), jnp.float32),
            "im2": jnp.asarray(rng.random((tb, th, tw, 3)), jnp.float32),
            "flow": jnp.asarray(rng.standard_normal((tb, th, tw, 2)),
                                jnp.float32),
            "valid": jnp.ones((tb, th, tw), jnp.float32),
        }
        variants = {}
        for name, kind in (("external", "sequence"),
                           ("inscan", "sequence_inscan")):
            params = jax.jit(model.init)(
                jax.random.key(0), batch["im1"][:1], batch["im2"][:1])
            step = make_train_step(model, tx, aug=None, loss_kind=kind)
            state = TrainState.create(params, tx, jax.random.key(1))
            state, m = step(state, batch)
            float(m["loss"])
            variants[name] = (step, state)
            print(f"compiled {shape_key}/{name}", flush=True)

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
        results[shape_key] = {
            name: {"ms_median": float(np.median(np.asarray(ts[2:]) * 1e3)),
                   "ms_mean": float(np.mean(np.asarray(ts[2:]) * 1e3)),
                   "pairs_per_sec": float(
                       tb / (np.median(np.asarray(ts[2:]) * 1e3) / 1e3))}
            for name, ts in times.items()}
        for name, r in results[shape_key].items():
            print(f"{shape_key}/{name}: median {r['ms_median']:.2f} ms "
                  f"({r['pairs_per_sec']:.1f} pairs/s)", flush=True)

    path = os.path.join(os.path.dirname(__file__), "results",
                        "raft_inscan_ab_r5.json")
    with open(path, "w") as f:
        json.dump({"reps": args.reps, **results}, f, indent=1)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
