"""Interleaved A/B: fused vs unfused GRU z/r gate convs (r5).

The SepConvGRU's z and r gates convolve the SAME (h, x) concat; fusing
them into one conv with 2*hidden output channels is exact (conv is
linear in output channels; equivalence pinned in tests/test_raft.py
``test_gru_zr_fusion_exact``). This removes 2 convs x 2 passes x
num_iters ops from the scan body. The profile charges the GRU's six
small-C convs ~1.0 ms of the 8.8 ms RAFT inference frame
(raft_profile_r5.md) — this A/B measures whether halving the gate conv
count pays end-to-end on the chip, per the promotion methodology
(interleaved same-process reps; deltas are the signal).

Times RAFT inference (448x1024 b1, 12 iters, train=False) and the RAFT
train step (256x256 b4, sequence loss). Writes
benchmarks/results/gru_fuse_ab_r5.json.

Usage: python benchmarks/gru_fuse_ab.py [--reps 30]
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
    results = {}

    # ---- inference: 448x1024 b1, 12 iters ----
    ih, iw = 448, 1024
    i1 = jnp.asarray(rng.random((1, ih, iw, 3)), jnp.float32)
    i2 = jnp.asarray(rng.random((1, ih, iw, 3)), jnp.float32)
    infer = {}
    for name, fuse in [("fused", True), ("unfused", False)]:
        model = RAFT(corr_backend="pallas", gru_fuse_zr=fuse,
                     dtype=jnp.bfloat16)
        params = jax.jit(model.init)(jax.random.key(0), i1[:, :64, :64],
                                     i2[:, :64, :64])
        fn = jax.jit(lambda p, a, b, m=model: m.apply(p, a, b,
                                                      train=False)[0])
        out = fn(params, i1, i2)
        float(out[0, 0, 0, 0])  # compile + warm
        infer[name] = (fn, params)
        print(f"compiled infer/{name}", flush=True)

    CHAIN = 16
    times = {k: [] for k in infer}
    for rep in range(args.reps):
        for name, (fn, params) in infer.items():
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                out = fn(params, i1, i2)
            float(out[0, 0, 0, 0])  # one scalar fetch syncs the chain
            times[name].append((time.perf_counter() - t0) / CHAIN)
    results["inference_448x1024_b1_12it"] = {
        name: {"ms_median": float(np.median(np.asarray(ts[2:]) * 1e3)),
               "ms_mean": float(np.mean(np.asarray(ts[2:]) * 1e3)),
               "fps": float(1e3 / np.median(np.asarray(ts[2:]) * 1e3))}
        for name, ts in times.items()}
    for name, r in results["inference_448x1024_b1_12it"].items():
        print(f"infer/{name}: median {r['ms_median']:.2f} ms "
              f"({r['fps']:.1f} fps)", flush=True)

    # ---- train: 256x256 b4, sequence loss ----
    th, tw, tb = 256, 256, 4
    batch = {
        "im1": jnp.asarray(rng.random((tb, th, tw, 3)), jnp.float32),
        "im2": jnp.asarray(rng.random((tb, th, tw, 3)), jnp.float32),
        "flow": jnp.asarray(rng.standard_normal((tb, th, tw, 2)),
                            jnp.float32),
        "valid": jnp.ones((tb, th, tw), jnp.float32),
    }
    tx = make_optimizer(S_LONG)
    train = {}
    for name, fuse in [("fused", True), ("unfused", False)]:
        model = RAFT(corr_backend="pallas", gru_fuse_zr=fuse,
                     dtype=jnp.bfloat16)
        params = jax.jit(model.init)(
            jax.random.key(0), batch["im1"][:1], batch["im2"][:1])
        step = make_train_step(model, tx, aug=None, loss_kind="sequence")
        state = TrainState.create(params, tx, jax.random.key(1))
        state, m = step(state, batch)
        float(m["loss"])
        train[name] = (step, state)
        print(f"compiled train/{name}", flush=True)

    CHAIN = 5
    times = {k: [] for k in train}
    for rep in range(args.reps):
        for name, (step, state) in train.items():
            t0 = time.perf_counter()
            for _ in range(CHAIN):
                state, m = step(state, batch)
            float(m["loss"])
            times[name].append((time.perf_counter() - t0) / CHAIN)
            train[name] = (step, state)
    results["train_256x256_b4_12it"] = {
        name: {"ms_median": float(np.median(np.asarray(ts[2:]) * 1e3)),
               "ms_mean": float(np.mean(np.asarray(ts[2:]) * 1e3)),
               "pairs_per_sec": float(
                   tb / (np.median(np.asarray(ts[2:]) * 1e3) / 1e3))}
        for name, ts in times.items()}
    for name, r in results["train_256x256_b4_12it"].items():
        print(f"train/{name}: median {r['ms_median']:.2f} ms "
              f"({r['pairs_per_sec']:.1f} pairs/s)", flush=True)

    path = os.path.join(os.path.dirname(__file__), "results",
                        "gru_fuse_ab_r5.json")
    with open(path, "w") as f:
        json.dump({"reps": args.reps, **results}, f, indent=1)
    print("wrote", path)
    return 0


if __name__ == "__main__":
    sys.exit(main())
