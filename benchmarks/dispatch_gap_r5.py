"""Decompose the batch-1 inference dispatch gap (VERDICT r4 missing #4).

bench.py r5 measures wall 2287 us/frame vs device-busy 1984 us — a
~300 us/frame gap, 13% of the headline. Candidate explanations:

  (a) host dispatch rate: each jitted call costs ~1.7 ms of host work
      (CLAUDE.md), overlapped with execution; if the host can't enqueue
      faster than 2.29 ms/frame, the device idles between frames.
  (b) tunnel artifact: the axon relay adds per-dispatch latency that
      batching hides.
  (c) genuine device idle between dependent dispatches (allocation,
      input transfers).

Experiments (all on the steady-state headline graph, one process):
  1. dispatch-rate: enqueue rate of a trivial jitted op (host-bound by
     construction) -> the host's max dispatches/sec.
  2. scan-chain: K dependent inference iterations inside ONE jit (a
     lax.scan over the forward; zero per-frame dispatches). Per-iter
     wall here ~ pure device time + 1/K dispatch. If this matches
     device-busy, the gap is entirely per-dispatch overhead (a+b).
  3. stream-depth: wall/frame when D independent dispatches are in
     flight before the sync (D=1..64) - how deep does the async queue
     pipeline through the tunnel?

Writes benchmarks/results/dispatch_gap_r5.json.
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
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--scan-k", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.expanduser("~/.cache/pwcnet_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pwcnet_tpu.models import PWCNet

    rng = np.random.default_rng(0)
    model = PWCNet(corr_backend="pallas", dtype=jnp.bfloat16)
    h, w = 448, 1024
    im1 = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)
    im2 = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), im1, im2)
    report = {}

    @jax.jit
    def infer(params, a, b):
        flows = model.apply(params, a, b, train=False)
        return jnp.sum(model.full_res_flow(flows, (h, w)))

    # Baseline steady-state wall/frame (the bench.py headline method).
    r = infer(params, im1, im2)
    float(r)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        r = infer(params, im1, im2)
    float(r)
    base_us = (time.perf_counter() - t0) / args.iters * 1e6
    report["baseline_wall_us"] = base_us
    print(f"baseline: {base_us:.1f} us/frame", flush=True)

    # 1. host dispatch rate on a trivial op.
    @jax.jit
    def tiny(x):
        return x + 1.0
    x = jnp.zeros((8, 128), jnp.float32)
    x = tiny(x)
    float(x[0, 0])
    t0 = time.perf_counter()
    for _ in range(200):
        x = tiny(x)
    float(x[0, 0])
    disp_us = (time.perf_counter() - t0) / 200 * 1e6
    report["tiny_dispatch_us"] = disp_us
    print(f"tiny-op dispatch+exec: {disp_us:.1f} us/call", flush=True)

    # 2. scan-chained inference: zero per-frame dispatch overhead.
    K = args.scan_k

    @jax.jit
    def infer_chain(params, a, b):
        def body(carry, _):
            # Data-dependence between iterations (carry perturbs the
            # input) so XLA cannot collapse the scan.
            flows = model.apply(params, a + carry * 1e-12, b, train=False)
            s = jnp.sum(model.full_res_flow(flows, (h, w)))
            return s, ()
        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=K)
        return s

    r = infer_chain(params, im1, im2)
    float(r)
    reps = max(4, args.iters // K)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = infer_chain(params, im1, im2)
    float(r)
    chain_us = (time.perf_counter() - t0) / (reps * K) * 1e6
    report["scan_chain_us_per_frame"] = chain_us
    print(f"scan-chain({K}): {chain_us:.1f} us/frame", flush=True)

    # 3. pipeline depth: D in-flight dispatches per sync.
    depths = {}
    for d in (1, 2, 4, 8, 16, 32):
        r = infer(params, im1, im2)
        float(r)
        reps = max(2, args.iters // d)
        t0 = time.perf_counter()
        for _ in range(reps):
            rs = [infer(params, im1, im2) for _ in range(d)]
            float(rs[-1])
        depths[str(d)] = (time.perf_counter() - t0) / (reps * d) * 1e6
        print(f"depth {d}: {depths[str(d)]:.1f} us/frame", flush=True)
    report["per_sync_depth_us"] = depths

    out = os.path.join(os.path.dirname(__file__), "results",
                       "dispatch_gap_r5.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
