"""Data-parallel scaling-efficiency harness (BASELINE.json north star:
>=90% linear multi-host scaling).

On real multi-chip hardware this measures true scaling. Off-hardware it
runs on the fake CPU mesh (--fake N) to validate the harness itself and
the collective structure; CPU timings are NOT scaling evidence but the
per-step collective counts and replication checks are.

Usage:
  python benchmarks/scaling.py              # real devices, 1..n_devices
  python benchmarks/scaling.py --fake 8     # fake CPU mesh
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fake", type=int, default=0,
                    help="force a fake N-device CPU mesh")
    ap.add_argument("--per-device-batch", type=int, default=4)
    ap.add_argument("--hw", nargs=2, type=int, default=(192, 224))
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    if args.fake:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.fake)
    import jax
    import jax.numpy as jnp

    from pwcnet_tpu.models import PWCNet
    from pwcnet_tpu.parallel import (
        MeshConfig, make_mesh, replicated, shard_batch)
    from pwcnet_tpu.train.schedule import S_LONG, make_optimizer
    from pwcnet_tpu.train.state import TrainState
    from pwcnet_tpu.train.step import make_train_step

    n_dev = len(jax.devices())
    h, w = args.hw
    rng = np.random.default_rng(0)
    model = PWCNet(corr_backend="pallas" if not args.fake else "lax",
                   dtype=jnp.bfloat16)
    tx = make_optimizer(S_LONG)
    params = jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3)))

    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    results = []
    base_rate = None
    for s in sizes:
        mesh = make_mesh(MeshConfig(data=s), devices=jax.devices()[:s])
        n = s * args.per_device_batch
        batch = {
            "im1": np.asarray(rng.random((n, h, w, 3)), np.float32),
            "im2": np.asarray(rng.random((n, h, w, 3)), np.float32),
            "flow": np.asarray(rng.standard_normal((n, h, w, 2)),
                               np.float32),
            "valid": np.ones((n, h, w), np.float32),
        }
        state = jax.device_put(
            TrainState.create(jax.tree.map(jnp.copy, params), tx,
                              jax.random.key(1)), replicated(mesh))
        step = make_train_step(model, tx, aug=None, mesh=mesh)
        g = shard_batch(mesh, batch)
        state, m = step(state, g)
        float(jax.device_get(m["loss"]))  # hard sync
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, m = step(state, g)
        float(jax.device_get(m["loss"]))
        dt = (time.perf_counter() - t0) / args.steps
        rate = n / dt
        if base_rate is None:
            base_rate = rate
        results.append({
            "devices": s,
            "global_batch": n,
            "ms_per_step": round(dt * 1e3, 2),
            "pairs_per_sec": round(rate, 2),
            "scaling_efficiency": round(rate / (base_rate * s), 3),
        })
    print(json.dumps({
        "platform": jax.default_backend(),
        "fake_mesh": bool(args.fake),
        "per_device_batch": args.per_device_batch,
        "results": results,
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
