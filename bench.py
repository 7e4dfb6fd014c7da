"""Headline benchmark: PWC-Net inference at Sintel resolution on one chip.

Prints ONE JSON line:
  {"metric": "sintel_inference_fps", "value": N, "unit": "frames/sec",
   "vs_baseline": N/35.0}

Baseline: the PWC-Net paper reports ~35 fps at Sintel resolution
(1024x436) on an NVIDIA Pascal Titan X (BASELINE.md); the reference repo
publishes no numbers of its own.

Hardening (BENCH_r02 post-mortem): round 2's driver run timed out (rc=124)
with zero output because this script printed the headline only after ALL
phases — including the train-step compile, which on a cold XLA cache
through the remote-TPU tunnel pushes the total past the driver budget
(measured: full cold run ~8 min; warm rerun ~40 s). Therefore:
  1. The headline JSON is printed (and flushed) the moment the inference
     number exists — the train-context bench runs after and can die
     without losing the headline.
  2. A SIGALRM watchdog (PWCNET_BENCH_BUDGET_S, default 520 s) aborts any
     phase that hangs: before the headline it reports the phase reached
     (stderr) and exits 3; after the headline it exits 0 — the headline
     line is already on stdout.
  3. The persistent compile cache (~/.cache/pwcnet_tpu/xla) is shared with
     the CLI and the roofline benches, so a bench run during normal work
     pre-warms the driver's end-of-round run.
"""

import json
import os
import signal
import sys
import time

import numpy as np

_PHASE = "startup"
_HEADLINE_PRINTED = False


def _watchdog_handler(signum, frame):
    if _HEADLINE_PRINTED:
        print(f"bench watchdog: budget hit during phase {_PHASE!r} "
              f"(headline already printed)", file=sys.stderr)
        os._exit(0)
    print(f"bench watchdog: budget hit during phase {_PHASE!r} "
          f"before the headline was measured", file=sys.stderr)
    os._exit(3)


def _device_busy_us(jax, fn, args, iters=8, donate_state=False):
    """Device-busy microseconds per iteration via a short profiler trace.

    VERDICT r4 weak #1: wall-clock fps cannot distinguish code regressions
    from chip-state drift (the shared chip's step time drifts by ±10%
    within a day). Device-busy per-HLO self-time (the same extraction as
    benchmarks/profile_graph.py) is stable across chip states, so every
    bench run now reports it next to wall fps. Returns None on any
    failure — the wall numbers must never be lost to a profiling issue.
    """
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "benchmarks"))
        import profile_graph as pg

        tdir = "/tmp/pwcnet_bench_trace"
        pg._trace(jax, fn, args, tdir, iters, donate_state=donate_state)
        rows = pg._hlo_stats(tdir)
        return sum(r["total_self_time"] for r in rows) / iters
    except Exception as e:  # noqa: BLE001 - diagnostics only
        print(f"device-busy trace failed: {e!r}", file=sys.stderr)
        return None


def _bench(fn, *args, iters=100, warmup=5):
    """Amortized per-call time with a hard device sync.

    ``fn`` must return a scalar. Through the remote-TPU tunnel,
    ``block_until_ready`` does not actually wait for execution (a no-op
    ack) while any host fetch costs a ~28 ms round trip — so time many
    dispatches and fetch one scalar at the end.
    """
    for _ in range(warmup):
        r = fn(*args)
    float(r)  # hard sync
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(r)  # hard sync
    return (time.perf_counter() - t0) / iters


def main() -> int:
    global _PHASE, _HEADLINE_PRINTED

    budget = int(os.environ.get("PWCNET_BENCH_BUDGET_S", "520"))
    signal.signal(signal.SIGALRM, _watchdog_handler)
    signal.alarm(budget)

    import jax
    import jax.numpy as jnp

    # Persistent compile cache (same location as the CLI): first run after
    # a code change pays remote compiles once; reruns are seconds.
    cache = os.path.expanduser("~/.cache/pwcnet_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pwcnet_tpu.models import PWCNet
    from pwcnet_tpu.train.schedule import S_LONG, make_optimizer
    from pwcnet_tpu.train.state import TrainState
    from pwcnet_tpu.train.step import make_train_step

    rng = np.random.default_rng(0)
    # Headline backend; PWCNET_BENCH_BACKEND overrides for A/B runs.
    backend = os.environ.get("PWCNET_BENCH_BACKEND", "pallas")
    model = PWCNet(corr_backend=backend, dtype=jnp.bfloat16)

    # --- headline: Sintel-resolution inference (436x1024 padded to /64) ---
    _PHASE = "infer-init"
    h, w = 448, 1024
    im1 = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)
    im2 = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), im1, im2)

    @jax.jit
    def infer(params, a, b):
        flows = model.apply(params, a, b, train=False)
        # Reduce to a scalar so the benchmark's hard sync is a tiny fetch
        # while still forcing the whole computation.
        return jnp.sum(model.full_res_flow(flows, (h, w)))

    _PHASE = "infer-compile-and-measure"
    t_infer = _bench(infer, params, im1, im2)
    fps = 1.0 / t_infer

    print(json.dumps({
        "metric": "sintel_inference_fps",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 35.0, 3),
        "baseline": "PWC-Net paper ~35 fps at 1024x436 on Pascal Titan X "
                    "(reference repo publishes no numbers of its own)",
    }), flush=True)
    _HEADLINE_PRINTED = True

    # --- context: device-busy time for the headline graph (drift-robust
    # companion to wall fps; VERDICT r4 weak #1) ---
    _PHASE = "infer-device-busy"
    dev_us = _device_busy_us(jax, infer, (params, im1, im2))
    if dev_us is not None:
        print(json.dumps({
            "metric": "sintel_inference_device_busy_us", "value":
            round(dev_us, 1), "unit": "us/frame",
            "wall_us": round(t_infer * 1e6, 1),
            "dispatch_gap_us": round(t_infer * 1e6 - dev_us, 1),
        }), file=sys.stderr, flush=True)

    # --- context: batched serving throughput (amortized dispatch) ---
    _PHASE = "serve-context"
    try:
        sb = 4
        sb1 = jnp.asarray(rng.random((sb, h, w, 3)), jnp.float32)
        sb2 = jnp.asarray(rng.random((sb, h, w, 3)), jnp.float32)
        t_batch = _bench(infer, params, sb1, sb2, iters=50)
        print(f"serving: {sb / t_batch:.2f} frames/sec at batch {sb} "
              f"({t_batch * 1e3:.2f} ms/batch @ {h}x{w})", file=sys.stderr)
    except Exception as e:
        print(f"serve bench failed: {e!r}", file=sys.stderr)

    # --- context: training pairs/sec on the FlyingChairs crop ---
    _PHASE = "train-context"
    try:
        tx = make_optimizer(S_LONG)
        bh, bw, bs = 384, 448, 8
        batch = {
            "im1": jnp.asarray(rng.random((bs, bh, bw, 3)), jnp.float32),
            "im2": jnp.asarray(rng.random((bs, bh, bw, 3)), jnp.float32),
            "flow": jnp.asarray(rng.standard_normal((bs, bh, bw, 2)),
                                jnp.float32),
            "valid": jnp.ones((bs, bh, bw), jnp.float32),
        }
        tparams = jax.jit(model.init)(
            jax.random.key(0), batch["im1"][:1], batch["im2"][:1])
        state = TrainState.create(tparams, tx, jax.random.key(1))
        step = make_train_step(model, tx, aug=None)

        def train_once(state, batch):
            state, metrics = step(state, batch)
            return state, metrics

        # Manual warmup/timing (state is donated; thread it through).
        state, m = train_once(state, batch)
        float(m["loss"])  # hard sync
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = train_once(state, batch)
        float(m["loss"])  # hard sync
        t_step = (time.perf_counter() - t0) / iters
        print(f"train: {bs / t_step:.2f} pairs/sec/chip "
              f"({t_step * 1e3:.1f} ms/step, batch {bs} @ {bh}x{bw})",
              file=sys.stderr)
        _PHASE = "train-device-busy"
        dev_us = _device_busy_us(jax, train_once, (state, batch), iters=6,
                                 donate_state=True)
        if dev_us is not None:
            print(json.dumps({
                "metric": "train_step_device_busy_us", "value":
                round(dev_us, 1), "unit": "us/step",
                "wall_us": round(t_step * 1e6, 1),
                "dispatch_gap_us": round(t_step * 1e6 - dev_us, 1),
            }), file=sys.stderr, flush=True)
    except Exception as e:  # context metrics must not kill the headline
        print(f"train bench failed: {e!r}", file=sys.stderr)

    # --- context: RAFT family (BASELINE configs[4]; VERDICT r3 missing
    # #5). Runs last: a cold-cache compile overrun only costs these
    # context lines, never the headline. ---
    _PHASE = "raft-context"
    try:
        from pwcnet_tpu.models.raft import RAFT

        raft = RAFT(corr_backend="pallas", dtype=jnp.bfloat16,
                    num_iters=12)
        rh, rw = 448, 1024
        r1 = jnp.asarray(rng.random((1, rh, rw, 3)), jnp.float32)
        r2 = jnp.asarray(rng.random((1, rh, rw, 3)), jnp.float32)
        rparams = jax.jit(raft.init)(jax.random.key(0), r1, r2)

        @jax.jit
        def raft_infer(params, a, b):
            flows = raft.apply(params, a, b, train=False)
            return jnp.sum(flows[-1])

        t_raft = _bench(raft_infer, rparams, r1, r2, iters=30)
        print(f"raft: {1.0 / t_raft:.2f} frames/sec inference "
              f"({t_raft * 1e3:.2f} ms @ {rh}x{rw}, 12 iters)",
              file=sys.stderr)

        rb, rbh, rbw = 4, 256, 256
        rbatch = {
            "im1": jnp.asarray(rng.random((rb, rbh, rbw, 3)), jnp.float32),
            "im2": jnp.asarray(rng.random((rb, rbh, rbw, 3)), jnp.float32),
            "flow": jnp.asarray(rng.standard_normal((rb, rbh, rbw, 2)),
                                jnp.float32),
            "valid": jnp.ones((rb, rbh, rbw), jnp.float32),
        }
        rtparams = jax.jit(raft.init)(
            jax.random.key(0), rbatch["im1"][:1], rbatch["im2"][:1])
        # Own optimizer: keeps this context bench independent of whether
        # the train-context block above succeeded.
        rtx = make_optimizer(S_LONG)
        rstate = TrainState.create(rtparams, rtx, jax.random.key(1))
        rstep = make_train_step(raft, rtx, aug=None, loss_kind="sequence")
        rstate, rm = rstep(rstate, rbatch)
        float(rm["loss"])
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            rstate, rm = rstep(rstate, rbatch)
        float(rm["loss"])
        t_rstep = (time.perf_counter() - t0) / iters
        print(f"raft train: {rb / t_rstep:.2f} pairs/sec/chip "
              f"({t_rstep * 1e3:.1f} ms/step, batch {rb} @ {rbh}x{rbw})",
              file=sys.stderr)
    except Exception as e:
        print(f"raft bench failed: {e!r}", file=sys.stderr)
    signal.alarm(0)
    return 0


if __name__ == "__main__":
    sys.exit(main())
