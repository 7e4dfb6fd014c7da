"""Full-graph TPU time budget: where does the inference frame and the
train step actually go?

VERDICT r3 "Next round" item 1: the committed rooflines covered
corr/warp/stem (~43% of the frame); nothing accounted for the decoder
convs, resizes, concats, or ANY backward op. This script captures a
``jax.profiler`` trace of the production headline graphs on the real
chip, parses the device-plane per-HLO self times with xprof's
``hlo_stats`` converter, and writes a ranked table accounting for the
whole device time of

  * 448x1024 batch-1 bf16 inference (bench.py headline), and
  * 384x448  batch-8 bf16 train step (bench.py train context),

plus per-category aggregation, an MFU estimate from the compiled cost
analysis, and a mapping of the top fusions back to model stages via the
framework-op annotations.

Artifacts: benchmarks/results/profile_r4_{infer,train}.json + the
ranked summary printed to stdout (committed as profile_r4.md).

Usage: python benchmarks/profile_graph.py [--iters 20] [--out-dir DIR]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s (public spec: 197 TF/s)


def _setup_jax():
    import jax

    cache = os.path.expanduser("~/.cache/pwcnet_tpu/xla")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _trace(jax, fn, args, trace_dir: str, iters: int, donate_state=False):
    """Warm up, then trace ``iters`` dispatches; returns wall per-iter s."""
    shutil.rmtree(trace_dir, ignore_errors=True)
    if donate_state:
        state, batch = args
        state, m = fn(state, batch)
        state, m = fn(state, batch)
        float(m["loss"])
        jax.profiler.start_trace(trace_dir)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = fn(state, batch)
        float(m["loss"])
        wall = (time.perf_counter() - t0) / iters
        jax.profiler.stop_trace()
    else:
        r = fn(*args)
        r = fn(*args)
        float(r)
        jax.profiler.start_trace(trace_dir)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = fn(*args)
        float(r)
        wall = (time.perf_counter() - t0) / iters
        jax.profiler.stop_trace()
    return wall


def _hlo_stats(trace_dir: str):
    """Parse the trace's device-plane per-HLO stats via xprof."""
    from xprof.convert import raw_to_tool_data as rtd

    pbs = glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True)
    if not pbs:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    data, _ = rtd.xspace_to_tool_data(pbs, "hlo_stats", {})
    d = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["id"] for c in d["cols"]]
    rows = []
    for row in d["rows"]:
        vals = dict(zip(cols, [c["v"] for c in row["c"]]))
        rows.append(vals)
    return rows


def _aggregate(rows, iters: int):
    """Per-op and per-category table, normalized to one iteration."""
    total_us = sum(r["total_self_time"] for r in rows)
    ops = []
    for r in sorted(rows, key=lambda r: -r["total_self_time"]):
        ops.append({
            "op": r["hlo_op_name"],
            "category": r["category"],
            "framework_op": (r.get("tf_op_name") or "")[:160],
            "occurrences_per_iter": r["occurrences"] / iters,
            "us_per_iter": r["total_self_time"] / iters,
            "pct": 100.0 * r["total_self_time"] / total_us,
            "expr": (r.get("hlo_op_expression") or "")[:200],
        })
    cats = {}
    for r in rows:
        c = cats.setdefault(r["category"], {"us_per_iter": 0.0, "ops": 0})
        c["us_per_iter"] += r["total_self_time"] / iters
        c["ops"] += 1
    cats = {k: {**v, "pct": 100.0 * v["us_per_iter"] * iters / total_us}
            for k, v in sorted(cats.items(),
                               key=lambda kv: -kv[1]["us_per_iter"])}
    return {"device_us_per_iter": total_us / iters, "per_op": ops,
            "per_category": cats}


def _stage_of(op_entry) -> str:
    """Map an HLO op to a model stage via framework-op / op-name hints."""
    s = (op_entry["framework_op"] + " " + op_entry["op"] + " "
         + op_entry["expr"]).lower()
    for key, stage in (
            ("custom-call", "pallas_kernel"),
            ("pyramid", "feature_pyramid"),
            ("stem", "feature_pyramid"),
            ("context", "context_net"),
            ("estimator", "flow_estimator"),
            ("upflow", "upsample"),
            ("resize", "upsample"),
            ("corr", "correlation"),
            ("warp", "warp"),
            ("adam", "optimizer"),
            ("transpose", "layout"),
            ("copy", "layout"),
    ):
        if key in s:
            return stage
    return "other"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out-dir", default=os.path.join(
        os.path.dirname(__file__), "results"))
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--skip-pwc", action="store_true")
    ap.add_argument("--raft", action="store_true",
                    help="also profile the RAFT graphs (VERDICT r4 #4)")
    ap.add_argument("--tag", default="r4",
                    help="output file suffix: profile_<tag>.json")
    args = ap.parse_args()

    jax = _setup_jax()
    import jax.numpy as jnp

    from pwcnet_tpu.models import PWCNet
    from pwcnet_tpu.train.schedule import S_LONG, make_optimizer
    from pwcnet_tpu.train.state import TrainState
    from pwcnet_tpu.train.step import make_train_step

    rng = np.random.default_rng(0)
    model = PWCNet(corr_backend="pallas", dtype=jnp.bfloat16)
    report = {"device": str(jax.devices()[0]), "iters": args.iters}

    def finish_agg(agg, wall, flops=None):
        for op in agg["per_op"]:
            op["stage"] = _stage_of(op)
        stages = {}
        for op in agg["per_op"]:
            stages[op["stage"]] = (stages.get(op["stage"], 0.0)
                                   + op["us_per_iter"])
        agg["per_stage"] = dict(sorted(stages.items(), key=lambda kv: -kv[1]))
        agg["wall_us_per_iter"] = wall * 1e6
        if flops is not None:
            agg["flops_per_frame"] = flops
            dev_s = agg["device_us_per_iter"] * 1e-6
            agg["mfu_vs_v5e_bf16_peak"] = (flops / dev_s) / V5E_BF16_PEAK
        return agg

    if args.skip_pwc:
        report_path = os.path.join(args.out_dir,
                                   f"profile_{args.tag}.json")
        if os.path.exists(report_path):
            with open(report_path) as f:
                report.update(json.load(f))

    if not args.skip_pwc:
        # ---- inference: the bench.py headline graph ----
        h, w = 448, 1024
        im1 = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)
        im2 = jnp.asarray(rng.random((1, h, w, 3)), jnp.float32)
        params = jax.jit(model.init)(jax.random.key(0), im1, im2)

        @jax.jit
        def infer(params, a, b):
            flows = model.apply(params, a, b, train=False)
            return jnp.sum(model.full_res_flow(flows, (h, w)))

        lowered = infer.lower(params, im1, im2)
        cost = lowered.compile().cost_analysis()
        infer_flops = float(cost.get("flops", 0.0)) if cost else 0.0

        tdir = "/tmp/pwcnet_profile_infer"
        wall = _trace(jax, infer, (params, im1, im2), tdir, args.iters)
        agg = finish_agg(_aggregate(_hlo_stats(tdir), args.iters), wall,
                         infer_flops)
        report["inference_448x1024_b1"] = agg
        print(f"[infer] wall {wall*1e3:.3f} ms/frame, device "
              f"{agg['device_us_per_iter']:.0f} us, MFU "
              f"{agg['mfu_vs_v5e_bf16_peak']*100:.1f}%", flush=True)

    # ---- train step: the bench.py train-context graph ----
    if not args.skip_train and not args.skip_pwc:
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
        tdir = "/tmp/pwcnet_profile_train"
        wall = _trace(jax, step, (state, batch), tdir, args.iters,
                      donate_state=True)
        agg = finish_agg(_aggregate(_hlo_stats(tdir), args.iters), wall)
        report["train_384x448_b8"] = agg
        print(f"[train] wall {wall*1e3:.3f} ms/step, device "
              f"{agg['device_us_per_iter']:.0f} us", flush=True)

    if args.raft:
        # ---- RAFT graphs (bench.py raft-context; VERDICT r4 missing #3)
        from pwcnet_tpu.models.raft import RAFT

        raft = RAFT(corr_backend="pallas", dtype=jnp.bfloat16, num_iters=12)
        rh, rw = 448, 1024
        r1 = jnp.asarray(rng.random((1, rh, rw, 3)), jnp.float32)
        r2 = jnp.asarray(rng.random((1, rh, rw, 3)), jnp.float32)
        rparams = jax.jit(raft.init)(jax.random.key(0), r1, r2)

        @jax.jit
        def raft_infer(params, a, b):
            return jnp.sum(raft.apply(params, a, b, train=False)[-1])

        cost = raft_infer.lower(rparams, r1, r2).compile().cost_analysis()
        rflops = float(cost.get("flops", 0.0)) if cost else 0.0
        tdir = "/tmp/pwcnet_profile_raft_infer"
        wall = _trace(jax, raft_infer, (rparams, r1, r2), tdir, args.iters)
        agg = finish_agg(_aggregate(_hlo_stats(tdir), args.iters), wall,
                         rflops)
        report["raft_inference_448x1024_b1_12it"] = agg
        print(f"[raft infer] wall {wall*1e3:.3f} ms/frame, device "
              f"{agg['device_us_per_iter']:.0f} us, MFU "
              f"{agg['mfu_vs_v5e_bf16_peak']*100:.1f}%", flush=True)

        if not args.skip_train:
            from pwcnet_tpu.train.schedule import S_LONG as SL
            rtx = make_optimizer(SL)
            rb, rbh, rbw = 4, 256, 256
            rbatch = {
                "im1": jnp.asarray(rng.random((rb, rbh, rbw, 3)),
                                   jnp.float32),
                "im2": jnp.asarray(rng.random((rb, rbh, rbw, 3)),
                                   jnp.float32),
                "flow": jnp.asarray(rng.standard_normal((rb, rbh, rbw, 2)),
                                    jnp.float32),
                "valid": jnp.ones((rb, rbh, rbw), jnp.float32),
            }
            rtp = jax.jit(raft.init)(
                jax.random.key(0), rbatch["im1"][:1], rbatch["im2"][:1])
            rstate = TrainState.create(rtp, rtx, jax.random.key(1))
            rstep = make_train_step(raft, rtx, aug=None,
                                    loss_kind="sequence")
            tdir = "/tmp/pwcnet_profile_raft_train"
            wall = _trace(jax, rstep, (rstate, rbatch), tdir, args.iters,
                          donate_state=True)
            agg = finish_agg(_aggregate(_hlo_stats(tdir), args.iters), wall)
            report["raft_train_256x256_b4_12it"] = agg
            print(f"[raft train] wall {wall*1e3:.3f} ms/step, device "
                  f"{agg['device_us_per_iter']:.0f} us", flush=True)

    os.makedirs(args.out_dir, exist_ok=True)
    out = os.path.join(args.out_dir, f"profile_{args.tag}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}", flush=True)

    # ranked human table: top ops covering >=90%
    for key in ("inference_448x1024_b1", "train_384x448_b8",
                "raft_inference_448x1024_b1_12it",
                "raft_train_256x256_b4_12it"):
        if key not in report:
            continue
        agg = report[key]
        print(f"\n== {key}: device {agg['device_us_per_iter']:.0f} us/iter "
              f"==")
        print("per-stage:", {k: f"{v:.0f}us"
                             for k, v in agg["per_stage"].items()})
        cum = 0.0
        for op in agg["per_op"]:
            if cum >= 92.0 and op["pct"] < 1.0:
                break
            cum += op["pct"]
            print(f"  {op['pct']:5.1f}% {op['us_per_iter']:8.1f}us "
                  f"x{op['occurrences_per_iter']:.0f} [{op['category']}/"
                  f"{op['stage']}] {op['op']}  {op['framework_op'][:70]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
