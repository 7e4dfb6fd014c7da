"""Hard-regime plateau recipe experiments (VERDICT r4 weak #3 / next #7).

The committed r4 from-scratch hard run (runs/synthetic-hard-scratch)
sits at the predict-nothing level (~32.5 val EPE) for ~20k steps before
breaking through at 20-30k. RAFT on the same regime shows no plateau at
all. Is the plateau a *recipe* problem? One controlled probe per lever,
30k steps each (covers the full plateau + breakthrough window of the
baseline), identical data stream / eval cadence / batch to the baseline:

  warmup : linear lr warmup over 2k steps (does the cliff come from
           early-step Adam violence wrecking the coarse levels?)
  coarse : level weights flattened toward the coarse levels
           (0.32, 0.32, 0.32, 0.16, 0.08) — boost the only level that
           can see large displacements (L6 search range 4 px = 256 px
           at full res) so its signal isn't drowned 64:1
  robust : (|d|+0.01)^0.4 loss from step 0 (the paper's fine-tune loss;
           gradient-bounded, so huge early errors can't dominate)

Baseline curve = the committed r4 run's metrics.jsonl (same seed, same
eval split). Writes runs/plateau-r5/<variant>/metrics.jsonl + a summary
table to benchmarks/results/plateau_recipe_r5.json.

Usage: python benchmarks/plateau_recipe_r5.py [--steps 30000]
       [--variants warmup,coarse,robust]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30_000)
    ap.add_argument("--variants", default="warmup,coarse,robust")
    args = ap.parse_args()

    from pwcnet_tpu.config import PRESETS
    from pwcnet_tpu.train.loop import train

    base = PRESETS["synthetic-hard"]

    def variant_cfg(name: str):
        tr = base.train
        sched = tr.schedule
        kw = {}
        if name == "warmup":
            sched = dataclasses.replace(sched, warmup_steps=2000)
        elif name == "coarse":
            kw["level_weights"] = (0.32, 0.32, 0.32, 0.16, 0.08)
        elif name == "robust":
            kw["loss"] = "robust"
        elif name != "baseline30k":
            raise ValueError(name)
        tr = dataclasses.replace(
            tr, schedule=dataclasses.replace(
                sched, total_steps=args.steps),
            # Match the committed baseline's eval protocol exactly
            # (128 samples every 2500 steps); no mid-run checkpoints.
            eval_interval=2500, eval_limit=128,
            checkpoint_interval=args.steps,
            log_dir=f"runs/plateau-r5/{name}", **kw)
        return dataclasses.replace(base, train=tr)

    summary = {}
    for name in args.variants.split(","):
        name = name.strip()
        print(f"=== variant {name} ({args.steps} steps) ===", flush=True)
        metrics = train(variant_cfg(name))
        summary[name] = metrics
        print(f"{name}: final {metrics}", flush=True)

    out = os.path.join(os.path.dirname(__file__), "results",
                       "plateau_recipe_r5.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing.update({k: v for k, v in summary.items()})
    with open(out, "w") as f:
        json.dump(existing, f, indent=1)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
