"""RAFT synthetic learning proof vs PWC-Net at equal step count
(VERDICT r2 missing #6 / r1 next #10).

Reads the committed metrics of the two runs and emits a step-aligned
val-EPE comparison table:

  python benchmarks/raft_vs_pwc_synthetic.py \
      runs/synthetic-proof/metrics.jsonl runs/raft-synthetic/metrics.jsonl

Both runs train on the same exact-GT synthetic stream (device-side
generator, batch 8 @ 384x448) with disjoint val draws; RAFT uses the
sequence loss + convex upsampling, PWC-Net the multiscale loss.
"""

from __future__ import annotations

import json
import sys


def load(path):
    rows = [json.loads(l) for l in open(path)]
    return {r["step"]: r["val_epe"] for r in rows if "val_epe" in r}


def main(pwc_path, raft_path) -> int:
    pwc, raft = load(pwc_path), load(raft_path)
    steps = sorted(set(pwc) & set(raft))
    out = {"steps": [], "pwc_val_epe": [], "raft_val_epe": []}
    print(f"{'step':>8} {'pwc_val_epe':>12} {'raft_val_epe':>13}")
    for s in steps:
        print(f"{s:>8} {pwc[s]:>12.4f} {raft[s]:>13.4f}")
        out["steps"].append(s)
        out["pwc_val_epe"].append(round(pwc[s], 4))
        out["raft_val_epe"].append(round(raft[s], 4))
    if steps:
        last = steps[-1]
        out["at_equal_steps"] = {
            "step": last, "pwc": round(pwc[last], 4),
            "raft": round(raft[last], 4),
            "raft_better": raft[last] < pwc[last],
        }
        print(json.dumps(out["at_equal_steps"]))
    out_path = (sys.argv[3] if len(sys.argv) > 3
                else "benchmarks/results/raft_vs_pwc_synthetic.json")
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    args = sys.argv[1:] or ["runs/synthetic-proof/metrics.jsonl",
                            "runs/raft-synthetic/metrics.jsonl"]
    raise SystemExit(main(*args))
