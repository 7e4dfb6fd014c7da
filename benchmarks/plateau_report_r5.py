"""Tabulate the plateau-recipe runs against the committed r4 baseline.

Reads runs/plateau-r5/<variant>/metrics.jsonl plus the r4 from-scratch
baseline (runs/synthetic-hard-scratch/metrics.jsonl) and prints a
step-aligned val-EPE table + breakthrough step (first eval < 30.0, i.e.
clearly off the ~32.5 predict-nothing level) per variant. Writes
benchmarks/results/plateau_recipe_r5.md.

Usage: python benchmarks/plateau_report_r5.py
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNS = {
    "baseline (r4, no recipe)": "runs/synthetic-hard-scratch",
    "warmup 2k": "runs/plateau-r5/warmup",
    "coarse-boost weights": "runs/plateau-r5/coarse",
    "robust loss from 0": "runs/plateau-r5/robust",
}
STEPS = list(range(2500, 30001, 2500))


def curve(d):
    path = os.path.join(ROOT, d, "metrics.jsonl")
    vals = {}
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if "val_epe" in r:
                # (value, stderr) — stderr fields exist from the r5 eval
                # protocol on; the r4 baseline's metrics predate them.
                vals[r["step"]] = (r["val_epe"],
                                   r.get("val_epe_sample_stderr"))
    return vals


def main() -> int:
    curves = {}
    for name, d in RUNS.items():
        try:
            curves[name] = curve(d)
        except FileNotFoundError:
            print(f"skip {name}: no metrics at {d}")
    lines = ["# Hard-regime plateau recipes (r5; VERDICT r4 weak #3)", "",
             "Val EPE (128 samples, eval every 2500 steps) step-aligned vs",
             "the committed r4 from-scratch baseline; ± is the per-sample",
             "standard error (r5 eval protocol; the r4 baseline's metrics",
             "predate the stderr fields). 'breakthrough' = first eval",
             "below 30 (off the ~32.5 predict-nothing level).",
             ""]
    header = "| step | " + " | ".join(curves) + " |"
    lines += [header, "|" + "---|" * (len(curves) + 1)]

    def cell(v):
        if v is None:
            return "-"
        val, se = v
        return f"{val:.2f} ± {se:.2f}" if se is not None else f"{val:.2f}"

    for s in STEPS:
        lines.append("| " + " | ".join(
            [f"{s}"] + [cell(curves[name].get(s)) for name in curves]) + " |")
    lines.append("")
    for name, c in curves.items():
        bt = next((s for s in sorted(c) if c[s][0] < 30.0), None)
        lines.append(f"- **{name}**: breakthrough at "
                     f"{bt if bt else '>30000'}"
                     + (f", final {cell(c[max(c)])} at {max(c)}" if c else ""))
    out = os.path.join(ROOT, "benchmarks/results/plateau_recipe_r5.md")
    text = "\n".join(lines) + "\n"
    with open(out, "w") as f:
        f.write(text)
    print(text)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
