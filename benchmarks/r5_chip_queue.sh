#!/bin/sh
# Post-plateau chip queue (r5): the two pending lowering A/Bs, run
# sequentially in one long-lived session each (CLAUDE.md: batch chip
# work, keep the host otherwise idle). Promotion decisions and the
# profile/bench refresh happen AFTER reading these results.
set -x
cd "$(dirname "$0")/.."
timeout 2400 python benchmarks/dilconv_probe.py --reps 20
echo "dilconv_probe rc=$?"
timeout 2400 python benchmarks/gru_fuse_ab.py --reps 30
echo "gru_fuse_ab rc=$?"
