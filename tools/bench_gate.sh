#!/usr/bin/env bash
# One-command bench gate with the suspect re-run hook wired up.
#
# Runs tools/bench_regress.py against the committed baseline with
# BENCH_RERUN_CMD set to graft.Bench's prefix-filtered subset mode, so
# sub-noise-floor suspects (cur > 3x base waived only by the 0.45 s
# allowance) are re-run once and flagged only if they reproduce.
#
# Usage: tools/bench_gate.sh [current.json] [baseline.json]
#   (defaults: bench_detail.json, tools/bench_baseline.json)
# Requires a prior full bench run to have written current.json.
set -euo pipefail
cd "$(dirname "$0")/.."
export BENCH_RERUN_CMD='SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SWEEPS=3 sbt -batch "runMain graft.Bench {queries}"'
exec python3 tools/bench_regress.py "$@"
