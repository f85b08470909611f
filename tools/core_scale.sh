#!/usr/bin/env bash
# Core-scaling datapoint (r16 verdict #7): time the heavy bench families
# on ~sf1-equivalent replicated inputs at 8 and at 32 cores and write
# per-query ratios to core_scale.json. sf0.1 itself is overhead-bound
# (8-core suite total ~= 32-core total), so THIS is the artifact that
# certifies the heavy plans parallelize.
#
# Usage: tools/core_scale.sh [replicated-data-dir]
#   (the dir is created+materialized on first use and REUSED by both
#   core counts so they time identical bytes)
set -euo pipefail
cd "$(dirname "$0")/.."
DIR="${1:-/tmp/graft-corescale-data}"
mkdir -p "$DIR"
run() {
  local cpus="$1"
  SPARK_GRAFT_CPUS="$cpus" sbt -batch "runMain graft.tools.CoreScale $DIR" \
    | grep '"tool":"core_scale"' | sed 's/^\[info\] //' | tail -1
}
J32=$(run 32)
J8=$(run 8)
python3 - "$J32" "$J8" <<'EOF'
import json, sys
j32, j8 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
out = {"tool": "core_scale", "repl": j32["repl"],
       "cpus_high": j32["cpus"], "cpus_low": j8["cpus"],
       "per_query": {}}
for q, t32 in j32["queries"].items():
    t8 = j8["queries"].get(q)
    if t8 is None:
        continue
    out["per_query"][q] = {
        "high_cores_sec": t32, "low_cores_sec": t8,
        # >1 = more cores help; ~cpu-ratio = compute-bound and parallel
        "speedup": round(t8 / t32, 2) if t32 > 0 else None}
sp = sorted(v["speedup"] for v in out["per_query"].values()
            if v["speedup"] is not None)
out["median_speedup"] = sp[len(sp) // 2] if sp else None
with open("core_scale.json", "w") as f:
    json.dump(out, f, indent=1, sort_keys=True)
print(json.dumps(out))
EOF
