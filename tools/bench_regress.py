#!/usr/bin/env python3
"""Per-query bench-regression gate (VERDICT r7 #2, drift-aware since r10).

Diffs the current sweep (bench_detail.json, written by graft.Bench)
against the committed previous-round baseline
(tools/bench_baseline.json, refreshed from the driver's sf0.1 detail
each round) and reports every query whose DRIFT-NORMALIZED time clears
both a proportional and an absolute noise allowance:

    cur/drift > RATIO * base + NOISE_SECS

where drift = median over shared queries of cur/base (computed on
queries with base >= MEDIAN_FLOOR_SECS so sub-50ms JVM noise doesn't
vote). The r9 round proved the need for both terms: byte-identical
code re-ran ~25% slower suite-wide (10 phantom flags from drift
alone), and even after dividing the median out, the two jumpiest
sub-second queries (q134 x1.64, q77 x1.78 normalized — scheduling-
quantum noise, roughly CONSTANT seconds per query, hence the additive
term) still cleared a pure-ratio bar. A real single-query regression
barely moves the median (one vote out of 260) and real hot-spot
regressions are multi-second (q259's explode was +20 s), so the gate
still trips on them — `--selftest` proves both directions.

Regressions listed in
tools/bench_exclusions.json (deliberate, documented trades — q175's r7
linkage rebuild is the charter entry) are reported as "excused" and do
not fail the gate.

The 0.45 s additive allowance has a blind spot: a 0.1 s query that
regresses to 0.5 s (5x!) stays under RATIO*base + NOISE. Sub-noise
suspects (cur/drift > SUSPECT_RATIO * base, yet inside the allowance)
are therefore re-run ONCE (minima-compared) when a re-run hook is
available — a confirmed suspect flags like any regression; one that
melts on the re-run was scheduling noise. Hook: --rerun-cmd 'CMD' (or
env BENCH_RERUN_CMD), a shell command with {queries} substituted by
the space-separated suspect names; it must rewrite bench_detail.json
for just those queries (graft.Bench's prefix-args subset mode does
exactly this). Without a hook, suspects print as non-failing SUSPECT
lines so they are at least visible.

Usage:
    python3 tools/bench_regress.py [current.json] [baseline.json]
        [--rerun-cmd CMD]
        (defaults: bench_detail.json, tools/bench_baseline.json)
    python3 tools/bench_regress.py --selftest

Exit codes: 0 = clean (or SF mismatch — cross-SF diffs are meaningless,
reported and skipped), 1 = unexcused regressions, 2 = usage/IO error.
Output is line-oriented for the driver: one "REGRESSION ..." line per
finding, then a one-line JSON summary.
"""
import json
import os
import statistics
import subprocess
import sys

RATIO = 1.5
NOISE_SECS = 0.45  # absolute per-query noise floor observed on identical
                   # code (min-of-3 sweeps still swings ~0.5s on this host)
MEDIAN_FLOOR_SECS = 0.05  # queries too small to measure don't vote on drift
DRIFT_CLAMP = (0.5, 2.0)  # beyond this the "drift" is itself suspicious;
                          # clamp so a broken host can't excuse real 2x+ hits
DRIFT_WARN = 1.3   # beyond this, host drift is indistinguishable from a
                   # uniform suite-wide regression — warn so the judge looks
                   # at total_cur vs total_base instead of trusting rc=0
SUSPECT_RATIO = 3.0      # sub-noise queries past this ratio get a re-run
SUSPECT_FLOOR_SECS = 0.02  # below this base, a 3x swing is still < 60ms —
                           # unmeasurable on this host, never worth a re-run


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        return selftest()
    argv = list(sys.argv[1:])
    rerun_cmd = os.environ.get("BENCH_RERUN_CMD")
    if "--rerun-cmd" in argv:
        i = argv.index("--rerun-cmd")
        try:
            rerun_cmd = argv[i + 1]
        except IndexError:
            print("bench_regress: --rerun-cmd needs an argument", file=sys.stderr)
            return 2
        del argv[i:i + 2]
    cur_path = argv[0] if len(argv) > 0 else "bench_detail.json"
    base_path = argv[1] if len(argv) > 1 else "tools/bench_baseline.json"
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
    drift = suite_drift(cq, bq)
    if drift > DRIFT_WARN:
        print(f"WARNING suite drift x{drift:.2f} exceeds {DRIFT_WARN} — if "
              f"code differs from baseline this may be a uniform global "
              f"regression being absorbed as host drift; compare totals: "
              f"base {base.get('value')}s vs cur {cur.get('value')}s")

    def rerun_hook(names):
        if not rerun_cmd:
            return None
        cmd = rerun_cmd.replace("{queries}", " ".join(names))
        print(f"bench_regress: re-running {len(names)} suspect(s): {cmd}")
        try:
            subprocess.run(cmd, shell=True, check=True, timeout=3600)
            # the hook rewrites the CURRENT detail file (whatever path was
            # passed), not the default name — reloading a literal
            # 'bench_detail.json' would confirm suspects against stale data
            # whenever a custom current.json is in play
            return json.load(open(cur_path))["queries"]
        except (OSError, ValueError, KeyError,
                subprocess.SubprocessError) as e:
            print(f"bench_regress: re-run failed ({e}); suspects stay "
                  f"unconfirmed", file=sys.stderr)
            return None

    regressions, excused, suspects = diff(cq, bq, drift, excl, rerun_hook)

    # Cross-round anchor (r12 verdict: the baseline is refreshed inside
    # each round, so slow creep that lands before every refresh is
    # invisible to the gate). tools/bench_anchor.json is a PINNED past
    # sweep that is NOT refreshed; cumulative movement of the common
    # queries against it is REPORTED (never gated — it spans rounds of
    # deliberate code change plus host drift, so it is a judge signal,
    # not a pass/fail).
    anchor_ratio, anchor_med, anchor_n = anchor_report(cq, cur.get("sf"))

    new_queries = sorted(set(cq) - set(bq))
    for r in regressions:
        print(f"REGRESSION {r['query']}: {r['base']:.2f}s -> {r['cur']:.2f}s "
              f"({r['cur_norm']:.2f}s drift-normalized, x{r['ratio']})"
              + (" [confirmed by re-run]" if r.get("confirmed") else ""))
    for r in excused:
        print(f"excused    {r['query']}: {r['base']:.2f}s -> {r['cur']:.2f}s "
              f"(x{r['ratio']}) — {r['excused']}")
    for r in suspects:
        print(f"SUSPECT    {r['query']}: {r['base']:.2f}s -> {r['cur']:.2f}s "
              f"(x{r['ratio']}, under the {NOISE_SECS}s allowance; "
              f"no re-run hook — unconfirmed)")
    print(json.dumps({
        "gate": "fail" if regressions else "ok",
        "sf": cur.get("sf"), "sweeps": [cs, bs], "drift": round(drift, 3),
        "total_base": base.get("value"), "total_cur": cur.get("value"),
        "n_regressions": len(regressions), "n_excused": len(excused),
        "n_new_queries": len(new_queries), "n_suspects": len(suspects),
        "regressions": [r["query"] for r in regressions],
        "suspects": [r["query"] for r in suspects],
        "anchor_ratio": anchor_ratio, "anchor_median": anchor_med,
        "anchor_n": anchor_n,
    }))
    return 1 if regressions else 0


def anchor_report(cq, cur_sf, path="tools/bench_anchor.json"):
    """(total_ratio, median_ratio, n_common) of the current sweep vs the
    pinned cross-round anchor — raw, NOT drift-normalized (cumulative
    movement across rounds cannot separate host drift from creep; the
    median/total pair lets the reader judge: median ~= host drift,
    total >> median = a few queries grew). (None, None, 0) when the
    anchor is missing or at a different SF.
    """
    try:
        anchor = json.load(open(path))
    except (OSError, ValueError):
        return None, None, 0
    if anchor.get("sf") != cur_sf:
        print(f"anchor: SKIP — anchor sf={anchor.get('sf')} vs "
              f"current sf={cur_sf}")
        return None, None, 0
    aq = anchor.get("queries", {})
    common = [q for q in aq if q in cq and aq[q] > 0]
    if len(common) < 8:
        return None, None, 0
    tot = round(sum(cq[q] for q in common) / sum(aq[q] for q in common), 3)
    # materialize before median: an all-fast anchor (< MEDIAN_FLOOR_SECS
    # everywhere) would hand statistics.median an empty sequence and
    # crash the gate — fall back to the unfiltered ratios instead
    floored = [cq[q] / aq[q] for q in common if aq[q] >= MEDIAN_FLOOR_SECS]
    if not floored:
        floored = [cq[q] / aq[q] for q in common]
    med = round(statistics.median(floored), 3)
    print(f"anchor     {len(common)} common queries vs "
          f"{anchor.get('anchor_note', path)}: total x{tot}, median x{med} "
          f"(reported, not gated)")
    return tot, med, len(common)


def diff(cq, bq, drift, excl, rerun_hook):
    """Classify every shared query: regression / excused / suspect.

    Suspects (cur/drift > SUSPECT_RATIO*base yet inside the additive
    allowance — the 0.1s→0.5s blind spot) go through `rerun_hook(names)`
    once; the hook returns a fresh {query: secs} map or None. The
    minimum of the original and re-run time decides: still past
    SUSPECT_RATIO → promoted to a regression (confirmed=True), melted →
    noise, dropped. No hook → reported as unconfirmed suspects.
    """
    regressions, excused, suspects = [], [], []
    for name, b in sorted(bq.items()):
        c = cq.get(name)
        if c is None:
            continue  # removed/renamed queries are the judge's business
        cn = c / drift
        entry = {"query": name, "base": b, "cur": c,
                 "cur_norm": round(cn, 3),
                 "ratio": round(cn / b, 2) if b > 0 else None}
        if cn > RATIO * b + NOISE_SECS:
            if name in excl and name != "_doc":
                entry["excused"] = excl[name].get("why", "")[:120]
                excused.append(entry)
            else:
                regressions.append(entry)
        elif (b >= SUSPECT_FLOOR_SECS and cn > SUSPECT_RATIO * b
              and name not in excl):
            suspects.append(entry)
    if suspects:
        rerun = rerun_hook([r["query"] for r in suspects])
        if rerun is not None:
            confirmed, remaining = [], []
            for r in suspects:
                if r["query"] not in rerun:
                    # the hook ran but produced no fresh measurement for
                    # this query — neither confirmed nor melted; keep it
                    # visible as an (unconfirmed) SUSPECT instead of
                    # silently dropping it or promoting it on stale data
                    remaining.append(r)
                    continue
                best = min(r["cur"], rerun[r["query"]])
                bn = best / drift
                if bn > SUSPECT_RATIO * r["base"]:
                    r.update(cur=best, cur_norm=round(bn, 3),
                             ratio=round(bn / r["base"], 2), confirmed=True)
                    confirmed.append(r)
            regressions.extend(confirmed)
            suspects = remaining
    return regressions, excused, suspects


def suite_drift(cq, bq):
    """Median cur/base over measurable shared queries, clamped.

    The median is robust to any handful of REAL regressions (they are a
    few votes out of hundreds), so dividing it out removes exactly the
    whole-suite host-speed component and nothing else.
    """
    ratios = [cq[n] / b for n, b in bq.items()
              if n in cq and b >= MEDIAN_FLOOR_SECS and cq[n] > 0]
    if len(ratios) < 8:  # too few comparable queries to estimate drift
        return 1.0
    lo, hi = DRIFT_CLAMP
    return min(hi, max(lo, statistics.median(ratios)))


def selftest():
    """Prove both gate directions without touching disk."""
    base = {q: t for q, t in
            [(f"q{i:03d}", 0.2 + (i % 17) * 0.11) for i in range(1, 121)]}
    mk = lambda qs: {"sf": 0.1, "sweeps": 3, "queries": qs,
                     "value": sum(qs.values())}
    def flags(cur, d):
        return [q for q, b in sorted(base.items())
                if cur["queries"][q] / d > RATIO * b + NOISE_SECS]
    # 1) uniform 1.3x host drift on identical code -> clean gate
    drifted = mk({q: t * 1.3 for q, t in base.items()})
    d = suite_drift(drifted["queries"], base)
    assert abs(d - 1.3) < 1e-9, d
    assert flags(drifted, d) == []
    # 2) same drift PLUS one genuine 2x regression on a measurable
    #    (~2s) query -> exactly that query flags
    hit = mk({q: t * 1.3 * (2.0 if q == "q016" else 1.0)
              for q, t in base.items()})
    d = suite_drift(hit["queries"], base)
    assert flags(hit, d) == ["q016"], flags(hit, d)
    # 2b) r9's observed phantom shape — a sub-second query swinging
    #     x1.8 on identical code — stays inside the noise allowance
    phantom = mk({q: t * 1.3 * (1.8 if q == "q002" else 1.0)
                  for q, t in base.items()})
    assert flags(phantom, suite_drift(phantom["queries"], base)) == []
    # 3) clamp: a phantom 3x "drift" cannot excuse itself
    crazy = mk({q: t * 3.0 for q, t in base.items()})
    assert suite_drift(crazy["queries"], base) == DRIFT_CLAMP[1]
    # 4) sub-noise blind spot: 0.1s -> 0.5s sits under the additive
    #    allowance (0.5 < 1.5*0.1+0.45) but past SUSPECT_RATIO; the
    #    re-run CONFIRMS (0.48s) -> promoted to a regression
    sb = dict(base, q900=0.1)
    cur4 = dict(sb, q900=0.5)
    reg, _, sus = diff(cur4, sb, 1.0, {}, lambda names: {"q900": 0.48})
    assert [r["query"] for r in reg] == ["q900"] and reg[0]["confirmed"], reg
    assert sus == []
    # 5) same shape on pure noise: the re-run melts it (0.12s) -> clean
    reg, _, sus = diff(cur4, sb, 1.0, {}, lambda names: {"q900": 0.12})
    assert reg == [] and sus == [], (reg, sus)
    # 6) no re-run hook -> visible unconfirmed SUSPECT, gate still clean
    reg, _, sus = diff(cur4, sb, 1.0, {}, lambda names: None)
    assert reg == [] and [r["query"] for r in sus] == ["q900"], (reg, sus)
    # 7) hook ran but produced no measurement for the suspect -> it stays
    #    a visible SUSPECT (neither silently dropped nor promoted on
    #    stale data)
    reg, _, sus = diff(cur4, sb, 1.0, {}, lambda names: {"q777": 0.2})
    assert reg == [] and [r["query"] for r in sus] == ["q900"], (reg, sus)
    # 8) anchor report: total picks up the one grown query, median
    #    stays at the host-drift floor; missing anchor -> (None, None, 0)
    import tempfile, os as _os
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump({"sf": 0.1, "queries": base,
                   "anchor_note": "selftest"}, f)
        apath = f.name
    cur8 = {q: t * 1.1 * (3.0 if q == "q016" else 1.0)
            for q, t in base.items()}
    tot, med, n = anchor_report(cur8, 0.1, apath)
    _os.unlink(apath)
    assert n == len(base) and med == 1.1 and tot > med, (tot, med, n)
    assert anchor_report(cur8, 0.1, "/nonexistent.json") == (None, None, 0)
    print("selftest ok: drift normalized, real regression caught, "
          "clamp holds, sub-noise suspect confirmed/melted/reported, "
          "anchor reported")
    return 0


if __name__ == "__main__":
    sys.exit(main())
