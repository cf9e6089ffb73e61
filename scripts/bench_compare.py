"""Canary-normalized cross-round bench comparison.

BENCH_r07 started recording ``canary_sec`` — a fixed single-threaded
CPU workload run just before the query battery, so host contention
(the driver shares its box) can be divided OUT of cross-round ratios
instead of hand-waved in prose (the r7 q92 "inversion" was exactly
this: driver canary 0.507 vs builder-clean 0.365).

Usage:
    python scripts/bench_compare.py OLD NEW [--gate-ratio 1.3]
                                           [--gate-abs 0.2]

OLD / NEW are either driver-recorded ``BENCH_r{N}.json`` files (the
``{"parsed": {...}}`` wrapper) or a raw one-line JSON from
``python bench.py > out.json``. For each query present in both, prints
raw ratio, canary-adjusted ratio, and flags only queries whose
ADJUSTED ratio exceeds the gate (ratio > --gate-ratio AND absolute
slowdown > --gate-abs seconds — the same two-sided gate PERF.md has
used since r5, now applied after contention normalization). Exit code
1 when any query is flagged, so the round ledger can cite a single
command instead of a by-hand table.

When either side lacks ``canary_sec`` (rounds before r7), the canary
ratio falls back to 1.0 and the output says so — the comparison is
then exactly the old unadjusted one.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_bench(path: str) -> dict:
    """Return the inner bench dict {metric, value, queries, canary_sec?}."""
    with open(path) as f:
        data = json.load(f)
    if "parsed" in data and isinstance(data["parsed"], dict):
        data = data["parsed"]
    if "queries" not in data:
        raise SystemExit(f"{path}: no 'queries' key — not a bench JSON")
    return data


def _canary_of(b: dict):
    """Worst of the start/end canaries (end added in r8: a start-only
    sample misses mid-run contention bursts)."""
    vals = [v for v in (b.get("canary_sec"), b.get("canary_end_sec")) if v]
    return max(vals) if vals else None


def _best_canary_of(b: dict):
    """BEST of the canaries — the run's closest observation of the
    unloaded host, used by min-of-runs mode where each query time is
    also its best observation."""
    vals = [v for v in (b.get("canary_sec"), b.get("canary_end_sec")) if v]
    return min(vals) if vals else None


def min_of_runs(benches: list[dict]) -> dict:
    """Collapse N same-code runs to their per-query minimum, with the
    minimum canary observed across all runs.

    Single-run canary normalization assumes contention is STATIONARY
    within a run — one scalar can't represent a host whose speed
    drifts mid-battery (r9 measured a 1.4x single-thread slowdown
    across four same-morning runs with zero local load: external
    co-tenancy). The robust protocol — the one the r8 verdict used to
    settle q92 and q142 — is the per-query min over several runs:
    each query's best time is its least-contended observation, paired
    with the best canary as the matching host estimate.
    """
    if not benches:
        raise ValueError("min_of_runs: no runs")
    queries: dict[str, float] = {}
    for b in benches:
        for q, t in b["queries"].items():
            queries[q] = min(queries.get(q, float("inf")), t)
    canaries = [c for c in (_best_canary_of(b) for b in benches) if c]
    return {
        "queries": queries,
        "value": round(sum(queries.values()), 3),
        "canary_sec": min(canaries) if canaries else None,
        "n_runs": len(benches),
    }


def compare(old: dict, new: dict, gate_ratio: float, gate_abs: float) -> dict:
    canary_old = _canary_of(old)
    canary_new = _canary_of(new)
    if canary_old and canary_new:
        canary_ratio = canary_new / canary_old
    else:
        canary_ratio = 1.0
    rows = []
    flagged = []
    common = sorted(set(old["queries"]) & set(new["queries"]))
    for q in common:
        o, n = old["queries"][q], new["queries"][q]
        raw = n / o if o else float("inf")
        adj = raw / canary_ratio
        # the absolute leg of the gate is also canary-adjusted: the
        # slowdown attributable to the code is (adjusted - 1) * old
        is_flagged = adj > gate_ratio and (adj - 1.0) * o > gate_abs
        rows.append({"query": q, "old": o, "new": n, "raw_ratio": raw,
                     "adj_ratio": adj, "flagged": is_flagged})
        if is_flagged:
            flagged.append(q)
    return {
        "canary_old": canary_old,
        "canary_new": canary_new,
        "canary_ratio": canary_ratio,
        "n_common": len(common),
        "only_old": sorted(set(old["queries"]) - set(new["queries"])),
        "only_new": sorted(set(new["queries"]) - set(old["queries"])),
        "rows": rows,
        "flagged": flagged,
        "headline_old": old.get("value"),
        "headline_new": new.get("value"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new", nargs="+",
                    help="one bench JSON, or several same-code runs "
                         "(collapsed per-query-min; see min_of_runs)")
    ap.add_argument("--gate-ratio", type=float, default=1.3)
    ap.add_argument("--gate-abs", type=float, default=0.2)
    ap.add_argument("--old-extra", nargs="*", default=[],
                    help="additional same-code runs of the OLD side "
                         "(e.g. bench_runs_r9/*.json) — collapsed with "
                         "the old file via per-query min, so both sides "
                         "of the gate use least-contended observations "
                         "(r9 ADVICE: minima on only the new side can "
                         "mask small genuine regressions below the "
                         "contention noise floor)")
    args = ap.parse_args()

    old = load_bench(args.old)
    if args.old_extra:
        old = min_of_runs([old] + [load_bench(p) for p in args.old_extra])
        print(f"old side: min-of-{old['n_runs']} committed runs")
    if len(args.new) == 1:
        new = load_bench(args.new[0])
    else:
        new = min_of_runs([load_bench(p) for p in args.new])
        # min-vs-min: the old side's best canary is the comparable host
        # estimate for its (single) run of per-query times
        old = dict(old)
        old["canary_sec"] = _best_canary_of(old) or old.get("canary_sec")
        old.pop("canary_end_sec", None)
        print(f"min-of-{new['n_runs']} runs mode: per-query minima, "
              f"best canaries both sides")

    res = compare(old, new, args.gate_ratio, args.gate_abs)

    if res["canary_old"] and res["canary_new"]:
        print(f"canary: {res['canary_old']:.3f}s -> {res['canary_new']:.3f}s "
              f"(host factor {res['canary_ratio']:.3f} divided out)")
    else:
        print("canary: absent on one side — ratios are UNADJUSTED")
    print(f"headline: {res['headline_old']} -> {res['headline_new']} s; "
          f"{res['n_common']} queries compared")
    if res["only_old"]:
        print(f"dropped since old: {', '.join(res['only_old'])}")
    if res["only_new"]:
        print(f"new since old: {', '.join(res['only_new'])}")
    print(f"{'query':38s} {'old':>7s} {'new':>7s} {'raw':>6s} {'adj':>6s}")
    for r in sorted(res["rows"], key=lambda r: -r["adj_ratio"]):
        mark = "  <-- FLAGGED" if r["flagged"] else ""
        print(f"{r['query']:38s} {r['old']:7.3f} {r['new']:7.3f} "
              f"{r['raw_ratio']:6.2f} {r['adj_ratio']:6.2f}{mark}")
    if res["flagged"]:
        print(f"\nFLAGGED ({len(res['flagged'])}): canary-adjusted ratio > "
              f"{args.gate_ratio} AND adjusted slowdown > {args.gate_abs}s")
        sys.exit(1)
    print("\nno canary-adjusted regressions")


if __name__ == "__main__":
    main()
