"""Registry-wide physical-plan inventory — the diffable artifact behind
"the plan IS the product at 100 TB".

For every registered query (built at sf0.001 — plan shape, not data,
is what's inventoried) records the counts that determine scale
behavior:

* ``exchanges``       — data-moving ``Exchange hashpartitioning`` /
                        ``rangepartitioning`` nodes (shuffles)
* ``broadcasts``      — ``BroadcastExchange`` nodes (small-side ships)
* ``python_nodes``    — ``MapInPandas`` / ``ArrowEval`` /
                        ``BatchEvalPython`` / ``FlatMapGroupsInPandas``
                        (Arrow/Python boundaries; row-at-a-time
                        BatchEvalPython should stay ZERO repo-wide)
* ``smj`` / ``bhj``   — sort-merge vs broadcast-hash join strategy mix
* ``cartesian``       — must be 0 (also pinned by
                        tests/test_plans_properties.py)

Usage:
    python scripts/plan_inventory.py --out PLANS_r8.json
    python scripts/plan_inventory.py --out /tmp/now.json \
        --compare PLANS_r8.json       # flags drift, exit 1

Compare flags queries whose ``exchanges``, ``python_nodes``, or
``cartesian`` counts INCREASED vs the baseline (more shuffles or a new
Python boundary is plan drift a refactor should have to justify);
decreases and join-mix changes are reported informationally.

Counting caveat: these are TEXTUAL occurrences in
``executedPlan().toString()``, which prints shared subtrees once per
reference — so a multi-consumer plan inflates its counts (q151 prints
85 "exchanges" for far fewer physical shuffles). The counts are
deterministic for a given plan, which is all drift detection needs;
do NOT read them as job-level shuffle counts.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COUNTERS = {
    "exchanges": re.compile(r"Exchange (hash|range)partitioning"),
    "broadcasts": re.compile(r"BroadcastExchange"),
    "python_nodes": re.compile(
        r"MapInPandas|ArrowEval|BatchEvalPython|FlatMapGroupsInPandas"
    ),
    "smj": re.compile(r"SortMergeJoin"),
    "bhj": re.compile(r"BroadcastHashJoin"),
    "cartesian": re.compile(r"CartesianProduct"),
}
# counters where an INCREASE vs baseline is flagged as drift
DRIFT_KEYS = ("exchanges", "python_nodes", "cartesian")


def inventory(sf_dir: str) -> dict[str, dict[str, int]]:
    from mimic_iv_data_pipeline_spark import get_spark
    from mimic_iv_data_pipeline_spark.queries import all_queries

    spark = get_spark("plan_inventory")
    out: dict[str, dict[str, int]] = {}
    for name, fn in all_queries().items():
        # Each query plans against a COLD cache: queries with reuse=True
        # persist subplans, and CacheManager substitutes those
        # InMemoryRelations into any LATER query sharing the subplan —
        # making every plan depend on registry ORDER (the r9 manifest
        # reorder flipped q39/q128 counts with zero code change). A
        # per-query clear makes the inventory order-independent; a
        # query's OWN persists still show in its own plan, which is
        # intrinsic and deterministic.
        spark.catalog.clearCache()
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # a query that cannot even plan is drift
            out[name] = {"error": 1, "msg": str(exc)[:200]}
            continue
        out[name] = {k: len(rx.findall(plan)) for k, rx in COUNTERS.items()}
    return out


def compare(base: dict, cur: dict) -> tuple[list[str], list[str]]:
    """(drift lines, info lines)."""
    drift, info = [], []
    for name, row in sorted(cur.items()):
        b = base.get(name)
        if b is None:
            info.append(f"NEW query {name}: {row}")
            continue
        if row.get("error"):
            drift.append(f"{name}: fails to plan — {row.get('msg')}")
            continue
        for k in DRIFT_KEYS:
            if row.get(k, 0) > b.get(k, 0):
                drift.append(
                    f"{name}: {k} {b.get(k, 0)} -> {row[k]}"
                )
        for k in COUNTERS:
            if k not in DRIFT_KEYS and row.get(k, 0) != b.get(k, 0):
                info.append(f"{name}: {k} {b.get(k, 0)} -> {row.get(k, 0)}")
    for name in sorted(set(base) - set(cur)):
        info.append(f"REMOVED query {name}")
    return drift, info


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--compare", help="baseline inventory JSON to diff against")
    args = ap.parse_args()

    inv = inventory(args.sf_dir)
    with open(args.out, "w") as f:
        json.dump(inv, f, indent=1, sort_keys=True)
    n_err = sum(1 for r in inv.values() if r.get("error"))
    tot = {k: sum(r.get(k, 0) for r in inv.values()) for k in COUNTERS}
    print(f"{len(inv)} queries inventoried -> {args.out}; totals {tot}; errors {n_err}")

    if args.compare:
        base = json.load(open(args.compare))
        drift, info = compare(base, inv)
        for line in info:
            print(f"  info: {line}")
        if drift:
            print(f"PLAN DRIFT ({len(drift)}):")
            for line in drift:
                print(f"  {line}")
            sys.exit(1)
        print("no plan drift vs", args.compare)


if __name__ == "__main__":
    main()
