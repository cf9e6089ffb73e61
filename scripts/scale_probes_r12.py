"""Round-12 sf1 core-scaling battery (VERDICT r11 item 8).

At sf0.1 the driver's 8-core-vs-32-core block measures per-action fixed
overhead, not compute (every ratio 0.59-1.24 — BENCH_r11_c8). This
battery re-asks the question at sf1 (10×), where the slowest entries
have real work: run the ten most expensive bench queries (all of whose
inputs are covered by scripts/gen_sf1.py's four scaled tables, plus the
sf-parameterised e2e generators) under the bench methodology (warm-up
+ min-of-2, fn().count()) in ONE process pinned by SPARK_GRAFT_CPUS.

Run (two processes, compare):
    python scripts/gen_sf1.py                      # once
    SPARK_GRAFT_CPUS=32 python scripts/scale_probes_r12.py > /tmp/sf1_c32.json
    SPARK_GRAFT_CPUS=8  python scripts/scale_probes_r12.py > /tmp/sf1_c8.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402

SF1_DIR = os.path.join(REPO, ".sf1", "sf1")

# the slowest r12-baseline entries whose inputs are sf1-covered
BATTERY = [
    "q168_association_rules",   # lineitem
    "q92_edit_distance_join",   # customer
    "q99_edit_distance_sparse", # customer
    "q190_naive_bayes",         # documents
    "q210_geo_clusters",        # customer
    "q153_funnel",              # events
    "q142_pagerank",            # lineitem
    "q88_dedup_clean",          # documents
    "q180_bootstrap_ci",        # events
    "q65_contamination",        # documents
    "e2e_mimic_pipeline",       # generated (sf parsed from dir name)
]

ONCE = {"e2e_mimic_pipeline"}


def main() -> None:
    if not os.path.isdir(SF1_DIR):
        raise SystemExit("run scripts/gen_sf1.py first")
    spark = get_spark("scale_probes_r12")
    import bench  # noqa: E402
    from mimic_iv_data_pipeline_spark.queries import all_queries  # noqa: E402

    queries = {**all_queries(), **bench.EXTRA}
    for _ in range(2):
        spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    def canary() -> float:
        q = spark.range(50_000_000).selectExpr("id % 9973 AS k")
        q.groupBy("k").count().count()
        t0 = time.perf_counter()
        q.groupBy("k").count().count()
        return round(time.perf_counter() - t0, 3)

    c0 = canary()
    out: dict[str, float] = {}
    for name in BATTERY:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"sf1 {name}")
        if name in ONCE:
            t0 = time.perf_counter()
            fn(spark, SF1_DIR).count()
            best = time.perf_counter() - t0
        else:
            fn(spark, SF1_DIR).count()  # codegen warm-up
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, SF1_DIR).count()
                best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}", file=sys.stderr, flush=True)
    c1 = canary()
    print(json.dumps({
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "sf_dir": SF1_DIR,
        "canary": [c0, c1],
        "queries": out,
        "total": round(sum(out.values()), 3),
    }))


if __name__ == "__main__":
    main()
