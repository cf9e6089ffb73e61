"""r12 probe: per-query DataFrame CONSTRUCTION cost (driver-side py4j +
analysis), guide §5. The bench times fn() + count(), so DAG construction
is inside the timed region of every entry; unlike executor wall-clock it
is deterministic on this host, so even ~50 ms is resolvable evidence.

Run:  python scripts/probe_r12_buildcost.py [--reps 3] [--min-ms 40]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 3
    min_ms = float(sys.argv[sys.argv.index("--min-ms") + 1]) if "--min-ms" in sys.argv else 40.0
    spark = get_spark("probe_buildcost")
    import bench  # noqa: E402
    from mimic_iv_data_pipeline_spark.queries import all_queries  # noqa: E402

    queries = dict(all_queries())
    sf_dir = "/root/testdata/sf0.1"
    rows = []
    for name, fn in sorted(queries.items()):
        best_build = best_plan = float("inf")
        try:
            for _ in range(reps):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                t1 = time.perf_counter()
                df._jdf.queryExecution().executedPlan()
                t2 = time.perf_counter()
                best_build = min(best_build, t1 - t0)
                best_plan = min(best_plan, t2 - t1)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            continue
        rows.append((name, best_build * 1000, best_plan * 1000))
    rows.sort(key=lambda r: -(r[1] + r[2]))
    print(f"{'query':42s} {'build_ms':>9s} {'plan_ms':>9s}")
    for name, b, p in rows:
        if b + p >= min_ms:
            print(f"{name:42s} {b:9.1f} {p:9.1f}")
    total = sum(b + p for _, b, p in rows)
    print(f"-- battery total construction+planning: {total/1000:.2f} s over {len(rows)} queries")
    spark.stop()


if __name__ == "__main__":
    main()
