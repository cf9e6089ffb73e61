"""r12 third-session probe: per-query GC tax across the full HEADLINE
battery, bench-faithful methodology (run-0 codegen warm-up + min-of-2
timed executions; ONCE entries once), sampling the JVM's
GarbageCollectorMXBean totals around each query.

Usage: SPARK_GRAFT_GC_OPTS=... python scripts/probe_s3_gc.py [tag]
Prints one line per query: name, best sec, total wall sec spent in the
query incl. warm-up, GC ms observed during that window, plus battery
totals — so the collector's tax is attributable per entry instead of
only visible as headline variance.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402
from mimic_iv_data_pipeline_spark.queries import all_queries  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "gc"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe_s3_gc")
    jvm = spark.sparkContext._jvm
    beans = jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()

    def gc_ms() -> float:
        total = 0
        it = beans.iterator()
        while it.hasNext():
            total += it.next().getCollectionTime()
        return total

    spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()
    queries = {**all_queries(), **bench.EXTRA}

    rows = []
    t_bat0, g_bat0 = time.perf_counter(), gc_ms()
    for name in bench.HEADLINE:
        fn = queries[name]
        t0, g0 = time.perf_counter(), gc_ms()
        if name in bench.ONCE:
            ts = time.perf_counter()
            fn(spark, sf_dir).count()
            best = time.perf_counter() - ts
        else:
            fn(spark, sf_dir).count()  # codegen warm-up
            best = float("inf")
            for _ in range(2):
                ts = time.perf_counter()
                fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - ts)
        rows.append(
            {
                "q": name,
                "best": round(best, 3),
                "wall": round(time.perf_counter() - t0, 3),
                "gc_ms": round(gc_ms() - g0, 1),
            }
        )
    bat_wall = time.perf_counter() - t_bat0
    bat_gc = gc_ms() - g_bat0
    for r in sorted(rows, key=lambda r: -r["gc_ms"]):
        print(f"{r['gc_ms']:>8.0f} ms gc  best {r['best']:7.3f}  wall {r['wall']:7.3f}  {r['q']}")
    total_best = sum(r["best"] for r in rows)
    print(
        f"[{tag}] battery wall {bat_wall:.1f} s, GC {bat_gc/1000:.2f} s "
        f"({100*bat_gc/1000/bat_wall:.1f}%), sum-of-best {total_best:.3f} s"
    )
    with open(f"/tmp/probe_s3_gc_{tag}.json", "w") as f:
        json.dump({"rows": rows, "bat_wall": bat_wall, "bat_gc_ms": bat_gc}, f)
    spark.stop()


if __name__ == "__main__":
    main()
