"""r12 probe: count py4j round-trips per source line during DataFrame
construction (guide §5 — driver time). On this host each round-trip is
~1 ms, so call counts map 1:1 to construction milliseconds.

Run:  python scripts/probe_r12_py4j_calls.py q210_geo_clusters [qNNN ...]
"""

from __future__ import annotations

import collections
import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("probe_py4j_calls")
    from mimic_iv_data_pipeline_spark.queries import all_queries  # noqa: E402

    queries = dict(all_queries())
    sf_dir = "/root/testdata/sf0.1"

    import py4j.java_gateway as jg

    counters: dict[str, collections.Counter] = {}
    active: list[str] = []
    orig = jg.GatewayClient.send_command

    def counted(self, *a, **kw):
        if active:
            # attribute to the innermost repo frame
            for frame in reversed(traceback.extract_stack()):
                if "/mimic_iv_data_pipeline_spark/" in frame.filename or frame.filename.endswith("bench.py"):
                    key = f"{os.path.relpath(frame.filename, REPO)}:{frame.lineno}"
                    break
            else:
                key = "<outside repo>"
            counters[active[-1]][key] += 1
            counters[active[-1]]["<TOTAL>"] += 1
        return orig(self, *a, **kw)

    jg.GatewayClient.send_command = counted

    for name in names:
        fn = queries[name]
        fn(spark, sf_dir)  # warm (first read.parquet lists files)
        counters[name] = collections.Counter()
        active.append(name)
        df = fn(spark, sf_dir)
        df._jdf.queryExecution().executedPlan()
        active.pop()
        c = counters[name]
        total = c.pop("<TOTAL>", 0)
        print(f"\n=== {name}: {total} py4j calls (~{total:.0f} ms at 1 ms/call)")
        for key, n in c.most_common(25):
            print(f"  {n:6d}  {key}")

    jg.GatewayClient.send_command = orig
    spark.stop()


if __name__ == "__main__":
    main()
