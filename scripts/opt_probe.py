"""Optimization-round helper: isolate queries with the noop sink and
capture their formatted plans.

guide §1.4: `df.write.format("noop")` computes every column of every row
without sink cost; §1.5: jobs are labelled. For each named query this
prints min-of-N noop wall-clock (after one codegen warm-up) and, with
--plans DIR, writes `DIR/<name>_<tag>.txt` containing
`.explain("formatted")`.

Run:  python scripts/opt_probe.py q180_bootstrap_ci q92_edit_distance_join \
          [--sf /root/testdata/sf0.1] [--runs 2] [--plans plans/r11 --tag before]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]

    def opt(flag, default=None):
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    sf_dir = opt("--sf", "/root/testdata/sf0.1")
    runs = int(opt("--runs", "2"))
    plans_dir = opt("--plans")
    tag = opt("--tag", "before")
    stages = "--stages" in args
    if stages:
        args.remove("--stages")
    names = args
    if not names:
        raise SystemExit("usage: opt_probe.py <query> [...] [--sf DIR] [--runs N] [--plans DIR --tag T] [--stages]")

    overrides = {"spark.ui.enabled": "true"} if stages else {}
    spark = get_spark("opt_probe", **overrides)
    sc = spark.sparkContext
    import bench  # noqa: E402
    from mimic_iv_data_pipeline_spark.queries import all_queries  # noqa: E402

    queries = {**all_queries(), **bench.EXTRA}
    for _ in range(2):
        spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    for name in names:
        fn = queries[name]
        df = fn(spark, sf_dir)
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
        sc.setJobDescription(f"opt_probe: {name}")
        df.write.format("noop").mode("overwrite").save()  # codegen warm-up
        best = float("inf")
        raws = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            raws.append(dt)
            best = min(best, dt)
        sc.setJobDescription(None)
        print(f"{best:8.3f} s  {name}   (raws: {' '.join(f'{r:.3f}' for r in raws)})", flush=True)
        if stages:
            import json
            import urllib.request

            base = sc.uiWebUrl
            app = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))[0]["id"]
            rows = json.load(
                urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete")
            )
            rows.sort(key=lambda s: -(s.get("executorRunTime") or 0))
            print("    top stages by executorRunTime (cumulative over all probe runs):")
            for s in rows[:10]:
                print(
                    f"      stage {s['stageId']:>4} attempt {s['attemptId']}: "
                    f"run {s['executorRunTime']/1000:7.2f}s cpu {s.get('executorCpuTime',0)/1e9:7.2f}s "
                    f"tasks {s['numCompleteTasks']:>4} in {s.get('inputBytes',0)>>20}MB "
                    f"shRead {s.get('shuffleReadBytes',0)>>20}MB shWrite {s.get('shuffleWriteBytes',0)>>20}MB  "
                    f"{(s.get('description') or s['name'])[:80]}"
                )
    spark.stop()


if __name__ == "__main__":
    main()
