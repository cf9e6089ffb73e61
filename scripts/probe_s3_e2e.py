"""r12 third-session probe: where do the e2e twins' seconds go NOW?

Runs each handoff mode once (cold-ish: fresh process per mode is the
caller's job; in-process we at least run parquet first, mem second) and
dumps the job timeline from the UI REST API — submission/completion
per job, so serial driver gaps (construction, vocab collect, boundary
sequencing) show up as holes between jobs.

Usage: python scripts/probe_s3_e2e.py [parquet|memory]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "parquet"
    spark = get_spark("probe_s3_e2e", **{"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    # warm the JVM + schema catalog the way the bench's earlier entries do
    for _ in range(2):
        spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    base = sc.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))[0]["id"]

    def jobs():
        return json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs?status=succeeded")
        )

    n_iter = int(os.environ.get("PROBE_ITERS", "2"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for it in range(n_iter - 1):
        t0 = time.perf_counter()
        bench._run_e2e(spark, sf_dir, mode)
        print(f"{mode} iter {it}: wall {time.perf_counter() - t0:.3f} s")

    before = {j["jobId"] for j in jobs()}
    t0 = time.perf_counter()
    bench._run_e2e(spark, sf_dir, mode)
    wall = time.perf_counter() - t0

    import datetime as dt

    def ts(s):
        return dt.datetime.strptime(s[:-3], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    rows = [j for j in jobs() if j["jobId"] not in before]
    rows.sort(key=lambda j: j["jobId"])
    if not rows:
        print(f"{mode}: wall {wall:.3f} s, no jobs?!")
        return
    origin = min(ts(j["submissionTime"]) for j in rows)
    print(f"=== {mode}: wall {wall:.3f} s, {len(rows)} jobs ===")
    prev_end = 0.0
    for j in rows:
        sub = ts(j["submissionTime"]) - origin
        done = ts(j["completionTime"]) - origin
        gap = sub - prev_end
        prev_end = max(prev_end, done)
        print(
            f"  job {j['jobId']:>4} {sub:7.3f}->{done:7.3f} ({done-sub:6.3f} s)"
            f" gap {gap:+6.3f}  tasks {j['numCompletedTasks']:>4}  "
            f"{(j.get('description') or j['name'])[:78]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
