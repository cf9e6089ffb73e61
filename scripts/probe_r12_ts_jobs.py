"""r12 follow-up: job-level attribution + planning-vs-execution split for
the e2e timeseries dense subtree (see probe_r12_ts_stages.py)."""

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
from mimic_iv_data_pipeline_spark.engine import materialize  # noqa: E402
from mimic_iv_data_pipeline_spark.plans.cohort import extract_cohort  # noqa: E402
from mimic_iv_data_pipeline_spark.plans.features import clean_events, preproc_events  # noqa: E402
from mimic_iv_data_pipeline_spark.plans.pipeline import PipelineConfig  # noqa: E402
from mimic_iv_data_pipeline_spark.plans.timeseries import generate_timeseries  # noqa: E402


def main() -> None:
    spark = get_spark("probe_ts_jobs", **{"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    for _ in range(2):
        spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    cfg = PipelineConfig(include_hours=48, bucket_hours=2)
    tables = bench._e2e_tables(spark, "/tmp/sf0.1")
    cohort = materialize(
        extract_cohort(
            tables["visits"], tables["patients"], tables.get("admissions"),
            use_icu=cfg.use_icu, label=cfg.label, gap_days=cfg.gap_days,
            los_threshold_hours=cfg.los_threshold_hours, min_age=cfg.min_age,
        )
    )
    events = materialize(
        clean_events(
            preproc_events(tables["events"], cohort, "stay_id", "charttime", "intime"),
            uom_cutoff=cfg.uom_cutoff, outlier_pcts=cfg.outlier_pcts,
        )
    )

    def dense():
        return generate_timeseries(
            events.withColumnRenamed("event_time_from_admit", "t"), cohort,
            id_col="stay_id", time_col="t", include_hours=cfg.include_hours,
            bucket_hours=cfg.bucket_hours, anchor="first", impute=cfg.impute,
        )

    dense().write.format("noop").mode("overwrite").save()  # warm

    # planning-only cost: build + analyze + optimize + physical plan
    for _ in range(3):
        t0 = time.perf_counter()
        df = dense()
        t1 = time.perf_counter()
        df._jdf.queryExecution().executedPlan()
        t2 = time.perf_counter()
        print(f"build {t1-t0:6.3f} s   plan-to-physical {t2-t1:6.3f} s")

    base = sc.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))[0]["id"]

    def jobs():
        return json.load(urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs"))

    before = {j["jobId"] for j in jobs()}
    t0 = time.perf_counter()
    dense().write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    rows = [j for j in jobs() if j["jobId"] not in before]
    rows.sort(key=lambda j: j["jobId"])
    print(f"timed run wall {wall:.3f} s; jobs:")
    for j in rows:
        t_sub = j.get("submissionTime", "")
        t_done = j.get("completionTime", "")
        print(
            f"  job {j['jobId']:>4} tasks {j['numCompletedTasks']:>4} "
            f"stages {j['stageIds']} {t_sub[-12:]} -> {t_done[-12:]}  {j['name'][:70]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
