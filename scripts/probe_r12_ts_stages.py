"""r12 probe: stage-level metrics for the e2e timeseries dense compute.

Builds the pipeline's exact timeseries subtree (same upstream cleaning,
same PipelineConfig regime) and noop-sinks it with the Spark UI on, then
dumps per-stage executorRunTime / cpuTime / task counts so the ~3 s of
warm wall-clock can be attributed (guide §1).

Run:  python scripts/probe_r12_ts_stages.py [--runs 3]
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
from mimic_iv_data_pipeline_spark.engine import materialize  # noqa: E402
from mimic_iv_data_pipeline_spark.plans.cohort import extract_cohort  # noqa: E402
from mimic_iv_data_pipeline_spark.plans.features import clean_events, preproc_events  # noqa: E402
from mimic_iv_data_pipeline_spark.plans.pipeline import PipelineConfig  # noqa: E402
from mimic_iv_data_pipeline_spark.plans.timeseries import generate_timeseries  # noqa: E402


def main() -> None:
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 3
    spark = get_spark("probe_ts_stages", **{"spark.ui.enabled": "true"})
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

    sc.setJobDescription("ts-dense warmup")
    dense().write.format("noop").mode("overwrite").save()

    marker = sc.statusTracker()  # noqa: F841  (kept simple: stages are cumulative)
    base = sc.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{base}/api/v1/applications"))[0]["id"]

    def stage_rows():
        return json.load(
            urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete")
        )

    before_ids = {s["stageId"] for s in stage_rows()}
    sc.setJobDescription("ts-dense timed")
    raws = []
    for _ in range(runs):
        t0 = time.perf_counter()
        dense().write.format("noop").mode("overwrite").save()
        raws.append(time.perf_counter() - t0)
    print(f"ts dense noop: min {min(raws):.3f} s  (raws: {' '.join(f'{r:.3f}' for r in raws)})")

    rows = [s for s in stage_rows() if s["stageId"] not in before_ids]
    rows.sort(key=lambda s: -(s.get("executorRunTime") or 0))
    print(f"stages across the {runs} timed runs (per-run averages = /{runs}):")
    for s in rows:
        print(
            f"  stage {s['stageId']:>4}: run {s['executorRunTime']/1000:7.2f}s "
            f"cpu {s.get('executorCpuTime',0)/1e9:7.2f}s gc {s.get('jvmGcTime',0)/1000:6.2f}s "
            f"deser {s.get('executorDeserializeTime',0)/1000:6.2f}s "
            f"fetch {s.get('shuffleFetchWaitTime',0)/1000:5.2f}s "
            f"tasks {s['numCompleteTasks']:>4} "
            f"in {s.get('inputBytes',0)>>20}MB shR {s.get('shuffleReadBytes',0)>>20}MB "
            f"shW {s.get('shuffleWriteBytes',0)>>20}MB  {s['name'][:70]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
