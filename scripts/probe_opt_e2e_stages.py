"""Optimization-round probe: per-stage wall-clock of the e2e pipeline.

The bench's e2e entries (`e2e_mimic_pipeline` / `_mem`) are the two
largest headline items (13.9 s + 12.3 s at sf0.1 = 36% of the round-11
gate headline), but the seam probe only measured the TOTAL per handoff
mode. This probe breaks the memory-mode run into its stage boundaries
(guide §1: find where the time actually goes before touching anything)
and times each with the noop sink where the stage is lazy.

Run:  python scripts/probe_opt_e2e_stages.py [sf0.1|sf1] [--runs 2]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402
from mimic_iv_data_pipeline_spark.engine import materialize  # noqa: E402
from mimic_iv_data_pipeline_spark.plans.cohort import extract_cohort  # noqa: E402
from mimic_iv_data_pipeline_spark.plans.features import (  # noqa: E402
    clean_events,
    generate_summary,
    preproc_events,
)
from mimic_iv_data_pipeline_spark.plans.ml_assembly import (  # noqa: E402
    dl_tensor_frame,
    ml_feature_matrix,
)
from mimic_iv_data_pipeline_spark.plans.pipeline import (  # noqa: E402
    PipelineConfig,
    _collect_feature_vocab,
)
from mimic_iv_data_pipeline_spark.plans.timeseries import generate_timeseries  # noqa: E402


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_name = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("-") else "sf0.1"
    runs = int(sys.argv[sys.argv.index("--runs") + 1]) if "--runs" in sys.argv else 2
    spark = get_spark("probe_e2e_stages")
    sc = spark.sparkContext
    for _ in range(2):
        spark.range(1_000_000).selectExpr("id % 7 AS k").groupBy("k").count().count()

    cfg = PipelineConfig(include_hours=48, bucket_hours=2)
    for rep in range(runs):
        tables = bench._e2e_tables(spark, f"/tmp/{sf_name}")
        t_all0 = time.perf_counter()
        times: list[tuple[str, float]] = []

        def stage(name, fn):
            sc.setJobDescription(f"e2e-stage: {name}")
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            times.append((name, dt))
            sc.setJobDescription(None)
            return out

        cohort = stage(
            "cohort (extract+materialize)",
            lambda: materialize(
                extract_cohort(
                    tables["visits"], tables["patients"], tables.get("admissions"),
                    use_icu=cfg.use_icu, label=cfg.label, gap_days=cfg.gap_days,
                    los_threshold_hours=cfg.los_threshold_hours, min_age=cfg.min_age,
                )
            ),
        )
        events = stage(
            "events (preproc+clean+materialize)",
            lambda: materialize(
                clean_events(
                    preproc_events(tables["events"], cohort, "stay_id", "charttime", "intime"),
                    uom_cutoff=cfg.uom_cutoff, outlier_pcts=cfg.outlier_pcts,
                )
            ),
        )
        stage(
            "summary (noop)",
            lambda: noop(generate_summary(events, "stay_id", "itemid", "valuenum")),
        )
        dense = stage(
            "timeseries (dense grid+impute+materialize)",
            lambda: materialize(
                generate_timeseries(
                    events.withColumnRenamed("event_time_from_admit", "t"), cohort,
                    id_col="stay_id", time_col="t", include_hours=cfg.include_hours,
                    bucket_hours=cfg.bucket_hours, anchor="first", impute=cfg.impute,
                )
            ),
        )
        codes = stage("vocab collect", lambda: _collect_feature_vocab(dense, cap=cfg.max_feature_vocab))
        stage(
            "features pivot (noop)",
            lambda: noop(ml_feature_matrix(dense, id_col="stay_id", feature_codes=codes, agg="mean")),
        )
        stage("tensors (noop)", lambda: noop(dl_tensor_frame(dense, id_col="stay_id")))
        total = time.perf_counter() - t_all0
        print(f"--- {sf_name} rep{rep}: total {total:6.2f} s")
        for name, dt in times:
            print(f"    {dt:6.2f} s  {name}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
