"""CLI: run the full pipeline against parquet inputs.

    python -m mimic_iv_data_pipeline_spark \
        --visits icustays.parquet --patients patients.parquet \
        --admissions admissions.parquet --events chartevents.parquet \
        --out ./out --label mortality --include-hours 24

Mirrors ``mainPipeline.ipynb``'s widget flow as flags.
"""

from __future__ import annotations

import argparse

from mimic_iv_data_pipeline_spark import get_spark
from mimic_iv_data_pipeline_spark.plans.pipeline import PipelineConfig, run_pipeline


def main() -> None:
    ap = argparse.ArgumentParser(prog="mimic_iv_data_pipeline_spark")
    ap.add_argument("--visits", required=True, help="icustays/admissions parquet")
    ap.add_argument("--patients", required=True)
    ap.add_argument("--admissions")
    ap.add_argument("--events", required=True, help="chart/lab events parquet")
    ap.add_argument("--out", required=True)
    ap.add_argument("--label", default="mortality", choices=["mortality", "readmission", "los"])
    ap.add_argument("--hosp", action="store_true", help="hospital-level (default ICU)")
    ap.add_argument("--gap-days", type=int, default=30)
    ap.add_argument("--los-threshold-hours", type=int, default=72)
    ap.add_argument("--include-hours", type=int, default=24)
    ap.add_argument("--bucket-hours", type=int, default=1)
    ap.add_argument("--impute", default="mean", choices=["mean", "median", "none"])
    args = ap.parse_args()

    spark = get_spark("pipeline")
    tables = {
        "visits": spark.read.parquet(args.visits),
        "patients": spark.read.parquet(args.patients),
        "events": spark.read.parquet(args.events),
    }
    if args.admissions:
        tables["admissions"] = spark.read.parquet(args.admissions)

    cfg = PipelineConfig(
        use_icu=not args.hosp,
        label=args.label,
        gap_days=args.gap_days,
        los_threshold_hours=args.los_threshold_hours,
        include_hours=args.include_hours,
        bucket_hours=args.bucket_hours,
        impute=None if args.impute == "none" else args.impute,
    )
    stages = run_pipeline(spark, tables, args.out, cfg)
    for label_row in stages["cohort_summary"].collect():
        print(f"label={label_row['label']}: {label_row['n_visits']} visits, "
              f"{label_row['n_subjects']} subjects")
    print(f"stages written under {args.out}: cohort events summary timeseries features tensors")


if __name__ == "__main__":
    main()
