"""Round-5 fourth/fifth-wave scale probes at ~100× sf0.1 (method
identical to scale_probes_r5.py — synthesize in-session, time the warm
second run).

Families probed:
  * rolling_window (q171): 20M events / 200k users, trailing RANGE
    frame — the per-row frame re-aggregation cost at depth;
  * merge_intervals (q172): 10M intervals / 100k keys;
  * ewma + cusum (q173/q174): 20M rows / 200k keys — array-fold
    recurrence vs two-window prefix identity, head to head;
  * roc_pr_curve (q175): 20M scored rows at two score cardinalities
    (1k grouped thresholds vs 100k) — curve size is the scale knob;
  * lift_gains (q176): 20M rows through the distributed global rank;
  * grouped_linreg + seasonal_zscore (q177/q178): 20M rows — the
    exact-sum aggregate and the broadcast-stats join;
  * acf (q179): 100k keys x 300 steps (30M rows) — shared window pass
    for all 7 shifts;
  * poisson_bootstrap_ci (q180): 2M rows x B=40 replicates (80M
    weighted partials through one map-side-combined aggregate).

Usage: python scripts/scale_probes_r5d.py [probe ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402


def _timed(tag, fn):
    fn()  # codegen warm-up
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt:.2f} s  ({n} rows)")
    return dt


def _events(spark, n_rows, n_keys, n_ts):
    return spark.range(n_rows).select(
        (F.xxhash64("id") % n_keys).alias("k"),
        F.timestamp_seconds(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_ts))).alias(
            "ts"
        ),
        F.col("id").alias("rid"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000))).alias("x"),
    )


def probe_rolling(spark):
    from mimic_iv_data_pipeline_spark.operators.windows import rolling_window

    ev = _events(spark, 20_000_000, 200_000, 1_000_000)
    # filter on the rolled column so pruning can't drop the window
    _timed(
        "[rolling] 20M events / 200k keys, 3600s RANGE frame (~up to 360 peers)",
        lambda: rolling_window(
            ev, "k", "ts", {"n": F.count(F.lit(1)), "s": F.sum("x")}, 3600
        )
        .where(F.col("s") >= 0)
        .count(),
    )


def probe_intervals(spark):
    from mimic_iv_data_pipeline_spark.operators.temporal import merge_intervals

    start = F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000))
    iv = spark.range(10_000_000).select(
        (F.xxhash64("id") % 100_000).alias("k"),
        start.alias("s"),
        (start + F.pmod(F.xxhash64("id", F.lit(2)), F.lit(40))).alias("e"),
    )
    _timed(
        "[intervals] 10M intervals / 100k keys, islands merge",
        lambda: merge_intervals(iv, "k", "s", "e").count(),
    )


def probe_recurrences(spark):
    from mimic_iv_data_pipeline_spark.operators.windows import cusum, ewma

    ev = _events(spark, 20_000_000, 200_000, 1_000_000)
    # filter on the recurrence column so pruning can't drop it
    _timed(
        "[ewma] 20M rows / 200k keys (array fold, alpha=0.25)",
        lambda: ewma(ev, "k", "ts", "x", alpha=0.25, tie_break="rid")
        .where(F.col("ewma") >= 0)
        .count(),
    )
    _timed(
        "[cusum] 20M rows / 200k keys (two-window prefix identity)",
        lambda: cusum(ev, "k", "ts", "x", target=5000, tie_break="rid")
        .where(F.col("cusum_plus") >= 0)
        .count(),
    )


def probe_roc(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import roc_pr_curve

    for nscores in (1_000, 100_000):
        scored = spark.range(20_000_000).select(
            (F.pmod(F.xxhash64("id"), F.lit(nscores)) / 1e3).alias("score"),
            (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)) == 0)
            .cast("long")
            .alias("y"),
        )
        _timed(
            f"[roc] 20M rows, {nscores} thresholds",
            lambda s=scored: roc_pr_curve(s, "score", "y").count(),
        )


def probe_lift(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import lift_gains

    scored = spark.range(20_000_000).select(
        F.col("id").alias("rid"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1e3).alias("score"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)) == 0).cast("long").alias("y"),
    )
    _timed(
        "[lift] 20M rows, distributed global rank, 10 buckets",
        lambda: lift_gains(scored, "score", "y", tie_break="rid").count(),
    )


def probe_stats(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import (
        grouped_linreg,
        seasonal_zscore,
    )

    facts = spark.range(20_000_000).select(
        F.concat(F.lit("g"), F.pmod(F.xxhash64("id"), F.lit(100))).alias("g"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(24)).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(50_000)).alias("y"),
    )
    _timed(
        "[linreg] 20M rows / 100 groups (exact-sum closed form)",
        lambda: grouped_linreg(facts, "g", "x", "y").count(),
    )
    _timed(
        "[zscore] 20M rows / 2400 cells, broadcast stats join",
        lambda: seasonal_zscore(facts, ["g", "x"], "y", threshold=3.0).count(),
    )


def probe_acf(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import acf

    series = spark.range(30_000_000).select(
        (F.col("id") % 100_000).alias("k"),
        (F.col("id") / F.lit(100_000)).cast("long").alias("t"),
        F.pmod(F.xxhash64("id"), F.lit(10_000)).alias("y"),
    )
    _timed(
        "[acf] 100k keys x 300 steps, lags 1..7 in one window pass",
        lambda: acf(series, "k", "t", "y", max_lag=7).count(),
    )


def probe_bootstrap(spark):
    from mimic_iv_data_pipeline_spark.operators.sampling import poisson_bootstrap_ci

    facts = spark.range(2_000_000).select(
        F.col("id").alias("rid"),
        F.concat(F.lit("g"), F.pmod(F.xxhash64("id"), F.lit(50))).alias("g"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(50_000)).alias("y"),
    )
    _timed(
        "[bootstrap] 2M rows x B=40 md5 replicates (80M weighted partials)",
        lambda: poisson_bootstrap_ci(
            facts, "g", "y", "rid", n_replicates=40
        ).count(),
    )


PROBES = {
    "rolling": probe_rolling,
    "intervals": probe_intervals,
    "recurrences": probe_recurrences,
    "roc": probe_roc,
    "lift": probe_lift,
    "stats": probe_stats,
    "acf": probe_acf,
    "bootstrap": probe_bootstrap,
}


def main():
    # this process creates the JVM, so driver.memory is honored here;
    # in local mode ALL execution memory is the driver heap.
    spark = get_spark("scale_probes_r5d", **{"spark.driver.memory": "48g"})
    which = sys.argv[1:] or list(PROBES)
    for name in which:
        PROBES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
