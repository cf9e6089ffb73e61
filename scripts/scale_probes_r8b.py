"""Round-8 probes, wave b: the skew utilities under an actual hot key.

`operators/skew.py` exists for the shapes AQE cannot rewrite; this
probe manufactures the motivating case — one key carrying 40% of a
50M-row fact side, joined to a mid-size (1M-row) dimension with
broadcast DISABLED (the "too big to broadcast, too skewed to SMJ
cleanly" regime) — and times:

1. the plain sort-merge join (AQE skew-split on),
2. the same join with AQE's skew handling OFF (the engines/stages
   where AQE cannot rewrite — the documented reason salted_join
   exists),
3. `salted_join` with 8 salt buckets (right side replicated 8x).

And for aggregation: collect_list per key (the map-side-combine-proof
aggregate the docstring names) plain vs `salted_agg` two-stage.

Run: python scripts/scale_probes_r8b.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402


def probe(name, fn):
    """Best of 2 (after the caller's warm-up) — min is robust to the
    transient neighbor contention this host carries (PERF r8)."""
    best, out = float("inf"), None
    for _ in range(2):
        t0 = time.time()
        out = fn()
        best = min(best, time.time() - t0)
    print(f"{name}: {best:.2f} s ({out})", flush=True)


def main():
    spark = get_spark("probes_r8b", **{"spark.driver.memory": "24g"})
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    from mimic_iv_data_pipeline_spark.operators.skew import salted_agg, salted_join

    # fact: 50M rows, key 0 carries 40%; dim: 1M keys
    fact = spark.range(50_000_000).select(
        F.when(F.col("id") % 5 < 2, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(1_000_000)))
        .alias("k"),
        (F.col("id") % 97).alias("v"),
    )
    dim = spark.range(1_000_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    )

    def run_plain():
        return fact.join(dim, "k").agg(F.sum(F.col("v") + F.col("w"))).collect()[0][0]

    def run_no_aqe_skew():
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        try:
            return run_plain()
        finally:
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    def run_salted():
        out = salted_join(fact, dim, on="k", salt_buckets=8)
        return out.agg(F.sum(F.col("v") + F.col("w"))).collect()[0][0]

    run_plain()  # JVM/codegen warm-up so probe order doesn't bias run 1
    probe("hot-key join, SMJ + AQE skew-split (baseline)", run_plain)
    probe("hot-key join, SMJ, AQE skew-split OFF", run_no_aqe_skew)
    probe("hot-key join, salted_join(8)", run_salted)

    # aggregation: collect_list per key (no map-side combine) with the
    # same 40% hot key, 5M rows (list materialization bound)
    ev = spark.range(5_000_000).select(
        F.when(F.col("id") % 5 < 2, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(100_000)))
        .alias("k"),
        (F.col("id") % 997).alias("v"),
    )

    def agg_plain():
        return (
            ev.groupBy("k")
            .agg(F.size(F.collect_list("v")).alias("n"))
            .agg(F.sum("n"))
            .collect()[0][0]
        )

    def agg_salted():
        out = salted_agg(
            ev,
            ["k"],
            {"n": (F.size(F.collect_list("v")), F.sum("__p_n"))},
            salt_buckets=16,
        )
        return out.agg(F.sum("n")).collect()[0][0]

    probe("hot-key collect_list, plain groupBy", agg_plain)
    probe("hot-key collect_list, salted_agg(16)", agg_salted)


if __name__ == "__main__":
    main()
