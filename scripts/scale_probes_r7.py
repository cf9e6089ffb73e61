"""Round-7 scale probes.

1. ewma/holt at the pathological shape the r6 rewrite targets, at
   cluster-realistic bucket counts (r6 verdict item 7): 1M keys whose
   series land ~5k keys per bucket (shuffle.partitions=2000, default
   n_buckets=8000 on one axis; a forced-small n_buckets=200 on the
   other so ONE bucket carries ~100k rows — the memory-bound regime),
   plus one epic single-key series (1M points in one bucket, the
   worst single-key case the docstring warns re-keying for).
   The claim under test: bucket memory ≈ rows/n_buckets, wall-clock
   flat across n_buckets choices (the loop is O(rows) total either
   way; only per-bucket Arrow frame size changes).

2. geo_clusters crossover (r6 verdict item 4): the 1.4M-edge
   candidate graph that cost the STAR path ~61 s in PERF r6d must now
   take the union-find path under the raised 4M default cap —
   target: within ~2x of the r6 union-find measurement (a few
   seconds), with driver_cap=0 (forced star) timed alongside for the
   record.

Run: python scripts/scale_probes_r7.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402


def probe(name, fn):
    t0 = time.time()
    out = fn()
    print(f"{name}: {time.time() - t0:.2f} s ({out})", flush=True)


def main():
    spark = get_spark("probes_r7", **{"spark.driver.memory": "24g"})
    spark.conf.set("spark.sql.shuffle.partitions", "2000")

    from mimic_iv_data_pipeline_spark.operators.windows import ewma, holt_linear

    # 20M rows = 1M keys x 20 points (local stand-in for 1M x 10k:
    # same keys-per-bucket ratio at n_buckets=200 — ~5k keys/bucket)
    series = spark.range(20_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("k"),
        F.col("id").alias("t"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1000)) / 10.0).alias("x"),
    )

    def run_ewma(n_buckets):
        out = ewma(series, "k", "t", "x", 0.25, n_buckets=n_buckets)
        # collect an aggregate OVER the output column so Catalyst
        # cannot prune the applyInPandas (the r6 count() trap)
        return out.agg(F.sum("ewma")).collect()[0][0]

    probe("ewma 20M rows, 1M keys, n_buckets=8000 (default @2000 parts)",
          lambda: run_ewma(None))
    probe("ewma 20M rows, 1M keys, n_buckets=200 (~5k keys/bucket, 100k rows/frame)",
          lambda: run_ewma(200))

    def run_holt(n_buckets):
        out = holt_linear(series, "k", "t", "x", 0.5, 0.25, n_buckets=n_buckets)
        return out.agg(F.sum("forecast")).collect()[0][0]

    probe("holt 20M rows, 1M keys, n_buckets=8000", lambda: run_holt(None))
    probe("holt 20M rows, 1M keys, n_buckets=200", lambda: run_holt(200))

    # epic single key: 1M points, all in ONE bucket by construction
    epic = spark.range(1_000_000).select(
        F.lit(0).alias("k"), F.col("id").alias("t"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 10.0).alias("x"),
    )
    probe("ewma 1 key x 1M points (single-bucket worst case)",
          lambda: ewma(epic, "k", "t", "x", 0.25).agg(F.sum("ewma")).collect()[0][0])

    # --- geo_clusters crossover at the PERF r6d shape -----------------
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    from mimic_iv_data_pipeline_spark.operators.geo import geo_clusters, radius_join

    pts = spark.range(2_000_000).select(
        F.col("id").alias("id"),
        (52.0 + F.pmod(F.xxhash64("id"), F.lit(200_000)) / 100_000.0).alias("lat"),
        (13.0 + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(300_000)) / 100_000.0).alias(
            "lon"
        ),
    )
    probe(
        "geo edge count (radius_join 2M pts r=100m)",
        lambda: f"{radius_join(pts, 'id', 'lat', 'lon', 100.0).count()} pairs",
    )
    probe(
        "geo_clusters 2M pts AUTO path (4M cap -> union-find)",
        lambda: f"{geo_clusters(pts, 'id', 'lat', 'lon', 100.0).count()} labels",
    )
    probe(
        "geo_clusters 2M pts FORCED star path (driver_cap=0)",
        lambda: f"{geo_clusters(pts, 'id', 'lat', 'lon', 100.0, driver_cap=0).count()} labels",
    )


if __name__ == "__main__":
    main()
