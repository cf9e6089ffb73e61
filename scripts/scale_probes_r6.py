"""Round-6 scale probes (~100x sf0.1 shapes) for the operators this
round changed: radius_join (sphere-derived uniform cells),
pareto_front_2d (value-bucketed prefix min), ewma/holt (bucketed
applyInPandas — also probed inline, PERF r6a), naive_bayes
(class-pruned — probed inline, PERF r6b). Run: python
scripts/scale_probes_r6.py
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
    spark = get_spark("probes_r6", **{"spark.driver.memory": "24g"})

    from mimic_iv_data_pipeline_spark.operators.geo import radius_join

    pts = spark.range(2_000_000).select(
        F.col("id").alias("id"),
        (52.0 + F.pmod(F.xxhash64("id"), F.lit(200_000)) / 100_000.0).alias("lat"),
        (13.0 + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(300_000)) / 100_000.0).alias(
            "lon"
        ),
    )
    probe(
        "radius_join 2M pts ~2x3 deg r=100m (r5: 15.6 s)",
        lambda: f"{radius_join(pts, 'id', 'lat', 'lon', 100.0).count()} pairs",
    )

    from mimic_iv_data_pipeline_spark.operators.sampling import pareto_front_2d

    df = spark.range(20_000_000).select(
        F.col("id").alias("rid"),
        F.pmod(F.xxhash64("id"), F.lit(500_000)).alias("q"),
        (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10_000_000)).cast("double")).alias(
            "c"
        ),
    )
    probe(
        "pareto_front_2d 20M rows / 500k qualities",
        lambda: f"{pareto_front_2d(df, 'q', 'c').count()} skyline rows",
    )

    from mimic_iv_data_pipeline_spark.operators.geo import geo_knn

    probe(
        "geo_knn k=3 r=100m over the 2M-point cloud",
        lambda: f"{geo_knn(pts, 'id', 'lat', 'lon', 3, 100.0).count()} rows",
    )

    from mimic_iv_data_pipeline_spark.operators.geo import geo_clusters

    probe(
        "geo_clusters r=100m over the 2M-point cloud (1.4M edges -> star path)",
        lambda: f"{geo_clusters(pts, 'id', 'lat', 'lon', 100.0).select('cluster_id').distinct().count()} clusters",
    )

    from mimic_iv_data_pipeline_spark.operators.aggregates import trimmed_mean

    tm = spark.range(20_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1_000)).alias("g"),
        F.col("id").alias("rid"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(1_000_000)).alias("y"),
    )
    probe(
        "trimmed_mean 20M rows / 1k groups",
        lambda: f"{trimmed_mean(tm, 'g', 'y', 0.1, 'rid').count()} groups",
    )

    from mimic_iv_data_pipeline_spark.operators.aggregates import (
        cmh_pooled_or,
        exact_percentiles,
        spearman_by_group,
    )

    epi = spark.range(20_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(50)).alias("s"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(2)).cast("int").alias("e"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(2)).cast("int").alias("y"),
    )
    # collect(), not count(): count() on an aggregate output lets
    # Catalyst prune the agg expressions and the windows under them —
    # the probe would time a hollow plan.
    probe(
        "cmh_pooled_or 20M rows / 50 strata",
        lambda: f"{len(cmh_pooled_or(epi, 's', 'e', 'y').collect())} row",
    )
    probe(
        "spearman_by_group 20M rows / 1k groups (two rank windows)",
        lambda: f"{len(spearman_by_group(tm, 'g', 'rid', 'y').collect())} groups",
    )
    probe(
        "exact_percentiles 20M rows / 1k groups x 3 probs",
        lambda: f"{len(exact_percentiles(tm, 'g', 'y', [0.1, 0.5, 0.9], 'rid').collect())} groups",
    )

    spark.stop()


if __name__ == "__main__":
    main()
