"""Round-5 sixth-wave scale probes at ~100× sf0.1 (method identical to
scale_probes_r5.py — synthesize in-session, time the warm second run).

Families probed:
  * mann_whitney_u (q181): 20M rows, two groups, 10k distinct values —
    the groupBy(value) collapse + distinct-values window;
  * anova_oneway (q182): 20M rows / 100 groups — one exact-sum hash
    aggregate (the grouped_linreg regime) + the shift re-centering;
  * bh_fdr (q183): 200k hypotheses — the deliberate single-partition
    windows over the tests relation (measured so the "pre-bucket past
    ~1M tests" docstring guidance has a number);
  * pmi_collocations (q184): 500k docs × ~60 tokens — narrow bigram
    build, pair aggregate, frequent-vocab broadcast;
  * item_cooccurrence_topk (q185): 6M basket-items / 150k baskets /
    200 items — the Apriori-pruned pair join (association_rules'
    shape + the per-item top-k window);
  * bfs_levels (q186): 2M edges / 50k nodes, 3 hops from 10 seeds —
    frontier joins vs whole-graph joins;
  * holt_linear (q187): 20M rows / 200k keys — the two-state struct
    fold vs ewma's scalar fold (r5d: 5.36 s) head to head.

Usage: python scripts/scale_probes_r5e.py [probe ...]
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


def probe_mwu(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import mann_whitney_u

    facts = spark.range(20_000_000).select(
        F.when(F.xxhash64("id") % 2 == 0, "a").otherwise("b").alias("g"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("v"),
    )
    _timed(
        "mann_whitney_u 20M rows, 10k distinct values",
        lambda: mann_whitney_u(facts, "g", "v").count(),
    )


def probe_anova(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import anova_oneway

    facts = spark.range(20_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(100)).cast("string").alias("g"),
        (
            F.lit(5_000_000_000)
            + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000))
        ).alias("y"),
    )
    _timed(
        "anova_oneway 20M rows / 100 groups (5e9 offset)",
        lambda: anova_oneway(facts, "g", "y").count(),
    )


def probe_bh(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import bh_fdr

    tests = spark.range(200_000).select(
        F.col("id").alias("tid"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1_000_000.0).alias("p"),
    )
    _timed(
        "bh_fdr 200k hypotheses (single-partition windows)",
        lambda: bh_fdr(tests, "tid", "p").count(),
    )


def probe_pmi(spark):
    from mimic_iv_data_pipeline_spark.operators.text import pmi_collocations

    words = F.array(*[F.lit(f"w{i}") for i in range(400)])
    docs = spark.range(500_000).select(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(59)),
                lambda i: F.element_at(
                    words, (F.pmod(F.xxhash64(F.col("id"), i), F.lit(400)) + 1).cast("int")
                ),
            ),
            " ",
        ).alias("text")
    )
    _timed(
        "pmi_collocations 500k docs x 60 tokens, 400-word vocab",
        lambda: pmi_collocations(docs, "text", min_count=5, top_k=100).count(),
    )


def probe_cooc(spark):
    from mimic_iv_data_pipeline_spark.operators.retrieval import (
        item_cooccurrence_topk,
    )

    bi = spark.range(6_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(150_000)).alias("b"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(200)).alias("i"),
    )
    _timed(
        "item_cooccurrence_topk 6M basket-items / 150k baskets / 200 items",
        lambda: item_cooccurrence_topk(bi, "b", "i", k=5, min_count=5).count(),
    )


def probe_bfs(spark):
    from mimic_iv_data_pipeline_spark.operators.graph import bfs_levels

    edges = spark.range(2_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(50_000)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(50_000)).alias("dst"),
    )
    seeds = spark.range(10).select(F.col("id").alias("node"))
    _timed(
        "bfs_levels 2M edges / 50k nodes, 3 hops, 10 seeds",
        lambda: bfs_levels(edges, seeds, max_hops=3).count(),
    )


def probe_holt(spark):
    from mimic_iv_data_pipeline_spark.operators.windows import holt_linear

    ev = spark.range(20_000_000).select(
        (F.xxhash64("id") % 200_000).alias("k"),
        F.timestamp_seconds(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000))
        ).alias("ts"),
        F.col("id").alias("rid"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000))).alias("x"),
    )
    _timed(
        "holt_linear 20M rows / 200k keys (two-state struct fold)",
        lambda: holt_linear(
            ev, "k", "ts", "x", alpha=0.5, beta=0.25, tie_break="rid"
        ).count(),
    )


PROBES = {
    "mwu": probe_mwu,
    "anova": probe_anova,
    "bh": probe_bh,
    "pmi": probe_pmi,
    "cooc": probe_cooc,
    "bfs": probe_bfs,
    "holt": probe_holt,
}



def probe_nb(spark):
    from mimic_iv_data_pipeline_spark.operators.text import naive_bayes_scores

    words = F.array(*[F.lit(f"w{i}") for i in range(1000)])
    docs = spark.range(500_000).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64("id"), F.lit(4)).cast("string").alias("lang"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(59)),
                lambda i: F.element_at(
                    words,
                    (F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) + 1).cast("int"),
                ),
            ),
            " ",
        ).alias("text"),
    )
    _timed(
        "naive_bayes_scores 500k docs x 60 tokens, 4 classes, 1k vocab",
        lambda: naive_bayes_scores(docs, "doc_id", "text", "lang").count(),
    )


def probe_rfm(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import rfm_scores

    ev = spark.range(20_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("user_id"),
        F.timestamp_seconds(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000))
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)).alias("cents"),
    )
    _timed(
        "rfm_scores 20M events / 1M users (ntile over users relation)",
        lambda: rfm_scores(ev, "user_id", "ts", "cents").count(),
    )


def probe_seasonal(spark):
    from mimic_iv_data_pipeline_spark.operators.temporal import seasonal_decompose

    daily = spark.range(10_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(10_000)).cast("string").alias("k"),
        F.date_add(
            F.lit("2000-01-01").cast("date"),
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)).cast("int"),
        ).alias("day"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100_000)).alias("y"),
    ).groupBy("k", "day").agg(F.max("y").alias("y"))
    _timed(
        "seasonal_decompose ~10M (key, day) rows / 10k keys",
        lambda: seasonal_decompose(daily, "k", "day", "y").count(),
    )


PROBES.update({"nb": probe_nb, "rfm": probe_rfm, "seasonal": probe_seasonal})


def probe_isotonic(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import (
        isotonic_calibration,
    )

    facts = spark.range(20_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("s"),
        F.when(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000))
            < F.pmod(F.xxhash64("id"), F.lit(1000)),
            1,
        ).otherwise(0).alias("y"),
    )
    _timed(
        "isotonic_calibration 20M facts -> 1000 bins (1M-pair minimax)",
        lambda: isotonic_calibration(facts, "s", "y").count(),
    )


def probe_smd(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import smd_balance

    facts = spark.range(20_000_000).select(
        F.when(F.xxhash64("id") % 2 == 0, "a").otherwise("b").alias("g"),
        (F.lit(5_000_000_000) + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100_000))).alias("x"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(24)).alias("z"),
    )
    _timed(
        "smd_balance 20M rows, 2 covariates (5e9 offset)",
        lambda: smd_balance(facts, "g", ["x", "z"]).count(),
    )


def probe_epi(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import epi_2x2

    facts = spark.range(20_000_000).select(
        (F.pmod(F.xxhash64("id"), F.lit(2))).cast("int").alias("e"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10)) < 2).cast("int").alias("o"),
    )
    _timed("epi_2x2 20M rows", lambda: epi_2x2(facts, "e", "o").count())


def probe_attribution(spark):
    from mimic_iv_data_pipeline_spark.operators.windows import attribute_revenue

    ev = spark.range(20_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(500_000)).alias("u"),
        F.timestamp_seconds(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000))
        ).alias("ts"),
        F.when(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(20)) == 0, "purchase")
        .when(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(20)) < 10, "click")
        .otherwise("view")
        .alias("typ"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10_000)).alias("cents"),
        F.col("id").alias("eid"),
    )
    _timed(
        "attribute_revenue 20M events / 500k users / 1M purchases, 1h lookback",
        lambda: attribute_revenue(
            ev, "u", "ts", "typ", "cents", "purchase", ["click", "view"],
            3600, "eid",
        ).count(),
    )


PROBES.update(
    {
        "isotonic": probe_isotonic,
        "smd": probe_smd,
        "epi": probe_epi,
        "attribution": probe_attribution,
    }
)


def probe_backtest(spark):
    from mimic_iv_data_pipeline_spark.operators.windows import forecast_backtest

    daily = spark.range(10_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(100_000)).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(200)).alias("t"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100_000)).alias("y"),
    ).groupBy("k", "t").agg(F.max("y").alias("y"))
    _timed(
        "forecast_backtest ~10M (key, step) rows / 100k keys",
        lambda: forecast_backtest(
            daily, "k", "t", "y", alpha=0.5, beta=0.25, season=7
        ).count(),
    )


def probe_sssp(spark):
    from mimic_iv_data_pipeline_spark.operators.graph import shortest_paths

    edges = spark.range(2_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(50_000)).alias("src"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(50_000)).alias("dst"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(100)) + 1).alias("w"),
    )
    seeds = spark.range(10).select(F.col("id").alias("node"))
    _timed(
        "shortest_paths 2M weighted edges / 50k nodes, 3 relaxations",
        lambda: shortest_paths(edges, seeds, iterations=3).count(),
    )


PROBES.update({"backtest": probe_backtest, "sssp": probe_sssp})


def probe_geo(spark):
    from mimic_iv_data_pipeline_spark.operators.geo import radius_join

    pts = spark.range(2_000_000).select(
        F.col("id"),
        (F.lit(52.0) + F.pmod(F.xxhash64("id"), F.lit(200_000)).cast("double")
         / 100_000.0).alias("lat"),
        (F.lit(13.0) + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(300_000)).cast("double")
         / 100_000.0).alias("lon"),
    )
    _timed(
        "radius_join 2M points over ~2x3 deg, r=100m",
        lambda: radius_join(pts, "id", "lat", "lon", 100.0).count(),
    )


def probe_decay_benford(spark):
    from mimic_iv_data_pipeline_spark.operators.mlprep import time_decay_features
    from mimic_iv_data_pipeline_spark.operators.profiling import benford_digit_test

    ev = spark.range(20_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("k"),
        F.timestamp_seconds(
            F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000_000))
        ).alias("ts"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(10_000)).alias("v"),
    )
    _timed(
        "time_decay_features 20M rows / 1M keys, 3 half-lives",
        lambda: time_decay_features(ev, "k", "ts", "v", [1.0, 7.0, 30.0]).count(),
    )
    vals = spark.range(20_000_000).select(
        (F.pmod(F.xxhash64("id"), F.lit(999_999)) + 1).cast("double").alias("v")
    )
    _timed(
        "benford_digit_test 20M values",
        lambda: benford_digit_test(vals, "v").count(),
    )


PROBES.update({"geo": probe_geo, "decay_benford": probe_decay_benford})


def probe_concentration(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import (
        concentration_metrics,
    )

    facts = spark.range(20_000_000).select(
        F.pmod(F.xxhash64("id"), F.lit(1_000_000)).alias("k"),
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)).alias("v"),
    )
    _timed(
        "concentration_metrics 20M rows / 1M keys",
        lambda: concentration_metrics(facts, "k", "v").count(),
    )


PROBES.update({"concentration": probe_concentration})


def main():
    # this process creates the JVM, so driver.memory is honored here;
    # in local mode ALL execution memory is the driver heap.
    spark = get_spark("scale_probes_r5e", **{"spark.driver.memory": "48g"})
    which = sys.argv[1:] or list(PROBES)
    for name in which:
        PROBES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
