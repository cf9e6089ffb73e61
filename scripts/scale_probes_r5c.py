"""Round-5 third-wave scale probes: the analytics/eval/curation
operators at ~100× sf0.1 (method identical to scale_probes_r5.py —
replicate in-session, time the warm second run).

Families probed:
  * triangle_count (q151) on a 2M-edge hub-heavy graph — the probe the
    degree orientation exists for: a 4k-degree hub makes unoriented
    wedge enumeration ~8M rows per hub, oriented stays m^{3/2}-bounded;
  * funnel_conversion (q153) over 20M events;
  * target_encode_kfold (q154) over 15M orders;
  * select_token_budget (q155) over 5M docs (distributed prefix sum);
  * mad_outliers (q156) + mutual_information (q157) over 15M rows.

Usage: python scripts/scale_probes_r5c.py [probe ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _timed(tag, fn):
    fn()  # codegen warm-up
    t0 = time.perf_counter()
    n = fn()
    dt = time.perf_counter() - t0
    print(f"{tag}: {dt:.2f} s  ({n} rows)")
    return dt


def probe_triangles(spark):
    from mimic_iv_data_pipeline_spark.operators.graph import triangle_count

    # 2M hash-derived edges over 50k nodes, PLUS a 4000-edge hub: the
    # hub's unoriented wedge count would be ~16M rows from one node;
    # orientation caps its out-degree at ~sqrt-scale.
    base = spark.range(2_000_000).select(
        (F.xxhash64("id") % 50_000).alias("src"),
        (F.xxhash64("id", F.lit(1)) % 50_000).alias("dst"),
    )
    hub = spark.range(4_000).select(
        F.lit(7).cast("long").alias("src"), (F.col("id") % 50_000).alias("dst")
    )
    edges = base.unionByName(hub).persist()
    edges.count()
    _timed("[triangles] 2M edges + 4k-degree hub, per-node",
           lambda: triangle_count(edges).count())
    edges.unpersist()


def probe_funnel(spark):
    from mimic_iv_data_pipeline_spark.operators.windows import funnel_conversion

    # 20M events over 200k users, 4 stage types with realistic drop-off.
    ev = spark.range(20_000_000).select(
        (F.xxhash64("id") % 200_000).alias("user_id"),
        (F.xxhash64("id", F.lit(2)) % 1_000_000).cast("double").alias("ts"),
        F.element_at(
            F.array(F.lit("signup"), F.lit("view"), F.lit("view"),
                    F.lit("click"), F.lit("purchase"), F.lit("other")),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(6)) + 1).cast("int"),
        ).alias("event_type"),
    )
    # NOT persisted: the synthesized source is one codegen'd projection
    # over range() — recomputing per stage scan is cheaper than holding
    # 20M cached rows in a 32-thread single JVM (GC-locker thrash).
    _timed("[funnel] 20M events, 4 stages",
           lambda: funnel_conversion(
               ev, ["signup", "view", "click", "purchase"]).count())



def probe_target_encoding(spark):
    from mimic_iv_data_pipeline_spark.operators.mlprep import target_encode_kfold

    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    big = o.crossJoin(spark.range(100).select(F.col("id").alias("__rep"))).select(
        (F.col("o_orderkey") * 100 + F.col("__rep")).alias("k"),
        "o_orderpriority",
        (F.col("o_orderstatus") == "F").cast("int").alias("y"),
    ).persist()
    n = big.count()
    print(f"[te] {n} rows")
    _timed("[te] k-fold target encoding, 15M rows (md5 folds)",
           lambda: target_encode_kfold(
               big, "k", "o_orderpriority", "y", k=5).count())
    _timed("[te] k-fold target encoding, 15M rows (xxhash64 folds)",
           lambda: target_encode_kfold(
               big, "k", "o_orderpriority", "y", k=5,
               hash_fn="xxhash64").count())
    big.unpersist()


def probe_token_budget(spark):
    from mimic_iv_data_pipeline_spark.operators.sampling import select_token_budget

    docs = spark.range(5_000_000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1e6).alias("score"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(900)) + 100).alias("n_tokens"),
    ).persist()
    docs.count()
    # budget = ~40% of ~3B total tokens
    _timed("[budget] 5M docs, distributed prefix sum",
           lambda: select_token_budget(
               docs, "score", "n_tokens", budget=1_200_000_000).count())
    docs.unpersist()


def probe_robust_stats(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import (
        mad_outliers,
        mutual_information,
    )

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    big = li.select("l_returnflag", "l_linestatus", "l_extendedprice").crossJoin(
        spark.range(25).select(F.col("id").alias("__rep"))
    ).persist()
    n = big.count()
    print(f"[robust] {n} rows")
    _timed("[robust] MAD outliers (exact percentile), 15M rows",
           lambda: mad_outliers(big, "l_returnflag", "l_extendedprice").count())
    _timed("[robust] mutual information, 15M rows",
           lambda: mutual_information(big, "l_returnflag", "l_linestatus").count())
    big.unpersist()


def probe_lpa(spark):
    from mimic_iv_data_pipeline_spark.operators.graph import label_propagation

    edges = spark.range(2_000_000).select(
        (F.xxhash64("id") % 50_000).alias("src"),
        (F.xxhash64("id", F.lit(1)) % 50_000).alias("dst"),
    ).persist()
    edges.count()
    _timed("[lpa] 3-round LPA, 2M edges / 50k nodes",
           lambda: label_propagation(edges, iterations=3).count())
    edges.unpersist()


def probe_pareto(spark):
    from mimic_iv_data_pipeline_spark.operators.sampling import pareto_front_2d

    pts = spark.range(5_000_000).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) / 1e3).alias("q"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_000_000)) / 1e3).alias("c"),
    ).persist()
    pts.count()
    _timed("[pareto] 2-D skyline, 5M points",
           lambda: pareto_front_2d(pts, "q", "c").count())
    pts.unpersist()


def probe_survival(spark):
    from mimic_iv_data_pipeline_spark.operators.aggregates import (
        kaplan_meier,
        logrank_test,
    )

    # 15M subjects, ~1000 distinct durations, 2 groups, 25% censoring.
    cohort = spark.range(15_000_000).select(
        F.when(F.pmod(F.xxhash64("id"), F.lit(2)) == 0, F.lit("a"))
        .otherwise(F.lit("b")).alias("grp"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000))).alias("dur"),
        (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(4)) > 0).cast("int").alias("event"),
    ).persist()
    cohort.count()
    _timed("[survival] Kaplan-Meier, 15M subjects / 1k times / 2 groups",
           lambda: kaplan_meier(cohort, "dur", "event", "grp").count())
    _timed("[survival] log-rank test, 15M subjects",
           lambda: logrank_test(cohort, "dur", "event", "grp").count())
    cohort.unpersist()


def probe_paths(spark):
    from mimic_iv_data_pipeline_spark.operators.retrieval import association_rules
    from mimic_iv_data_pipeline_spark.operators.windows import transition_matrix

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    big = li.select("l_orderkey", "l_partkey").crossJoin(
        spark.range(10).select(F.col("id").alias("__rep"))
    ).select(
        (F.col("l_orderkey") * 10 + F.col("__rep")).alias("b"),
        (F.col("l_partkey") % 200).alias("i"),
    ).persist()
    n = big.count()
    print(f"[paths] association input {n} rows")
    _timed("[paths] association rules, 6M basket-items / 200 items",
           lambda: association_rules(big, "b", "i", min_support=0.0005).count())
    big.unpersist()
    ev = spark.range(20_000_000).select(
        F.col("id").alias("event_id"),
        (F.xxhash64("id") % 200_000).alias("user_id"),
        (F.xxhash64("id", F.lit(2)) % 1_000_000).cast("double").alias("ts"),
        F.concat(F.lit("s"), (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(6)))).alias(
            "event_type"
        ),
    )
    _timed("[paths] transition matrix, 20M events / 200k users",
           lambda: transition_matrix(ev, tie_break="event_id").count())


PROBES = {
    "triangles": probe_triangles,
    "funnel": probe_funnel,
    "te": probe_target_encoding,
    "budget": probe_token_budget,
    "robust": probe_robust_stats,
    "lpa": probe_lpa,
    "pareto": probe_pareto,
    "survival": probe_survival,
    "paths": probe_paths,
}


def main():
    # this process creates the JVM, so driver.memory is honored here;
    # in local mode ALL execution memory is the driver heap.
    spark = get_spark("scale_probes_r5c", **{"spark.driver.memory": "48g"})
    which = sys.argv[1:] or list(PROBES)
    for name in which:
        PROBES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
