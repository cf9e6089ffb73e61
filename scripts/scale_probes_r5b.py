"""Round-5 second-wave scale probes: the warehouse/eval operators at
~100× sf0.1 (method identical to scale_probes_r5.py — replicate
in-session, time the warm second run).

Families probed: SCD-2 history build + PIT join (q139/q144), one-pass
table profile exact vs HLL (q140), fixed-iteration PageRank (q142) on
a million-edge graph.

Usage: python scripts/scale_probes_r5b.py [probe ...]
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


def _replicated_orders(spark, reps: int):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    return o.crossJoin(spark.range(reps).select(F.col("id").alias("__rep"))).select(
        (F.col("o_orderkey") * reps + F.col("__rep")).alias("o_orderkey"),
        "o_orderstatus",
        "o_totalprice",
        "o_custkey",
    )


def probe_scd2(spark):
    from mimic_iv_data_pipeline_spark.operators.history import pit_join, scd2_history

    orders = _replicated_orders(spark, 100).persist()  # 15M keys
    n = orders.count()
    print(f"[scd2] {n} orders → 3-version change log ≈ {n + n // 10 + n // 100} rows")
    v1 = orders.select("o_orderkey", "o_orderstatus", F.lit(1).cast("long").alias("v"))
    v2 = orders.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey", F.lit("U").alias("o_orderstatus"), F.lit(2).cast("long").alias("v")
    )
    v3 = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", F.lit("X").alias("o_orderstatus"), F.lit(3).cast("long").alias("v")
    )
    log = v1.unionByName(v2).unionByName(v3)
    _timed(
        "scd2_history 16.6M change rows (1 exchange)",
        lambda: scd2_history(log, ["o_orderkey"], "v").count(),
    )
    hist = (
        scd2_history(log, ["o_orderkey"], "v")
        .select(
            F.col("o_orderkey"),
            F.col("o_orderstatus").alias("status_dim"),
            "effective_from",
            "effective_to",
        )
        .persist()
    )
    hist.count()
    facts = orders.select(
        "o_orderkey", (1 + F.col("o_custkey") % 3).cast("long").alias("t")
    )
    _timed(
        "pit_join 15M facts × 16.6M-interval history",
        lambda: pit_join(facts, hist, ["o_orderkey"], "t").count(),
    )
    hist.unpersist()
    orders.unpersist()


def probe_profile(spark):
    from mimic_iv_data_pipeline_spark.operators.profiling import profile_table

    orders = _replicated_orders(spark, 100).persist()  # 15M rows
    n = orders.count()
    print(f"[profile] {n} rows × 4 columns")
    _timed(
        "profile_table exact distinct (EXPAND ×4)",
        lambda: profile_table(
            orders, ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
        ).count(),
    )
    _timed(
        "profile_table approx distinct (single pass, no EXPAND)",
        lambda: profile_table(
            orders,
            ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"],
            exact_distinct=False,
        ).count(),
    )
    orders.unpersist()


def probe_pagerank(spark):
    from mimic_iv_data_pipeline_spark.operators.graph import pagerank

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    # ~600k base rows × 10 reps, contracted to 100k nodes → ~6M raw
    # edge tuples, ~millions distinct
    edges = (
        li.crossJoin(spark.range(10).select(F.col("id").alias("__rep")))
        .select(
            ((F.col("l_suppkey") * 7919 + F.col("__rep")) % 100_000).alias("src"),
            ((F.col("l_partkey") * 104_729 + F.col("__rep")) % 100_000).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .persist()
    )
    n = edges.count()
    print(f"[pagerank] {n} edge tuples, 100k-node domain, 3 iterations")
    _timed(
        "pagerank 3 iters (1 join + 1 agg per iter)",
        lambda: pagerank(edges, iterations=3).count(),
    )
    edges.unpersist()




def probe_bloom(spark):
    """A/B: plain shuffled join vs Bloom-prefiltered join at a
    1.6%-selective dim, broadcast disabled so BOTH sides pay a real
    exchange (the local[32] stand-in for the 100 TB regime where the
    fact side cannot broadcast)."""
    from mimic_iv_data_pipeline_spark.operators.sketches import bloom_prefilter_join

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    old_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", old
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        facts = (
            li.crossJoin(spark.range(20).select(F.col("id").alias("__rep")))
            .select(
                (F.col("l_orderkey") * 20 + F.col("__rep")).alias("k"),
                "l_linenumber",
            )
            .persist()
        )
        n = facts.count()
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        dim = (
            orders.filter(F.col("o_totalprice") > 480000)
            .crossJoin(spark.range(20).select(F.col("id").alias("__rep")))
            .select(
                (F.col("o_orderkey") * 20 + F.col("__rep")).alias("k"),
                "o_totalprice",
            )
            .persist()
        )
        nd = dim.count()
        print(f"[bloom] {n} facts × {nd} dim keys (selectivity ~{nd/n:.3%})")
        _timed("plain shuffled join", lambda: facts.join(dim, "k").count())
        _timed(
            "bloom_prefilter_join (1M bits)",
            lambda: bloom_prefilter_join(facts, dim, "k", num_bits=1 << 20).count(),
        )
        facts.unpersist()
        dim.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def probe_warehouse(spark):
    """End-to-end nightly_refresh at 15M facts x 16.6M change rows —
    the composed cost of gate + SCD-2 + PIT + rollup + profile."""
    from mimic_iv_data_pipeline_spark.plans.warehouse import nightly_refresh

    orders = _replicated_orders(spark, 100).persist()
    orders.count()
    changes = (
        orders.select("o_orderkey", "o_orderstatus", F.lit(1).cast("long").alias("v"))
        .unionByName(
            orders.filter(F.col("o_orderkey") % 10 == 0).select(
                "o_orderkey", F.lit("U").alias("o_orderstatus"),
                F.lit(2).cast("long").alias("v"),
            )
        )
    )
    facts = orders.select(
        "o_orderkey",
        (1 + F.col("o_custkey") % 2).cast("long").alias("t"),
        "o_totalprice",
    )

    def run():
        out = nightly_refresh(
            changes, facts=facts,
            key_cols=["o_orderkey"], version_col="v", fact_time="t",
            attr_cols=["o_orderstatus"], measure_cols=["o_totalprice"],
            rollup_keys=["o_orderstatus"],
        )
        # force the whole DAG: gate report + enrich + rollup + profile
        return (
            out.gate_report.count() + out.enriched.count()
            + out.rollup.count() + out.profile.count()
        )

    _timed("nightly_refresh 15M facts (gate+scd2+pit+rollup+profile)", run)
    orders.unpersist()


PROBES = {
    "scd2": probe_scd2,
    "profile": probe_profile,
    "pagerank": probe_pagerank,
    "bloom": probe_bloom,
    "warehouse": probe_warehouse,
}


if __name__ == "__main__":
    wanted = sys.argv[1:] or list(PROBES)
    # this process creates the JVM, so driver.memory is honored here;
    # on a real cluster the submitter sizes executors instead
    spark = get_spark("scale-probes-r5b", **{"spark.driver.memory": "48g"})
    for w in wanted:
        PROBES[w](spark)
