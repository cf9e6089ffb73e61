"""Bucketed-table tests: co-located joins and aggregations plan without
an exchange on the bucketed key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.sources.sinks import write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_smoke):
    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    write_bucketed(li, "li_bucketed", ["l_orderkey"], 8, sort_by=["l_orderkey"])
    write_bucketed(o, "o_bucketed", ["o_orderkey"], 8, sort_by=["o_orderkey"])
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_is_shuffle_free(spark, bucketed_tables):
    li = spark.table("li_bucketed")
    o = spark.table("o_bucketed")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).count()
        plan = _plan(joined)
        # sort-merge join directly over the bucketed scans: the join
        # itself needs no Exchange (only the final small aggregate does)
        assert "SortMergeJoin" in plan
        join_part = plan.split("SortMergeJoin")[1]
        assert "Exchange" not in join_part, "bucketed join must not reshuffle"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_matches_plain_join(spark, bucketed_tables, sf_smoke):
    li_raw = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    o_raw = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    plain = (
        li_raw.join(o_raw, li_raw.l_orderkey == o_raw.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bucketed = (
        spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, bucketed.collect()))
