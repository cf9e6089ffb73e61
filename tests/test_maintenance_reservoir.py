"""Streaming weighted reservoir batch-equivalence; compaction and
manifest behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.sampling import weighted_sample
from mimic_iv_data_pipeline_spark.sources.maintenance import (
    compact_parquet,
    file_manifest,
)


def test_stream_reservoir_equals_batch_sample(spark, tmp_path):
    """Top-k over the emitted log must equal the batch weighted_sample
    over the same rows — regardless of how the stream was batched."""
    from pyspark.sql import types as T

    from mimic_iv_data_pipeline_spark.streaming.stateful import (
        stream_weighted_sample,
    )

    schema = T.StructType(
        [T.StructField("key", T.LongType()), T.StructField("w", T.DoubleType())]
    )
    rows = [(i, float(1 + (i * 7) % 13)) for i in range(400)]
    b1, b2 = rows[:250], rows[250:]

    src = tmp_path / "res_src"
    src.mkdir()
    out_dir = str(tmp_path / "res_out")
    ckpt = str(tmp_path / "res_ckpt")
    K = 25

    def run():
        stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
        q = (
            stream_weighted_sample(stream, "key", "w", k=K, num_shards=4)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(b1, schema).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b1")
    )
    run()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("overwrite").parquet(
        str(src / "b2")
    )
    run()

    emitted = spark.read.parquet(out_dir)
    final = (
        emitted.orderBy(F.col("es_key").asc(), F.col("key").asc())
        .limit(K)
        .select("key")
        .collect()
    )
    got = sorted(r["key"] for r in final)

    batch_df = spark.createDataFrame(rows, schema)
    want = sorted(
        r["key"] for r in weighted_sample(batch_df, "key", "w", k=K).collect()
    )
    assert got == want

    # monotone-acceptance superset: every final winner was emitted
    emitted_keys = {r["key"] for r in emitted.select("key").distinct().collect()}
    assert set(want) <= emitted_keys


def test_file_manifest_counts_and_spans(spark, tmp_path, sf_smoke):
    cust = spark.read.parquet(f"{sf_smoke}/customer.parquet")
    path = str(tmp_path / "cust4")
    cust.repartition(4).write.parquet(path)
    man = file_manifest(spark.read.parquet(path), ["c_custkey"]).collect()
    assert len(man) == 4
    assert sum(r["n_rows"] for r in man) == cust.count()
    lo = cust.agg(F.min("c_custkey")).first()[0]
    hi = cust.agg(F.max("c_custkey")).first()[0]
    assert min(r["min_c_custkey"] for r in man) == lo
    assert max(r["max_c_custkey"] for r in man) == hi


def test_compact_parquet_reduces_files_and_preserves_rows(spark, tmp_path, sf_smoke):
    orders = spark.read.parquet(f"{sf_smoke}/orders.parquet")
    src = str(tmp_path / "many")
    orders.repartition(37).write.parquet(src)  # fragment it
    out = str(tmp_path / "compacted")
    n = orders.count()
    target = max(1, n // 4)  # aim for ~4 clustered output files
    n_files = compact_parquet(
        spark, src, out, target_rows_per_file=target, sort_within_by=["o_orderkey"]
    )
    assert n_files == max(1, -(-n // target))
    back = spark.read.parquet(out)
    assert back.count() == n
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, orders.collect()))
    # repartitionByRange + sort: files hold near-disjoint key ranges, so
    # per-file spans shrink vs the round-robin fragments (each of which
    # spans almost the whole key domain)
    man_new = file_manifest(back, ["o_orderkey"]).collect()
    man_old = file_manifest(spark.read.parquet(src), ["o_orderkey"]).collect()

    def mean_span(man):
        return sum(r["max_o_orderkey"] - r["min_o_orderkey"] for r in man) / len(man)

    assert len(man_new) >= 3
    assert mean_span(man_new) < 0.6 * mean_span(man_old)
