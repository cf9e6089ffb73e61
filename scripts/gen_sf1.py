"""Generate a local sf1 dataset (10x sf0.1) for the r9 scaling battery.

NOT a testdata regeneration (that dir is read-only and driver-owned) —
a derived 10x scale-up of only the four tables the most expensive
bench queries read, written to ``<repo>/.sf1/sf1/``. The design goal
is that per-query WORK scales 10x without distorting the data's
statistical profile:

* ``events``    — 10 key-shifted copies (event_id/user_id disjoint per
                  copy); the per-event_type value distribution is
                  preserved exactly, so q180's bootstrap does 10x rows
                  over the same groups.
* ``customer``  — keys 0..149_999 with names regenerated as
                  ``Customer#%09d`` (the sf0.1 generator's own format),
                  exactly what a real sf1 run would emit; the
                  edit-distance-1 neighbor profile stays natural
                  (zero-padded digit strings), no duplicate names.
* ``lineitem``  — 10 order-key-shifted copies, part keys UNSHIFTED:
                  baskets keep their size distribution, the item
                  vocabulary stays fixed, so q168's support fractions
                  are unchanged while basket count grows 10x (the
                  "facts scale, dimensions don't" regime).
* ``documents`` — 10 doc-id-shifted copies; copy 0 is verbatim, copies
                  1..9 get a DETERMINISTIC per-copy word shuffle
                  (sort words by xxhash64(word, position, copy)). The
                  bag-of-words is preserved (q190's NB counts scale
                  exactly 10x over the same vocabulary) while 3-gram
                  shingles across copies decorrelate (E[J] ~ 0.002 for
                  the ~30-word vocab), so q88's near-dup pair count
                  scales 10x instead of exploding into cross-copy
                  mega-clusters.

Deterministic end to end (no RNG). Run:
    python scripts/gen_sf1.py          # writes .sf1/sf1/*.parquet
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from mimic_iv_data_pipeline_spark import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".sf1", "sf1")
COPIES = 10


def _copies(df: DataFrame) -> DataFrame:
    """Cross join with a 10-row copy index (broadcast literal range)."""
    spark = df.sparkSession
    idx = spark.range(COPIES).select(F.col("id").cast("int").alias("__copy"))
    return df.crossJoin(F.broadcast(idx))


def main() -> None:
    spark = get_spark("gen_sf1")
    os.makedirs(OUT, exist_ok=True)

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    (
        _copies(ev)
        .select(
            (F.col("event_id") + F.col("__copy") * F.lit(1_000_000)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("__copy") * F.lit(100_000)).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(f"{OUT}/events.parquet")
    )

    cust = spark.read.parquet(f"{SRC}/customer.parquet")
    (
        _copies(cust)
        .select(
            (F.col("c_custkey") + F.col("__copy") * F.lit(15_000)).alias("c_custkey"),
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        )
        .withColumn("c_name", F.format_string("Customer#%09d", F.col("c_custkey")))
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .repartition(8)
        .write.mode("overwrite")
        .parquet(f"{OUT}/customer.parquet")
    )

    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    (
        _copies(li)
        .select(
            (F.col("l_orderkey") + F.col("__copy") * F.lit(150_000)).alias("l_orderkey"),
            *[c for c in li.columns if c != "l_orderkey"],
        )
        .repartition(64)
        .write.mode("overwrite")
        .parquet(f"{OUT}/lineitem.parquet")
    )

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    shuffled = F.array_join(
        F.transform(
            F.array_sort(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w, i: F.struct(
                        F.xxhash64(w, i, F.col("__copy")).alias("h"), w.alias("w")
                    ),
                )
            ),
            lambda s: s["w"],
        ),
        " ",
    )
    (
        _copies(docs)
        .select(
            (F.col("doc_id") + F.col("__copy") * F.lit(5_000)).alias("doc_id"),
            F.when(F.col("__copy") == 0, F.col("text"))
            .otherwise(shuffled)
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .repartition(8)
        .write.mode("overwrite")
        .parquet(f"{OUT}/documents.parquet")
    )

    # embeddings (r10: q221/q222-family sf1 exponents need it): 10
    # copies with shifted vec_ids; copies >0 get a deterministic
    # per-dimension perturbation so near-dup structure scales without
    # becoming exact duplicates (which would degenerate cosine ranks).
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    perturbed = F.transform(
        F.col("embedding"),
        lambda x, i: x
        + (
            F.pmod(F.xxhash64(F.col("vec_id"), F.col("__copy"), i), F.lit(1000))
            .cast("float")
            / F.lit(10_000.0)
            - F.lit(0.05)
        )
        * F.when(F.col("__copy") == 0, F.lit(0.0)).otherwise(F.lit(1.0)),
    )
    (
        _copies(emb)
        .select(
            (F.col("vec_id") + F.col("__copy") * F.lit(2_000)).alias("vec_id"),
            perturbed.alias("embedding"),
            "label",
            "__copy",
        )
        .drop("__copy")
        .repartition(8)
        .write.mode("overwrite")
        .parquet(f"{OUT}/embeddings.parquet")
    )

    for t in ("events", "customer", "lineitem", "documents", "embeddings"):
        n = spark.read.parquet(f"{OUT}/{t}.parquet").count()
        print(f"{t}: {n} rows", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
