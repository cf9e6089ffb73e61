"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the scale path (candidates only meet within their bucket,
so the pairwise cost is Σ bucket² instead of n²). All dot products are
built-in higher-order functions (``zip_with`` + ``aggregate``) — JVM
expression tree, Arrow-free, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a sequential left fold (deterministic order — oracle
    and engine agree to float precision)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def as_double_vec(col: Column) -> Column:
    """float32 → float64 elementwise, so arithmetic matches engines that
    upcast before accumulating."""
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the (small) query set
    against the corpus, score every pair, keep k per query.

    Shape at scale: corpus stays partitioned, queries broadcast — one
    narrow map stage plus a top-k window partitioned by query (AQE
    handles the skewless reduction). Excludes self-matches. Ties break
    on corpus id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def hyperplane_signature(vec: Column, dims: int, bits: int = 16) -> Column:
    """Random-hyperplane LSH signature as a packed long.

    Plane p's component for dimension d is a deterministic ±1 derived
    from ``xxhash64(p * dims + d)`` parity — no stored plane matrix, any
    executor can recompute it (the 100 TB-friendly property: zero
    broadcast state). Bit p = 1 iff vec · plane_p > 0.
    """
    def plane_component(p: int, d: Column) -> Column:
        h = F.xxhash64(F.lit(p * dims) + d)
        return F.when(h.bitwiseAND(F.lit(1)) == 1, F.lit(1.0)).otherwise(F.lit(-1.0))

    def bit_for_plane(p: int) -> Column:
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dims - 1)),
                lambda x, d: x.cast("double") * plane_component(p, d),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))

    return sum(
        [bit_for_plane(p) for p in range(bits)], start=F.lit(0).cast("long")
    ).cast("long")


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    bits: int = 8,
    k: int = 5,
) -> DataFrame:
    """Approximate top-k: bucket by hyperplane signature, score only
    within the query's bucket. Recall is tunable via ``bits`` (fewer
    bits → bigger buckets → higher recall, more compute)."""
    sig = lambda df, idc, vc: df.select(  # noqa: E731
        F.col(id_col).alias(idc),
        as_double_vec(F.col(vec_col)).alias(vc),
        hyperplane_signature(F.col(vec_col), dims, bits).alias("bucket"),
    )
    q = sig(queries, "query_id", "qv")
    c = sig(corpus, "neighbor_id", "cv")
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
