"""Deduplication operators for training-data pipelines.

Four tiers, cheapest first — all long-format, shuffle-key'd on content
hashes so they scale horizontally:

  * exact        — md5 groupBy (one shuffle on the 128-bit digest)
  * fingerprint  — exact after normalization (operators/text.py)
  * n-gram Jaccard — shingle self-join (exact pairwise, quadratic in
                     bucket size; use on candidate sets)
  * MinHash + LSH  — sketch + banding: candidate generation is linear,
                     only candidates pay the exact-verify join
  * SimHash        — 64-bit near-dup signature, hamming buckets

At 100 TB: exact/fingerprint are single-shuffle; MinHash-LSH is the
scale path (band buckets bound the quadratic blowup); the pairwise
verify joins stay key-local because both sides are partitioned by the
band/bucket key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.text import tokens


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Exact duplicate groups: md5(text) → (digest, canonical id, size).

    Canonical row = min id (deterministic). One hash aggregate.
    """
    return (
        df.withColumn("digest", F.md5(F.col(text_col)))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column.

    ``transform(sequence(...))`` over the token array — JVM-side, no
    UDF; ``array_distinct`` so Jaccard is over shingle *sets*.
    """
    toks = tokens(text)
    k = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(0)))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    # Shorter-than-n docs produce a single partial gram; keep it (it is
    # still a deterministic canonical form of the whole doc).
    return F.array_distinct(grams)


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard near-dup pairs above ``threshold``.

    Shingle-inverted-index self-join: explode shingles, join on shingle,
    count common per pair, |A∪B| = |A|+|B|−common. The join key is the
    shingle, so co-occurring docs meet without a cartesian product —
    cost is Σ (docs-per-shingle)², bounded for natural corpora; for
    adversarial hot shingles, pre-filter shingles with document
    frequency above a cap (they carry no discriminative signal).
    Emits (id_a < id_b, jaccard).
    """
    shingled = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    sizes = shingled.groupBy("doc").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    common = (
        a.join(b, on="shingle")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("n_shingles").alias("size_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("size_a") + F.col("size_b") - F.col("common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """MinHash sketch: for each of ``num_hashes`` seeded hash functions,
    the min over the doc's shingle set of ``xxhash64(shingle, seed)``.

    One explode + one hash aggregate; signature is an array column. The
    per-seed min is computed with ``min_by``-free arithmetic: explode
    seeds via a literal sequence so the whole thing stays codegen'd.
    """
    shingled = df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), n)).alias("shingle"),
    )
    hashed = shingled.select(
        "doc",
        *[
            F.xxhash64(F.col("shingle"), F.lit(seed)).alias(f"h{seed}")
            for seed in range(num_hashes)
        ],
    )
    sig = hashed.groupBy("doc").agg(
        F.array(*[F.min(f"h{seed}") for seed in range(num_hashes)]).alias("signature")
    )
    return sig


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    verify_threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidate pairs, exact-verified.

    Signature is cut into ``bands`` bands of ``num_hashes/bands`` rows;
    docs sharing any band hash become candidates (linear generation —
    explode bands, groupBy band bucket); candidates are then verified
    with exact n-gram Jaccard so the output has no false positives.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes)
    banded = sig.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.hash(F.slice(F.col("signature"), b * rows_per_band + 1, rows_per_band)).alias(
                        "bucket"
                    ),
                ),
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    candidates = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a.doc") < F.col("b.doc"))
        .select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .distinct()
    )
    exact = ngram_jaccard_pairs(df, id_col, text_col, n, threshold=0.0)
    return (
        candidates.join(exact, on=["id_a", "id_b"], how="inner")
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, id_col: str, text_col: str = "text", bits: int = 64) -> DataFrame:
    """SimHash near-dup signature: sign of the per-bit sum of token-hash
    bit contributions (+1 if the token's xxhash64 has bit b set, −1
    otherwise), packed little-endian into a long.

    Token explode → per-token contribution array (transform over a bit
    sequence) → elementwise array sum via ``aggregate``+``zip_with``
    fold per doc. All built-ins; the fold is over per-doc token counts,
    not the corpus.
    """
    def mask(b: int) -> int:
        # bit 63 as a signed-long literal (two's complement sign bit)
        return (1 << b) if b < 63 else -(1 << 63)

    toked = df.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    h = F.xxhash64("token")
    # Per-bit ±1 contribution, summed map-side by the hash aggregate;
    # bit masks are python-int literals so everything stays codegen'd.
    summed = toked.groupBy("doc").agg(
        *[
            F.sum(
                F.when(h.bitwiseAND(F.lit(mask(b))) != 0, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    sig = sum(
        [F.when(F.col(f"s{b}") > 0, F.lit(mask(b))).otherwise(F.lit(0)) for b in range(bits)],
        start=F.lit(0).cast("long"),
    )
    return summed.select("doc", sig.cast("long").alias("simhash"))
