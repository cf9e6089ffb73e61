"""BEHRT-style patient-sequence tokenization (SURVEY.md §2.10 D7, A9).

The reference's ``model/tokenization.py`` builds per-patient token
sequences (condition codes + quantile-binned lab tokens + age/sep
markers) with a python loop per patient (``:21-61``) and caps length at
512 (``:46-47``). Set-level form: quantile-bin labs with ``ntile`` (A9),
union the token streams, order within patient by (time, modality,
token), and assemble with ``collect_list`` over a sorted struct — one
shuffle per stage, no per-patient loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.aggregates import quantile_bins


def lab_tokens(
    labs: DataFrame,
    id_col: str = "subject_id",
    code_col: str = "itemid",
    value_col: str = "valuenum",
    time_col: str = "t",
    n_bins: int = 4,
) -> DataFrame:
    """A9: per-itemid quartile binning → token "itemid_Qk"
    (``tokenization.py:111-119``). Deterministic ntile ordering via
    (value, id, time) tie-break."""
    binned = quantile_bins(
        labs, code_col, value_col, tie_break=[id_col, time_col], n_bins=n_bins
    )
    return binned.select(
        id_col,
        time_col,
        F.concat_ws("_", F.col(code_col).cast("string"), F.concat(F.lit("Q"), F.col("bin"))).alias(
            "token"
        ),
        F.lit("lab").alias("modality"),
    )


def condition_tokens(
    diagnoses: DataFrame,
    id_col: str = "subject_id",
    code_col: str = "icd_code",
    time_col: str = "t",
) -> DataFrame:
    return diagnoses.select(
        id_col,
        time_col,
        F.col(code_col).alias("token"),
        F.lit("cond").alias("modality"),
    )


def build_sequences(
    token_streams: list[DataFrame],
    id_col: str = "subject_id",
    time_col: str = "t",
    max_len: int = 512,
) -> DataFrame:
    """Assemble per-patient ordered token sequences.

    Union the modality streams, sort within patient by (time, modality,
    token) via ``sort_array`` over collected structs (no window), take
    the first ``max_len`` tokens with ``slice``. The reference DROPS
    patients whose sequence exceeds 512 (``tokenization.py:46-47``);
    we keep the head slice and flag truncation — both behaviors exposed
    via ``seq_len``/``truncated`` so callers can filter to match.
    """
    unioned = token_streams[0]
    for s in token_streams[1:]:
        unioned = unioned.unionByName(s)
    assembled = unioned.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct(time_col, "modality", "token"))
        ).alias("__sorted")
    )
    toks = F.col("__sorted.token")
    return assembled.select(
        id_col,
        F.slice(toks, 1, max_len).alias("tokens"),
        F.size(toks).cast("long").alias("seq_len"),
        (F.size(toks) > max_len).alias("truncated"),
    )


def build_vocab(sequences: DataFrame, special: list[str] | None = None) -> DataFrame:
    """A15: token vocabulary with stable ids — special tokens first,
    then alphabetical corpus tokens (``model_utils.py:20-36`` pickles
    python dicts; here a DataFrame, broadcastable into encode joins).

    The alphabetical rank is computed WITHOUT a global single-partition
    window (the r9 review's scale fix — a web-scale corpus has 10⁸+
    distinct tokens, and ``row_number().over(Window.orderBy(...))``
    funnels all of them through one task): tokens bucket by their
    2-char prefix — a VALUE-deterministic key that is a prefix of the
    sort key, so buckets are contiguous in the total order — rank
    within each bucket in a distributed window, and add per-bucket
    offsets from a prefix sum over the tiny bucket-count relation
    (broadcast back). The ``global_prefix_sums`` recipe, specialized
    to a string order key. Skew bound: one bucket holds one 2-char
    prefix's tokens (natural-language prefixes are uneven but
    thousands of buckets deep, never one giant task).
    """
    from pyspark.sql.window import Window

    specials = special or ["[PAD]", "[CLS]", "[SEP]", "[MASK]", "[UNK]"]
    sp = sequences.sparkSession.createDataFrame(
        [(i, tok) for i, tok in enumerate(specials)], "id long, token string"
    )
    toks = sequences.select(F.explode("tokens").alias("token")).distinct()
    # NULL tokens (a null element inside a tokens array) coalesce into
    # the ""-prefix bucket — a plain equi-join on a NULL bucket would
    # silently drop the row (NULL != NULL; the r10 corpus-index parity
    # test caught the identical bug in build_corpus_index). "" keeps
    # the bucket map monotone under the nulls-first total order.
    bucketed = toks.withColumn(
        "__b", F.coalesce(F.substring("token", 1, 2), F.lit(""))
    )
    ranked = bucketed.withColumn(
        "__r",
        F.row_number().over(Window.partitionBy("__b").orderBy("token")),
    )
    offsets = (
        bucketed.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__n").over(
                    Window.orderBy("__b").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("__b", "__off")
    )
    corpus = (
        ranked.join(F.broadcast(offsets), "__b")
        .select(
            (F.col("__off") + F.col("__r") - 1 + len(specials)).alias("id"),
            "token",
        )
    )
    return sp.unionByName(corpus)


def encode_sequences(sequences: DataFrame, vocab: DataFrame) -> DataFrame:
    """F13: token → id encoding as an explode + broadcast join +
    re-collect (replaces the reference's dict ``replace`` loop,
    ``dl_train.py:347-351``); unknown tokens map to [UNK]."""
    # aggregate to EXACTLY one row (NULL id when the vocab has no
    # [UNK]): a bare filter+crossJoin would go EMPTY on such a vocab
    # and silently drop every patient (r9 review). A missing [UNK]
    # now only matters if an out-of-vocab token actually appears —
    # then it raises with a message instead of vanishing rows.
    unk = vocab.filter(F.col("token") == "[UNK]").agg(
        F.min("id").alias("__unk")
    )
    exploded = sequences.select(
        "subject_id", F.posexplode("tokens").alias("pos", "token")
    )
    encoded = (
        exploded.join(F.broadcast(vocab), on="token", how="left")
        .crossJoin(F.broadcast(unk))
        .withColumn(
            "id",
            F.coalesce(
                F.col("id"),
                F.col("__unk"),
                F.raise_error(
                    F.concat(
                        F.lit(
                            "encode_sequences: token not in vocab and no "
                            "[UNK] row to fall back to: "
                        ),
                        F.col("token"),
                    )
                ).cast("long"),
            ),
        )
    )
    return encoded.groupBy("subject_id").agg(
        F.sort_array(F.collect_list(F.struct("pos", "id"))).alias("__s")
    ).select("subject_id", F.col("__s.id").alias("token_ids"))
