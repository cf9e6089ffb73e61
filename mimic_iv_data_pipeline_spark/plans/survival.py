"""Survival-format sequence export (SURVEY.md §2.10; reference
``preprocess_outcomes.py:48-140``).

The reference builds, per patient, nested pickled lists::

    [pt_id, label, [[[Δt₀], [codes of visit 0]],
                    [[Δt₁], [codes of visit 1]], ...]]

where Δt is the day gap between consecutive visits (first visit 0; with
``reverse=True`` — the reference default — visits run latest-first and
Δt is ``prev_date − cur_date``), codes are integer-encoded through an
incrementally-built ``types`` dict seeded with ``{"zero_pad": 0}``, and
the label is either a scalar (binary classification) or
``[event_label, time_to_event]`` (survival). It does this in a pandas
groupby loop per patient and pickles the result.

Distributed form: two shuffles keyed on patient — (pt, visit) code
collection, then per-patient window for Δt + ordered struct collection.
The nested python list becomes a typed nested column
``array<struct<dt: long, codes: array<long>>>`` — Parquet-able, so the
training loop streams partitions instead of unpickling one blob
(S5 pickle → parquet convention, ``sources/sinks.py:16``).

Deviations (documented):
* new vocab codes get ids by deterministic code order, not encounter
  order — the reference's ``max(types.values())+1`` walk depends on
  pandas groupby iteration order, which is not reproducible distributed;
* empty-visit patients are dropped by construction (the reference skips
  them too via ``len(data_i_c) > 0``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def extend_code_vocab(
    events: DataFrame,
    code_col: str = "code",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """The reference's ``types`` dict as a relation (code, id).

    Seeded with ``zero_pad → 0`` (``preprocess_outcomes.py:100``);
    an existing vocab is extended, never re-numbered — new codes take
    ids after the current max, in deterministic code order (see module
    docstring). Broadcast-sized by construction (a code vocabulary).
    """
    spark = events.sparkSession
    if vocab is None:
        vocab = spark.createDataFrame([("zero_pad", 0)], "code string, id long")
    new_codes = (
        events.select(F.col(code_col).cast("string").alias("code"))
        .distinct()
        .join(vocab.select("code"), on="code", how="left_anti")
        .withColumn("__rk", F.row_number().over(Window.orderBy("code")))
    )
    max_id = vocab.agg(F.max("id").alias("m"))
    extended = new_codes.join(F.broadcast(max_id), how="cross", on=None).select(
        "code", (F.col("m") + F.col("__rk")).alias("id")
    )
    return vocab.unionByName(extended)


def survival_sequences(
    events: DataFrame,
    labels: DataFrame,
    id_col: str = "pt_id",
    code_col: str = "code",
    time_col: str = "visit_date",
    label_cols: list[str] | None = None,
    vocab: DataFrame | None = None,
    reverse: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Δt-coded visit sequences with survival labels.

    ``events``: (pt, code, visit_date) rows — the reference's three-column
    case/control file. ``labels``: (pt, *label_cols) — e.g.
    ``["mort_label", "LOS"]`` for the reference's multilabel, or
    ``["event_label", "time_to_event"]`` for survival. Patients present
    in events but not labels are dropped (reference inner-merges,
    ``preprocess_outcomes.py:75``).

    Returns ``(sequences, vocab)`` where sequences has::

        pt, label: array<double>, visits: array<struct<dt: long,
                                                 codes: array<long>>>

    and vocab is the (possibly extended) code dictionary used.
    """
    label_cols = list(label_cols or ["event_label", "time_to_event"])
    vocab = extend_code_vocab(events, code_col, vocab)

    coded = events.select(
        F.col(id_col).alias("pt"),
        F.col(code_col).cast("string").alias("code"),
        F.to_date(F.col(time_col)).alias("vdate"),
    ).join(F.broadcast(vocab), on="code")

    # visit rows: codes of one (pt, date), kept in deterministic id order
    visits = coded.groupBy("pt", "vdate").agg(
        F.sort_array(F.collect_list("id")).alias("codes")
    )

    # Δt between consecutive visits in sequence order (reverse=True →
    # latest first, Δt = prev_date − cur_date ≥ 0; first visit Δt=0)
    order = F.col("vdate").desc() if reverse else F.col("vdate").asc()
    w = Window.partitionBy("pt").orderBy(order)
    prev = F.lag("vdate").over(w)
    dt_days = F.when(prev.isNull(), F.lit(0)).otherwise(
        F.abs(F.datediff(prev, F.col("vdate")))
    )
    with_dt = visits.withColumn("dt", dt_days.cast("long"))

    # ordered struct collection; sort key = visit date in sequence order
    sort_key = (
        (F.lit(0) - F.unix_date(F.col("vdate"))) if reverse else F.unix_date(F.col("vdate"))
    )
    seqs = (
        with_dt.select("pt", sort_key.alias("__k"), F.struct("dt", "codes").alias("__v"))
        .groupBy("pt")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__k", "__v"))),
                lambda s: s["__v"],
            ).alias("visits")
        )
    )

    lab = labels.select(
        F.col(id_col).alias("pt"),
        F.array(*[F.col(c).cast("double") for c in label_cols]).alias("label"),
    )
    out = seqs.join(lab, on="pt")  # inner: reference keeps labeled pts only
    return out.select("pt", "label", "visits"), vocab
