"""ML-boundary data assembly (SURVEY.md §3.3 step 5).

The reference's ``ml_models.getXY`` (``model/ml_models.py:180-256``)
reads one CSV per visit and aggregates each time series to mean/max
scalars; ``dl_train.getXY`` builds dense per-hour tensors. Both are
per-visit python loops. Set-level equivalents:

* ``ml_feature_matrix`` — per-visit aggregated features, wide
  (one column per itemid via explicit-domain pivot) or long.
* ``dl_tensor_frame`` — per-visit MapType(itemid → hourly array)
  rows (the pickled ``dataDic`` as a real DataFrame, Parquet-able,
  convertible at the training boundary via ``toPandas``/Arrow or
  streamed per-partition with ``toLocalIterator``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mimic_iv_data_pipeline_spark.operators.pivot import (
    assemble_map_tensor,
    pivot_features,
)


def ml_feature_matrix(
    dense_ts: DataFrame,
    id_col: str = "stay_id",
    code_col: str = "itemid",
    value_col: str = "value",
    agg: str = "mean",
    feature_codes: list | None = None,
    wide: bool = True,
) -> DataFrame:
    """Per-visit scalar features: {mean|max} of each code's series
    (``ml_models.py:180-256`` aggregates each per-visit CSV the same
    way). Long output keys (id, code, feature); wide output pivots over
    an explicit ``feature_codes`` domain for a stable schema."""
    agg_expr = {"mean": F.avg(value_col), "max": F.max(value_col)}[agg]
    if not wide:
        return dense_ts.groupBy(id_col, code_col).agg(agg_expr.alias("feature"))
    if feature_codes is None:
        raise ValueError("wide=True requires an explicit feature_codes domain")
    return pivot_features(
        dense_ts,
        index_cols=[id_col],
        pivot_col=code_col,
        agg_expr=agg_expr,
        values=feature_codes,
    )


def dl_tensor_frame(
    dense_ts: DataFrame,
    id_col: str = "stay_id",
    code_col: str = "itemid",
    time_col: str = "bucket",
    value_col: str = "value",
) -> DataFrame:
    """Per-visit tensor rows: MapType(code → time-ordered value array)
    — the distributed replacement for the pickled ``dataDic``
    (``data_generation_icu.py:680-729``). Write with
    ``.write.parquet(...)``; the training loop reads one partition at a
    time (no single-node pickle bottleneck)."""
    return assemble_map_tensor(
        dense_ts, id_col=id_col, key_col=code_col, time_col=time_col,
        value_col=value_col, out_col="series",
    )


def train_test_split_ids(
    cohort: DataFrame,
    id_col: str = "stay_id",
    weights: tuple[float, ...] = (0.8, 0.2),
    seed: int = 42,
    predefined: list[DataFrame] | None = None,
) -> tuple[DataFrame, ...]:
    """U5: id-level split (``ml_models.py:71`` does set-difference on
    python lists) — ``randomSplit`` on the distinct id relation so the
    split is reproducible and label-leakage-free (ids, not rows).

    ``predefined`` mirrors the reference's pre-split patient files
    (``preprocess_outcomes.py:210-217`` loads ``.train/.valid/.test``
    pickles and intersects): pass one id relation per subset and each is
    semi-joined against the cohort's ids — the returned tuple matches
    ``predefined``'s length and order, ``weights``/``seed`` are ignored.
    ``weights`` may have any number of parts (e.g. 0.7/0.1/0.2 for
    train/valid/test, the reference's random path)."""
    ids = cohort.select(id_col).distinct()
    if predefined is not None:
        return tuple(
            ids.join(p.select(id_col).distinct(), on=id_col, how="semi")
            for p in predefined
        )
    return tuple(ids.randomSplit(list(weights), seed=seed))
