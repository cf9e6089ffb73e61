"""Small schema helpers shared by the Arrow-batched (mapInPandas)
operators."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["id_field"]


def id_field(df: DataFrame, id_col: str) -> str:
    """DDL fragment for ``id_col`` with its type taken from the input
    relation, for mapInPandas output schemas that pass the id column
    through untouched. Hardcoding ``long`` instead makes a string or
    decimal id die in an opaque Arrow cast error; deriving the type
    keeps the pass-through honest for any id type pandas can carry.
    """
    return f"`{id_col}` {df.schema[id_col].dataType.simpleString()}"
