"""Driver-facing query registry.

Each submodule registers named queries: a PySpark callable
``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` at the repo root
re-exports the merged registry for the correctness driver.

Conventions (driver compare = row count + schema + order-insensitive
value hash with columns sorted by name):
  * every computed column is aliased IDENTICALLY in Spark and SQL;
  * floating-point aggregates are rounded to a fixed scale on BOTH
    sides so engine-order summation noise can't flip the hash;
  * timestamps in outputs are formatted to strings (tz-proof);
  * integer-ish outputs are cast to long/BIGINT on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, SparkQuery] = {}
_ORACLES: dict[str, str] = {}

_MODULES = [
    "relational",
    "analytic",
    "temporal",
    "text",
    "similarity",
    "coverage",
    "llmops",
]


def register(name: str, oracle: str | None = None):
    """Decorator: register a spark query and its oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load() -> None:
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")


def all_queries() -> dict[str, SparkQuery]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)
