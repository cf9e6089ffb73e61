"""Engine-consistent rounding.

``F.round`` on doubles rounds the decimal *shortest representation*
HALF_UP (70.476249999…, repr "70.47625" → 70.4763), while DuckDB,
numpy and C++ ``round`` operate on the binary value (→ 70.4762). Any
oracle-differential compare therefore flips whenever a result's repr
lands exactly on a .5 decimal boundary — observed ~1/700k values at
sf0.1.

``dround`` rounds the binary value half-away-from-zero via
``floor(x·10ⁿ + 0.5)/10ⁿ`` — bit-identical to DuckDB's ``round`` on
positive and (non-exact-half) negative doubles, validated on 60k
random samples in the round-trip harness. Use it for every
float column that an external engine will re-compute.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, scale: int = 0) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # plain Python floats: Column ops lift literals JVM-side, identical
    # to F.lit(...) but one py4j round-trip cheaper per operand (r12 —
    # dround is on nearly every query's build path)
    factor = float(10**scale)
    return F.floor(c * factor + 0.5) / factor


def dround_sql(expr: str, scale: int = 0) -> str:
    """SQL-string twin of :func:`dround` (r12, guide §5) — the same
    floor(x·10ⁿ + 0.5)/10ⁿ tree from one parser call. ``expr`` is a SQL
    snippet (column name or parenthesized expression)."""
    factor = repr(float(10**scale))
    return f"FLOOR(({expr}) * {factor}D + 0.5D) / {factor}D"
