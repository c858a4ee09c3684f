"""Cross-engine deterministic rounding.

``ROUND(x, 4)`` is NOT portable between engines: Spark rounds through a
shortest-decimal BigDecimal representation, DuckDB rounds the scaled double —
they disagree on values that sit on a .00005 boundary after float error.
``r4``/``sql_r4`` instead use ``floor(x * 10000 + 0.5) / 10000``: every step
(multiply, add, floor, divide) is exact-identical IEEE arithmetic in both
engines, so the rounded doubles are bit-identical by construction. (For
negative inputs this is round-half-toward-+inf — also identical on both
sides, which is the property that matters.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r4(x: Column | str) -> Column:
    """Deterministic 4-dp rounding of a double column (see module doc)."""
    if isinstance(x, str):
        x = F.col(x)
    return F.floor(x * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def sql_r4(expr: str) -> str:
    """DuckDB twin of :func:`r4` for oracle SQL strings."""
    return f"(floor(({expr}) * 10000.0 + 0.5) / 10000.0)"


def scaled_long(x: Column | str, factor: int) -> Column:
    """Portable double→scaled-integer conversion: floor(x·factor + 0.5) as
    BIGINT — round-half-toward-+inf with every step exact-identical IEEE in
    Spark, DuckDB, and a Python ``math.floor`` twin (``ROUND()`` family
    functions disagree between engines on representation ties, same story
    as :func:`r4`). The entry point for the exact-arithmetic operators
    (operators/stats.py consumers): scale once here, then stay integer."""
    if isinstance(x, str):
        x = F.col(x)
    return F.floor(x * F.lit(float(factor)) + F.lit(0.5)).cast("long")


def sql_scaled_long(expr: str, factor: int) -> str:
    """DuckDB twin of :func:`scaled_long` for oracle SQL strings."""
    return f"CAST(floor(({expr}) * {factor}.0 + 0.5) AS BIGINT)"


def tdiv(a: int, b: int) -> int:
    """Truncating integer division (toward zero) for POSITIVE ``b`` — the
    semantics of Spark SQL ``div`` and DuckDB ``//`` (verified:
    ``-7 // 2`` is -3 in DuckDB, -4 in Python). Python-level folds that
    must replay a SQL oracle's division (CUSUM calibration) go through
    this instead of Python's flooring ``//``, which diverges on negative
    numerators."""
    q = abs(a) // b
    return q if a >= 0 else -q
