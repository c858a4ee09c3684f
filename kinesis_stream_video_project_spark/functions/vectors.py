"""Embedding/vector column math via JVM higher-order functions (O-26/O-30).

All of this stays inside Catalyst expressions (zip_with/aggregate): no Python
crossing, no UDF — at 100 TB the dot products run inside whole-stage codegen
next to the scan. Floats are cast to double before multiplication so Spark
and the DuckDB oracle fold identical doubles in identical (left-to-right)
order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float/double array columns, folded in array order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def squared_norm(a: Column | str) -> Column:
    return F.aggregate(
        a,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(squared_norm(a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null-safe only insofar as inputs are non-empty and
    non-zero (the fixture guarantees both)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
