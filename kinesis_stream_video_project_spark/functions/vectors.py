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


def token_buckets(text: Column | str, dims: int) -> Column:
    """Per-token md5 feature-hash buckets (the "hashing trick",
    Weinberger/Dasgupta/Langford/Smola/Attenberg ICML 2009): token t →
    dimension ``md5-bucket(t) mod dims`` — the portable bucket rule, so
    any engine derives identical buckets."""
    return F.transform(
        F.split(F.lower(text), " "),
        lambda t: (
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
            % dims
        ).cast("int"),
    )


def hashed_bow(text: Column | str, dims: int = 64) -> Column:
    """Row-local hashing-trick bag-of-words embedding: per-dimension
    token COUNTS as ``array<double>`` — model-free, vocabulary-free,
    a pure function of the text (hash-gate checkable). Verbatim
    duplicates embed identically (cosine 1.0); token-multiset overlap
    lower-bounds the cosine — the property SemDeDup-style semantic
    dedup consumes.

    COST WARNING (measured): higher-order functions run INTERPRETED
    per element, and the dims nested filter passes cost ~13-16 s for
    5 000 x ~60-token docs at dims=64 — use :func:`hashed_bow_table`
    (the explode → count → dense aggregate form, 1.2 s warm on the
    same input) anywhere past a few hundred rows. This expression form
    exists for single-row/driver-side convenience and as the
    definitional contract the table form is pinned against."""
    buckets = token_buckets(text, dims)
    return F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda d: F.size(
            F.filter(buckets, lambda b: b == d.cast("int"))
        ).cast("double"),
    )


def hashed_bow_table(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    dims: int = 64,
):
    """The scale form of :func:`hashed_bow`: ``(id_col, embedding)``
    via explode → map-side-combined (id, bucket) count → per-id map →
    one dense transform probing the ≤ dims-entry map per dimension
    (MapData element_at is linear, but over ≤ dims entries — NOT the
    corpus; the dense-from-sparse rule's cheap case). One shuffle on
    the id; 13× faster than the row-local expression at sf0.1
    (measured 16 → 1.2 s warm) because it does ONE pass over tokens
    instead of dims interpreted filter passes per row.

    Bit-identical to the expression form (integer counts cast to
    double — pinned in tests), so either side of a downstream cosine
    can use either form."""
    from pyspark.sql import DataFrame  # noqa: F401  (signature clarity)

    sparse = (
        df.select(F.col(id_col), F.explode(token_buckets(F.col(text_col), dims)).alias("_b"))
        .groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).cast("double").alias("_c"))
        .groupBy(id_col)
        .agg(F.map_from_entries(F.collect_list(F.struct("_b", "_c"))).alias("_m"))
    )
    return sparse.select(
        id_col,
        F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda d: F.coalesce(
                F.element_at("_m", d.cast("int")), F.lit(0.0)
            ),
        ).alias("embedding"),
    )
