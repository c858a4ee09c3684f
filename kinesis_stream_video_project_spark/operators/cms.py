"""Count-Min sketch: fixed-memory frequency estimation with a one-sided
error guarantee (Cormode & Muthukrishnan, J. Algorithms 2005).

The batch companion of the Space-Saving heavy-hitters tier
(``operators/heavy.py``): where Space-Saving keeps the top keys,
Count-Min answers point frequency queries for ANY key from a
``depth x width`` integer table whose size is independent of key
cardinality. Unlike the Space-Saving counter table, the CMS cell values
are **arrival-order independent** (each cell is a plain count of the
rows hashing into it), so the whole sketch — not just its guarantees —
is hash-checkable against a SQL oracle. The laws:

* one-sided error: ``estimate(k) >= true_count(k)`` for every key
  (a cell only ever over-counts — it sums collisions);
* sum invariant: every depth row sums to N (each arrival increments
  exactly one cell per row);
* mergeability: sketches add cell-wise, so partition-local partials
  combine associatively — the 100 TB story is a map-side combine down
  to ``depth x width`` cells per partition, then one tiny shuffle.

Hash family: the portable md5-substring integers of
``sampling.hash_bucket`` — row ``j`` hashes ``md5(j || ':' || key)``,
so DuckDB derives bit-identical cells and the driver hash gate applies
to the sketch itself.

Sizing note (probed, see tests): width=16/depth=3 against the events
fixture spans both regimes — at sf0.001 (15 users) roughly half the
keys collide somewhere in all three rows; at sf>=0.01 (150+ users into
16 buckets) every key overcounts. The registered audit query carries
``exact_cnt`` next to ``cms_est`` so the error is measured, not
assumed — the Bloom-tier FP-accounting discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(key: Column, row: int, width: int) -> Column:
    """Depth-row ``row``'s bucket for ``key``: portable md5-substring
    integer (identical in DuckDB: ``('0x' || substr(md5(j || ':' || k),
    1, 8))::BIGINT % width``)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}:"), key.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def cms_sketch(
    df: DataFrame, key: str, width: int = 16, depth: int = 3
) -> DataFrame:
    """Build the ``depth x width`` sketch table ``(j, bucket, cnt)``.

    One explode to ``depth`` (j, bucket) pairs per row, one hash
    aggregate: map-side combine bounds per-partition partial state at
    ``depth * width`` cells regardless of input size, and the shuffle
    moves only those cells. Empty cells are absent (cnt=0 implicit).
    """
    if width < 2 or depth < 1:
        raise ValueError(f"cms_sketch: need width >= 2, depth >= 1, got {width}x{depth}")
    k = F.col(key)
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"), cms_bucket(k, j, width).alias("bucket")
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.j").alias("j"), F.col("p.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimates(
    df: DataFrame, key: str, width: int = 16, depth: int = 3
) -> DataFrame:
    """Per-key audit frame: ``(key, exact_cnt, cms_est, overcount)``.

    ``cms_est = min_j sketch[j][h_j(key)]`` — the Count-Min point query.
    The sketch side is at most ``depth * width`` rows, so the probe join
    broadcasts; the only key-cardinality shuffles are the exact-count
    aggregate (the audit pairing — production queries the sketch alone)
    and its reuse for the final min fold.
    """
    sketch = cms_sketch(df, key, width, depth)
    exact = df.groupBy(key).agg(F.count(F.lit(1)).alias("exact_cnt"))
    k = F.col(key)
    probes = exact.select(
        key,
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        cms_bucket(k, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key, "exact_cnt", F.col("p.j").alias("j"), F.col("p.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "inner")
        .groupBy(key, "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
        .withColumn("overcount", F.col("cms_est") - F.col("exact_cnt"))
    )
