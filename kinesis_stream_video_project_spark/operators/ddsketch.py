"""Log-bucket quantile sketch with a provable relative-error bound — the
integer-portable γ=2 instance of DDSketch (Masson, Lee & Rindal,
"DDSketch: a fast and fully-mergeable quantile sketch with
relative-error guarantees", VLDB 2019).

Completes the repo's mergeable-sketch family with the quantile member:
HLL (distinct, opaque), KMV (distinct, hash-checkable), Bloom
(membership), Count-Min (frequency), Space-Saving (top-k) — and now
bounded-relative-error quantiles. Where ``exact_group_percentiles``
walks the full distinct-value ledger (the audit tier) and
``approx_percentiles_value`` uses Spark's opaque GK sketch, this sketch
is ~64 integer cells per group whose CONTENT hash-checks against a SQL
oracle, because the bucket index is pure integer arithmetic:

``bucket(v) = floor(log2(v)) = length(bin(v)) - 1``  for v >= 1

(Spark ``length(bin(v)) - 1``; DuckDB ``length(printf('%b', v)) - 1``
— both exact on BIGINT, no libm). The laws:

* containment: the quantile walk returns the bucket holding the exact
  rank-``ceil(q*n)`` element, so with the arithmetic-midpoint estimate
  ``est = 3 * 2^(b-1)`` the true disc-quantile ``t`` satisfies
  ``t ∈ [2^b, 2^(b+1))`` ⇒ ``est/t ∈ (3/4, 3/2]`` — a hard two-sided
  relative-error bound, asserted per group per quantile in tests
  (γ=2 trades DDSketch's tunable α for integer portability; finer γ
  needs float log, which the repo's no-libm oracle discipline forbids);
* mergeability: bucket counts add cell-wise, so partition partials
  combine associatively — map-side combine bounds per-partition state
  at ~64 cells regardless of input size (pinned in tests, the CMS
  discipline);
* monotonicity: estimates are non-decreasing in q (cumulative walk).

Scale shape: one hash aggregate to ``(group, bucket)`` cells (map-side
combined), then the quantile walk windows over <= 64 rows per group —
no key-cardinality window anywhere. The registered audit query carries
the exact disc-quantile next to the estimate (the CMS/KMV accounting
discipline).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dd_bucket(v: Column) -> Column:
    """``floor(log2(v))`` for BIGINT ``v >= 1`` via bit-length — exact
    integer, portable (DuckDB: ``length(printf('%b', v)) - 1``)."""
    return (F.length(F.bin(v)) - 1).cast("int")


def dd_sketch(df: DataFrame, value: str, group: str) -> DataFrame:
    """The sketch table ``(group, bucket, cnt)``; values must be >= 1
    (refused loudly otherwise — zero/negative values have no log
    bucket; callers shift or filter first, and the registered query
    uses integer cents of a positive price)."""
    v = F.col(value)
    guarded = F.when(
        v >= 1, dd_bucket(v)
    ).otherwise(
        F.expr(
            f"raise_error(concat('dd_sketch: value < 1 has no log2 bucket: ', "
            f"CAST({value} AS STRING)))"
        )
    )
    return (
        df.select(F.col(group), guarded.alias("bucket"))
        .groupBy(group, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dd_quantiles(
    df: DataFrame,
    value: str,
    group: str,
    q_permille: Sequence[int] = (500, 900, 990),
) -> DataFrame:
    """Per-group quantile estimates with the γ=2 midpoint rule:
    ``(group, q_permille, n, dd_est)``.

    For each q the walk picks the first bucket whose cumulative count
    reaches ``ceil(q * n / 1000)`` (the disc-quantile rank) and emits
    ``est = 3 * 2^(bucket-1)`` (integer for bucket >= 1; bucket 0 — the
    value 1 — emits 1 exactly). Window runs over the <= 64-row sketch.
    """
    for q in q_permille:
        if not 0 < q <= 1000:
            raise ValueError(f"dd_quantiles: q_permille must be in (0, 1000], got {q}")
    sketch = dd_sketch(df, value, group)
    w = Window.partitionBy(group).orderBy("bucket")
    cum = sketch.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy(group))
    )
    qs = F.explode(
        F.array(*[F.lit(q) for q in q_permille])
    ).alias("q_permille")
    probed = cum.select(group, "bucket", "cum", "n", qs)
    # disc-quantile rank: ceil(q*n/1000) = (q*n + 999) div 1000
    rank = F.expr("(q_permille * n + 999) div 1000")
    hits = probed.filter(F.col("cum") >= rank)
    w_first = Window.partitionBy(group, "q_permille").orderBy("bucket")
    est = F.when(F.col("bucket") == 0, F.lit(1)).otherwise(
        F.expr("shiftleft(CAST(3 AS BIGINT), bucket - 1)")
    )
    return (
        hits.withColumn("_rn", F.row_number().over(w_first))
        .filter(F.col("_rn") == 1)
        .select(
            group,
            F.col("q_permille").cast("long").alias("q_permille"),
            F.col("n").cast("long").alias("n"),
            est.cast("long").alias("dd_est"),
        )
    )
