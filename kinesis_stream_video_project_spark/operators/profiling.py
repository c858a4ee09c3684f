"""Column profiling and snapshot drift detection — the ingestion-quality
audits a training pipeline runs on every new data drop (is this shard
shaped like the last one, or did an upstream schema/null-rate/cardinality
regression slip in).

Two designs exist in the repo for per-column profiles; each is right at a
different column count:

* ``table_profile`` (plans/queries_relational3.py): ONE multi-aggregate
  over named columns + ``stack`` unpivot — a single scan, but every extra
  ``countDistinct`` column multiplies the aggregate's Expand fan-out
  (Spark plans n distinct aggregates as an n-way row expansion).
* :func:`column_profile` (here): MELT first — explode each row into
  (col_name, rendered value) pairs, then one groupBy(col_name) with a
  SINGLE distinct aggregate. The Generate multiplies rows by |cols| just
  like Expand would, but the distinct machinery stays one-dimensional
  regardless of column count, and the shuffle is keyed on (col_name,
  value) — the postings discipline. Preferred for wide tables.

Registration note: operator + pytest in round 5; registry entries queued
for the round-6 driver window (plans/registry.py header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column ``(col_name, n_rows, n_non_null, n_distinct)`` in one
    melt + one aggregate. Values are profiled on their rendered string
    (cast) — null stays null through the cast, so the non-null count is
    exact; distinct-on-rendered equals distinct-on-value for the fixture
    types (integers, strings, timestamps; doubles render uniquely per
    distinct double)."""
    if cols is None:
        cols = df.columns
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("m")
    ).select("m.col_name", "m.val")
    return melted.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_non_null"),
        F.countDistinct("val").alias("n_distinct"),
    )


def profile_drift(
    a: DataFrame,
    b: DataFrame,
    cols: list[str] | None = None,
    null_rate_pp_threshold: int = 5,
) -> DataFrame:
    """Snapshot drift report: join the two snapshots' profiles per column
    and flag null-rate shifts — all-integer (the null-rate comparison is
    cross-multiplied: |nn_a·nr_b − nn_b·nr_a| · 100 > pp · nr_a·nr_b ⟺
    the null-rate difference exceeds ``pp`` percentage points), so the
    report is hash-exact in any engine.

    Output per column: the six profile counts from both sides,
    ``null_rate_shifted`` (boolean, never null — a column present on only
    one side is SCHEMA drift, reported by its one-sided counts, not a
    null-rate shift, so the flag coalesces to false there; a nullable
    boolean would also render asymmetrically across engines, 'None' vs
    'nan', and break the driver's rendered-value hash), and
    ``distinct_ratio_num/den`` — the
    cardinality ratio n_distinct_a·n_rows_b vs n_distinct_b·n_rows_a as
    an exact rational pair for the consumer to threshold. Columns present
    in only one snapshot (schema drift) surface via the full-outer join
    with nulls on the missing side — the loudest possible signal, which
    is why the default column set is the UNION of both schemas (an
    intersection default would silently hide exactly the added/dropped
    column the report exists to catch); each side profiles only the
    columns it has."""
    if cols is None:
        cols = list(a.columns) + [c for c in b.columns if c not in set(a.columns)]
    pa = column_profile(a, [c for c in cols if c in a.columns]).select(
        "col_name",
        F.col("n_rows").alias("n_rows_a"),
        F.col("n_non_null").alias("n_non_null_a"),
        F.col("n_distinct").alias("n_distinct_a"),
    )
    pb = column_profile(b, [c for c in cols if c in b.columns]).select(
        "col_name",
        F.col("n_rows").alias("n_rows_b"),
        F.col("n_non_null").alias("n_non_null_b"),
        F.col("n_distinct").alias("n_distinct_b"),
    )
    j = pa.join(pb, "col_name", "full_outer")
    lhs = F.abs(
        F.col("n_non_null_a") * F.col("n_rows_b")
        - F.col("n_non_null_b") * F.col("n_rows_a")
    ) * F.lit(100)
    rhs = (
        F.lit(null_rate_pp_threshold) * F.col("n_rows_a") * F.col("n_rows_b")
    )
    return j.select(
        "col_name",
        "n_rows_a",
        "n_non_null_a",
        "n_distinct_a",
        "n_rows_b",
        "n_non_null_b",
        "n_distinct_b",
        F.coalesce(lhs > rhs, F.lit(False)).alias("null_rate_shifted"),
        (F.col("n_distinct_a") * F.col("n_rows_b")).alias("distinct_ratio_num"),
        (F.col("n_distinct_b") * F.col("n_rows_a")).alias("distinct_ratio_den"),
    )
