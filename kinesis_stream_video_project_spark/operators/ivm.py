"""Incremental view maintenance (IVM) for distributive aggregates.

The 100 TB operational primitive behind every materialized rollup: a
maintained view ``V(key) = (n_rows, total)`` over a fact table must
absorb a changeset WITHOUT rescanning the base — counting-algebra IVM
(Blakeley/Larson/Tompa SIGMOD 1986; the delta rules every
incremental-view engine implements for SUM/COUNT): inserts add
``(+1, +v)``, deletes add ``(−1, −v)``, and a group whose maintained
count reaches zero leaves the view. SUM and COUNT are the
self-maintainable aggregates — no base access needed ever; MIN/MAX are
not (a deleted minimum forces a rescan of its group — stated, out of
scope for this operator).

The correctness statement is the whole point: ``merge(V(base), Δ) ==
V(base ∓ deletes ∪ inserts)`` — the registered query runs the
INCREMENTAL path on Spark while the DuckDB oracle recomputes the final
state from the final row set directly, so a hash match certifies the
maintenance algebra on real data.

Scale: the base is touched exactly once (to build or read the
materialized ``base_agg`` — in production that is the stored view, not
a scan); the merge is one aggregate over the changeset (map-side
combined, |changed keys| rows) + one full-outer join of view-sized
frames on the view key. Nothing scales with base row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_state(
    rows: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """The maintained view's state over a row set: ``(key, n_rows,
    total)`` with the value summed in exact integer units (callers
    pre-scale money to cents — the DECIMAL-outputs-banned rule)."""
    return rows.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(value_col).cast("long").alias("total"),
    )


def merge_agg_deltas(
    base_agg: DataFrame,
    delta: DataFrame,
    key_col: str,
    value_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Apply a changeset to a maintained ``(key, n_rows, total)`` view.

    ``delta`` rows carry ``(key, value, op)`` with op 'I' (insert) or
    'D' (delete of an existing base row). Unknown ops and groups whose
    maintained count would go NEGATIVE (a delete for a row the base
    never had — a corrupted changelog) are refused IN-PLAN via
    raise_error (the cdc_apply refusal discipline): silently clamping
    would hide upstream corruption inside a "successful" refresh.
    Groups reaching count 0 drop out of the view (their total is 0 by
    construction at that point — also asserted in-plan, since a zero
    count with nonzero total means value drift)."""
    sign = (
        F.when(F.col(op_col) == "I", F.lit(1))
        .when(F.col(op_col) == "D", F.lit(-1))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("merge_agg_deltas: unknown op "), F.col(op_col)
                )
            )
        )
    )
    d = delta.groupBy(F.col(key_col).alias("key")).agg(
        F.sum(sign).cast("long").alias("_dn"),
        F.sum(sign * F.col(value_col)).cast("long").alias("_dv"),
    )
    merged = base_agg.join(d, "key", "full_outer").select(
        "key",
        (F.coalesce("n_rows", F.lit(0)) + F.coalesce("_dn", F.lit(0)))
        .cast("long")
        .alias("n_rows"),
        (F.coalesce("total", F.lit(0)) + F.coalesce("_dv", F.lit(0)))
        .cast("long")
        .alias("total"),
    )
    guarded = merged.select(
        "key",
        F.when(
            F.col("n_rows") < 0,
            F.raise_error(
                F.concat(
                    F.lit("merge_agg_deltas: negative count for key "),
                    F.col("key").cast("string"),
                    F.lit(" — delete without matching base row"),
                )
            ).cast("long"),
        )
        .otherwise(F.col("n_rows"))
        .alias("n_rows"),
        F.when(
            (F.col("n_rows") == 0) & (F.col("total") != 0),
            F.raise_error(
                F.concat(
                    F.lit("merge_agg_deltas: zero count with nonzero "),
                    F.lit("total for key "),
                    F.col("key").cast("string"),
                )
            ).cast("long"),
        )
        .otherwise(F.col("total"))
        .alias("total"),
    )
    return guarded.filter(F.col("n_rows") > 0)
