"""Gaps-and-islands operators: consecutive-run detection and sessionization.

Batch re-expression of the reference watchdog's stateful counters:

* ``consecutive_runs`` — the consecutive-failure counter ``kvs_failed_cnt``
  tripping at ``max_failed_cnt=3`` (restart.sh:15-16,86-101) becomes run-length
  detection over an ordered event log.
* ``sessionize`` — the probe-batch + cooldown grouping (restart.sh:76-82)
  becomes gap-based sessionization.

Scale notes: both are a single shuffle on the key (window partitionBy); no
self-join, no Python. At 100 TB the per-key ordering is the unavoidable cost
of run semantics; AQE handles key skew, and partitionBy(key) ordering uses
spill-able window frames (bounded memory).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def consecutive_runs(
    df: DataFrame,
    key: str,
    order: list[str],
    flag: Column,
    min_len: int = 1,
) -> DataFrame:
    """Detect maximal runs of rows where ``flag`` holds, per ``key``.

    Classic two-row_number difference: rows are numbered within the key and
    within the (key, flag) stripe; their difference is constant exactly along
    a maximal run, so it serves as a run id. One shuffle; both row_numbers
    share the same partitioning so Catalyst plans a single Window stage.

    Returns: key, run_id, run_len, run_start_us, run_end_us (epoch µs).
    """
    w_all = Window.partitionBy(key).orderBy(*order)
    w_flag = Window.partitionBy(key, "_flag").orderBy(*order)
    runs = (
        df.withColumn("_flag", flag)
        .withColumn("_rn", F.row_number().over(w_all))
        .withColumn("_rnf", F.row_number().over(w_flag))
        .filter(F.col("_flag"))
        .withColumn("_grp", F.col("_rn") - F.col("_rnf"))
    )
    return (
        runs.groupBy(key, "_grp")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min(F.unix_micros("ts")).alias("run_start_us"),
            F.max(F.unix_micros("ts")).alias("run_end_us"),
        )
        .filter(F.col("run_len") >= min_len)
        .drop("_grp")
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
    order_tiebreak: list[str] | None = None,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    previous row on the same key exceeds ``gap_seconds``.

    Batch twin of ``F.session_window`` (O-19) with identical assignment
    semantics, kept SQL-expressible so the oracle can replicate it.

    Returns: key, session_id, n_events, session_start_us, session_end_us.
    """
    order = [ts_col] + (order_tiebreak or [])
    w = Window.partitionBy(key).orderBy(*order)
    gap_us = gap_seconds * 1_000_000
    with_flags = (
        df.withColumn("_us", F.unix_micros(ts_col))
        .withColumn("_prev", F.lag("_us").over(w))
        .withColumn(
            "_new_sess",
            (F.col("_prev").isNull() | ((F.col("_us") - F.col("_prev")) > gap_us)).cast(
                "int"
            ),
        )
        .withColumn(
            "session_id",
            F.sum("_new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return with_flags.groupBy(key, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("_us").alias("session_start_us"),
        F.max("_us").alias("session_end_us"),
    )
