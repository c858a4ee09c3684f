"""As-of (point-in-time) join — an operator Spark lacks as a primitive.

The reference correlates a probe instant with the most recent metric window
``[now-60s, now]`` (putmedia_check.sh:18-22); generalized, that is an as-of
join: for each left row, the latest right row with ``right.ts <= left.ts``
on the same key.

Implementation: union-and-carry-forward, NOT a range self-join.

* Tag right rows, union with left rows, window over (key) ordered by
  (ts, side) and carry the last right payload forward with
  ``last(..., ignorenulls=True)``.
* Cost: ONE shuffle on the key and a sort — same asymptotics as a sort-merge
  join, with no candidate-pair blowup. A naive ``l.ts >= r.ts`` theta join is
  O(|L|·|R|) per key and collapses at 100 TB; this form scales linearly and
  spills gracefully.

Tie rule: right rows sort before left rows at equal ts (side 0 < 1), so an
exactly-simultaneous right row is visible — matching ASOF JOIN (>=) semantics
in DuckDB, which the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    right_payload: list[str] | None = None,
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach the matching right row in ``direction``:

    * ``backward`` (default) — latest right row with ``right.ts <= left.ts``
      (pandas ``merge_asof`` default; DuckDB ``ASOF ... ON l.ts >= r.ts``);
    * ``forward`` — earliest right row with ``right.ts >= left.ts``
      (DuckDB ``ASOF ... ON l.ts <= r.ts``): the same one-shuffle
      union-and-carry plan walked in descending ts order;
    * ``nearest`` — whichever of the two is closer in event time, ties to
      the backward match (pandas ``merge_asof(direction="nearest")``):
      both walks run over the SAME key exchange (two Window sorts, one
      shuffle), then a per-row pick.

    ``right_payload`` columns come back prefixed ``asof_``; left rows with no
    matching right row keep nulls (left-outer as-of).

    ``tolerance_us`` (pandas ``merge_asof(tolerance=...)``): a match is
    kept only when the right row is within that many microseconds of the
    left row's ts (staleness bound — a metric reading from hours ago
    should not vouch for a probe now). Implemented by riding the matched
    right ts inside the carried struct and nulling the payload columns
    past the bound — same one-shuffle plan, no extra join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if tolerance_us is not None and tolerance_us < 0:
        raise ValueError(f"tolerance_us must be >= 0, got {tolerance_us}")
    right_payload = right_payload or [
        c for c in right.columns if c not in (key, ts_col)
    ]
    lcols = left.columns

    # The whole right payload travels as ONE struct so the carry-forward is
    # all-or-nothing per right row: carrying each column independently with
    # last(..., ignorenulls=True) would fill a NULL payload column from an
    # OLDER right row, stitching two right rows into one match.
    right_struct = F.struct(
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_asof_ts_us"),
        *[F.col(c).alias(c) for c in right_payload],
    )
    struct_type = right.select(right_struct.alias("s")).schema["s"].dataType

    r = right.select(
        F.col(key),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        right_struct.alias("_asof_payload"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c not in (key, ts_col)],
    )
    l = left.select(
        F.col(key),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(struct_type).alias("_asof_payload"),
        *[F.col(c) for c in lcols if c not in (key, ts_col)],
    )
    # Both directions keep _side ASC at equal ts so an exactly-simultaneous
    # right row is visible to the left row (>= / <= semantics, matching
    # DuckDB's ASOF). Forward simply walks ts descending, so "last right
    # seen" is the earliest right row at-or-after the left row. `nearest`
    # evaluates BOTH walks over the SAME key exchange (two Window sorts,
    # one shuffle) and picks the closer match per row.
    def carry_window(descending: bool):
        ts_order = F.col(ts_col).desc() if descending else F.col(ts_col).asc()
        order = [ts_order, F.col("_side").asc()]
        if tiebreak:
            order.append(F.col(tiebreak).asc_nulls_first())
        w = (
            Window.partitionBy(key)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        return F.last("_asof_payload", ignorenulls=True).over(w)

    unioned = r.unionByName(l)
    l_ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    if direction in ("backward", "forward"):
        carried = unioned.select(
            "*", carry_window(direction == "forward").alias("_carry")
        )
        age = (
            l_ts_us - F.col("_carry._asof_ts_us")
            if direction == "backward"
            else F.col("_carry._asof_ts_us") - l_ts_us
        )
        chosen = {c: F.col(f"_carry.{c}") for c in right_payload}
    else:  # nearest: closer of the two matches; ties go backward (pandas)
        carried = unioned.select(
            "*",
            carry_window(False).alias("_cb"),
            carry_window(True).alias("_cf"),
        )
        back_ts = F.col("_cb._asof_ts_us")
        fwd_ts = F.col("_cf._asof_ts_us")
        back_age = l_ts_us - back_ts
        fwd_age = fwd_ts - l_ts_us
        use_back = fwd_ts.isNull() | (
            back_ts.isNotNull() & (back_age <= fwd_age)
        )
        age = F.when(use_back, back_age).otherwise(fwd_age)
        chosen = {
            c: F.when(use_back, F.col(f"_cb.{c}")).otherwise(F.col(f"_cf.{c}"))
            for c in right_payload
        }
    if tolerance_us is None:
        payload_cols = [chosen[c].alias(f"asof_{c}") for c in right_payload]
    else:
        within = age <= F.lit(tolerance_us)
        payload_cols = [
            F.when(within, chosen[c]).alias(f"asof_{c}")
            for c in right_payload
        ]
    return carried.filter(F.col("_side") == 1).select(
        F.col(key),
        F.col(ts_col),
        *[F.col(c) for c in lcols if c not in (key, ts_col)],
        *payload_cols,
    )
