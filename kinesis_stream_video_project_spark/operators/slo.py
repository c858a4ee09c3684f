"""Multiwindow SLO burn-rate alerting — the modern production form of
the reference's watchdog loop.

The reference restarts a pipeline when a point check fails three times
(`restart.sh:15-16`); production SRE practice alerts on ERROR-BUDGET
BURN RATE instead (Google SRE Workbook ch. 5, "Alerting on SLOs"): with
an SLO of ``slo_permille`` successes, the error budget is
``1000 − slo_permille``; the burn rate of a window is its error ratio
divided by the budget, and a MULTIWINDOW alert fires only when BOTH a
long window (sustained problem, low false-positive) and a short window
(still happening right now, fast reset) burn faster than a factor
``burn_x``. Two windows is the workbook's core recipe; the classic
deployment runs two such rules (page: 14.4× over 1 h/5 m; ticket: 6×
over 6 h/30 m) — callers instantiate each rule with parameters.

All-integer evaluation: window error ratio ≥ burn_x × budget is
evaluated cross-multiplied as ``errors · 1000 · 1000 > burn_x_permille
· budget · total`` — no division anywhere, hash-identical in any
engine.

Scale: events aggregate once to a per-MINUTE (errors, total) ledger
(the one corpus shuffle, map-side combined); both burn windows are
RANGE frames over that minute ledger — |minutes| rows, the audit-tier
ledger discipline — so the operator's cost after the first aggregate is
independent of event volume. Per-key variants partition the same
ledger by the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def burn_rate_alerts(
    events: DataFrame,
    slo_permille: int = 950,
    burn_x_permille: int = 2000,
    long_minutes: int = 60,
    short_minutes: int = 5,
    error_type: str = "error",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Minutes where BOTH burn windows exceed ``burn_x_permille``/1000
    times the error budget: ``(minute_ts, long_errors, long_total,
    short_errors, short_total, long_burn_permille,
    short_burn_permille)`` — one row per ALERTING minute (the firing
    series; consumers edge-detect pages from it).

    Burn permilles are emitted for observability as truncating integer
    ``(errors · 1000 · 1000) div (budget · total)`` — the ALERT
    decision itself uses the exact cross-multiplied comparison, so a
    truncated display value never flips a decision. Windows are
    trailing and inclusive (the minute's own events count — the
    workbook's convention), measured in MINUTES of event time on a
    per-minute ledger. Degenerate parameters (SLO ≥ 1000‰ — no budget;
    short ≥ long) are refused loudly."""
    if not 0 < slo_permille < 1000:
        raise ValueError(
            f"burn_rate_alerts: slo_permille must be in (0, 1000), got "
            f"{slo_permille} (1000 leaves no error budget to burn)"
        )
    if not 0 < short_minutes < long_minutes:
        raise ValueError(
            f"burn_rate_alerts: need 0 < short_minutes < long_minutes, "
            f"got {short_minutes}/{long_minutes}"
        )
    budget = 1000 - slo_permille
    ledger = (
        events.select(
            F.unix_micros(F.col(ts_col)).alias("_us"),
            (F.col(type_col) == error_type).cast("long").alias("_err"),
        )
        # integer DIV, never double division, for the bucket key (the
        # heaps_law_curve rule: doubles lose exactness at huge epochs)
        .select(F.expr("_us DIV 60000000").alias("_m"), "_err")
        .groupBy("_m")
        .agg(
            F.sum("_err").cast("long").alias("_errors"),
            F.count(F.lit(1)).cast("long").alias("_total"),
        )
    )
    # the minute ledger is value-cardinality (one row per active
    # minute) — but the burn windows are still computed PARTITIONED by
    # a coarse epoch-day so no unpartitioned window exists; a window
    # crossing day boundaries is stitched by copying each prior day's
    # tail minutes into every later day partition whose long window can
    # still reach them (ceil((long_minutes-1)/1440) days forward — the
    # SRE-workbook ticket rule's 4320-minute window needs 3), keeping
    # each minute's own row exactly once
    day = F.expr("_m DIV 1440").alias("_day")
    base = ledger.select("*", day)
    reach_days = -(-(long_minutes - 1) // 1440)  # ceil, 0 when long==1
    stitched = base
    for k in range(1, reach_days + 1):
        tail_k = base.filter(
            F.col("_m") % 1440 >= 1440 * k - (long_minutes - 1)
        ).select(
            "_m", "_errors", "_total", (F.col("_day") + k).alias("_day")
        )
        stitched = stitched.unionByName(tail_k)
    w_long_d = Window.partitionBy("_day").orderBy("_m").rangeBetween(
        -(long_minutes - 1), 0
    )
    w_short_d = Window.partitionBy("_day").orderBy("_m").rangeBetween(
        -(short_minutes - 1), 0
    )
    scored = (
        stitched.select(
            "_m",
            "_day",
            F.sum("_errors").over(w_long_d).alias("_le"),
            F.sum("_total").over(w_long_d).alias("_lt"),
            F.sum("_errors").over(w_short_d).alias("_se"),
            F.sum("_total").over(w_short_d).alias("_st"),
        )
        # keep each minute's row from ITS OWN day partition (the
        # stitched copy exists only to warm the next day's window head)
        .filter(F.col("_day") == F.expr("_m DIV 1440"))
    )
    alerting = scored.filter(
        (F.col("_le") * 1000 * 1000 > burn_x_permille * budget * F.col("_lt"))
        & (
            F.col("_se") * 1000 * 1000
            > burn_x_permille * budget * F.col("_st")
        )
    )
    return alerting.select(
        (F.col("_m") * 60_000_000).alias("minute_us"),
        F.col("_le").cast("long").alias("long_errors"),
        F.col("_lt").cast("long").alias("long_total"),
        F.col("_se").cast("long").alias("short_errors"),
        F.col("_st").cast("long").alias("short_total"),
        F.expr(f"CAST((_le * 1000 * 1000) DIV ({budget} * _lt) AS BIGINT)")
        .alias("long_burn_permille"),
        F.expr(f"CAST((_se * 1000 * 1000) DIV ({budget} * _st) AS BIGINT)")
        .alias("short_burn_permille"),
    )
