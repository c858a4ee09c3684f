"""Kaplan-Meier survival estimation (Kaplan & Meier, JASA 1958) — the
product-limit estimator of S(t) = P(lifetime > t) under right
censoring, the foundation of churn/tenure/retention analysis. A new
analysis family next to the forecast (Holt/HW), changepoint (CUSUM),
and two-sample (KS/MWU/Welch/permutation) shelves: retention curves
read survival at fixed grid points; KM is the estimator that makes
them valid when observation ends before every subject's story does.

Determinism discipline (the EWMA precedent, not the CUSUM one): the
survival recursion S_t = S_{t-1} · (1 − d_t/n_t) is inherently
fractional, so it rides UNROUNDED float64 through a fixed
left-to-right IEEE sequence — divide, subtract from 1, multiply — that
the recursive-CTE oracle replays verbatim; r4 only at emission. The
at-risk/death counts next to it are exact integers, so a drift would
be visible in the hashed integer columns before it could hide in the
float.

Scale contract (stated): the fold runs on the per-(group, time) LEDGER
(distinct event times per group — thousands of rows), never raw
subjects; the corpus-sized work is exactly the per-subject aggregate
and one groupBy to the ledger. The at-risk counts come from a
group-partitioned window (never unpartitioned); the fold itself is the
holt_linear shard shape — one exchange on the shard key, O(ledger)
per group inside Arrow.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.numeric import r4

_KM_SCHEMA = (
    "grp string, t bigint, n_risk bigint, n_events bigint, "
    "n_censored bigint, survival double"
)


def km_fold(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pure per-shard product-limit replay (module-level so tests can
    drive it): expects ledger columns (grp, t, d, c, n_risk) — one row
    per distinct time per group, d deaths / c censorings at t, n_risk
    subjects with lifetime >= t. Emits DEATH times only (S changes
    nowhere else — the censoring-only times are carried into n_risk,
    which is the whole point of KM)."""
    pdf = pdf.sort_values(["grp", "t"])
    out: dict[str, list] = {
        "grp": [], "t": [], "n_risk": [], "n_events": [],
        "n_censored": [], "survival": [],
    }
    for gid, g in pdf.groupby("grp", sort=False):
        s = 1.0
        for r in g.itertuples():
            d, n = int(r.d), int(r.n_risk)
            if d == 0:
                continue
            s = s * (1.0 - d / n)
            out["grp"].append(gid)
            out["t"].append(int(r.t))
            out["n_risk"].append(n)
            out["n_events"].append(d)
            out["n_censored"].append(int(r.c))
            out["survival"].append(s)
    return pd.DataFrame(out)


def km_survival(
    subjects: DataFrame,
    grp: str = "grp",
    duration: str = "duration",
    event: str = "event",
    n_shards: int | None = None,
) -> DataFrame:
    """Kaplan-Meier curve per group from subject rows ``(grp, duration
    >= 0 integer, event 1=observed / 0=right-censored)``. Returns one
    row per (group, death time): ``(grp, t, n_risk, n_events,
    n_censored, survival)`` with survival r4-rounded at emission.

    Convention (stated): subjects censored AT t are still at risk at t
    (the standard tie rule — deaths at t precede censorings at t)."""
    ledger = (
        subjects.select(
            F.col(grp).cast("string").alias("grp"),
            F.col(duration).cast("long").alias("t"),
            F.col(event).cast("long").alias("_e"),
        )
        .select(
            "grp",
            "t",
            F.when((F.col("_e") < 0) | (F.col("_e") > 1), F.expr(
                "raise_error('km_survival: event must be 0 or 1')"
            ).cast("long")).otherwise(F.col("_e")).alias("_e"),
        )
        .groupBy("grp", "t")
        .agg(
            F.sum("_e").alias("d"),
            F.sum(F.lit(1) - F.col("_e")).alias("c"),
        )
    )
    w_risk = (
        Window.partitionBy("grp")
        .orderBy(F.col("t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ledger = ledger.withColumn("n_risk", F.sum(F.col("d") + F.col("c")).over(w_risk))
    if n_shards is None:
        n_shards = 2 * subjects.sparkSession.sparkContext.defaultParallelism
    folded = (
        ledger.select(
            "*",
            (F.crc32(F.col("grp")) % n_shards).alias("_shard"),
        )
        .groupBy("_shard")
        .applyInPandas(km_fold, _KM_SCHEMA)
    )
    return folded.select(
        "grp", "t", "n_risk", "n_events", "n_censored", r4(F.col("survival")).alias("survival")
    )


# Recursive-CTE oracle template over a `subjects(grp, dur, ev)` CTE the
# caller provides; replays the IDENTICAL ledger, at-risk window, and
# left-to-right IEEE product.
KM_ORACLE_WALK = """
ledger AS (
  SELECT grp, dur AS t, SUM(ev) AS d, SUM(1 - ev) AS c
  FROM subjects GROUP BY 1, 2
),
risk AS (
  SELECT grp, t, d, c,
         SUM(d + c) OVER (
           PARTITION BY grp ORDER BY t DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS n_risk
  FROM ledger
),
deaths AS (
  SELECT grp, t, d, c, n_risk,
         row_number() OVER (PARTITION BY grp ORDER BY t) AS rn
  FROM risk WHERE d > 0
),
walk AS (
  SELECT grp, t, d, c, n_risk, rn,
         1.0 * (1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)) AS s
  FROM deaths WHERE rn = 1
  UNION ALL
  SELECT x.grp, x.t, x.d, x.c, x.n_risk, x.rn,
         w.s * (1.0 - CAST(x.d AS DOUBLE) / CAST(x.n_risk AS DOUBLE)) AS s
  FROM walk w JOIN deaths x ON x.grp = w.grp AND x.rn = w.rn + 1
),
km AS (
  SELECT grp, CAST(t AS BIGINT) AS t, CAST(n_risk AS BIGINT) AS n_risk,
         CAST(d AS BIGINT) AS n_events, CAST(c AS BIGINT) AS n_censored,
         (floor(s * 10000.0 + 0.5) / 10000.0) AS survival
  FROM walk
)
"""
