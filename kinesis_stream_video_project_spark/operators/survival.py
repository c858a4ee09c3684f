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


_LR_SCHEMA = (
    "grp string, n_deaths bigint, sum_oe double, sum_v double, chi2 double"
)


def logrank_fold(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pure per-shard log-rank accumulation (module-level so tests can
    drive it): expects per-(focal group, death time) rows (grp, t, d1,
    n1, d, n) in any order; folds in t order per group. Each term is
    ONE float division of exact integer products — oe_t = d1 − (d·n1)/n,
    v_t = d·n1·(n−n1)·(n−d) / (n²·(n−1)) (0 when n ≤ 1) — summed
    SEQUENTIALLY in t order (the KM fixed-order discipline; a SQL SUM
    would add in engine-chosen order and drift)."""
    pdf = pdf.sort_values(["grp", "t"])
    out: dict[str, list] = {
        "grp": [], "n_deaths": [], "sum_oe": [], "sum_v": [], "chi2": [],
    }
    for gid, g in pdf.groupby("grp", sort=False):
        s_oe, s_v, nd = 0.0, 0.0, 0
        for r in g.itertuples():
            d1, n1, d, n = int(r.d1), int(r.n1), int(r.d), int(r.n)
            nd += d1
            s_oe = s_oe + (d1 - (d * n1) / n)
            if n > 1:
                s_v = s_v + (d * n1 * (n - n1) * (n - d)) / (n * n * (n - 1))
        out["grp"].append(gid)
        out["n_deaths"].append(nd)
        out["sum_oe"].append(s_oe)
        out["sum_v"].append(s_v)
        out["chi2"].append((s_oe * s_oe) / s_v if s_v > 0 else None)
    return pd.DataFrame(out)


def logrank_vs_rest(
    subjects: DataFrame,
    grp: str = "grp",
    duration: str = "duration",
    event: str = "event",
    n_shards: int | None = None,
) -> DataFrame:
    """Log-rank test (Mantel 1966) of each group's survival against the
    REST of the cohort — the hypothesis-test companion of
    :func:`km_survival` (curves without a test invite eyeballing).
    Returns one row per group: ``(grp, n_deaths, sum_oe, sum_v, chi2)``
    with chi2 ~ χ²(1) under H₀, r4 at emission.

    Build: one subject aggregate to the total time ledger, a
    group × death-time grid (|groups| · |death times| rows —
    ledger-sized), at-risk counts from group-partitioned descending
    windows, then the fixed-order Arrow fold."""
    subj = subjects.select(
        F.col(grp).cast("string").alias("_g"),
        F.col(duration).cast("long").alias("_t"),
        F.col(event).cast("long").alias("_e"),
    ).select(
        "_g",
        "_t",
        # Same in-plan refusal as km_survival (ADVICE r11): an event
        # value of 2 or −1 would silently inflate d1/d into a
        # meaningless chi2 instead of erroring.
        F.when((F.col("_e") < 0) | (F.col("_e") > 1), F.expr(
            "raise_error('logrank_vs_rest: event must be 0 or 1')"
        ).cast("long")).otherwise(F.col("_e")).alias("_e"),
    )
    tot = subj.groupBy("_t").agg(
        F.sum("_e").alias("_d"), F.count(F.lit(1)).alias("_a")
    )
    w_tot = (
        Window.orderBy(F.col("_t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The total at-risk window is unpartitioned BY NATURE (one cohort
    # ledger, |death times| rows — ledger-sized, never the corpus); the
    # per-group windows below are grp-partitioned.
    tot = tot.withColumn("_n", F.sum("_a").over(w_tot)).filter(F.col("_d") > 0)
    per_g = subj.groupBy("_g", "_t").agg(
        F.sum("_e").alias("_d1g"), F.count(F.lit(1)).alias("_a1")
    )
    groups = subj.select("_g").distinct()
    grid = groups.crossJoin(
        tot.select("_t").unionByName(per_g.select("_t")).distinct()
    )
    g_led = grid.join(per_g, ["_g", "_t"], "left").select(
        "_g",
        "_t",
        F.coalesce(F.col("_d1g"), F.lit(0)).alias("_d1"),
        F.coalesce(F.col("_a1"), F.lit(0)).alias("_a1"),
    )
    w_g = (
        Window.partitionBy("_g")
        .orderBy(F.col("_t").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g_led = g_led.withColumn("_n1", F.sum("_a1").over(w_g))
    rows = g_led.join(
        tot.select("_t", "_d", "_n"), "_t"
    ).select(
        F.col("_g").alias("grp"),
        F.col("_t").alias("t"),
        F.col("_d1").alias("d1"),
        F.col("_n1").alias("n1"),
        F.col("_d").alias("d"),
        F.col("_n").alias("n"),
    )
    if n_shards is None:
        n_shards = 2 * subjects.sparkSession.sparkContext.defaultParallelism
    folded = (
        rows.select(
            "*", (F.crc32(F.col("grp")) % n_shards).alias("_shard")
        )
        .groupBy("_shard")
        .applyInPandas(logrank_fold, _LR_SCHEMA)
    )
    return folded.select(
        "grp",
        "n_deaths",
        r4(F.col("sum_oe")).alias("sum_oe"),
        r4(F.col("sum_v")).alias("sum_v"),
        r4(F.col("chi2")).alias("chi2"),
    )


# Recursive-CTE oracle template over a `subjects(grp, dur, ev)` CTE:
# replays the grid build and the fixed-order per-group accumulation.
LOGRANK_ORACLE_WALK = """
tot AS (
  SELECT t, d, n FROM (
    SELECT dur AS t, SUM(ev) AS d,
           SUM(COUNT(*)) OVER (ORDER BY dur DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
    FROM subjects GROUP BY dur
  ) WHERE d > 0
),
per_g AS (
  SELECT grp AS g, dur AS t, SUM(ev) AS d1g, COUNT(*) AS a1
  FROM subjects GROUP BY 1, 2
),
grid AS (
  SELECT g.g, t.t
  FROM (SELECT DISTINCT grp AS g FROM subjects) g
  CROSS JOIN (SELECT t FROM tot UNION SELECT t FROM per_g) t
),
g_led AS (
  SELECT grid.g, grid.t,
         COALESCE(p.d1g, 0) AS d1,
         SUM(COALESCE(p.a1, 0)) OVER (
           PARTITION BY grid.g ORDER BY grid.t DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n1
  FROM grid LEFT JOIN per_g p ON p.g = grid.g AND p.t = grid.t
),
lr_rows AS (
  SELECT g_led.g, g_led.t, g_led.d1, g_led.n1, tot.d, tot.n,
         row_number() OVER (PARTITION BY g_led.g ORDER BY g_led.t) AS rn
  FROM g_led JOIN tot ON tot.t = g_led.t
),
lr_walk AS (
  SELECT g, t, rn, CAST(d1 AS BIGINT) AS nd,
         (CAST(d1 AS DOUBLE) - CAST(d * n1 AS DOUBLE) / CAST(n AS DOUBLE))
           AS s_oe,
         (CASE WHEN n > 1 THEN
            CAST(d * n1 * (n - n1) * (n - d) AS DOUBLE)
            / CAST(n * n * (n - 1) AS DOUBLE)
          ELSE 0.0 END) AS s_v
  FROM lr_rows WHERE rn = 1
  UNION ALL
  SELECT x.g, x.t, x.rn, w.nd + x.d1,
         w.s_oe + (CAST(x.d1 AS DOUBLE)
                   - CAST(x.d * x.n1 AS DOUBLE) / CAST(x.n AS DOUBLE)),
         w.s_v + (CASE WHEN x.n > 1 THEN
                    CAST(x.d * x.n1 * (x.n - x.n1) * (x.n - x.d) AS DOUBLE)
                    / CAST(x.n * x.n * (x.n - 1) AS DOUBLE)
                  ELSE 0.0 END)
  FROM lr_walk w JOIN lr_rows x ON x.g = w.g AND x.rn = w.rn + 1
),
lr AS (
  SELECT g AS grp, CAST(nd AS BIGINT) AS n_deaths,
         (floor(s_oe * 10000.0 + 0.5) / 10000.0) AS sum_oe,
         (floor(s_v * 10000.0 + 0.5) / 10000.0) AS sum_v,
         CASE WHEN s_v > 0 THEN
           (floor(((s_oe * s_oe) / s_v) * 10000.0 + 0.5) / 10000.0)
         END AS chi2
  FROM lr_walk w
  WHERE rn = (SELECT MAX(rn) FROM lr_rows r WHERE r.g = w.g)
)
"""


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
