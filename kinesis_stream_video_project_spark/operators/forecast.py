"""Holt linear (double-exponential) smoothing — the trend-aware
forecasting tier above the EWMA level smoother (Holt 1957, reprinted
IJF 2004; Hyndman & Athanasopoulos FPP §8.2): per key, maintain a level
and a trend and emit the one-step-ahead forecast. The watchdog family
reads it as "where is this stream's health HEADING", where EWMA only
says where it is.

Determinism discipline (the CUSUM precedent, one step past EWMA): with
α = β = 1/2 the recursion is ALL-INTEGER on scaled values —

    l_t = tdiv(x_t + l_{t-1} + b_{t-1}, 2)
    b_t = tdiv(l_t - l_{t-1} + b_{t-1}, 2)

initialized l_1 = x_1, b_1 = x_2 − x_1 (the classic two-point init;
keys with fewer than 2 points emit nothing — stated). ``tdiv``
truncates toward zero exactly like DuckDB's ``//`` on BIGINT, so the
sharded Arrow fold and the recursive-CTE oracle agree bit-for-bit with
no IEEE reasoning at all. Outputs per (key, step): the smoothed level,
the trend, and forecast_next = l_t + b_t.

Scale: one exchange on the shard key, one pandas invocation per shard,
O(rows) integer fold inside — the EWMA/CUSUM shape. A streaming form
would carry (l, b) per key in applyInPandasWithState (two BIGINTs —
bounded state by construction).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.numeric import tdiv

_HOLT_SCHEMA = (
    "grp string, step bigint, level_s bigint, trend_s bigint, "
    "forecast_next bigint"
)


def holt_fold(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pure per-shard Holt replay (module-level so tests can drive it):
    expects columns (grp, step, xs) — xs already integer-scaled, step
    the 1-based dense order within grp."""
    pdf = pdf.sort_values(["grp", "step"])
    out_g: list = []
    out_t: list = []
    out_l: list = []
    out_b: list = []
    out_f: list = []
    for gid, g in pdf.groupby("grp", sort=False):
        xs = [int(v) for v in g["xs"]]
        steps = [int(v) for v in g["step"]]
        if len(xs) < 2:
            continue
        lvl = xs[0]
        trd = xs[1] - xs[0]
        for i, (t, x) in enumerate(zip(steps, xs)):
            if i >= 1:
                new_l = tdiv(x + lvl + trd, 2)
                trd = tdiv(new_l - lvl + trd, 2)
                lvl = new_l
            out_g.append(gid)
            out_t.append(t)
            out_l.append(lvl)
            out_b.append(trd)
            out_f.append(lvl + trd)
    return pd.DataFrame(
        {
            "grp": out_g,
            "step": out_t,
            "level_s": out_l,
            "trend_s": out_b,
            "forecast_next": out_f,
        }
    )


def holt_linear(series: DataFrame, n_shards: int | None = None) -> DataFrame:
    """Run the Holt fold over ``series`` (columns: grp string,
    step bigint — dense 1-based per-grp order, xs bigint — the scaled
    metric). Returns (grp, step, level_s, trend_s, forecast_next)."""
    if n_shards is None:
        n_shards = 2 * series.sparkSession.sparkContext.defaultParallelism
    return (
        series.select(
            "grp",
            "step",
            "xs",
            (F.crc32(F.col("grp").cast("string")) % n_shards).alias("_shard"),
        )
        .groupBy("_shard")
        .applyInPandas(holt_fold, _HOLT_SCHEMA)
    )


# Recursive-CTE oracle template over a `series(grp, step, xs)` CTE the
# caller provides; the walk replays the IDENTICAL integer recursion.
# DuckDB's // truncates toward zero on BIGINT exactly like tdiv.
HOLT_ORACLE_WALK = """
walk AS (
  SELECT s2.grp, CAST(2 AS BIGINT) AS step,
         (s2.xs + s1.xs + (s2.xs - s1.xs)) // 2 AS level_s,
         ((s2.xs + s1.xs + (s2.xs - s1.xs)) // 2 - s1.xs
          + (s2.xs - s1.xs)) // 2 AS trend_s,
         s1.xs AS l1, s2.xs - s1.xs AS b1
  FROM series s1 JOIN series s2
    ON s1.grp = s2.grp AND s1.step = 1 AND s2.step = 2
  UNION ALL
  SELECT s.grp, s.step,
         (s.xs + w.level_s + w.trend_s) // 2,
         ((s.xs + w.level_s + w.trend_s) // 2 - w.level_s + w.trend_s) // 2,
         w.l1, w.b1
  FROM walk w JOIN series s ON s.grp = w.grp AND s.step = w.step + 1
),
holt AS (
  SELECT grp, CAST(1 AS BIGINT) AS step, l1 AS level_s, b1 AS trend_s,
         l1 + b1 AS forecast_next
  FROM walk WHERE step = 2
  UNION ALL
  SELECT grp, step, level_s, trend_s, level_s + trend_s AS forecast_next
  FROM walk
)
"""


_HW_SCHEMA = (
    "grp string, step bigint, level_s bigint, trend_s bigint, "
    "season_s bigint, forecast_next bigint"
)
_HW_PERIOD = 7


def hw_fold(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pure per-shard additive Holt-Winters replay (Winters 1960;
    Hyndman & Athanasopoulos FPP §8.3), m = 7, α = β = γ = 1/2 —
    ALL-INTEGER like the Holt fold one tier down:

        l_t = tdiv(x_t − s_{t−m} + l_{t−1} + b_{t−1}, 2)
        b_t = tdiv(l_t − l_{t−1} + b_{t−1}, 2)
        s_t = tdiv(x_t − l_t + s_{t−m}, 2)

    initialized at step m: l = tdiv(Σ x_{1..m}, m), b = 0,
    s_i = x_i − l (groups shorter than m emit nothing — stated).
    Emits from step m on: (level, trend, the step's seasonal, and
    forecast_next = l + b + s_{t+1−m}). Expects (grp, step, xs) with
    step the dense 1-based per-grp order — the period runs over the
    SERIES index, not the calendar (stated at the call sites)."""
    pdf = pdf.sort_values(["grp", "step"])
    out: dict[str, list] = {
        "grp": [], "step": [], "level_s": [], "trend_s": [],
        "season_s": [], "forecast_next": [],
    }
    m = _HW_PERIOD
    for gid, g in pdf.groupby("grp", sort=False):
        xs = [int(v) for v in g["xs"]]
        steps = [int(v) for v in g["step"]]
        if len(xs) < m:
            continue
        lvl = tdiv(sum(xs[:m]), m)
        trd = 0
        sv = [x - lvl for x in xs[:m]]
        rows = [(steps[m - 1], lvl, trd, sv[-1], lvl + trd + sv[0])]
        for i in range(m, len(xs)):
            x = xs[i]
            s_old = sv[0]
            new_l = tdiv(x - s_old + lvl + trd, 2)
            trd = tdiv(new_l - lvl + trd, 2)
            lvl = new_l
            s_new = tdiv(x - lvl + s_old, 2)
            sv = sv[1:] + [s_new]
            rows.append((steps[i], lvl, trd, s_new, lvl + trd + sv[0]))
        for t, l_, b_, s_, f_ in rows:
            out["grp"].append(gid)
            out["step"].append(t)
            out["level_s"].append(l_)
            out["trend_s"].append(b_)
            out["season_s"].append(s_)
            out["forecast_next"].append(f_)
    return pd.DataFrame(out)


def holt_winters(series: DataFrame, n_shards: int | None = None) -> DataFrame:
    """Run the additive Holt-Winters fold over ``series`` (grp string,
    step bigint dense 1-based, xs bigint scaled). Same shard shape as
    :func:`holt_linear`: one exchange on the shard key, O(rows) integer
    fold per shard; a streaming form would carry (l, b, 7 seasonals) =
    9 BIGINTs per key."""
    if n_shards is None:
        n_shards = 2 * series.sparkSession.sparkContext.defaultParallelism
    return (
        series.select(
            "grp",
            "step",
            "xs",
            (F.crc32(F.col("grp").cast("string")) % n_shards).alias("_shard"),
        )
        .groupBy("_shard")
        .applyInPandas(hw_fold, _HW_SCHEMA)
    )


# Recursive-CTE oracle template over a `series(grp, step, xs)` CTE: the
# seasonal vector rides as a 7-element LIST column that rotates each
# step (sv[1] is always s_{t+1-7} for the NEXT step). DuckDB's // is
# the tdiv twin; list slicing is 1-based inclusive.
HW_ORACLE_WALK = """
l0 AS (
  SELECT grp, CAST(SUM(xs) // 7 AS BIGINT) AS l
  FROM series WHERE step <= 7 GROUP BY grp HAVING COUNT(*) = 7
),
sv0 AS (
  SELECT s.grp, MAX(l0.l) AS l,
         list(CAST(s.xs - l0.l AS BIGINT) ORDER BY s.step) AS sv
  FROM series s JOIN l0 ON l0.grp = s.grp
  WHERE s.step <= 7 GROUP BY s.grp
),
walk AS (
  SELECT grp, CAST(7 AS BIGINT) AS step, l AS level_s,
         CAST(0 AS BIGINT) AS trend_s, sv
  FROM sv0
  UNION ALL
  SELECT s.grp, s.step,
         (s.xs - w.sv[1] + w.level_s + w.trend_s) // 2 AS level_s,
         (((s.xs - w.sv[1] + w.level_s + w.trend_s) // 2)
          - w.level_s + w.trend_s) // 2 AS trend_s,
         list_concat(
           w.sv[2:7],
           [CAST((s.xs - ((s.xs - w.sv[1] + w.level_s + w.trend_s) // 2)
                  + w.sv[1]) // 2 AS BIGINT)]
         ) AS sv
  FROM walk w JOIN series s ON s.grp = w.grp AND s.step = w.step + 1
),
hw AS (
  SELECT grp, step, level_s, trend_s, sv[7] AS season_s,
         level_s + trend_s + sv[1] AS forecast_next
  FROM walk
)
"""


def theilsen_slope(
    series: DataFrame,
    grp: str = "grp",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Theil–Sen robust slope per group (Theil 1950 / Sen JASA 1968; the
    median-of-pairwise-slopes estimator with a 29.3% breakdown point —
    the robust sibling of the OLS ``trend_slope_per_type`` tier, immune
    to the outliers that drag a least-squares line).

    Cross-engine determinism: slopes are exact RATIONALS
    (num = y_j − y_i scaled BIGINT, den = x_j − x_i > 0); the selection
    orders by (CAST(num AS DOUBLE)/den, num, den) — the double division
    of identical integers is bit-identical in any engine, and the
    (num, den) tiebreak makes equal-double groups deterministic — and
    picks the LOWER median, rank (n+1) DIV 2. Emitted slope is the
    r4-rounded double plus the exact (num, den) pair and n_pairs.

    Scale contract (stated): pairwise per group — O(n²) pairs — so
    groups must be LEDGER-sized (weekly/daily rollups, hundreds of
    points); the input is an aggregate's output, never raw rows. The
    pair join is grp-keyed (one shuffle); the median is a
    grp-partitioned window (never unpartitioned)."""
    from kinesis_stream_video_project_spark.functions.numeric import r4

    a = series.select(
        F.col(grp).alias("_g"), F.col(x).alias("_xi"), F.col(y).alias("_yi")
    )
    b = series.select(
        F.col(grp).alias("_g"), F.col(x).alias("_xj"), F.col(y).alias("_yj")
    )
    pairs = a.join(b, "_g").filter(F.col("_xi") < F.col("_xj")).select(
        "_g",
        (F.col("_yj") - F.col("_yi")).cast("long").alias("num"),
        (F.col("_xj") - F.col("_xi")).cast("long").alias("den"),
    )
    slope = F.col("num").cast("double") / F.col("den")
    from pyspark.sql import Window

    w = Window.partitionBy("_g").orderBy(
        slope.asc(), F.col("num").asc(), F.col("den").asc()
    )
    wn = Window.partitionBy("_g")
    ranked = pairs.select(
        "_g",
        "num",
        "den",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("n_pairs"),
    )
    return ranked.filter(
        F.col("_rn") == F.expr("(n_pairs + 1) DIV 2")
    ).select(
        F.col("_g").alias(grp),
        r4(slope).alias("slope"),
        "num",
        "den",
        F.col("n_pairs").cast("long").alias("n_pairs"),
    )
