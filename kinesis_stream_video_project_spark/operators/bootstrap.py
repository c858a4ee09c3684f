"""Deterministic bootstrap confidence intervals (Efron 1979; the
percentile method of Efron/Tibshirani ch. 13) — distribution-free
uncertainty for any per-group mean, with the repo's twist: the
resampling is a PURE FUNCTION of (group, replicate, draw) via the
portable 48-bit md5 rank, so the interval is reproducible across
engines, runs, and corpus rebuilds — a bootstrap that hash-checks,
where textbook RNG resampling never can.

Determinism ladder (all integer until the final emission):

* draw index of replicate b, slot i = ``md5_48(g:b:i) mod n`` — the
  portable-hash rule, identical in Spark and DuckDB;
* each replicate's statistic rides as the EXACT BIGINT sum of its n
  drawn values (n is constant per group, so ordering replicate sums
  orders replicate means — no division until emission);
* percentile selection is rank arithmetic on the sorted integer sums:
  lower = floor(α·B)+1-th smallest, upper = ceil((1−α)·B)-th smallest
  (α = 5%, B = 200 ⇒ ranks 11 and 190 — STATED, not implied);
* emission divides once and r4-rounds: mean, ci_lo, ci_hi.

Scale contract (stated): bootstrap inputs are LEDGER-sized per-group
rollups (weekly aggregates, hundreds of rows), never raw corpora — the
replicate expansion is B×n rows per group, broadcast-joined back to the
series by draw rank; the only shuffles are the (g, b)-keyed replicate
sums and a g-partitioned rank window over B rows per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.numeric import r4


def permutation_test_means(
    series: DataFrame,
    group_a: str,
    group_b: str,
    grp: str = "grp",
    id_col: str = "x",
    y: str = "y",
    n_perm: int = 200,
) -> DataFrame:
    """Deterministic two-sample permutation test of mean difference
    (Fisher 1935; the exact-test sibling of :func:`bootstrap_mean_ci`,
    same md5 determinism ladder): is the observed |mean_A − mean_B|
    explainable by label exchange alone?

    Every permutation keeps (n_A, n_B) fixed, so |mean_A − mean_B|
    orders identically to the INTEGER statistic D = |sum_A·n_B −
    sum_B·n_A| — no division until emission, the bootstrap's
    exact-BIGINT-sum trick applied to a test statistic. Permutation b
    re-labels by ranking rows on md5('perm:b:g:id') and assigning the
    first n_A ranks to A — a pure function of (b, row identity), so the
    p-value hash-checks across engines. p = (#{D_b >= D_obs} + 1) /
    (n_perm + 1), the add-one rule that keeps p > 0 (the identity
    permutation is always as extreme as itself).

    Scale contract (stated): ledger-sized inputs only (the bootstrap
    rule); the expansion is n_perm × n rows, one window partitioned on
    the replicate id, one (replicate)-keyed sum. Returns ONE row:
    ``(n_a, n_b, mean_a, mean_b, d_obs, n_ge, n_perm, p_value)``."""
    if group_a == group_b:
        raise ValueError("permutation test needs two distinct groups")
    if n_perm < 2:
        raise ValueError(f"n_perm must be >= 2, got {n_perm}")
    pooled = series.filter(F.col(grp).isin([group_a, group_b])).select(
        F.col(grp).cast("string").alias("_g"),
        F.col(id_col).cast("string").alias("_id"),
        F.col(y).cast("long").alias("_y"),
    )
    sizes = pooled.agg(
        F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0))
        .cast("long")
        .alias("_na"),
        F.sum(F.when(F.col("_g") == group_b, 1).otherwise(0))
        .cast("long")
        .alias("_nb"),
        F.coalesce(
            F.sum(F.when(F.col("_g") == group_a, F.col("_y"))), F.lit(0)
        ).alias("_suma"),
        F.coalesce(F.sum("_y"), F.lit(0)).alias("_tot"),
    ).select(
        "*",
        F.abs(
            F.col("_suma") * F.col("_nb")
            - (F.col("_tot") - F.col("_suma")) * F.col("_na")
        ).alias("_dobs"),
    )
    ranked = (
        pooled.select(
            "_g",
            "_id",
            "_y",
            F.explode(F.sequence(F.lit(1), F.lit(n_perm))).alias("_b"),
        )
        .withColumn(
            "_h",
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit("perm"),
                    F.col("_b").cast("string"),
                    "_g",
                    "_id",
                )
            ),
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("_b").orderBy("_h", "_g", "_id")
            ),
        )
    )
    rep = (
        ranked.crossJoin(F.broadcast(sizes.select("_na")))
        .filter(F.col("_rn") <= F.col("_na"))
        .groupBy("_b")
        .agg(F.sum("_y").alias("_sa"))
    )
    return (
        rep.crossJoin(F.broadcast(sizes))
        .select(
            F.abs(
                F.col("_sa") * F.col("_nb")
                - (F.col("_tot") - F.col("_sa")) * F.col("_na")
            ).alias("_d"),
            "_na",
            "_nb",
            "_suma",
            "_tot",
            "_dobs",
        )
        .groupBy("_na", "_nb", "_suma", "_tot", "_dobs")
        .agg(F.count(F.when(F.col("_d") >= F.col("_dobs"), 1)).alias("_nge"))
        .select(
            F.col("_na").alias("n_a"),
            F.col("_nb").alias("n_b"),
            r4(F.col("_suma").cast("double") / F.col("_na")).alias("mean_a"),
            r4(
                (F.col("_tot") - F.col("_suma")).cast("double") / F.col("_nb")
            ).alias("mean_b"),
            F.col("_dobs").cast("long").alias("d_obs"),
            F.col("_nge").cast("long").alias("n_ge"),
            F.lit(n_perm).cast("long").alias("n_perm"),
            r4(
                (F.col("_nge") + 1).cast("double") / F.lit(float(n_perm + 1))
            ).alias("p_value"),
        )
    )


def permutation_oracle_sql(
    series_cte: str, group_a: str, group_b: str, n_perm: int = 200
) -> str:
    """DuckDB replay of :func:`permutation_test_means` — ``series_cte``
    must produce (grp, x, y); same md5 rank rule, same integer D."""
    return f"""
WITH series AS ({series_cte}),
pooled AS (
  SELECT CAST(grp AS VARCHAR) AS g, CAST(x AS VARCHAR) AS id,
         CAST(y AS BIGINT) AS y
  FROM series WHERE grp IN ('{group_a}', '{group_b}')
),
sizes AS (
  SELECT CAST(SUM(CASE WHEN g = '{group_a}' THEN 1 ELSE 0 END) AS BIGINT)
           AS na,
         CAST(SUM(CASE WHEN g = '{group_b}' THEN 1 ELSE 0 END) AS BIGINT)
           AS nb,
         CAST(COALESCE(SUM(CASE WHEN g = '{group_a}' THEN y END), 0)
              AS BIGINT) AS suma,
         CAST(COALESCE(SUM(y), 0) AS BIGINT) AS tot
  FROM pooled
),
dobs AS (
  SELECT *, ABS(suma * nb - (tot - suma) * na) AS d_obs FROM sizes
),
ranked AS (
  SELECT p.g, p.id, p.y, b.b,
         row_number() OVER (
           PARTITION BY b.b
           ORDER BY md5('perm:' || CAST(b.b AS VARCHAR) || ':' || p.g
                        || ':' || p.id), p.g, p.id
         ) AS rn
  FROM pooled p CROSS JOIN generate_series(1, {n_perm}) AS b(b)
),
rep AS (
  SELECT r.b, CAST(SUM(r.y) AS BIGINT) AS sa
  FROM ranked r, sizes s
  WHERE r.rn <= s.na
  GROUP BY 1
),
cnt AS (
  SELECT CAST(COUNT(CASE WHEN ABS(rep.sa * d.nb - (d.tot - rep.sa) * d.na)
                              >= d.d_obs THEN 1 END) AS BIGINT) AS n_ge
  FROM rep, dobs d
)
SELECT d.na AS n_a, d.nb AS n_b,
       (floor((CAST(d.suma AS DOUBLE) / d.na) * 10000.0 + 0.5) / 10000.0)
         AS mean_a,
       (floor((CAST(d.tot - d.suma AS DOUBLE) / d.nb) * 10000.0 + 0.5)
        / 10000.0) AS mean_b,
       CAST(d.d_obs AS BIGINT) AS d_obs,
       c.n_ge,
       CAST({n_perm} AS BIGINT) AS n_perm,
       (floor((CAST(c.n_ge + 1 AS DOUBLE) / {n_perm + 1}.0) * 10000.0 + 0.5)
        / 10000.0) AS p_value
FROM dobs d, cnt c
"""


def bootstrap_mean_ci(
    series: DataFrame,
    grp: str = "grp",
    y: str = "y",
    n_boot: int = 200,
    alpha_pct: int = 5,
) -> DataFrame:
    """Percentile-bootstrap CI of the per-group mean of ``y`` (BIGINT).

    Returns one row per group: ``(grp, n, n_boot, mean_y, ci_lo,
    ci_hi)`` — r4-rounded doubles over exact integer sums."""
    if not (0 < alpha_pct < 50):
        raise ValueError(f"alpha_pct must be in (0, 50), got {alpha_pct}")
    if n_boot < 2:
        raise ValueError(f"n_boot must be >= 2, got {n_boot}")
    w_rank = Window.partitionBy("_g").orderBy("_y", "_r")
    ranked = (
        series.select(F.col(grp).alias("_g"), F.col(y).cast("long").alias("_y"))
        .withColumn("_r", F.row_number().over(Window.partitionBy("_g").orderBy("_y")))
        .select("_g", "_y", "_r")
    )
    del w_rank
    sizes = ranked.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("_y").alias("_tot")
    )
    # B x n draw grid per group: (g, b, i) -> draw rank via portable md5.
    grid = (
        sizes.select(
            "_g",
            "_n",
            F.explode(F.sequence(F.lit(1), F.lit(n_boot))).alias("_b"),
        )
        .select(
            "_g",
            "_n",
            "_b",
            F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("_i"),
        )
        .select(
            "_g",
            "_b",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.col("_g").cast("string"),
                                F.col("_b").cast("string"),
                                F.col("_i").cast("string"),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("_n")
                + F.lit(1)
            ).alias("_draw"),
        )
    )
    rep_sums = (
        grid.join(
            F.broadcast(ranked),
            (grid["_g"] == ranked["_g"]) & (grid["_draw"] == ranked["_r"]),
        )
        .select(grid["_g"].alias("_g"), "_b", "_y")
        .groupBy("_g", "_b")
        .agg(F.sum("_y").alias("_bsum"))
    )
    w_b = Window.partitionBy("_g").orderBy("_bsum", "_b")
    lo_rank = (alpha_pct * n_boot) // 100 + 1
    hi_rank = -((-(100 - alpha_pct) * n_boot) // 100)
    picked = (
        rep_sums.withColumn("_brn", F.row_number().over(w_b))
        .filter(F.col("_brn").isin(lo_rank, hi_rank))
        .groupBy("_g")
        .agg(
            F.min_by("_bsum", "_brn").alias("_losum"),
            F.max_by("_bsum", "_brn").alias("_hisum"),
        )
    )
    return (
        sizes.join(picked, "_g")
        .select(
            F.col("_g").alias(grp),
            F.col("_n").cast("long").alias("n"),
            F.lit(n_boot).cast("long").alias("n_boot"),
            r4(F.col("_tot").cast("double") / F.col("_n")).alias("mean_y"),
            r4(F.col("_losum").cast("double") / F.col("_n")).alias("ci_lo"),
            r4(F.col("_hisum").cast("double") / F.col("_n")).alias("ci_hi"),
        )
    )
