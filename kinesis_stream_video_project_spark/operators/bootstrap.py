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
