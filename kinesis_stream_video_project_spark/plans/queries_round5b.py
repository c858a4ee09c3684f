"""Round-5 late additions: per-key EWMA smoothing, Pareto-skyline search,
and weighted-median aggregation.

Cross-engine strategy (same discipline as the rest of the registry): the
EWMA recursion runs on raw float64 on BOTH sides (Arrow-batched Python fold
vs DuckDB recursive CTE) with identical IEEE ops `0.5*y + 0.5*x` in
identical per-key order, rounded to 4 dp only at emission; the skyline and
weighted-median queries stay in integer comparisons and raw-data doubles
(no float arithmetic at all), so they hash bit-for-bit by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.plans.registry import register

_EWMA_SCHEMA = "user_id bigint, event_id bigint, ewma double"


@register(
    "ewma_metric",
    tags=("NS-timeseries", "O-32"),
    oracle="""
WITH RECURSIVE seq AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
  WHERE value IS NOT NULL
),
walk AS (
  SELECT user_id, event_id, rn, value AS y FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.rn, 0.5 * w.y + 0.5 * s.value
  FROM walk w
  JOIN seq s ON s.user_id = w.user_id AND s.rn = w.rn + 1
)
SELECT user_id, event_id,
       (floor(y * 10000.0 + 0.5) / 10000.0) AS ewma
FROM walk
""",
)
def ewma_metric(
    spark: SparkSession, sf_dir: str, n_shards: int | None = None
) -> DataFrame:
    """Exponentially-weighted moving average of ``value`` per user, in
    (ts, event_id) order, alpha = 0.5 — the smoothing the reference's
    watchdog would apply to its CloudWatch `PutMedia.Success` series before
    thresholding (`putmedia_check.sh:26-34` reads the raw 60 s Sum; an EWMA
    is the standard de-noising of exactly that signal).

    EWMA is an order-dependent recursion (y_t = 0.5*y_{t-1} + 0.5*x_t,
    y_0 = x_0), inexpressible as a built-in window aggregate, so this is the
    O-32 Arrow path: shard users with ``user_id % n_shards`` (the
    watchdog_state_machine parallelism knob — one pandas invocation per
    shard, not per user), sort the shard frame once, and fold each user's
    series with the SAME IEEE ops the DuckDB recursive-CTE oracle replays.
    The fold recurses on unrounded float64; only the emitted value is
    4-dp-rounded (both sides), so the hash match is by construction.

    Scale: one exchange on the shard key; per-task memory is one shard's
    event slice, shrinking as ``defaultParallelism`` grows. The Python
    per-row fold is O(shard rows) with trivial body — the Arrow transfer,
    not the loop, bounds throughput, same budget as watchdog_state_machine.
    """
    if n_shards is None:
        n_shards = 2 * spark.sparkContext.defaultParallelism
    e = io.load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["user_id", "ts", "event_id"])
        users = pdf["user_id"].to_numpy()
        vals = pdf["value"].to_numpy(dtype="float64")
        out = np.empty(len(vals), dtype="float64")
        y = 0.0
        for i in range(len(vals)):
            if i == 0 or users[i] != users[i - 1]:
                y = vals[i]
            else:
                y = 0.5 * y + 0.5 * vals[i]
            out[i] = y
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "event_id": pdf["event_id"].to_numpy(),
                "ewma": np.floor(out * 10000.0 + 0.5) / 10000.0,
            }
        )

    return (
        e.select(
            "user_id",
            "ts",
            "event_id",
            "value",
            (F.col("user_id") % n_shards).alias("_shard"),
        )
        .groupBy("_shard")
        .applyInPandas(fold, _EWMA_SCHEMA)
    )


@register(
    "skyline_parts",
    tags=("NS-analytics", "O-13"),
    oracle="""
SELECT a.p_partkey, a.p_size, a.p_retailprice
FROM part a
WHERE NOT EXISTS (
  SELECT 1 FROM part b
  WHERE b.p_retailprice <= a.p_retailprice
    AND b.p_size <= a.p_size
    AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size)
)
""",
)
def skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline: parts not strictly dominated on
    (p_retailprice, p_size), both minimized — the multi-criteria shortlist
    query ("no part is both cheaper and smaller"). A part is dominated if
    another is <= on both axes and < on at least one; equal (price, size)
    pairs do not dominate each other, so duplicates all surface.

    The naive form is a quadratic self-anti-join (the oracle's NOT EXISTS —
    fine for DuckDB at sf0.01, fatal at 100 TB). The Spark plan is the
    classic two-phase distributed skyline instead:

      1. distinct (price, size) pairs — one exchange, pairs << rows;
      2. LOCAL skyline per hash bucket via a PARTITIONED window: order by
         (price asc, size asc); a pair is locally dominated iff
         min(size) over preceding rows <= its size (on distinct pairs this
         rule is exact). Sound pruning: domination is transitive, so every
         globally-undominated pair survives its own bucket, and every
         dominated pair is eliminated by a surviving dominator later.
      3. GLOBAL pass over the survivors — provably tiny (≤ buckets × local
         skyline, ~O(log n) each for non-degenerate data) — as a broadcast
         nested-loop anti-join that mirrors the oracle's NOT EXISTS
         verbatim. No unpartitioned window, no corpus-sized global sort;
         the quadratic work touches only the survivor set.
      4. broadcast-join the skyline pairs back to parts to emit every
         matching row.

    No float arithmetic anywhere (raw-data doubles compared, never
    combined), so the hash match needs no rounding."""
    p = io.load_table(spark, sf_dir, "part")
    pairs = p.select("p_retailprice", "p_size").distinct()
    # Any deterministic bucketing is sound (pruning is partition-invariant);
    # price decimal-hash spreads the 32 buckets evenly.
    bucketed = pairs.withColumn(
        "_bucket",
        F.pmod(F.floor(F.col("p_retailprice") * 10.0).cast("bigint"), F.lit(32)),
    )
    w_local = (
        Window.partitionBy("_bucket")
        .orderBy(F.col("p_retailprice").asc(), F.col("p_size").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # The trailing repartition makes the survivor pipeline ONE shared
    # exchange subtree: both sides of the anti-join below (probe + the
    # broadcast build) read the same ReusedExchange, so the distinct + local
    # skyline runs once per query, not once per side (the repo's standard
    # shared-subtree move, cf. minhash_lsh_near_dups' bucket repartition).
    survivors = (
        bucketed.withColumn("_prec_min", F.min("p_size").over(w_local))
        .filter(
            F.col("_prec_min").isNull() | (F.col("_prec_min") > F.col("p_size"))
        )
        .select("p_retailprice", "p_size")
        .repartition("p_retailprice", "p_size")
    )
    dominated_by = (
        (F.col("b.p_retailprice") <= F.col("a.p_retailprice"))
        & (F.col("b.p_size") <= F.col("a.p_size"))
        & (
            (F.col("b.p_retailprice") < F.col("a.p_retailprice"))
            | (F.col("b.p_size") < F.col("a.p_size"))
        )
    )
    sky_pairs = survivors.alias("a").join(
        F.broadcast(survivors.alias("b")), dominated_by, "left_anti"
    )
    return p.join(
        F.broadcast(sky_pairs), ["p_retailprice", "p_size"]
    ).select("p_partkey", "p_size", "p_retailprice")


@register(
    "weighted_median_price",
    tags=("NS-analytics", "O-16"),
    oracle="""
WITH g AS (
  SELECT l_returnflag, l_extendedprice,
         SUM(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem
  GROUP BY l_returnflag, l_extendedprice
),
c AS (
  SELECT l_returnflag, l_extendedprice, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS cw,
         SUM(w) OVER (PARTITION BY l_returnflag) AS tw
  FROM g
)
SELECT l_returnflag,
       MIN(l_extendedprice) AS weighted_median_price,
       CAST(MIN(tw) AS BIGINT) AS total_weight
FROM c
WHERE 2 * cw >= tw
GROUP BY l_returnflag
""",
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag: the
    smallest price v whose cumulative quantity reaches half the group's
    total — the weighted generalization of median that `percentile_approx`
    cannot express exactly and `approx_percentile`-style sketches only
    bound. (Weights are TPC-H quantities — integral by generation; the
    bigint cast keeps the cumulative comparison in exact integer
    arithmetic, identical in both engines.)

    Plan: pre-aggregate to (flag, price) so the cumulative window walks
    DISTINCT prices (ties collapsed — rows vs range framing becomes
    irrelevant, and the window input is |distinct prices|, not |lineitem|),
    then one PARTITIONED cumulative-sum window, then a partial-combine min
    per flag. Two exchanges total (price-group, flag window); no float
    arithmetic — the median is a raw data value and the weights are ints,
    so no rounding is needed for the hash match."""
    li = io.load_table(spark, sf_dir, "lineitem")
    g = (
        li.groupBy("l_returnflag", "l_extendedprice")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    )
    w_cum = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag")
    c = g.select(
        "l_returnflag",
        "l_extendedprice",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_tot).alias("tw"),
    )
    return (
        c.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median_price"),
            F.min("tw").alias("total_weight"),
        )
    )
