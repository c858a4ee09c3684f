"""Round-5 final additions: inter-arrival time-series statistics and a
deterministic mode aggregate. Both stay in exact integer arithmetic end to
end (epoch-µs gaps, bigint counts, integer threshold comparisons), so the
driver hash match is by construction — no float rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.plans.registry import register


@register(
    "interarrival_gap_percentiles",
    tags=("NS-timeseries", "O-16", "O-24"),
    oracle="""
WITH g AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
         ) AS gap_us
  FROM events
),
cnt AS (
  SELECT event_type, gap_us, COUNT(*) AS w
  FROM g WHERE gap_us IS NOT NULL
  GROUP BY event_type, gap_us
),
c AS (
  SELECT event_type, gap_us, w,
         SUM(w) OVER (PARTITION BY event_type ORDER BY gap_us) AS cw,
         SUM(w) OVER (PARTITION BY event_type) AS tw
  FROM cnt
)
SELECT event_type,
       MIN(CASE WHEN 2 * cw >= tw THEN gap_us END) AS median_gap_us,
       MIN(CASE WHEN 10 * cw >= 9 * tw THEN gap_us END) AS p90_gap_us,
       CAST(MIN(tw) AS BIGINT) AS n_gaps
FROM c
GROUP BY event_type
""",
)
def interarrival_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median and p90 of per-type inter-arrival gaps — the health
    statistic the reference's polling loop implies (`restart.sh:30` sleeps
    a fixed `loop_time`; the stream side of that contract is "how regular
    are the arrivals per event type", and the tail percentile is what an
    alert threshold would key on).

    Shape: one lag window (partitioned by type, ordered by the (ts,
    event_id) total order) turns timestamps into integer µs gaps; then the
    exact-percentile-over-distinct-values move from weighted_median_price —
    pre-aggregate to (type, gap) counts so the cumulative window walks
    distinct gap values, and pick the smallest gap crossing each integer
    threshold (2·cw ≥ tw for the median, 10·cw ≥ 9·tw for p90 — no float
    quantile arithmetic, so both engines agree exactly).

    Scale: three exchanges (lag window on type, gap-count group, cum
    window on type), each partitioned by event_type — bounded state per
    partition; the cumulative window's input is |distinct gaps| per type,
    not |events|."""
    e = io.load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w_lag = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_type", (us - F.lag(us).over(w_lag)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    cnt = g.groupBy("event_type", "gap_us").agg(F.count(F.lit(1)).alias("w"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("gap_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("event_type")
    c = cnt.select(
        "event_type",
        "gap_us",
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_tot).alias("tw"),
    )
    return c.groupBy("event_type").agg(
        F.min(
            F.when(F.lit(2) * F.col("cw") >= F.col("tw"), F.col("gap_us"))
        ).alias("median_gap_us"),
        F.min(
            F.when(
                F.lit(10) * F.col("cw") >= F.lit(9) * F.col("tw"),
                F.col("gap_us"),
            )
        ).alias("p90_gap_us"),
        F.min("tw").alias("n_gaps"),
    )


@register(
    "mode_order_priority",
    tags=("O-08", "O-16"),
    oracle="""
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
  FROM orders
  GROUP BY o_orderstatus, o_orderpriority
)
SELECT o_orderstatus, o_orderpriority AS modal_priority, n_orders
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_orderstatus ORDER BY n_orders DESC, o_orderpriority
  ) AS rn
  FROM c
)
WHERE rn = 1
""",
)
def mode_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE: the most frequent order priority per status,
    ties broken by the smaller priority string. Neither engine's native
    `mode()` guarantees a tie-break (Spark's and DuckDB's are both
    pick-any), so the portable form is count + row_number over
    (count DESC, value ASC) — the same determinism discipline as
    exact_dedup's min-id canonical representative.

    Shape: one partial-combine count aggregate (the heavy input never
    reaches the window) + one window over the tiny (status, priority)
    count table + a rn=1 filter. Two exchanges, both on o_orderstatus
    keys; the window input is |status × priority| ≈ dozens of rows at any
    corpus size."""
    o = io.load_table(spark, sf_dir, "orders")
    c = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n_orders").desc(), F.col("o_orderpriority").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("modal_priority"),
            "n_orders",
        )
    )
