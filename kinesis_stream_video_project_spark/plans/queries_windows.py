"""Window functions + time-window aggregations (SURVEY.md §2B O-16, O-18,
O-19, O-21 batch twins).

The streaming forms of O-18/O-19/O-21 live in ``streaming/``; these batch
twins pin the exact semantics against the DuckDB oracle (SURVEY.md §5.2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.numeric import r4
from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.config import SESSION_GAP_SECONDS
from kinesis_stream_video_project_spark.plans.registry import register


@register(
    "window_rank_lag",
    tags=("O-16",),
    oracle="""
SELECT c.c_custkey, o.o_orderkey,
       row_number() OVER w AS rn,
       rank()       OVER (PARTITION BY c.c_custkey ORDER BY o.o_totalprice DESC) AS price_rank,
       lag(o.o_totalprice)  OVER w AS prev_price,
       lead(o.o_totalprice) OVER w AS next_price
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
WINDOW w AS (PARTITION BY c.c_custkey ORDER BY o.o_orderdate, o.o_orderkey)
""",
)
def window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + analytic window functions (O-16): row_number/rank/lag/lead
    per customer — the per-key ordered view that generalizes the watchdog's
    'previous probe' logic (ST1, restart.sh:90-95)."""
    c = io.load_table(spark, sf_dir, "customer")
    o = io.load_table(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey)
    w = Window.partitionBy("c_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = Window.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc())
    return j.select(
        "c_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w_price).alias("price_rank"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@register(
    "window_running_agg",
    tags=("O-16",),
    oracle="""
SELECT o_custkey, o_orderkey,
       (floor((SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5) / 10000.0) AS running_spend,
       (floor((AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5) / 10000.0) AS moving_avg_3,
       CAST(CASE WHEN o_totalprice >= q75 THEN 1
                 WHEN o_totalprice >= q50 THEN 2
                 WHEN o_totalprice >= q25 THEN 3
                 ELSE 4 END AS BIGINT) AS price_quartile
FROM orders,
     (SELECT (floor((quantile_cont(o_totalprice, 0.25)) * 10000.0 + 0.5) / 10000.0) AS q25,
             (floor((quantile_cont(o_totalprice, 0.50)) * 10000.0 + 0.5) / 10000.0) AS q50,
             (floor((quantile_cont(o_totalprice, 0.75)) * 10000.0 + 0.5) / 10000.0) AS q75
      FROM orders)
""",
)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over frames (O-16): running sum, 3-row moving average,
    price quartiles.

    Quartiles are assigned by comparison against three precomputed cut
    points (exact interpolated percentiles, rounded to 4 decimals on both
    engines), NOT by a global ``ntile(4)``: an unpartitioned window is a
    single-partition global sort — every orders row funneling through one
    task — which is a scale-killer at 100 TB. The cut-point aggregate
    reduces map-side partials to one 1-row result that broadcasts back, so
    no row-level data ever converges on a single task.
    """
    o = io.load_table(spark, sf_dir, "orders")
    cuts = o.agg(
        F.expr("percentile(o_totalprice, array(0.25D, 0.50D, 0.75D))").alias("qs")
    ).select(
        r4(F.col("qs")[0]).alias("q25"),
        r4(F.col("qs")[1]).alias("q50"),
        r4(F.col("qs")[2]).alias("q75"),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.join(F.broadcast(cuts))
        .select(
            "o_custkey",
            "o_orderkey",
            r4(
                F.sum("o_totalprice").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                )
            ).alias("running_spend"),
            r4(F.avg("o_totalprice").over(w.rowsBetween(-2, 0))).alias(
                "moving_avg_3"
            ),
            F.when(F.col("o_totalprice") >= F.col("q75"), 1)
            .when(F.col("o_totalprice") >= F.col("q50"), 2)
            .when(F.col("o_totalprice") >= F.col("q25"), 3)
            .otherwise(4)
            .cast("long")
            .alias("price_quartile"),
        )
    )


@register(
    "tumbling_hourly",
    tags=("O-18",),
    oracle="""
SELECT CAST((epoch_us(ts) // 3600000000) * 3600 AS BIGINT) AS hour_start,
       event_type,
       COUNT(*) AS n_events,
       (floor((SUM(value)) * 10000.0 + 0.5) / 10000.0) AS sum_value,
       (floor((AVG(value)) * 10000.0 + 0.5) / 10000.0) AS avg_value
FROM events
GROUP BY 1, 2
""",
)
def tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation, generalized from the reference's 60 s
    CloudWatch window (O-18, putmedia_check.sh:15) to hourly per event_type.
    Uses the native F.window operator (streaming-identical semantics)."""
    e = io.load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("sum_value"),
            r4(F.avg("value")).alias("avg_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


@register(
    "sliding_windows",
    tags=("O-19",),
    oracle="""
SELECT CAST(((epoch_us(ts) // 1800000000) - i) * 1800 AS BIGINT) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       (floor((SUM(value)) * 10000.0 + 0.5) / 10000.0) AS sum_value
FROM events
CROSS JOIN (SELECT unnest([0, 1]) AS i)
GROUP BY 1, 2
""",
)
def sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows (O-19): 1 h length, 30 min hop — each event
    lands in exactly two windows; Spark's F.window(duration, slide) plans an
    Expand (one row per covering window) before the hash agg, which is the
    same shape the oracle builds explicitly."""
    e = io.load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            r4(F.sum("value")).alias("sum_value"),
        )
        .select(
            F.unix_timestamp("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "session_windows",
    tags=("O-19", "ST2"),
    oracle=f"""
WITH flagged AS (
  SELECT user_id, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_SECONDS * 1_000_000}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, us,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT user_id,
       COUNT(*) AS n_events,
       MIN(us) AS session_start_us,
       MAX(us) + {SESSION_GAP_SECONDS * 1_000_000} AS session_end_us
FROM sessions
GROUP BY user_id, session_id
""",
)
def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (O-19): gap-based sessions per user with the
    reference's 300 s cooldown as the gap (ST2, restart.sh:12,76-82). Uses
    the native F.session_window operator; the oracle rebuilds identical
    sessions via gaps-and-islands (window end = last event + gap, matching
    Spark's definition)."""
    e = io.load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", f"{SESSION_GAP_SECONDS} seconds").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            "n_events",
            F.unix_micros("w.start").alias("session_start_us"),
            F.unix_micros("w.end").alias("session_end_us"),
        )
    )


@register(
    "dedup_first_event",
    tags=("O-21", "O-16"),
    oracle="""
SELECT user_id, event_type, event_id, epoch_us(ts) AS ts_us
FROM (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
""",
)
def dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest row (O-21 batch twin of
    dropDuplicates): deterministic rank-1 instead of Spark's
    order-undefined dropDuplicates — the same fix applied to the reference's
    nondeterministic `head -n 1` (putmedia_check2.sh:13)."""
    e = io.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
        )
    )


@register(
    "window_distribution_funcs",
    tags=("O-16",),
    oracle="""
SELECT o_orderkey,
       o_orderstatus,
       (floor((percent_rank() OVER w) * 10000.0 + 0.5) / 10000.0) AS pct_rank,
       (floor((cume_dist() OVER w) * 10000.0 + 0.5) / 10000.0)    AS cume,
       (floor((nth_value(o_totalprice, 3) OVER (PARTITION BY o_orderstatus
              ORDER BY o_totalprice DESC, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5) / 10000.0)
           AS third_highest_price
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
""",
)
def window_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-family window functions (O-16): percent_rank, cume_dist,
    nth_value over a deterministic total order per status partition. One
    shuffle on the partition key; all three share the same sort."""
    from pyspark.sql import Window

    o = io.load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        r4(F.percent_rank().over(w)).alias("pct_rank"),
        r4(F.cume_dist().over(w)).alias("cume"),
        r4(
            F.nth_value("o_totalprice", 3).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
        ).alias("third_highest_price"),
    )


@register(
    "time_range_moving_window",
    tags=("O-16", "O-24"),
    oracle="""
SELECT event_id, user_id,
       CAST(epoch_us(ts) AS BIGINT) AS ts_us,
       COUNT(*) OVER w AS n_prev_hour,
       (floor((SUM(value) OVER w) * 10000.0 + 0.5) / 10000.0) AS sum_prev_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(epoch_us(ts) AS BIGINT)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def time_range_moving_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (O-16): per user, count and sum of activity in
    the trailing hour *measured in event time*, not row counts — the frame
    each row sees is `[ts - 1h, ts]`, exactly the reference's trailing
    `[now-60s, now]` metric window (putmedia_check.sh:18-22) generalized to
    every row at once. Ordering key is epoch microseconds (BIGINT) so the
    range arithmetic is integer-exact and identical across engines; one
    shuffle on user_id, sort within partitions, no self-join (the naive
    formulation is an O(n²) range self-join)."""
    e = io.load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        ts_us.alias("ts_us"),
        F.count(F.lit(1)).over(w).alias("n_prev_hour"),
        r4(F.sum("value").over(w)).alias("sum_prev_hour"),
    )
