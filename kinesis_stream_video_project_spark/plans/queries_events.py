"""Event-analytics module: the product-analytics shapes every event
warehouse runs at 100 TB — funnel conversion, weekly retention cohorts, and
transition (bigram) analysis. All three generalize the reference's
probe-log semantics (a per-device ordered event sequence, restart.sh:86-101)
from one device's health to the whole population's behavior.

Scale notes:

* every query shuffles on user_id exactly once (the analytics key), then
  aggregates into a result whose cardinality is tiny (funnel: 1 row,
  retention: weeks x offsets, bigrams: |types|^2) — the second aggregation
  moves near-zero data;
* event-time ordering ties are broken by the unique event_id, so every
  window is a total order and results are engine-reproducible;
* timestamps surface as epoch seconds of ISO-week starts (integer-exact in
  both engines; events.ts is ns in parquet, µs in Spark — week truncation
  erases the difference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.functions.numeric import r4
from kinesis_stream_video_project_spark.plans.registry import register


@register(
    "conversion_funnel",
    tags=("O-08", "O-16", "O-24"),
    oracle="""
WITH per_user AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'signup'   THEN ts END) AS first_signup,
           MIN(CASE WHEN event_type = 'view'     THEN ts END) AS first_view,
           MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
    FROM events
    GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(first_signup) AS n_signed_up,
       COUNT(CASE WHEN first_view > first_signup THEN 1 END) AS n_viewed_after,
       COUNT(CASE WHEN first_purchase > first_signup THEN 1 END) AS n_purchased_after,
       (floor((CAST(COUNT(CASE WHEN first_purchase > first_signup THEN 1 END) AS DOUBLE)
               / COUNT(first_signup)) * 10000.0 + 0.5) / 10000.0) AS conversion_rate
FROM per_user
""",
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion (signup -> view -> purchase) via conditional-min
    timestamps: ONE pass over events, one user_id shuffle, then a 1-row
    reduction. The naive formulation (N self-joins for N stages) shuffles
    the fact table N times; conditional aggregation makes stage count free —
    the property that matters when events is 95% of 100 TB.
    """
    e = io.load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("first_signup"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    purchased_after = F.count(
        F.when(F.col("first_purchase") > F.col("first_signup"), 1)
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_signup").alias("n_signed_up"),
        F.count(F.when(F.col("first_view") > F.col("first_signup"), 1)).alias(
            "n_viewed_after"
        ),
        purchased_after.alias("n_purchased_after"),
        r4(
            purchased_after.cast("double") / F.count("first_signup")
        ).alias("conversion_rate"),
    )


@register(
    "weekly_retention",
    tags=("O-08", "O-24", "O-16"),
    oracle="""
WITH firsts AS (
    SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT e.user_id, f.cohort_week,
           CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT) AS week_offset
    FROM events e JOIN firsts f ON e.user_id = f.user_id
)
SELECT CAST(epoch(cohort_week) AS BIGINT) AS cohort_week_start,
       week_offset,
       COUNT(*) AS n_active_users
FROM activity
WHERE week_offset <= 4
GROUP BY cohort_week, week_offset
ORDER BY cohort_week_start, week_offset
""",
)
def weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users bucketed by first-seen ISO week,
    counted as active per week offset 0..4. The cohort assignment reuses the
    user_id shuffle of the activity dedup (same key), so the whole matrix is
    two aggregations on one partitioning plus a broadcast-back of the tiny
    firsts table — no event-to-event self-join.
    """
    e = io.load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    (
                        F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                        - F.unix_timestamp("cohort_week")
                    )
                    / (7 * 86400)
                )
            ).alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("week_offset") <= 4)
        .groupBy(
            F.unix_timestamp("cohort_week").alias("cohort_week_start"),
            "week_offset",
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_week_start", "week_offset")
    )


@register(
    "event_transitions",
    tags=("O-16", "O-08"),
    oracle="""
WITH ordered AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
    FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS n_transitions
FROM ordered
WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
ORDER BY prev_type, next_type
""",
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition bigram counts (the Markov view of user behavior, and
    the population form of the watchdog's consecutive-failure detection —
    the error->error cell IS restart.sh:90-95's condition). lag() over a
    total per-user order (ts, then unique event_id), then an aggregate whose
    key space is |types|^2 = 25 rows: the sort and the count share the single
    user_id shuffle.
    """
    e = io.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            "user_id",
            F.col("event_type").alias("next_type"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )


@register(
    "cohort_ltv_curve",
    tags=("O-08", "O-24", "O-16"),
    oracle="""
WITH firsts AS (
    SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
    FROM events GROUP BY user_id
),
wk AS (
    SELECT f.cohort_week,
           CAST(date_diff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT) AS week_offset,
           SUM(e.value) AS rev
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    WHERE e.event_type = 'purchase'
    GROUP BY 1, 2
),
r AS (
    SELECT CAST(epoch(cohort_week) AS BIGINT) AS cohort_week_start,
           week_offset,
           (floor((rev) * 10000.0 + 0.5) / 10000.0) AS week_revenue
    FROM wk WHERE week_offset <= 8
)
SELECT cohort_week_start, week_offset, week_revenue,
       (floor((SUM(week_revenue) OVER (PARTITION BY cohort_week_start
                                       ORDER BY week_offset)) * 10000.0 + 0.5) / 10000.0)
           AS cum_revenue
FROM r
""",
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: purchase revenue per (first-seen week, week
    offset) with the cumulative lifetime value running sum — the companion
    to weekly_retention every growth dashboard pairs it with. Same
    plan skeleton (one user_id shuffle, broadcast-back of the tiny firsts
    table, aggregate to a weeks x offsets grid); the cumulative window
    runs over the tiny grid, partitioned per cohort. The running sum
    accumulates the ALREADY-4dp-ROUNDED weekly values in week_offset
    order, so both engines add identical doubles in an identical sequence
    — bit-stable without a decimal cast."""
    e = io.load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    wk = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            F.unix_timestamp("cohort_week").alias("cohort_week_start"),
            F.floor(
                (
                    F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                    - F.unix_timestamp("cohort_week")
                )
                / (7 * 86400)
            ).alias("week_offset"),
        )
        .agg(r4(F.sum("value")).alias("week_revenue"))
        .filter(F.col("week_offset") <= 8)
    )
    w = (
        Window.partitionBy("cohort_week_start")
        .orderBy("week_offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return wk.select(
        "cohort_week_start",
        "week_offset",
        "week_revenue",
        r4(F.sum("week_revenue").over(w)).alias("cum_revenue"),
    )
