"""Round-16 queue module — PRE-WIRED, NOT YET REGISTERED (the
queries_round11..15 discipline: built, oracle-validated at 3 SFs,
lockstep-tested every round, registered when a driver window has
slots).

Queries built in round 11 (continuation session):

* ``ltv_cohort_revenue`` — classic cohort lifetime-value triangle:
  customers cohorted by first-order quarter, cumulative revenue-cents
  by cohort age in quarters — the retention-curve economics view next
  to the r6-green ``weekly_retention`` activity view. All-integer.
* ``order_total_reconciliation`` — data-quality reconciliation audit:
  o_totalprice vs the recomputed Σ extendedprice·(1−disc)·(1+tax) per
  order. MEASURED FINDING on this fixture (probed at sf0.01): the
  generator draws totals INDEPENDENTLY of lineitems — 0 of 14 743
  orders reconcile within a cent (median gap ≈ $138k) and 257 orders
  have no lineitems at all. The audit exists to REPORT exactly that
  honestly (the RI-audit discipline: a failing invariant is a result,
  not a bug in the audit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.functions.numeric import scaled_long


def _ltv_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV triangle (X-212): cohort = first-order quarter index
    (year·4 + quarter − 1), age = order quarter − cohort quarter,
    cumulative exact revenue-cents per (cohort, age) plus the cohort's
    customer count. Two orders shuffles (first-order aggregate + the
    cohort-age rollup) and one cohort-partitioned running window over
    the ≤ |quarters|² triangle."""
    orders = io.load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 4 + F.quarter("o_orderdate") - 1).alias("_q"),
        scaled_long(F.col("o_totalprice"), 100).alias("_cents"),
    )
    first_q = orders.groupBy("o_custkey").agg(F.min("_q").alias("_cq"))
    sizes = first_q.groupBy("_cq").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    aged = (
        orders.join(first_q, "o_custkey")
        .groupBy(F.col("_cq"), (F.col("_q") - F.col("_cq")).alias("age_q"))
        .agg(F.sum("_cents").alias("_rev"))
    )
    w = (
        Window.partitionBy("_cq")
        .orderBy("age_q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        aged.withColumn("_cum", F.sum("_rev").over(w))
        .join(F.broadcast(sizes), "_cq")
        .select(
            F.col("_cq").cast("long").alias("cohort_q"),
            F.col("age_q").cast("long").alias("age_q"),
            F.col("n_customers").cast("long").alias("n_customers"),
            F.col("_rev").cast("long").alias("rev_cents"),
            F.col("_cum").cast("long").alias("cum_rev_cents"),
        )
    )


_LTV_ORACLE = """
WITH o AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 4 + quarter(o_orderdate) - 1 AS BIGINT)
           AS q,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
first_q AS (SELECT o_custkey, MIN(q) AS cq FROM o GROUP BY 1),
sizes AS (SELECT cq, COUNT(*) AS n_customers FROM first_q GROUP BY 1),
aged AS (
  SELECT f.cq, o.q - f.cq AS age_q, SUM(o.cents) AS rev
  FROM o JOIN first_q f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
)
SELECT CAST(a.cq AS BIGINT) AS cohort_q,
       CAST(a.age_q AS BIGINT) AS age_q,
       CAST(s.n_customers AS BIGINT) AS n_customers,
       CAST(a.rev AS BIGINT) AS rev_cents,
       CAST(SUM(a.rev) OVER (
         PARTITION BY a.cq ORDER BY a.age_q
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_rev_cents
FROM aged a JOIN sizes s ON s.cq = a.cq
"""


def _order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation audit (X-213): per order status, how many orders'
    o_totalprice matches Σ extendedprice·(1−disc)·(1+tax) within one
    cent, how many have NO lineitems, and the total/max absolute gap.
    Per-line cents are scaled exactly once per line (floor(x·100+0.5))
    then summed as BIGINT — the engine's scaling discipline, identical
    in the oracle."""
    li = (
        io.load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("_k"),
            scaled_long(
                F.col("l_extendedprice")
                * (F.lit(1.0) - F.col("l_discount"))
                * (F.lit(1.0) + F.col("l_tax")),
                100,
            ).alias("_line_cents"),
        )
        .groupBy("_k")
        .agg(F.sum("_line_cents").alias("_recomputed"))
    )
    orders = io.load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.col("o_orderkey").alias("_k"),
        scaled_long(F.col("o_totalprice"), 100).alias("_stated"),
    )
    j = orders.join(li, "_k", "left")
    gap = F.abs(F.col("_stated") - F.col("_recomputed"))
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.count(F.when(F.col("_recomputed").isNull(), 1))
            .cast("long")
            .alias("n_no_lines"),
            F.coalesce(F.sum(F.when(gap <= 1, 1)), F.lit(0))
            .cast("long")
            .alias("n_reconciled"),
            F.coalesce(F.sum(gap), F.lit(0)).cast("long").alias("total_gap_cents"),
            F.coalesce(F.max(gap), F.lit(0)).cast("long").alias("max_gap_cents"),
        )
    )


_RECON_ORACLE = """
WITH li AS (
  SELECT l_orderkey AS k,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                        * 100 + 0.5) AS BIGINT)) AS recomputed
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT o.o_orderstatus,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS stated,
         li.recomputed
  FROM orders o LEFT JOIN li ON li.k = o.o_orderkey
)
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(CASE WHEN recomputed IS NULL THEN 1 END) AS BIGINT)
         AS n_no_lines,
       CAST(COALESCE(SUM(CASE WHEN ABS(stated - recomputed) <= 1
                              THEN 1 END), 0) AS BIGINT) AS n_reconciled,
       CAST(COALESCE(SUM(ABS(stated - recomputed)), 0) AS BIGINT)
         AS total_gap_cents,
       CAST(COALESCE(MAX(ABS(stated - recomputed)), 0) AS BIGINT)
         AS max_gap_cents
FROM j GROUP BY 1
"""


QUERIES = {
    "ltv_cohort_revenue": _ltv_cohort_revenue,
    "order_total_reconciliation": _order_total_reconciliation,
}

ORACLES = {
    "ltv_cohort_revenue": _LTV_ORACLE,
    "order_total_reconciliation": _RECON_ORACLE,
}

assert set(QUERIES) == set(ORACLES)

TAGS = {name: ("round16",) for name in QUERIES}


def register_all(names: "tuple[str, ...] | None" = None) -> None:
    """Wire the given wave into the live registry — called from
    ``registry._load_all`` when a window has slots, never before."""
    from kinesis_stream_video_project_spark.plans.registry import register

    for name in names if names is not None else tuple(QUERIES):
        register(name, oracle=ORACLES[name], tags=TAGS[name])(QUERIES[name])
