"""Fourth relational breadth module: the remaining TPC-H query shapes the
star schema can express — nation-pair trade (Q7), market share (Q8),
outer-join count distribution (Q13), HAVING-gated IN subquery (Q18),
multi-condition "only late supplier" analysis (Q21 adapted), and a
scalar-subquery + anti-join dormant-customer report (Q22 adapted).

Adaptation notes (the fixture schema lacks partsupp, l_commitdate /
l_receiptdate, c_phone — FIXTURES.md):

* Q21's "kept orders waiting" predicate becomes ``l_shipdate >
  o_orderdate + 60 days`` and is expressed as derived per-order aggregates
  (distinct suppliers / distinct late suppliers) instead of nested
  EXISTS/NOT EXISTS — the plan is ONE extra aggregate on the already-shuffled
  order key rather than two correlated probes, which is also the formulation
  that scales (Catalyst would decorrelate the EXISTS pair into much the same
  shape, but the window/agg form makes the single-shuffle property explicit).
* Q22's "customers who never ordered" is empty on this data (every customer
  has orders), so the anti-condition becomes "no URGENT order", keeping the
  NOT EXISTS → left-anti-join shape non-degenerate.

Scale notes: every dimension side broadcasts; the only shuffles are on the
fact keys (o_orderkey / l_orderkey / c_custkey), each used by at most one
exchange per query. Year extraction and CASE run in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.functions.numeric import r4
from kinesis_stream_video_project_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return io.load_table(spark, sf_dir, name)


@register(
    "nation_pair_trade",
    tags=("O-11", "O-24", "O-08"),
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       (floor((SUM(volume)) * 10000.0 + 0.5) / 10000.0) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6')
       OR (n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9')
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bidirectional nation-pair trade volume by ship year.

    The nation dimension joins TWICE under different roles (supplier's vs
    customer's nation) — both broadcast, and the OR-of-pairs predicate
    evaluates post-join in codegen. Only lineitem><orders shuffles.
    Re-expresses the reference's device-scoped catalog filter
    (putmedia_check.sh:6) generalized to a two-sided entity filter.
    """
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.filter(F.col("n_name").isin("NATION_9", "NATION_6")).select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.filter(F.col("n_name").isin("NATION_9", "NATION_6")).select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk")
    ).select("s_suppkey", "supp_nation")
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk")
    ).select("c_custkey", "cust_nation")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_9") & (F.col("cust_nation") == "NATION_6"))
            | ((F.col("supp_nation") == "NATION_6") & (F.col("cust_nation") == "NATION_9"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "market_share_by_year",
    tags=("O-11", "O-08", "O-25"),
    oracle="""
SELECT o_year,
       (floor((SUM(CASE WHEN supp_nation = 'NATION_9' THEN volume ELSE 0 END) / SUM(volume)) * 10000.0 + 0.5) / 10000.0) AS mkt_share
FROM (
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           l_extendedprice * (1 - l_discount) AS volume,
           n2.n_name AS supp_nation
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region    ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
)
GROUP BY o_year
ORDER BY o_year
""",
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for one part
    type, per order year. The numerator is a conditional sum over the same
    rows as the denominator — one aggregate pass, no second scan. Customer
    side is pre-shrunk to the ASIA region through the broadcast nation→region
    chain before it ever meets the facts.
    """
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = _t(spark, sf_dir, "nation").join(
        F.broadcast(r.select("r_regionkey")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("c_nk"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    c = _t(spark, sf_dir, "customer").join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk")
    ).select("c_custkey")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk")
    ).select("s_suppkey", "supp_nation")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            r4(
                F.sum(F.when(F.col("supp_nation") == "NATION_9", vol).otherwise(0.0))
                / F.sum(vol)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@register(
    "customer_order_distribution",
    tags=("O-11", "O-08"),
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c_custkey, COUNT(o_orderkey) AS c_count
    FROM customer LEFT OUTER JOIN orders
      ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: histogram of per-customer order counts, with the
    priority filter in the JOIN CONDITION (not WHERE) so customers whose
    orders are all urgent still appear with count 0 — the outer-join
    semantics WHERE-placement would silently destroy. Two aggregations, but
    the second groups ~200 distinct counts: its shuffle is negligible; only
    the c_custkey aggregation moves real data.
    """
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "large_volume_customers",
    tags=("O-35", "O-08", "O-06"),
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS VARCHAR) AS orderdate,
       (floor((o_totalprice) * 10000.0 + 0.5) / 10000.0) AS o_totalprice,
       (floor((SUM(l_quantity)) * 10000.0 + 0.5) / 10000.0) AS sum_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN-subquery gated by a HAVING aggregate. The
    qualifying-order set (46 keys at sf0.01) re-joins as a semi-join; Spark
    plans the aggregate once and AQE converts the tiny qualifying side to a
    broadcast at runtime. Top-100 rides TakeOrderedAndProject.
    """
    io.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_name, c_custkey, o_orderkey,
               date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss') AS orderdate,
               CAST(floor(o_totalprice * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS o_totalprice,
               CAST(floor(SUM(l_quantity) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS sum_qty
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
        """
    )


@register(
    "waiting_suppliers",
    tags=("O-11", "O-08", "O-16"),
    oracle="""
WITH ol AS (
    SELECT l_orderkey, l_suppkey,
           CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN 1 ELSE 0 END AS late
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderstatus = 'F'
),
st AS (
    SELECT l_orderkey,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
    FROM ol GROUP BY l_orderkey
)
SELECT s_name, COUNT(DISTINCT ol.l_orderkey) AS numwait
FROM ol
JOIN st ON ol.l_orderkey = st.l_orderkey
JOIN supplier ON s_suppkey = ol.l_suppkey
WHERE ol.late = 1 AND st.n_supp > 1 AND st.n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
""",
)
def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted — FIXTURES.md has no commit/receipt dates):
    suppliers who were the SOLE late shipper on multi-supplier finalized
    orders. The classic EXISTS + NOT-EXISTS pair is expressed as per-order
    distinct/conditional-distinct aggregates joined back on the order key:
    the fact data shuffles once on l_orderkey and the per-order stats reuse
    that partitioning; supplier broadcasts.
    """
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    ol = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey",
        "l_suppkey",
        F.when(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
            1,
        )
        .otherwise(0)
        .alias("late"),
    )
    st = ol.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias(
            "n_late"
        ),
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ol.join(st, F.col("l_orderkey") == F.col("k"))
        .filter((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
    )


@register(
    "dormant_rich_customers",
    tags=("O-35", "O-12", "O-23"),
    oracle="""
SELECT substring(c_name, length(c_name), 1) AS tail_digit,
       COUNT(*) AS numcust,
       (floor((SUM(c_acctbal)) * 10000.0 + 0.5) / 10000.0) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
GROUP BY tail_digit
ORDER BY tail_digit
""",
)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted — every customer here has orders, so the
    anti-condition is "no URGENT order"): above-average-balance customers
    with no urgent activity, bucketed by the last digit of the customer name
    (the fixture has no phone column). Scalar subquery folds to a literal
    broadcast; NOT EXISTS becomes a left-anti join on c_custkey.
    """
    io.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT substring(c_name, length(c_name), 1) AS tail_digit,
               COUNT(*) AS numcust,
               CAST(floor(SUM(c_acctbal) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (
              SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
          )
        GROUP BY tail_digit
        ORDER BY tail_digit
        """
    )


@register(
    "salted_join_orders",
    tags=("O-11", "NS-skew"),
    oracle="""
SELECT o_orderkey, c_name,
       (floor((o_totalprice) * 10000.0 + 0.5) / 10000.0) AS o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
""",
)
def salted_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof salted join certification (operators/skew.py::salted_join):
    the hot-key side is salted across 8 reducers, the other side exploded to
    all salts, and the oracle is the PLAIN join — the salt must be invisible
    in the result, which is the correctness property that lets you deploy it
    under a skewed 100 TB fact join when AQE's skew split isn't enough
    (e.g. a single device key dominating the reference's probe log)."""
    from kinesis_stream_video_project_spark.operators import skew

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    j = skew.salted_join(o, c, "o_custkey", "c_custkey", n_salts=8)
    return j.select(
        "o_orderkey", "c_name", r4(F.col("o_totalprice")).alias("o_totalprice")
    )


@register(
    "returned_item_customers",
    tags=("O-11", "O-08", "O-06"),
    oracle="""
SELECT c_custkey, c_name,
       (floor((SUM(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0) AS lost_revenue,
       n_name,
       (floor((c_acctbal) * 10000.0 + 0.5) / 10000.0) AS c_acctbal
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY lost_revenue DESC, c_custkey
LIMIT 20
""",
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    half-year window. The return-flag and date filters are pushed to the two
    fact scans before their join; customer and nation broadcast; the top-20
    rides TakeOrderedAndProject — at 100 TB the only heavy movement is the
    lineitem('R')><orders(semester) join on the order key."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "lost_revenue"
            )
        )
        .select(
            "c_custkey",
            "c_name",
            "lost_revenue",
            "n_name",
            r4(F.col("c_acctbal")).alias("c_acctbal"),
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "unsupplied_parts",
    tags=("O-12", "O-35", "O-08"),
    oracle="""
SELECT p_brand, p_type, COUNT(*) AS n_parts
FROM part
WHERE p_partkey NOT IN (
    SELECT l_partkey
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_nationkey = 9
)
GROUP BY p_brand, p_type
ORDER BY n_parts DESC, p_brand, p_type
""",
)
def unsupplied_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: NOT IN subquery -> Catalyst's null-aware anti join.
    NOT IN is the subtlest subquery form (one NULL in the subquery result
    empties the whole output under SQL three-valued logic); expressing it as
    NOT IN rather than a hand-rolled left-anti join delegates that semantics
    to the planner. The subquery side shrinks to one nation's supplied part
    keys before the anti join; the final aggregate groups ~brand x type.
    """
    io.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_brand, p_type, COUNT(*) AS n_parts
        FROM part
        WHERE p_partkey NOT IN (
            SELECT l_partkey
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            WHERE s_nationkey = 9
        )
        GROUP BY p_brand, p_type
        ORDER BY n_parts DESC, p_brand, p_type
        """
    )


@register(
    "approx_percentiles_value",
    tags=("O-08", "O-09"),
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       TRUE AS p50_in_bracket,
       TRUE AS p95_in_bracket
FROM events
GROUP BY event_type
""",
)
def approx_percentiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (quantile sketch) of event values per type — the
    100 TB form of ordered statistics: mergeable fixed-size sketches instead
    of a full sort, so the shuffle carries kilobytes per group regardless of
    row count.

    Sketch outputs are engine-specific, so the accuracy claim IS the
    hashable output: with accuracy=1000 the rank error is bounded by n/1000,
    so the approximate p50/p95 must lie inside the exact [p49, p51] /
    [p94, p96] value brackets (computed with Spark's exact percentile in the
    same pass). The oracle emits literal TRUE per group — a sketch outside
    its guaranteed bracket flips the boolean and fails the driver hash."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr("approx_percentile(value, 0.5, 1000)").alias("_a50"),
            F.expr("approx_percentile(value, 0.95, 1000)").alias("_a95"),
            F.expr("percentile(value, array(0.49D, 0.51D, 0.94D, 0.96D))").alias("_ex"),
        )
        .select(
            "event_type",
            "n_events",
            ((F.col("_a50") >= F.col("_ex")[0]) & (F.col("_a50") <= F.col("_ex")[1])).alias(
                "p50_in_bracket"
            ),
            ((F.col("_a95") >= F.col("_ex")[2]) & (F.col("_a95") <= F.col("_ex")[3])).alias(
                "p95_in_bracket"
            ),
        )
    )


@register(
    "forecast_revenue_change",
    tags=("O-04", "O-08", "O-25"),
    oracle="""
SELECT (floor((SUM(l_extendedprice * l_discount)) * 10000.0 + 0.5) / 10000.0) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the canonical predicate-pushdown benchmark — pure
    scan + range filters + one aggregate, no join, no group-by. Both range
    predicates must reach the parquet scan (PushedFilters) and the whole
    query is a single map-side-partial + 1-exchange reduction; at 100 TB
    this is the query whose cost IS the scan cost."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_discount").between(0.05, 0.07) & (F.col("l_quantity") < 24))
        .agg(
            r4(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "min_cost_supplier",
    tags=("O-35", "O-11"),
    oracle="""
SELECT p_partkey, p_name, s_name,
       (floor((l_extendedprice / l_quantity) * 10000.0 + 0.5) / 10000.0) AS unit_price
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_size >= 45
  AND l_extendedprice / l_quantity = (
      SELECT MIN(l2.l_extendedprice / l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
ORDER BY p_partkey, s_name
""",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted — no partsupp table; unit price from
    lineitem): per large part, the supplier(s) achieving the minimum unit
    price, via a correlated MIN subquery. Catalyst decorrelates to one
    aggregate on l_partkey joined back — the equality compares each row's
    unit price against a MIN over the same doubles, so it is exact and
    engine-portable (no arithmetic happens after the MIN)."""
    io.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT p_partkey, p_name, s_name,
               CAST(floor((l_extendedprice / l_quantity) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS unit_price
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        WHERE p_size >= 45
          AND l_extendedprice / l_quantity = (
              SELECT MIN(l2.l_extendedprice / l2.l_quantity)
              FROM lineitem l2 WHERE l2.l_partkey = p_partkey
          )
        ORDER BY p_partkey, s_name
        """
    )


@register(
    "important_part_shares",
    tags=("O-35", "O-08"),
    oracle="""
WITH pr AS (
    SELECT l_partkey,
           SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS v_cents
    FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey,
       (floor((v_cents / 100.0) * 10000.0 + 0.5) / 10000.0) AS part_value
FROM pr
WHERE v_cents > (
    SELECT SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) * 0.0005
    FROM lineitem
)
ORDER BY part_value DESC, l_partkey
""",
)
def important_part_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted to lineitem revenue): parts whose revenue
    exceeds a fraction of the global total — HAVING against a scalar
    subquery. Both sums accumulate portable integer cents
    (floor(x*100+0.5) as BIGINT): per-row DECIMAL casts round half-up in
    Spark but half-even in DuckDB, and raw double sums at 1e9+ magnitude
    are order-sensitive — integer cents make the threshold comparison
    bit-stable between engines; the scalar total folds to a literal
    broadcast."""
    io.register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH pr AS (
            SELECT l_partkey,
                   SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS v_cents
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey,
               CAST(floor((v_cents / 100.0) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS part_value
        FROM pr
        WHERE v_cents > (
            SELECT SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100.0 + 0.5) AS BIGINT)) * 0.0005
            FROM lineitem
        )
        ORDER BY part_value DESC, l_partkey
        """
    )


@register(
    "brand_volume_suppliers",
    tags=("O-35", "O-12", "O-08"),
    oracle="""
SELECT s_name,
       (floor((s_acctbal) * 10000.0 + 0.5) / 10000.0) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
    GROUP BY l_suppkey
    HAVING SUM(l_quantity) > 500
)
ORDER BY s_name
""",
)
def brand_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted): suppliers who moved real volume of one
    brand — an IN subquery whose inner query is itself a join + group-by +
    HAVING. The qualifying supplier set is tiny, so the outer IN becomes a
    broadcast semi-join; the inner aggregate shuffles only (suppkey, qty)."""
    io.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_name,
               CAST(floor(s_acctbal * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#1'
            GROUP BY l_suppkey
            HAVING SUM(l_quantity) > 500
        )
        ORDER BY s_name
        """
    )


@register(
    "product_type_profit",
    tags=("O-08", "O-11", "O-24"),
    oracle="""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       (floor((SUM(l_extendedprice * (1 - l_discount)
                   - 0.5 * p_retailprice * l_quantity)) * 10000.0 + 0.5) / 10000.0)
           AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
""",
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted — no partsupp; supply cost proxied as 50% of
    p_retailprice, FIXTURES.md): profit on 'widget' parts by supplier
    nation and order year. Plan: the p_name filter prunes part BEFORE its
    broadcast; part/supplier/nation all broadcast into the lineitem scan,
    so the only row-level shuffle is the lineitem-orders fact-fact join on
    the order key, followed by one (nation, year) aggregate whose
    cardinality is |nations| x |years|."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    profit_term = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) - F.lit(
        0.5
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(r4(F.sum(profit_term)).alias("profit"))
    )


@register(
    "top_revenue_supplier",
    tags=("O-08", "O-35", "O-11"),
    oracle="""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           (floor((SUM(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0)
               AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the top supplier(s) by Q1-1996 lineitem revenue via
    a scalar-subquery max over a derived revenue view. The revenue CTE is
    computed once (Spark reuses the subquery result for both the join input
    and the scalar max); equality against the max is on the 4-dp-rounded
    revenue so the tie set is engine-deterministic. Supplier is
    broadcast-joined onto the one-shuffle revenue aggregate."""
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    revenue = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(r4(F.sum(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max"))
    return (
        revenue.join(F.broadcast(max_rev), revenue["total_revenue"] == F.col("_max"))
        .join(F.broadcast(s), F.col("supplier_no") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )
