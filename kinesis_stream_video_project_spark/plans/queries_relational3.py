"""Third relational breadth module: explicit GROUPING SETS, multi-join
analytical classics (TPC-H Q3/Q5 shapes), and a correlated-average subquery —
the shapes a star-schema workload runs all day at 100 TB.

Scale notes baked into each plan:

* dimension sides (`region`, `nation`, `customer` filtered) are broadcast —
  no shuffle of the fact table for dim joins;
* filters are applied *before* joins so Catalyst pushes them into the
  parquet scans (verify: `PushedFilters` in `.explain("formatted")`);
* top-k always rides an explicit total order (TakeOrderedAndProject — no
  global sort materialization).
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
    "grouping_sets_agg",
    tags=("O-10",),
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (O-10) — the general form of rollup/cube: three
    named groupings in ONE Expand + hash-aggregate pass over the scan (vs 3
    scans if written as a UNION ALL of group-bys)."""
    io.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "shipping_priority_top10",
    tags=("O-06", "O-08", "O-11"),
    oracle="""
SELECT l_orderkey,
       (floor((SUM(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0) AS revenue,
       CAST(o_orderdate AS VARCHAR) AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact joins -> agg -> top-k.

    The customer side shrinks to one market segment before joining, so it is
    broadcast (no shuffle of orders/lineitem for that join); the limit rides
    the ORDER BY as TakeOrderedAndProject.
    """
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        l.join(
            o.join(
                F.broadcast(c.select("c_custkey")),
                F.col("o_custkey") == F.col("c_custkey"),
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "local_supplier_volume",
    tags=("O-08", "O-11"),
    oracle="""
SELECT n_name,
       (floor((SUM(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0) AS revenue
FROM customer
JOIN orders   ON c_custkey  = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with a same-nation constraint.

    All four dimension sides (customer, supplier, nation, region) broadcast;
    only orders><lineitem — the two fact tables — shuffle, on the order key.
    The region filter prunes nations *before* the fact join via the broadcast
    chain, so 4/5 of the data never moves.
    """
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r.select("r_regionkey")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@register(
    "small_quantity_revenue",
    tags=("O-35", "O-08"),
    oracle="""
SELECT CAST(floor((SUM(l_extendedprice) / 7.0) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS avg_yearly
FROM lineitem l1
WHERE l_quantity < (
    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
)
""",
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average) gating
    the outer scan. Catalyst decorrelates it into one aggregate + join — at
    scale that is a single extra shuffle on l_partkey, not a per-row probe.

    The output is CAST to DOUBLE on both sides: Spark's `/ 7.0` over a
    decimal-typed sum yields DECIMAL whose rendered value ('...1871000')
    hash-mismatches DuckDB's DOUBLE ('...1871') even when numerically equal.
    """
    io.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(floor((SUM(l_extendedprice) / 7.0) * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS avg_yearly
        FROM lineitem l1
        WHERE l_quantity < (
            SELECT 0.2 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
        )
        """
    )


@register(
    "salted_agg_events",
    tags=("O-08", "NS-skew"),
    oracle="""
SELECT user_id,
       (floor((SUM(value)) * 10000.0 + 0.5) / 10000.0) AS total_value,
       COUNT(event_id) AS n_events,
       (floor((MIN(value)) * 10000.0 + 0.5) / 10000.0) AS min_value,
       (floor((MAX(value)) * 10000.0 + 0.5) / 10000.0) AS max_value
FROM events
GROUP BY user_id
""",
)
def salted_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-stage aggregation (operators/skew.py::salted_agg): each
    hot key's rows spread over 16 reducers as (key, salt) partials, then
    recombine per key. The oracle is the PLAIN group-by — the salt is
    invisible in the result by construction, which is exactly the property
    this query certifies."""
    from kinesis_stream_video_project_spark.operators import skew

    e = io.load_table(spark, sf_dir, "events")
    out = skew.salted_agg(
        e,
        ["user_id"],
        {
            "total_value": ("value", "sum"),
            "n_events": ("event_id", "count"),
            "min_value": ("value", "min"),
            "max_value": ("value", "max"),
        },
        n_salts=16,
    )
    return out.select(
        "user_id",
        r4(F.col("total_value")).alias("total_value"),
        "n_events",
        r4(F.col("min_value")).alias("min_value"),
        r4(F.col("max_value")).alias("max_value"),
    )


@register(
    "table_profile",
    tags=("O-08", "NS-quality"),
    oracle="""
SELECT 'o_totalprice' AS col_name, COUNT(*) AS n_rows,
       COUNT(o_totalprice) AS n_non_null,
       COUNT(DISTINCT o_totalprice) AS n_distinct
FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus)
FROM orders
UNION ALL
SELECT 'o_custkey', COUNT(*), COUNT(o_custkey), COUNT(DISTINCT o_custkey)
FROM orders
""",
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass (ingestion-quality audit a training pipeline runs
    on every new shard): per-column row/non-null/distinct counts. One scan —
    the three profiles share it via a single multi-aggregate projection, then
    unpivot; at 100 TB this is one pass, not one per column."""
    o = _t(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").alias("nn_price"),
        F.countDistinct("o_totalprice").alias("nd_price"),
        F.count("o_orderstatus").alias("nn_status"),
        F.countDistinct("o_orderstatus").alias("nd_status"),
        F.count("o_custkey").alias("nn_cust"),
        F.countDistinct("o_custkey").alias("nd_cust"),
    )
    return agg.selectExpr(
        """stack(3,
            'o_totalprice', n_rows, nn_price, nd_price,
            'o_orderstatus', n_rows, nn_status, nd_status,
            'o_custkey', n_rows, nn_cust, nd_cust
        ) AS (col_name, n_rows, n_non_null, n_distinct)"""
    )


@register(
    "value_outliers",
    tags=("O-16", "NS-quality"),
    oracle="""
SELECT event_id, user_id,
       (floor((value) * 10000.0 + 0.5) / 10000.0) AS value,
       (floor(((value - mu) / sd) * 10000.0 + 0.5) / 10000.0) AS zscore
FROM (
    SELECT event_id, user_id, value,
           AVG(value) OVER (PARTITION BY user_id) AS mu,
           STDDEV_SAMP(value) OVER (PARTITION BY user_id) AS sd
    FROM events
)
WHERE sd > 0 AND abs((value - mu) / sd) > 3
""",
)
def value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key z-score outlier detection (quality gate for metric feeds):
    windowed mean/stddev per user, flag |z| > 3. One shuffle on user_id;
    the same expressions run streaming over a sliding window for live
    anomaly alerts."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    mu = F.avg("value").over(w)
    sd = F.stddev_samp("value").over(w)
    z = (F.col("value") - mu) / sd
    return (
        e.select(
            "event_id",
            "user_id",
            "value",
            mu.alias("mu"),
            sd.alias("sd"),
            z.alias("z"),
        )
        .filter((F.col("sd") > 0) & (F.abs("z") > 3))
        .select(
            "event_id",
            "user_id",
            r4(F.col("value")).alias("value"),
            r4(F.col("z")).alias("zscore"),
        )
    )


@register(
    "priority_late_shipment_counts",
    tags=("O-35", "O-12", "O-08"),
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
""",
)
def priority_late_shipment_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS subquery with a correlated date comparison.
    (Quarter window set inside the fixture's 1995-2001 order-date range —
    the original 1994-Q1 constant returned zero rows at every SF.)
    Catalyst rewrites the EXISTS into a left-semi join on the order key, so
    lineitem is touched once (shuffled as key+dates only), never row-probed."""
    io.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 30 DAY
          )
        GROUP BY o_orderpriority
        """
    )


@register(
    "disjunctive_predicate_join",
    tags=("O-11", "O-04"),
    oracle="""
SELECT (floor((SUM(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 10)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 20)
   OR (p_size >= 40 AND l_quantity < 5)
""",
)
def disjunctive_predicate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunctions across both join sides. The
    equi-join key still drives a hash join (part broadcasts); the disjunction
    evaluates post-join in codegen — the planner must NOT fall back to a
    nested-loop, which .explain confirms."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & (F.col("l_quantity") >= 20))
        | ((F.col("p_size") >= 40) & (F.col("l_quantity") < 5))
    )
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            r4(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "promo_revenue_share",
    tags=("O-08", "O-25"),
    oracle="""
SELECT (floor((100.0 * SUM(CASE WHEN p_type LIKE 'S%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        / SUM(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0) AS promo_share_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-02-01'
""",
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio in one pass (no second
    scan for the denominator). Month filter pushed to the lineitem scan."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-02-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            r4(
                100.0
                * F.sum(F.when(F.col("p_type").like("S%"), rev).otherwise(0.0))
                / F.sum(rev)
            ).alias("promo_share_pct")
        )
    )
