"""Relational operator breadth over the star schema (SURVEY.md §2B O-04..O-15,
O-23..O-27, O-35).

These generalize the reference's relational fragments (jq filter/project,
JMESPath projections, head-1 limits — SURVEY.md §2A) into the full operator
set, expressed declaratively so Catalyst plans pushdown/pruning/broadcast.
Every aggregate/computed float column is rounded to 4 dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.numeric import r4
from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return io.load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Aggregation / scan breadth
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    tags=("O-01", "O-04", "O-08"),
    oracle="""
SELECT l_returnflag, l_linestatus,
       (floor((SUM(l_quantity)) * 10000.0 + 0.5) / 10000.0)                                        AS sum_qty,
       (floor((SUM(l_extendedprice)) * 10000.0 + 0.5) / 10000.0)                                   AS sum_base_price,
       (floor((SUM(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0)                AS sum_disc_price,
       (floor((SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 10000.0 + 0.5) / 10000.0)  AS sum_charge,
       (floor((AVG(l_quantity)) * 10000.0 + 0.5) / 10000.0)                                        AS avg_qty,
       (floor((AVG(l_extendedprice)) * 10000.0 + 0.5) / 10000.0)                                   AS avg_price,
       (floor((AVG(l_discount)) * 10000.0 + 0.5) / 10000.0)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical hash aggregate with
    map-side partial aggregation — the generalized form of the reference's
    CloudWatch Sum delegation (putmedia_check.sh:32-33)."""
    l = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),
            r4(F.sum("l_extendedprice")).alias("sum_base_price"),
            r4(F.sum(disc_price)).alias("sum_disc_price"),
            r4(F.sum(disc_price * (1 + F.col("l_tax")))).alias("sum_charge"),
            r4(F.avg("l_quantity")).alias("avg_qty"),
            r4(F.avg("l_extendedprice")).alias("avg_price"),
            r4(F.avg("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "filter_predicates",
    tags=("O-04", "F1-F5"),
    oracle="""
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders
WHERE o_orderstatus IN ('O', 'F')
  AND o_orderpriority LIKE '1%'
  AND o_totalprice BETWEEN 50000 AND 200000
  AND lower(o_orderpriority) LIKE '%urgent%'
  AND o_orderdate IS NOT NULL
""",
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate breadth (O-04): IN-list, LIKE prefix, range BETWEEN,
    case-insensitive contains (F4: `grep -i`, restart.sh:108), NOT NULL —
    all pushed into the parquet scan by Catalyst."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_orderpriority").like("1%")
        & F.col("o_totalprice").between(50000, 200000)
        & F.lower(F.col("o_orderpriority")).contains("urgent")
        & F.col("o_orderdate").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@register(
    "computed_projection",
    tags=("O-05", "O-25"),
    oracle="""
SELECT l_orderkey, l_linenumber,
       (floor((l_extendedprice * (1 - l_discount)) * 10000.0 + 0.5) / 10000.0) AS revenue,
       (floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 10000.0 + 0.5) / 10000.0) AS charge,
       l_quantity > 25 AS is_bulk
FROM lineitem
""",
)
def computed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed-column projection (O-05) — the engine-side generalization of
    the reference's server-side JMESPath projections (P2, check_wf.sh:8)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        r4(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        r4(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        (F.col("l_quantity") > 25).alias("is_bulk"),
    )


@register(
    "topk_orders",
    tags=("O-06", "L1"),
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 10
""",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k with a total order (O-06): Spark plans TakeOrderedAndProject
    (per-partition top-k + k-way merge — no global sort, scale-safe). The
    deterministic orderBy fixes the reference's order-dependent `head -n 1`
    (putmedia_check2.sh:13)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "sort_ranked",
    tags=("O-07", "O-16"),
    oracle="""
SELECT rn, o_orderkey, o_totalprice, o_orderpriority
FROM (
  SELECT o_orderkey, o_totalprice, o_orderpriority,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 100
""",
)
def sort_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort materialized as a rank (O-07): the order becomes
    data, so the order-insensitive oracle hash still verifies it. (At scale a
    global row_number over one partition is a bottleneck; prefer top-k (O-06)
    or partitioned ranks — this entry exists to pin exact sort semantics.)"""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.select(
            F.row_number().over(w).alias("rn"),
            "o_orderkey",
            "o_totalprice",
            "o_orderpriority",
        )
        .filter(F.col("rn") <= 100)
    )


@register(
    "distinct_ops",
    tags=("O-09",),
    oracle="""
SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)  AS n_parts,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)  AS n_supps,
       CAST(COUNT(DISTINCT l_returnflag || '|' || l_linestatus) AS BIGINT) AS n_flag_pairs
FROM lineitem
""",
)
def distinct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (O-09). Spark expands multi-distinct via
    EXPAND; each distinct is a partial-agg pipeline — scales without a
    driver-side distinct."""
    l = _t(spark, sf_dir, "lineitem")
    return l.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct(
            F.concat_ws("|", F.col("l_returnflag"), F.col("l_linestatus"))
        ).alias("n_flag_pairs"),
    )


@register(
    "approx_distinct",
    tags=("O-09",),
    oracle="""
SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT)  AS exact_parts,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       TRUE AS parts_within_2pct,
       TRUE AS orders_within_2pct
FROM lineitem
""",
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate count-distinct via HyperLogLog++ (O-09 approx tier): the
    100 TB path where exact distinct's shuffle is unaffordable.

    HLL estimates are engine-specific, so the raw estimate can't hash-match
    an oracle; instead the tolerance claim IS the output: booleans asserting
    the estimate lands within 2% of the exact count (rsd=0.02; measured
    error ≤1% at sf0.001-0.1, and HLL++ is deterministic for fixed data).
    The oracle emits literal TRUE — an out-of-tolerance sketch flips the
    boolean and fails the driver's hash check.
    """
    l = _t(spark, sf_dir, "lineitem")
    tol = 0.02
    # ONE distinct column per aggregate: mixing distinct aggregates on
    # two different columns in one agg plans through Expand (every input
    # row multiplied once per distinct group) and a 2x-wide shuffle —
    # this query sat at 3.3-3.8 s since r5 because of it. Two
    # single-distinct aggregates each plan as the two-phase partial-
    # distinct shape (map-side dedup of ~20k part keys / ~150k order
    # keys before any exchange) and the 1-row frames cross-join for
    # free: 3.3 s -> ~1 s, bit-identical output.
    parts = l.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("_ap"),
    )
    orders = l.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("_ao"),
    )
    return parts.crossJoin(orders).select(
        "exact_parts",
        "exact_orders",
        (
            F.abs(F.col("_ap") - F.col("exact_parts"))
            <= F.lit(tol) * F.col("exact_parts")
        ).alias("parts_within_2pct"),
        (
            F.abs(F.col("_ao") - F.col("exact_orders"))
            <= F.lit(tol) * F.col("exact_orders")
        ).alias("orders_within_2pct"),
    )


@register(
    "rollup_agg",
    tags=("O-10",),
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       (floor((SUM(l_quantity)) * 10000.0 + 0.5) / 10000.0) AS sum_qty,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP aggregation (O-10). Spark plans one Expand +
    hash-agg pass, not N scans. (Fixture flags are never NULL, so COALESCE
    labels only subtotal rows.)"""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(
            r4(F.sum("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@register(
    "cube_agg",
    tags=("O-10",),
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL')   AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (O-10)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            # Exact decimal sum: at sf>=0.1 the global cell sums ~1e10 where
            # 4-dp double rounding is no longer tie-stable across engines;
            # DECIMAL(18,2) is exact and identical everywhere (cents < 2^53).
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "sum_price",
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "join_star_revenue",
    tags=("O-11",),
    oracle="""
SELECT r_name, n_name,
       (floor((SUM(o_totalprice)) * 10000.0 + 0.5) / 10000.0) AS nation_revenue,
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema equi-join chain (O-11): fact orders joined to customer →
    nation → region with explicit broadcast hints on the dimensions, so only
    the fact-side shuffle for the final aggregation remains. At 100 TB:
    identical plan — dims stay broadcast-able by construction."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            r4(F.sum("o_totalprice")).alias("nation_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "join_left_outer",
    tags=("O-11", "F5"),
    oracle="""
SELECT c_custkey,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
       (floor((COALESCE(SUM(o_totalprice), 0.0)) * 10000.0 + 0.5) / 10000.0) AS total_spend
FROM customer
LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving customers with zero orders (O-11), with the
    reference's null→0 guard (F5, restart.sh:52-63) on the aggregate."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            r4(F.coalesce(F.sum("o_totalprice"), F.lit(0.0))).alias(
                "total_spend"
            ),
        )
    )


@register(
    "join_full_outer",
    tags=("O-11", "O-15"),
    oracle="""
SELECT COALESCE(c.nk, s.nk) AS nationkey,
       COALESCE(c.n_customers, 0) AS n_customers,
       COALESCE(s.n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY 1) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) s
ON c.nk = s.nk
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join of two pre-aggregated sides (O-11): aggregate-then-join
    keeps the join inputs tiny — the scale-correct order (never join raw fact
    tables then aggregate when the agg can be pushed below the join)."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    j = c.join(s, "nk", "full")
    return j.select(
        F.col("nk").alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@register(
    "semi_join_customers",
    tags=("O-12",),
    oracle="""
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (O-12): customers with at least one order. Semi joins
    never duplicate the left side — no post-join distinct needed."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "anti_join_customers",
    tags=("O-12",),
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (O-12): customers with no orders — the set-difference
    probe the reference approximates with its empty-result guard (E1,
    putmedia_check2.sh:16-19)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "range_join_shipping",
    tags=("O-13",),
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n_late_lines,
       (floor((AVG(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)))) * 10000.0 + 0.5) / 10000.0) AS avg_lag_days
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
GROUP BY o_orderpriority
""",
)
def range_join_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range join (O-13): lines shipped more than 60 days after their
    order date. The equi key carries the shuffle; the range predicate is a
    cheap post-join filter — the scale-correct shape for theta conditions
    that ride an equi key."""
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lag_days = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.to_date("l_shipdate") > F.date_add(F.to_date("o_orderdate"), 60))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_late_lines"),
            r4(F.avg(lag_days.cast("double"))).alias("avg_lag_days"),
        )
    )


@register(
    "set_ops_nations",
    tags=("O-15",),
    oracle="""
SELECT 'both' AS tag, nk FROM (
  SELECT DISTINCT c_nationkey AS nk FROM customer
  INTERSECT
  SELECT DISTINCT s_nationkey AS nk FROM supplier
)
UNION ALL
SELECT 'customer_only' AS tag, nk FROM (
  SELECT DISTINCT c_nationkey AS nk FROM customer
  EXCEPT
  SELECT DISTINCT s_nationkey AS nk FROM supplier
)
UNION ALL
SELECT 'supplier_only' AS tag, nk FROM (
  SELECT DISTINCT s_nationkey AS nk FROM supplier
  EXCEPT
  SELECT DISTINCT c_nationkey AS nk FROM customer
)
""",
)
def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations (O-15): INTERSECT / EXCEPT / UNION ALL over the nation
    keys present on each side, tagged by provenance."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk")).distinct()
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk")).distinct()
    both = c.intersect(s).select(F.lit("both").alias("tag"), "nk")
    c_only = c.exceptAll(s).select(F.lit("customer_only").alias("tag"), "nk")
    s_only = s.exceptAll(c).select(F.lit("supplier_only").alias("tag"), "nk")
    return both.unionByName(c_only).unionByName(s_only)


# ---------------------------------------------------------------------------
# Subqueries (O-35) — via Spark SQL so Catalyst decorrelates
# ---------------------------------------------------------------------------


@register(
    "scalar_subquery",
    tags=("O-35",),
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
""",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (O-35): orders above 1.5× the global average price.
    Catalyst plans the scalar as a one-row broadcast, not a per-row probe."""
    io.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
        """
    )


@register(
    "in_subquery",
    tags=("O-35",),
    oracle="""
SELECT c_custkey, c_nationkey
FROM customer
WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
""",
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (O-35): customers in ASIA-region nations; Catalyst rewrites
    to a semi join against the broadcast dimension."""
    io.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_nationkey
        FROM customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 2)
        """
    )


@register(
    "exists_correlated",
    tags=("O-35",),
    oracle="""
SELECT s_suppkey, s_name
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_suppkey = s.s_suppkey AND l.l_extendedprice > 90000
)
""",
)
def exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (O-35): Catalyst decorrelates to a semi join — no
    per-row re-execution of the inner query."""
    io.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier s
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_suppkey = s.s_suppkey AND l.l_extendedprice > 90000
        )
        """
    )


# ---------------------------------------------------------------------------
# Scalar-function breadth (O-23..O-27, O-02)
# ---------------------------------------------------------------------------


@register(
    "string_funcs",
    tags=("O-23",),
    oracle="""
SELECT doc_id,
       upper(substr(text, 1, 12))                    AS head_upper,
       CAST(length(text) AS BIGINT)                  AS n_chars_fn,
       CAST(len(string_split(text, ' ')) AS BIGINT)  AS n_tokens,
       regexp_extract(text, '^[a-z]+')               AS first_word,
       trim(concat(lang, ' ', source))               AS lang_source,
       contains(text, 'spark')                       AS mentions_spark
FROM documents
""",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function breadth (O-23) over documents: case, substring, length,
    split, regexp extraction, trim/concat, substring containment (F4)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 12)).alias("head_upper"),
        F.length("text").cast("long").alias("n_chars_fn"),
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.regexp_extract("text", "^[a-z]+", 0).alias("first_word"),
        F.trim(F.concat(F.col("lang"), F.lit(" "), F.col("source"))).alias(
            "lang_source"
        ),
        F.col("text").contains("spark").alias("mentions_spark"),
    )


@register(
    "datetime_funcs",
    tags=("O-24", "T1", "T2", "T3"),
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT)    AS order_year,
       CAST(month(o_orderdate) AS BIGINT)   AS order_month,
       CAST(epoch_us(date_trunc('month', o_orderdate)) // 1000000 AS BIGINT) AS month_start_epoch,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_95,
       CAST(epoch_us(o_orderdate + INTERVAL 30 DAY) // 1000000 AS BIGINT)   AS due_epoch
FROM orders
""",
)
def datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time breadth (O-24): extraction, truncation, date difference and
    interval arithmetic (T2: `now - 60`, putmedia_check.sh:21)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.unix_timestamp(F.date_trunc("month", F.col("o_orderdate"))).alias(
            "month_start_epoch"
        ),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_95"),
        F.unix_timestamp(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        ).alias("due_epoch"),
    )


@register(
    "math_funcs",
    tags=("O-25", "C1"),
    oracle="""
SELECT l_orderkey, l_linenumber,
       (floor((sqrt(l_extendedprice)) * 10000.0 + 0.5) / 10000.0)      AS price_sqrt,
       (floor((abs(l_discount - 0.05)) * 10000.0 + 0.5) / 10000.0)     AS disc_dev,
       CAST(floor(l_quantity) AS BIGINT)    AS qty_floor,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       (floor((power(l_tax + 1.0, 2)) * 10000.0 + 0.5) / 10000.0)      AS tax_sq
FROM lineitem
""",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function breadth (O-25): sqrt/abs/floor/ceil/power + rounding."""
    l = _t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        r4(F.sqrt("l_extendedprice")).alias("price_sqrt"),
        r4(F.abs(F.col("l_discount") - 0.05)).alias("disc_dev"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        r4(F.pow(F.col("l_tax") + 1.0, 2)).alias("tax_sq"),
    )


@register(
    "json_extract",
    tags=("O-02", "J1"),
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       json_extract_string(props, '$.k') AS k_text
FROM events
""",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column decode (O-02): both the ad-hoc path extraction
    (`get_json_object` ~ jq paths, putmedia_check.sh:6) and the typed
    `from_json` decode into a struct (J1)."""
    e = _t(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_value"),
        F.get_json_object("props", "$.k").alias("k_text"),
    )


@register(
    "struct_map_funcs",
    tags=("O-27",),
    oracle="""
SELECT c_custkey,
       c_name       AS name_from_struct,
       c_mktsegment AS seg_from_map,
       (floor((c_acctbal) * 10000.0 + 0.5) / 10000.0) AS bal_from_struct
FROM customer
""",
)
def struct_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/map construction + field access (O-27): pack columns into a
    struct and a map, then extract — the typed twin of the reference's nested
    JSON traversal (`StreamInfoList[]`, putmedia_check.sh:6)."""
    c = _t(spark, sf_dir, "customer")
    packed = c.select(
        "c_custkey",
        F.struct(F.col("c_name").alias("name"), F.col("c_acctbal").alias("bal")).alias(
            "info"
        ),
        F.create_map(F.lit("seg"), F.col("c_mktsegment")).alias("attrs"),
    )
    return packed.select(
        "c_custkey",
        F.col("info.name").alias("name_from_struct"),
        F.element_at(F.col("attrs"), "seg").alias("seg_from_map"),
        r4(F.col("info.bal")).alias("bal_from_struct"),
    )


@register(
    "array_funcs",
    tags=("O-26",),
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       embedding[1] AS first_component,
       (floor((sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) * 10000.0 + 0.5) / 10000.0) AS l2_norm,
       label IN (0, 1, 2) AS low_label
FROM embeddings
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order functions (O-26): size, element_at, and an
    aggregate-fold L2 norm over the embedding column — the JVM-side building
    block of the similarity operators (O-30), no Python crossing."""
    e = _t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).alias("first_component"),
        r4(F.sqrt(sq_sum)).alias("l2_norm"),
        F.col("label").isin(0, 1, 2).alias("low_label"),
    )
