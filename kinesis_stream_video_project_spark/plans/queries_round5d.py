"""Round-5d additions: graph analytics (triangles, deterministic integer
PageRank, lift-ranked co-occurrence), the containment near-dup tier, and
exact-arithmetic statistics (rolling z-score anomalies, per-group Pearson
correlation, per-group OLS trend slope).

Determinism discipline (SURVEY.md §5.2): graph and anomaly queries stay in
integer/decimal arithmetic end to end; the two regression-style queries
accumulate scaled-integer DECIMAL(38,0) sums (order-independent, exact)
and only convert the final handful of exact decimals to double for the
closed-form corr/slope expression — identical IEEE ops on identical inputs
in both engines, then ``r4`` rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.functions.numeric import (
    r4,
    scaled_long,
    sql_r4,
    sql_scaled_long,
)
from kinesis_stream_video_project_spark.operators import dedup, graph, stats
from kinesis_stream_video_project_spark.plans.registry import register

# Shared oracle CTE: the distinct co-purchase edge list (p1 < p2) that the
# graph queries build on — mirrors graph.copurchase_edges.
_EDGES_CTE = """
li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)"""


@register(
    "triangle_count_copurchase",
    tags=("NS-graph", "O-11"),
    oracle=f"""
WITH {_EDGES_CTE},
deg AS (
  SELECT p, COUNT(*) AS d
  FROM (SELECT p1 AS p FROM e UNION ALL SELECT p2 FROM e)
  GROUP BY p
),
o AS (
  SELECT CASE WHEN (da.d, e.p1) < (db.d, e.p2) THEN e.p1 ELSE e.p2 END AS src,
         CASE WHEN (da.d, e.p1) < (db.d, e.p2) THEN e.p2 ELSE e.p1 END AS dst,
         CASE WHEN (da.d, e.p1) < (db.d, e.p2) THEN db.d ELSE da.d END AS dd
  FROM e JOIN deg da ON da.p = e.p1 JOIN deg db ON db.p = e.p2
)
SELECT (SELECT COUNT(*) FROM deg) AS n_nodes,
       (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT COUNT(*)
        FROM o o1
        JOIN o o2 ON o1.src = o2.src AND (o1.dd, o1.dst) < (o2.dd, o2.dst)
        JOIN o o3 ON o3.src = o1.dst AND o3.dst = o2.dst) AS n_triangles
""",
)
def triangle_count_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count of the part co-purchase graph — the clustering
    signal of the co-occurrence structure (how often do two parts that
    each co-sell with a third also co-sell with each other).

    Degree-ordered orientation bounds the work at O(|E|^1.5); the Spark
    side is the edge-iterator form (array_intersect over bounded
    adjacency lists — no materialized wedge shuffle) while the oracle
    keeps the definitional wedge join, whose pair enumeration MUST use
    the same (degree, id) tuple order as the orientation or ~half the
    closing edges are looked up backwards. Both derivations are pinned
    against a brute-force three-join count in tests/test_round5d.py (see
    operators/graph.py for the full argument). All counts integer →
    hash-exact."""
    # localCheckpoint the 16 B/row edge list ONCE (the neighbor_jaccard
    # r9 discipline): triangle_count consumes it from FOUR subtrees
    # (degrees, orientation, both adjacency sides, edge count) and the
    # distinct-flavored aggregate below it defeats ReuseExchange —
    # without staging, every subtree re-derives the basket pair explode
    # from the lineitem scan (measured 4.7 → 3.4 s cons+mat at sf0.1 —
    # the remainder is triangle_count's own orientation/intersect work).
    edges = graph.copurchase_edges(
        io.load_table(spark, sf_dir, "lineitem")
    ).localCheckpoint()
    return graph.triangle_count(edges)


@register(
    "pagerank_copurchase_topk",
    tags=("NS-graph", "O-11", "O-08"),
    oracle=f"""
WITH {_EDGES_CTE},
b AS (SELECT p1 AS src, p2 AS dst FROM e UNION ALL SELECT p2, p1 FROM e),
deg AS (SELECT src, COUNT(*) AS d FROM b GROUP BY src),
r0 AS (SELECT src AS p, CAST(10000000000 AS BIGINT) AS r FROM deg),
r1 AS (
  SELECT b.dst AS p,
         CAST(1500000000 + SUM((85 * r0.r) // (100 * deg.d)) AS BIGINT) AS r
  FROM b JOIN deg ON deg.src = b.src JOIN r0 ON r0.p = b.src
  GROUP BY b.dst
),
r2 AS (
  SELECT b.dst AS p,
         CAST(1500000000 + SUM((85 * r1.r) // (100 * deg.d)) AS BIGINT) AS r
  FROM b JOIN deg ON deg.src = b.src JOIN r1 ON r1.p = b.src
  GROUP BY b.dst
),
r3 AS (
  SELECT b.dst AS p,
         CAST(1500000000 + SUM((85 * r2.r) // (100 * deg.d)) AS BIGINT) AS r
  FROM b JOIN deg ON deg.src = b.src JOIN r2 ON r2.p = b.src
  GROUP BY b.dst
)
SELECT p AS part_id, r AS rank_scaled
FROM r3 ORDER BY r DESC, p LIMIT 20
""",
)
def pagerank_copurchase_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by deterministic integer PageRank (3 iterations,
    damping 0.85, ranks scaled by 10^10) over the co-purchase graph.

    Base 10^10, not the operator default 10^12 (r6): the enforced
    overflow guard refuses past 85·|V|·base — 10^12 clears only
    |V| ≈ 10^5 (sf ~0.5 of this fixture's part population) where 10^10
    holds to |V| ≈ 10^7 (sf ~50); the query keeps availability headroom
    at two orders of magnitude of scale for a 10^-10 relative rank
    quantization nobody can observe at top-20 granularity.

    Bit-stable cross-engine by construction: scaled-BIGINT ranks,
    truncating integer division per contribution (Spark ``div`` ≡ DuckDB
    ``//`` on non-negative operands), integer sums — the oracle unrolls
    the identical recurrence as three chained CTEs (the unrolled-Lloyd
    move from ivf_kmeans_topk). Limit is preceded by the (rank DESC, part)
    total order. Scale: 2 exchanges per iteration, both keyed on the node
    id; no driver-side collect (see operators/graph.py)."""
    edges = graph.copurchase_edges(io.load_table(spark, sf_dir, "lineitem"))
    ranks = graph.pagerank_int(edges, iters=3, base=10**10)
    return (
        ranks.orderBy(F.col("rank_scaled").desc(), F.col("p").asc())
        .limit(20)
        .select(F.col("p").alias("part_id"), "rank_scaled")
    )


@register(
    "copurchase_lift_pairs",
    tags=("NS-itemset", "O-08", "O-11"),
    oracle=f"""
WITH {_EDGES_CTE},
pc AS (SELECT l_partkey, COUNT(*) AS n_part FROM li GROUP BY 1),
tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_tot FROM li)
SELECT e.p1, e.p2, e.n_orders AS pair_orders,
       tot.n_tot * e.n_orders AS lift_num,
       a.n_part * b.n_part AS lift_den
FROM e
JOIN pc a ON a.l_partkey = e.p1
JOIN pc b ON b.l_partkey = e.p2
CROSS JOIN tot
ORDER BY pair_orders DESC, e.p1, e.p2
LIMIT 20
""",
)
def copurchase_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association strength: the 20 most co-purchased part
    pairs with exact-rational lift — lift(a,b) = P(a,b)/(P(a)P(b)) carried
    as the integer pair (N·n_ab, n_a·n_b) instead of a float, so the hash
    match is exact and the consumer can compare lifts by cross-multiplying.

    Shape: ONE order-grouped part-set aggregate feeds all three inputs —
    the pair counts (row-local pair explode), the per-part order counts
    (explode of the same sets), and the 1-row corpus total (count of the
    sets) — so the identical exchange subtree is shared (ReusedExchange)
    instead of re-scanning lineitem three ways; then two part-frequency
    joins, a broadcast 1-row total (the sanctioned broadcast-scalar
    crossJoin), and TakeOrderedAndProject over the (support DESC, p1, p2)
    total order. At 100 TB the pair aggregate is the dominant shuffle and
    is exactly the frequent-pair counting pass of apriori; a support
    floor would precede the joins."""
    sets = graph.order_part_sets(io.load_table(spark, sf_dir, "lineitem"))
    edges = graph.edges_from_sets(sets)
    pc = (
        sets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_part"))
    )
    tot = sets.agg(F.count(F.lit(1)).alias("n_tot"))
    return (
        edges.join(pc.withColumnRenamed("l_partkey", "p1"), "p1")
        .withColumnRenamed("n_part", "n_a")
        .join(
            pc.withColumnRenamed("l_partkey", "p2").withColumnRenamed(
                "n_part", "n_b"
            ),
            "p2",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "p1",
            "p2",
            F.col("n_orders").alias("pair_orders"),
            (F.col("n_tot") * F.col("n_orders")).alias("lift_num"),
            (F.col("n_a") * F.col("n_b")).alias("lift_den"),
        )
        .orderBy(F.col("pair_orders").desc(), "p1", "p2")
        .limit(20)
    )


@register(
    "containment_near_dup",
    tags=("O-29", "NS-dedup"),
    oracle="""
WITH toks AS (
  SELECT doc_id, source, lang,
         unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ninter
  FROM toks a
  JOIN toks b ON a.tok = b.tok AND a.source = b.source AND a.lang = b.lang
             AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, sa.n AS n_a, sb.n AS n_b,
       {c} AS containment
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE {c} >= 0.9
""".format(c=sql_r4("CAST(ninter AS DOUBLE) / least(sa.n, sb.n)")),
)
def containment_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment tier of the dedup ladder: token-set
    containment |A∩B| / min(|A|,|B|) ≥ 0.9 within (source, lang) blocks —
    catches doc-inside-doc duplication (boilerplate headers, quoted
    reposts) that Jaccard's union denominator dilutes to invisibility.

    Same postings plan discipline as the Jaccard tier (one (block, tok)
    exchange shared by the pair join and the sizes aggregate); see
    operators/dedup.py:blocked_containment_near_dups."""
    d = io.load_table(spark, sf_dir, "documents")
    return dedup.blocked_containment_near_dups(d, threshold=0.9, shingle_k=1)


# Module-level constant: curation_pipeline_v3 (plans/queries_round6.py)
# composes this identical window-inequality replay into its oracle.
ZSCORE_ORACLE = """
WITH v AS (
  SELECT event_id, user_id,
         {vu} AS value_micro, ts
  FROM events WHERE value IS NOT NULL
),
w AS (
  SELECT event_id, user_id, value_micro,
         COUNT(*) OVER win AS n,
         SUM(CAST(value_micro AS DECIMAL(38,0))) OVER win AS s,
         SUM(CAST(value_micro AS DECIMAL(38,0)) * value_micro) OVER win AS q
  FROM v
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, value_micro
FROM w
WHERE n >= 10
  AND (n * value_micro - s) * (n * value_micro - s) > 9 * (n * q - s * s)
""".format(vu=sql_scaled_long("value", 1000000))


@register(
    "rolling_zscore_anomalies",
    tags=("NS-timeseries", "O-16"),
    oracle=ZSCORE_ORACLE,
)
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly detection: flag events whose value sits
    more than 3 population-σ from the mean of their user's last 20
    observations — the online health-alert twin of the reference's
    threshold checks (`putmedia_check.sh:26-34` alarms on a fixed bound;
    this is the adaptive per-entity version).

    Exactness: values are scaled to integer micro-units once (the only
    rounding; round-half identical on the same IEEE product), then the
    z-test is the cross-multiplied integer inequality
    (n·v − S)² > 9·(n·Q − S²) — no mean, no sqrt, no float σ, so both
    engines agree bit-for-bit. Sums are DECIMAL(38,0): (n·v − S)² peaks
    ~1e20, past BIGINT.

    Scale: ONE exchange (user_id window partition); the 20-row trailing
    frame is bounded state per row (operators/stats.py). Null values are
    filtered BEFORE scaling on both sides — the streaming twin
    (streaming/jobs.py::zscore_stream) drops them too, so the
    batch==stream flag-set equality holds on null-bearing feeds. The
    streaming twin rides applyInPandasWithState with a 20-deep per-user
    integer deque."""
    e = io.load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    v = e.select(
        "event_id",
        "user_id",
        scaled_long(F.col("value"), 1000000).alias("value_micro"),
        "ts",
    )
    return stats.rolling_zscore_flags(
        v,
        key_col="user_id",
        order_cols=("ts", "event_id"),
        value_col="value_micro",
        window_rows=20,
        min_rows=10,
        z=3,
    ).select("event_id", "user_id", "value_micro")


@register(
    "corr_acctbal_price_by_nation",
    tags=("NS-stats", "O-08", "O-11"),
    oracle="""
WITH j AS (
  SELECT c.c_nationkey,
         {x} AS x,
         {y} AS y
  FROM customer c JOIN orders o ON c_custkey = o_custkey
),
s AS (
  SELECT c_nationkey, COUNT(*) AS n_pairs,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
         SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy,
         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy
  FROM j GROUP BY c_nationkey
)
SELECT c_nationkey, n_pairs,
       {c} AS corr
FROM s
""".format(
        x=sql_scaled_long("c_acctbal", 100),
        y=sql_scaled_long("o_totalprice", 100),
        c=sql_r4(
            "CAST(n_pairs*sxy - sx*sy AS DOUBLE)"
            " / sqrt(CAST(n_pairs*sxx - sx*sx AS DOUBLE)"
            " * CAST(n_pairs*syy - sy*sy AS DOUBLE))"
        )
    ),
)
def corr_acctbal_price_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Pearson correlation of customer balance vs order price —
    exact-arithmetic `corr()`: the built-in aggregate is a running double
    sum whose value depends on partitioning, so it can never hash-match
    cross-engine. Instead: scale to integer cents once, accumulate the
    five moment sums as DECIMAL(38,0) (exact, order-free), and evaluate
    the closed form on the final exact decimals in double — identical IEEE
    ops on identical inputs, then r4.

    Shape: one custkey join (AQE picks broadcast at small SF, SMJ at
    scale), one partial-combine aggregate on nationkey (operators/stats.py
    pearson_corr_exact — the same scaled-integer discipline as
    surprisal_score)."""
    c = io.load_table(spark, sf_dir, "customer")
    o = io.load_table(spark, sf_dir, "orders")
    j = c.join(o, c["c_custkey"] == o["o_custkey"]).select(
        "c_nationkey",
        scaled_long(F.col("c_acctbal"), 100).alias("x"),
        scaled_long(F.col("o_totalprice"), 100).alias("y"),
    )
    s = stats.pearson_corr_exact(j, "c_nationkey", "x", "y")
    return s.select("c_nationkey", "n_pairs", r4(F.col("corr")).alias("corr"))


@register(
    "trend_slope_per_type",
    tags=("NS-stats", "O-08", "O-24"),
    oracle="""
WITH v AS (
  SELECT event_type, epoch_us(ts) AS us,
         {vu} AS vu
  FROM events
),
m AS (SELECT event_type, MIN(us) AS mn FROM v GROUP BY event_type),
x AS (
  SELECT v.event_type, v.us - m.mn AS xs, vu
  FROM v JOIN m ON v.event_type = m.event_type
),
s AS (
  SELECT event_type, COUNT(*) AS n_events,
         SUM(CAST(xs AS DECIMAL(38,0))) AS sx,
         SUM(CAST(vu AS DECIMAL(38,0))) AS sy,
         SUM(CAST(xs AS DECIMAL(38,0)) * xs) AS sxx,
         SUM(CAST(xs AS DECIMAL(38,0)) * vu) AS sxy
  FROM x GROUP BY event_type
)
SELECT event_type, n_events,
       {c} AS slope_per_day
FROM s
""".format(
        vu=sql_scaled_long("value", 1000000),
        c=sql_r4(
            "(CAST(n_events*sxy - sx*sy AS DOUBLE)"
            " / CAST(n_events*sxx - sx*sx AS DOUBLE)) * 86400.0"
        )
    ),
)
def trend_slope_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of the metric over time (units/day) — the
    drift-detection primitive a data pipeline runs over quality metrics
    (is error rate trending up?). Same exact-moments discipline as the
    correlation query: integer µs x (re-based to the per-type min so x²
    sums stay ≤ ~1e32), integer micro-unit y, DECIMAL(38,0) sums, closed
    form on exact decimals in double, r4. The per-type minimum comes from
    a tiny broadcast aggregate, not a window over the events.

    Shape: one partial-combine min aggregate (|types| rows, broadcast
    back) + one moment aggregate on event_type. Two exchanges, no window."""
    e = io.load_table(spark, sf_dir, "events")
    v = e.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        scaled_long(F.col("value"), 1000000).alias("vu"),
    )
    m = v.groupBy("event_type").agg(F.min("us").alias("mn"))
    x = v.join(F.broadcast(m), "event_type").select(
        "event_type", (F.col("us") - F.col("mn")).alias("xs"), "vu"
    )
    s = stats.ols_slope_exact(x, "event_type", "xs", "vu")
    return s.select(
        "event_type",
        F.col("n").alias("n_events"),
        r4(F.col("slope") * F.lit(86400.0)).alias("slope_per_day"),
    )
