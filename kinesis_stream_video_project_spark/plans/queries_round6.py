"""Round-6 registrations: the round-5 operator queue promoted to
driver-checked queries (VERDICT r5 item 1) — label-propagation
communities, k-core decomposition, robust median/MAD statistics, exact
winsorization, the column-profile drift report, the batch twin of the
silence detector, weighted integer PageRank — plus curation_pipeline_v3,
the composition proof that the round-5 detector families (rolling
z-score, CUSUM, robust center/spread) gate one pipeline on a shared
partitioning discipline.

Determinism discipline (SURVEY.md §5.2): every query here is integer /
string / boolean end to end except the two emitted means, which divide
two exact integers as the final op (identical IEEE division on identical
inputs) and round via the portable ``r4``. Oracle CTE chains that
reference a previous round twice (k-core peels, LPA label tables,
PageRank iterations) are ``AS MATERIALIZED`` — DuckDB inlines CTEs by
default, so an 8-round peel would otherwise re-derive the edge pipeline
2^8 times (measured 46 s → 0.3 s at sf0.001).
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
from kinesis_stream_video_project_spark.operators import graph, profiling, stats
from kinesis_stream_video_project_spark.plans.queries_round5d import (
    ZSCORE_ORACLE,
    rolling_zscore_anomalies,
)
from kinesis_stream_video_project_spark.plans.queries_round5e import (
    CUSUM_ORACLE,
    cusum_changepoints,
)
from kinesis_stream_video_project_spark.plans.registry import register

# Shared oracle CTE: the distinct co-purchase edge list (p1 < p2) —
# mirrors graph.copurchase_edges (same fragment as queries_round5d).
_EDGES_CTE = """
li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)"""

# Weighted PageRank base: 10^9, well under the operator default 10^12 —
# the enforced bound is 85·|V|·base·max(w); the fixture co-purchase graph
# has |V| = 2·10^5·sf and max weight ≤ 5, so 10^9 clears the guard to
# |V| ≈ 2·10^7 (sf ~100) where 10^12 would refuse already at sf0.1.
# Same availability-over-unobservable-resolution trade as
# pagerank_copurchase_topk's base 10^10 (queries_round5d.py, r6 note).
_WPR_BASE = 10**9


@register(
    "weighted_pagerank_topk",
    tags=("NS-graph", "O-11", "O-08"),
    oracle=f"""
WITH {_EDGES_CTE},
b AS MATERIALIZED (
  SELECT p1 AS src, p2 AS dst, n_orders AS w FROM e
  UNION ALL SELECT p2, p1, n_orders FROM e
),
deg AS MATERIALIZED (SELECT src, SUM(w) AS d FROM b GROUP BY src),
r0 AS (SELECT src AS p, CAST({_WPR_BASE} AS BIGINT) AS r FROM deg),
r1 AS MATERIALIZED (
  SELECT b.dst AS p,
         CAST({15 * _WPR_BASE // 100} + SUM((85 * r0.r * b.w) // (100 * deg.d)) AS BIGINT) AS r
  FROM b JOIN deg ON deg.src = b.src JOIN r0 ON r0.p = b.src
  GROUP BY b.dst
),
r2 AS MATERIALIZED (
  SELECT b.dst AS p,
         CAST({15 * _WPR_BASE // 100} + SUM((85 * r1.r * b.w) // (100 * deg.d)) AS BIGINT) AS r
  FROM b JOIN deg ON deg.src = b.src JOIN r1 ON r1.p = b.src
  GROUP BY b.dst
),
r3 AS (
  SELECT b.dst AS p,
         CAST({15 * _WPR_BASE // 100} + SUM((85 * r2.r * b.w) // (100 * deg.d)) AS BIGINT) AS r
  FROM b JOIN deg ON deg.src = b.src JOIN r2 ON r2.p = b.src
  GROUP BY b.dst
)
SELECT p AS part_id, r AS rank_scaled
FROM r3 ORDER BY r DESC, p LIMIT 20
""",
)
def weighted_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by WEIGHTED integer PageRank over the co-purchase
    graph: an edge bought together in w orders carries w "slots" of its
    endpoints' mass — contribution (85·r·w) div (100·Σw), the same
    truncating-integer discipline as pagerank_copurchase_topk (uniform
    weights reduce exactly to the unweighted form, pinned in
    tests/test_round5d.py).

    Differs from the unweighted query in base (10^9 — see _WPR_BASE:
    the overflow guard enforces 85·|V|·base·max(w) < 2^63, and the
    weighted worst case is max(w)× the unweighted one) and in ranking:
    multiplicity-weighted centrality surfaces parts that co-sell OFTEN
    with popular parts over parts that co-sell once with many.

    Scale: identical loop shape to the unweighted form — adjacency
    materialized once, broadcast rank vector, ONE exchange per iteration
    (drop broadcast_ranks past 10^8 nodes)."""
    edges = graph.copurchase_edges(io.load_table(spark, sf_dir, "lineitem"))
    ranks = graph.pagerank_int(
        edges, iters=3, base=_WPR_BASE, weight_col="n_orders"
    )
    return (
        ranks.orderBy(F.col("rank_scaled").desc(), F.col("p"))
        .limit(20)
        .select(F.col("p").alias("part_id"), "rank_scaled")
    )


@register(
    "lpa_communities",
    tags=("NS-graph", "O-11", "O-16"),
    oracle=f"""
WITH {_EDGES_CTE},
b AS MATERIALIZED (
  SELECT p1 AS src, p2 AS dst FROM e UNION ALL SELECT p2, p1 FROM e
),
l0 AS MATERIALIZED (SELECT DISTINCT src AS p, src AS community FROM b),
c1 AS (
  SELECT b.dst AS p, l.community, COUNT(*) AS c
  FROM b JOIN l0 l ON l.p = b.src GROUP BY 1, 2
),
l1 AS MATERIALIZED (
  SELECT p, community FROM (
    SELECT p, community,
           row_number() OVER (PARTITION BY p ORDER BY c DESC, community) AS rn
    FROM c1
  ) WHERE rn = 1
),
c2 AS (
  SELECT b.dst AS p, l.community, COUNT(*) AS c
  FROM b JOIN l1 l ON l.p = b.src GROUP BY 1, 2
),
l2 AS (
  SELECT p, community FROM (
    SELECT p, community,
           row_number() OVER (PARTITION BY p ORDER BY c DESC, community) AS rn
    FROM c2
  ) WHERE rn = 1
)
SELECT community, CAST(COUNT(*) AS BIGINT) AS n_members
FROM l2 GROUP BY community
ORDER BY n_members DESC, community LIMIT 20
""",
)
def lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 label-propagation communities of the co-purchase graph by
    size — the template-cluster / canonical-document grouping a curation
    pipeline runs on co-occurrence structure. Two synchronous LPA rounds
    (every node starts self-labeled; each round adopts the most frequent
    neighbor label, ties to the smaller label — the deterministic-MODE
    tie-break that replaces textbook LPA's random choice, so the oracle
    can unroll the identical recurrence).

    Scale: per round ONE join of the |V|-row label vector (broadcast —
    parameterized off past broadcast limits) onto the once-materialized
    directed edge list + a (dst, label) count + a per-dst argmax window
    whose input is |dst × distinct neighbor labels|, not |E|. Final
    community sizing is one aggregate + TakeOrderedAndProject."""
    edges = graph.copurchase_edges(io.load_table(spark, sf_dir, "lineitem"))
    labels = graph.label_propagation(edges, iters=2)
    return (
        labels.groupBy("community")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy(F.col("n_members").desc(), F.col("community"))
        .limit(20)
    )


# k-core threshold: 65 keeps the core non-degenerate at every fixture SF
# (188 / 1 992 / 19 845 survivors at sf0.001/0.01/0.1) while still
# peeling real work (12 / 8 / 155 nodes over ≤4 rounds) — k=80 would
# peel to EMPTY at sf0.001 (the r3 empty==empty trap), k≤60 peels
# almost nothing. The oracle unrolls 8 peels: peeling is monotone and
# idempotent after convergence, and convergence depth ≤ 4 at every SF
# (measured; the Spark side RAISES past max_iters rather than returning
# a non-fixed-point, so a depth blow-out surfaces as an error, never a
# silent hash mismatch).
_KCORE_K = 65


def _peel_cte(i: int) -> str:
    return f"""a{i} AS MATERIALIZED (
  SELECT src AS p FROM b
  WHERE src IN (SELECT p FROM a{i - 1}) AND dst IN (SELECT p FROM a{i - 1})
  GROUP BY src HAVING COUNT(*) >= {_KCORE_K}
)"""


def kcore_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The {k}-core of the co-purchase graph — the unique maximal
    induced subgraph where every part co-sells with ≥ {k} others
    inside the subgraph; the standard dense-cohort extraction (fixed
    point of repeated low-degree peeling, order-independent so no
    tie-breaking enters the cross-engine argument).

    Scale: each peel round is one semi-join of the once-materialized
    edge list onto the (broadcast) alive set + a degree aggregate;
    rounds are bounded by peel depth and the alive set is
    localCheckpoint'd per round (operators/graph.py loop discipline).
    Construction is EAGER (per-round convergence probes) — bench.py
    times construction + materialization in one span, like
    dup_clusters."""
    edges = graph.copurchase_edges(io.load_table(spark, sf_dir, "lineitem"))
    core = graph.kcore(edges, _KCORE_K, max_iters=30)
    return core.select(F.col("p").alias("part_id"))


# Docstrings can't be f-strings, and register() snapshots __doc__ at
# decoration — so fill the {k} placeholders first, then register (keeps
# the threshold single-sourced in _KCORE_K; QUERIES.md renders the real
# number).
kcore_parts.__doc__ = kcore_parts.__doc__.format(k=_KCORE_K)
kcore_parts = register(
    "kcore_parts",
    tags=("NS-graph", "O-11"),
    oracle=f"""
WITH {_EDGES_CTE},
b AS MATERIALIZED (
  SELECT p1 AS src, p2 AS dst FROM e UNION ALL SELECT p2, p1 FROM e
),
a0 AS MATERIALIZED (SELECT DISTINCT src AS p FROM b),
{",".join(_peel_cte(i) for i in range(1, 9))}
SELECT p AS part_id FROM a8
""",
)(kcore_parts)


_VU = sql_scaled_long("value", 1000000)

# Exact lower-median walk over distinct (group, value) counts — the
# weighted_median_price / interarrival pattern, parameterized so the
# robust-stats oracles can chain it (value → median, |value−median| →
# MAD) without repeating the window SQL.
_MEDIAN_WALK = """
{cnt} AS (SELECT event_type, {val} AS v, COUNT(*) AS w FROM {src} GROUP BY 1, 2),
{cum} AS (
  SELECT event_type, v,
         SUM(w) OVER (PARTITION BY event_type ORDER BY v) AS cw,
         SUM(w) OVER (PARTITION BY event_type) AS tw
  FROM {cnt}
),
{out} AS (
  SELECT event_type, MIN(CASE WHEN 2 * cw >= tw THEN v END) AS {col}
  FROM {cum} GROUP BY event_type
)"""


@register(
    "robust_value_stats",
    tags=("NS-stats", "O-08", "O-16"),
    oracle=f"""
WITH vu AS (
  SELECT event_type, {_VU} AS vu FROM events WHERE value IS NOT NULL
),
{_MEDIAN_WALK.format(src="vu", val="vu", cnt="mc", cum="mw", out="med", col="med")},
dev AS (
  SELECT v.event_type, ABS(v.vu - m.med) AS dv
  FROM vu v JOIN med m USING (event_type)
),
{_MEDIAN_WALK.format(src="dev", val="dv", cnt="dc", cum="dw", out="mad", col="mad")},
n AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows FROM vu GROUP BY 1)
SELECT n.event_type, med.med, mad.mad, n.n_rows
FROM n JOIN med USING (event_type) JOIN mad USING (event_type)
""",
)
def robust_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact robust center/spread of the event metric per type: lower
    median and MAD (median absolute deviation) of the micro-scaled
    value — the 50%-breakdown alternative to mean/σ (one corrupt sensor
    drags a moment profile arbitrarily; it moves median/MAD not at all).

    All-integer: two chained exact-median walks over DISTINCT
    (type, value) counts (window input = |distinct values|, not |rows|)
    with a broadcast-size join of the per-type medians in between — four
    exchanges total, every window partitioned by event_type
    (operators/stats.py::robust_center_spread)."""
    e = io.load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    df = e.select("event_type", scaled_long(F.col("value"), 1000000).alias("vu"))
    return stats.robust_center_spread(df, "event_type", "vu")


@register(
    "winsorized_value_stats",
    tags=("NS-stats", "O-08", "O-16"),
    oracle=f"""
WITH vu AS (
  SELECT event_type, {_VU} AS vu FROM events WHERE value IS NOT NULL
),
cnt AS (SELECT event_type, vu AS v, COUNT(*) AS w FROM vu GROUP BY 1, 2),
cum AS (
  SELECT event_type, v,
         SUM(w) OVER (PARTITION BY event_type ORDER BY v) AS cw,
         SUM(w) OVER (PARTITION BY event_type) AS tw
  FROM cnt
),
bounds AS (
  SELECT event_type,
         MIN(CASE WHEN 100 * cw >= 5 * tw THEN v END) AS qlo,
         MIN(CASE WHEN 100 * cw >= 95 * tw THEN v END) AS qhi
  FROM cum GROUP BY event_type
),
clipped AS (
  SELECT v.event_type, least(greatest(v.vu, b.qlo), b.qhi) AS vw
  FROM vu v JOIN bounds b USING (event_type)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(vw) AS BIGINT) AS min_wins,
       CAST(MAX(vw) AS BIGINT) AS max_wins,
       CAST(SUM(vw) AS BIGINT) AS sum_wins,
       {sql_r4("CAST(SUM(vw) AS DOUBLE) / COUNT(*)")} AS mean_wins
FROM clipped GROUP BY event_type
""",
)
def winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized moment statistics per event type: clip the micro-scaled
    metric to its EXACT [p5, p95] per-type quantiles, then take integer
    min/max/sum and the mean — the standard heavy-tail taming that keeps
    moment arithmetic usable (the raw mean chases the fixture's planted
    outliers; the winsorized mean doesn't, while the median stays
    untouched — pinned in tests/test_profiling.py).

    Exactness: both bounds come from ONE exact-quantile pass (integer
    den·cw ≥ num·tw thresholds over distinct values, nulls excluded up
    front), applied with greatest/least; the only float is the final
    division of two exact integers, r4-rounded on both sides.

    Scale: the quantile walk is two exchanges on event_type (distinct
    count + cumulative window over |distinct values| rows), the bounds
    join back is broadcast (|types| rows), the final aggregate one more
    exchange — operators/stats.py::winsorize."""
    e = io.load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    df = e.select("event_type", scaled_long(F.col("value"), 1000000).alias("vu"))
    w = stats.winsorize(df, "event_type", "vu")
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("vu_wins").alias("min_wins"),
        F.max("vu_wins").alias("max_wins"),
        F.sum("vu_wins").alias("sum_wins"),
        r4(F.sum("vu_wins").cast("double") / F.count(F.lit(1))).alias(
            "mean_wins"
        ),
    )


# Silence bound: 48 h of event time. Per-user median inter-arrival in the
# fixture is ~7.7 h and p99 ≈ 48 h, so ~1% of gaps alert (10 / 98 / 966
# interior gaps at sf0.001/0.01/0.1) plus the trailing-silence tail —
# non-degenerate at every SF without drowning the result.
_SILENCE_US = 48 * 3600 * 1_000_000


@register(
    "silent_periods",
    tags=("NS-watchdog", "O-16", "O-22", "ST5"),
    oracle=f"""
WITH o AS (SELECT user_id, epoch_us(ts) AS us, ts, event_id FROM events),
g AS (
  SELECT user_id, us,
         lag(us) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM o
),
gaps AS (
  SELECT user_id, prev_us AS last_seen_us
  FROM g WHERE prev_us IS NOT NULL AND us - prev_us > {_SILENCE_US}
),
tail AS (
  SELECT user_id, MAX(us) AS last_seen_us
  FROM o GROUP BY user_id
  HAVING (SELECT MAX(us) FROM o) - MAX(us) > {_SILENCE_US}
)
SELECT user_id, last_seen_us,
       last_seen_us + {_SILENCE_US} AS silent_after_us
FROM (SELECT * FROM gaps UNION ALL SELECT * FROM tail)
""",
)
def silent_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the silence detector (streaming/jobs.py::
    silence_alerts — the reference watchdog's core signal, ABSENCE of
    data, in push form; `check_wf.sh`/`restart.sh` poll on a 300 s loop
    precisely because no-uploads is the thing to detect): one alert per
    >48 h silent interval per user — interior gaps via a lag window,
    plus the trailing-silence check against the corpus' final event time
    (the batch analogue of the stream's closing watermark passing a
    pending deadline). Semantic delta vs the push form: the batch twin
    has perfect hindsight and reports EVERY over-bound gap, while the
    stream reports a gap only when the global watermark crosses the
    deadline BEFORE the silent key resumes — with micro-batch granularity
    and watermark-driving traffic the two coincide, pinned on a shared
    drain scenario in tests/test_round6.py.

    Scale: ONE exchange on user_id serves both the lag window and the
    per-user max; the global max event time is a broadcast 1-row
    aggregate. Alert volume is the signal's own sparsity (~1% of gaps),
    never materialized beyond that."""
    return silent_periods_frame(
        io.load_table(spark, sf_dir, "events"), _SILENCE_US
    )


def silent_periods_frame(events: DataFrame, silence_us: int) -> DataFrame:
    """Frame-level batch silence detection (the registered query above is
    this on the events table at the 48 h bound) — split out so the
    batch↔stream equality pin in tests/test_round6.py can drive crafted
    scenarios through the identical plan the query ships."""
    us = F.unix_micros("ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = events.select(
        "user_id", us.alias("us"), F.lag(us).over(w).alias("prev_us")
    )
    gaps = g.filter(
        F.col("prev_us").isNotNull()
        & (F.col("us") - F.col("prev_us") > silence_us)
    ).select("user_id", F.col("prev_us").alias("last_seen_us"))
    per_user_max = g.groupBy("user_id").agg(F.max("us").alias("last_seen_us"))
    global_max = g.agg(F.max("us").alias("gmax"))
    tail = (
        per_user_max.crossJoin(F.broadcast(global_max))
        .filter(F.col("gmax") - F.col("last_seen_us") > silence_us)
        .select("user_id", "last_seen_us")
    )
    return gaps.unionAll(tail).select(
        "user_id",
        "last_seen_us",
        (F.col("last_seen_us") + F.lit(silence_us)).alias("silent_after_us"),
    )


# Drift-report snapshot B: the "corrupted next data drop" — a 6/7 sample
# with o_totalprice nulled above 250 000 (~50 pp null-rate shift, loudly
# past the 5 pp threshold), o_orderpriority DROPPED and ingest_batch
# ADDED (schema drift in both directions, surfacing as one-sided
# profile rows through the full-outer join).
_DRIFT_A_COLS = [
    "o_orderkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def _drift_b(orders: DataFrame) -> DataFrame:
    return orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_totalprice") <= 250000, F.col("o_totalprice")).alias(
            "o_totalprice"
        ),
        "o_orderdate",
        (F.col("o_orderkey") % 3).alias("ingest_batch"),
    )


_DRIFT_B_SQL = """
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_totalprice <= 250000 THEN o_totalprice END AS o_totalprice,
         o_orderdate,
         o_orderkey % 3 AS ingest_batch
  FROM orders WHERE o_orderkey % 7 != 0
"""


def _profile_sql(table: str, cols: list[str], side: str) -> str:
    per_col = " UNION ALL ".join(
        f"""SELECT '{c}' AS col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows_{side},
           CAST(COUNT({c}) AS BIGINT) AS n_non_null_{side},
           CAST(COUNT(DISTINCT CAST({c} AS VARCHAR)) AS BIGINT) AS n_distinct_{side}
    FROM {table}"""
        for c in cols
    )
    return per_col


@register(
    "table_drift_report",
    tags=("NS-quality", "O-08", "O-11", "O-15"),
    oracle=f"""
WITH snap_b AS MATERIALIZED ({_DRIFT_B_SQL}),
pa AS ({_profile_sql("orders", _DRIFT_A_COLS, "a")}),
pb AS ({_profile_sql("snap_b", ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate", "ingest_batch"], "b")})
SELECT COALESCE(pa.col_name, pb.col_name) AS col_name,
       n_rows_a, n_non_null_a, n_distinct_a,
       n_rows_b, n_non_null_b, n_distinct_b,
       COALESCE(ABS(n_non_null_a * n_rows_b - n_non_null_b * n_rows_a) * 100
                > 5 * n_rows_a * n_rows_b, FALSE) AS null_rate_shifted,
       n_distinct_a * n_rows_b AS distinct_ratio_num,
       n_distinct_b * n_rows_a AS distinct_ratio_den
FROM pa FULL OUTER JOIN pb ON pa.col_name = pb.col_name
""",
)
def table_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot drift report between the orders table and a corrupted
    "next drop" (6/7 sample, o_totalprice nulled above 250 000,
    o_orderpriority dropped, ingest_batch added): per column, both
    sides' row/non-null/distinct counts, an all-integer null-rate-shift
    flag (cross-multiplied |nn_a·nr_b − nn_b·nr_a|·100 > 5·nr_a·nr_b —
    no float rates), and the cardinality ratio as an exact rational
    pair. Schema drift surfaces as one-sided null rows via the
    full-outer join — the UNION default column set exists precisely so
    the added/dropped column can't hide
    (operators/profiling.py::profile_drift).

    Scale: each side is ONE melt (explode to (col, rendered-value)
    postings) + one aggregate keyed on col_name with a single
    one-dimensional distinct — the Expand fan-out of a multi-distinct
    aggregate never appears, so width scales linearly; the final join is
    |columns| rows."""
    orders = io.load_table(spark, sf_dir, "orders")
    a = orders.select(*_DRIFT_A_COLS)
    return profiling.profile_drift(a, _drift_b(orders))


@register(
    "curation_pipeline_v3",
    tags=("NS-curation", "NS-timeseries", "O-08", "O-16", "O-22", "O-32"),
    oracle=f"""
WITH vu AS (
  SELECT user_id, event_id, event_type, {_VU} AS vu
  FROM events WHERE value IS NOT NULL
),
bad AS MATERIALIZED (
  SELECT DISTINCT user_id FROM ({CUSUM_ORACLE})
  INTERSECT
  SELECT DISTINCT user_id FROM ({ZSCORE_ORACLE})
),
{_MEDIAN_WALK.format(src="vu", val="vu", cnt="mc", cum="mw", out="med", col="med")},
dev AS (
  SELECT v.event_type, ABS(v.vu - m.med) AS dv
  FROM vu v JOIN med m USING (event_type)
),
{_MEDIAN_WALK.format(src="dev", val="dv", cnt="dc", cum="dw", out="mad", col="mad")},
kept AS (
  SELECT v.event_type, v.user_id, v.vu
  FROM vu v
  JOIN med USING (event_type)
  JOIN mad USING (event_type)
  WHERE v.user_id NOT IN (SELECT user_id FROM bad)
    AND v.vu BETWEEN med.med - 5 * mad.mad AND med.med + 5 * mad.mad
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(vu) AS BIGINT) AS sum_vu,
       {sql_r4("CAST(SUM(vu) AS DOUBLE) / COUNT(*)")} AS mean_vu
FROM kept GROUP BY event_type
""",
)
def curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end signal-curation over the round-5 detector families,
    composed from the SAME registered stages a user runs individually
    (the curation_pipeline_v2 discipline, applied to the events side):
    drop every event of a CONSENSUS-anomalous user — flagged by BOTH the
    rolling z-score detector (single outliers) and the CUSUM detector
    (sustained drift); either alone over-excludes on its own failure
    mode — then gate the survivors to the per-type robust inlier band
    (median ± 5·MAD, the 50%-breakdown bounds outliers can't drag), and
    emit the per-type clean training-series budget
    (events/users/mass/mean).

    Exactness: consensus and bounds are all-integer; the only float is
    the final mean (exact-integer division, r4 both sides).

    Scale shape: the z-score tier is ONE user_id window exchange, the
    CUSUM tier ONE shard exchange with a trivial-body Arrow fold, the
    robust bounds four event_type exchanges over distinct-value walks —
    and the composition joins are all broadcast: consensus users are a
    tiny fraction of the population by construction (765 of 1 500 users'
    worth of alarms collapse to the intersection at sf0.1), the bounds
    table is |event_type| rows. Cost ≈ sum of the parts (benched
    separately in bench.py)."""
    e = io.load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vu = e.select(
        "user_id",
        "event_id",
        "event_type",
        scaled_long(F.col("value"), 1000000).alias("vu"),
    )
    z_users = rolling_zscore_anomalies(spark, sf_dir).select("user_id").distinct()
    c_users = cusum_changepoints(spark, sf_dir).select("user_id").distinct()
    bad = z_users.join(c_users, "user_id")
    bounds = stats.robust_center_spread(
        vu.select("event_type", "vu"), "event_type", "vu"
    ).select("event_type", "med", "mad")
    kept = (
        vu.join(F.broadcast(bad), "user_id", "left_anti")
        .join(F.broadcast(bounds), "event_type")
        .filter(
            (F.col("vu") >= F.col("med") - 5 * F.col("mad"))
            & (F.col("vu") <= F.col("med") + 5 * F.col("mad"))
        )
    )
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("vu").alias("sum_vu"),
        r4(F.sum("vu").cast("double") / F.count(F.lit(1))).alias("mean_vu"),
    )
