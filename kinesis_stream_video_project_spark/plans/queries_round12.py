"""Round-12 registration module — PRE-WIRED, NOT YET REGISTERED.

Every r12-queue operator (tests/test_r12_queue.py + the outer-join
streaming pins in tests/test_streaming.py — ppjoin, Heaps curve,
rare-shingle neighbors, Hamilton allocation, the outer-join batch twin,
and counting-algebra IVM) as a driver-contract query:
``QUERIES`` maps name → (spark, sf_dir) → DataFrame and ``ORACLES``
maps name → DuckDB SQL over the driver's pre-registered views. The
registry does NOT import this module yet — a query registered in round
N must be inside round N's 50-slot driver window, and the r9 window is
full; the r10 window is budgeted for the r10-queue remainder + the r11
module. Wiring follows the four-place rule: :func:`register_all` from
``registry._load_all`` + DRIVER_PRIORITY splice + bench rotation +
QUERIES.md regeneration, one commit.

Column names are final here: the Spark select list and the oracle's
aliases were validated equal at all three SFs in tests/test_r12_queue.py
before this module was written (paste-don't-debug), and the module
lockstep test re-validates the entries end to end every round until
registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators import ivm
from kinesis_stream_video_project_spark.operators.dedup import (
    allpairs_jaccard_prefix,
)
from kinesis_stream_video_project_spark.operators.lm import heaps_law_curve
from kinesis_stream_video_project_spark.operators.retrieval import (
    rare_shingle_neighbors,
)
from kinesis_stream_video_project_spark.operators.sampling import (
    hash_bucket,
    stratified_allocation,
)
from kinesis_stream_video_project_spark.operators.slo import burn_rate_alerts
from kinesis_stream_video_project_spark.streaming.jobs import (
    followup_outer_batch,
)


def _allpairs_jaccard_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact whole-corpus all-pairs 3-shingle Jaccard ≥ 600‰ through the
    PPJoin positional filter (X-168) — same contract as the r11 prefix
    form, 3.4× smaller verify-candidate set (dedup.py docstring)."""
    docs = io.load_table(spark, sf_dir, "documents")
    return allpairs_jaccard_prefix(docs, 600, positional=True)


def _heaps_law_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth over 3-shingle types at 20 doc_id-range
    checkpoints (X-169) — the corpus-level crawl-exhaustion curve."""
    return heaps_law_curve(io.load_table(spark, sf_dir, "documents"))


def _rare_shingle_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 lexical nearest neighbors per doc by inverse-df-weighted
    rare-shingle overlap, df ∈ [2, 20] (X-170)."""
    return rare_shingle_neighbors(io.load_table(spark, sf_dir, "documents"))


def _stratified_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamilton largest-remainder allocation of a 1000-row budget across
    order priorities + content-hash sample yield (X-171)."""
    return stratified_allocation(
        io.load_table(spark, sf_dir, "orders"), "o_orderpriority", 1000,
        "o_orderkey",
    )


def _followup_outer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER trigger→response pairs: every error with its in-window
    purchases OR one NULL-response row (X-172) — the batch replay of the
    outer stream-stream join's full verdict set (the stream withholds
    only the trailing unprovable window; pinned in test_streaming)."""
    return followup_outer_batch(io.load_table(spark, sf_dir, "events"))


def _ivm_orders_by_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of the per-customer (order count,
    cents total) rollup (X-174): the BASE view (orderkey-hash < 80)
    absorbs a changeset of deletes (10% of base by a second hash) and
    inserts (hash ≥ 80) through the counting-algebra merge — the Spark
    side never re-aggregates the base rows; the oracle recomputes the
    final state directly, so the hash match certifies
    merge(V(base), Δ) == V(final rows). The changeset is
    account-deletion shaped — customers with custkey-hash < 5 delete
    ALL their base orders and place no new ones — so BOTH interesting
    branches are exercised at every SF (keys leaving the view: 4/61/696;
    insert-born keys: 1/2/3)."""
    o = io.load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("_cents"),
    )
    b = hash_bucket(F.col("o_orderkey"))
    bc = hash_bucket(F.col("o_custkey"), 100)
    base = o.filter(b < 80)
    base_agg = ivm.agg_state(base, "o_custkey", "_cents")
    deletes = base.filter(bc < 5).withColumn("op", F.lit("D"))
    inserts = o.filter((b >= 80) & (bc >= 5)).withColumn("op", F.lit("I"))
    return ivm.merge_agg_deltas(
        base_agg, deletes.unionByName(inserts), "o_custkey", "_cents"
    ).select(
        F.col("key").alias("custkey"), "n_rows", "total"
    )


def _burn_rate_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiwindow SLO burn-rate alerting minutes (X-176; Google SRE
    Workbook ch. 5 — the modern form of the reference's 3-strikes
    watchdog): SLO 770‰, 1× burn over 60 m/5 m trailing windows; both
    windows must burn for a minute to alert. Probed non-degenerate both
    ways at every SF (218/988, 1728/8961, 3620/38859 alerting
    minutes)."""
    return burn_rate_alerts(
        io.load_table(spark, sf_dir, "events"),
        slo_permille=770,
        burn_x_permille=1000,
    )


QUERIES = {
    "allpairs_jaccard_ppjoin": _allpairs_jaccard_ppjoin,
    "heaps_law_curve": _heaps_law_curve,
    "rare_shingle_neighbors": _rare_shingle_neighbors,
    "stratified_allocation": _stratified_allocation,
    "followup_outer_pairs": _followup_outer_pairs,
    "ivm_orders_by_custkey": _ivm_orders_by_custkey,
    "burn_rate_alerts": _burn_rate_alerts,
}


ORACLES = {
    "allpairs_jaccard_ppjoin": """
WITH toks AS (SELECT doc_id, unnest(list_distinct(list_transform(
         generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
         i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))) AS tok
       FROM documents),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS ninter
          FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b, ninter AS inter, sa.n AS size_a, sb.n AS size_b,
       CAST((1000 * ninter) // (sa.n + sb.n - ninter) AS BIGINT) AS jaccard_permille
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE (1000 * ninter) // (sa.n + sb.n - ninter) >= 600
""",
    "heaps_law_curve": """
WITH w AS (SELECT CAST((MAX(doc_id) + 20) // 20 AS BIGINT) AS w FROM documents),
t0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
occ AS (
  SELECT doc_id // (SELECT w FROM w) AS bucket, doc_id,
         unnest(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS g
  FROM t0
),
occ2 AS (SELECT * FROM occ WHERE g IS NOT NULL AND g <> ''),
pb AS (SELECT bucket, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
              CAST(COUNT(*) AS BIGINT) AS n_tokens
       FROM occ2 GROUP BY 1),
fs AS (SELECT g, MIN(bucket) AS bucket FROM occ2 GROUP BY 1),
nt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types FROM fs GROUP BY 1)
SELECT pb.bucket, n_docs, n_tokens,
       CAST(COALESCE(new_types, 0) AS BIGINT) AS new_types,
       CAST(SUM(n_tokens) OVER (ORDER BY pb.bucket) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(new_types, 0)) OVER (ORDER BY pb.bucket) AS BIGINT)
         AS cum_types
FROM pb LEFT JOIN nt USING (bucket)
""",
    "rare_shingle_neighbors": """
WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
posts AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(t) - 2, 1)),
           i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
  FROM t0
),
dfq AS (SELECT g, COUNT(*) AS df FROM posts GROUP BY 1
        HAVING COUNT(*) BETWEEN 2 AND 20),
wt AS (SELECT p.doc_id, p.g, CAST(1000000 // df AS BIGINT) AS wt
       FROM posts p JOIN dfq USING (g)),
pairs AS (
  SELECT a.doc_id, b.doc_id AS neighbor_id,
         CAST(COUNT(*) AS BIGINT) AS n_shared,
         CAST(SUM(a.wt) AS BIGINT) AS score_scaled
  FROM wt a JOIN wt b ON a.g = b.g AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT doc_id, neighbor_id, n_shared, score_scaled,
       CAST(row_number() OVER (
         PARTITION BY doc_id ORDER BY score_scaled DESC, neighbor_id
       ) AS BIGINT) AS rank
FROM pairs
QUALIFY rank <= 5
""",
    "stratified_allocation": """
WITH c AS (SELECT o_orderpriority AS stratum, CAST(COUNT(*) AS BIGINT) AS n_rows
           FROM orders GROUP BY 1),
n AS (SELECT SUM(n_rows) AS nn FROM c),
b AS (SELECT stratum, n_rows,
             (1000 * n_rows) // nn AS fl, (1000 * n_rows) % nn AS rem
      FROM c, n),
l AS (SELECT 1000 - SUM(fl) AS leftover FROM b),
a AS (SELECT stratum, n_rows,
             CAST(fl + CASE WHEN row_number() OVER (ORDER BY rem DESC, stratum ASC)
                                 <= (SELECT leftover FROM l)
                            THEN 1 ELSE 0 END AS BIGINT) AS alloc
      FROM b),
s AS (SELECT o_orderpriority AS stratum, o_orderkey,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 1000000,
                        o_orderkey) AS rk
      FROM orders),
ns AS (SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_sampled
       FROM s JOIN a USING (stratum) WHERE rk <= alloc GROUP BY 1)
SELECT a.stratum, a.n_rows, a.alloc,
       CAST(COALESCE(ns.n_sampled, 0) AS BIGINT) AS n_sampled
FROM a LEFT JOIN ns USING (stratum)
""",
    "followup_outer_pairs": """
WITH t AS (SELECT user_id, event_id AS trigger_event_id, epoch_us(ts) AS t_us
           FROM events WHERE event_type = 'error'),
r AS (SELECT user_id, event_id AS response_event_id, epoch_us(ts) AS r_us
      FROM events WHERE event_type = 'purchase')
SELECT t.user_id, t.trigger_event_id, r.response_event_id,
       r.r_us - t.t_us AS lag_us
FROM t LEFT JOIN r
  ON t.user_id = r.user_id
 AND r.r_us > t.t_us
 AND r.r_us <= t.t_us + CAST(4 AS BIGINT) * 3600 * 1000000
""",
    "ivm_orders_by_custkey": """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 100 AS b,
         ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT % 100 AS bc
  FROM orders
),
final_rows AS (
  SELECT * FROM o
  WHERE (b < 80 AND bc >= 5) OR (b >= 80 AND bc >= 5)
)
SELECT o_custkey AS custkey, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS total
FROM final_rows GROUP BY 1
""",
    "burn_rate_alerts": """
WITH led AS (
  SELECT epoch_us(ts) // 60000000 AS m,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errors,
         COUNT(*) AS total
  FROM events GROUP BY 1
),
sc AS (
  SELECT m,
         SUM(errors) OVER (ORDER BY m RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS le,
         SUM(total)  OVER (ORDER BY m RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS lt,
         SUM(errors) OVER (ORDER BY m RANGE BETWEEN 4 PRECEDING AND CURRENT ROW) AS se,
         SUM(total)  OVER (ORDER BY m RANGE BETWEEN 4 PRECEDING AND CURRENT ROW) AS st
  FROM led
)
SELECT CAST(m * 60000000 AS BIGINT) AS minute_us,
       CAST(le AS BIGINT) AS long_errors, CAST(lt AS BIGINT) AS long_total,
       CAST(se AS BIGINT) AS short_errors, CAST(st AS BIGINT) AS short_total,
       CAST((le * 1000 * 1000) // (230 * lt) AS BIGINT) AS long_burn_permille,
       CAST((se * 1000 * 1000) // (230 * st) AS BIGINT) AS short_burn_permille
FROM sc
WHERE le * 1000 * 1000 > 1000 * 230 * lt
  AND se * 1000 * 1000 > 1000 * 230 * st
""",
}

assert set(QUERIES) == set(ORACLES)

TAGS = {name: ("round12",) for name in QUERIES}


def register_all(names: "tuple[str, ...] | None" = None) -> None:
    """Wire the given r12 queries into the live registry — called from
    ``registry._load_all`` when a window has room, never before. The
    explicit ``names`` order is load-bearing: registration order is the
    builder's new-query window order (VERDICT r10 item 1 leads the r11
    window with burn_rate_alerts and ivm_orders_by_custkey)."""
    from kinesis_stream_video_project_spark.plans.registry import register

    for name in names if names is not None else tuple(QUERIES):
        register(name, oracle=ORACLES[name], tags=TAGS[name])(QUERIES[name])
