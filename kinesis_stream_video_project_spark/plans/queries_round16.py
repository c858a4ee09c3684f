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
* ``abc_part_classes`` — ABC/Pareto inventory classification by exact
  cumulative revenue share (80/95 cuts as integer cross-products — no
  division in the classifier).
* ``mmr_diverse_topk`` — Maximal Marginal Relevance diversity
  re-ranking (Carbonell & Goldstein SIGIR 1998): greedy
  rel − λ·max-sim-to-selected over a 50-candidate exact-cosine tier —
  deduplicated RAG context assembly (`operators/mmr.py`).
* ``quality_dup_calibration`` — per quality-score decile, the exact-dup
  rate: does the quality filter agree with the dedup tier about junk?
* ``growth_accounting_daily`` — the classic new/retained/resurrected/
  churned decomposition of daily active users, with the ledger
  identities pinned.

A ``suspect_duplicate_orders`` query (same customer, same cents,
within 7 days — the duplicate-payment classic) was built and DROPPED:
probed empty at every SF (o_totalprice is a near-uniform double, zero
exact-cent collisions; even a ±$100 band finds 2 pairs at sf0.1 and 0
at sf0.01) — an always-empty row only ever hash-matches empty==empty,
the round-3 degenerate-predicate trap.
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


def _abc_part_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification (X-214): parts ranked by
    exact revenue-cents; class A = parts while the RUNNING share (rank
    window, integer cross-multiplication cum·1000 ≤ total·800 — no
    division) stays within 80% of total revenue, B to 95%, C the tail.
    Emits per class: part count, revenue, exact permille share. The
    rank window is unpartitioned BY NATURE over the |parts| ledger
    (20k rows at sf0.1 — never the corpus; lineitem is pre-aggregated
    per part first). Measured finding: this generator's part revenues
    are near-UNIFORM — A holds ~78% of parts, not the textbook Pareto
    20%; the classifier measures concentration, it does not assume
    it."""
    rev = (
        io.load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(scaled_long(F.col("l_extendedprice"), 100)).alias("_rev")
        )
    )
    w = Window.orderBy(F.col("_rev").desc(), F.col("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = rev.agg(F.sum("_rev").alias("_tot"))
    classed = (
        rev.withColumn("_cum", F.sum("_rev").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "_rev",
            F.when(F.col("_cum") * 1000 <= F.col("_tot") * 800, "A")
            .when(F.col("_cum") * 1000 <= F.col("_tot") * 950, "B")
            .otherwise("C")
            .alias("abc_class"),
            "_tot",
        )
    )
    return classed.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum("_rev").cast("long").alias("rev_cents"),
        F.expr("(SUM(_rev) * 1000) DIV MAX(_tot)")
        .cast("long")
        .alias("share_permille"),
    )


_ABC_ORACLE = """
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS rev
  FROM lineitem GROUP BY 1
),
tot AS (SELECT SUM(rev) AS tot FROM rev),
classed AS (
  SELECT rev,
         CASE WHEN cum * 1000 <= t.tot * 800 THEN 'A'
              WHEN cum * 1000 <= t.tot * 950 THEN 'B'
              ELSE 'C' END AS abc_class,
         t.tot
  FROM (
    SELECT l_partkey, rev,
           SUM(rev) OVER (ORDER BY rev DESC, l_partkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM rev
  ) r, tot t
)
SELECT abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS rev_cents,
       CAST((SUM(rev) * 1000) // MAX(tot) AS BIGINT) AS share_permille
FROM classed GROUP BY 1
"""


def _mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-ranking (X-216): the 10 most relevant-yet-
    diverse neighbors of query vector 0 from a 50-candidate exact-cosine
    tier, λ = 0.5 — deduplicated context assembly for RAG (top-k hands a
    prompt five copies of the same paragraph; MMR hands it five
    different ones)."""
    from kinesis_stream_video_project_spark.operators.mmr import mmr_topk

    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select("embedding")
    corpus = e.filter(F.col("vec_id") != 0)
    return mmr_topk(q, corpus, n_candidates=50, k_select=10, lam=0.5)


def _mmr_oracle() -> str:
    from kinesis_stream_video_project_spark.operators.mmr import mmr_oracle_sql
    from kinesis_stream_video_project_spark.plans.queries_llm import _dd_cosine

    # NaN/NULL relevance filtered BEFORE the limit — the Spark side drops
    # zero-norm cosines before its top-50 (mmr.py zero-norm guard), so
    # the oracle must select from the same candidate pool.
    rel_cte = f"""
  SELECT * FROM (
    SELECT e.vec_id AS i, e.embedding,
           (floor(({_dd_cosine('q.embedding', 'e.embedding')}) * 10000.0 + 0.5)
            / 10000.0) AS rel
    FROM embeddings e,
         (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
  ) WHERE rel IS NOT NULL AND NOT isnan(rel)
  ORDER BY rel DESC, i LIMIT 50
"""
    return mmr_oracle_sql(rel_cte, n_candidates=50, k_select=10, lam=0.5)


def _quality_dup_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-vs-duplication calibration (X-217): per quality-score
    decile, the exact-duplicate rate — the cross-family evaluation row
    that asks whether the quality filter and the dedup tier agree about
    which documents are junk (a curation pipeline that filters on
    quality but keeps duplicate clusters is leaking). Decile = ntile(10)
    over (r4 quality, doc_id) — a ledger-sized unpartitioned window
    (|documents| rows); dup flag = text-group count > 1 (no hash needed
    cross-engine: the text IS the key). Measured: the generator plants
    duplicate clusters only at sf0.1 (16 dup docs; 0 at sf≤0.01, exact
    AND normalized — probed), so the dup column is live at the bench SF
    and honestly zero at the gate SF; deciles/counts carry signal at
    every SF."""
    from kinesis_stream_video_project_spark.functions import text as T
    from kinesis_stream_video_project_spark.functions.numeric import r4

    d = io.load_table(spark, sf_dir, "documents")
    w_dup = Window.partitionBy("text")
    scored = d.select(
        "doc_id",
        r4(T.quality_score("text", "n_chars")).alias("_q"),
        (F.count(F.lit(1)).over(w_dup) > 1).alias("_is_dup"),
    )
    w_tile = Window.orderBy(F.col("_q"), F.col("doc_id"))
    return (
        scored.withColumn("decile", F.ntile(10).over(w_tile))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum(F.when(F.col("_is_dup"), 1)), F.lit(0))
            .cast("long")
            .alias("n_dups"),
        )
        .select(
            F.col("decile").cast("long").alias("decile"),
            "n_docs",
            "n_dups",
            F.expr("(n_dups * 1000) DIV n_docs").cast("long").alias("dup_permille"),
        )
    )


def _quality_dup_oracle() -> str:
    from kinesis_stream_video_project_spark.plans.queries_llm import _STOP_SQL

    return f"""
WITH t AS (
  SELECT doc_id, text, n_chars, string_split(text, ' ') AS toks
  FROM documents
),
q AS (
  SELECT doc_id, text,
         (floor(((LEAST(n_chars, 400) / 400.0
                  + CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                  + 1.0 - abs(CAST(len(list_filter(toks,
                        tok -> list_contains({_STOP_SQL}, tok))) AS DOUBLE)
                        / len(toks) - 0.1)) / 3.0) * 10000.0 + 0.5)
          / 10000.0) AS qual
  FROM t
),
flagged AS (
  SELECT doc_id, qual,
         COUNT(*) OVER (PARTITION BY text) > 1 AS is_dup
  FROM q
),
tiled AS (
  SELECT ntile(10) OVER (ORDER BY qual, doc_id) AS decile, is_dup
  FROM flagged
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(CASE WHEN is_dup THEN 1 END), 0) AS BIGINT)
         AS n_dups,
       CAST((COALESCE(SUM(CASE WHEN is_dup THEN 1 END), 0) * 1000)
            // COUNT(*) AS BIGINT) AS dup_permille
FROM tiled GROUP BY 1
"""


def _growth_accounting_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting ledger (X-218, the Social-Capital/a16z growth
    decomposition): per activity day, users split into NEW (first-ever
    day), RETAINED (also active the previous day), RESURRECTED (active,
    not yesterday, not new), and CHURNED (active yesterday, silent
    today — attributed to today). The four flows plus the running
    identity DAU(d) = new + retained + resurrected are all exact
    integers; churned rows ride one day forward via a +1-day self-key.
    One distinct (user, day) aggregate, one user-partitioned lag window,
    day-level rollups after.

    ACTIVE-DAYS-ONLY semantics (stated, ADVICE r11): the ledger emits a
    row per day WITH activity, and churn on day d is computed only when
    day d itself has a row — users who churned into a fully-silent
    calendar day are NOT reported on any later row (each row compares
    against exactly d−1). Both engines implement the same rule, so the
    oracle agrees by construction; densify the day spine upstream if
    zero-DAU days must report their churn."""
    ev = io.load_table(spark, sf_dir, "events")
    ud = ev.select(
        "user_id", F.col("ts").cast("date").alias("_d")
    ).distinct()
    from pyspark.sql import Window as W

    w_u = W.partitionBy("user_id").orderBy("_d")
    tagged = ud.select(
        "user_id",
        "_d",
        F.lag("_d").over(w_u).alias("_prev"),
        F.min("_d").over(
            W.partitionBy("user_id").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("_first"),
    )
    flows = tagged.select(
        "_d",
        F.when(F.col("_d") == F.col("_first"), 1).otherwise(0).alias("_new"),
        F.when(
            F.col("_prev").isNotNull()
            & (F.datediff(F.col("_d"), F.col("_prev")) == 1),
            1,
        )
        .otherwise(0)
        .alias("_ret"),
        F.when(
            (F.col("_d") != F.col("_first"))
            & (
                F.col("_prev").isNull()
                | (F.datediff(F.col("_d"), F.col("_prev")) > 1)
            ),
            1,
        )
        .otherwise(0)
        .alias("_res"),
    )
    active = flows.groupBy("_d").agg(
        F.count(F.lit(1)).alias("dau"),
        F.sum("_new").alias("n_new"),
        F.sum("_ret").alias("n_retained"),
        F.sum("_res").alias("n_resurrected"),
    )
    # churned(d) = active(d−1) − retained(d): users active yesterday who
    # did not show today (computed by shifting yesterday's DAU forward).
    prev = active.select(
        F.date_add(F.col("_d"), 1).alias("_d"),
        F.col("dau").alias("_prev_dau"),
    )
    return (
        active.join(prev, "_d", "left")
        .select(
            F.col("_d").cast("date").alias("day"),
            F.col("dau").cast("long").alias("dau"),
            F.col("n_new").cast("long").alias("n_new"),
            F.col("n_retained").cast("long").alias("n_retained"),
            F.col("n_resurrected").cast("long").alias("n_resurrected"),
            (F.coalesce(F.col("_prev_dau"), F.lit(0)) - F.col("n_retained"))
            .cast("long")
            .alias("n_churned"),
        )
    )


_GROWTH_ORACLE = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
tagged AS (
  SELECT user_id, d,
         lag(d) OVER (PARTITION BY user_id ORDER BY d) AS prev,
         MIN(d) OVER (PARTITION BY user_id) AS first_d
  FROM ud
),
flows AS (
  SELECT d,
         CASE WHEN d = first_d THEN 1 ELSE 0 END AS is_new,
         CASE WHEN prev IS NOT NULL AND d - prev = 1 THEN 1 ELSE 0 END
           AS is_ret,
         CASE WHEN d <> first_d AND (prev IS NULL OR d - prev > 1)
              THEN 1 ELSE 0 END AS is_res
  FROM tagged
),
active AS (
  SELECT d, COUNT(*) AS dau, SUM(is_new) AS n_new,
         SUM(is_ret) AS n_retained, SUM(is_res) AS n_resurrected
  FROM flows GROUP BY 1
)
SELECT a.d AS day,
       CAST(a.dau AS BIGINT) AS dau,
       CAST(a.n_new AS BIGINT) AS n_new,
       CAST(a.n_retained AS BIGINT) AS n_retained,
       CAST(a.n_resurrected AS BIGINT) AS n_resurrected,
       CAST(COALESCE(p.dau, 0) - a.n_retained AS BIGINT) AS n_churned
FROM active a
LEFT JOIN active p ON p.d = a.d - 1
"""


QUERIES = {
    "quality_dup_calibration": _quality_dup_calibration,
    "growth_accounting_daily": _growth_accounting_daily,
    "ltv_cohort_revenue": _ltv_cohort_revenue,
    "order_total_reconciliation": _order_total_reconciliation,
    "abc_part_classes": _abc_part_classes,
    "mmr_diverse_topk": _mmr_diverse_topk,
}

ORACLES = {
    "quality_dup_calibration": _quality_dup_oracle(),
    "growth_accounting_daily": _GROWTH_ORACLE,
    "ltv_cohort_revenue": _LTV_ORACLE,
    "order_total_reconciliation": _RECON_ORACLE,
    "abc_part_classes": _ABC_ORACLE,
    "mmr_diverse_topk": _mmr_oracle(),
}

assert set(QUERIES) == set(ORACLES)

TAGS = {name: ("round16",) for name in QUERIES}


def register_all(names: "tuple[str, ...] | None" = None) -> None:
    """Wire the given wave into the live registry — called from
    ``registry._load_all`` when a window has slots, never before."""
    from kinesis_stream_video_project_spark.plans.registry import register

    for name in names if names is not None else tuple(QUERIES):
        register(name, oracle=ORACLES[name], tags=TAGS[name])(QUERIES[name])
