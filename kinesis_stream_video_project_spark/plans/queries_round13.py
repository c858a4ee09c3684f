"""Round-13 queue module — PRE-WIRED, NOT YET REGISTERED (the
queries_round11/round12 discipline: built, oracle-validated at 3 SFs,
lockstep-tested every round, registered when a driver window has
slots). Wiring is the four-place rule: :func:`register_all` from
``registry._load_all`` + DRIVER_PRIORITY splice + bench rotation +
QUERIES.md regeneration, one commit.

Four operators new in round 10:

* ``priority_sample_docs`` — Duffield/Lund/Thorup priority sampling
  (JACM 2007) in the repo's deterministic-md5 integer form: the
  weighted-without-replacement top-k that merges across shards
  (TakeOrderedAndProject — no corpus shuffle at any scale).
* ``compaction_bins`` — sequential-fill small-file compaction plan
  (the Delta OPTIMIZE / Iceberg rewriteDataFiles decision): documents
  stand in as the file manifest (source = partition, n_chars = bytes).
* ``fastss_typo_pairs`` — FastSS deletion-neighborhood edit-distance
  join (Bocek/Hunt/Stiller 2007), d <= 2, over the document token
  vocabulary; Spark side blocks on deletion variants, the oracle is
  the DEFINITIONAL all-pairs levenshtein (the skyline rule: the oracle
  stays quadratic-definitional because vocabulary is ledger-sized).
* ``nation_urgent_ztest`` — per-nation two-proportion z-test vs the
  global urgent-order rate, all-integer cross-multiplied (z^2 = 4);
  probed non-degenerate BOTH ways at sf0.01 (2 significant / 23 not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators.editdist import fastss_pairs
from kinesis_stream_video_project_spark.operators.layout import compaction_plan
from kinesis_stream_video_project_spark.operators.sampling import priority_sample
from kinesis_stream_video_project_spark.operators.stats import (
    proportion_ztest_vs_global,
)


def _priority_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional deterministic top-64 document sample
    (weight = n_chars: longer docs proportionally likelier — the
    token-budget-aware corpus subsample)."""
    docs = io.load_table(spark, sf_dir, "documents")
    return priority_sample(docs, "doc_id", F.col("n_chars"), k=64)


def _compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-fill compaction plan over the documents manifest,
    4 KB target bins per source partition."""
    docs = io.load_table(spark, sf_dir, "documents")
    return compaction_plan(
        docs, "source", "doc_id", "n_chars", target_bytes=4000
    )


def _fastss_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token pairs at Levenshtein distance 1-2 via deletion-
    neighborhood blocking (6 pairs at sf0.01, all distance 2 — the
    fixture vocabulary has no distance-1 pairs; stated)."""
    docs = io.load_table(spark, sf_dir, "documents")
    terms = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
    )
    return fastss_pairs(terms, min_len=3, max_dist=2)


def _nation_urgent_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation urgent-order-rate significance vs the global rate."""
    o = io.load_table(spark, sf_dir, "orders")
    c = io.load_table(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"])
    return proportion_ztest_vs_global(
        j,
        "c_nationkey",
        (F.col("o_orderpriority") == F.lit("1-URGENT")),
        F.lit(True),
    ).withColumnRenamed("group", "nationkey")


QUERIES = {
    "priority_sample_docs": _priority_sample_docs,
    "compaction_bins": _compaction_bins,
    "fastss_typo_pairs": _fastss_typo_pairs,
    "nation_urgent_ztest": _nation_urgent_ztest,
}

ORACLES = {
    "priority_sample_docs": """
WITH t AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
           // CAST(n_chars AS BIGINT) AS priority
  FROM documents
)
SELECT doc_id, weight, CAST(priority AS BIGINT) AS priority
FROM t ORDER BY priority, doc_id LIMIT 64
""",
    "compaction_bins": """
WITH f AS (
  SELECT source AS partition, doc_id AS file_id,
         CAST(n_chars AS BIGINT) AS bytes,
         COALESCE(SUM(CAST(n_chars AS BIGINT)) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM documents
)
SELECT partition, CAST(cum // 4000 AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
       MIN(file_id) AS first_file, MAX(file_id) AS last_file
FROM f GROUP BY 1, 2
""",
    "fastss_typo_pairs": """
WITH t AS (
  SELECT DISTINCT UNNEST(string_split(lower(text), ' ')) AS term
  FROM documents
),
t2 AS (SELECT term FROM t WHERE length(term) >= 3)
SELECT a.term AS term_a, b.term AS term_b,
       CAST(levenshtein(a.term, b.term) AS BIGINT) AS dist
FROM t2 a JOIN t2 b ON a.term < b.term
WHERE levenshtein(a.term, b.term) BETWEEN 1 AND 2
""",
    "nation_urgent_ztest": """
WITH per AS (
  SELECT c_nationkey AS nationkey,
         SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
           AS successes,
         COUNT(*) AS trials
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1
),
g AS (
  SELECT CAST(SUM(successes) AS HUGEINT) AS X,
         CAST(SUM(trials) AS HUGEINT) AS N
  FROM per
)
SELECT nationkey,
       CAST(successes AS BIGINT) AS successes,
       CAST(trials AS BIGINT) AS trials,
       CAST((successes * 1000) // trials AS BIGINT) AS rate_permille,
       CAST((X * 1000) // N AS BIGINT) AS global_permille,
       ((CAST(successes AS HUGEINT) * N - CAST(trials AS HUGEINT) * X)
        * (CAST(successes AS HUGEINT) * N - CAST(trials AS HUGEINT) * X)
        > 4 * X * (N - X) * CAST(trials AS HUGEINT)) AS significant
FROM per, g
""",
}

assert set(QUERIES) == set(ORACLES)

TAGS = {name: ("round13",) for name in QUERIES}


def register_all(names: "tuple[str, ...] | None" = None) -> None:
    """Wire the given wave into the live registry — called from
    ``registry._load_all`` when a window has slots, never before."""
    from kinesis_stream_video_project_spark.plans.registry import register

    for name in names if names is not None else tuple(QUERIES):
        register(name, oracle=ORACLES[name], tags=TAGS[name])(QUERIES[name])
