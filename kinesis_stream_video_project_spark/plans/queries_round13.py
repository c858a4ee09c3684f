"""Round-13 queue module — PRE-WIRED, NOT YET REGISTERED (the
queries_round11/round12 discipline: built, oracle-validated at 3 SFs,
lockstep-tested every round, registered when a driver window has
slots). Wiring is the four-place rule: :func:`register_all` from
``registry._load_all`` + DRIVER_PRIORITY splice + bench rotation +
QUERIES.md regeneration, one commit.

Seven queries (six new operator families) built in round 10:

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
* ``hrw_rebalance_audit`` — rendezvous-hashing shard movement ledger
  (Thaler/Ravishankar 1998): zero-shuffle row-local assignment, the
  minimal-disruption law measured on real keys.
* ``semdedup_keep_report`` — SemDeDup (Abbas et al. 2023): k-means
  cells + cluster-local cosine drop rule, min-id survivors; tau = 0.45
  fixture-calibrated (max pairwise cosine ~0.6 in the synthetic
  embeddings; production ~0.95 — a parameter, not a semantics change).
* ``semdedup_docs_keep`` — the same verdict over DOCUMENT text at the
  paper's tau = 0.95, via the hashing-trick embedding
  (functions/vectors.py::hashed_bow_table): embedding GENERATION and
  dedup hash-check end to end.
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


def _hrw_rebalance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous-hashing rebalance ledger for adding shard s5 to a
    5-shard layout over order keys: the minimal-disruption law on real
    keys (all inflow lands on s5; expectation 1/6 of keys move)."""
    from kinesis_stream_video_project_spark.operators.placement import (
        rendezvous_rebalance_audit,
    )

    o = io.load_table(spark, sf_dir, "orders")
    n5 = [f"s{i}" for i in range(5)]
    return rendezvous_rebalance_audit(o, "o_orderkey", n5, n5 + ["s5"])


def _semdedup_keep_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup keep/drop verdict per embedding at tau = 0.45 —
    non-degenerate both ways at every SF (probed 2/500, 5/500, 34/2000
    dropped)."""
    from kinesis_stream_video_project_spark.operators.semdedup import (
        semdedup_report,
    )

    return semdedup_report(
        io.load_table(spark, sf_dir, "embeddings"), threshold=0.45
    )


def _hrw_case(nodes: "list[str]") -> str:
    g = ",".join(f"h{i}" for i in range(len(nodes)))
    whens = " ".join(f"WHEN h{i} THEN '{n}'" for i, n in enumerate(nodes[:-1]))
    return f"CASE greatest({g}) {whens} ELSE '{nodes[-1]}' END"


_HRW_HASHES = ",".join(
    f"('0x'||substr(md5(CAST(o_orderkey AS VARCHAR)||':s{i}'),1,12))::BIGINT"
    f" AS h{i}"
    for i in range(6)
)

_N5 = [f"s{i}" for i in range(5)]
_N6 = _N5 + ["s5"]


def _semdedup_docs_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over DOCUMENT text at the paper's tau = 0.95: the
    hashing-trick embedding (hashed_bow_table — verbatim dup-cluster
    copies embed at cosine 1.0) makes the semantic-dedup verdict
    non-degenerate at the REAL threshold on every SF (probed 25/500,
    25/500, 298/5000 dropped at n_cells=40 — identical vectors land in
    the same cell at any k, so verbatim dups survive the cell split;
    40 cells cut the pair join 4x, the paper's own scale knob)."""
    from kinesis_stream_video_project_spark.functions.vectors import (
        hashed_bow_table,
    )
    from kinesis_stream_video_project_spark.operators.semdedup import (
        semdedup_report,
    )

    docs = io.load_table(spark, sf_dir, "documents")
    emb = hashed_bow_table(docs).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    return semdedup_report(emb, threshold=0.95, n_cells=40)


def _semdedup_oracle(
    source_cte: str = "SELECT vec_id, embedding FROM embeddings",
    tau: float = 0.45,
    n_cells: int = 10,
) -> str:
    from kinesis_stream_video_project_spark.plans.queries_llm import _dd_cosine

    def centroids(src: str) -> str:
        return f"""SELECT cell, list(mean_c ORDER BY dim) AS centroid
  FROM (SELECT cell, dim, AVG(c) AS mean_c
        FROM (SELECT cell, UNNEST(generate_series(1, len(embedding))) AS dim,
                     UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS c
              FROM {src}) GROUP BY cell, dim) GROUP BY cell"""

    def assign(cents: str) -> str:
        return f"""SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_dd_cosine('e.embedding', 'c.centroid')} DESC, c.cell) AS rn
    FROM src e CROSS JOIN {cents} c) WHERE rn = 1"""

    return f"""
WITH
src AS ({source_cte}),
a0 AS (SELECT vec_id, embedding, vec_id % {n_cells} AS cell FROM src),
c1 AS ({centroids('a0')}),
a1 AS ({assign('c1')}),
c2 AS ({centroids('a1')}),
a2 AS ({assign('c2')}),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM a2 a JOIN a2 b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE (floor(({_dd_cosine('a.embedding', 'b.embedding')}) * 10000.0 + 0.5)
         / 10000.0) >= {tau}
)
SELECT a2.vec_id, CAST(a2.cell AS BIGINT) AS cell,
       (dropped.vec_id IS NULL) AS kept
FROM a2 LEFT JOIN dropped ON a2.vec_id = dropped.vec_id
"""


# The documents-side embedding source: the hashing-trick bag-of-words
# derived IN SQL (identical md5 buckets, identical integer counts cast
# to double — the portable rule), so the doc-level SemDeDup verdict
# hash-checks end to end including the embedding generation.
_DOCS_BOW_CTE = """
SELECT doc_id AS vec_id,
       list_transform(generate_series(0, 63), d -> CAST(len(list_filter(
         list_transform(string_split(lower(text), ' '),
                        t -> CAST(('0x' || substr(md5(t), 1, 8))::BIGINT % 64 AS INT)),
         b -> b = d)) AS DOUBLE)) AS embedding
FROM documents
"""


QUERIES = {
    "priority_sample_docs": _priority_sample_docs,
    "compaction_bins": _compaction_bins,
    "fastss_typo_pairs": _fastss_typo_pairs,
    "nation_urgent_ztest": _nation_urgent_ztest,
    "hrw_rebalance_audit": _hrw_rebalance_audit,
    "semdedup_keep_report": _semdedup_keep_report,
    "semdedup_docs_keep": _semdedup_docs_keep,
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
    "hrw_rebalance_audit": f"""
WITH r AS (SELECT o_orderkey AS k, {_HRW_HASHES} FROM orders),
a AS (SELECT k, {_hrw_case(_N5)} AS _a, {_hrw_case(_N6)} AS _b FROM r),
bef AS (SELECT _a AS shard, CAST(COUNT(*) AS BIGINT) AS n_before,
        CAST(SUM(CASE WHEN _a <> _b THEN 1 ELSE 0 END) AS BIGINT)
          AS n_moved_out
        FROM a GROUP BY 1),
aft AS (SELECT _b AS shard, CAST(COUNT(*) AS BIGINT) AS n_after,
        CAST(SUM(CASE WHEN _a <> _b THEN 1 ELSE 0 END) AS BIGINT)
          AS n_moved_in
        FROM a GROUP BY 1)
SELECT COALESCE(bef.shard, aft.shard) AS shard,
       CAST(COALESCE(n_before, 0) AS BIGINT) AS n_before,
       CAST(COALESCE(n_after, 0) AS BIGINT) AS n_after,
       CAST(COALESCE(n_moved_in, 0) AS BIGINT) AS n_moved_in,
       CAST(COALESCE(n_moved_out, 0) AS BIGINT) AS n_moved_out
FROM bef FULL OUTER JOIN aft ON bef.shard = aft.shard
""",
    "semdedup_keep_report": _semdedup_oracle(),
    "semdedup_docs_keep": _semdedup_oracle(_DOCS_BOW_CTE, tau=0.95, n_cells=40),
}

assert set(QUERIES) == set(ORACLES)

TAGS = {name: ("round13",) for name in QUERIES}


def register_all(names: "tuple[str, ...] | None" = None) -> None:
    """Wire the given wave into the live registry — called from
    ``registry._load_all`` when a window has slots, never before."""
    from kinesis_stream_video_project_spark.plans.registry import register

    for name in names if names is not None else tuple(QUERIES):
        register(name, oracle=ORACLES[name], tags=TAGS[name])(QUERIES[name])
