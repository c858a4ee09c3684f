"""Round-8 registrations, shipped EARLY inside the round-7 window: the
r8 operator queue's first seven promotions — BM25 lexical retrieval,
cross-document verbatim spans, small-basket RA link prediction, PMI
collocations, per-doc OOV rate, the ordered conversion funnel, and the
distributed embedding Gram matrix. Registering in the same round the
operators were built (instead of queueing to r8) spends the window
slots that would have re-verified r4-green queries on queries that have
NEVER had a driver hash row — the r4-latest cohort stays r4-green,
which still satisfies the nothing-older-than-r4 staleness bound
(VERDICT r6 item 2).

Every oracle here was VALIDATED bit-exact against the Spark side at
sf0.001/0.01/0.1 in tests/test_r8_queue.py and tests/test_spans.py
before registration (the "paste, don't debug" discipline).

Determinism discipline (SURVEY.md §5.2): integer/string end to end
except BM25's emitted score (fixed-op-order double arithmetic on
rational cores, ``r4``-rounded, rank computed over the ROUNDED score
with a doc_id tiebreak).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators import (
    funnel,
    graph,
    linalg,
    lm,
    retrieval,
    spans,
)
from kinesis_stream_video_project_spark.plans.registry import register

# ---------------------------------------------------------------------------
# 1. BM25 lexical retrieval (the tfidf tier's production upgrade)
# ---------------------------------------------------------------------------


@register(
    "bm25_lexical_topk",
    tags=("NS-retrieval", "O-23", "O-31"),
    oracle="""
WITH tok AS (
    SELECT doc_id, len(string_split(text, ' ')) AS dl,
           UNNEST(string_split(text, ' ')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, MAX(dl) AS dl, COUNT(*) AS tf
    FROM tok GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
st AS (
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avgdl
    FROM documents
),
q AS (SELECT term, df FROM df ORDER BY df DESC, term LIMIT 5),
scored AS (
    SELECT tf.doc_id,
           SUM(((st.n_docs - q.df + 0.5) / (q.df + 0.5))
               * ((CAST(tf.tf AS DOUBLE) * 2.2)
                  / (CAST(tf.tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(tf.dl AS DOUBLE) / st.avgdl))))
              ) AS raw
    FROM tf JOIN q USING (term) CROSS JOIN st
    GROUP BY tf.doc_id
)
SELECT doc_id,
       (floor((raw) * 10000.0 + 0.5) / 10000.0) AS score,
       CAST(row_number() OVER (
            ORDER BY (floor((raw) * 10000.0 + 0.5) / 10000.0) DESC, doc_id
       ) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= 20
""",
)
def bm25_lexical_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by Okapi BM25 against the corpus's five
    highest-df terms (operators/retrieval.py::bm25_topk) — tf saturation
    (k1=1.2) + length normalization (b=0.75) over the same self-derived
    query set as tfidf_topk, so the two lexical tiers rank the same
    workload. The idf is the RATIONAL BM25 core without the log (libm-
    free hash exactness; per-term ranking is the same monotone order);
    the only order-sensitive float is the ≤5-term per-doc sum, rounded
    via ``r4`` with ranking over the ROUNDED score + doc_id tiebreak.

    Scale: postings shuffle once on term for df; broadcast query terms
    + 1-row (N, avgdl) stats; TakeOrderedAndProject top-k. At 100 TB
    the postings table is the materialized inverted index."""
    return retrieval.bm25_topk(io.load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# 2. Cross-document verbatim spans (position-aware dedup tier)
# ---------------------------------------------------------------------------


@register(
    "verbatim_spans",
    tags=("NS-dedup", "O-29", "O-16"),
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, i.i AS pos,
         ('0x' || substr(md5(array_to_string(t[i.i:i.i+7], ' ')), 1, 15))::BIGINT AS gh
  FROM toks, UNNEST(generate_series(1, len(t) - 7)) AS i(i)
  WHERE len(t) >= 8
),
ok AS (
  SELECT gh FROM (
    SELECT gh, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY gh
  ) WHERE df <= 20
),
g AS (SELECT grams.* FROM grams JOIN ok USING (gh)),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a,
         a.pos - b.pos AS diag
  FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id
),
isl AS (
  SELECT doc_a, doc_b, diag,
         pos_a - row_number() OVER (
           PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS isl
  FROM m
),
runs AS (
  SELECT doc_a, doc_b, diag, isl, COUNT(*) AS run
  FROM isl GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, CAST(SUM(run) AS BIGINT) AS n_shared_grams,
       CAST(MAX(run) + 7 AS BIGINT) AS max_span_tokens
FROM runs GROUP BY 1, 2
""",
)
def verbatim_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing verbatim 8-token runs
    (operators/spans.py::verbatim_span_pairs): positional-gram postings
    → same-hash pair join (id+pos payloads only) → maximal runs as
    gaps-and-islands over (pair, diagonal) — the position-aware dedup
    signal (ExactSubstr memorization risk, Lee et al.) that set-
    similarity tiers are blind to. Grams in >20 docs are excluded
    BEFORE pairing (boilerplate guard — they contribute df² pair rows
    while signalling nothing pair-specific). All-integer output;
    islands windows partition on (doc_a, doc_b, diagonal), never
    global."""
    return spans.verbatim_span_pairs(io.load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# 3. RA link prediction over the small-basket co-purchase graph
# ---------------------------------------------------------------------------


@register(
    "ra_linkpred_smallbasket",
    tags=("NS-graph", "O-11", "O-12"),
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ok AS (SELECT l_orderkey FROM li GROUP BY 1 HAVING COUNT(*) <= 2),
li2 AS (SELECT li.* FROM li JOIN ok USING (l_orderkey)),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM li2 a JOIN li2 b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
b AS MATERIALIZED (SELECT p1 AS src, p2 AS dst FROM e UNION ALL SELECT p2, p1 FROM e),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM b GROUP BY src),
w AS (
  SELECT a.dst AS p_a, b2.dst AS p_b, 1000000000 // d.deg AS contrib
  FROM b a
  JOIN b b2 ON a.src = b2.src AND a.dst < b2.dst
  JOIN deg d ON d.src = a.src
),
s AS (
  SELECT p_a, p_b, CAST(SUM(contrib) AS BIGINT) AS ra_scaled
  FROM w GROUP BY 1, 2
)
SELECT s.p_a, s.p_b, s.ra_scaled FROM s
WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.p1 = s.p_a AND e.p2 = s.p_b)
""",
)
def ra_linkpred_smallbasket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resource-Allocation link prediction (Zhou/Lü/Zhang's RA index —
    operators/graph.py::ra_link_prediction) over the SMALL-BASKET
    co-purchase graph: edges only from orders with ≤2 distinct parts.
    The basket cap is the market-basket analogue of the gram-df guard:
    the fixture's full co-purchase graph has median degree ~115 (every
    big order is a clique), where RA degenerates to ~all-pairs (100 M
    rows at sf0.1) and every score is hub-noise; 2-item baskets are the
    strongest pairwise signal. Yields 508/4526/47318 predicted pairs at
    sf0.001/0.01/0.1 — non-degenerate at every SF. Integer scale div
    deg contributions (exact, unlike Adamic-Adar's 1/log), anti-join
    removes existing edges.

    Scale: the basket filter is one size(ps) predicate on the shared
    order_part_sets aggregate; then ONE wedge self-join keyed on center
    ids with per-center deg² work bounded by the cap."""
    li = io.load_table(spark, sf_dir, "lineitem")
    sets_df = graph.order_part_sets(li).filter(F.size("ps") <= 2)
    return graph.ra_link_prediction(graph.edges_from_sets(sets_df))


# ---------------------------------------------------------------------------
# 4. PMI collocations
# ---------------------------------------------------------------------------


@register(
    "pmi_collocations_topk",
    tags=("NS-curation", "O-31", "O-06"),
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bgs AS (
  SELECT t[i] AS prev, t[i + 1] AS cur
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
),
c AS (SELECT prev, cur, COUNT(*) AS n_pairs FROM bgs GROUP BY 1, 2),
pm AS (SELECT prev, CAST(SUM(n_pairs) AS BIGINT) AS c_prev FROM c GROUP BY 1),
cm AS (SELECT cur, CAST(SUM(n_pairs) AS BIGINT) AS c_cur FROM c GROUP BY 1),
tot AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS n_total FROM c),
sc AS (
  SELECT c.prev, c.cur, c.n_pairs,
         CAST((((c.n_pairs * 1000000) // pm.c_prev) * tot.n_total)
              // cm.c_cur AS BIGINT) AS pmi_scaled
  FROM c JOIN pm USING (prev) JOIN cm USING (cur) CROSS JOIN tot
  WHERE c.n_pairs >= 5
)
SELECT prev, cur, CAST(n_pairs AS BIGINT) AS n_pairs, pmi_scaled,
       CAST(row_number() OVER (ORDER BY pmi_scaled DESC, prev, cur)
            AS BIGINT) AS rnk
FROM sc
QUALIFY rnk <= 20
""",
)
def pmi_collocations_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by scaled rational PMI
    (operators/lm.py::pmi_collocations): the log is dropped (monotone)
    and c_ab·N/(c_prev·c_cur) is carried as two staged truncating
    integer divisions — hash-exact, no libm. Marginals are the bigram
    row/column sums of ONE pair-count aggregate; min_count=5 floors the
    hapax pairs bare PMI famously promotes (~900 qualifying pairs at
    every fixture SF). In-plan raise_error overflow guard on N·scale.

    Scale: doc_bigrams → one tiny pair-count table; marginals + the
    broadcast 1-row N re-aggregate it; TakeOrderedAndProject top-k."""
    return lm.pmi_collocations(io.load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# 5. Per-document OOV rate vs the corpus top-V vocabulary
# ---------------------------------------------------------------------------


@register(
    "vocab_oov_rate",
    tags=("NS-curation", "O-31", "O-08"),
    oracle="""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
vc AS (SELECT term, COUNT(*) AS n_occ FROM tok GROUP BY term),
vocab AS (SELECT term FROM vc ORDER BY n_occ DESC, term LIMIT 20),
agg AS (
  SELECT t.doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM tok t LEFT JOIN vocab v USING (term)
  GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_oov AS BIGINT) AS n_oov,
       CAST((n_oov * 1000) // n_tokens AS BIGINT) AS oov_permille
FROM agg
""",
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary permille against the corpus's own
    top-20 token vocabulary (operators/lm.py::vocab_oov_scores) — the
    tokenizer-coverage quality gate. vocab_size=20 because the fixture
    vocabulary is 31 terms: a size swallowing the whole vocabulary
    degenerates to all-zero OOV (the r3 degenerate-predicate audit
    applied to a parameter). Deterministic count-desc/lexicographic
    vocab cut; all-integer output.

    Scale: one term-count aggregate → TakeOrderedAndProject top-V →
    the ≤V-row vocab BROADCASTS onto the exploded tokens → one per-doc
    aggregate. At 100 TB the vocab is a stored artifact."""
    return lm.vocab_oov_scores(
        io.load_table(spark, sf_dir, "documents"), vocab_size=20
    )


# ---------------------------------------------------------------------------
# 6. Ordered conversion funnel
# ---------------------------------------------------------------------------


@register(
    "funnel_conversion",
    tags=("NS-events", "O-08", "O-11"),
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > s1.t
    AND e.ts <= s1.t + INTERVAL 86400 SECOND
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s2.t
    AND e.ts <= s2.t + INTERVAL 86400 SECOND
  GROUP BY 1
)
SELECT CAST(1 AS BIGINT) AS step_no, 'view' AS step,
       CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
UNION ALL
SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users progressing view → click → purchase IN ORDER with a 24 h
    per-step conversion window (operators/funnel.py::funnel_counts —
    greedy-earliest matching, strict-tie semantics): 15/6/3, 150/60/25,
    1500/536/217 users per stage at sf0.001/0.01/0.1 — every stage
    non-empty and strictly decreasing (an unbounded horizon degenerates
    to all-users-at-every-stage on this fixture; probed). The streaming
    twin (streaming/jobs.py::funnel_stage_stream, BOTH stateful APIs)
    emits the advance events these counts aggregate.

    Scale: one user-keyed aggregate per stage over that step's filtered
    slice joined to the ≤|users|-row previous frontier; exact integer-µs
    horizon arithmetic."""
    return funnel.funnel_counts(
        io.load_table(spark, sf_dir, "events"),
        ["view", "click", "purchase"],
        step_horizon_s=86400,
    )


# ---------------------------------------------------------------------------
# 7. Distributed embedding Gram matrix
# ---------------------------------------------------------------------------


@register(
    "embedding_gram_matrix",
    tags=("NS-similarity", "O-32", "O-08"),
    oracle="""
WITH pairs AS (
  SELECT i.i AS i, j.j AS j
  FROM UNNEST(generate_series(1, 64)) AS i(i),
       UNNEST(generate_series(1, 64)) AS j(j)
  WHERE i.i <= j.j
),
terms AS (
  SELECT p.i, p.j,
         CAST(floor(CAST(e.embedding[p.i] AS DOUBLE)
                    * CAST(e.embedding[p.j] AS DOUBLE)
                    * 1000000000.0 + 0.5) AS BIGINT) AS t
  FROM embeddings e CROSS JOIN pairs p
)
SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
       CAST(SUM(t) AS BIGINT) AS gram_scaled
FROM terms GROUP BY 1, 2
""",
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle scaled Gram / second-moment matrix of the
    embedding corpus (operators/linalg.py::embedding_gram) — the PCA /
    whitening / low-rank-compression input statistic, 2080 rows at
    d=64. Per-row terms floor(x_i·x_j·scale+0.5) in float64 (exact f32
    widening, same three IEEE ops both engines); integer summation
    after — partition-order invariant, pinned by a repartition-
    invariance test. DECIMAL(38,0) merge refuses BIGINT overflow.

    Scale: map-side-combine in mapInPandas — ONE d×d int64 accumulator
    per partition in constant-memory slabs; the shuffle carries
    |partitions|·2080 tiny rows; no embedding vector ever moves. The
    driver-side power-iteration consumer (gram_top_component) turns the
    collected 33 KB triangle into the top eigenpair."""
    return linalg.embedding_gram(io.load_table(spark, sf_dir, "embeddings"))
