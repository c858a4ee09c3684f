"""Round-7 registrations: the round-6 operator queue promoted to
driver-checked queries (VERDICT r6 item 1) — the stream-stream interval
join's batch twin, bigram-LM surprisal, calendar-aware seasonal residual
anomalies, embedding SimHash-LSH near-dup pairs, BFS blast radius, the
prioritized token-budget mixture waterfall — plus the batch replay of
the ONLINE MinHash-LSH candidate stream (its horizon-bounded candidate
set, giving the ingest-time near-dup tier a driver-visible hash check).

Every oracle here was VALIDATED against the Spark side in tests before
registration (tests/test_lm.py, test_mixture.py, test_round6.py,
test_simhash_embedding.py, test_round7.py — the "paste, don't debug"
discipline from PLANS.md's round-6 handoff).

Determinism discipline (SURVEY.md §5.2): integer/string end to end
except the two emitted ratios (bigram surprisal, SimHash cosine), both
of which divide exact integers / element-ordered double folds as the
final op and round via the portable ``r4``/``sql_r4``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.functions.numeric import (
    scaled_long,
    sql_r4,
    sql_scaled_long,
)
from kinesis_stream_video_project_spark.functions.text import tokens
from kinesis_stream_video_project_spark.operators import (
    graph,
    lm,
    mixture,
    similarity,
    stats,
)
from kinesis_stream_video_project_spark.operators.dedup import banded_bucket_keys
from kinesis_stream_video_project_spark.plans.queries_llm import (
    _dd_cosine,
    dd_lsh_banded_cte,
)
from kinesis_stream_video_project_spark.plans.registry import register


# ---------------------------------------------------------------------------
# 1. Stream-stream interval join, batch twin (O-11/O-13 streaming form)
# ---------------------------------------------------------------------------


@register(
    "error_followup_pairs",
    tags=("NS-watchdog", "O-11", "O-13"),
    oracle="""
SELECT t.user_id,
       t.event_id AS trigger_event_id,
       r.event_id AS response_event_id,
       epoch_us(r.ts) - epoch_us(t.ts) AS lag_us
FROM events t
JOIN events r
  ON r.user_id = t.user_id
 AND t.event_type = 'error' AND r.event_type = 'purchase'
 AND r.ts > t.ts
 AND epoch_us(r.ts) - epoch_us(t.ts) <= 14400000000
""",
)
def error_followup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every (error, purchase) event pair per user with the purchase
    inside 4 h of the error — the batch twin of the STREAM-STREAM
    interval self-join (streaming/jobs.py::followup_join_stream, whose
    executed-plan state-cleanup predicates are pinned in
    tests/test_streaming.py; the `t_ts + INTERVAL` range shape is what
    keeps the symmetric hash join's state bounded — a `timestampadd()`
    condition silently disables watermark-based cleanup).

    Scale: an equi-join on user_id with the interval as a residual
    predicate — ONE shuffle of each filtered side; per-key work is
    bounded by the signal's own sparsity (12/141/1466 pairs at
    sf0.001/0.01/0.1)."""
    from kinesis_stream_video_project_spark.streaming.jobs import (
        followup_pairs_batch,
    )

    return followup_pairs_batch(io.load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# 2. Bigram-LM surprisal (O-31 conditional quality gate)
# ---------------------------------------------------------------------------


@register(
    "bigram_surprisal_score",
    tags=("NS-curation", "O-31"),
    oracle="""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bgs AS (
  SELECT doc_id, t[i] AS prev, t[i + 1] AS cur
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
),
bgc AS (SELECT prev, cur, COUNT(*) AS c_bigram FROM bgs GROUP BY 1, 2),
pc AS (SELECT prev, CAST(SUM(c_bigram) AS BIGINT) AS c_prev FROM bgc GROUP BY 1),
s AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         SUM(CAST((pc.c_prev * 1000000000) // bgc.c_bigram AS HUGEINT)) AS s
  FROM bgs JOIN bgc USING (prev, cur) JOIN pc USING (prev)
  GROUP BY doc_id
)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       (floor((CAST(s AS DOUBLE) / n_bigrams / 1000000000.0) * 10000.0 + 0.5)
        / 10000.0) AS surprisal
FROM s
""",
)
def bigram_surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram surprisal under the self-corpus conditional
    model (operators/lm.py::bigram_surprisal): mean scaled inverse
    P̂(cur|prev) over adjacent token pairs — the conditional upgrade of
    the unigram surprisal_score gate, catching shuffled/boilerplate text
    whose unigram profile looks normal. Rational scaled-integer terms
    summed as DECIMAL(38,0) (no log/float order hazard; the DuckDB twin
    promotes to HUGEINT), ``r4`` division as the only emitted float.

    Output contract: <2-token docs emit NO row (documented drop — a
    gating consumer LEFT joins and decides the missing-row policy).

    Scale: two key-shuffled aggregates (bigram counts; prev marginal
    DERIVED from them) + the join back onto the exploded pairs — the
    Zipf-hot prev key takes the registered salted-join lever at
    stopword-skew scale (surprisal_score_salted precedent)."""
    return lm.bigram_surprisal(io.load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# 3. Seasonal residual anomalies (calendar-aware robust detector)
# ---------------------------------------------------------------------------


@register(
    "seasonal_value_anomalies",
    tags=("NS-watchdog", "O-08", "O-25"),
    oracle=f"""
WITH vu AS (
  SELECT event_id, event_type, CAST(hour(ts) AS BIGINT) AS season,
         {sql_scaled_long("value", 10**6)} AS vu
  FROM events WHERE value IS NOT NULL
),
cnt AS (SELECT event_type, season, vu AS v, COUNT(*) AS w FROM vu GROUP BY 1,2,3),
cum AS (
  SELECT event_type, season, v,
         SUM(w) OVER (PARTITION BY event_type, season ORDER BY v) AS cw,
         SUM(w) OVER (PARTITION BY event_type, season) AS tw
  FROM cnt
),
med AS (
  SELECT event_type, season, MIN(CASE WHEN 2*cw >= tw THEN v END) AS med
  FROM cum GROUP BY 1, 2
),
dev AS (
  SELECT v.event_type, v.season, ABS(v.vu - m.med) AS dv
  FROM vu v JOIN med m USING (event_type, season)
),
dcnt AS (SELECT event_type, season, dv, COUNT(*) AS w FROM dev GROUP BY 1,2,3),
dcum AS (
  SELECT event_type, season, dv,
         SUM(w) OVER (PARTITION BY event_type, season ORDER BY dv) AS cw,
         SUM(w) OVER (PARTITION BY event_type, season) AS tw
  FROM dcnt
),
mad AS (
  SELECT event_type, season, MIN(CASE WHEN 2*cw >= tw THEN dv END) AS mad
  FROM dcum GROUP BY 1, 2
)
SELECT v.event_id, v.event_type, v.season, v.vu, med.med, mad.mad
FROM vu v JOIN med USING (event_type, season) JOIN mad USING (event_type, season)
WHERE ABS(v.vu - med.med) > 4 * mad.mad
""",
)
def seasonal_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-aware robust anomalies on the events metric
    (operators/stats.py::seasonal_residual_flags): learn a per-
    (event_type, hour-of-day) median ± MAD baseline on the micro-scaled
    value and flag rows past 4·MAD — a nightly job spiking at 03:00 is
    NORMAL at 03:00 and anomalous at 14:00, which the flat per-key
    rolling_zscore threshold cannot express. All-integer (two exact
    median walks + an integer comparison) → hash-exact.

    Scale: the median walks partition on (event_type, season) — finer
    than per-key, so MORE parallel; the learned baseline is a
    |keys × 24|-row table broadcast back onto the stream of rows (the
    train-batch/score-stream split is seasonal_flags_stream, flag-set
    equality pinned in tests)."""
    e = io.load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    df = e.select(
        "event_id",
        "event_type",
        "ts",
        scaled_long(F.col("value"), 10**6).alias("vu"),
    )
    return stats.seasonal_residual_flags(
        df,
        key_cols=["event_type"],
        season_col=F.hour("ts").cast("long"),
        value_col="vu",
        id_cols=["event_id"],
    )


# ---------------------------------------------------------------------------
# 4. Embedding SimHash-LSH near-dup pairs (O-29/O-30 label-blind tier)
# ---------------------------------------------------------------------------


def _dd_simhash_pairs_sql(threshold: float) -> str:
    """DuckDB replay of the full SimHash AND-OR pipeline. The ±1 sign
    literals are serialized from the SAME
    :func:`similarity.hyperplane_signs` call the Spark plan embeds (a
    2048-char bitstring: plane p, component i at position p·64+i,
    1-based), so the two cannot drift. Integer projections (scaled
    components × signs, BIGINT sums) → exact bucket ids → (table,
    bucket) candidate self-join → the element-ordered cosine verify
    shared with embedding_near_dup's oracle."""
    signs = similarity.hyperplane_signs(32, 64)
    bits = "".join(
        "1" if signs[p][i] == 1 else "0" for p in range(32) for i in range(64)
    )
    return f"""
WITH sc AS (
  SELECT vec_id, i.i AS i,
         {sql_scaled_long("CAST(embedding[i.i] AS DOUBLE)", 10**6)} AS e
  FROM embeddings, UNNEST(generate_series(1, 64)) AS i(i)
),
sg AS (
  SELECT p.p AS p, i.i AS i,
         CASE WHEN substr('{bits}', p.p * 64 + i.i, 1) = '1'
              THEN 1 ELSE -1 END AS sgn
  FROM UNNEST(generate_series(0, 31)) AS p(p),
       UNNEST(generate_series(1, 64)) AS i(i)
),
proj AS (
  SELECT sc.vec_id, sg.p, SUM(sc.e * sg.sgn) AS v
  FROM sc JOIN sg USING (i) GROUP BY 1, 2
),
buckets AS (
  SELECT vec_id, p // 8 AS tbl,
         SUM(CASE WHEN v > 0 THEN (1::BIGINT << (p % 8)) ELSE 0 END) AS bucket
  FROM proj GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM buckets a
  JOIN buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket
               AND a.vec_id < b.vec_id
),
verified AS (
  SELECT c.vec_a, c.vec_b,
         {sql_r4(_dd_cosine("ea.embedding", "eb.embedding"))} AS cos_sim
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.vec_a
  JOIN embeddings eb ON eb.vec_id = c.vec_b
)
SELECT vec_a, vec_b, cos_sim FROM verified WHERE cos_sim >= {threshold}
"""


@register(
    "simhash_bucket_pairs",
    tags=("O-29", "O-30"),
    oracle=_dd_simhash_pairs_sql(0.3),
)
def simhash_bucket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-blind embedding near-dup pairs via random-hyperplane SimHash
    in the AND-OR construction (similarity.simhash_embedding_near_dups,
    4 tables × 8 planes): integer signatures from md5-derived ±1 sign
    literals over portable-scaled components (bit-stable bucket ids —
    no float summation order anywhere), (table, bucket)-keyed id-only
    candidate join, exact-cosine verification.

    Threshold 0.3, not the 0.9 a production gate would use: the fixture
    embeddings are synthetic random vectors with NO planted near-dups
    (max pairwise cosine ≈ 0.48-0.51 at every SF — the
    embedding_near_dup 0.35 rationale), so 0.9 would hash an empty set
    (the r3-verdict degenerate-match trap). 0.3 yields 67/58/1134
    verified pairs at sf0.001/0.01/0.1 — the full bucket→join→verify
    chain produces real rows at every SF; the operator default stays
    0.9 for real corpora.

    Scale: signature projection rides whole-stage codegen (tables ×
    planes × dims integer mul-adds per row); the only shuffle carries
    (id, table, bucket) 24 B rows, never embeddings; exact cosine runs
    only within buckets."""
    e = io.load_table(spark, sf_dir, "embeddings")
    return similarity.simhash_embedding_near_dups(e, threshold=0.3)


# ---------------------------------------------------------------------------
# 5. BFS blast radius (k-hop neighborhood over the co-purchase graph)
# ---------------------------------------------------------------------------


@register(
    "copurchase_blast_radius",
    tags=("NS-graph", "O-11", "O-12"),
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
b AS MATERIALIZED (SELECT p1 AS src, p2 AS dst FROM e UNION ALL SELECT p2, p1 FROM e),
v0 AS (SELECT CAST(p AS BIGINT) AS p FROM (VALUES (1), (2)) t(p)),
f1 AS MATERIALIZED (
  SELECT DISTINCT b.dst AS p FROM b
  WHERE b.src IN (SELECT p FROM v0) AND b.dst NOT IN (SELECT p FROM v0)
),
f2 AS (
  SELECT DISTINCT b.dst AS p FROM b
  WHERE b.src IN (SELECT p FROM f1)
    AND b.dst NOT IN (SELECT p FROM v0)
    AND b.dst NOT IN (SELECT p FROM f1)
)
SELECT p AS part_id, 0 AS hops FROM v0
UNION ALL SELECT p, 1 FROM f1
UNION ALL SELECT p, 2 FROM f2
""",
)
def copurchase_blast_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BFS hop distances (graph.bfs_hops) from parts {1, 2} over
    the undirected co-purchase graph, horizon 2 hops — "which parts sit
    within k co-purchase hops of the recalled set", the blast-radius
    primitive. Hop levels are set-exact integers with no arithmetic (the
    oracle unrolls the same rounds as chained CTEs, MATERIALIZED so
    DuckDB doesn't re-derive the edge pipeline per round).

    Scale: adjacency materialized ONCE; each round is one broadcast-
    frontier join + distinct + anti-join against the visited set
    (drop broadcast_frontier for expander graphs — the broadcast_ranks
    trade); empty-frontier short-circuit."""
    edges = graph.copurchase_edges(io.load_table(spark, sf_dir, "lineitem"))
    src = spark.createDataFrame([(1,), (2,)], "p bigint")
    return graph.bfs_hops(edges, src, max_hops=2).select(
        F.col("p").alias("part_id"), "hops"
    )


# ---------------------------------------------------------------------------
# 6. Prioritized token-budget waterfall (training-mixture assembly)
# ---------------------------------------------------------------------------


@register(
    "token_budget_waterfall",
    # NO O-16 tag, deliberately (PLANS.md round-6c note): the operator's
    # single unpartitioned window runs over the |sources|-row ledger — a
    # deliberate tiny-window, and tagging O-16 would trip the registry-wide
    # no-unpartitioned-window pin that tag keys on.
    tags=("NS-curation", "O-08"),
    oracle="""
WITH d AS (
  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
bud AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 3 AS b FROM d),
tot AS (
  SELECT source, SUM(n_tokens) AS src_tokens, COUNT(*) AS src_docs FROM d GROUP BY source
),
led AS (
  SELECT source, src_tokens, src_docs,
         greatest(0, least((SELECT b FROM bud)
                             - (SUM(src_tokens) OVER (ORDER BY source) - src_tokens),
                           src_tokens)) AS remaining
  FROM tot
),
part AS (
  SELECT d.source,
         CAST(COUNT(*) AS BIGINT) AS n_docs_taken,
         CAST(SUM(n_tokens) AS BIGINT) AS tokens_taken
  FROM (
    SELECT d.source, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY d.source ORDER BY doc_id) AS cum,
           led.remaining
    FROM d JOIN led USING (source)
    WHERE led.remaining > 0 AND led.remaining < led.src_tokens
  ) d
  WHERE cum <= remaining
  GROUP BY d.source
)
SELECT source,
       CAST(src_docs AS BIGINT) AS n_docs_taken,
       CAST(src_tokens AS BIGINT) AS tokens_taken
FROM led WHERE remaining >= src_tokens
UNION ALL
SELECT source, n_docs_taken, tokens_taken FROM part
UNION ALL
SELECT source, 0, 0 FROM led WHERE remaining <= 0 AND src_tokens > 0
UNION ALL
SELECT source, 0, 0 FROM led
WHERE remaining > 0 AND remaining < src_tokens
  AND source NOT IN (SELECT source FROM part)
""",
)
def token_budget_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prioritized token-budget waterfall (operators/mixture.py::
    budget_fill): fill a global budget of ⌊total/3⌋ tokens from sources
    in ascending name order, whole documents in doc_id order, first gap
    stops the source, boundary remainder FORFEITED (the reproducible-
    mixture semantics — rolling it forward would couple every later
    source's take to one boundary doc). One (source, n_docs_taken,
    tokens_taken) row per source.

    The budget is derived from a 1-row total aggregate read on the
    driver (bounded driver action, the freqItems/pagerank-guard
    precedent) so the same registration is non-degenerate at every SF;
    the oracle derives the identical integer via a scalar subquery.

    Scale: the two-phase global-threshold discipline — the only
    unpartitioned window is over the |sources|-row ledger; the single
    boundary source's doc-level cumulative is source-partitioned."""
    d = io.load_table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source", "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    total = per_doc.agg(F.sum("n_tokens")).first()[0]
    return mixture.budget_fill(per_doc, budget_tokens=int(total) // 3)


# ---------------------------------------------------------------------------
# 7. Online MinHash-LSH candidate stream — batch replay (O-29 ingest tier)
# ---------------------------------------------------------------------------

_NEARDUP_HORIZON_US = 2 * 3600 * 1_000_000


@register(
    "near_dup_candidates_horizon",
    tags=("O-29", "O-21"),
    oracle=f"""
WITH {dd_lsh_banded_cte()},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b FROM cand
WHERE (doc_b - doc_a) * 60000000 <= {_NEARDUP_HORIZON_US}
""",
)
def near_dup_candidates_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horizon-bounded MinHash-LSH candidate pairs — the BATCH REPLAY of
    the online ingest-time near-dup stream (streaming/jobs.py::
    near_dup_candidates_stream and its transformWithState twin): with
    rows arriving in event-time order, the stream's per-(band, bucket)
    member state emits exactly the pairs that share a band bucket within
    the time horizon (GroupState ≡ TWS ≡ this set, pinned in
    tests/test_streaming.py). Registering the replay puts the online
    tier under the driver's hash gate — doc timestamps are synthesized
    deterministically (doc_id minutes apart) since the fixture corpus
    is timeless, horizon 2 h ⇒ pairs ≤ 120 ids apart: 93/65/686
    candidate pairs at sf0.001/0.01/0.1, a strict non-degenerate subset
    of the unbounded candidate sets (187/177/14029).

    Scale: the same banded staging as the batch tier
    (dedup.banded_bucket_keys — id+ts rows through the bucket shuffle,
    never documents); the stream form's state is bounded by bucket
    arrival rate × horizon, this replay by the same pair sparsity."""
    d = io.load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        (F.col("doc_id") * F.lit(60_000_000)).alias("ts_us"),
    )
    # Repartition on the join key so both self-join sides share ONE
    # exchange (ReuseExchange): the expensive part is the staging
    # (tokenize → shingle md5 → 24 minhashes → band fold), and without
    # the explicit shuffle Spark broadcasts one side and computes the
    # whole signature pipeline twice (r7 plan audit).
    b = banded_bucket_keys(d, extra_cols=("ts_us",)).repartition("bucket")
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(y, "bucket")
        .filter(
            (F.col("x.doc_id") < F.col("y.doc_id"))
            & (
                F.col("y.ts_us") - F.col("x.ts_us")
                <= F.lit(_NEARDUP_HORIZON_US)
            )
            & (
                F.col("x.ts_us") - F.col("y.ts_us")
                <= F.lit(_NEARDUP_HORIZON_US)
            )
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
        )
        .distinct()
    )
