"""Round-9 registrations shipped EARLY inside the round-8 window (the
round-7 precedent: window slots spent on queries that have NEVER had a
driver hash row dominate slots spent re-verifying green ones): the
Bloom decontamination audit, trigram stupid backoff, the n-gram
novelty curve, the two-stage SQ8 rerank, token-bucket rate limiting
(the 7th both-stateful-API op's batch twin), and audio silence runs.
Every oracle was VALIDATED bit-exact at sf0.001/0.01/0.1 in
tests/test_r9_queue.py before registration; the deferred r4-cohort
slots each have a named r5+-green sibling covering the same operator
family (see registry.DRIVER_PRIORITY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators import (
    bloom,
    lm,
    multimodal,
    ratelimit,
)
from kinesis_stream_video_project_spark.operators import dedup as dd
from kinesis_stream_video_project_spark.operators import similarity as sim
from kinesis_stream_video_project_spark.operators.sampling import hash_bucket
from kinesis_stream_video_project_spark.plans.registry import register

# ---------------------------------------------------------------------------
# 1. Bloom-filter decontamination audit (with FP accounting)
# ---------------------------------------------------------------------------


@register(
    "bloom_decontaminate",
    tags=("NS-curation", "O-29", "O-09"),
    oracle="""
WITH doc_grams AS (
  SELECT doc_id,
         UNNEST(list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 4, 1)),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 4), ' ')
         ))) AS g
  FROM documents
),
doc_grams5 AS (
  SELECT doc_id, g FROM doc_grams WHERE len(string_split(g, ' ')) = 5
),
ev AS (
  SELECT DISTINCT g FROM doc_grams5
  WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100) >= 90
),
bits AS (
  SELECT DISTINCT UNNEST([
    ('0x' || substr(md5(g), 1, 5))::BIGINT % 65536,
    ('0x' || substr(md5(g), 6, 5))::BIGINT % 65536,
    ('0x' || substr(md5(g), 11, 5))::BIGINT % 65536
  ]) AS p
  FROM ev
),
tg AS (
  SELECT doc_id, g FROM doc_grams5
  WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100) < 80
),
probed AS (
  SELECT doc_id, g,
         CASE WHEN ('0x' || substr(md5(g), 1, 5))::BIGINT % 65536 IN (SELECT p FROM bits)
               AND ('0x' || substr(md5(g), 6, 5))::BIGINT % 65536 IN (SELECT p FROM bits)
               AND ('0x' || substr(md5(g), 11, 5))::BIGINT % 65536 IN (SELECT p FROM bits)
              THEN 1 ELSE 0 END AS bloom,
         CASE WHEN g IN (SELECT g FROM ev) THEN 1 ELSE 0 END AS tru
  FROM tg
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(bloom) AS BIGINT) AS n_bloom_hits,
       CAST(SUM(tru) AS BIGINT) AS n_true_hits,
       CAST(SUM(bloom) - SUM(tru) AS BIGINT) AS n_false_positives
FROM probed GROUP BY doc_id
""",
)
def bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-tier eval decontamination AUDIT on the standard hash split
    (train <80 / eval ≥90 — the decontaminate_ngram_overlap split):
    per train doc, its 5-gram count, Bloom-filter hits (m=2^16, k=3,
    portable md5 bit positions), EXACT hits, and the measured
    false-positive overcount (operators/bloom.py). The FP column is
    the point: a production pipeline trades the exact gram join for an
    m/8-byte broadcast and must know what that costs ON ITS DATA —
    probed 47/30/69561 FPs at sf0.001/0.01/0.1 (m deliberately sized
    so sf0.1 saturates the filter; the no-false-negative law is
    hypothesis-pinned). The row-local bitmap form
    (bloom_scores_rowlocal — O(1) element_at + bitwiseAND on a one-row
    dense word array, streaming-capable, drain-tested) makes the same
    decisions bit-identically (pinned).

    Scale: eval reduces to ≤3·|eval grams| distinct positions + the
    distinct gram set, both broadcast; the train side explodes once and
    aggregates on the colocated doc_id — zero corpus shuffle."""
    d = io.load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    return bloom.bloom_decontaminate(d.filter(b < 80), d.filter(b >= 90))


# ---------------------------------------------------------------------------
# 2. Trigram stupid backoff
# ---------------------------------------------------------------------------


@register(
    "stupid_backoff_score",
    tags=("NS-curation", "O-31"),
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
),
tric AS (SELECT w1, w2, w3, COUNT(*) AS c123 FROM pos GROUP BY 1, 2, 3),
trik AS (SELECT * FROM tric ORDER BY c123 DESC, w1, w2, w3 LIMIT 2000),
big AS (
  SELECT t[i] AS b1, t[i+1] AS b2, COUNT(*) AS cb
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i) GROUP BY 1, 2
),
bik AS (SELECT * FROM big ORDER BY cb DESC, b1, b2 LIMIT 500),
uni AS (
  SELECT w, COUNT(*) AS cu
  FROM (SELECT UNNEST(t) AS w FROM toks) GROUP BY 1
),
nt AS (SELECT CAST(SUM(cu) AS BIGINT) AS n FROM uni),
sc AS (
  SELECT p.doc_id,
         CASE WHEN tk.c123 IS NOT NULL THEN 'tri'
              WHEN bk.cb IS NOT NULL THEN 'bi' ELSE 'uni' END AS pth,
         CASE WHEN tk.c123 IS NOT NULL THEN (tk.c123 * 1000000) // bg.cb
              WHEN bk.cb IS NOT NULL
                THEN (((bk.cb * 1000000) // u2.cu) * 2) // 5
              ELSE (((u3.cu * 1000000) // nt.n) * 4) // 25 END AS term
  FROM pos p
  LEFT JOIN trik tk ON tk.w1 = p.w1 AND tk.w2 = p.w2 AND tk.w3 = p.w3
  LEFT JOIN big bg ON bg.b1 = p.w1 AND bg.b2 = p.w2
  LEFT JOIN bik bk ON bk.b1 = p.w2 AND bk.b2 = p.w3
  JOIN uni u2 ON u2.w = p.w2
  JOIN uni u3 ON u3.w = p.w3
  CROSS JOIN nt
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_positions,
       CAST(SUM(CASE WHEN pth = 'tri' THEN 1 ELSE 0 END) AS BIGINT) AS n_tri,
       CAST(SUM(CASE WHEN pth = 'bi' THEN 1 ELSE 0 END) AS BIGINT) AS n_bi,
       CAST(SUM(CASE WHEN pth = 'uni' THEN 1 ELSE 0 END) AS BIGINT) AS n_uni,
       CAST(SUM(term) AS BIGINT) AS score_scaled
FROM sc GROUP BY doc_id
""",
)
def stupid_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document trigram STUPID BACKOFF score under a budget-pruned
    self-corpus model (operators/lm.py::stupid_backoff_scores; Brants
    et al., EMNLP 2007 — the count LM actually used at web scale):
    S(w3|w1w2) backs off tri → bi → uni with factor 0.4 (= ·2 div 5
    exactly), model pruned by BUDGET (top-2000 trigrams / top-500
    bigrams by count desc + lexicographic) — probed: an absolute
    min-count cannot keep all three paths live across corpus sizes
    (every fixture bigram has c ≥ 3 at sf0.1); budgets do, and all
    three path counters are non-zero at every SF (asserted in the
    gate test). Staged truncating integer divisions; python-replay
    property-pinned.

    Scale: model tables are tiny aggregates of the one corpus scan
    (budget cuts order the MODEL table, never the corpus) and ALL
    broadcast; the only corpus shuffle is the per-doc aggregate."""
    return lm.stupid_backoff_scores(io.load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# 3. N-gram novelty (the dedup-yield curve)
# ---------------------------------------------------------------------------


@register(
    "ngram_novelty",
    tags=("NS-dedup", "O-29", "O-31"),
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
posts AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gh
  FROM (
    SELECT doc_id,
           UNNEST(list_transform(
             generate_series(1, len(t) - 7),
             i -> array_to_string(list_slice(t, i, i + 7), ' ')
           )) AS g
    FROM toks WHERE len(t) >= 8
  )
),
fst AS (SELECT gh, MIN(doc_id) AS fd FROM posts GROUP BY 1)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST((SUM(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) * 1000)
            // COUNT(*) AS BIGINT) AS novelty_permille
FROM posts JOIN fst USING (gh) GROUP BY doc_id
""",
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 8-gram NOVELTY in doc_id (ingestion) order
    (operators/dedup.py::ngram_novelty): of a doc's distinct 8-grams,
    the share appearing in NO earlier document — the dedup-yield /
    crawl-exhaustion curve (Lee et al. report exactly this statistic);
    novelty 0 = fully covered by predecessors. Both tails non-empty at
    every SF (planted dup clusters give <1000 rows; fresh docs give
    =1000 rows — asserted in the gate test). All-integer permille.

    Scale: distinct (doc, 8-byte gram-hash) postings shuffle once on
    the hash; the min-doc aggregate and the join back share that one
    exchange (explicit repartition → ReuseExchange); per-doc aggregate
    on the colocated doc_id."""
    return dd.ngram_novelty(io.load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# 4. Two-stage SQ8 shortlist → exact rerank
# ---------------------------------------------------------------------------


@register(
    "sq8_rerank_topk",
    tags=("NS-similarity", "O-30"),
    oracle="""
WITH bounds AS (
  SELECT i.i AS dim, MIN(CAST(e.embedding[i.i] AS DOUBLE)) AS mn,
         MAX(CAST(e.embedding[i.i] AS DOUBLE)) AS mx
  FROM embeddings e, UNNEST(generate_series(1, 64)) AS i(i)
  GROUP BY i.i
),
codes AS (
  SELECT v.vec_id, i.i AS dim,
         CASE WHEN b.mx = b.mn THEN 0
              ELSE CAST(floor((CAST(v.embedding[i.i] AS DOUBLE) - b.mn)
                              / (b.mx - b.mn) * 254.0 + 0.5) AS BIGINT) - 127
         END AS code
  FROM embeddings v, UNNEST(generate_series(1, 64)) AS i(i)
  JOIN bounds b ON b.dim = i.i
),
q_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id,
         CAST(SUM(q.code * c.code) AS BIGINT) AS score_q
  FROM codes q JOIN codes c USING (dim)
  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY score_q DESC, vec_id) AS r
    FROM q_scored
  ) WHERE r <= 50
),
reranked AS (
  SELECT s.query_id, s.vec_id,
         (floor((
            list_sum(list_transform(generate_series(1, 64),
              i -> CAST(qv.embedding[i] AS DOUBLE) * CAST(cv.embedding[i] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(qv.embedding[i] AS DOUBLE) * CAST(qv.embedding[i] AS DOUBLE))))
               * sqrt(list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(cv.embedding[i] AS DOUBLE) * CAST(cv.embedding[i] AS DOUBLE)))))
          ) * 10000.0 + 0.5) / 10000.0) AS cos_sim
  FROM short s
  JOIN embeddings qv ON qv.vec_id = s.query_id
  JOIN embeddings cv ON cv.vec_id = s.vec_id
)
SELECT query_id, vec_id, cos_sim,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
       ) AS BIGINT) AS rank
FROM reranked
QUALIFY rank <= 10
""",
)
def sq8_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage ANN retrieval (operators/similarity.py::
    sq8_rerank_topk): int8 scalar-quantized shortlist of 50 (corpus
    per-dim [min, max] codebook, BIGINT code dot products — exact in
    any engine) → EXACT cosine rerank to top-10 — the coarse-to-fine
    pattern of every production vector store (SQ is the entry tier of
    the FAISS storage hierarchy, Jégou et al. TPAMI 2011). Pinned:
    rerank recall@10 dominates raw SQ8 recall (stage 2 fixes quantized
    ordering, never adds misses); quantization replay property-pinned;
    query set = vec_id < 5 (the cosine_topk convention).

    Scale: the codebook is ONE broadcast row; stage 1 scans stored
    int8 codes (4× smaller than f32); stage 2 touches the cold f32
    column for shortlist·|queries| rows only."""
    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sim.sq8_rerank_topk(q, e, k=10, shortlist=50)


# ---------------------------------------------------------------------------
# 5. Token-bucket rate limiting (batch twin of the 7th both-API op)
# ---------------------------------------------------------------------------


@register(
    "rate_limit_decisions",
    tags=("NS-events", "O-22"),
    oracle="""
WITH RECURSIVE ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
fold AS (
  SELECT user_id, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS tokens_us,
         CAST(-1 AS BIGINT) AS last_us,
         CAST(NULL AS BIGINT) AS ts_us, CAST(NULL AS BIGINT) AS event_id,
         CAST(NULL AS BOOLEAN) AS admitted
  FROM (SELECT DISTINCT user_id FROM ev)
  UNION ALL
  SELECT e.user_id, e.rn,
         CASE WHEN (CASE WHEN f.last_us < 0 THEN 2000000
                    ELSE LEAST(2000000, f.tokens_us
                         + ((e.ts_us - f.last_us) * 1) // 14400) END)
                   >= 1000000
              THEN (CASE WHEN f.last_us < 0 THEN 2000000
                    ELSE LEAST(2000000, f.tokens_us
                         + ((e.ts_us - f.last_us) * 1) // 14400) END)
                   - 1000000
              ELSE (CASE WHEN f.last_us < 0 THEN 2000000
                    ELSE LEAST(2000000, f.tokens_us
                         + ((e.ts_us - f.last_us) * 1) // 14400) END)
         END,
         e.ts_us, e.ts_us, e.event_id,
         (CASE WHEN f.last_us < 0 THEN 2000000
               ELSE LEAST(2000000, f.tokens_us
                    + ((e.ts_us - f.last_us) * 1) // 14400) END)
         >= 1000000
  FROM fold f JOIN ev e ON e.user_id = f.user_id AND e.rn = f.rn + 1
)
SELECT user_id, ts_us, event_id, admitted, tokens_us AS tokens_us_after
FROM fold WHERE rn > 0
""",
)
def rate_limit_decisions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event token-bucket admission decisions (operators/
    ratelimit.py — the API-gateway ingestion-control stateful op;
    the reference's restart cooldown is the degenerate 1-token
    bucket): capacity 2, cost 1, refill 1 token/4 h, full-bucket cold
    start — parameters PROBED to a 5.3-5.7% rejection rate at every SF
    (1 token/2 h cap 3 measured 0.1-0.7%: too thin to gate anything).
    All-integer token-µs fold, shared verbatim with BOTH streaming
    stateful APIs (streaming/jobs.py::rate_limit_stream(+_tws) —
    batch ≡ GS ≡ TWS drain equality and 300-example
    chunking-invariance/bounds laws pinned); the oracle replays the
    fold as a per-key recursive CTE (the watchdog discipline).

    Scale: ONE applyInPandas pass per key; 16 B of state per key
    however long the history."""
    return ratelimit.rate_limit_decisions(
        io.load_table(spark, sf_dir, "events")
    )


# ---------------------------------------------------------------------------
# 6. Audio silence runs
# ---------------------------------------------------------------------------


@register(
    "audio_silence_runs",
    tags=("NS-multimodal", "O-32", "O-17"),
    oracle="""
WITH chars AS (SELECT doc_id, len(text) AS n, text FROM documents),
samples AS (
  SELECT doc_id, j.j AS j,
         ord(substr(text, 2*j.j - 1, 1)) + 256 * ord(substr(text, 2*j.j, 1)) AS raw
  FROM chars, UNNEST(generate_series(1, CAST(n // 2 AS BIGINT))) AS j(j)
),
signed AS (
  SELECT doc_id, j,
         CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS s
  FROM samples
),
framed AS (SELECT doc_id, (j - 1) // 64 AS frame_no, s FROM signed),
agg AS (
  SELECT doc_id, frame_no, COUNT(*) AS cnt,
         CAST(SUM(s * s) AS BIGINT) AS e
  FROM framed GROUP BY 1, 2
),
f AS (SELECT doc_id AS media_id, frame_no, e FROM agg WHERE cnt = 64),
m AS (SELECT media_id, COUNT(*) AS nf, SUM(e) AS se FROM f GROUP BY 1),
sil AS (
  SELECT f.media_id, f.frame_no
  FROM f JOIN m USING (media_id)
  WHERE f.e * 1000 * m.nf < m.se * 950
),
isl AS (
  SELECT media_id, frame_no,
         frame_no - row_number() OVER (
           PARTITION BY media_id ORDER BY frame_no) AS g
  FROM sil
)
SELECT media_id, CAST(MIN(frame_no) AS BIGINT) AS start_frame,
       CAST(MAX(frame_no) AS BIGINT) AS end_frame,
       CAST(COUNT(*) AS BIGINT) AS n_frames
FROM isl GROUP BY media_id, g
""",
)
def audio_silence_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal low-energy frame runs per media payload
    (operators/multimodal.py::audio_silence_runs) — the VAD /
    silence-trim primitive over the PCM16 frame-energy tier: a frame is
    silent below 95% of its media's mean frame energy (relative — the
    standard loudness normalization), consecutive silent frames merge.
    CROSS-MULTIPLIED integer threshold (no division anywhere) +
    gaps-and-islands per media; ~8% of fixture frames flag;
    maximality/coverage laws hypothesis-pinned.

    Scale: frames never shuffle (Arrow mapInPandas stats); one window
    pass partitioned by media_id."""
    d = io.load_table(spark, sf_dir, "documents")
    return multimodal.audio_silence_runs(multimodal.media_manifest(d))


# ---------------------------------------------------------------------------
# 7. Curation pipeline v4 — the round's gates composed end to end
# ---------------------------------------------------------------------------


@register(
    "curation_pipeline_v4",
    tags=("NS-curation", "O-29", "O-31", "O-08"),
    oracle="""
WITH tg AS (
  SELECT * FROM documents
  WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100) < 80
),
ev AS (
  SELECT * FROM documents
  WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100) >= 90
),
evg AS (
  SELECT DISTINCT array_to_string(list_slice(string_split(text, ' '), i, i + 4), ' ') AS g
  FROM ev, UNNEST(generate_series(1, greatest(len(string_split(text, ' ')) - 4, 1))) AS u(i)
  WHERE len(string_split(text, ' ')) >= 5
),
tgg AS (
  SELECT doc_id, g FROM (
    SELECT doc_id, UNNEST(list_distinct(list_transform(
      generate_series(1, greatest(len(string_split(text, ' ')) - 4, 1)),
      i -> array_to_string(list_slice(string_split(text, ' '), i, i + 4), ' ')))) AS g
    FROM tg
  ) WHERE len(string_split(g, ' ')) = 5
),
contaminated AS (SELECT DISTINCT doc_id FROM tgg WHERE g IN (SELECT g FROM evg)),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM tg),
posts AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gh
  FROM (
    SELECT doc_id, UNNEST(list_transform(generate_series(1, len(t) - 7),
           i -> array_to_string(list_slice(t, i, i + 7), ' '))) AS g
    FROM toks WHERE len(t) >= 8
  )
),
fst AS (SELECT gh, MIN(doc_id) AS fd FROM posts GROUP BY 1),
nov AS (
  SELECT doc_id, COUNT(*) AS ng,
         SUM(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) AS nn
  FROM posts JOIN fst USING (gh) GROUP BY doc_id
),
pos AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
),
tric AS (SELECT w1, w2, w3, COUNT(*) AS c FROM pos GROUP BY 1, 2, 3),
trik AS (SELECT w1, w2, w3 FROM tric ORDER BY c DESC, w1, w2, w3 LIMIT 2000),
cov AS (
  SELECT p.doc_id, COUNT(*) AS np,
         SUM(CASE WHEN k.w1 IS NOT NULL THEN 1 ELSE 0 END) AS nt
  FROM pos p LEFT JOIN trik k
    ON k.w1 = p.w1 AND k.w2 = p.w2 AND k.w3 = p.w3
  GROUP BY 1
),
kept AS (
  SELECT t.doc_id, t.source, len(string_split(t.text, ' ')) AS n_toks,
         (nov.nn * 1000) // nov.ng AS nov_pm,
         (cov.nt * 1000) // cov.np AS cov_pm
  FROM tg t
  JOIN nov ON nov.doc_id = t.doc_id
  JOIN cov ON cov.doc_id = t.doc_id
  WHERE t.doc_id NOT IN (SELECT doc_id FROM contaminated)
    AND (nov.nn * 1000) // nov.ng >= 200
    AND (cov.nt * 1000) // cov.np >= 100
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs_kept,
       CAST(SUM(n_toks) AS BIGINT) AS n_tokens_kept,
       CAST(SUM(nov_pm) // COUNT(*) AS BIGINT) AS mean_novelty_permille,
       CAST(SUM(cov_pm) // COUNT(*) AS BIGINT) AS mean_tri_permille
FROM kept GROUP BY source
""",
)
def curation_pipeline_v4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation over THIS round's gates, composed from the
    SAME registered stages a user runs individually (the v2/v3
    discipline, applied to the documents side): (1) EXACT eval-set
    decontamination — drop any train-split doc sharing a 5-gram with
    the held-out split (the decontaminate_ngram_overlap join; the
    Bloom tier is its ingest-time approximation and deliberately NOT
    the pipeline gate — at sf0.1 the m=2^16 filter saturates and its
    FPs would reject 99.7% of the corpus, which is the audit query's
    point); (2) NOVELTY floor — ngram_novelty ≥ 200‰ (drop docs whose
    8-grams are ≥80% covered by earlier docs); (3) LM-coverage gate —
    stupid-backoff tri-path coverage ≥ 100‰ (docs the budget-pruned
    model can barely trigram-cover are unrepresentative/shuffled
    text). Emits the per-source clean-corpus budget: docs, tokens, and
    all-integer mean novelty/coverage permilles. Funnel probed
    non-degenerate at every SF: 395→372, 395→365, 3965→2482 docs.

    Scale: each stage is its registered operator's plan (broadcast
    eval grams; one hash-keyed postings shuffle; broadcast model
    tables); the composition adds only doc_id-keyed joins of per-doc
    gate columns and a |sources|-row summary."""
    from kinesis_stream_video_project_spark.functions.text import tokens as _tokens

    d = io.load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    train, ev = d.filter(b < 80), d.filter(b >= 90)
    ev_grams = F.broadcast(bloom._doc_grams(ev).select("g").distinct())
    contaminated = (
        bloom._doc_grams(train)
        .join(ev_grams, "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    nov = dd.ngram_novelty(train).select("doc_id", "novelty_permille")
    cov = lm.stupid_backoff_scores(train).select(
        "doc_id",
        F.expr("CAST((n_tri * 1000) DIV n_positions AS BIGINT)").alias(
            "_cov_pm"
        ),
    )
    kept = (
        train.select(
            "doc_id", "source", F.size(_tokens(F.col("text"))).alias("_nt")
        )
        .join(contaminated, "doc_id", "left_anti")
        .join(nov, "doc_id")
        .join(cov, "doc_id")
        .filter(
            (F.col("novelty_permille") >= 200) & (F.col("_cov_pm") >= 100)
        )
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("_nt").cast("long").alias("n_tokens_kept"),
        F.expr(
            "CAST(SUM(novelty_permille) DIV COUNT(*) AS BIGINT)"
        ).alias("mean_novelty_permille"),
        F.expr("CAST(SUM(_cov_pm) DIV COUNT(*) AS BIGINT)").alias(
            "mean_tri_permille"
        ),
    )
