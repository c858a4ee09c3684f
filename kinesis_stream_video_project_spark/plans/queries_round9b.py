"""Round-9-window registrations: the r9-queue remainder (Bloom
row-local ingest scorer, standalone SQ8 top-k, neighborhood Jaccard,
clustering coefficient, RFM segmentation) plus the first five r10-queue
promotions (Count-Min audit, Good-Turing counts, join-size profile,
session CEP patterns, classification report) — the VERDICT r8 "next
round" items 2 and 3. Every oracle below is the EXACT string validated
bit-exact at sf0.001/0.01/0.1 in tests/test_r9_queue.py /
tests/test_r10_queue.py before registration (the ship-then-register
cadence, round 6 of it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators import bloom, cms, graph, lm, stats
from kinesis_stream_video_project_spark.operators import similarity as sim
from kinesis_stream_video_project_spark.operators.funnel import (
    session_pattern_matches as _session_pattern_matches,
)
from kinesis_stream_video_project_spark.operators.profiling import (
    join_size_profile as _join_size_profile,
)
from kinesis_stream_video_project_spark.operators.sampling import hash_bucket
from kinesis_stream_video_project_spark.plans.queries_llm import (
    _marker_sql,
    lang_id_ngram,
)
from kinesis_stream_video_project_spark.plans.registry import register

# ---------------------------------------------------------------------------
# 1. Bloom row-local ingest scorer (the production tier of the r8-green
#    bloom_decontaminate audit)
# ---------------------------------------------------------------------------


@register(
    "bloom_ingest_scores",
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
              THEN 1 ELSE 0 END AS bloom
  FROM tg
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(bloom) AS BIGINT) AS n_bloom_hits
FROM probed GROUP BY doc_id
""",
)
def bloom_ingest_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INGEST-TIME Bloom contamination scorer (operators/bloom.py::
    bloom_scores_rowlocal): each train-split doc tests its distinct
    5-grams against the PHYSICAL m=2^16/k=3 bitmap — a one-row
    dense array<long> of 32-bit words, O(1) element_at + bitwiseAND per
    probe —
    with NO gram explode, NO join, NO exact gram set. Decisions are
    bit-identical to the r8-green bloom_decontaminate position-set join
    (pinned), and the operator is stateless, so the SAME code scores a
    streaming frame (drain-tested). The audit form (with n_true_hits /
    FP accounting) stays the offline companion; this form is what
    actually rides an ingest pipeline.

    Scale: the filter is an m/8 = 8 KB broadcast riding every
    executor; the document stream never shuffles — the row computes
    its own verdict. That is the 100 TB decontamination story."""
    d = io.load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    return bloom.bloom_scores_rowlocal(d.filter(b < 80), d.filter(b >= 90))


# ---------------------------------------------------------------------------
# 2. Standalone SQ8 int8 top-k (stage 1 of the r8-green rerank, isolated)
# ---------------------------------------------------------------------------


@register(
    "sq8_topk",
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
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id,
         CAST(SUM(q.code * c.code) AS BIGINT) AS score_q
  FROM codes q JOIN codes c USING (dim)
  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
  GROUP BY 1, 2
)
SELECT query_id, vec_id, score_q,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY score_q DESC, vec_id
       ) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 10
""",
)
def sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 by pure INT8 scalar-quantized dot product
    (operators/similarity.py::sq8_topk) — stage 1 of the r8-green
    sq8_rerank_topk registered ALONE so the int8 tier's own ordering
    (and, in pytest, its own recall@10 ≥ 0.5 floor vs exact cosine) is
    driver-hash-checked rather than always hidden behind the f32
    rerank. Corpus per-dim [min,max] codebook; BIGINT code dot
    products (≤ 64·127² — exact in any engine); rank = (score desc,
    vec_id); query set = vec_id < 5 (the cosine_topk convention).

    Scale: codebook = ONE broadcast row; stored int8 codes are 4×
    smaller than f32 and compute in-scan; broadcast queries, one corpus
    scan, per-query window top-k."""
    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sim.sq8_topk(q, e, k=10)


# ---------------------------------------------------------------------------
# 3 + 4. Neighborhood Jaccard + clustering coefficient on the ≤3-part
#        basket graph
# ---------------------------------------------------------------------------

_GRAPH3_CTE = """
li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ok AS (SELECT l_orderkey FROM li GROUP BY 1 HAVING COUNT(*) <= 3),
li2 AS (SELECT li.* FROM li JOIN ok USING (l_orderkey)),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM li2 a JOIN li2 b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
b AS MATERIALIZED (SELECT p1 AS src, p2 AS dst FROM e UNION ALL SELECT p2, p1 FROM e),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM b GROUP BY src)
"""


def _graph3_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    # localCheckpoint the 16 B/row edge list ONCE: the wedge operators
    # fan it out to 4+ consumers on different keys (both-directions,
    # degree, wedge a/b, triangle canon), and without the checkpoint
    # every consumer re-derived it from the lineitem scan — 24 parquet
    # scans / 0 reused exchanges in the executed plan (the r8
    # multi-consumer decision rule: 3+ join keys -> checkpoint the
    # smallest projection). Measured warm at sf0.1:
    # clustering_coefficient 1.31 -> 0.71 s; neighbor_jaccard
    # 1.89 -> 1.79 s (its residual cost is the wedge join itself).
    li = io.load_table(spark, sf_dir, "lineitem")
    sets3 = graph.order_part_sets(li).filter(F.size("ps") <= 3)
    return graph.edges_from_sets(sets3).localCheckpoint()


@register(
    "neighbor_jaccard",
    tags=("NS-graph", "O-11", "O-08"),
    oracle="WITH " + _GRAPH3_CTE + """,
cm AS (
  SELECT a.dst AS p_a, b2.dst AS p_b, COUNT(*) AS n_common
  FROM b a JOIN b b2 ON a.src = b2.src AND a.dst < b2.dst
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT p_a, p_b, CAST(n_common AS BIGINT) AS n_common,
       CAST((n_common * 1000) // (da.deg + db.deg - n_common) AS BIGINT)
         AS jaccard_permille
FROM cm JOIN deg da ON da.src = p_a JOIN deg db ON db.src = p_b
""",
)
def neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural similarity for every part pair sharing ≥2 co-purchase
    neighbors on the ≤3-part basket graph (operators/graph.py::
    neighbor_jaccard): jaccard_permille = 1000·|N(a)∩N(b)| div
    (deg(a)+deg(b)−|N(a)∩N(b)|) — the companion of ra_link_prediction
    (RA predicts NEW links; this SCORES structural twins, the
    substitute-product signal). min_common=2 keeps the output
    evidence-weighted (probed 2737/4476/4864 pairs across SFs) instead
    of |wedge-pairs|-sized. Edge endpoints normalized least/greatest
    (the r8 ADVICE fix, applied here at graph.py:748).

    Scale: wedges enumerate per-center from the basket sets (row-local
    pair generation, one exchange on the pair); degree table joins by
    node — no all-pairs stage anywhere; the ≤3 basket cap IS the
    wedge-degree guard."""
    return graph.neighbor_jaccard(_graph3_edges(spark, sf_dir), min_common=2)


@register(
    "clustering_coefficient",
    tags=("NS-graph", "O-11", "O-08"),
    oracle="WITH " + _GRAPH3_CTE + """,
w AS (
  SELECT a.src AS c, a.dst AS p_a, b2.dst AS p_b
  FROM b a JOIN b b2 ON a.src = b2.src AND a.dst < b2.dst
),
tri AS (SELECT w.* FROM w JOIN e ON e.p1 = w.p_a AND e.p2 = w.p_b),
tc AS (SELECT c AS p, COUNT(*) AS nt FROM tri GROUP BY 1)
SELECT d.src AS p, CAST(d.deg AS BIGINT) AS deg,
       CAST(COALESCE(tc.nt, 0) AS BIGINT) AS n_triangles,
       CAST((COALESCE(tc.nt, 0) * 2000) // (d.deg * (d.deg - 1)) AS BIGINT)
         AS cc_permille
FROM deg d LEFT JOIN tc ON tc.p = d.src
WHERE d.deg >= 2
""",
)
def clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient (Watts/Strogatz local
    transitivity) on the ≤3-part basket graph (operators/graph.py::
    clustering_coefficient): cc_permille = 2000·tri(v) div
    (deg(v)·(deg(v)−1)) for deg ≥ 2 — "how clique-like is this part's
    co-purchase neighbourhood". The ≤3 cap is the registered tier
    because the RA registration's ≤2 cap has ZERO triangles at sf0.1
    (probed 1503/9540/89217 triangles across SFs; nonzero cc asserted).

    Scale: wedge enumeration per center + ONE semi-join of wedge
    endpoints against the edge list (triangle confirmation), then a
    per-node aggregate — the standard distributed triangle-count plan;
    the basket cap bounds wedge fan-out."""
    return graph.clustering_coefficient(_graph3_edges(spark, sf_dir))


# ---------------------------------------------------------------------------
# 5. RFM segmentation
# ---------------------------------------------------------------------------


@register(
    "rfm_segments",
    tags=("NS-stats", "O-16", "O-08"),
    oracle="""
WITH pc AS (
  SELECT o_custkey, MAX(o_orderdate) AS r,
         COUNT(*) AS f, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
  FROM orders GROUP BY 1
)
SELECT o_custkey AS custkey,
       CAST(ntile(4) OVER (ORDER BY r, o_custkey) AS BIGINT) AS r_q,
       CAST(ntile(4) OVER (ORDER BY f, o_custkey) AS BIGINT) AS f_q,
       CAST(ntile(4) OVER (ORDER BY m, o_custkey) AS BIGINT) AS m_q,
       CAST(ntile(4) OVER (ORDER BY r, o_custkey) * 100
            + ntile(4) OVER (ORDER BY f, o_custkey) * 10
            + ntile(4) OVER (ORDER BY m, o_custkey) AS BIGINT) AS segment_code
FROM pc
""",
)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (operators/stats.py::rfm_segments) —
    per customer the quartile bucket of recency (last order date),
    frequency (order count), monetary (lifetime spend, DECIMAL-exact),
    plus segment_code = 100r+10f+m: the classic marketing quartile
    coding, '444' = best cohort. ntile ties broken by custkey so both
    engines agree bucket-for-bucket; ≥10 distinct codes asserted at
    fixture SF.

    Scale: one per-customer aggregate, then three ntile windows over
    the |customers|-row frame — the windows are over the AGGREGATE
    (orders never enter a global window). At extreme customer counts
    the same coding swaps ntile for approx-quantile cut points
    (range_partition_bounds is the exact ledger-walk tier); the
    registered form is the exact contract."""
    return stats.rfm_segments(io.load_table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# 6. Count-Min sketch frequency audit (r10-queue promotion #1)
# ---------------------------------------------------------------------------


@register(
    "cms_user_counts",
    tags=("NS-sketch", "O-09", "O-08"),
    oracle="""
WITH ev AS (SELECT user_id FROM events),
exact AS (SELECT user_id, COUNT(*) AS exact_cnt FROM ev GROUP BY user_id),
cells AS (
  SELECT j,
         (('0x' || substr(md5(j || ':' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 16) AS bucket,
         COUNT(*) AS cnt
  FROM ev, (SELECT UNNEST([0, 1, 2]) AS j)
  GROUP BY 1, 2
),
est AS (
  SELECT e.user_id, e.exact_cnt, MIN(s.cnt) AS cms_est
  FROM exact e, (SELECT UNNEST([0, 1, 2]) AS j) d
  JOIN cells s
    ON s.j = d.j
   AND s.bucket = (('0x' || substr(md5(d.j || ':' || CAST(e.user_id AS VARCHAR)), 1, 8))::BIGINT % 16)
  GROUP BY 1, 2
)
SELECT user_id, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overcount
FROM est
""",
)
def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency AUDIT over events.user_id
    (operators/cms.py::cms_estimates; Cormode & Muthukrishnan 2005):
    per key, its exact count, the depth-3/width-16 CMS estimate
    (portable md5-substring buckets, min over rows), and the measured
    overcount — the Bloom FP-accounting discipline applied to the
    frequency sketch. Width 16 is PROBED to span both regimes
    (sf0.001: some keys exact, sf≥0.01: every key overcounts); the
    one-sided law (cms_est ≥ exact_cnt for EVERY key) is asserted in
    the gate test, and cell-wise mergeability (sketch(A∪B) =
    sketch(A)+sketch(B)) is pytest-pinned — the property that lets
    executors sketch partitions independently and merge depth·width
    integers.

    Scale: the sketch is ONE depth·width-row aggregate (a 48-cell
    broadcast here); the audit joins keys to their cells by bucket —
    at production width the sketch stays KB-sized regardless of key
    cardinality."""
    return cms.cms_estimates(
        io.load_table(spark, sf_dir, "events"), "user_id", width=16, depth=3
    )


# ---------------------------------------------------------------------------
# 7. Good-Turing frequency-of-frequencies (r10-queue promotion #2)
# ---------------------------------------------------------------------------


@register(
    "good_turing_counts",
    tags=("NS-curation", "O-31", "O-08"),
    oracle="""
WITH toks AS (
  SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
),
tc AS (SELECT w, COUNT(*) AS r FROM toks WHERE w IS NOT NULL AND w <> '' GROUP BY w),
spec AS (SELECT r, COUNT(*) AS n_r FROM tc GROUP BY r)
SELECT CAST(s.r AS BIGINT) AS r, CAST(s.n_r AS BIGINT) AS n_r,
       CAST(((s.r + 1) * COALESCE(n1.n_r, 0) * 1000000) // s.n_r AS BIGINT) AS r_star_scaled
FROM spec s LEFT JOIN spec n1 ON n1.r = s.r + 1
""",
)
def good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing frequency spectrum over the corpus vocabulary
    (operators/lm.py::good_turing_counts; Good 1953, Gale & Sampson
    1995): N_r = how many word types occur exactly r times, plus the
    scaled Turing estimate r* = (r+1)·N_{r+1}/N_r ×10^6 (integer,
    truncating) — the smoothing statistic every count-LM needs and the
    long-tail diagnostic of corpus growth (N_1/N = unseen-mass
    estimate). r* = 0 where N_{r+1} = 0 (the raw estimator's honest
    hole — smoothing variants fit a line; this registers the exact
    spectrum).

    Scale: one corpus token scan → per-type counts (the corpus
    shuffle) → the spectrum is a ≤max(r)-row aggregate whose r+1
    lookup is a broadcast self-join of that tiny table."""
    return lm.good_turing_counts(io.load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# 8. Join-size + skew profile (r10-queue promotion #3)
# ---------------------------------------------------------------------------


@register(
    "join_size_profile",
    tags=("NS-profiling", "O-08", "O-11"),
    oracle="""
WITH la AS (SELECT user_id AS k, COUNT(*) AS cl FROM events GROUP BY 1),
ra AS (SELECT user_id AS k, COUNT(*) AS cr FROM events GROUP BY 1),
per_key AS (SELECT k, cl * cr AS rows_k FROM la JOIN ra USING (k)),
stats AS (
  SELECT COUNT(*) AS n_common_keys,
         CAST(SUM(rows_k) AS BIGINT) AS join_rows,
         CAST(MAX(rows_k) AS BIGINT) AS max_key_rows
  FROM per_key
),
top AS (
  SELECT MIN(k) AS max_key FROM per_key, stats WHERE rows_k = max_key_rows
),
n AS (SELECT COUNT(*) AS n_rows FROM events)
SELECT CAST(n.n_rows AS BIGINT) AS n_left, CAST(n.n_rows AS BIGINT) AS n_right,
       CAST(s.n_common_keys AS BIGINT) AS n_common_keys, s.join_rows,
       t.max_key, s.max_key_rows,
       CAST((s.max_key_rows * 1000) // s.join_rows AS BIGINT) AS max_key_share_permille
FROM stats s, top t, n
""",
)
def join_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact join cardinality + skew profile WITHOUT materializing the
    join (operators/profiling.py::join_size_profile), here the
    events-on-user_id SELF-join shape (join_rows = Σ per-user count²):
    the planning statistic a 100 TB shuffle needs BEFORE running —
    join_rows == the real join's COUNT(*) is pytest-pinned, and
    max_key_share_permille is the direct input to the
    broadcast-vs-salt-vs-AQE-skew decision (the salted_agg_events and
    skew-join registrations act on exactly this number).

    Scale: two per-key count ledgers (one exchange each, map-side
    combined) joined on the key, then a 1-row summary — cost is
    O(distinct keys), never O(join output)."""
    ev = io.load_table(spark, sf_dir, "events")
    return _join_size_profile(ev, ev, "user_id")


# ---------------------------------------------------------------------------
# 9. Session regex pattern matching, MATCH_RECOGNIZE-lite (promotion #4)
# ---------------------------------------------------------------------------


@register(
    "session_pattern_matches",
    tags=("NS-events", "O-19", "O-22"),
    oracle="""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, substr(event_type, 1, 1) AS ini,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 86400000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessed AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM base
),
per_session AS (
  SELECT user_id, sess, MIN(us) AS session_start_us,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         string_agg(ini, '' ORDER BY us, event_id) AS seq
  FROM sessed GROUP BY user_id, sess
)
SELECT user_id, session_start_us, n_events,
       CAST(len(regexp_extract_all(seq, 'v[evsc]*c[evsc]*p')) AS BIGINT) AS n_matches
FROM per_session
WHERE len(regexp_extract_all(seq, 'v[evsc]*c[evsc]*p')) > 0
""",
)
def session_pattern_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite complex-event processing (operators/
    funnel.py::session_pattern_matches): each 24 h-gap session's events
    render as an initial-letter string in (ts, event_id) order, then an
    arbitrary REGEX counts non-overlapping matches — here the default
    clean-conversion path ``v[evsc]*c[evsc]*p`` (view → later click →
    later purchase, no intervening purchase). The funnel counts ONE
    named step sequence; this evaluates any regular expression. The
    24 h gap is PROBED non-degenerate (25/229/2369 matching sessions
    across SFs; 30-min sessions max out at 3-4 events and match
    nothing — the assert that caught the first draft).

    Scale: one window pass keyed on user_id (the events table's native
    partitioning), one per-session aggregate on the same key, regex on
    the ≤session-length string — no new exchange after the first."""
    return _session_pattern_matches(
        io.load_table(spark, sf_dir, "events"), gap_s=86400
    )


# ---------------------------------------------------------------------------
# 10. Classification report over the lang-ID tier (promotion #5)
# ---------------------------------------------------------------------------

_MARKERS_SQL = ",\n         ".join(
    f"{_marker_sql(lang)} AS s_{lang}" for lang in ("en", "es", "zh", "de", "fr")
)


@register(
    "classification_report",
    tags=("NS-stats", "O-31", "O-08"),
    oracle=f"""
WITH scores AS (
  SELECT doc_id, lang, {_MARKERS_SQL}
  FROM documents
),
pred AS (
  SELECT lang AS _a,
       CASE WHEN s_en >= s_es AND s_en >= s_zh AND s_en >= s_de AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_zh AND s_es >= s_de AND s_es >= s_fr THEN 'es'
            WHEN s_zh >= s_de AND s_zh >= s_fr THEN 'zh'
            WHEN s_de >= s_fr THEN 'de'
            ELSE 'fr' END AS _p
  FROM scores
),
ledger AS (SELECT _a, _p, COUNT(*) AS _n FROM pred GROUP BY 1, 2),
tp AS (SELECT _a AS label, _n AS tp FROM ledger WHERE _a = _p),
pt AS (SELECT _p AS label, SUM(_n) AS pred_n FROM ledger GROUP BY 1),
at AS (SELECT _a AS label, SUM(_n) AS support FROM ledger GROUP BY 1),
base AS (
  SELECT COALESCE(at.label, pt.label) AS label,
         COALESCE(tp.tp, 0) AS tp,
         COALESCE(pt.pred_n, 0) - COALESCE(tp.tp, 0) AS fp,
         COALESCE(at.support, 0) - COALESCE(tp.tp, 0) AS fn,
         COALESCE(at.support, 0) AS support
  FROM at FULL JOIN pt ON at.label = pt.label
  LEFT JOIN tp ON COALESCE(at.label, pt.label) = tp.label
)
SELECT label, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(support AS BIGINT) AS support,
       CAST(CASE WHEN tp + fp = 0 THEN 0 ELSE (1000 * tp) // (tp + fp) END AS BIGINT) AS precision_permille,
       CAST(CASE WHEN tp + fn = 0 THEN 0 ELSE (1000 * tp) // (tp + fn) END AS BIGINT) AS recall_permille,
       CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0 ELSE (2000 * tp) // (2 * tp + fp + fn) END AS BIGINT) AS f1_permille
FROM base
""",
)
def classification_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class confusion report (operators/stats.py::
    classification_report) composed over the r4-registered lang-ID
    tier: (label, tp, fp, fn, support, precision/recall/F1 permille)
    for the marker-argmax predictor vs the documents.lang ground truth
    — the evaluation primitive for every in-repo classifier. ALL
    INTEGER: F1's harmonic mean clears its denominator to 2000·tp div
    (2tp+fp+fn), so the report hashes identically anywhere (no float
    ever exists). A class wrongly predicted but absent from truth
    still reports (support 0, precision counted) via the full-outer
    label ledger.

    Scale: the confusion LEDGER is a ≤|classes|²-row aggregate of one
    scan; everything downstream is row-local arithmetic on that tiny
    frame."""
    pred = (
        lang_id_ngram(spark, sf_dir)
        .join(
            io.load_table(spark, sf_dir, "documents").select("doc_id", "lang"),
            "doc_id",
        )
        .select(
            F.col("lang").alias("actual"),
            F.col("predicted_lang").alias("predicted"),
        )
    )
    return stats.classification_report(pred)
