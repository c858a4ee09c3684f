"""Round-8 window registrations: the 10-operator queue built (and
pytest-verified with validated oracle shapes, tests/test_r8_queue.py)
during round 7, now promoted to driver-visible queries — BPE merge
ranking, audio PCM16 frame energy, bounded weighted SSSP, session path
mining, source overlap matrix, per-group rank normalization, sliding
token chunks, image dHash, and the two streaming-op replays (funnel
advance events; Space-Saving heavy-hitter certificate) that put the
ONLINE funnel and heavy-hitters tiers under the driver's hash gate —
the `near_dup_candidates_horizon` precedent from round 7.

Every oracle here was VALIDATED bit-exact against the Spark side at
sf0.001/0.01/0.1 before registration (paste, don't debug). All-integer
or string outputs end to end — no float leaves any of these queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators import (
    funnel,
    graph,
    heavy,
    lm,
    multimodal,
    packing,
    stats,
)
from kinesis_stream_video_project_spark.operators import dedup as dd
from kinesis_stream_video_project_spark.plans.registry import register

# ---------------------------------------------------------------------------
# 1. BPE merge candidate ranking (one merge step of tokenizer training)
# ---------------------------------------------------------------------------


@register(
    "bpe_merge_topk",
    tags=("NS-curation", "O-31", "O-06"),
    oracle="""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bgs AS (
  SELECT t[i] AS prev, t[i + 1] AS cur
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
),
c AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM bgs GROUP BY 1, 2)
SELECT prev, cur, n_pairs,
       CAST(row_number() OVER (ORDER BY n_pairs DESC, prev, cur) AS BIGINT) AS rnk
FROM c
QUALIFY rnk <= 20
""",
)
def bpe_merge_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge step's candidate ranking (operators/lm.py::
    bpe_merge_topk): the top-20 most frequent ADJACENT token pairs with
    the deterministic (count desc, prev, cur) tiebreak — the statistic
    a byte-pair-encoding tokenizer trainer (Sennrich et al. 2016)
    computes once per merge. All-integer output.

    Scale: doc_bigrams explodes once into a ≤|vocab|²-row pair-count
    aggregate (map-side combine); TakeOrderedAndProject top-k. A full
    trainer loops merge → re-tokenize; ONE step is the per-iteration
    distributed statistic and keeps the query SQL-expressible."""
    return lm.bpe_merge_topk(io.load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# 2. Audio PCM16 frame energy over the media manifest
# ---------------------------------------------------------------------------


@register(
    "audio_energy_frames",
    tags=("NS-multimodal", "O-32"),
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
         CAST(SUM(s * s) AS BIGINT) AS energy_ssq,
         CAST(MAX(ABS(s)) AS BIGINT) AS peak
  FROM framed GROUP BY 1, 2
)
SELECT doc_id AS media_id, CAST(frame_no AS BIGINT) AS frame_no,
       CAST(64 AS BIGINT) AS n_samples, energy_ssq, peak
FROM agg WHERE cnt = 64
""",
)
def audio_energy_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame energy (Σs²) and peak |s| of each media payload decoded
    as little-endian PCM16 (operators/multimodal.py::
    audio_energy_frames) — the VAD / silence-detection / loudness-
    normalization primitive, 64 samples per frame, trailing partial
    frame and odd byte dropped per the stated contract. The fixture
    manifest's payloads are utf-8 text (ASCII < 128), so the DuckDB
    oracle replays the exact int16 reassembly from code points; a
    crafted-bytes pytest covers negative samples and INT16_MIN.

    Scale: Arrow mapInPandas record-batch streaming — frames never
    shuffle; the output is (id, frame_no, 3 ints). At 100 TB the
    payload column stays in parquet; only frame stats move."""
    d = io.load_table(spark, sf_dir, "documents")
    return multimodal.audio_energy_frames(
        multimodal.media_manifest(d), frame_samples=64
    )


# ---------------------------------------------------------------------------
# 3. Bounded weighted SSSP over the co-purchase graph
# ---------------------------------------------------------------------------


@register(
    "sssp_bounded",
    tags=("NS-graph", "O-11"),
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
b AS MATERIALIZED (
  SELECT p1 AS src, p2 AS dst, 1000 // n_orders AS w FROM e
  UNION ALL SELECT p2, p1, 1000 // n_orders FROM e
),
d0 AS (SELECT CAST(p AS BIGINT) AS p, CAST(0 AS BIGINT) AS dist
       FROM (VALUES (1), (2)) t(p)),
d1 AS (
  SELECT p, MIN(dist) AS dist FROM (
    SELECT b.dst AS p, d0.dist + b.w AS dist FROM b JOIN d0 ON b.src = d0.p
    UNION ALL SELECT p, dist FROM d0
  ) GROUP BY p
),
d2 AS (
  SELECT p, MIN(dist) AS dist FROM (
    SELECT b.dst AS p, d1.dist + b.w AS dist FROM b JOIN d1 ON b.src = d1.p
    UNION ALL SELECT p, dist FROM d1
  ) GROUP BY p
),
d3 AS (
  SELECT p, MIN(dist) AS dist FROM (
    SELECT b.dst AS p, d2.dist + b.w AS dist FROM b JOIN d2 ON b.src = d2.p
    UNION ALL SELECT p, dist FROM d2
  ) GROUP BY p
)
SELECT p, dist FROM d3
""",
)
def sssp_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-round Bellman-Ford shortest AFFINITY distances from parts
    {1, 2} over the co-purchase graph (operators/graph.py::
    sssp_bounded): edge cost = 1000 div n_orders, so strong
    co-purchase ties are cheap to traverse; dist = cheapest ≤3-edge
    path — pure min/+ on BIGINTs, set-exact in any engine, oracle =
    the same rounds unrolled as chained CTEs (the bfs_hops rule). An
    edge multiplicity > 1000 would floor to cost 0 (free traversal)
    and is REFUSED in-plan (raise_error; pinned test) rather than
    silently collapsing the metric toward BFS.

    Scale: integer-cost adjacency materialized once; each round is one
    broadcast join of the ≤|V|-row distance frame + a min-aggregate,
    localCheckpointed (the pagerank_int loop rule) with a convergence
    short-circuit."""
    li = io.load_table(spark, sf_dir, "lineitem")
    src = spark.createDataFrame([(1,), (2,)], "p long")
    return graph.sssp_bounded(graph.copurchase_edges(li), src, max_rounds=3)


# ---------------------------------------------------------------------------
# 4. Session path mining (top trigram behavior flows)
# ---------------------------------------------------------------------------


@register(
    "session_paths",
    tags=("NS-events", "O-16", "O-19"),
    oracle="""
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 86400000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
  FROM o
),
t AS (
  SELECT event_type AS a,
         lead(event_type, 1) OVER w2 AS b,
         lead(event_type, 2) OVER w2 AS c
  FROM s
  WINDOW w2 AS (PARTITION BY user_id, sess ORDER BY ts, event_id)
),
pc AS (
  SELECT a || '>' || b || '>' || c AS path, COUNT(*) AS n_paths
  FROM t WHERE c IS NOT NULL GROUP BY 1
)
SELECT path, CAST(n_paths AS BIGINT) AS n_paths,
       CAST(row_number() OVER (ORDER BY n_paths DESC, path) AS BIGINT) AS rnk
FROM pc
QUALIFY rnk <= 20
""",
)
def session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most frequent event-type TRIGRAMS within 24 h-gap
    sessions (operators/funnel.py::session_paths) — the behavior-flow
    complement of the funnel: the funnel counts a path you name, this
    surfaces the paths the data contains. Paths never cross a session
    boundary (gaps-and-islands sessionization on the (ts, event_id)
    total order, exact integer-µs gap compare); 791/7731/77514
    trigrams at sf0.001/0.01/0.1 — non-degenerate at every SF.

    Scale: two window passes partitioned by user / (user, session) —
    never global — then a ≤|types|³-row count aggregate and
    TakeOrderedAndProject."""
    return funnel.session_paths(io.load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# 5. Cross-source shingle overlap matrix
# ---------------------------------------------------------------------------


@register(
    "source_overlap_matrix",
    tags=("NS-dedup", "O-29", "O-08"),
    oracle="""
WITH posts AS (
  SELECT DISTINCT source AS src,
         ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
  FROM (
    SELECT source,
           UNNEST(list_transform(
             generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
             i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
           )) AS g
    FROM documents
  )
),
sizes AS (SELECT src, COUNT(*) AS n_sh FROM posts GROUP BY src),
shared AS (
  SELECT a.src AS src_a, b.src AS src_b, COUNT(*) AS n_shared
  FROM posts a JOIN posts b ON a.h = b.h AND a.src < b.src
  GROUP BY 1, 2
)
SELECT src_a, src_b, CAST(n_shared AS BIGINT) AS n_shared,
       CAST((n_shared * 1000) // (sa.n_sh + sb.n_sh - n_shared) AS BIGINT)
         AS jaccard_permille
FROM shared
JOIN sizes sa ON sa.src = src_a
JOIN sizes sb ON sb.src = src_b
""",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-level 3-gram shingle Jaccard (operators/
    dedup.py::source_overlap_matrix) — the corpus-composition audit
    ("how much of source A is re-scraped in source B") run before
    mixture weighting; shingle-based because the fixture has 0 EXACT
    cross-source dup texts at sf ≤ 0.01 (probed — a sha-based matrix
    would be degenerate). 190 rows (C(20,2)) dense at every SF.
    Integer permille; portable md5 shingle hashes.

    Scale: DISTINCT (source, shingle-hash) postings shuffle once keyed
    on hash — the pair join is postings-keyed (id-only), never
    all-pairs docs; per-source sizes are a 20-row broadcast."""
    return dd.source_overlap_matrix(io.load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# 6. Per-group rank normalization (percentile permille)
# ---------------------------------------------------------------------------


@register(
    "rank_normalize",
    tags=("NS-curation", "O-16", "O-31"),
    oracle="""
WITH r AS (
  SELECT source, doc_id, n_chars,
         rank() OVER (PARTITION BY source ORDER BY n_chars) AS rnk,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(CASE WHEN n = 1 THEN 0
                 ELSE ((rnk - 1) * 1000) // (n - 1) END AS BIGINT)
         AS pct_permille
FROM r
""",
)
def rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-source percentile rank of document length as integer
    permille (operators/stats.py::rank_normalize) — the
    distribution-free score normalizer for cross-source comparison of
    quality signals (a 900-char doc is long for chat logs, short for
    books; rank-normalizing makes one threshold meaningful across
    sources). rank() ties share the value-determined rank; singleton
    groups score 0; all-integer ((rnk−1)·1000) div (n−1).

    Scale: ONE window pass partitioned by source (never global) over
    the one scan; group sizes via the same partition."""
    return stats.rank_normalize(
        io.load_table(spark, sf_dir, "documents"), "n_chars", "source"
    )


# ---------------------------------------------------------------------------
# 7. Sliding token chunks (overlapping context windows)
# ---------------------------------------------------------------------------


@register(
    "sliding_chunks",
    tags=("NS-packing", "O-31"),
    oracle="""
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
),
starts AS (
  SELECT doc_id, n, UNNEST(generate_series(1, greatest(n, 1), 48)) AS start_tok
  FROM t
)
SELECT doc_id,
       CAST((start_tok - 1) // 48 + 1 AS BIGINT) AS chunk_no,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(least(start_tok + 63, n) AS BIGINT) AS end_tok,
       CAST(least(start_tok + 63, n) - start_tok + 1 AS BIGINT)
         AS n_chunk_tokens
FROM starts
""",
)
def sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64-token context windows at stride 48 per document
    (operators/packing.py::sliding_chunks) — the chunking layout for
    embedding/retrieval indexing where `chunk_documents`' disjoint
    splits lose cross-boundary context; 16-token overlap preserves it.
    Bounds-only output (doc_id, chunk_no, start_tok, end_tok,
    n_chunk_tokens) — the text is NOT re-materialized per chunk.
    stride > chunk_tokens is refused (coverage gaps;
    hypothesis-found, pinned); coverage/overlap/density laws are
    property-tested.

    Scale: one tokenize pass → sequence explode of ⌈n/stride⌉ integer
    rows per doc; no shuffle at all (chunk bounds derive per-row).
    Downstream embedding jobs join bounds back by doc_id."""
    return packing.sliding_chunks(io.load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# 8. Image dHash (difference hash) over the media manifest
# ---------------------------------------------------------------------------


@register(
    "image_dhash",
    tags=("NS-multimodal", "O-29", "O-32"),
    oracle="""
WITH bytes AS (
  SELECT doc_id AS media_id, list_transform(
           generate_series(1, nbytes),
           j -> (strpos('0123456789abcdef', hx[2*j-1]) - 1) * 16
              + (strpos('0123456789abcdef', hx[2*j]) - 1)
         ) AS bs, nbytes AS L
  FROM (SELECT doc_id, string_split(lower(hex(encode(text))), '') AS hx,
               octet_length(encode(text)) AS nbytes
        FROM documents)
),
vals AS (
  SELECT media_id, list_transform(
           generate_series(0, 63),
           b -> CASE WHEN ((b + 1) * L) // 64 > (b * L) // 64
                THEN list_sum(list_slice(bs, (b * L) // 64 + 1,
                                         ((b + 1) * L) // 64))
                     // (((b + 1) * L) // 64 - (b * L) // 64)
                ELSE 0 END
         ) AS v
  FROM bytes
),
hashed AS (
  SELECT media_id,
         list_sum(list_transform(
           generate_series(0, 55),
           k -> CASE WHEN v[(k // 7) * 8 + (k % 7) + 2]
                          > v[(k // 7) * 8 + (k % 7) + 1]
                THEN 1 << k ELSE 0 END
         )) AS dhash
  FROM vals
)
SELECT media_id, CAST(dhash AS BIGINT) AS dhash FROM hashed
""",
)
def image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """56-bit difference hash per media payload (operators/
    multimodal.py::image_dhash) — the perceptual near-dup signature
    for images (dHash: compare adjacent downsampled block means; the
    standard public algorithm). The decode chain feeds PIXELS when the
    payload is a decodable image (PIL tier → stdlib gray-8 PNG tier)
    and falls back to bytes-as-gray for opaque payloads — the fixture
    manifest takes the bytes tier, which the DuckDB oracle replays as
    a hex walk; compression-invariance (same pixels, different
    container bytes → same hash) is pytest-pinned on crafted PNGs.
    Exact-duplicate payloads provably collide.

    Scale: mapInPandas over the manifest — payloads never shuffle;
    downstream near-dup joins move (id, 8-byte hash) only, bucketed by
    hash bands (the SimHash discipline at O-29)."""
    d = io.load_table(spark, sf_dir, "documents")
    return multimodal.image_dhash(multimodal.media_manifest(d))


# ---------------------------------------------------------------------------
# 9. Funnel advance events — batch replay of the ONLINE funnel
# ---------------------------------------------------------------------------


@register(
    "funnel_user_advances",
    tags=("NS-events", "O-22", "O-08"),
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
SELECT user_id, CAST(1 AS BIGINT) AS step_no, 'view' AS step,
       CAST(epoch_us(t) AS BIGINT) AS ts_us
FROM s1
UNION ALL
SELECT user_id, 2, 'click', epoch_us(t) FROM s2
UNION ALL
SELECT user_id, 3, 'purchase', epoch_us(t) FROM s3
""",
)
def funnel_user_advances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel ADVANCE events for view → click → purchase with
    the 24 h per-step window (operators/funnel.py::funnel_user_stages)
    — the BATCH REPLAY of the online funnel (streaming/jobs.py::
    funnel_stage_stream + transformWithState twin, both stateful
    APIs): with events arriving in event-time order the stream's
    per-user fold emits exactly these (user_id, step_no, step, ts_us)
    rows — greedy-earliest fold ≡ min(ts > t_prev) frontier chain,
    hypothesis-pinned. Registering the replay puts the online funnel
    tier under the driver's hash gate (the near_dup_candidates_horizon
    precedent). 24/235/2253 advance rows at sf0.001/0.01/0.1;
    funnel_conversion is this frame's per-stage distinct-user count.

    Scale: per-stage user-keyed aggregates against ≤|users|-row
    frontiers — identical shuffle shape to funnel_conversion; the
    union is |advances| rows."""
    return funnel.funnel_user_stages(
        io.load_table(spark, sf_dir, "events"),
        ["view", "click", "purchase"],
        step_horizon_s=86400,
    )


# ---------------------------------------------------------------------------
# 10. Space-Saving certificate — the ONLINE heavy hitters under the gate
# ---------------------------------------------------------------------------


@register(
    "heavy_hitters_certificate",
    tags=("NS-events", "O-22", "O-09"),
    oracle="""
WITH e AS (SELECT user_id % 4 AS shard, user_id FROM events),
c AS (SELECT shard, user_id, COUNT(*) AS cnt FROM e GROUP BY 1, 2),
s AS (SELECT shard, CAST(SUM(cnt) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS ukeys
      FROM c GROUP BY 1)
SELECT CAST(s.shard AS BIGINT) AS shard,
       CAST(LEAST(16, ukeys) AS BIGINT) AS n_entries,
       n AS total_count,
       CAST((SELECT COUNT(*) FROM c
             WHERE c.shard = s.shard AND cnt > n // 16) AS BIGINT)
         AS n_guaranteed,
       CAST((SELECT COUNT(*) FROM c
             WHERE c.shard = s.shard AND cnt > n // 16) AS BIGINT)
         AS n_guaranteed_present,
       CAST(0 AS BIGINT) AS n_bound_violations
FROM s
""",
)
def heavy_hitters_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard CERTIFICATE of the online Space-Saving heavy hitters
    (operators/heavy.py, replaying streaming/jobs.py::
    _spacesaving_fold — the ONE fold both stateful-API streams run):
    the sketch contents are arrival-order-dependent, but the
    algorithm's guarantees are not, so the certificate row per shard —
    n_entries = min(capacity, distinct), total_count = N (the sum
    invariant: every arrival increments exactly one counter),
    n_guaranteed_present = n_guaranteed (every key with count >
    N div capacity survives), n_bound_violations = 0 (true count ∈
    [count−err, count]) — is deterministic and the DuckDB oracle
    derives it from exact counts alone. A hash match certifies the
    guarantees on real data (the claim-query pattern applied to a
    streaming sketch). capacity=16 < the 37+ users/shard at sf ≥ 0.01
    exercises EVICTION there (n_guaranteed 0 — uniform fixture keys),
    while sf0.001's 4 users/shard exercises the all-present path
    (n_guaranteed = all); shard = user_id mod 4 (SQL-portable; the
    guarantee is hash-function-independent).

    Scale: the replay materializes one shard per task (verification
    harness — O(N/shards) memory); PRODUCTION is the streaming form
    whose state is O(capacity) per shard."""
    return heavy.heavy_hitters_certificate(
        io.load_table(spark, sf_dir, "events")
    )
