"""Round-4 additions: curation + temporal-modeling + retrieval operators.

All five are built for exact cross-engine agreement: the surprisal score
accumulates SCALED-INTEGER terms (floor-division is identical in Spark and
DuckDB, and integer addition is order-insensitive — no float summation-
order hazard); the SCD2 build is pure window arithmetic over a total
order; the corpus shuffle ranks over md5 keys via two-phase distributed
ranking; boilerplate detection aggregates exact prefix strings; and
filtered vector search reuses the rounded-cosine ranking discipline of
the O-30 tier."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.functions.numeric import r4
from kinesis_stream_video_project_spark.functions.text import tokens
from kinesis_stream_video_project_spark.plans.registry import register

# DuckDB cosine fragment shared with queries_llm (same double fold).
from kinesis_stream_video_project_spark.plans.queries_llm import (  # noqa: E402
    _dd_cosine as _dd_cosine_r4,
)


# Shared with queries_round5.surprisal_score_salted: the salted twin must
# hash against the IDENTICAL oracle (salting is plan-only, result-invariant).
SURPRISAL_ORACLE = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
dfreq AS (
  SELECT tok, COUNT(*) AS df
  FROM (SELECT DISTINCT doc_id, tok FROM toks)
  GROUP BY tok
),
scored AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         SUM(CAST(1000000000000 // d.df AS DECIMAL(38,0))) AS s
  FROM toks t JOIN dfreq d USING (tok)
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       (floor((CAST(s AS DOUBLE) / n_tokens / 1000000000000.0) * 10000.0 + 0.5) / 10000.0) AS surprisal
FROM scored
"""


@register(
    "surprisal_score",
    tags=("NS-curation", "O-31"),
    oracle=SURPRISAL_ORACLE,
)
def surprisal_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal proxy per document (north-star quality gate):
    mean token rarity, where a token's rarity is 1/document-frequency —
    documents full of corpus-rare tokens score high (gibberish, boilerplate
    IDs, wrong-language shards), stopword-heavy text scores ~0. The real
    curation signal this proxies is mean negative logprob under a unigram
    LM; the rational 1/df form is used INSTEAD of log so both engines
    agree bit-for-bit.

    Numeric strategy: each term is the scaled integer 10^12 // df
    (floor-division — identical in both engines), summed as DECIMAL(38,0)
    (order-insensitive, unlike float sums, and overflow-proof: a BIGINT
    sum would silently wrap in Spark at ~9.3M df=1 tokens in one doc while
    DuckDB promotes to HUGEINT — a cross-engine divergence), divided out
    and rounded only at the very end. Plan: one doc-frequency aggregate
    (map-side distinct), token join back, one per-doc aggregate. The token
    join's Zipf skew is NOT AQE-splittable (aggregate-above-shuffle child —
    tests/test_skew.py::test_token_join_skew_lever proves it and pins the
    lever): at stopword-skew scale, wrap the join with
    operators/skew.py::salted_join, same story as rare_token_ratio."""
    d = io.load_table(spark, sf_dir, "documents")
    # explode_outer + isNotNull: dedup.py rationale (inferred-filter inlining).
    toks = d.select(
        "doc_id", F.explode_outer(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok").isNotNull())
    dfreq = (
        d.select(
            F.explode_outer(F.array_distinct(tokens(F.col("text")))).alias("tok")
        )
        .filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        toks.join(dfreq, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.expr("CAST(1000000000000 DIV df AS DECIMAL(38,0))")).alias(
                "_s"
            ),
        )
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        r4(
            F.col("_s").cast("double") / F.col("n_tokens") / F.lit(1000000000000.0)
        ).alias("surprisal"),
    )


@register(
    "scd2_user_status",
    tags=("O-16", "O-24", "NS-quality"),
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type AS status, epoch_us(ts) AS ts_us, event_id,
         lag(event_type) OVER w AS prev_status
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, status, ts_us, event_id
  FROM ordered
  WHERE prev_status IS NULL OR status <> prev_status
)
SELECT user_id, status,
       ts_us AS valid_from_us,
       lead(ts_us) OVER w2 - 1 AS valid_to_us,
       (lead(ts_us) OVER w2 IS NULL) AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
""",
)
def scd2_user_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from the event log: collapse
    each user's event-type stream into validity intervals
    [valid_from_us, valid_to_us] with an is_current flag — the standard
    dimension-table build every warehouse needs when history must be
    queryable as-of any instant (pairs with the as-of join operators:
    `asof_probe_metric` probes exactly this interval shape).

    Plan: ONE shuffle on user_id; both windows (change detection via lag,
    interval close via lead) and the change filter reuse the same
    partitioning — Catalyst plans a single Exchange followed by two Window
    operators. BOTH windows order by the (ts, event_id) total order —
    ts_us alone would leave valid_to_us/is_current nondeterministic when
    one user flips status twice at the same timestamp; epoch-µs integer
    arithmetic keeps both engines exact."""
    e = io.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        F.col("event_type").alias("status"),
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        F.lag("event_type").over(w).alias("prev_status"),
    )
    changes = ordered.filter(
        F.col("prev_status").isNull() | (F.col("status") != F.col("prev_status"))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    return changes.select(
        "user_id",
        "status",
        F.col("ts_us").alias("valid_from_us"),
        (F.lead("ts_us").over(w2) - 1).alias("valid_to_us"),
        F.lead("ts_us").over(w2).isNull().alias("is_current"),
    )


@register(
    "corpus_shuffle",
    tags=("NS-curation", "O-07", "O-23"),
    oracle="""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS shuffle_rank
FROM documents
""",
)
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded corpus shuffle (north-star sequence prep): the
    global training order is ORDER BY md5(seed || doc_id) — reproducible
    across runs/engines/partitionings (unlike rand()), re-shufflable by
    changing the seed, and stable under corpus append (existing docs keep
    their relative order per seed).

    The global rank is computed by TWO-PHASE DISTRIBUTED RANKING, not an
    unpartitioned window (which would funnel the corpus through one task —
    the exact anti-pattern test_no_unpartitioned_windows bans): bucket each
    doc by the first byte of its shuffle key (256 buckets), rank within
    buckets in parallel, and add per-bucket offsets from a broadcast
    256-row cumulative count. The only unpartitioned window runs over
    those 256 bucket-count rows — dimension-sized, never corpus-sized."""
    d = io.load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("42:"), F.col("doc_id").cast("string")))
    keyed = d.select(
        "doc_id",
        key.alias("_key"),
        F.conv(F.substring(key, 1, 2), 16, 10).cast("int").alias("_bucket"),
    )
    w_in = Window.partitionBy("_bucket").orderBy("_key", "doc_id")
    within = keyed.withColumn("_r", F.row_number().over(w_in))
    counts = keyed.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_n"))
    w_off = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "_bucket", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    return within.join(F.broadcast(offsets), "_bucket").select(
        "doc_id", (F.col("_off") + F.col("_r")).cast("long").alias("shuffle_rank")
    )


@register(
    "boilerplate_prefixes",
    tags=("NS-curation", "O-31", "O-06"),
    oracle="""
WITH prefixes AS (
  SELECT array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ') AS prefix
  FROM documents
  WHERE len(string_split(text, ' ')) >= 8
)
SELECT prefix, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM prefixes
GROUP BY prefix
HAVING COUNT(*) >= 2
ORDER BY n_docs DESC, prefix
LIMIT 20
""",
)
def boilerplate_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prefix boilerplate detection (north-star curation signal):
    the most repeated 8-token document prefixes — templated headers,
    scraped navigation, license banners — which a curation pass strips
    before dedup so boilerplate doesn't glue unrelated documents into one
    near-dup cluster. One aggregation on the 8-token prefix string (no
    explode — the prefix is a single `slice` + `concat_ws` per doc),
    total-ordered before the limit (TakeOrderedAndProject)."""
    d = io.load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    prefixed = d.select(
        F.concat_ws(" ", F.slice(toks, 1, 8)).alias("prefix"),
        F.size(toks).alias("_n"),
    ).filter(F.col("_n") >= 8)
    counts = prefixed.groupBy("prefix").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        counts.filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "prefix")
        .limit(20)
    )


@register(
    "filtered_cosine_topk",
    tags=("NS-curation", "O-30", "O-04"),
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
cand AS (
  SELECT vec_id, embedding, label FROM embeddings WHERE label % 2 = 0
),
scored AS (
  SELECT q.query_id, c.vec_id, c.label,
         (floor(({_dd_cosine_r4('q.qvec', 'c.embedding')}) * 10000.0 + 0.5) / 10000.0) AS cos_sim
  FROM q JOIN cand c ON c.vec_id <> q.query_id
)
SELECT query_id, vec_id, label, cos_sim,
       CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rnk
  FROM scored
)
WHERE rnk <= 10
""",
)
def filtered_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED vector search (the retrieval shape every RAG /
    curation system actually runs: "nearest neighbors WHERE tenant/lang/
    source = X"). Strategy = PRE-filter: the predicate prunes the corpus
    BEFORE any cosine work — pushed to the parquet scan, so at 100 TB with
    the corpus partitioned on the filter column this is partition pruning,
    and recall is exact by construction (post-filtering an ANN top-k
    under-returns when the filter is selective). The label%2 predicate
    stands in for the metadata clause; the filter reaches the scan as a
    PushedFilter when expressed on a raw column."""
    from kinesis_stream_video_project_spark.operators import similarity

    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cand = e.filter(F.col("label") % 2 == 0)
    topk = similarity.cosine_topk(q, cand, k=10)
    labels = cand.select("vec_id", "label")
    return topk.join(F.broadcast(labels), "vec_id").select(
        "query_id", "vec_id", "label", "cos_sim", "rank"
    )
