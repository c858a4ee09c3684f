"""Round-5e additions: CUSUM changepoint detection (the sequential drift
detector the watchdog family implies), reciprocal-rank fusion of the
lexical and embedding retrieval tiers, and positional phrase search.

Determinism discipline: CUSUM is an order-dependent integer recursion
(sharded Arrow fold vs recursive-CTE oracle — the watchdog/EWMA pattern,
but all-integer so not even IEEE agreement is needed); RRF ranks over
r4-rounded scores with id tiebreaks and fuses with integer reciprocal
weights; phrase search is pure integer counting.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.functions.numeric import (
    r4,
    scaled_long,
    sql_scaled_long,
    tdiv,
)
from kinesis_stream_video_project_spark.functions.text import tokens
from kinesis_stream_video_project_spark.plans.registry import register

_CUSUM_SCHEMA = "user_id long, event_id long, direction string"


def cusum_fold(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pure per-shard CUSUM replay (module-level so tests can drive it):
    for each user in (ts, event_id) order, calibrate on the first 20
    values (reference = integer mean, slack κ = ref÷3, threshold h = 10κ),
    then run the two-sided tabular CUSUM from row 21 —
    S⁺ = max(0, S⁺ + v − ref − κ), S⁻ = max(0, S⁻ + ref − v − κ); crossing
    h emits an alarm row and resets that side. Python ints are
    arbitrary-precision, so the fold is exact by construction — but the
    calibration divisions use ``tdiv`` (truncation toward zero), NOT
    Python's flooring ``//``: DuckDB's ``//`` truncates on negative
    numerators, so a signed metric whose calibration sum goes negative
    would otherwise calibrate differently on each side (pinned in
    tests/test_round5e.py)."""
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    out_u: list = []
    out_e: list = []
    out_d: list = []
    for uid, g in pdf.groupby("user_id", sort=False):
        vus = g["vu"].tolist()
        eids = g["event_id"].tolist()
        if len(vus) < 21:
            continue
        ref = tdiv(sum(vus[:20]), 20)
        kappa = tdiv(ref, 3)
        h = 10 * kappa
        sp = sm = 0
        for eid, v in zip(eids[20:], vus[20:]):
            sp = max(0, sp + v - ref - kappa)
            sm = max(0, sm + ref - v - kappa)
            if sp > h:
                out_u.append(uid)
                out_e.append(eid)
                out_d.append("up")
                sp = 0
            if sm > h:
                out_u.append(uid)
                out_e.append(eid)
                out_d.append("down")
                sm = 0
    return pd.DataFrame(
        {"user_id": out_u, "event_id": out_e, "direction": out_d}
    )


# Module-level constant so curation_pipeline_v3's composed oracle
# (plans/queries_round6.py) reuses the IDENTICAL recursive-CTE replay.
CUSUM_ORACLE = """
WITH RECURSIVE seq AS (
  SELECT user_id, event_id,
         {vu} AS vu,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events WHERE value IS NOT NULL
),
refs AS (
  SELECT user_id,
         CAST(SUM(vu) FILTER (WHERE rn <= 20) // 20 AS BIGINT) AS ref
  FROM seq GROUP BY user_id
  HAVING COUNT(*) >= 21
),
walk AS (
  SELECT s.user_id, s.event_id, s.rn,
         CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sm,
         false AS alarm_up, false AS alarm_down
  FROM seq s JOIN refs r ON r.user_id = s.user_id
  WHERE s.rn = 20
  UNION ALL
  SELECT s.user_id, s.event_id, s.rn,
         CASE WHEN greatest(0, w.sp + s.vu - r.ref - r.ref // 3)
                   > 10 * (r.ref // 3)
              THEN 0
              ELSE greatest(0, w.sp + s.vu - r.ref - r.ref // 3) END,
         CASE WHEN greatest(0, w.sm + r.ref - s.vu - r.ref // 3)
                   > 10 * (r.ref // 3)
              THEN 0
              ELSE greatest(0, w.sm + r.ref - s.vu - r.ref // 3) END,
         greatest(0, w.sp + s.vu - r.ref - r.ref // 3) > 10 * (r.ref // 3),
         greatest(0, w.sm + r.ref - s.vu - r.ref // 3) > 10 * (r.ref // 3)
  FROM walk w
  JOIN seq s ON s.user_id = w.user_id AND s.rn = w.rn + 1
  JOIN refs r ON r.user_id = w.user_id
)
SELECT user_id, event_id, 'up' AS direction FROM walk WHERE alarm_up
UNION ALL
SELECT user_id, event_id, 'down' AS direction FROM walk WHERE alarm_down
""".format(vu=sql_scaled_long("value", 1000000))


@register(
    "cusum_changepoints",
    tags=("NS-timeseries", "O-22", "O-32"),
    oracle=CUSUM_ORACLE,
)
def cusum_changepoints(
    spark: SparkSession, sf_dir: str, n_shards: int | None = None
) -> DataFrame:
    """Two-sided tabular CUSUM changepoint alarms per user — the
    sequential drift detector that complements rolling_zscore_anomalies:
    z-score flags single outliers, CUSUM accumulates small sustained
    shifts (the degradation shape `putmedia_check.sh:26-34`'s fixed
    threshold misses until failure). Self-calibrating: reference = integer
    mean of each user's first 20 values, slack κ = ref÷3, threshold 10κ,
    reset-on-alarm (alarms mark changepoint EVENTS, not sustained states).

    All arithmetic is integer (scaled micro-units, floor-division slack),
    so the sharded Arrow fold and the DuckDB recursive-CTE oracle agree
    bit-for-bit with no IEEE reasoning at all — one step stronger than the
    EWMA twin's same-IEEE-ops argument. Alarm rate at the fixture's
    uniform noise: 13/239/2351 alarms at sf0.001/0.01/0.1 (both
    directions present from sf0.01), non-degenerate at every SF.

    Scale: one exchange on ``user_id % n_shards`` (2× defaultParallelism
    by default — the watchdog/EWMA parallelism knob), one pandas
    invocation per shard, O(rows) integer fold inside. A streaming form
    would carry (ref, κ, S⁺, S⁻, warmup buffer) per key in
    applyInPandasWithState."""
    if n_shards is None:
        n_shards = 2 * spark.sparkContext.defaultParallelism
    e = io.load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    return (
        e.select(
            "user_id",
            "ts",
            "event_id",
            scaled_long(F.col("value"), 1000000).alias("vu"),
            (F.col("user_id") % n_shards).alias("_shard"),
        )
        .groupBy("_shard")
        .applyInPandas(cusum_fold, _CUSUM_SCHEMA)
    )


# Shared SQL fragment: cosine of two DuckDB float lists (same macro shape
# as queries_llm.py's _dd_cosine — duplicated here to keep the oracle
# string self-contained).
_COS = (
    "(list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * x))) * "
    "sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * x)))))"
)


@register(
    "rrf_fused_topk",
    tags=("NS-retrieval", "O-30", "O-31", "O-16"),
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
cos_scored AS (
  SELECT q.query_id, e.vec_id AS doc_id,
         (floor(({_COS.format(a='q.qvec', b='e.embedding')}) * 10000.0 + 0.5)
          / 10000.0) AS cs
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
),
cos_ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, doc_id)
           AS rnk
  FROM cos_scored QUALIFY rnk <= 30
),
toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
  FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
qtoks AS (SELECT doc_id AS query_id, tok FROM toks WHERE doc_id < 5),
inter AS (
  SELECT qt.query_id, t.doc_id, COUNT(*) AS ninter
  FROM qtoks qt JOIN toks t ON qt.tok = t.tok AND t.doc_id <> qt.query_id
  GROUP BY 1, 2
),
lex_scored AS (
  SELECT i.query_id, i.doc_id,
         (floor((CAST(ninter AS DOUBLE) / (sq.n + sd.n - ninter)) * 10000.0
                + 0.5) / 10000.0) AS js
  FROM inter i
  JOIN sizes sq ON sq.doc_id = i.query_id
  JOIN sizes sd ON sd.doc_id = i.doc_id
),
lex_ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id ORDER BY js DESC, doc_id)
           AS rnk
  FROM lex_scored QUALIFY rnk <= 30
),
fused AS (
  SELECT COALESCE(c.query_id, l.query_id) AS query_id,
         COALESCE(c.doc_id, l.doc_id) AS doc_id,
         COALESCE(1000000000 // (60 + c.rnk), 0)
           + COALESCE(1000000000 // (60 + l.rnk), 0) AS rrf_scaled
  FROM cos_ranked c
  FULL OUTER JOIN lex_ranked l
    ON c.query_id = l.query_id AND c.doc_id = l.doc_id
)
SELECT query_id, doc_id, rrf_scaled,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY rrf_scaled DESC, doc_id
       ) AS BIGINT) AS fused_rank
FROM fused QUALIFY fused_rank <= 10
""",
)
def rrf_fused_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the two retrieval tiers — the standard
    hybrid-search combiner: for each of 5 query documents, rank the corpus
    by embedding cosine AND by token-set Jaccard, keep each ranker's top
    30, and fuse with RRF(d) = Σ 1/(60 + rank_r(d)) — carried as the
    integer Σ 10⁹ div (60 + rank) so the fusion is hash-exact (ranks are
    deterministic: r4-rounded scores with doc_id tiebreaks, so the
    reciprocal weights are exact integers, and integer sums are
    order-free).

    Scale shape: the cosine leg broadcasts the 5-query set against the
    embedding scan (the cosine_topk plan); the lexical leg broadcasts the
    5 query docs' exploded token sets against the corpus postings (the
    containment-tier postings join, one side pinned tiny); each ranker's
    window partitions by query_id (bounded by corpus size per query, top-30
    cut before fusion keeps the fused frame at ≤ 60 rows/query); the
    full-outer fusion join is over those ≤ 300 rows."""
    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    # --- cosine leg (cosine_topk plan shape: broadcast queries, one fold
    # per pair over hoisted norms) ---
    norm = F.sqrt(
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    qnorm = F.sqrt(
        F.aggregate(
            F.col("qvec"),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    corpus = e.select("vec_id", "embedding", norm.alias("nrm"))
    qn = q.select("query_id", "qvec", qnorm.alias("qnrm"))
    dot = F.aggregate(
        F.zip_with(
            F.col("qvec"), F.col("embedding"), lambda a, b: a.cast("double") * b.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w_q = Window.partitionBy("query_id")
    cos_ranked = (
        F.broadcast(qn)
        .join(corpus, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            r4(dot / (F.col("qnrm") * F.col("nrm"))).alias("cs"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                w_q.orderBy(F.col("cs").desc(), F.col("doc_id"))
            ),
        )
        .filter(F.col("rnk") <= 30)
        .select("query_id", "doc_id", "rnk")
    )
    # --- lexical leg (containment-tier postings shape, query side tiny) ---
    d = io.load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode_outer(F.array_distinct(tokens(F.col("text")))).alias("tok")
    ).filter(F.col("tok").isNotNull())
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    qtoks = toks.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), "tok"
    )
    inter = (
        F.broadcast(qtoks)
        .join(toks, (qtoks["tok"] == toks["tok"]) & (toks["doc_id"] != qtoks["query_id"]))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("ninter"))
    )
    lex_ranked = (
        inter.join(
            F.broadcast(
                sizes.select(F.col("doc_id").alias("query_id"), F.col("n").alias("nq"))
            ),
            "query_id",
        )
        .join(sizes, "doc_id")
        .select(
            "query_id",
            "doc_id",
            r4(
                F.col("ninter")
                / (F.col("nq") + F.col("n") - F.col("ninter"))
            ).alias("js"),
        )
        .withColumn(
            "rnk",
            F.row_number().over(
                w_q.orderBy(F.col("js").desc(), F.col("doc_id"))
            ),
        )
        .filter(F.col("rnk") <= 30)
        .select("query_id", "doc_id", "rnk")
    )
    # --- integer RRF fusion over the ≤60 rows/query union ---
    c = cos_ranked.select(
        "query_id", "doc_id", F.expr("1000000000 div (60 + rnk)").alias("wc")
    )
    l = lex_ranked.select(
        "query_id", "doc_id", F.expr("1000000000 div (60 + rnk)").alias("wl")
    )
    fused = (
        c.join(l, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            (F.coalesce("wc", F.lit(0)) + F.coalesce("wl", F.lit(0))).alias(
                "rrf_scaled"
            ),
        )
        .withColumn(
            "fused_rank",
            F.row_number()
            .over(w_q.orderBy(F.col("rrf_scaled").desc(), F.col("doc_id")))
            .cast("long"),
        )
        .filter(F.col("fused_rank") <= 10)
    )
    return fused.select("query_id", "doc_id", "rrf_scaled", "fused_rank")


@register(
    "phrase_search_docs",
    tags=("NS-retrieval", "O-23", "O-31"),
    oracle="""
WITH b AS (
  SELECT doc_id,
         len(list_filter(
           list_transform(
             generate_series(1, greatest(len(string_split(text, ' ')) - 1, 1)),
             i -> array_to_string(list_slice(string_split(text, ' '), i, i + 1), ' ')
           ),
           x -> x = 'table scan')) AS n_hits
  FROM documents
)
SELECT doc_id, CAST(n_hits AS INT) AS n_hits FROM b WHERE n_hits > 0
""",
)
def phrase_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("table scan") with per-document occurrence
    counts — the positional-adjacency primitive of an inverted index,
    expressed row-locally: zip each document's token array with its own
    1-shifted self (pad one empty tail slot so lengths match; the padded
    pair can never equal a two-word phrase) and count pairs equal to the
    phrase. No join, no explode — a single stage at any corpus size.

    Form note: NOT shingles_of(toks, 2) — that per-position lambda
    references the token array twice per element, and because two adjacent
    Projects collapse (the CollapseProject trap, operators/dedup.py), the
    tokenization gets inlined and re-evaluated per reference unless an
    optimizer barrier intervenes: measured 2.9 s vs 0.6 s at sf0.1 for
    this zip_with form, which references the array a constant 2 times per
    ROW instead of 2 times per ELEMENT. zip_with pads the shorter
    (1-shifted) side with null, and concat_ws skips nulls, so the final
    padded pair renders as the bare last token — which can never equal a
    two-word phrase. (Deliberately NOT a concat-padded shifted array:
    zip_with over a slice-of-concat argument mis-evaluates the second
    array to nulls in Spark 4.1 codegen — caught when the padded form
    returned 0 rows.) Hits: 33/34/306 docs at sf0.001/0.01/0.1. A
    multi-phrase or query-workload version would explode bigrams once
    into postings (the tfidf_topk inverted-index shape) instead of
    scanning per phrase."""
    d = io.load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tokens(F.col("text")).alias("_toks"))
    # 10^6 cap, not INT_MAX: slice computes start+length-1 in int, so an
    # INT_MAX length overflows inside zip_with codegen and the second
    # array silently evaluates to nulls (caught when this query returned
    # 0 rows); any bound above the max document length is equivalent.
    shifted = F.slice(F.col("_toks"), 2, 1000000)
    pairs = F.zip_with(
        F.col("_toks"), shifted, lambda a, b: F.concat_ws(" ", a, b)
    )
    n_hits = F.size(F.filter(pairs, lambda x: x == F.lit("table scan")))
    return (
        toked.select("doc_id", n_hits.alias("n_hits"))
        .filter(F.col("n_hits") > 0)
    )
