"""Lexical retrieval scoring (r8 registration queue).

``bm25_topk`` upgrades the tfidf_topk lexical tier
(plans/queries_llm2.py) to Okapi BM25 (Robertson/Walker et al., TREC-3;
the Robertson & Zaragoza 2009 survey is the public reference): term-
frequency SATURATION (k1) and document-length normalization (b) — the
two effects raw tf/dl scoring lacks, and the default ranking function
of every mainstream search engine.

Numeric strategy (the tfidf_topk discipline, unchanged): the idf is the
RATIONAL BM25 core (N − df + 0.5)/(df + 0.5) WITHOUT the log — log
implementations differ across libm builds by ulps, which a hash check
cannot tolerate, while +, ×, / are IEEE-exact in both engines and the
per-term ranking is the same monotone order. k1 = 1.2 and b = 0.75
(the standard defaults) are double literals both engines parse to the
same bits; every per-term expression evaluates in a fixed operation
order; only the ≤|Q|-term per-doc summation is order-sensitive, so the
emitted score is ``r4``-rounded and ranking runs over the ROUNDED score
with a doc_id tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.numeric import r4
from kinesis_stream_video_project_spark.functions.text import tokens


def bm25_topk(
    docs: DataFrame,
    k: int = 20,
    n_query_terms: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents by BM25 against the corpus's
    ``n_query_terms`` highest-document-frequency terms (the same
    deterministic self-derived query set as tfidf_topk, so the two
    lexical tiers rank the same workload). Output
    ``(doc_id, score, rnk)``.

    score(d) = Σ_t idf_core(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))

    Scale shape: postings (doc_id, term, tf) shuffle once on term for
    the df aggregate; the query-term set and the 1-row (N, avgdl)
    aggregate broadcast back onto the postings; top-k rides
    TakeOrderedAndProject. At 100 TB the postings table is the
    materialized inverted index and avgdl a stored corpus statistic."""
    # Token array staged in its own projection: size() and the Generate are
    # different operators, so an inlined tokens(text) is split() twice per
    # row (no cross-operator subexpression elimination — the r14-measured
    # 4x on the tfidf tf stage).
    tok = (
        docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
        .select(
            "doc_id",
            F.size("_toks").alias("dl"),
            F.explode_outer("_toks").alias("term"),
        )
        .filter(F.col("term").isNotNull())
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.max("dl").alias("dl"), F.count(F.lit(1)).alias("tf")
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.select(F.size(tokens(F.col("text"))).alias("_dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum("_dl").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("avgdl"),
    )
    q = df_.orderBy(F.col("df").desc(), F.col("term")).limit(n_query_terms)
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    sat = (F.col("tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("tf").cast("double")
        + F.lit(k1)
        * (
            F.lit(1.0 - b)
            + F.lit(b) * (F.col("dl").cast("double") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(q), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum(idf * sat).alias("_raw"))
        .select("doc_id", r4(F.col("_raw")).alias("score"))
    )
    # Top-k FIRST (sort+limit => TakeOrderedAndProject), THEN rank the k
    # survivors — the tfidf_topk rule: an unpartitioned window over the
    # full corpus would funnel every doc through one task.
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def rare_shingle_neighbors(
    docs: DataFrame,
    k: int = 5,
    max_df: int = 20,
    shingle_n: int = 3,
    scale: int = 10**6,
) -> DataFrame:
    """Top-``k`` lexically-nearest NEIGHBORS per document by
    inverse-df-weighted rare-shingle overlap — the doc-to-doc sparse
    retrieval tier next to the query-to-doc ones (tfidf_topk, bm25_topk)
    and the exact-Jaccard dedup tiers: where AllPairs asks "which pairs
    exceed t", this asks "what are each doc's closest lexical
    neighbors", the related-document / near-miss-audit primitive.

    Score(a, b) = Σ over shared DISTINCT shingles s of
    ``scale div df(s)`` — the integer surrogate of an idf dot product
    (no log, no float: rarer shared evidence counts more, exact in any
    engine; the bm25 module's no-log discipline taken to its integer
    extreme). Only shingles with ``2 ≤ df ≤ max_df`` participate:
    df = 1 cannot pair, and the cap is BOTH the spec (ubiquitous
    shingles are boilerplate, not evidence — they'd add ~0 weight while
    dominating the join) and the scale defense — per-shingle join
    fan-out is bounded by max_df², so the postings self-join cannot
    blow up on a hot shingle no matter the corpus. Output
    ``(doc_id, neighbor_id, n_shared, score_scaled, rank)``, rank ≤ k
    by (score desc, neighbor asc) per doc.

    Scale: distinct (doc, shingle) postings shuffle once on the
    shingle; the self-join emits ≤ df ≤ max_df rows per posting; the
    per-(doc, neighbor) aggregate and per-doc top-k window both key on
    doc_id. No all-pairs stage, no global window.

    r12 replan (VERDICT r11 item 2; 3.81 → 1.21 s warm at sf0.1,
    bit-identical at 3 SFs), three moves:

    * the tokenize+shingle projection is staged ONCE (the X-160/X-134
      materialize-once rule, same shape as the AllPairs prefix-filter's
      staged shingle table, dedup.py): the ``posts`` subtree has three
      consumers, and without staging the regexp-tokenize + HOF shingle
      expressions — the plan's most expensive leaves — execute three
      times. The checkpoint is the PER-DOC ARRAY frame (|docs| rows,
      compact), not the exploded postings;
    * the df-filtered weighted postings are staged too — both sides of
      the self-join derive from them, and recomputing means re-running
      the dfreq aggregate + join per side;
    * the pair stream repartitions on ``doc_id`` BEFORE the
      (doc, neighbor) aggregate: HashPartitioning(doc_id) satisfies the
      aggregate's ClusteredDistribution(doc_id, neighbor_id) AND the
      top-k window's partitioning, so the ~10×-corpus pair stream
      crosses ONE exchange instead of two (measured 2.4 → 1.2 s; the
      plan's only remaining exchange). The residual cost is
      algorithmic: ~2.2M distinct pairs at sf0.1 (Σ df² over rare
      shingles), 90% of pair rows unique, so no staging can shrink
      it further."""
    if k < 1 or max_df < 2:
        raise ValueError(
            f"rare_shingle_neighbors: need k >= 1 and max_df >= 2, "
            f"got k={k}, max_df={max_df}"
        )
    from kinesis_stream_video_project_spark.operators.dedup import shingles_of

    shingled = docs.select(
        "doc_id",
        F.array_distinct(
            shingles_of(tokens(F.col("text")), shingle_n)
        ).alias("_sh"),
    ).localCheckpoint()
    posts = shingled.select(
        "doc_id", F.explode_outer(F.col("_sh")).alias("s")
    ).filter(F.col("s").isNotNull())
    dfreq = posts.groupBy("s").agg(F.count(F.lit(1)).alias("_df")).filter(
        (F.col("_df") >= 2) & (F.col("_df") <= max_df)
    )
    weighted = posts.join(dfreq, "s").select(
        "s", "doc_id", F.expr(f"CAST({scale} DIV _df AS BIGINT)").alias("_wt")
    ).localCheckpoint()
    other = weighted.select(
        F.col("s"), F.col("doc_id").alias("neighbor_id")
    )
    scored = (
        weighted.join(other, "s")
        .filter(F.col("doc_id") != F.col("neighbor_id"))
        .repartition(F.col("doc_id"))
        .groupBy("doc_id", "neighbor_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared"),
            F.sum("_wt").cast("long").alias("score_scaled"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_scaled").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
