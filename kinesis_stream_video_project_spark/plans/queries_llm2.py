"""Training-data curation operators, round 2 (north-star extensions beyond
SURVEY.md §2's r1 LLM set): the checks a 100 TB pretraining pipeline runs
between raw corpus and tokenizer.

* eval-set decontamination (n-gram collision against a held-out set),
* train/test split leakage (exact content hash crossing splits),
* PII detection / redaction accounting (JVM regex, no Python),
* intra-document repetition scoring (the classic low-quality signal),
* fixed-size token chunking with stride (sequence prep).

All five are pure DataFrame expressions (codegen, zero Python) with DuckDB
oracles; scale notes per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.functions.numeric import r4
from kinesis_stream_video_project_spark.functions.text import tokens
from kinesis_stream_video_project_spark.operators.dedup import shingles_of
from kinesis_stream_video_project_spark.operators.sampling import hash_bucket
from kinesis_stream_video_project_spark.plans.registry import register

# DuckDB twins of the Spark-side building blocks (kept textually adjacent so
# the two stay in lockstep):
#   hash_bucket(doc_id)        -> _DD_BUCKET (see queries_llm.py)
#   shingles(text, k)          -> _dd_ngrams(k)
_DD_BUCKET = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100)"


def _dd_ngrams(k: int, toks: str = "string_split(text, ' ')") -> str:
    """DuckDB n-gram list matching operators/dedup.py::shingles: one shingle
    per start position 1..max(len-k+1, 1); trailing short shingles join the
    remaining tokens (array_to_string == concat_ws null-skipping)."""
    return (
        f"list_transform(generate_series(1, greatest(len({toks}) - {k - 1}, 1)), "
        f"i -> array_to_string(list_slice({toks}, i, i + {k - 1}), ' '))"
    )


@register(
    "decontaminate_ngram_overlap",
    tags=("NS-curation", "O-29", "O-31"),
    oracle=f"""
WITH eval_grams AS (
    SELECT DISTINCT UNNEST({_dd_ngrams(5)}) AS g
    FROM documents WHERE {_DD_BUCKET} >= 90
),
train_grams AS (
    SELECT doc_id, UNNEST(list_distinct({_dd_ngrams(5)})) AS g
    FROM documents WHERE {_DD_BUCKET} < 80
)
SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared_ngrams
FROM train_grams t JOIN eval_grams e USING (g)
GROUP BY t.doc_id
""",
)
def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (north-star): training documents whose
    5-gram sets collide with the held-out eval split (hash-bucket >= 90,
    the same split train_test_split_counts assigns), with the distinct
    collision count — the standard n-gram contamination check run before
    any benchmark number is trusted.

    Scale shape: an eval/benchmark set is tiny relative to a 100 TB corpus,
    so its distinct 5-gram set BROADCASTS; training documents explode to
    distinct (doc_id, gram) pairs that hash-join the broadcast set locally
    — no corpus shuffle at all, and the per-doc count aggregates on the
    already-colocated doc_id. Contaminated-doc output is a tiny fraction of
    the corpus by construction."""
    d = io.load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    # Tokens materialize in their own projection before shingling — see
    # operators/dedup.py::shingles_of on why inlining re-tokenizes per
    # shingle position (measured ~5x on this query).
    grams5 = F.array_distinct(shingles_of(F.col("_toks"), 5))
    # explode_outer + isNotNull (not plain explode): see
    # operators/dedup.py::blocked_jaccard_near_dups — a non-outer Generate
    # gets a `size(...) > 0` filter inferred and pushed below the staged
    # projection with the whole 5-gram expression inlined (double work).
    eval_grams = (
        d.filter(b >= 90)
        .select(tokens(F.col("text")).alias("_toks"))
        .select(F.explode_outer(grams5).alias("g"))
        .filter(F.col("g").isNotNull())
        .distinct()
    )
    train_grams = (
        d.filter(b < 80)
        .select("doc_id", tokens(F.col("text")).alias("_toks"))
        .select("doc_id", F.explode_outer(grams5).alias("g"))
        .filter(F.col("g").isNotNull())
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


@register(
    "split_leakage_check",
    tags=("NS-curation", "O-28", "O-12"),
    oracle=f"""
WITH train AS (
    SELECT md5(text) AS h, MIN(doc_id) AS train_rep, COUNT(*) AS n_train_copies
    FROM documents WHERE {_DD_BUCKET} < 80
    GROUP BY md5(text)
)
SELECT d.doc_id AS test_doc_id, t.train_rep, CAST(t.n_train_copies AS BIGINT) AS n_train_copies
FROM documents d JOIN train t ON md5(d.text) = t.h
WHERE {_DD_BUCKET} >= 90
""",
)
def split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-content leakage across the train/test split (north-star): the
    hash-bucket split is keyed on doc_id, so two IDENTICAL texts ingested
    under different ids can land on opposite sides — exactly the leak that
    silently inflates eval numbers. Detected by joining content hashes of
    the test split against the train split.

    Scale shape: both sides reduce to (md5, id) — 16-byte digests shuffle,
    never documents; the train side pre-aggregates one row per distinct
    text before the join."""
    d = io.load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    train = (
        d.filter(b < 80)
        .groupBy(F.md5("text").alias("h"))
        .agg(
            F.min("doc_id").alias("train_rep"),
            F.count(F.lit(1)).alias("n_train_copies"),
        )
    )
    test = d.filter(b >= 90).select(
        F.col("doc_id").alias("test_doc_id"), F.md5("text").alias("h")
    )
    return test.join(train, "h").select(
        "test_doc_id", "train_rep", "n_train_copies"
    )


# PII patterns restricted to syntax Java regex and RE2 (DuckDB) interpret
# identically: explicit classes, bounded repetition, no lookaround.
_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
_PHONE_RE = "[0-9]{3}[- .][0-9]{3}[- .][0-9]{4}"
_IPV4_RE = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"


@register(
    "pii_scrub",
    tags=("NS-curation", "O-23"),
    oracle=f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{_IPV4_RE}')) AS BIGINT)  AS n_ipv4,
       md5(regexp_replace(regexp_replace(regexp_replace(text,
            '{_EMAIL_RE}', '<EMAIL>', 'g'),
            '{_PHONE_RE}', '<PHONE>', 'g'),
            '{_IPV4_RE}', '<IP>', 'g')) AS redacted_md5
FROM documents
""",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction accounting (north-star): per-document
    counts of email/phone/IPv4 matches and the md5 of the redacted text
    (placeholders substituted) — the audit artifact a curation run logs
    before the scrubbed corpus ships. All three patterns are JVM
    `regexp_*` expressions inside codegen; the md5 keeps the output narrow
    (the scrubbed text itself would be written to the output table, not
    returned to a driver).

    Scale: embarrassingly parallel scan — no shuffle, no Python."""
    d = io.load_table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
            _PHONE_RE,
            "<PHONE>",
        ),
        _IPV4_RE,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(text, '{_EMAIL_RE}', 0)"))
        .cast("long")
        .alias("n_emails"),
        F.size(F.expr(f"regexp_extract_all(text, '{_PHONE_RE}', 0)"))
        .cast("long")
        .alias("n_phones"),
        F.size(F.expr(f"regexp_extract_all(text, '{_IPV4_RE}', 0)"))
        .cast("long")
        .alias("n_ipv4"),
        F.md5(redacted).alias("redacted_md5"),
    )


def bigram_rep_ratio_expr(toks: Column) -> F.Column:
    """Fraction of repeated bigrams: 1 - distinct/total (4-dp rounded).
    ``toks`` must be a materialized token-array column (see
    operators/dedup.py::shingles_of)."""
    bigrams = shingles_of(toks, 2)
    return r4(
        1.0
        - F.size(F.array_distinct(bigrams)).cast("double")
        / F.size(bigrams).cast("double")
    )


def top_token_ratio_expr(toks: Column) -> F.Column:
    """Frequency share of the single most common token (4-dp rounded).
    ``toks`` must be a materialized token-array column.

    Computed as the longest equal-run in the SORTED token array via one
    aggregate fold: O(n log n) comparisons per document instead of the
    naive O(unique x total) count-per-distinct-token scan (~20x fewer
    string comparisons on this corpus' ~200-token docs)."""
    run_state = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    return r4(run_state["best"].cast("double") / F.size(toks).cast("double"))


def pii_count_expr(text: Column | str = "text") -> F.Column:
    """Total email/phone/IPv4 matches in a document."""
    col = text if isinstance(text, str) else "text"
    return (
        F.size(F.expr(f"regexp_extract_all({col}, '{_EMAIL_RE}', 0)"))
        + F.size(F.expr(f"regexp_extract_all({col}, '{_PHONE_RE}', 0)"))
        + F.size(F.expr(f"regexp_extract_all({col}, '{_IPV4_RE}', 0)"))
    ).cast("long")


@register(
    "repetition_score",
    tags=("NS-curation", "O-31"),
    oracle=f"""
SELECT doc_id,
       (floor((1.0 - CAST(len(list_distinct({_dd_ngrams(2)})) AS DOUBLE)
                   / len({_dd_ngrams(2)})) * 10000.0 + 0.5) / 10000.0) AS bigram_rep_ratio,
       (floor((CAST(list_max(list_transform(list_distinct(string_split(text, ' ')),
                    t -> len(list_filter(string_split(text, ' '), x -> x = t)))) AS DOUBLE)
                   / len(string_split(text, ' '))) * 10000.0 + 0.5) / 10000.0) AS top_token_ratio
FROM documents
""",
)
def repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition signals (north-star quality gate): the
    fraction of repeated bigrams (1 - distinct/total) and the frequency
    share of the single most common token — the two cheapest detectors of
    degenerate/boilerplate text, thresholded upstream of training. The
    expressions are shared with curation_pipeline_v2, which evaluates them
    inline on its own scan instead of re-joining this query's output.

    Scale: per-row expression evaluation only (no explode, no shuffle).
    The top-token scan is O(unique x total) per document — bounded by
    document length, the right trade against an explode + double shuffle
    per corpus."""
    d = io.load_table(spark, sf_dir, "documents")
    return d.select("doc_id", tokens(F.col("text")).alias("_toks")).select(
        "doc_id",
        bigram_rep_ratio_expr(F.col("_toks")).alias("bigram_rep_ratio"),
        top_token_ratio_expr(F.col("_toks")).alias("top_token_ratio"),
    )


@register(
    "near_dup_shingle_jaccard",
    tags=("NS-curation", "O-29"),
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source, lang,
         unnest(list_distinct({_dd_ngrams(3)})) AS tok
  FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ninter
  FROM toks a
  JOIN toks b ON a.tok = b.tok AND a.source = b.source AND a.lang = b.lang
             AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       (floor((CAST(ninter AS DOUBLE) / (sa.n + sb.n - ninter)) * 10000.0 + 0.5) / 10000.0) AS jaccard
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE (floor((CAST(ninter AS DOUBLE) / (sa.n + sb.n - ninter)) * 10000.0 + 0.5) / 10000.0) >= 0.5
""",
)
def near_dup_shingle_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked exact Jaccard at 3-SHINGLE granularity (O-29 exact tier, the
    semantically-right variant for this corpus): random pairs average
    unigram Jaccard 0.62 (shared word-soup vocabulary), so the unigram
    tier (`near_dup_jaccard`, kept for the token-set machinery oracle)
    reports ~91k 'pairs' at sf0.1 while 3-shingle Jaccard >= 0.5 isolates
    the 4 genuinely near-identical in-block pairs — the same granularity
    the MinHash-LSH tier signatures and verifies."""
    from kinesis_stream_video_project_spark.operators.dedup import (
        blocked_jaccard_near_dups,
    )

    d = io.load_table(spark, sf_dir, "documents")
    return blocked_jaccard_near_dups(d, threshold=0.5, shingle_k=3)


def _dup_cluster_components(d: DataFrame) -> DataFrame:
    """Shared (node, component) labels for the dup-cluster family: the
    exact-dup pairs (content-hash self-join) unioned with the 3-shingle
    blocked-Jaccard near-dup pairs, consolidated by iterative min-label
    connected components. Both pair tiers emit ``doc_a < doc_b`` and the
    union is ``.distinct()``-ed here, so the components operator is told
    ``pairs_deduped=True`` and skips its own edge-dedup shuffle (r14
    optimization round — re-deduping an already-distinct oriented pair
    list was a pure extra exchange). Used by ``dup_clusters`` (which adds
    cluster sizes) and ``curation_pipeline_v2`` (which only needs the
    non-representative doc ids and skips the size aggregate + join
    entirely)."""
    from kinesis_stream_video_project_spark.operators.components import (
        connected_components,
    )
    from kinesis_stream_video_project_spark.operators.dedup import (
        blocked_jaccard_near_dups,
    )

    a = d.select(F.col("doc_id").alias("doc_a"), F.md5("text").alias("h"))
    b = d.select(F.col("doc_id").alias("doc_b"), F.md5("text").alias("h"))
    exact_pairs = (
        a.join(b, "h").filter(F.col("doc_a") < F.col("doc_b")).select("doc_a", "doc_b")
    )
    near_pairs = blocked_jaccard_near_dups(d, threshold=0.5, shingle_k=3).select(
        "doc_a", "doc_b"
    )
    return connected_components(
        exact_pairs.union(near_pairs).distinct(), pairs_deduped=True
    )


@register(
    "dup_clusters",
    tags=("NS-curation", "O-28", "O-29"),
    oracle=f"""
WITH RECURSIVE
raw_pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM documents a JOIN documents b
      ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
    UNION
    SELECT doc_a, doc_b FROM (
        WITH toks AS (
          SELECT doc_id, source, lang,
                 unnest(list_distinct({_dd_ngrams(3)})) AS tok
          FROM documents
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ninter
          FROM toks a
          JOIN toks b ON a.tok = b.tok AND a.source = b.source AND a.lang = b.lang
                     AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE (floor((CAST(ninter AS DOUBLE) / (sa.n + sb.n - ninter)) * 10000.0 + 0.5) / 10000.0) >= 0.5
    )
),
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM raw_pairs
    UNION
    SELECT doc_b, doc_a FROM raw_pairs
),
reach(node, label) AS (
    SELECT u, u FROM edges
    UNION
    SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.node
),
comp AS (SELECT node, MIN(label) AS component FROM reach GROUP BY node)
SELECT c.node AS doc_id,
       c.component AS cluster_rep,
       CAST(s.n AS BIGINT) AS cluster_size
FROM comp c
JOIN (SELECT component, COUNT(*) AS n FROM comp GROUP BY component) s
  USING (component)
""",
)
def dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster consolidation (north-star): union the exact-dup
    pairs (content-hash self-join) with the 3-shingle near-dup pairs, take
    CONNECTED COMPONENTS (operators/components.py — iterative min-label
    propagation, the DataFrame Hash-to-Min), and emit each clustered doc
    with its canonical representative (min doc_id) and cluster size.
    Pairwise dedup under-deletes on transitive chains (A~B, B~C, A!~C);
    components are what an actual curation run keeps/drops by. The oracle
    replays the same edges through a recursive CTE."""
    d = io.load_table(spark, sf_dir, "documents")
    comp = _dup_cluster_components(d)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return comp.join(sizes, "component").select(
        F.col("node").alias("doc_id"),
        F.col("component").alias("cluster_rep"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


@register(
    "tfidf_topk",
    tags=("NS-curation", "O-30", "O-31"),
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
df AS (
    SELECT term, COUNT(*) AS df FROM tf GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
q AS (
    SELECT term, df FROM df ORDER BY df DESC, term LIMIT 5
),
scored AS (
    SELECT tf.doc_id,
           SUM((CAST(tf.tf AS DOUBLE) / tf.dl)
               * ((n.n_docs - q.df + 0.5) / (q.df + 0.5))) AS raw
    FROM tf JOIN q USING (term) CROSS JOIN n
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
def tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF retrieval top-k (north-star: the lexical tier of similarity
    search, next to cosine_topk's embedding tier): score every document
    against a query — here the corpus's 5 highest-document-frequency terms,
    derived identically in both engines — and return the top 20.

    The idf is the RATIONAL BM25 idf core (N - df + 0.5)/(df + 0.5)
    *without* the log: log implementations differ across libm builds by
    ulps, which a hash check cannot tolerate, while +,*,/ are IEEE-exact in
    both engines; the ranking is the same monotone order per term. Ranking
    runs over the ROUNDED score (4 dp) with doc_id tiebreak so cross-engine
    summation-order noise (~1e-16) cannot flip ranks.

    Scale shape: postings (doc_id, term, tf) shuffle once on term for the
    df aggregate; the 5-term query set and the 1-row corpus count broadcast
    back onto the postings; top-20 rides TakeOrderedAndProject. At 100 TB
    the postings table is the materialized inverted index."""
    d = io.load_table(spark, sf_dir, "documents")
    # Stage the token array in its own projection: size() and the Generate
    # live in DIFFERENT operators, so an inlined tokens(text) is split()
    # twice per row — codegen's subexpression elimination only works within
    # one Project (r14 optimization round: tf stage 1.74 s -> 0.43 s
    # min-of-6 interleaved at sf0.1, identical output).
    # explode_outer + isNotNull: avoids the inferred size(tokens(text))>0
    # filter re-tokenizing every row (operators/dedup.py rationale).
    tok = (
        d.select("doc_id", tokens(F.col("text")).alias("_toks"))
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
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    q = df_.orderBy(F.col("df").desc(), F.col("term")).limit(5)
    contrib = (F.col("tf").cast("double") / F.col("dl")) * (
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        tf.join(F.broadcast(q), "term")
        .join(F.broadcast(n))
        .groupBy("doc_id")
        .agg(F.sum(contrib).alias("raw"))
        .select("doc_id", r4(F.col("raw")).alias("score"))
    )
    # Top-k FIRST (sort+limit => TakeOrderedAndProject, no global sort
    # materialization), THEN rank the 20 survivors — ranking the full corpus
    # with an unpartitioned window would funnel every doc through one task.
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(20)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def _kmeans_ivf_oracle_sql() -> str:
    """DuckDB replay of the ENTIRE learned-IVF tier: the deterministic Lloyd
    loop (modulo init, 2 unrolled iterations of per-(cell,dim) mean
    centroids + argmax-cosine assignment with the same smaller-cell
    tiebreak as kmeans_assign's max_by struct), then the nprobe=2 probe and
    ranked member cosine. Every step is the same double arithmetic as the
    Spark side, so the learned cells — and therefore the approximate
    result set — agree exactly."""
    from kinesis_stream_video_project_spark.plans.queries_llm import _dd_cosine

    def centroids(src: str) -> str:
        return f"""
  SELECT cell, list(mean_c ORDER BY dim) AS centroid
  FROM (
    SELECT cell, dim, AVG(c) AS mean_c
    FROM (
      SELECT cell, UNNEST(generate_series(1, len(embedding))) AS dim,
             UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS c
      FROM {src}
    )
    GROUP BY cell, dim
  )
  GROUP BY cell
"""

    def assign(cents: str) -> str:
        return f"""
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_dd_cosine('e.embedding', 'c.centroid')} DESC, c.cell
           ) AS rn
    FROM embeddings e CROSS JOIN {cents} c
  ) WHERE rn = 1
"""

    return f"""
WITH
a0 AS (SELECT vec_id, embedding, vec_id % 10 AS cell FROM embeddings),
c1 AS ({centroids('a0')}),
a1 AS ({assign('c1')}),
c2 AS ({centroids('a1')}),
a2 AS ({assign('c2')}),
c3 AS ({centroids('a2')}),
q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5),
cell_scores AS (
  SELECT q.query_id, q.qvec, c.cell,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY {_dd_cosine('q.qvec', 'c.centroid')} DESC, c.cell
         ) AS cr
  FROM q CROSS JOIN c3 c
),
probed AS (SELECT query_id, qvec, cell FROM cell_scores WHERE cr <= 2),
scored AS (
  SELECT p.query_id, m.vec_id,
         (floor(({_dd_cosine('p.qvec', 'm.embedding')}) * 10000.0 + 0.5) / 10000.0) AS cos_sim
  FROM probed p JOIN a2 m USING (cell)
  WHERE m.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, vec_id, cos_sim,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 10
"""


@register(
    "ivf_kmeans_topk",
    tags=("NS-curation", "O-30"),
    oracle=_kmeans_ivf_oracle_sql(),
)
def ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k over LEARNED k-means cells (O-30 scale tier,
    upgraded from the label-proxy ivf_topk): deterministic Lloyd iterations
    built entirely from DataFrame ops (operators/similarity.py::
    kmeans_assign — modulo init, broadcast centroids, map-side max_by
    assignment), then the same nprobe cell-pruned search. Measured
    recall@10 at nprobe=2/10 cells: 0.40-0.42 vs 0.22-0.30 for label
    cells on this fixture (asserted in pytest).

    Hash-checked since r4: deterministic init + argmax tiebreaks make the
    whole learned tier replayable — the oracle unrolls the two Lloyd
    iterations in SQL (``_kmeans_ivf_oracle_sql``), validated exact at
    sf0.001/0.01/0.1."""
    from kinesis_stream_video_project_spark.operators.similarity import (
        ivf_topk_kmeans,
    )

    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk_kmeans(q, e, k=10, nprobe=2, n_cells=10, n_iters=2)


@register(
    "seq_pack_docs",
    tags=("NS-curation", "O-33"),
    oracle="""
WITH RECURSIVE sized AS (
  SELECT source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 8 AS BIGINT) AS shard,
         doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source, shard ORDER BY doc_id) AS rn
  FROM sized
),
fold AS (
  SELECT source, shard, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_idx, n_tokens AS bin_fill
  FROM ranked WHERE rn = 1
  UNION ALL
  SELECT s.source, s.shard, s.doc_id, s.n_tokens, s.rn,
         CASE WHEN f.bin_fill + s.n_tokens > 512 THEN f.bin_idx + 1 ELSE f.bin_idx END,
         CASE WHEN f.bin_fill + s.n_tokens > 512 THEN s.n_tokens ELSE f.bin_fill + s.n_tokens END
  FROM fold f JOIN ranked s ON s.source = f.source AND s.shard = f.shard AND s.rn = f.rn + 1
)
SELECT source, shard, doc_id, n_tokens, bin_idx, bin_fill FROM fold
""",
)
def seq_pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing (north-star): concatenate documents into
    512-token training sequences per (source, shard), in doc_id order — the
    padding-waste killer between chunking and tokenization. A sequential
    fold (bin boundaries depend on all prior rows), so it runs as
    applyInPandas per (source, md5-bucket(doc_id) % 8) shard
    (operators/packing.py) — sharding restores linear parallelism when a
    corpus has few sources.

    Hash-checked since r4: the oracle replays the exact greedy fold as a
    DuckDB recursive CTE stepping one rank per (source, shard) — every step
    is integer arithmetic, so the two engines agree bit-for-bit (recursion
    depth = max rows per shard, ≤ corpus/(sources·shards); fine for the
    sf0.01 driver gate). The pytest pure-Python twin (greedy_fill) stays as
    the third implementation of the same spec."""
    from kinesis_stream_video_project_spark.operators.packing import pack_sequences

    d = io.load_table(spark, sf_dir, "documents")
    sized = d.select(
        "source", "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    return pack_sequences(
        sized, group_col="source", order_col="doc_id", size_col="n_tokens", budget=512
    )


_V2_ORACLE = f"""
WITH RECURSIVE
train AS (
    SELECT doc_id, lang, source, text,
           len(string_split(text, ' ')) AS n_toks
    FROM documents WHERE {_DD_BUCKET} < 80
),
rep AS (
    SELECT doc_id,
           (floor((1.0 - CAST(len(list_distinct({_dd_ngrams(2)})) AS DOUBLE)
                       / len({_dd_ngrams(2)})) * 10000.0 + 0.5) / 10000.0) AS bigram_rep_ratio,
           (floor((CAST(list_max(list_transform(list_distinct(string_split(text, ' ')),
                        t -> len(list_filter(string_split(text, ' '), x -> x = t)))) AS DOUBLE)
                       / len(string_split(text, ' '))) * 10000.0 + 0.5) / 10000.0) AS top_token_ratio
    FROM documents
),
pii AS (
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}'))
         + len(regexp_extract_all(text, '{_PHONE_RE}'))
         + len(regexp_extract_all(text, '{_IPV4_RE}')) AS n_pii
    FROM documents
),
eval_grams AS (
    SELECT DISTINCT UNNEST({_dd_ngrams(5)}) AS g
    FROM documents WHERE {_DD_BUCKET} >= 90
),
contaminated AS (
    SELECT DISTINCT t.doc_id
    FROM (SELECT doc_id, UNNEST(list_distinct({_dd_ngrams(5)})) AS g
          FROM documents WHERE {_DD_BUCKET} < 80) t
    JOIN eval_grams e USING (g)
),
raw_pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM documents a JOIN documents b
      ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
    UNION
    SELECT doc_a, doc_b FROM (
        WITH toks AS (
          SELECT doc_id, source, lang,
                 unnest(list_distinct({_dd_ngrams(3)})) AS tok
          FROM documents
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS ninter
          FROM toks a
          JOIN toks b ON a.tok = b.tok AND a.source = b.source AND a.lang = b.lang
                     AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT doc_a, doc_b
        FROM inter
        JOIN sizes sa ON doc_a = sa.doc_id
        JOIN sizes sb ON doc_b = sb.doc_id
        WHERE (floor((CAST(ninter AS DOUBLE) / (sa.n + sb.n - ninter)) * 10000.0 + 0.5) / 10000.0) >= 0.5
    )
),
edges AS (
    SELECT doc_a AS u, doc_b AS v FROM raw_pairs
    UNION
    SELECT doc_b, doc_a FROM raw_pairs
),
reach(node, label) AS (
    SELECT u, u FROM edges
    UNION
    SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.node
),
non_reps AS (
    SELECT node AS doc_id FROM (
        SELECT node, MIN(label) AS component FROM reach GROUP BY node
    ) WHERE node != component
)
SELECT t.lang, t.source,
       COUNT(*) AS n_docs,
       CAST(SUM(t.n_toks) AS BIGINT) AS total_tokens
FROM train t
JOIN rep USING (doc_id)
JOIN pii USING (doc_id)
WHERE rep.bigram_rep_ratio <= 0.1
  AND rep.top_token_ratio <= 0.2
  AND pii.n_pii = 0
  AND t.doc_id NOT IN (SELECT doc_id FROM contaminated)
  AND t.doc_id NOT IN (SELECT doc_id FROM non_reps)
GROUP BY t.lang, t.source
ORDER BY t.lang, t.source
"""


@register(
    "curation_pipeline_v2",
    tags=("NS-curation", "O-28", "O-29", "O-31"),
    oracle=_V2_ORACLE,
)
def curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation over the round-2 operators, composed from the
    SAME registered stages a user would run individually (north-star): the
    train split, gated on repetition (bigram repeat <= 0.1, top-token
    share <= 0.2, thresholds on the 4-dp portable rounding), PII-free,
    decontaminated against the eval split's 5-grams, and reduced to
    dup-cluster representatives — then the per-(lang, source) doc/token
    budget a tokenizer run would consume.

    Scale shape: the repetition and PII gates are per-row EXPRESSIONS
    (shared builders with the standalone repetition_score / pii_scrub
    queries), so they ride the single train scan — no join, no second
    pass; the only joins are anti-joins of SMALL sets (contaminated docs
    and non-representative cluster members are tiny fractions of a corpus
    by construction), both keyed on doc_id."""
    d = io.load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    gated = (
        d.filter(b < 80)
        .select(
            "doc_id",
            "lang",
            "source",
            tokens(F.col("text")).alias("_toks"),
            pii_count_expr().alias("_pii"),
        )
        .select(
            "doc_id",
            "lang",
            "source",
            F.size(F.col("_toks")).alias("n_toks"),
            bigram_rep_ratio_expr(F.col("_toks")).alias("_rep"),
            top_token_ratio_expr(F.col("_toks")).alias("_top"),
            "_pii",
        )
        .filter(
            (F.col("_rep") <= 0.1) & (F.col("_top") <= 0.2) & (F.col("_pii") == 0)
        )
    )
    contaminated = decontaminate_ngram_overlap(spark, sf_dir).select("doc_id")
    # Only the NON-REPRESENTATIVE ids are needed here, so take them straight
    # from the component labels: the cluster-size aggregate + join-back that
    # dup_clusters adds cannot change which rows have node != component
    # (it is an inner join on a key derived from comp itself) — dropping it
    # removes one exchange + one join from this plan (r14 optimization
    # round; output bit-identical, oracle unchanged).
    non_reps = (
        _dup_cluster_components(d)
        .filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("doc_id"))
    )
    gated = gated.join(contaminated, "doc_id", "left_anti").join(
        non_reps, "doc_id", "left_anti"
    )
    return (
        gated.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
        )
        .orderBy("lang", "source")
    )


@register(
    "chunk_documents",
    tags=("NS-curation", "O-26"),
    oracle=f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST((s - 1) // 48 AS BIGINT) AS chunk_idx,
       CAST(s AS BIGINT) AS chunk_start,
       CAST(len(list_slice(toks, s, s + 63)) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks, s, s + 63), ' ')) AS chunk_md5
FROM t, UNNEST(generate_series(1, greatest(len(toks) - 63, 1) + 47, 48)) AS u(s)
""",
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with stride (north-star sequence prep):
    64-token chunks every 48 tokens (16-token overlap), the final chunk
    clipped at the document end — the standard pre-tokenizer windowing.
    Emits chunk index/start/length plus the chunk md5 (the chunk text
    itself ships to the output table at scale, not through the driver).

    Scale: explode of an arithmetic sequence — output rows ~= corpus
    tokens / stride, no shuffle; the chunk boundary math is identical
    integer arithmetic in both engines."""
    d = io.load_table(spark, sf_dir, "documents")
    # Token array staged first: the sequence bound (inside the Generate) and
    # the projected `toks` column are different operators, so inlining
    # tokens(text) in both re-splits every row (the r14-measured 4x rule).
    staged = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size("toks") - 63, F.lit(1)) + 47,
        F.lit(48),
    )
    # explode_outer: `starts` is structurally non-empty (sequence from 1),
    # but a non-outer explode still gets a size()>0 filter inferred and
    # pushed down with the token expression inlined (dedup.py rationale).
    return (
        staged.select("doc_id", "toks", F.explode_outer(starts).alias("s"))
        .select(
            "doc_id",
            ((F.col("s") - 1) / 48).cast("long").alias("chunk_idx"),
            F.col("s").cast("long").alias("chunk_start"),
            F.size(F.slice(F.col("toks"), F.col("s"), 64))
            .cast("long")
            .alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", F.slice(F.col("toks"), F.col("s"), 64))).alias(
                "chunk_md5"
            ),
        )
    )
