"""Cross-document VERBATIM span detection (r8 registration queue).

The position-aware tier of the dedup family: MinHash/Jaccard (whole-doc
set similarity) and containment (subset overlap) are blind to WHERE the
overlap sits and whether it is contiguous; training-data curation also
needs the "these two documents share an exact 50-token run" signal —
the memorization-risk dedup of Lee et al., "Deduplicating Training Data
Makes Language Models Better" (the public ExactSubstr step, there built
on a suffix array). A distributed engine gets the same signal from
positional n-gram postings: two documents share a verbatim run of
``m + L - 1`` tokens iff they share ``m`` CONSECUTIVE positional
L-grams, and consecutive matches line up on one diagonal of the match
matrix (pos_a - pos_b constant) — so maximal runs are gaps-and-islands
over (pair, diagonal), an all-integer reduction both engines compute
identically.

Scale design: postings (gram hash, doc_id, pos) shuffle once on the
hash; the pair join is postings-keyed (id+pos payloads, never text —
the LSH pair discipline). A ``max_df`` guard drops grams appearing in
more than ``max_df`` documents BEFORE the join: boilerplate grams
(license headers, navigation chrome) otherwise contribute df² pair
rows while signalling nothing pair-specific — the same hot-key
exclusion as blocked_jaccard's block cap, and the dropped grams are the
ones a boilerplate detector (boilerplate_prefixes) already owns. The
diagonal islands windows partition on (doc_a, doc_b, diagonal) — finer
than per-pair, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.text import tokens
from kinesis_stream_video_project_spark.operators.dedup import (
    shingle_hash,
    shingles_of,
)


def positional_grams(
    docs: DataFrame,
    span_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, pos, gh): the portable md5 hash of the L-token gram at
    each 1-based token position. Documents shorter than ``span_tokens``
    tokens emit nothing (no full L-gram exists — mirroring the oracle's
    ``len(t) >= L`` guard, and the truncated tail shingle shingles_of
    pads for short docs is explicitly excluded). Hash, not gram text,
    through the shuffle: 8 B vs ~50 B payloads, and the downstream join
    compares hashes in both engines so md5 collisions (if any) affect
    both sides identically."""
    toked = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    ).filter(F.size("_toks") >= span_tokens)
    shingled = toked.select(
        "doc_id", shingles_of(F.col("_toks"), span_tokens).alias("_grams")
    )
    return (
        shingled.select(
            "doc_id", F.posexplode_outer("_grams").alias("_p0", "_g")
        )
        .filter(F.col("_g").isNotNull())
        .select(
            "doc_id",
            (F.col("_p0") + 1).alias("pos"),
            shingle_hash(F.col("_g")).alias("gh"),
        )
    )


def verbatim_span_pairs(
    docs: DataFrame,
    span_tokens: int = 8,
    max_df: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Document pairs sharing at least one verbatim ``span_tokens``-token
    run: ``(doc_a, doc_b, n_shared_grams, max_span_tokens)`` with
    doc_a < doc_b, n_shared_grams = count of matching positional-gram
    pairs, max_span_tokens = length in tokens of the longest shared
    verbatim run (= longest diagonal island + span_tokens - 1).

    Grams occurring in more than ``max_df`` documents are excluded
    before pairing (boilerplate guard — see module docstring); a run
    containing such a gram is therefore reported as split around it,
    which under-reports max_span for boilerplate-riding runs by design.
    Repeated grams WITHIN one document are fine: each (pos_a, pos_b)
    match lands on its own diagonal.

    All-integer (positions, counts, diagonal arithmetic) → hash-exact
    in any engine."""
    g = positional_grams(
        docs, span_tokens=span_tokens, text_col=text_col, id_col=id_col
    )
    # df guard on DOCUMENT frequency (distinct docs containing the gram).
    df_ok = (
        g.groupBy("gh")
        .agg(F.countDistinct("doc_id").alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("gh")
    )
    p = g.join(df_ok, "gh")
    a = p.select(
        F.col("gh"),
        F.col("doc_id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
    )
    b = p.select(
        F.col("gh"),
        F.col("doc_id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
    )
    matches = (
        a.join(b, "gh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            "pos_a",
            "pos_b",
            (F.col("pos_a") - F.col("pos_b")).alias("_diag"),
        )
    )
    # Gaps-and-islands per (pair, diagonal): consecutive pos_a values on
    # one diagonal are one run. pos_a is unique within (pair, diag) —
    # (pos_a, diag) determines pos_b — so row_number needs no tiebreak.
    w = Window.partitionBy("doc_a", "doc_b", "_diag").orderBy("pos_a")
    islands = matches.select(
        "doc_a",
        "doc_b",
        "_diag",
        (F.col("pos_a") - F.row_number().over(w)).alias("_isl"),
    )
    runs = islands.groupBy("doc_a", "doc_b", "_diag", "_isl").agg(
        F.count(F.lit(1)).alias("_run")
    )
    return runs.groupBy("doc_a", "doc_b").agg(
        F.sum("_run").cast("long").alias("n_shared_grams"),
        (F.max("_run") + F.lit(span_tokens - 1)).cast("long").alias(
            "max_span_tokens"
        ),
    )
