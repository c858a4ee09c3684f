"""SemDeDup — semantic deduplication via cluster-local embedding
cosine (Abbas/Tirumala/Simig/Ganguli/Morcos 2023, arXiv:2303.09540):
k-means the embedding space, and within each cluster drop all but one
of every near-identical group. The web-scale result (their LAION/
C4 runs: few-% data removed, equal-or-better downstream) is exactly
the 100 TB training-data use case; the CLUSTER-LOCAL pair join is what
makes it tractable — the self-join is bounded per cell, never corpus-
wide (the IVF/LSH bucketing argument, here applied to dedup instead of
search).

Determinism contract (the repo's min-keeper rule, replacing the
paper's arbitrary within-group choice): a vector is DROPPED iff some
SMALLER-id vector in its cell has cosine >= threshold with it. One
anti-join — no transitive closure (pinned in tests: the rule is
pairwise, stated; dup CHAINS keep their min-id head and drop every
directly-similar follower, which at the paper's 0.95+ thresholds is
the same set in practice).

Everything reuses the deterministic primitives already under the hash
gate: ``kmeans_assign`` (vec_id-mod init, max-cosine assignment,
(cos, -cell) tiebreak) and the hoisted-norm pair cosine of
``embedding_near_dups`` — so the full pipeline is oracle-checkable
with the existing unrolled-CTE k-means SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.numeric import r4
from kinesis_stream_video_project_spark.functions.vectors import dot, l2_norm
from kinesis_stream_video_project_spark.operators.similarity import kmeans_assign


def semdedup_report(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 10,
    n_iters: int = 2,
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Per-vector SemDeDup verdict: ``(vec_id, cell, kept)`` — kept is
    false iff a smaller-id cell-mate sits at r4-rounded cosine >=
    ``threshold`` (the threshold compare happens on the 4-dp ROUNDED
    value, the repo's cross-engine float rule).

    Scale: k-means cost is the documented Lloyd step; the pair join is
    cell-keyed with norms hoisted per row (one dot fold per pair); the
    drop set is id-only and the verdict is one left-anti-style join
    back to the ledger-sized (id, cell) assignment. The (id, vec, cell)
    frame localCheckpoints once — the unrolled 2-iteration Lloyd
    lineage below it would otherwise recompute per consumer (both pair
    sides + the verdict join). The pair cosine stays the zip_with fold:
    a 64-term scalar unroll was MEASURED SLOWER here (24 s vs 12 s —
    the expression blows the codegen method budget and falls back to
    interpreted evaluation; the pq finding applies to SMALL fixed dims
    like its sub_d = 8, stated). The pair-volume lever is ``n_cells``
    — the paper's own scale knob: pairs fall quadratically with cells
    (SemDeDup runs thousands of clusters at web scale).

    Composition of :func:`semdedup_build_index` (the one-off k-means
    stage — in production written out via :func:`semdedup_write_index`
    and reused across threshold sweeps / incremental batches) and
    :func:`semdedup_report_from_index`; identical output pinned in
    tests, including through the parquet round-trip."""
    staged = semdedup_build_index(
        corpus, n_cells=n_cells, n_iters=n_iters, corpus_id=corpus_id, vec=vec
    ).localCheckpoint()
    return semdedup_report_from_index(
        staged, threshold=threshold, corpus_id=corpus_id, vec=vec
    )


def semdedup_build_index(
    corpus: DataFrame,
    n_cells: int = 10,
    n_iters: int = 2,
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """The one-off SemDeDup index: the (id, vec, cell) k-means
    assignment frame every consumer of :func:`semdedup_report` joins
    against — the stage whose unrolled 2-iteration Lloyd lineage is
    what the in-memory form localCheckpoints (VERDICT r12 item 4: in
    production this is a WRITTEN table, and a threshold sweep or an
    incremental dedup batch re-reads it instead of re-running Lloyd).
    Persist with :func:`semdedup_write_index`; reload with
    :func:`semdedup_read_index`."""
    # keep_vec: the assignment frame carries the vector through the Arrow
    # batches already, so the former base ⋈ cells join-back (one corpus-
    # sized exchange) is pure cost — and with that join gone the (id, vec)
    # projection has a SINGLE consumer (the Lloyd init, whose first-round
    # eager localCheckpoint materializes it — one pass over a text-derived
    # corpus' tokenize+hash pipeline), so the former standalone base
    # staging is a redundant extra corpus materialization (r14
    # optimization round; consumers of THIS function's output stage it
    # themselves: semdedup_report localCheckpoints the composition,
    # semdedup_write_index writes it).
    return kmeans_assign(
        corpus.select(F.col(corpus_id), F.col(vec)),
        n_cells=n_cells,
        n_iters=n_iters,
        corpus_id=corpus_id,
        vec=vec,
        keep_vec=True,
    )


def semdedup_write_index(index: DataFrame, path: str) -> None:
    """Persist a :func:`semdedup_build_index` frame partitioned by
    cell — the pair join is cell-keyed, so each task of the verdict
    stage reads exactly one cell's files (the on-disk form of the
    cluster-local argument that makes SemDeDup tractable)."""
    index.write.mode("overwrite").partitionBy("cell").parquet(path)


def semdedup_read_index(spark, path: str) -> DataFrame:
    """Reload a persisted SemDeDup index; the partition column comes
    back as INT via partition-type inference — cast to the build-side
    LONG so the round-trip is schema-identical."""
    return spark.read.parquet(path).withColumn(
        "cell", F.col("cell").cast("long")
    )


def semdedup_report_from_index(
    staged: DataFrame,
    threshold: float = 0.95,
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Verdict half of SemDeDup against a built (or reloaded) index:
    the cell-local (smaller-id, larger-id) pair cosine with hoisted
    norms, the r4-rounded threshold compare, and the left-join verdict
    back to the ledger-sized (id, cell) frame."""
    a = staged.select(
        F.col("cell"),
        F.col(corpus_id).alias("_ida"),
        F.col(vec).alias("_emba"),
        l2_norm(F.col(vec)).alias("_na"),
    )
    b = staged.select(
        F.col("cell"),
        F.col(corpus_id).alias("_idb"),
        F.col(vec).alias("_embb"),
        l2_norm(F.col(vec)).alias("_nb"),
    )
    cos = dot(F.col("_emba"), F.col("_embb")) / (F.col("_na") * F.col("_nb"))
    dropped = (
        a.join(b, "cell")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(r4(cos) >= threshold)
        .select(F.col("_idb").alias(corpus_id))
        .distinct()
        .withColumn("_drop", F.lit(True))
    )
    return (
        staged.select(corpus_id, "cell")
        .join(dropped, corpus_id, "left")
        .select(
            corpus_id,
            "cell",
            F.coalesce(~F.col("_drop"), F.lit(True)).alias("kept"),
        )
    )
