"""Focused guards for the r15 Arrow rewrites in operators/similarity.py.

* ``cosine_topk`` became a broadcast-model mapInPandas with BATCH-LOCAL
  top-k pruning and in-Python r4 rounding. The test pins it against an
  inline copy of the pre-r15 JVM form (broadcast pair join + interpreted
  fold + JVM r4 + window) on a corpus engineered to stress exactly the
  risky parts: many Arrow batches per partition (tiny
  maxRecordsPerBatch), duplicate vectors spanning batches so the global
  top-k must win on id tiebreaks ACROSS batch boundaries at an r4
  rounding tie, and a verbatim self-vector so the self-exclusion runs
  inside Python.
* ``kmeans_assign`` gained the empty-corpus guard (r15 ADVICE): an empty
  incremental batch must return an empty assignment, not IndexError in
  every mapInPandas task.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.numeric import r4
from kinesis_stream_video_project_spark.functions.vectors import dot, l2_norm
from kinesis_stream_video_project_spark.operators import similarity as sim


def _reference_cosine_topk(queries, corpus, k):
    """The pre-r15 JVM form, verbatim: the contract the Arrow rewrite
    must match bit-for-bit (same doubles, same tiebreaks)."""
    q = F.broadcast(
        queries.select(
            F.col("query_id"),
            F.col("embedding").alias("_qvec"),
            l2_norm(F.col("embedding")).alias("_qnorm"),
        )
    )
    c = corpus.select(
        F.col("vec_id"),
        F.col("embedding").alias("_cvec"),
        l2_norm(F.col("embedding")).alias("_cnorm"),
    )
    cos = dot(F.col("_qvec"), F.col("_cvec")) / (
        F.col("_qnorm") * F.col("_cnorm")
    )
    scored = c.join(q, c["vec_id"] != q["query_id"]).select(
        "query_id", "vec_id", r4(cos).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "vec_id", "cos_sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def _stress_corpus(spark):
    """300 vectors / 8 dims: ids 0..199 share ONE direction (verbatim
    duplicates -> identical cosine -> the top-k inside that run of ties
    is decided purely by vec_id across Arrow batches), 200..299 are
    deterministic pseudo-random."""
    rows = []
    base = [1.0, 2.0, -3.0, 0.5, 4.0, -1.5, 2.5, 0.25]
    for i in range(200):
        rows.append((i, base))
    for i in range(200, 300):
        rows.append(
            (i, [float(((i * 37 + d * 13) % 17) - 8) / 3.0 for d in range(8)])
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


@pytest.fixture()
def small_batches(spark):
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
    yield
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_cosine_topk_matches_jvm_reference_across_batches(spark, small_batches):
    corpus = _stress_corpus(spark).repartition(5)
    queries = corpus.filter(F.col("vec_id").isin(0, 250, 299)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sim.cosine_topk(queries, corpus, k=10).collect()
    want = _reference_cosine_topk(queries, corpus, k=10).collect()
    key = lambda r: (r["query_id"], r["rank"])  # noqa: E731
    got_s, want_s = sorted(got, key=key), sorted(want, key=key)
    assert len(got_s) == len(want_s) > 0
    for g, w in zip(got_s, want_s):
        # exact equality including the double: the bit-exactness contract
        assert (g["query_id"], g["vec_id"], g["rank"]) == (
            w["query_id"], w["vec_id"], w["rank"],
        )
        assert g["cos_sim"] == w["cos_sim"]
    # the duplicate-direction run forces the id tiebreak at a rounding
    # tie: query 0's top-10 must be the 10 SMALLEST other ids of the run
    q0 = [r["vec_id"] for r in got_s if r["query_id"] == 0]
    assert q0 == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]


def test_cosine_topk_empty_queries(spark):
    corpus = _stress_corpus(spark)
    queries = corpus.filter(F.lit(False)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert sim.cosine_topk(queries, corpus, k=5).count() == 0


def test_cosine_topk_empty_corpus(spark):
    corpus = _stress_corpus(spark)
    empty = corpus.filter(F.lit(False))
    queries = corpus.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert sim.cosine_topk(queries, empty, k=5).count() == 0


def test_kmeans_assign_empty_corpus(spark):
    empty = _stress_corpus(spark).filter(F.lit(False))
    out = sim.kmeans_assign(empty, n_cells=4, n_iters=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "cell"]
