"""SemDeDup (cluster-local embedding dedup): min-id survivor rule,
exact-copy drops, and the pairwise (non-transitive) contract."""

from __future__ import annotations

from kinesis_stream_video_project_spark.operators.semdedup import semdedup_report


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_exact_copies_keep_min_id(spark):
    """Three verbatim copies (cos = 1.0) + one orthogonal vector: the
    smallest id survives, both copies drop, the orthogonal row keeps.
    n_cells=1 isolates the dedup rule from clustering."""
    v = [1.0, 0.0, 2.0, 0.5]
    rows = [(7, v), (3, v), (9, v), (11, [0.0, 5.0, 0.0, 0.0])]
    out = {
        r["vec_id"]: r["kept"]
        for r in semdedup_report(
            _vecs(spark, rows), threshold=0.95, n_cells=1, n_iters=0
        ).collect()
    }
    assert out == {3: True, 7: False, 9: False, 11: True}


def test_pairwise_rule_is_not_transitive_closure(spark):
    """a~b and b~c but a!~c: the contract drops ANY vector with a
    smaller-id partner at >= tau — so b drops (partner a) and c keeps
    iff no SMALLER id is within tau of it. Crafted chain: c is within
    tau of b only, and b < c, so c DROPS under the pairwise rule even
    though its group head a is far — the stated difference from a
    connected-components consolidation."""
    import math

    a = [1.0, 0.0]
    b = [math.cos(0.2), math.sin(0.2)]   # cos(a,b) ~ 0.980
    c = [math.cos(0.4), math.sin(0.4)]   # cos(b,c) ~ 0.980, cos(a,c) ~ 0.921
    rows = [(1, a), (2, b), (3, c)]
    out = {
        r["vec_id"]: r["kept"]
        for r in semdedup_report(
            _vecs(spark, rows), threshold=0.95, n_cells=1, n_iters=0
        ).collect()
    }
    assert out == {1: True, 2: False, 3: False}


def test_threshold_is_on_rounded_cosine(spark):
    """The compare uses the r4-rounded cosine (cross-engine float
    rule): a pair at cos = 0.94999 rounds to 0.95 and DROPS at
    tau = 0.95."""
    import math

    theta = math.acos(0.94996)
    rows = [(1, [1.0, 0.0]), (2, [math.cos(theta), math.sin(theta)])]
    out = {
        r["vec_id"]: r["kept"]
        for r in semdedup_report(
            _vecs(spark, rows), threshold=0.95, n_cells=1, n_iters=0
        ).collect()
    }
    assert out == {1: True, 2: False}


def test_fixture_nondegenerate_at_registration_tau(spark):
    """At the registration tau (0.45 — fixture-calibrated: the
    synthetic embeddings' max pairwise cosine is ~0.6; production runs
    0.95, a parameter not a semantics change) the verdict is
    non-degenerate BOTH ways at sf0.001."""
    from kinesis_stream_video_project_spark import io

    out = semdedup_report(
        io.load_table(spark, "/root/testdata/sf0.001", "embeddings"),
        threshold=0.45,
    ).toPandas()
    assert len(out) == 500
    assert 0 < int((~out["kept"]).sum()) < len(out)


def test_hashed_bow_forms_bit_equal(spark):
    """The row-local expression form and the aggregate table form of
    the hashing-trick embedding produce IDENTICAL arrays (integer
    counts cast to double) — either side of a downstream cosine can
    use either form."""
    from pyspark.sql import functions as F

    from kinesis_stream_video_project_spark import io
    from kinesis_stream_video_project_spark.functions.vectors import (
        hashed_bow,
        hashed_bow_table,
    )

    docs = io.load_table(spark, "/root/testdata/sf0.001", "documents")
    a = docs.select("doc_id", hashed_bow(F.col("text")).alias("e1"))
    b = hashed_bow_table(docs)
    j = a.join(b, "doc_id")
    assert j.count() == 500
    assert j.filter(F.col("e1") != F.col("embedding")).count() == 0
