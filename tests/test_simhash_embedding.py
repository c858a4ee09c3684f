"""Embedding SimHash LSH tier (r7 registration queue): bucket
determinism, the exact containment claim vs the blocked-cosine tier,
recall vs the collision curve, and a python replay of the integer
signature math."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators import similarity


def test_simhash_buckets_match_python_replay(spark, sf_dir):
    """The integer signature (scaled components × md5-derived ±1 signs,
    integer sums, ties→0) replayed in plain Python must reproduce every
    (id, table, bucket) row — no float summation order anywhere."""
    e = io.load_table(spark, sf_dir, "embeddings").limit(50)
    got = {
        (r.vec_id, r.table, r.bucket)
        for r in similarity.simhash_embedding_buckets(e).collect()
    }
    signs = similarity.hyperplane_signs(32, 64)
    want = set()
    for row in e.collect():
        sc = [math.floor(float(x) * 10**6 + 0.5) for x in row.embedding]
        for t in range(4):
            bucket = 0
            for p in range(8):
                sgn = signs[t * 8 + p]
                if sum(s * v for s, v in zip(sgn, sc)) > 0:
                    bucket |= 1 << p
            want.add((row.vec_id, t, bucket))
    assert got == want


def test_hyperplane_signs_deterministic_and_balanced():
    a = similarity.hyperplane_signs(32, 64)
    b = similarity.hyperplane_signs(32, 64)
    assert a == b
    assert a[0][0] == (1 if hashlib.md5(b"0:0").digest()[-1] & 1 else -1)
    flat = [v for row in a for v in row]
    # md5 low bits are balanced enough that neither sign dominates
    assert 0.4 < flat.count(1) / len(flat) < 0.6


def test_simhash_near_dups_containment_and_recall(spark, sf_dir):
    """(a) every reported pair must be a TRUE >= threshold pair with the
    exact-tier cosine (containment is exact, recall is the probabilistic
    part); (b) recall against the blocked exact tier must clear a margin
    below the AND-OR collision curve's prediction (~0.75 at cos 0.9 for
    4x8; the fixture's planted near-dups sit well above 0.9 where the
    curve is higher)."""
    e = io.load_table(spark, sf_dir, "embeddings")
    got = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in similarity.simhash_embedding_near_dups(
            e, threshold=0.9
        ).collect()
    }
    exact = {
        (r.vec_a, r.vec_b): r.cos_sim
        for r in similarity.embedding_near_dups(e, threshold=0.9).collect()
    }
    # The blocked tier only sees within-label pairs; the SimHash tier is
    # blind to labels. Containment checks the cosine claim directly:
    for (a, b), cs in got.items():
        assert cs >= 0.9
    # agreement on shared pairs (same r4 verify expression)
    for k in set(got) & set(exact):
        assert got[k] == exact[k]
    if exact:
        recall = len(set(got) & set(exact)) / len(exact)
        assert recall >= 0.5, (recall, len(exact))


def test_simhash_buckets_partition_invariant(spark, sf_dir):
    e = io.load_table(spark, sf_dir, "embeddings")
    a = {
        (r.vec_id, r.table, r.bucket)
        for r in similarity.simhash_embedding_buckets(e.repartition(11)).collect()
    }
    b = {
        (r.vec_id, r.table, r.bucket)
        for r in similarity.simhash_embedding_buckets(e.coalesce(1)).collect()
    }
    assert a == b and len(a) > 0


def test_simhash_refuses_dims_mismatch(spark):
    """A dims mismatch null-pads zip_with and would silently collapse
    every signature to bucket 0 (O(n²) candidates) — refused instead
    (review finding, r6)."""
    import pytest

    e = spark.createDataFrame(
        [(1, [0.1] * 32), (2, [0.2] * 32)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="dims=64"):
        similarity.simhash_embedding_buckets(e).collect()  # default dims=64
    assert similarity.simhash_embedding_buckets(e, dims=32).count() == 8
