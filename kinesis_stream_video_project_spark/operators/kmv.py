"""KMV (k minimum values) distinct-count sketch: fixed-memory distinct
estimation from the k smallest hash values (Bar-Yossef et al., RANDOM
2002; Beyer et al., SIGMOD 2007 "On synopses for distinct-value
estimation under multiset operations").

Completes the repo's mergeable-sketch family — HLL (opaque binary,
``hll_merge_rollup``), Bloom (membership), Count-Min (frequency),
Space-Saving (top-k) — with the one distinct-count sketch whose ENTIRE
state is hash-checkable against a SQL oracle: the sketch is literally
"the k smallest 48-bit md5 ranks of the distinct keys", a set both
engines derive bit-identically. The laws:

* determinism: the bottom-k set is a pure function of the distinct key
  set (no RNG — ranks are md5 of the key, the repo's portable hash
  discipline);
* estimator: with ``n >= k`` distinct keys hashing uniformly into
  ``[0, 2^48)``, the k-th smallest rank ``r_k`` satisfies
  ``E[k / (r_k / 2^48)] ~= n`` — the unbiased form used here is
  ``est = (k - 1) * 2^48 div r_k`` (Beyer et al. §3.1); with
  ``n < k`` the sketch holds every distinct key and the estimate is
  exact by definition;
* mergeability: ``bottomk(A ∪ B) = bottomk(bottomk(A) ∪ bottomk(B))``
  — partition-local bottom-k partials combine associatively, so the
  100 TB story is a map-side bottom-k down to ``k`` ranks per
  partition, then one tiny shuffle (pinned in tests).

Scale shape: the only key-cardinality shuffle is the distinct() on
``(group, key)``; the bottom-k selection is two-phase (bottom-k within
``(group, rank % n_salts)`` salt buckets, then bottom-k of the
``<= k * n_salts`` survivors) so no single window task ever sorts a
whole group — the repo's two-phase-rank sampling discipline
(operators/sampling.py). The registered audit query carries
``exact_distinct`` next to ``kmv_est`` so the error is measured, not
assumed — the CMS/Bloom accounting discipline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Rank domain: 12 hex chars = 48 bits — positive BIGINT in both engines
# (DuckDB twin: ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 12))::BIGINT).
RANK_BITS = 48
RANK_DOMAIN = 1 << RANK_BITS


def kmv_rank(key: Column) -> Column:
    """Portable 48-bit uniform rank of ``key``: md5-substring integer,
    bit-identical in DuckDB, so the sketch itself hash-checks."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 12), 16, 10
    ).cast("bigint")


def kmv_bottomk(
    df: DataFrame,
    key: str,
    group: str,
    k: int = 32,
    n_salts: int = 16,
) -> DataFrame:
    """The sketch: per ``group``, the ``k`` smallest distinct-key ranks
    as ``(group, pos, rank)`` with ``pos`` the 1-based rank order.

    Two-phase selection: global bottom-k elements are each bottom-k
    within their salt bucket (``rank % n_salts``), so phase 1 windows
    sort at most one salt-bucket's share of a group and phase 2 sorts
    ``<= k * n_salts`` survivors. Rank ties (two keys sharing a 48-bit
    rank — ~2^-48 per pair) break on the key so the selected SET stays
    deterministic.
    """
    if k < 2 or n_salts < 1:
        raise ValueError(f"kmv_bottomk: need k >= 2, n_salts >= 1, got {k}/{n_salts}")
    distinct = df.select(group, key).distinct()
    ranked = distinct.select(
        group,
        F.col(key).alias("_key"),
        kmv_rank(F.col(key)).alias("rank"),
    )
    w_salt = Window.partitionBy(group, F.col("rank") % n_salts).orderBy(
        "rank", "_key"
    )
    survivors = ranked.withColumn(
        "_rn", F.row_number().over(w_salt)
    ).filter(F.col("_rn") <= k)
    w_group = Window.partitionBy(group).orderBy("rank", "_key")
    return (
        survivors.withColumn("pos", F.row_number().over(w_group))
        .filter(F.col("pos") <= k)
        .select(group, F.col("pos").cast("long").alias("pos"), "rank")
    )


def kmv_distinct_estimates(
    df: DataFrame,
    key: str,
    group: str,
    k: int = 32,
    n_salts: int = 16,
) -> DataFrame:
    """Per-group audit frame
    ``(group, exact_distinct, n_hashes, kth_rank, kmv_est, err)``.

    ``kmv_est = (k-1) * 2^48 div kth_rank`` when the sketch is full,
    else exactly ``n_hashes`` (the sketch holds every distinct key).
    ``exact_distinct`` is carried next to the estimate so the error is
    measured (KMV error is two-sided, unlike CMS — ``err`` is signed).
    The exact side is the audit pairing; production queries the sketch
    alone. ``(k-1) * 2^48`` fits BIGINT for any ``k < 2^14``.
    """
    distinct = df.select(group, key).distinct()
    sketch = kmv_bottomk(distinct, key, group, k=k, n_salts=n_salts)
    folded = sketch.groupBy(group).agg(
        F.count(F.lit(1)).alias("n_hashes"),
        F.max("rank").alias("kth_rank"),
    )
    # Plan-audit note: the exact side is REcomputed (2 scans) — the
    # optimizer rewrites distinct+count into a distinct-aggregate whose
    # tree no longer canonicalizes equal to the sketch side's, so
    # ReuseExchange cannot fire (probed, incl. a minimal repro). That
    # is accepted deliberately: the exact side exists only for the
    # driver-hash audit pairing (the CMS adjudication); the production
    # tier queries the sketch alone and scans once.
    exact = distinct.groupBy(group).agg(
        F.count(F.lit(1)).alias("exact_distinct")
    )
    est = F.when(F.col("n_hashes") < k, F.col("n_hashes")).otherwise(
        F.expr(f"{(k - 1) * RANK_DOMAIN} div kth_rank")
    )
    return (
        exact.join(folded, group, "inner")
        .withColumn("kmv_est", est.cast("long"))
        .withColumn("err", (F.col("kmv_est") - F.col("exact_distinct")).cast("long"))
        .select(
            group,
            "exact_distinct",
            F.col("n_hashes").cast("long").alias("n_hashes"),
            "kth_rank",
            "kmv_est",
            "err",
        )
    )


def _bottomk_single(df: DataFrame, key: str, k: int, n_salts: int) -> DataFrame:
    """Bottom-k ranks of ONE key set: (pos, rank)."""
    staged = df.select(F.lit("s").alias("_g"), F.col(key))
    return kmv_bottomk(staged, key, "_g", k=k, n_salts=n_salts).select(
        "pos", "rank"
    )


def kmv_set_op_estimates(
    df_a: DataFrame,
    df_b: DataFrame,
    key: str,
    k: int = 64,
    n_salts: int = 16,
) -> DataFrame:
    """Distinct-set UNION/INTERSECTION/Jaccard estimation from two KMV
    sketches — the capability the sketch exists for (Beyer et al.,
    SIGMOD 2007 §4: the union sketch is ``bottomk(sketch_A ∪
    sketch_B)`` by the merge law, and the ρ-estimator scores
    ``|{r ∈ union sketch: r ∈ A ∧ r ∈ B}| / k`` as the Jaccard,
    unbiased — membership is EXACT because any union-sketch rank from
    side X is by construction within X's own bottom-k).

    One audit row::

        exact_a, exact_b, exact_union, exact_inter,
        n_union_sketch, n_both, est_a, est_b, est_union, est_inter,
        jaccard_est_permille, jaccard_exact_permille

    ``est_inter = (n_both · est_union) div n_union_sketch`` (the
    ρ-form — inclusion–exclusion est_a + est_b − est_union can go
    negative and is strictly worse, stated); when every sketch is
    unsaturated the estimates COLLAPSE TO EXACT (sketches hold the
    whole sets — pinned in tests). The exact_* columns are the audit
    pairing (CMS/KMV discipline); production keeps only the sketches.

    Scale: two distinct() shuffles (one per side — the only
    corpus-sized work), every later stage runs on ≤k-row frames."""
    a = _bottomk_single(df_a, key, k, n_salts)
    b = _bottomk_single(df_b, key, k, n_salts)
    w = Window.orderBy("rank")
    union_sketch = (
        a.select("rank")
        .union(b.select("rank"))
        .distinct()
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
    )
    both = (
        union_sketch.join(a.select("rank"), "rank", "left_semi")
        .join(b.select("rank"), "rank", "left_semi")
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    def est(prefix: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.count(F.lit(1)).cast("long").alias(f"_n_{prefix}"),
            F.max("rank").alias(f"_kth_{prefix}"),
        )
    ea, eb, eu = est("a", a), est("b", b), est("u", union_sketch)
    exact_a = df_a.select(key).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("exact_a")
    )
    exact_b = df_b.select(key).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("exact_b")
    )
    exact_i = (
        df_a.select(key)
        .distinct()
        .join(df_b.select(key).distinct(), key, "inner")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_inter"))
    )
    est_expr = (
        "CAST(CASE WHEN _n_{p} < {k} THEN _n_{p} "
        "ELSE {num} DIV _kth_{p} END AS BIGINT)"
    )
    num = (k - 1) * RANK_DOMAIN
    row = (
        ea.crossJoin(F.broadcast(eb))
        .crossJoin(F.broadcast(eu))
        .crossJoin(F.broadcast(both))
        .crossJoin(F.broadcast(exact_a))
        .crossJoin(F.broadcast(exact_b))
        .crossJoin(F.broadcast(exact_i))
        .withColumn("est_a", F.expr(est_expr.format(p="a", k=k, num=num)))
        .withColumn("est_b", F.expr(est_expr.format(p="b", k=k, num=num)))
        .withColumn("est_union", F.expr(est_expr.format(p="u", k=k, num=num)))
    )
    return row.select(
        "exact_a",
        "exact_b",
        F.expr("exact_a + exact_b - exact_inter").cast("long").alias("exact_union"),
        "exact_inter",
        F.col("_n_u").alias("n_union_sketch"),
        "n_both",
        "est_a",
        "est_b",
        "est_union",
        F.expr("(n_both * est_union) DIV _n_u").cast("long").alias("est_inter"),
        F.expr("(1000 * n_both) DIV _n_u").cast("long").alias(
            "jaccard_est_permille"
        ),
        F.expr(
            "(1000 * exact_inter) DIV (exact_a + exact_b - exact_inter)"
        )
        .cast("long")
        .alias("jaccard_exact_permille"),
    )
