"""Property tests for the round-5d surface (graph analytics, containment
near-dup, exact-arithmetic statistics) beyond their oracle-parity rows:
hand-checkable invariants on synthetic inputs, the orientation-correctness
pin for triangle counting, and plan-shape guards."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.operators import dedup, graph, stats
from kinesis_stream_video_project_spark.plans import registry

SPECS = registry.all_queries()


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "p1 bigint, p2 bigint"
    )


def test_triangle_count_known_graphs(spark):
    """K4 has exactly 4 triangles; a star closed by one chord has 1; the
    star case pins the (degree, id) tuple-ordering requirement — node 1 is
    both the smallest id AND the highest degree, so a raw-id wedge order
    would look the closing edge up backwards and miss the triangle."""
    k4 = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    star_chord = [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3)]
    for pairs, want in [(k4, 4), (star_chord, 1), (k4 + star_chord, 5)]:
        row = graph.triangle_count(_edges(spark, pairs)).collect()[0]
        assert row["n_triangles"] == want, (pairs, row)
        assert row["n_edges"] == len(pairs)


def test_triangle_count_matches_bruteforce_on_copurchase(spark, sf_dir):
    """The degree-oriented wedge count must equal the definitional
    three-join count (e1=(a,b), e2=(a,c) with b<c, closed by (b,c)) on the
    real co-purchase graph — the end-to-end orientation-correctness pin."""
    from kinesis_stream_video_project_spark import io

    e = graph.copurchase_edges(io.load_table(spark, sf_dir, "lineitem"))
    e = e.select("p1", "p2").cache()
    try:
        got = graph.triangle_count(e).collect()[0]["n_triangles"]
        e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
        brute = (
            e1.join(
                e2,
                (F.col("e1.p1") == F.col("e2.p1"))
                & (F.col("e1.p2") < F.col("e2.p2")),
            )
            .join(
                e3,
                (F.col("e3.p1") == F.col("e1.p2"))
                & (F.col("e3.p2") == F.col("e2.p2")),
            )
            .count()
        )
        assert got == brute
    finally:
        e.unpersist()


def test_pagerank_two_node_fixed_point(spark):
    """A single undirected edge: both nodes have degree 1, so each
    iteration maps rank 10^12 → 15e10 + (85·10^12) div 100 = 10^12 — the
    uniform vector is the exact fixed point of the integer recurrence."""
    ranks = graph.pagerank_int(_edges(spark, [(1, 2)]), iters=3).collect()
    assert sorted((r["p"], r["rank_scaled"]) for r in ranks) == [
        (1, 10**12),
        (2, 10**12),
    ]


def test_pagerank_mass_conserved_and_partition_invariant(spark, sf_dir):
    """Integer PageRank loses only truncation mass: total rank stays
    within |V|·base on top and |V|·(0.15·base) above the pure-teleport
    floor; and the result is identical under any input partitioning
    (integer sums are order-free — the determinism claim)."""
    from kinesis_stream_video_project_spark import io

    edges = graph.copurchase_edges(
        io.load_table(spark, sf_dir, "lineitem")
    ).cache()
    try:
        base = 10**12
        r = graph.pagerank_int(edges, iters=2, base=base)
        agg = r.agg(
            F.sum("rank_scaled").alias("mass"), F.count(F.lit(1)).alias("nv")
        ).collect()[0]
        assert agg["mass"] <= agg["nv"] * base
        assert agg["mass"] >= agg["nv"] * (15 * base // 100)
        a = sorted(
            (x["p"], x["rank_scaled"])
            for x in graph.pagerank_int(edges.repartition(7), iters=2).collect()
        )
        b = sorted(
            (x["p"], x["rank_scaled"])
            for x in graph.pagerank_int(edges.coalesce(1), iters=2).collect()
        )
        assert a == b
    finally:
        edges.unpersist()


def test_containment_subset_is_exactly_one(spark):
    """A document whose token set is a strict subset of another scores
    containment 1.0 (the doc-inside-doc case the tier exists for), even
    though its Jaccard is far below any near-dup threshold."""
    df = spark.createDataFrame(
        [
            (1, "alpha beta", "web", "en"),
            (2, "alpha beta gamma delta epsilon zeta eta theta", "web", "en"),
            (3, "unrelated words entirely different content here", "web", "en"),
        ],
        "doc_id bigint, text string, source string, lang string",
    )
    out = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.blocked_containment_near_dups(df, threshold=0.9).collect()
    }
    assert out == {(1, 2): 1.0}
    jacc = dedup.blocked_jaccard_near_dups(df, threshold=0.2, shingle_k=1)
    assert jacc.filter(
        (F.col("doc_a") == 1) & (F.col("doc_b") == 2)
    ).collect()[0]["jaccard"] == 0.25


def test_containment_dominates_jaccard(spark, sf_dir):
    """For every pair both tiers emit, containment ≥ jaccard (min ≤ union
    denominator) — a cross-tier consistency law on the real corpus."""
    from kinesis_stream_video_project_spark import io

    d = io.load_table(spark, sf_dir, "documents")
    c = dedup.blocked_containment_near_dups(d, threshold=0.5, shingle_k=1)
    j = dedup.blocked_jaccard_near_dups(d, threshold=0.5, shingle_k=1)
    bad = (
        c.select("doc_a", "doc_b", "containment")
        .join(j, ["doc_a", "doc_b"])
        .filter(F.col("containment") < F.col("jaccard"))
        .count()
    )
    assert bad == 0


def test_zscore_flags_injected_spike_only(spark):
    """A gently-varying series (alternating ±1 around 100) yields no
    3σ flags; injecting one large spike yields exactly that row. Constant
    series are un-flaggable by construction (both sides of the strict
    inequality are 0)."""
    rows = [(i, 1, 100 + (i % 2), i) for i in range(40)]
    base = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, value_micro bigint, ts bigint"
    )
    flagged = stats.rolling_zscore_flags(
        base, "user_id", ("ts", "event_id"), "value_micro"
    ).collect()
    assert flagged == []
    spiked = spark.createDataFrame(
        rows + [(99, 1, 100000, 40)],
        "event_id bigint, user_id bigint, value_micro bigint, ts bigint",
    )
    got = stats.rolling_zscore_flags(
        spiked, "user_id", ("ts", "event_id"), "value_micro"
    ).collect()
    assert [r["event_id"] for r in got] == [99]
    const = spark.createDataFrame(
        [(i, 2, 7, i) for i in range(30)],
        "event_id bigint, user_id bigint, value_micro bigint, ts bigint",
    )
    assert (
        stats.rolling_zscore_flags(
            const, "user_id", ("ts", "event_id"), "value_micro"
        ).count()
        == 0
    )


def test_exact_corr_and_slope_on_linear_data(spark):
    """y = 3x − 5 gives corr exactly 1.0 and slope exactly 3.0 — the
    closed forms over exact integer moments have zero float error on
    integer-exact inputs (built-in corr() would be ~1e-16 off)."""
    df = spark.createDataFrame(
        [(1, x, 3 * x - 5) for x in range(1, 50)], "g int, x long, y long"
    )
    c = stats.pearson_corr_exact(df, "g", "x", "y").collect()[0]
    assert c["corr"] == 1.0 and c["n_pairs"] == 49
    s = stats.ols_slope_exact(df, "g", "x", "y").collect()[0]
    assert s["slope"] == 3.0
    const = spark.createDataFrame([(1, 5, 9), (1, 5, 11)], "g int, x long, y long")
    assert stats.ols_slope_exact(const, "g", "x", "y").collect()[0]["slope"] is None


def _plan_of(spark, sf_dir, name: str) -> str:
    return SPECS[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_graph_plans_have_no_cartesian_products(spark, sf_dir):
    """Every graph-query join is keyed (orderkey, node id, pair) — a
    CartesianProduct anywhere means an orientation or wedge join lost its
    equi-key and would be quadratic in |V| at scale. The only broadcast
    nested loops allowed are the 1-row scalar crossJoins."""
    for name in (
        "triangle_count_copurchase",
        "pagerank_copurchase_topk",
        "copurchase_lift_pairs",
    ):
        plan = _plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, f"{name}:\n{plan}"


def test_lift_pairs_uses_top_k_sort(spark, sf_dir):
    """The LIMIT 20 must compile to TakeOrderedAndProject (partial top-k
    per partition), never a global Sort of every pair."""
    plan = _plan_of(spark, sf_dir, "copurchase_lift_pairs")
    assert "TakeOrderedAndProject" in plan


def test_pagerank_iteration_shuffle_budget(spark, sf_dir):
    """3 iterations must stay at a bounded exchange count: the static
    (src, dst, d) list is re-joined per iteration (2 exchanges each:
    rank join + dst aggregate) plus graph construction — a superlinear
    exchange count would mean the loop re-shuffles history."""
    plan = _plan_of(spark, sf_dir, "pagerank_copurchase_topk")
    n_ex = plan.count("Exchange")
    assert n_ex <= 24, f"pagerank exchange count {n_ex}\n{plan}"


def test_label_propagation_known_communities(spark):
    """Two K3 cliques joined by a single bridge edge must resolve to two
    communities labeled by each clique's min node; determinism: ties break
    to the smaller label (no randomness anywhere)."""
    cliq1 = [(1, 2), (1, 3), (2, 3)]
    cliq2 = [(10, 11), (10, 12), (11, 12)]
    bridge = [(3, 10)]
    got = {
        (r["p"], r["community"])
        for r in graph.label_propagation(
            _edges(spark, cliq1 + cliq2 + bridge), iters=3
        ).collect()
    }
    comm = dict(got)
    assert comm[1] == comm[2] == comm[3]
    assert comm[10] == comm[11] == comm[12]
    assert comm[1] != comm[10]


def test_label_propagation_partition_invariant(spark, sf_dir):
    from kinesis_stream_video_project_spark import io

    edges = graph.copurchase_edges(
        io.load_table(spark, sf_dir, "lineitem")
    ).cache()
    try:
        a = sorted(
            (r["p"], r["community"])
            for r in graph.label_propagation(edges.repartition(7), iters=2).collect()
        )
        b = sorted(
            (r["p"], r["community"])
            for r in graph.label_propagation(edges.coalesce(1), iters=2).collect()
        )
        assert a == b and len(a) > 0
    finally:
        edges.unpersist()


def test_robust_center_spread_handchecked(spark):
    """Odd series: median is the middle element, MAD the middle absolute
    deviation; a planted huge outlier moves neither (breakdown property),
    while it would drag mean/σ arbitrarily."""
    vals = [10, 12, 14, 16, 100]
    df = spark.createDataFrame([(1, v) for v in vals], "g int, v long")
    r = stats.robust_center_spread(df, "g", "v").collect()[0]
    # lower median of [10,12,14,16,100] = 14; |v-14| = [4,2,0,2,86] → MAD 2
    assert (r["med"], r["mad"], r["n_rows"]) == (14, 2, 5)
    df2 = spark.createDataFrame(
        [(1, v) for v in vals + [10**9]], "g int, v long"
    )
    r2 = stats.robust_center_spread(df2, "g", "v").collect()[0]
    assert r2["med"] == 14 and r2["mad"] == 2  # outlier-immune


def test_robust_center_spread_matches_bruteforce(spark, sf_dir):
    """Cross-check against a plain-Python lower-median on the real events
    table (scaled micro-units per event_type)."""
    import duckdb

    from kinesis_stream_video_project_spark import io
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long

    e = io.load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    df = e.select(
        "event_type", scaled_long(F.col("value"), 1000000).alias("vu")
    )
    got = {
        r["event_type"]: (r["med"], r["mad"], r["n_rows"])
        for r in stats.robust_center_spread(df, "event_type", "vu").collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT event_type, CAST(floor(value*1000000.0+0.5) AS BIGINT)"
        f" FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL"
    ).fetchall()
    byg: dict = {}
    for g, v in rows:
        byg.setdefault(g, []).append(v)

    def lower_median(xs):
        xs = sorted(xs)
        n = len(xs)
        cum = 0
        from collections import Counter

        for val, w in sorted(Counter(xs).items()):
            cum += w
            if 2 * cum >= n:
                return val

    want = {}
    for g, xs in byg.items():
        m = lower_median(xs)
        want[g] = (m, lower_median([abs(x - m) for x in xs]), len(xs))
    assert got == want


def test_kcore_known_graph_and_fixed_point(spark, sf_dir):
    """K4 plus a pendant path: the 3-core is exactly the K4 nodes; the
    2-core keeps K4 plus any cycle, drops the path tail. Fixed-point law
    on the real co-purchase graph: every surviving node's induced degree
    is ≥ k, and re-running peeling on the result changes nothing."""
    from kinesis_stream_video_project_spark import io

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    path = [(4, 5), (5, 6)]
    got3 = {r["p"] for r in graph.kcore(_edges(spark, k4 + path), 3).collect()}
    assert got3 == {1, 2, 3, 4}
    got2 = {r["p"] for r in graph.kcore(_edges(spark, k4 + path), 2).collect()}
    assert got2 == {1, 2, 3, 4}  # path tail peels away

    edges = graph.copurchase_edges(
        io.load_table(spark, sf_dir, "lineitem")
    ).cache()
    try:
        core = graph.kcore(edges, 30)
        alive = {r["p"] for r in core.collect()}
        assert alive  # non-degenerate at sf0.001 (dense 200-node graph)
        sub = edges.filter(
            F.col("p1").isin(alive) & F.col("p2").isin(alive)
        )
        degs = (
            sub.select(F.col("p1").alias("p"))
            .unionAll(sub.select(F.col("p2").alias("p")))
            .groupBy("p")
            .count()
        )
        assert degs.filter(F.col("count") < 30).count() == 0
        assert {r["p"] for r in degs.collect()} == alive
    finally:
        edges.unpersist()


def test_kcore_raises_on_nonconvergence(spark):
    """A 20-node path with k=2 peels two endpoints per round (~9 rounds);
    with max_iters=3 the loop cannot reach the fixed point and must RAISE
    instead of returning interior nodes that are not in the (empty)
    2-core."""
    path = [(i, i + 1) for i in range(1, 20)]
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.kcore(_edges(spark, path), 2, max_iters=3)
    assert graph.kcore(_edges(spark, path), 2, max_iters=30).count() == 0


def test_weighted_pagerank_uniform_equals_unweighted(spark, sf_dir):
    """Uniform edge weights must reduce the weighted recurrence exactly to
    the unweighted one ((85·r·1) div (100·Σ1) per edge); and on the real
    co-purchase weights the ranking changes (the weights carry signal)."""
    from kinesis_stream_video_project_spark import io

    edges = graph.copurchase_edges(
        io.load_table(spark, sf_dir, "lineitem")
    ).cache()
    try:
        uni = edges.withColumn("w1", F.lit(1))
        a = sorted(
            (r["p"], r["rank_scaled"])
            for r in graph.pagerank_int(edges, iters=2).collect()
        )
        b = sorted(
            (r["p"], r["rank_scaled"])
            for r in graph.pagerank_int(uni, iters=2, weight_col="w1").collect()
        )
        assert a == b
        c = sorted(
            (r["p"], r["rank_scaled"])
            for r in graph.pagerank_int(
                edges, iters=2, weight_col="n_orders"
            ).collect()
        )
        assert c != a  # co-purchase multiplicity shifts mass
        assert len(c) == len(a)
    finally:
        edges.unpersist()
