"""Round-6 guards on the iterative graph operators: the PageRank BIGINT
overflow bound is enforced (refuse, never silently wrap — VERDICT r5
item 2), the broadcast hints in the pagerank/LPA loops are parameterized
without changing results, and the silent_periods batch twin agrees with
the streaming silence detector on a shared drain scenario."""

from __future__ import annotations

import shutil
import time
from pathlib import Path

import pytest

from kinesis_stream_video_project_spark.operators import graph


def _edges(spark, pairs, weights=None):
    if weights is None:
        return spark.createDataFrame(
            [(a, b) for a, b in pairs], "p1 bigint, p2 bigint"
        )
    return spark.createDataFrame(
        [(a, b, w) for (a, b), w in zip(pairs, weights)],
        "p1 bigint, p2 bigint, n_orders bigint",
    )


_K4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]


def _brute_pagerank(pairs, iters, base, weights=None):
    """Driver-side integer PageRank replay — Python ints never overflow,
    so this is the ground truth on both sides of the bound."""
    adj: dict[int, list[tuple[int, int]]] = {}
    ws = weights or [1] * len(pairs)
    for (a, b), w in zip(pairs, ws):
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    tot = {u: sum(w for _, w in nbrs) for u, nbrs in adj.items()}
    ranks = {u: base for u in adj}
    for _ in range(iters):
        nxt = {u: (15 * base) // 100 for u in adj}
        for u, nbrs in adj.items():
            for v, w in nbrs:
                nxt[v] += (85 * ranks[u] * w) // (100 * tot[u])
        ranks = nxt
    return ranks


def test_pagerank_refuses_past_bigint_bound(spark):
    """85 * |V| * base * max(w) past BIGINT must raise, not wrap: K4 has
    |V|=4, so base 10^17 puts the worst-case product at 3.4e19 > 2^63."""
    with pytest.raises(ValueError, match="exceeds BIGINT"):
        graph.pagerank_int(_edges(spark, _K4), iters=1, base=10**17)


def test_pagerank_guard_accounts_edge_weights(spark):
    """A weight large enough to push 85*|V|*base*max(w) past BIGINT must
    trip the guard even when the unweighted bound would hold."""
    weights = [1, 1, 1, 1, 1, 10**6]
    edges = _edges(spark, _K4, weights)
    with pytest.raises(ValueError, match="exceeds BIGINT"):
        graph.pagerank_int(
            _edges(spark, _K4, weights),
            iters=1,
            base=10**13,
            weight_col="n_orders",
        )
    # Same base without the hot weight is safe: 85*4*1e13 ≈ 3.4e15.
    assert graph.pagerank_int(edges.drop("n_orders"), iters=1, base=10**13).count() == 4


def test_pagerank_refusal_names_a_safe_base(spark):
    """The error's suggested base must itself pass the guard and produce
    exact ranks (cross-checked against the driver-side replay)."""
    try:
        graph.pagerank_int(_edges(spark, _K4), iters=2, base=10**17)
    except ValueError as e:
        import re

        safe = int(re.search(r"base to <= (\d+)", str(e)).group(1))
    got = {
        r["p"]: r["rank_scaled"]
        for r in graph.pagerank_int(
            _edges(spark, _K4), iters=2, base=safe
        ).collect()
    }
    assert got == _brute_pagerank(_K4, iters=2, base=safe)


def test_pagerank_broadcast_param_is_result_invariant(spark):
    """broadcast_ranks=False (the 10^8-node escape hatch) must produce the
    identical rank vector as the broadcast default."""
    e = _edges(spark, _K4 + [(4, 5), (5, 6)])
    a = {
        r["p"]: r["rank_scaled"]
        for r in graph.pagerank_int(e, iters=2, broadcast_ranks=True).collect()
    }
    b = {
        r["p"]: r["rank_scaled"]
        for r in graph.pagerank_int(e, iters=2, broadcast_ranks=False).collect()
    }
    assert a == b == _brute_pagerank(_K4 + [(4, 5), (5, 6)], iters=2, base=10**12)


def test_lpa_broadcast_param_is_result_invariant(spark):
    e = _edges(spark, _K4 + [(10, 11), (11, 12), (10, 12)])
    a = {
        (r["p"], r["community"])
        for r in graph.label_propagation(e, iters=2, broadcast_labels=True).collect()
    }
    b = {
        (r["p"], r["community"])
        for r in graph.label_propagation(e, iters=2, broadcast_labels=False).collect()
    }
    assert a == b and len(a) == 7


def _write_single_file(df, dest_dir: Path, name: str) -> None:
    staging = dest_dir / f"_stage_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    part = next(staging.glob("part-*.parquet"))
    dest_dir.mkdir(parents=True, exist_ok=True)
    shutil.copy(part, dest_dir / name)
    shutil.rmtree(staging)


def test_silent_periods_batch_matches_stream_drain(spark, tmp_path):
    """Batch twin ≡ push form when the push form can see everything: a
    watermark-driving user (3) emits every 10 s through t=400 s across
    five micro-batch files, so every silent interval's deadline is
    crossed by the watermark before (or without) the silent key
    resuming. Expected alerts, both forms: user 1 goes silent at 10 s
    and never returns (stream: timer fires when the watermark passes
    70 s; batch: trailing-silence tail); user 2 goes silent at 20 s,
    resumes at 300 s (stream: timer fires at watermark 90 ≫ deadline
    80 s, before the 300 s arrival re-arms; batch: interior lag gap),
    then trails off (deadline 360 s < closing watermark 390 s — the
    no-data final micro-batch fires it); user 3 never alerts."""
    import datetime as dt

    from kinesis_stream_video_project_spark.plans.queries_round6 import (
        silent_periods_frame,
    )
    from kinesis_stream_video_project_spark.streaming import jobs

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    def ev(eid, user, sec):
        return (int(eid), base + dt.timedelta(seconds=sec), user, 1.0)

    schema = "event_id long, ts timestamp, user_id long, value double"
    eid = iter(range(1000))
    files = [
        [ev(next(eid), 1, 0), ev(next(eid), 1, 10), ev(next(eid), 2, 0),
         ev(next(eid), 2, 20)]
        + [ev(next(eid), 3, s) for s in range(0, 31, 10)],
        [ev(next(eid), 3, s) for s in range(40, 101, 10)],
        [ev(next(eid), 3, s) for s in range(110, 201, 10)],
        [ev(next(eid), 2, 300)]
        + [ev(next(eid), 3, s) for s in range(210, 301, 10)],
        [ev(next(eid), 3, s) for s in range(310, 401, 10)],
    ]
    src = tmp_path / "silent_periods_src"
    for i, batch in enumerate(files):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(batch, schema), src, f"b{i}.parquet"
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        jobs.silence_alerts(stream, silence_us=60_000_000, watermark="10 seconds")
        .writeStream.format("memory")
        .queryName("silent_periods_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    stream_got = {
        (r.user_id, r.last_seen_us, r.silent_after_us)
        for r in spark.sql("SELECT * FROM silent_periods_stream_out").collect()
    }
    batch_df = spark.createDataFrame(
        [e for f in files for e in f], schema
    )
    batch_got = {
        (r.user_id, r.last_seen_us, r.silent_after_us)
        for r in silent_periods_frame(batch_df, 60_000_000).collect()
    }
    base_us = int(base.timestamp()) * 1_000_000
    want = {
        (1, base_us + 10_000_000, base_us + 70_000_000),
        (2, base_us + 20_000_000, base_us + 80_000_000),
        (2, base_us + 300_000_000, base_us + 360_000_000),
    }
    assert batch_got == want
    assert stream_got == want


def _plan_of(spark, sf_dir, name: str) -> str:
    from kinesis_stream_video_project_spark.plans import registry

    spec = registry.all_queries()[name]
    return spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_lpa_iteration_shuffle_budget(spark, sf_dir):
    """2 LPA rounds must stay at a bounded exchange count: each round is
    one label join onto the localCheckpoint'd edge list + one
    (dst, label) count + one per-dst argmax window (≈3 exchanges/round)
    plus the final community sizing — a superlinear count would mean the
    loop re-derives history (the 66-vs-10 pagerank failure mode)."""
    plan = _plan_of(spark, sf_dir, "lpa_communities")
    n_ex = plan.count("Exchange")
    assert n_ex <= 14, f"LPA exchange count {n_ex}\n{plan}"


def test_weighted_pagerank_shuffle_budget_matches_unweighted(spark, sf_dir):
    """The weighted variant must keep the unweighted loop's exchange
    discipline (same budget as test_round5d's pin — the weight column
    rides the existing adjacency, it must not add shuffles)."""
    plan = _plan_of(spark, sf_dir, "weighted_pagerank_topk")
    n_ex = plan.count("Exchange")
    assert n_ex <= 24, f"weighted pagerank exchange count {n_ex}\n{plan}"


def test_round6_plans_have_no_cartesian_products(spark, sf_dir):
    """Round-6 joins are keyed (node id, event_type, user_id, col_name);
    the only broadcast nested loops allowed are 1-row scalar crossJoins
    (silent_periods' global max; the graph size guards)."""
    for name in (
        "lpa_communities",
        "robust_value_stats",
        "winsorized_value_stats",
        "table_drift_report",
        "silent_periods",
        "curation_pipeline_v3",
        "weighted_pagerank_topk",
    ):
        plan = _plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, f"{name}:\n{plan}"


def test_kcore_alive_set_reaches_fixed_point_on_fixture(spark, sf_dir):
    """The registered 65-core must be its own fixed point: every returned
    node's induced degree ≥ 65, and one more peel is the identity (the
    uniqueness argument the oracle's bounded unroll leans on)."""
    from pyspark.sql import functions as F

    from kinesis_stream_video_project_spark import io
    from kinesis_stream_video_project_spark.operators import graph

    edges = graph.copurchase_edges(io.load_table(spark, sf_dir, "lineitem"))
    core = graph.kcore(edges, 65, max_iters=30)
    alive = {r["p"] for r in core.collect()}
    sub = edges.filter(
        F.col("p1").isin(alive) & F.col("p2").isin(alive)
    )
    deg = {
        r["p"]: r["d"]
        for r in sub.select(F.col("p1").alias("p"))
        .unionAll(sub.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    }
    assert set(deg) == alive
    assert all(d >= 65 for d in deg.values())


def test_pagerank_empty_edge_list_returns_empty(spark):
    """Review finding (r6): the overflow guard must short-circuit on an
    empty graph — F.max over zero rows is null, and int(None) raised
    where pre-guard code returned an empty result. Both modes."""
    empty_w = spark.createDataFrame(
        [], "p1 bigint, p2 bigint, n_orders bigint"
    )
    assert graph.pagerank_int(empty_w, iters=1, weight_col="n_orders").count() == 0
    assert graph.pagerank_int(empty_w.drop("n_orders"), iters=1).count() == 0


def test_pagerank_refusal_when_no_safe_base_exists(spark):
    """85·|V|·max(w) alone past 2^63 must produce the no-safe-base error,
    never 'lower base to <= 0' (which base=0 would satisfy while
    yielding all-zero ranks)."""
    e = spark.createDataFrame(
        [(1, 2, 2**60), (2, 3, 2**60)], "p1 bigint, p2 bigint, n_orders bigint"
    )
    with pytest.raises(ValueError, match="no BIGINT-safe base"):
        graph.pagerank_int(e, iters=1, base=1, weight_col="n_orders")


def test_png_decoder_rejects_decompression_bombs():
    """Review finding (r6): the stdlib tier sits on the DEFAULT decode
    path, so a payload declaring huge dimensions (or inflating past the
    scanline volume) must be REJECTED before allocation, not inflated."""
    import struct
    import zlib

    from kinesis_stream_video_project_spark.operators import multimodal

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    def png_of(w, h, raw):
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    # (a) dimensions past the cap: rejected before any inflation
    assert multimodal._png_decode(png_of(1 << 16, 1 << 16, b"")) is None
    # (b) small declared dims but an IDAT inflating way past the
    #     scanline volume: the limited decompress stops at expected+1
    assert multimodal._png_decode(png_of(2, 2, b"\x00" * 10_000_000)) is None
    # (c) control: a legitimate tiny PNG still decodes
    good = png_of(2, 2, b"\x00\x05\x06\x00\x07\x08")
    assert multimodal._png_decode(good) is not None


def test_bfs_hops_known_graph(spark):
    """Path 1-2-3-4-5 with source {1}: hops = index; max_hops caps the
    horizon; the empty-frontier short-circuit stops a max_hops=50 run at
    the path end without error."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    src = spark.createDataFrame([(1,)], "p bigint")
    got = {
        (r.p, r.hops)
        for r in graph.bfs_hops(e, src, max_hops=2).collect()
    }
    assert got == {(1, 0), (2, 1), (3, 2)}
    full = {
        (r.p, r.hops)
        for r in graph.bfs_hops(e, src, max_hops=50).collect()
    }
    assert full == {(1, 0), (2, 1), (3, 2), (4, 3), (5, 4)}


def test_bfs_hops_nearest_source_wins(spark):
    """Multiple sources: every node gets the distance to its NEAREST
    source (sources at both path ends meet in the middle)."""
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    src = spark.createDataFrame([(1,), (5,)], "p bigint")
    got = {
        (r.p, r.hops)
        for r in graph.bfs_hops(e, src, max_hops=10).collect()
    }
    assert got == {(1, 0), (5, 0), (2, 1), (4, 1), (3, 2)}


def test_bfs_hops_matches_bruteforce_on_copurchase(spark, sf_dir):
    """Driver-side BFS replay on the real co-purchase graph from the two
    smallest part ids — exact level sets, any engine."""
    from kinesis_stream_video_project_spark import io

    edges = graph.copurchase_edges(io.load_table(spark, sf_dir, "lineitem"))
    pairs = [(r.p1, r.p2) for r in edges.select("p1", "p2").collect()]
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sources = sorted(adj)[:2]
    src = spark.createDataFrame([(s,) for s in sources], "p bigint")
    got = {
        (r.p, r.hops)
        for r in graph.bfs_hops(edges, src, max_hops=2).collect()
    }
    want = {(s, 0) for s in sources}
    frontier, seen = set(sources), set(sources)
    for hop in (1, 2):
        nxt = {v for u in frontier for v in adj[u]} - seen
        want |= {(v, hop) for v in nxt}
        seen |= nxt
        frontier = nxt
    assert got == want


def test_bfs_hops_broadcast_param_invariant_and_oracle_shape(spark, sf_dir):
    """broadcast_frontier=False must not change the level sets, and the
    unrolled-CTE DuckDB oracle the r7 registration will ship reproduces
    them exactly."""
    import duckdb

    from kinesis_stream_video_project_spark import io

    edges = graph.copurchase_edges(io.load_table(spark, sf_dir, "lineitem"))
    src = spark.createDataFrame([(1,), (2,)], "p bigint")
    a = {
        (r.p, r.hops)
        for r in graph.bfs_hops(edges, src, max_hops=2).collect()
    }
    b = {
        (r.p, r.hops)
        for r in graph.bfs_hops(
            edges, src, max_hops=2, broadcast_frontier=False
        ).collect()
    }
    assert a == b and len(a) > 2
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    want = {
        (r[0], r[1])
        for r in con.sql(
            """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
b AS MATERIALIZED (SELECT p1 AS src, p2 AS dst FROM e UNION ALL SELECT p2, p1 FROM e),
v0 AS (SELECT CAST(p AS BIGINT) AS p FROM (VALUES (1), (2)) t(p)),
f1 AS MATERIALIZED (
  SELECT DISTINCT b.dst AS p FROM b
  WHERE b.src IN (SELECT p FROM v0) AND b.dst NOT IN (SELECT p FROM v0)
),
f2 AS (
  SELECT DISTINCT b.dst AS p FROM b
  WHERE b.src IN (SELECT p FROM f1)
    AND b.dst NOT IN (SELECT p FROM v0)
    AND b.dst NOT IN (SELECT p FROM f1)
)
SELECT p, 0 AS hops FROM v0
UNION ALL SELECT p, 1 FROM f1
UNION ALL SELECT p, 2 FROM f2
"""
        ).fetchall()
    }
    assert a == want


def test_followup_pairs_oracle_shape_matches(spark, sf_dir):
    """The DuckDB twin the r7 `error_followup_pairs` registration will
    ship — validated now (the bigram/seasonal/BFS discipline: paste,
    don't debug)."""
    import duckdb

    from kinesis_stream_video_project_spark import io
    from kinesis_stream_video_project_spark.streaming import jobs

    e = io.load_table(spark, sf_dir, "events")
    got = (
        jobs.followup_pairs_batch(e)
        .orderBy("user_id", "trigger_event_id", "response_event_id")
        .toPandas()
        .astype(str)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = (
        con.sql(
            """
SELECT t.user_id,
       t.event_id AS trigger_event_id,
       r.event_id AS response_event_id,
       epoch_us(r.ts) - epoch_us(t.ts) AS lag_us
FROM events t
JOIN events r
  ON r.user_id = t.user_id
 AND t.event_type = 'error' AND r.event_type = 'purchase'
 AND r.ts > t.ts
 AND epoch_us(r.ts) - epoch_us(t.ts) <= 14400000000
ORDER BY t.user_id, trigger_event_id, response_event_id
"""
        )
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0


def test_weighted_lpa_uniform_reduction_and_strong_tie(spark):
    """weight_col with uniform weights must equal the unweighted form;
    a single strong tie must outvote two weak ones (the weight-aware
    adoption the unweighted count cannot express)."""
    pairs = _K4 + [(10, 11), (11, 12), (10, 12)]
    uni = _edges(spark, pairs, [1] * len(pairs))
    a = {
        (r["p"], r["community"])
        for r in graph.label_propagation(uni.drop("n_orders"), iters=2).collect()
    }
    b = {
        (r["p"], r["community"])
        for r in graph.label_propagation(
            uni, iters=2, weight_col="n_orders"
        ).collect()
    }
    assert a == b
    # node 5 has two weak ties into the {1..4} clique side and one
    # strong tie to 9: weighted round 1 adopts 9's label, unweighted
    # adopts the smaller clique label.
    tie_pairs = [(1, 5), (2, 5), (5, 9)]
    tie_w = [1, 1, 10]
    e = _edges(spark, tie_pairs, tie_w)
    w1 = {
        r["p"]: r["community"]
        for r in graph.label_propagation(
            e, iters=1, weight_col="n_orders"
        ).collect()
    }
    u1 = {
        r["p"]: r["community"]
        for r in graph.label_propagation(e.drop("n_orders"), iters=1).collect()
    }
    assert w1[5] == 9 and u1[5] == 1
