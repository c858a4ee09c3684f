"""Hypothesis property tests for the round-5 operator families: pure-
Python fold laws (no Spark) plus a small number of randomized Spark-vs-
pure-Python differential checks (bounded example counts — each example
runs real Spark jobs).

These generalize the concrete pins in test_round5d/e: instead of one
hand-built graph or series, every law is checked across randomized
inputs, with an independent reference implementation on the other side.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_stream_video_project_spark.functions.numeric import tdiv
from kinesis_stream_video_project_spark.operators import graph, stats
from kinesis_stream_video_project_spark.plans.queries_round5e import cusum_fold
from kinesis_stream_video_project_spark.streaming.jobs import (
    _cusum_step,
    _zscore_fold,
)

# ---------------------------------------------------------------------------
# Pure-Python fold laws (fast, many examples)
# ---------------------------------------------------------------------------

_series = st.lists(
    st.integers(min_value=-(10**9), max_value=10**9), min_size=0, max_size=80
)


@given(_series)
@settings(max_examples=200, deadline=None)
def test_zscore_fold_matches_definition(vals):
    """For every prefix window of ≤20 trailing values with n ≥ 10, the
    fold's flag decision equals the definitional integer inequality."""
    rows = [(i, v) for i, v in enumerate(vals)]
    _, flagged = _zscore_fold([], rows)
    want = []
    for i in range(len(vals)):
        w = vals[max(0, i - 19) : i + 1]
        n = len(w)
        if n < 10:
            continue
        s, q = sum(w), sum(x * x for x in w)
        if (n * vals[i] - s) ** 2 > 9 * (n * q - s * s):
            want.append((i, vals[i]))
    assert flagged == want


@given(_series, st.lists(st.integers(1, 30), min_size=1, max_size=10))
@settings(max_examples=200, deadline=None)
def test_cusum_step_chunking_invariance(vals, cuts):
    """Any micro-batch split of an in-order series produces the one-shot
    fold's alarm list exactly — the state-decomposition law, now over
    randomized series (including negative values exercising tdiv)."""
    rows = [(i, v) for i, v in enumerate(vals)]
    batch = cusum_fold(
        pd.DataFrame(
            {
                "user_id": [1] * len(vals),
                "ts": range(len(vals)),
                "event_id": [e for e, _ in rows],
                "vu": pd.array([v for _, v in rows], dtype="int64"),
            }
        )
    )
    want = list(zip(batch["event_id"], batch["direction"]))
    warmup, ref, sp, sm = [], None, 0, 0
    alarms: list = []
    i = 0
    ci = 0
    while i < len(rows):
        n = cuts[ci % len(cuts)]
        ci += 1
        warmup, ref, sp, sm, a = _cusum_step(warmup, ref, sp, sm, rows[i : i + n])
        alarms.extend(a)
        i += n
    assert alarms == want


@given(st.integers(-(10**12), 10**12), st.integers(1, 10**6))
@settings(max_examples=300)
def test_tdiv_matches_duckdb_semantics(a, b):
    """tdiv truncates toward zero for positive divisors — the Spark `div`
    / DuckDB `//` semantics (cross-checked against int(a/b) computed via
    exact Fraction to avoid float error)."""
    from fractions import Fraction

    want = int(Fraction(a, b))  # Fraction __int__ truncates toward zero
    assert tdiv(a, b) == want


# ---------------------------------------------------------------------------
# Spark-vs-pure-Python differential checks (few examples; real jobs)
# ---------------------------------------------------------------------------

_graphs = st.sets(
    st.tuples(st.integers(1, 10), st.integers(1, 10)).filter(
        lambda e: e[0] < e[1]
    ),
    min_size=1,
    max_size=25,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in sorted(pairs)], "p1 bigint, p2 bigint"
    )


@given(_graphs)
@settings(max_examples=10, deadline=None)
def test_triangle_count_random_graphs(spark, pairs):
    got = graph.triangle_count(_edges_df(spark, pairs)).collect()[0]
    es = set(pairs)
    nodes = sorted({n for e in es for n in e})
    brute = sum(
        1
        for i, a in enumerate(nodes)
        for b in nodes[i + 1 :]
        for c in nodes
        if c > b
        and (a, b) in es
        and (a, c) in es
        and (b, c) in es
    )
    assert got["n_triangles"] == brute and got["n_edges"] == len(es)


def _pagerank_ref(pairs, iters=2, base=10**12):
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    ranks = {p: base for p in adj}
    teleport = (15 * base) // 100
    for _ in range(iters):
        incoming = {p: 0 for p in adj}
        for u, nbrs in adj.items():
            c = (85 * ranks[u]) // (100 * len(nbrs))
            for v in nbrs:
                incoming[v] += c
        ranks = {p: teleport + incoming[p] for p in adj}
    return ranks


@given(_graphs)
@settings(max_examples=10, deadline=None)
def test_pagerank_random_graphs(spark, pairs):
    got = {
        r["p"]: r["rank_scaled"]
        for r in graph.pagerank_int(_edges_df(spark, pairs), iters=2).collect()
    }
    assert got == _pagerank_ref(pairs, iters=2)


def _lpa_ref(pairs, iters=2):
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    labels = {p: p for p in adj}
    for _ in range(iters):
        nxt = {}
        for p, nbrs in adj.items():
            counts = Counter(labels[n] for n in nbrs)
            # most frequent, ties to smaller label
            nxt[p] = min(
                counts, key=lambda lab: (-counts[lab], lab)
            )
        labels = nxt
    return labels


@given(_graphs)
@settings(max_examples=10, deadline=None)
def test_label_propagation_random_graphs(spark, pairs):
    got = {
        r["p"]: r["community"]
        for r in graph.label_propagation(_edges_df(spark, pairs), iters=2).collect()
    }
    assert got == _lpa_ref(pairs, iters=2)


_groups = st.lists(
    st.tuples(st.integers(1, 3), st.integers(-(10**6), 10**6)),
    min_size=1,
    max_size=40,
)


def _lower_median_ref(xs):
    xs = sorted(xs)
    n = len(xs)
    cum = 0
    for val, w in sorted(Counter(xs).items()):
        cum += w
        if 2 * cum >= n:
            return val


@given(_groups)
@settings(max_examples=10, deadline=None)
def test_robust_center_spread_random(spark, rows):
    df = spark.createDataFrame(rows, "g int, v long")
    got = {
        r["g"]: (r["med"], r["mad"], r["n_rows"])
        for r in stats.robust_center_spread(df, "g", "v").collect()
    }
    byg: dict = {}
    for g, v in rows:
        byg.setdefault(g, []).append(v)
    want = {}
    for g, xs in byg.items():
        m = _lower_median_ref(xs)
        want[g] = (m, _lower_median_ref([abs(x - m) for x in xs]), len(xs))
    assert got == want


_docs = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=8),
    min_size=2,
    max_size=8,
)


@given(_docs)
@settings(max_examples=10, deadline=None)
def test_blocked_tiers_match_set_arithmetic(spark, token_lists):
    """Random tiny corpora: the postings-core tiers must equal plain
    Python set arithmetic — Jaccard = |∩|/|∪| and containment =
    |∩|/min(|A|,|B|) over whitespace token sets, at a low threshold that
    keeps most pairs (exercising the shared `_blocked_pair_counts` path
    end to end after the round-5 refactor)."""
    from kinesis_stream_video_project_spark.operators import dedup

    docs = [(i, " ".join(toks), "w", "en") for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(
        docs, "doc_id bigint, text string, source string, lang string"
    )

    def r4py(x):
        import math

        return math.floor(x * 10000.0 + 0.5) / 10000.0

    sets = {i: set(toks) for i, toks in enumerate(token_lists)}
    want_j, want_c = {}, {}
    for a in sets:
        for b in sets:
            if a >= b:
                continue
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = r4py(inter / len(sets[a] | sets[b]))
            c = r4py(inter / min(len(sets[a]), len(sets[b])))
            if j >= 0.1:
                want_j[(a, b)] = j
            if c >= 0.1:
                want_c[(a, b)] = c
    got_j = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.blocked_jaccard_near_dups(df, threshold=0.1).collect()
    }
    got_c = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in dedup.blocked_containment_near_dups(df, threshold=0.1).collect()
    }
    assert got_j == want_j
    assert got_c == want_c


_weighted_graphs = st.sets(
    st.tuples(st.integers(1, 8), st.integers(1, 8), st.integers(1, 5)).filter(
        lambda e: e[0] < e[1]
    ),
    min_size=1,
    max_size=15,
)


def _weighted_pagerank_ref(triples, iters=2, base=10**12):
    adj: dict = {}
    for a, b, w in triples:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    ranks = {p: base for p in adj}
    teleport = (15 * base) // 100
    for _ in range(iters):
        incoming = {p: 0 for p in adj}
        for u, nbrs in adj.items():
            wu = sum(w for _, w in nbrs)
            for v, w in nbrs:
                incoming[v] += (85 * ranks[u] * w) // (100 * wu)
        ranks = {p: teleport + incoming[p] for p in adj}
    return ranks


@given(_weighted_graphs)
@settings(max_examples=10, deadline=None)
def test_weighted_pagerank_random_graphs(spark, triples):
    """Weighted integer PageRank vs a pure-Python reference on random
    weighted graphs — the (85·r·w) div (100·Σw) recurrence must agree
    exactly. (Duplicate (p1,p2) pairs with different weights can occur in
    the strategy; both sides treat them as parallel edges.)"""
    df = spark.createDataFrame(
        [(a, b, w) for a, b, w in sorted(triples)],
        "p1 bigint, p2 bigint, wt bigint",
    )
    got = {
        r["p"]: r["rank_scaled"]
        for r in graph.pagerank_int(df, iters=2, weight_col="wt").collect()
    }
    assert got == _weighted_pagerank_ref(triples, iters=2)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=15, deadline=None)
def test_composite_key_median_matches_bruteforce(spark, rows):
    """r6 composite-key quantile walk: lower median per (g1, g2) equals
    the plain-Python reference on random frames."""
    df = spark.createDataFrame(rows, "g1 string, g2 int, v long")
    got = {
        (r.g1, r.g2): r.q
        for r in stats.exact_quantile(df, ["g1", "g2"], "v", 1, 2).collect()
    }
    byg: dict = {}
    for g1, g2, v in rows:
        byg.setdefault((g1, g2), []).append(v)
    want = {}
    for k, vs in byg.items():
        vs = sorted(vs)
        want[k] = vs[(len(vs) - 1) // 2]
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),     # user
            st.integers(min_value=0, max_value=3600),  # seconds offset
        ),
        min_size=1,
        max_size=40,
        unique=True,
    ),
    st.integers(min_value=60, max_value=600),
)
@settings(max_examples=15, deadline=None)
def test_silent_periods_frame_matches_bruteforce(spark, evs, silence_s):
    """r6 batch silence twin: interior gaps + trailing silence equal the
    plain-Python replay on random event sets."""
    import datetime as dt

    from kinesis_stream_video_project_spark.plans.queries_round6 import (
        silent_periods_frame,
    )

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (i, base + dt.timedelta(seconds=sec), u)
        for i, (u, sec) in enumerate(evs)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    silence_us = silence_s * 1_000_000
    got = {
        (r.user_id, r.last_seen_us, r.silent_after_us)
        for r in silent_periods_frame(df, silence_us).collect()
    }
    base_us = int(base.timestamp()) * 1_000_000
    byu: dict = {}
    for i, (u, sec) in enumerate(evs):
        byu.setdefault(u, []).append(base_us + sec * 1_000_000)
    gmax = max(us for uss in byu.values() for us in uss)
    want = set()
    for u, uss in byu.items():
        uss = sorted(uss)
        for a, b in zip(uss, uss[1:]):
            if b - a > silence_us:
                want.add((u, a, a + silence_us))
        if gmax - uss[-1] > silence_us:
            want.add((u, uss[-1], uss[-1] + silence_us))
    assert got == want
