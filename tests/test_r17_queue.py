"""Round-17 queue: log/entropy-family claims queries + the AMS
join-size estimator — hand-checked unit pins, theorem/negative
controls, and the module lockstep rendered-value gate (the
queries_round11..16 discipline)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _rendered(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Shannon entropy claims
# ---------------------------------------------------------------------------


def _mock_events(spark, rows):
    import datetime as dt

    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, h, 0, 0), 1, t, 1.0, "{}")
            for i, (t, h) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_entropy_uniform_hits_max(spark):
    """4 hours x 1 event = the uniform distribution: H = log2(4) = 2
    EXACTLY (powers of two are exact in IEEE), so every claim is true
    and sum_c2 = 4."""
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round17 as r17

    ev = _mock_events(spark, [("click", h) for h in (0, 6, 12, 18)])
    with mock.patch.object(r17.io, "load_table", lambda *_a: ev):
        row = r17._entropy_hourly_claims(spark, "unused").collect()[0]
    assert (row["n_events"], row["n_hours"], row["sum_c2"]) == (4, 4, 4)
    assert row["h_le_max"] and row["h_ge_renyi2"] and row["h_flat"]


def test_entropy_skew_fails_flatness_but_keeps_theorems(spark):
    """97 events in one hour + 3 spread: the flatness claim goes FALSE
    (the claim has teeth — a skewed mix is detected) while the two
    THEOREM claims (H <= log2 k, H >= Renyi-2) stay true, as they must
    on any distribution."""
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round17 as r17

    rows = [("error", 3)] * 97 + [("error", 7), ("error", 11), ("error", 15)]
    ev = _mock_events(spark, rows)
    with mock.patch.object(r17.io, "load_table", lambda *_a: ev):
        row = r17._entropy_hourly_claims(spark, "unused").collect()[0]
    assert not row["h_flat"]
    assert row["h_le_max"] and row["h_ge_renyi2"]


# ---------------------------------------------------------------------------
# KL divergence claims
# ---------------------------------------------------------------------------


def test_kl_identical_source_is_not_positive(spark):
    """A source whose token mix EQUALS the corpus mix has KL = 0
    exactly — kl_pos is FALSE (documents that the Gibbs-strict claim is
    data-dependent: the fixture's sources genuinely drift, min measured
    8.6e-4; two identical sources would not). gibbs_holds stays true
    (<= is the theorem form)."""
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round17 as r17

    docs = spark.createDataFrame(
        [(0, "a a b", "en", "s0", 5), (1, "a a b", "en", "s1", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with mock.patch.object(r17.io, "load_table", lambda *_a: docs):
        rows = {
            r["source"]: r
            for r in r17._kl_source_unigrams(spark, "unused").collect()
        }
    for r in rows.values():
        assert not r["kl_pos"]
        assert r["gibbs_holds"]
        assert r["n_tokens"] == 3 and r["vocab"] == 2


def test_kl_drifted_source_is_positive(spark):
    """Sources with opposite skews ('a a a b' vs 'a b b b') both sit a
    positive KL away from the pooled corpus mix."""
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round17 as r17

    docs = spark.createDataFrame(
        [(0, "a a a b", "en", "s0", 7), (1, "a b b b", "en", "s1", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with mock.patch.object(r17.io, "load_table", lambda *_a: docs):
        rows = r17._kl_source_unigrams(spark, "unused").collect()
    assert all(r["kl_pos"] and r["gibbs_holds"] for r in rows)


# ---------------------------------------------------------------------------
# log-PMI bracket claims
# ---------------------------------------------------------------------------


def test_pmi_bracket_rows_mirror_registered_surrogate(spark, sf_dir):
    """The claims query emits the SAME (prev, cur, n_pairs, pmi_scaled,
    rnk) rows as the r8-green pmi_collocations_topk — the float tier is
    an annotation on the integer tier, not a different ranking — and
    every bracket/sign claim holds on the fixture."""
    from kinesis_stream_video_project_spark import io
    from kinesis_stream_video_project_spark.operators import lm
    from kinesis_stream_video_project_spark.plans import queries_round17 as r17

    got = r17._pmi_log_bracket_claims(spark, sf_dir).toPandas()
    reg = lm.pmi_collocations(
        io.load_table(spark, sf_dir, "documents")
    ).toPandas()
    cols = ["prev", "cur", "n_pairs", "pmi_scaled", "rnk"]
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = reg[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    assert got["in_bracket"].all() and got["sign_ok"].all()


# ---------------------------------------------------------------------------
# AMS join size
# ---------------------------------------------------------------------------


def test_ams_join_size_exact_side_handchecked(spark):
    """Keys [a,a,b] x [a,b,b]: J = 2*1 + 1*2 = 4, F2(A) = 5, F2(B) = 5.
    The estimate is a +/-1-register inner product, so |est| <= n_a*n_b."""
    from kinesis_stream_video_project_spark.operators.ams import ams_join_size

    dfa = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    dfb = spark.createDataFrame([("a",), ("b",), ("b",)], "k string")
    row = ams_join_size(dfa, "k", dfb, "k").collect()[0]
    assert (row["n_a"], row["n_b"]) == (3, 3)
    assert (row["f2_a"], row["f2_b"], row["join_size"]) == (5, 5, 4)
    assert abs(row["est_num"]) <= 16 * 9


def test_ams_join_size_disjoint_keys(spark):
    """Disjoint key domains: the true join is EMPTY — join_size = 0,
    ratio NULL (no x/0 Infinity crosses the hash boundary), and the
    Chebyshev claim still evaluates."""
    from kinesis_stream_video_project_spark.operators.ams import ams_join_size

    dfa = spark.createDataFrame([("a",), ("a",)], "k string")
    dfb = spark.createDataFrame([("z",), ("z",)], "k string")
    row = ams_join_size(dfa, "k", dfb, "k").collect()[0]
    assert row["join_size"] == 0
    assert row["ratio"] is None
    assert row["within_3sd"] is not None


def test_ams_join_size_null_keys_excluded(spark):
    """NULL keys are excluded BEFORE sketching (ADVICE r12 item 3): a
    NULL key never joins, but unfiltered it would count into n while
    its parity bit is NULL — +1 bias in every register X_r = n - 2*s_r.
    The row with NULLs on both sides must equal the NULL-free row
    field-for-field (registers included, via est_num), and the DuckDB
    oracle replay must agree on the same frames."""
    import duckdb as ddb

    from kinesis_stream_video_project_spark.operators.ams import (
        ams_join_size,
        ams_join_size_oracle_sql,
    )

    dfa = spark.createDataFrame([("a",), ("a",), ("b",), (None,)], "k string")
    dfb = spark.createDataFrame([("a",), ("b",), ("b",), (None,)], "k string")
    clean_a = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    clean_b = spark.createDataFrame([("a",), ("b",), ("b",)], "k string")
    got = ams_join_size(dfa, "k", dfb, "k").toPandas()
    clean = ams_join_size(clean_a, "k", clean_b, "k").toPandas()
    assert _rendered(got).equals(_rendered(clean))
    assert (got["n_a"][0], got["n_b"][0]) == (3, 3)

    con = ddb.connect()
    con.register("ta", pd.DataFrame({"k": ["a", "a", "b", None]}))
    con.register("tb", pd.DataFrame({"k": ["a", "b", "b", None]}))
    oracle = con.sql(ams_join_size_oracle_sql("ta", "k", "tb", "k")).df()
    assert _rendered(oracle).equals(_rendered(got))


def test_ams_join_size_refuses_bad_estimator_count(spark):
    from kinesis_stream_video_project_spark.operators.ams import ams_join_size

    dfa = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="n_estimators"):
        ams_join_size(dfa, "k", dfa, "k", n_estimators=0)


# ---------------------------------------------------------------------------
# Module lockstep gate
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_round17_module_entries_match_oracles(spark, sf):
    """Driver-style rendered-value check over every pre-wired r17 query
    — the lockstep gate, run at ALL THREE SFs — plus the claims-true
    sweep: a claims query whose booleans match as FALSE==FALSE would be
    a silent miscalibration (the r3 empty==empty trap, boolean form)."""
    from kinesis_stream_video_project_spark.plans import queries_round17 as q17

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    assert len(q17.QUERIES) == 7
    for name, fn in q17.QUERIES.items():
        got = fn(spark, sf).toPandas()
        want = con.sql(q17.ORACLES[name]).df()
        assert sorted(got.columns) == sorted(want.columns), name
        assert _rendered(got).equals(_rendered(want)), name
        assert len(got) > 0, name
        for c in got.columns:
            if got[c].dtype == bool:
                assert got[c].all(), f"{name}.{c}: claim false on fixture"


# ---------------------------------------------------------------------------
# Markov removal-effect attribution
# ---------------------------------------------------------------------------


def test_mra_handchecked_two_journeys(spark):
    """User A: click → purchase; user B: view → (silence). The chain:
    START splits 50/50; click converts surely, view dies surely. So
    p_full(START) = 500000; removing click kills all conversion
    (removal = 500000, share = 10^6); removing view changes nothing
    (removal 0, share 0)."""
    import datetime as dt
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round17 as r17

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (0, t0, 1, "click", 1.0, "{}"),
        (1, t0.replace(minute=1), 1, "purchase", 1.0, "{}"),
        (2, t0, 2, "view", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with mock.patch.object(r17.io, "load_table", lambda *_a: ev):
        got = {
            r["channel"]: r
            for r in r17._markov_removal_attribution(spark, "unused").collect()
        }
    assert set(got) == {"click", "view"}
    assert got["click"]["p_full_start"] == 500000
    assert got["click"]["removal_millionths"] == 500000
    assert got["click"]["share_millionths"] == 10**6
    assert got["view"]["removal_millionths"] == 0
    assert got["view"]["share_millionths"] == 0


def test_mra_laws_on_fixture(spark, sf_dir):
    """Removal effects are nonnegative (removing a node cannot raise
    conversion), p_removed <= p_full, and truncating shares sum to at
    most 10^6."""
    from kinesis_stream_video_project_spark.plans import queries_round17 as r17

    rows = r17._markov_removal_attribution(spark, sf_dir).collect()
    assert len(rows) >= 3
    for r in rows:
        assert r["removal_millionths"] >= 0
        assert r["p_removed_start"] <= r["p_full_start"]
    assert sum(r["share_millionths"] for r in rows) <= 10**6


# ---------------------------------------------------------------------------
# surprisal bits claims
# ---------------------------------------------------------------------------


def test_surprisal_bits_short_docs_absent_and_formulaic_low(spark):
    """The bigram_surprisal output contract carries over: a 1-token doc
    emits NO row. A perfectly formulaic corpus (every doc the same
    bigram chain) has H = 0 for every doc — h_nonneg holds, the
    fixture band claim honestly FAILS (the band has teeth), and Jensen
    collapses to equality so jensen_strict is FALSE."""
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round17 as r17

    docs = spark.createDataFrame(
        [
            (0, "a b a b", "en", "s0", 7),
            (1, "a b a b", "en", "s0", 7),
            (2, "x", "en", "s0", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with mock.patch.object(r17.io, "load_table", lambda *_a: docs):
        rows = {
            r["doc_id"]: r
            for r in r17._surprisal_bits_claims(spark, "unused").collect()
        }
    assert set(rows) == {0, 1}
    for r in rows.values():
        assert r["h_nonneg"] and r["jensen_holds"]
        assert not r["h_band"]
        assert not r["jensen_strict"]


# ---------------------------------------------------------------------------
# Holt split-conformal coverage
# ---------------------------------------------------------------------------


def test_conformal_laws_and_replay(spark, sf_dir):
    """Structural laws per group: k <= n_cal, 0 <= coverage <= 1000,
    n_cal + n_test = n - 1 (one residual per step from 2..n, split at
    (7n) div 10), q >= 0 — plus a pure-Python replay of the whole
    audit (Holt fold, rank quantile, coverage count) agreeing exactly
    for one group."""
    from kinesis_stream_video_project_spark.plans import queries_round15 as r15
    from kinesis_stream_video_project_spark.plans import queries_round17 as r17

    rows = {r["grp"]: r for r in
            r17._holt_conformal_coverage(spark, sf_dir).collect()}
    series = {}
    for r in r15._daily_series(spark, sf_dir).collect():
        series.setdefault(r["grp"], []).append((r["step"], r["xs"]))
    assert len(rows) == 5
    for g, r in rows.items():
        n = len(series[g])
        assert r["k"] <= r["n_cal"]
        assert 0 <= r["coverage_permille"] <= 1000
        assert r["n_cal"] + r["n_test"] == n - 1
        assert r["q_cents"] >= 0

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    g = sorted(rows)[0]
    xs = [x for _, x in sorted(series[g])]
    n = len(xs)
    fc = {}
    l = xs[0]; b = xs[1] - xs[0]; fc[2] = l + b
    lv = tdiv(xs[1] + l + b, 2); tr = tdiv(lv - l + b, 2); fc[3] = lv + tr
    for i in range(2, n):
        lv2 = tdiv(xs[i] + lv + tr, 2); tr = tdiv(lv2 - lv + tr, 2)
        lv = lv2; fc[i + 2] = lv + tr
    resid = [(t, abs(xs[t - 1] - fc[t])) for t in range(2, n + 1) if t in fc]
    cend = (n * 7) // 10
    cal = sorted(r_ for t, r_ in resid if t <= cend)
    test = [r_ for t, r_ in resid if t > cend]
    k = min((9 * (len(cal) + 1) + 9) // 10, len(cal))
    q = cal[k - 1]
    cov = sum(1 for r_ in test if r_ <= q)
    r = rows[g]
    assert (r["n_cal"], r["n_test"], r["k"], r["q_cents"], r["n_covered"]) == (
        len(cal), len(test), k, q, cov
    )
