"""Round-18 queue: concentration/conformance/trend/changepoint audits —
hand-checked unit pins, planted-signal positive controls, an
independent O(n²) brute-force replay of the Pettitt rank identity, and
the module lockstep rendered-value gate (the queries_round11..17
discipline)."""

from __future__ import annotations

import datetime as dt
import unittest.mock as mock

import duckdb
import pandas as pd
import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _rendered(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _mock_tables(spark, orders_rows, n_cust):
    """orders(o_custkey, o_orderdate, o_orderpriority, o_totalprice) +
    a customer table of n_cust customers all in nation 0 + one nation."""
    orders = spark.createDataFrame(
        orders_rows,
        "o_custkey long, o_orderdate timestamp, o_orderpriority string,"
        " o_totalprice double",
    )
    customer = spark.createDataFrame(
        [(i, 0) for i in range(1, n_cust + 1)],
        "c_custkey long, c_nationkey int",
    )
    nation = spark.createDataFrame(
        [(0, "TESTLAND", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    tables = {"orders": orders, "customer": customer, "nation": nation}
    return lambda _spark, _sf, name: tables[name]


# ---------------------------------------------------------------------------
# Gini concentration
# ---------------------------------------------------------------------------


def test_gini_equal_revenues_is_zero(spark):
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    t0 = dt.datetime(1995, 6, 1)
    rows = [(i, t0, "1-URGENT", 100.0) for i in range(1, 5)]
    with mock.patch.object(r18.io, "load_table", _mock_tables(spark, rows, 4)):
        out = r18._gini_revenue_concentration(spark, "unused").collect()
    assert len(out) == 1
    assert out[0]["n_customers"] == 4
    assert out[0]["total_cents"] == 40000
    assert out[0]["gini_millionths"] == 0


def test_gini_one_customer_has_all(spark):
    """One of n=4 customers holds all revenue: ascending x = (0,0,0,S),
    W = 4S, G = (8S - 5S)/(4S) = 3/4 exactly -> 750000 millionths."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    t0 = dt.datetime(1995, 6, 1)
    rows = [(4, t0, "1-URGENT", 100.0)]
    with mock.patch.object(r18.io, "load_table", _mock_tables(spark, rows, 4)):
        out = r18._gini_revenue_concentration(spark, "unused").collect()
    assert out[0]["gini_millionths"] == 750000


def test_gini_zero_revenue_nation_emits_zero(spark):
    """A nation whose customers never ordered: total 0 -> G defined 0
    (the den=0 guard), not a null/crash."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    with mock.patch.object(r18.io, "load_table", _mock_tables(spark, [], 3)):
        out = r18._gini_revenue_concentration(spark, "unused").collect()
    assert out[0]["total_cents"] == 0 and out[0]["gini_millionths"] == 0


# ---------------------------------------------------------------------------
# Mann-Kendall trend test
# ---------------------------------------------------------------------------


def test_mk_strictly_increasing_series(spark):
    """10 strictly increasing weeks: S = 45 (all pairs concordant),
    no ties, var18 = 10*9*25 = 2250, significance (44^2)*180000 =
    348e6 > 38416*2250 = 86.4e6 -> significant increasing."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    rows = [
        (1, dt.datetime(1995, 6, 1) + dt.timedelta(weeks=i), "1-URGENT", 100.0 + i)
        for i in range(10)
    ]
    with mock.patch.object(r18.io, "load_table", _mock_tables(spark, rows, 1)):
        out = r18._mann_kendall_weekly_trend(spark, "unused").collect()
    row = out[0]
    assert (row["n_weeks"], row["s_stat"], row["tie_term"], row["var18"]) == (
        10,
        45,
        0,
        2250,
    )
    assert row["trend"] == "increasing" and row["significant_95"]


def test_mk_constant_series_all_ties(spark):
    """10 equal weeks: S = 0, tie_term = n(n-1)(2n+5) so var18 = 0 —
    'no trend', not significant (and no divide-anywhere to blow up)."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    rows = [
        (1, dt.datetime(1995, 6, 1) + dt.timedelta(weeks=i), "1-URGENT", 100.0)
        for i in range(10)
    ]
    with mock.patch.object(r18.io, "load_table", _mock_tables(spark, rows, 1)):
        row = r18._mann_kendall_weekly_trend(spark, "unused").collect()[0]
    assert (row["s_stat"], row["var18"]) == (0, 0)
    assert row["trend"] == "no trend" and not row["significant_95"]


def test_mk_matches_brute_force_on_fixture(spark, sf_dir):
    """Independent O(n²) Python replay of S and the tie correction on
    the real weekly series — a third derivation next to the Spark plan
    and the DuckDB oracle."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    got = {r["grp"]: r for r in r18._mann_kendall_weekly_trend(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    weekly = con.sql(
        """SELECT o_orderpriority g,
                  CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 7 AS BIGINT) x,
                  SUM(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) y
           FROM orders GROUP BY 1,2 ORDER BY 1,2"""
    ).fetchall()
    by_g: dict = {}
    for g, x, y in weekly:
        by_g.setdefault(g, []).append(y)
    for g, ys in by_g.items():
        s = sum(
            (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
            for i in range(len(ys))
            for j in range(i + 1, len(ys))
        )
        counts: dict = {}
        for y in ys:
            counts[y] = counts.get(y, 0) + 1
        tie = sum(t * (t - 1) * (2 * t + 5) for t in counts.values() if t > 1)
        n = len(ys)
        assert got[g]["s_stat"] == s, g
        assert got[g]["var18"] == n * (n - 1) * (2 * n + 5) - tie, g


# ---------------------------------------------------------------------------
# Pettitt changepoint
# ---------------------------------------------------------------------------


def _pettitt_brute(ys):
    """Textbook O(n²) double-sum U_t — the definition the rank identity
    must reproduce."""
    n = len(ys)
    best = None
    for t in range(1, n):  # t = size of the first block, < n
        u = sum(
            (1 if ys[j] > ys[i] else -1 if ys[j] < ys[i] else 0)
            for i in range(t)
            for j in range(t, n)
        )
        if best is None or abs(u) > best[0]:  # first argmax wins ties
            best = (abs(u), t, u)
    return best  # (K, first argmax t, U at it)


def test_pettitt_planted_shift_detected_and_significant(spark):
    """10 low days then 10 high days: the brute-force K = 100 at t=10;
    the threshold (3688879*(8000+400)) DIV 1e6 = 30986 < 6*100² —
    significant, changepoint at step 10."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18
    from kinesis_stream_video_project_spark.plans import queries_round15 as r15

    ys = [float(i) for i in range(1, 11)] + [float(100 + i) for i in range(1, 11)]
    rows = [
        (1, dt.datetime(1995, 6, 1) + dt.timedelta(days=i), "1-URGENT", y)
        for i, y in enumerate(ys)
    ]
    with mock.patch.object(r15.io, "load_table", _mock_tables(spark, rows, 1)):
        row = r18._pettitt_changepoint(spark, "unused").collect()[0]
    k, t, u = _pettitt_brute([int(y * 100) for y in ys])
    assert (k, t) == (100, 10)
    assert (row["k_stat"], row["cp_step"], row["u_at_cp"]) == (k, t, u)
    assert row["significant_95"]


def test_pettitt_alternating_series_not_significant(spark):
    """A flat alternating series has no changepoint: K stays small and
    the decision is False — the boolean flips BOTH ways across this
    test pair."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18
    from kinesis_stream_video_project_spark.plans import queries_round15 as r15

    ys = [100.0 if i % 2 == 0 else 200.0 for i in range(20)]
    rows = [
        (1, dt.datetime(1995, 6, 1) + dt.timedelta(days=i), "1-URGENT", y)
        for i, y in enumerate(ys)
    ]
    with mock.patch.object(r15.io, "load_table", _mock_tables(spark, rows, 1)):
        row = r18._pettitt_changepoint(spark, "unused").collect()[0]
    k, t, u = _pettitt_brute([int(y * 100) for y in ys])
    assert (row["k_stat"], row["cp_step"], row["u_at_cp"]) == (k, t, u)
    assert not row["significant_95"]


def test_pettitt_rank_identity_matches_pairwise_on_fixture(spark, sf_dir):
    """Independent replay on the real daily series: e_i computed by
    DIRECT pairwise comparison (no rank() machinery, so Spark's window
    tie semantics are not assumed), U via prefix sums — O(n²) ≈ 3M sign
    evaluations per group at n ~ 1700. The true O(n³) double-sum
    definition is pinned by the synthetic n=20 tests above."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    got = {r["grp"]: r for r in r18._pettitt_changepoint(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    daily = con.sql(
        """SELECT o_orderpriority g, o_orderdate d,
                  SUM(CAST(floor(o_totalprice*100+0.5) AS BIGINT)) y
           FROM orders GROUP BY 1,2 ORDER BY 1,2"""
    ).fetchall()
    by_g: dict = {}
    for g, _d, y in daily:
        by_g.setdefault(g, []).append(y)
    g = sorted(by_g)[0]  # one group keeps the quadratic replay bounded
    ys = by_g[g]
    n = len(ys)
    sorted_ys = sorted(ys)
    import bisect

    u, best = 0, None
    for t in range(1, n):  # after the first t values
        x = ys[t - 1]
        cnt_lt = bisect.bisect_left(sorted_ys, x)
        cnt_gt = n - bisect.bisect_right(sorted_ys, x)
        u += cnt_gt - cnt_lt
        if best is None or abs(u) > best[0]:
            best = (abs(u), t, u)
    k, t, uat = best
    assert (got[g]["k_stat"], got[g]["cp_step"], got[g]["u_at_cp"]) == (k, t, uat)


# ---------------------------------------------------------------------------
# Module lockstep gate
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_round18_module_entries_match_oracles(spark, sf):
    """Driver-style rendered-value check over every pre-wired r18 query
    at ALL THREE SFs, plus per-query non-degeneracy (the planted-signal
    tests above pin the boolean directions the fixture doesn't
    exercise)."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as q18

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    for name, fn in q18.QUERIES.items():
        got = fn(spark, sf).toPandas()
        want = con.sql(q18.ORACLES[name]).df()
        assert sorted(got.columns) == sorted(want.columns), name
        assert _rendered(got).equals(_rendered(want)), name
        assert len(got) > 0, name
    gini = q18.QUERIES["gini_revenue_concentration"](spark, sf).toPandas()
    assert gini["gini_millionths"].between(0, 10**6).all()
    assert gini["gini_millionths"].nunique() > 1
    pt = q18.QUERIES["pettitt_changepoint"](spark, sf).toPandas()
    assert (pt["k_stat"] > 0).all()


# ---------------------------------------------------------------------------
# Association rules with lift
# ---------------------------------------------------------------------------


def test_assoc_rules_handchecked(spark):
    """Baskets {A,B}, {A,B}, {A,C}, {B}: n=4, c_A=3, c_B=3, c_AB=2
    (survives min support 2), c_AC=1 (dropped). support = 500000,
    conf A->B = 2e6 DIV 3 = 666666, lift = 2*4*1e6 DIV 9 = 888888
    (< 1e6: A and B co-occur LESS than independence predicts here)."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    li = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10), (3, 30), (4, 20)],
        "l_orderkey long, l_partkey long",
    )
    with mock.patch.object(r18.io, "load_table", lambda *_a: li):
        out = r18._assoc_rules_lift(spark, "unused").collect()
    assert len(out) == 1
    row = out[0]
    assert (row["part_a"], row["part_b"], row["c_ab"]) == (10, 20, 2)
    assert (row["n_baskets"], row["c_a"], row["c_b"]) == (4, 3, 3)
    assert row["support_millionths"] == 500000
    assert row["conf_ab_millionths"] == 666666
    assert row["conf_ba_millionths"] == 666666
    assert row["lift_millionths"] == 888888


def test_assoc_rules_duplicate_lines_one_vote(spark):
    """Two lineitem rows of the SAME part in one order are one basket
    membership (the DISTINCT stage), not a self-pair."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    li = spark.createDataFrame(
        [(1, 10), (1, 10), (1, 20), (2, 10), (2, 20)],
        "l_orderkey long, l_partkey long",
    )
    with mock.patch.object(r18.io, "load_table", lambda *_a: li):
        out = r18._assoc_rules_lift(spark, "unused").collect()
    assert len(out) == 1 and out[0]["c_ab"] == 2 and out[0]["c_a"] == 2


# ---------------------------------------------------------------------------
# Maximum drawdown
# ---------------------------------------------------------------------------


def test_drawdown_handchecked(spark):
    """Series 10, 20, 15, 5, 25 (dollars): running peaks 10,20,20,20,25;
    drawdowns 0,0,5,15,0 -> max 15.00 at step 4, peak 20.00, trough
    5.00."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18
    from kinesis_stream_video_project_spark.plans import queries_round15 as r15

    ys = [10.0, 20.0, 15.0, 5.0, 25.0]
    rows = [
        (1, dt.datetime(1995, 6, 1) + dt.timedelta(days=i), "1-URGENT", y)
        for i, y in enumerate(ys)
    ]
    with mock.patch.object(r15.io, "load_table", _mock_tables(spark, rows, 1)):
        row = r18._max_drawdown_daily(spark, "unused").collect()[0]
    assert (row["peak_cents"], row["trough_cents"]) == (2000, 500)
    assert (row["max_drawdown_cents"], row["dd_step"]) == (1500, 4)


def test_drawdown_monotone_rising_is_zero_at_first_step(spark):
    """A monotone rising series never draws down: max dd = 0, and the
    FIRST step wins the all-zero tie (deterministic pick)."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18
    from kinesis_stream_video_project_spark.plans import queries_round15 as r15

    rows = [
        (1, dt.datetime(1995, 6, 1) + dt.timedelta(days=i), "1-URGENT",
         10.0 + i)
        for i in range(5)
    ]
    with mock.patch.object(r15.io, "load_table", _mock_tables(spark, rows, 1)):
        row = r18._max_drawdown_daily(spark, "unused").collect()[0]
    assert (row["max_drawdown_cents"], row["dd_step"]) == (0, 1)


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman index
# ---------------------------------------------------------------------------


def _mock_supply(spark, line_rows, n_supp):
    li = spark.createDataFrame(
        line_rows,
        "l_suppkey long, l_extendedprice double, l_discount double",
    )
    supplier = spark.createDataFrame(
        [(i, 0) for i in range(1, n_supp + 1)],
        "s_suppkey long, s_nationkey int",
    )
    nation = spark.createDataFrame(
        [(0, "TESTLAND", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    tables = {"lineitem": li, "supplier": supplier, "nation": nation}
    return lambda _spark, _sf, name: tables[name]


def test_hhi_monopoly_is_one_million(spark):
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    rows = [(1, 100.0, 0.0), (1, 50.0, 0.0)]
    with mock.patch.object(r18.io, "load_table", _mock_supply(spark, rows, 3)):
        row = r18._hhi_supplier_concentration(spark, "unused").collect()[0]
    # suppliers 2 and 3 never ship a line: HHI is over REVENUE-BEARING
    # suppliers (n_suppliers counts them), so one seller == monopoly.
    assert (row["n_suppliers"], row["hhi_millionths"]) == (1, 1000000)


def test_hhi_two_equal_sellers_is_half(spark):
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    rows = [(1, 100.0, 0.0), (2, 100.0, 0.0)]
    with mock.patch.object(r18.io, "load_table", _mock_supply(spark, rows, 2)):
        row = r18._hhi_supplier_concentration(spark, "unused").collect()[0]
    assert (row["n_suppliers"], row["total_cents"]) == (2, 20000)
    assert row["hhi_millionths"] == 500000


def test_hhi_discount_enters_exactly(spark):
    """One 100.00 line at 10% + one 90.00 line at 0%: equal 9000-cent
    shares -> 500000, pinning the per-line scaled_long discipline."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    rows = [(1, 100.0, 0.1), (2, 90.0, 0.0)]
    with mock.patch.object(r18.io, "load_table", _mock_supply(spark, rows, 2)):
        row = r18._hhi_supplier_concentration(spark, "unused").collect()[0]
    assert row["total_cents"] == 18000 and row["hhi_millionths"] == 500000


# ---------------------------------------------------------------------------
# Fano-factor burstiness
# ---------------------------------------------------------------------------


def _mock_events_ts(spark, rows):
    """rows = (event_type, hour_offset) -> events(ts, event_type)."""
    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(t0 + dt.timedelta(hours=h), t) for t, h in rows],
        "ts timestamp, event_type string",
    )
    return lambda _spark, _sf, name: ev


def test_fano_perfectly_regular_is_zero(spark):
    """Exactly one event per hour for 6 hours: Var = 0 -> F = 0 (maximal
    regularity, far under-dispersed vs Poisson)."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    rows = [("click", h) for h in range(6)]
    with mock.patch.object(r18.io, "load_table", _mock_events_ts(spark, rows)):
        row = r18._fano_burstiness_hourly(spark, "unused").collect()[0]
    assert (row["n_hours"], row["n_events"]) == (6, 6)
    assert row["fano_millionths"] == 0 and not row["overdispersed"]


def test_fano_single_burst_hand_checked(spark):
    """6 events all in hour 0 of a 6-hour span (pinned open by a lone
    event in hour 5): counts (6,0,0,0,0,1) for the burst type... use
    two types so the spine is 6 hours: burst type = 6 events at hour 0,
    F = (6*36 - 36)*1e6 DIV (6*6) = 5000000 -> overdispersed; the
    clock type (1 per hour at 0 and 5) shares the spine."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    rows = [("burst", 0)] * 6 + [("clock", 0), ("clock", 5)]
    with mock.patch.object(r18.io, "load_table", _mock_events_ts(spark, rows)):
        out = {r["event_type"]: r for r in r18._fano_burstiness_hourly(spark, "unused").collect()}
    b = out["burst"]
    assert (b["n_hours"], b["n_events"]) == (6, 6)
    # n*ss - s^2 = 6*36 - 36 = 180; 180*1e6 // 36 = 5000000
    assert b["fano_millionths"] == 5000000 and b["overdispersed"]
    c = out["clock"]
    # counts (1,0,0,0,0,1): ss=2, s=2 -> (12-4)*1e6 // 12 = 666666
    assert c["fano_millionths"] == 666666 and not c["overdispersed"]


def test_fano_zero_hours_counted_via_spine(spark):
    """A type active only at the span's edges still divides by the FULL
    spine (n_hours = 6, not 2) — dropping empty hours would bias F
    down; the spine is the point of the gap-fill."""
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    rows = [("a", 0), ("a", 5), ("b", 2), ("b", 3)]
    with mock.patch.object(r18.io, "load_table", _mock_events_ts(spark, rows)):
        out = {r["event_type"]: r for r in r18._fano_burstiness_hourly(spark, "unused").collect()}
    assert out["a"]["n_hours"] == 6 and out["b"]["n_hours"] == 6


def test_gini_grouped_form_agrees_with_global_operator(spark, sf_dir):
    """Cross-pin vs the REGISTERED X-151 form: restricted to
    revenue-bearing entities (X-151 never sees zero-revenue ones) and
    one group, the grouped millionths coefficient integer-divides down
    to exactly the global operator's permille — the nested-division
    identity floor(floor(a/d)/1000) == floor(a/(1000d)) makes the two
    scales comparable without re-deriving either."""
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.operators.stats import (
        gini_concentration,
    )
    from kinesis_stream_video_project_spark.plans import queries_round18 as r18
    from kinesis_stream_video_project_spark import io as eio

    orders = eio.load_table(spark, sf_dir, "orders")
    want = gini_concentration(orders, "o_totalprice", "o_custkey").collect()[0]

    active = orders.select("o_custkey").distinct()
    customer = active.selectExpr(
        "o_custkey AS c_custkey", "CAST(0 AS INT) AS c_nationkey"
    )
    nation = spark.createDataFrame(
        [(0, "ALL", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    tables = {"orders": orders, "customer": customer, "nation": nation}
    with mock.patch.object(
        r18.io, "load_table", lambda _s, _d, name: tables[name]
    ):
        got = r18._gini_revenue_concentration(spark, "unused").collect()[0]
    assert got["n_customers"] == want["n_entities"]
    assert got["total_cents"] == want["total"]
    assert got["gini_millionths"] // 1000 == want["gini_permille"]
