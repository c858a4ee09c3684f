"""Round-16 queue: cohort LTV triangle + order-total reconciliation
audit — operator unit pins + the module lockstep rendered-value gate
(the queries_round11..15 discipline)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _rendered(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_ltv_handchecked(spark):
    """Customer 1: orders $10 in 1992Q1 and $5 in 1992Q3 → cohort
    1992Q1 (index 7968), ages 0 and 2, cumulative 1000 then 1500 cents.
    Customer 2: one $7 order in 1992Q3 → its OWN cohort at age 0 (a
    later-joining customer starts a new cohort, not age 2 of the old
    one)."""
    import datetime as dt
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round16 as r16

    rows = [
        (1, 1, "O", 10.0, dt.datetime(1992, 1, 15), "1-URGENT"),
        (2, 1, "O", 5.0, dt.datetime(1992, 8, 15), "1-URGENT"),
        (3, 2, "O", 7.0, dt.datetime(1992, 7, 1), "1-URGENT"),
    ]
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with mock.patch.object(r16.io, "load_table", lambda *_a: orders):
        got = {
            (r["cohort_q"], r["age_q"]): r
            for r in r16._ltv_cohort_revenue(spark, "unused").collect()
        }
    q1 = 1992 * 4 + 0
    q3 = 1992 * 4 + 2
    assert set(got) == {(q1, 0), (q1, 2), (q3, 0)}
    assert got[(q1, 0)]["cum_rev_cents"] == 1000
    assert got[(q1, 2)]["cum_rev_cents"] == 1500
    assert got[(q1, 2)]["n_customers"] == 1
    assert got[(q3, 0)]["cum_rev_cents"] == 700


def test_ltv_triangle_laws(spark, sf_dir):
    """On the fixture: ages are non-negative, cumulative revenue is
    non-decreasing within a cohort, age-0 exists for every cohort
    (the first order IS the cohort event), and the triangle's total
    equals total order revenue in exact cents."""
    from kinesis_stream_video_project_spark import io
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long
    from kinesis_stream_video_project_spark.plans.queries_round16 import (
        _ltv_cohort_revenue,
    )

    out = _ltv_cohort_revenue(spark, sf_dir).toPandas()
    assert (out["age_q"] >= 0).all()
    for _, g in out.sort_values("age_q").groupby("cohort_q"):
        assert g["age_q"].iloc[0] == 0
        assert g["cum_rev_cents"].is_monotonic_increasing
    total = (
        io.load_table(spark, sf_dir, "orders")
        .agg(F.sum(scaled_long(F.col("o_totalprice"), 100)))
        .collect()[0][0]
    )
    assert out["rev_cents"].sum() == total


def test_reconciliation_measured_finding(spark, sf_dir):
    """The audit's honest result on this fixture: the generator draws
    o_totalprice independently of lineitems, so ZERO orders reconcile
    within a cent and some orders have no lineitems at all (probed at
    sf0.01: 0/14743 reconciled, 257 line-less, median gap ≈ $138k) —
    a failing invariant is a RESULT, not a bug in the audit."""
    from kinesis_stream_video_project_spark.plans.queries_round16 import (
        _order_total_reconciliation,
    )

    out = _order_total_reconciliation(spark, sf_dir).toPandas()
    assert out["n_reconciled"].sum() == 0
    assert out["n_no_lines"].sum() > 0
    assert (out["total_gap_cents"] > 0).all()


def test_reconciliation_detects_clean_order(spark):
    """Synthetic clean case: an order whose single line recomputes to
    exactly the stated total reconciles; a dirty one does not; a
    line-less one counts in n_no_lines."""
    import datetime as dt
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round16 as r16

    orders = spark.createDataFrame(
        [
            (1, 1, "O", 110.0, dt.datetime(1995, 1, 1), "x"),
            (2, 1, "O", 999.0, dt.datetime(1995, 1, 1), "x"),
            (3, 1, "O", 50.0, dt.datetime(1995, 1, 1), "x"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(1, 100.0, 0.0, 0.10), (2, 100.0, 0.0, 0.0)],
        "l_orderkey long, l_extendedprice double, l_discount double,"
        " l_tax double",
    )

    def fake_load(_s, _d, table):
        return {"orders": orders, "lineitem": li}[table]

    with mock.patch.object(r16.io, "load_table", fake_load):
        row = r16._order_total_reconciliation(spark, "unused").collect()[0]
    assert (row["n_orders"], row["n_no_lines"], row["n_reconciled"]) == (3, 1, 1)
    assert row["max_gap_cents"] == 89900  # order 2: stated 999, lines 100


def test_abc_handchecked_and_laws(spark, sf_dir):
    """Synthetic: revenues [80, 15, 3, 2] → the first part alone is
    exactly 80% (A), the second reaches 95% (B), the tail is C. On the
    fixture: classes partition all parts, shares sum to ~1000‰, and A
    holds STRICTLY LESS than 80% of the parts (with desc ordering the
    richest parts reach the 80% revenue line first). Measured finding:
    this generator's part revenues are near-UNIFORM — A holds ~78% of
    parts, not the textbook Pareto 20%; the classifier measures the
    concentration, it does not assume it."""
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round16 as r16

    li = spark.createDataFrame(
        [(1, 80.0), (2, 15.0), (3, 3.0), (4, 2.0)],
        "l_partkey long, l_extendedprice double",
    )
    with mock.patch.object(r16.io, "load_table", lambda *_a: li):
        got = {
            r["abc_class"]: (r["n_parts"], r["share_permille"])
            for r in r16._abc_part_classes(spark, "unused").collect()
        }
    assert got == {"A": (1, 800), "B": (1, 150), "C": (2, 50)}

    out = r16._abc_part_classes(spark, sf_dir).toPandas()
    assert set(out["abc_class"]) == {"A", "B", "C"}
    assert 998 <= out["share_permille"].sum() <= 1000  # DIV truncation
    by = out.set_index("abc_class")
    assert by.loc["A", "n_parts"] < 0.8 * out["n_parts"].sum()


def test_mmr_fold_prefers_diversity():
    """rel: d1=0.9, d2=0.89, d3=0.5; sim(d1,d2)=1.0 (near-duplicates),
    sim(·,d3)=0. Greedy at λ=0.5: step1 = d1 (0.9); step2 = d3 (0.5
    beats d2's 0.89 − 0.5·1.0 = 0.39 — diversity beats raw rank);
    step3 = d2 at 0.39."""
    from kinesis_stream_video_project_spark.operators.mmr import mmr_fold

    rel = [(1, None, 0.9, "r"), (2, None, 0.89, "r"), (3, None, 0.5, "r")]
    sims = []
    s = {(1, 2): 1.0, (1, 3): 0.0, (2, 3): 0.0}
    for (i, j), v in s.items():
        sims += [(i, j, v, "s"), (j, i, v, "s")]
    pdf = pd.DataFrame(rel + sims, columns=["i", "j", "v", "kind"])
    pdf["k_select"], pdf["lam"] = 3, 0.5
    out = mmr_fold(pdf)
    got = list(zip(out["step"], out["vec_id"], out["mmr_score"]))
    assert got == [(1, 1, 0.9), (2, 3, 0.5), (3, 2, 0.39)]


def test_mmr_lambda_zero_is_pure_relevance(spark, sf_dir):
    """λ = 0 removes the penalty: the selection equals the cosine top-10
    in rank order — MMR degrades to the relevance tier exactly."""
    from kinesis_stream_video_project_spark import io
    from kinesis_stream_video_project_spark.operators import similarity as sim
    from kinesis_stream_video_project_spark.operators.mmr import mmr_topk

    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select("embedding")
    corpus = e.filter(F.col("vec_id") != 0)
    got = [
        r["vec_id"]
        for r in mmr_topk(q, corpus, k_select=10, lam=0.0)
        .orderBy("step")
        .collect()
    ]
    qid = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    want = [
        r["vec_id"]
        for r in sim.cosine_topk(qid, e, k=10).orderBy("rank").collect()
    ]
    assert got == want


def test_mmr_fixture_laws_and_refusal(spark, sf_dir):
    """10 distinct selections; step-1 carries the maximum score (it is
    the unpenalized argmax — every later score is some rel' − pen ≤
    rel' ≤ rel₁); k_select > n_candidates refuses."""
    from kinesis_stream_video_project_spark.plans.queries_round16 import (
        _mmr_diverse_topk,
    )

    out = _mmr_diverse_topk(spark, sf_dir).toPandas()
    assert len(out) == 10 and out["vec_id"].nunique() == 10
    s1 = out.loc[out["step"] == 1, "mmr_score"].iloc[0]
    assert (out["mmr_score"] <= s1).all()

    from kinesis_stream_video_project_spark.operators.mmr import mmr_topk

    df = spark.createDataFrame([([1.0],)], "embedding array<double>")
    with pytest.raises(ValueError, match="k_select"):
        mmr_topk(df, df, n_candidates=5, k_select=6)


def test_quality_dup_calibration_laws(spark, sf_dir):
    """Deciles partition all documents into 10 near-equal bins (ntile
    law: sizes differ by at most 1), dup counts are bounded by bin
    sizes, and the doc total matches the corpus."""
    from kinesis_stream_video_project_spark import io
    from kinesis_stream_video_project_spark.plans.queries_round16 import (
        _quality_dup_calibration,
    )

    out = _quality_dup_calibration(spark, sf_dir).toPandas()
    assert sorted(out["decile"]) == list(range(1, 11))
    assert out["n_docs"].max() - out["n_docs"].min() <= 1
    assert (out["n_dups"] <= out["n_docs"]).all()
    total = io.load_table(spark, sf_dir, "documents").count()
    assert out["n_docs"].sum() == total


def test_growth_accounting_handchecked(spark):
    """User active on days 1, 2, 4: day1 new, day2 retained, day4
    resurrected; churned(day3) = 1 (active day2, silent day3) and
    churned(day5) would be 1 but day5 has no activity row — churn is
    attributed only to days that appear (stated by construction)."""
    import datetime as dt
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round16 as r16

    def ev(eid, day, uid):
        return (eid, dt.datetime(2025, 3, day, 12, 0), uid, "view", 1.0, None)

    rows = [ev(1, 1, 7), ev(2, 2, 7), ev(3, 4, 7), ev(4, 3, 9)]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with mock.patch.object(r16.io, "load_table", lambda *_a: events):
        got = {
            str(r["day"]): r
            for r in r16._growth_accounting_daily(spark, "unused").collect()
        }
    assert got["2025-03-01"]["n_new"] == 1 and got["2025-03-01"]["n_churned"] == 0
    assert got["2025-03-02"]["n_retained"] == 1
    assert got["2025-03-03"]["n_new"] == 1  # user 9
    assert got["2025-03-03"]["n_churned"] == 1  # user 7 went silent
    assert got["2025-03-04"]["n_resurrected"] == 1


def test_growth_accounting_identities(spark, sf_dir):
    """The ledger identities on real data: DAU = new + retained +
    resurrected per day, Σ new = distinct users ever active, and
    churned is non-negative and bounded by yesterday's DAU."""
    from kinesis_stream_video_project_spark import io
    from kinesis_stream_video_project_spark.plans.queries_round16 import (
        _growth_accounting_daily,
    )

    out = _growth_accounting_daily(spark, sf_dir).toPandas()
    assert (
        out["dau"] == out["n_new"] + out["n_retained"] + out["n_resurrected"]
    ).all()
    n_users = (
        io.load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .count()
    )
    assert out["n_new"].sum() == n_users
    assert (out["n_churned"] >= 0).all()


@pytest.mark.parametrize("sf", SFS)
def test_round16_module_entries_match_oracles(spark, sf):
    """Driver-style rendered-value check over every pre-wired r16 query
    — the lockstep gate, run at ALL THREE SFs."""
    from kinesis_stream_video_project_spark.plans import queries_round16 as q16

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    assert len(q16.QUERIES) == 6
    for name, fn in q16.QUERIES.items():
        got = fn(spark, sf).toPandas()
        want = con.sql(q16.ORACLES[name]).df()
        assert sorted(got.columns) == sorted(want.columns), name
        assert _rendered(got).equals(_rendered(want)), name
        assert len(got) > 0, name
