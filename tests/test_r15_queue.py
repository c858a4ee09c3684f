"""Round-15 queue: exact Shapley attribution, AMS F₂ sketch,
permutation test, Welch t², item-item CF — operator unit pins + the
module lockstep rendered-value gate (the queries_round11..14
discipline: the module stays consistent with operator-signature
changes every round until a driver window registers it)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.operators.ams import ams_f2_report
from kinesis_stream_video_project_spark.operators.bootstrap import (
    permutation_test_means,
)
from kinesis_stream_video_project_spark.operators.shapley import (
    shapley_attribution,
)
from kinesis_stream_video_project_spark.operators.stats import welch_t2_pairs

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _rendered(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Exact Shapley attribution
# ---------------------------------------------------------------------------


def test_shapley_handchecked(spark):
    """Masks {A}=1, {B}=1, {A,B}=1 (n=2, den=2): v(∅)=0, v(A)=1, v(B)=1,
    v(AB)=3; φ_A = [1·(1−0) + 1·(3−1)]/2 = 3/2 = φ_B; efficiency:
    Σφ = 3 = v(full) − v(∅)."""
    df = spark.createDataFrame([(1,), (2,), (3,)], "mask long")
    got = {
        r["channel"]: (r["phi_num"], r["phi_den"], r["phi"])
        for r in shapley_attribution(df, ["A", "B"]).collect()
    }
    assert got == {"A": (3, 2, 1.5), "B": (3, 2, 1.5)}


def test_shapley_efficiency_law_on_fixture(spark, sf_dir):
    """Σ phi_num = n! · (v(full) − v(∅)) on the real conversion masks —
    the efficiency axiom as an executable law; v_empty surfaces the
    unattributable cohort instead of hiding it."""
    from kinesis_stream_video_project_spark.plans.queries_round15 import (
        _shapley_channel_attribution,
    )

    rows = _shapley_channel_attribution(spark, sf_dir).collect()
    assert len(rows) == 4
    den = rows[0]["phi_den"]
    n_conv, v_empty = rows[0]["n_conv"], rows[0]["v_empty"]
    assert sum(r["phi_num"] for r in rows) == den * (n_conv - v_empty)
    assert all(r["phi_num"] >= 0 for r in rows)


def test_shapley_null_player_and_refusals(spark):
    """A channel never touched by any journey gets φ = 0 exactly (the
    null-player axiom); channel counts outside 1..12 refuse loudly."""
    df = spark.createDataFrame([(1,), (1,), (3,)], "mask long")
    got = {
        r["channel"]: r["phi_num"]
        for r in shapley_attribution(df, ["A", "B", "C"]).collect()
    }
    assert got["C"] == 0
    with pytest.raises(ValueError, match="1..12"):
        shapley_attribution(df, [f"c{i}" for i in range(13)])
    with pytest.raises(ValueError, match="1..12"):
        shapley_attribution(df, [])


def test_conversion_masks_exclude_purchase_instant(spark):
    """The mask window is STRICTLY before the first purchase: a click at
    exactly the purchase ts and a view after it contribute nothing; a
    signup before it does. A no-touch purchaser keeps mask 0."""
    import datetime as dt
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round15 as r15

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    def t(sec):
        return base + dt.timedelta(seconds=sec)

    rows = [
        (1, t(5), 10, "signup", 1.0, None),
        (2, t(10), 10, "purchase", 1.0, None),
        (3, t(10), 10, "click", 1.0, None),
        (4, t(20), 10, "view", 1.0, None),
        (5, t(0), 11, "purchase", 1.0, None),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with mock.patch.object(r15.io, "load_table", lambda *_a: events):
        masks = sorted(
            r["mask"] for r in r15._conversion_masks(spark, "unused").collect()
        )
    assert masks == [0, 4]  # user 11 no-touch; user 10 signup-only


# ---------------------------------------------------------------------------
# AMS F2 sketch
# ---------------------------------------------------------------------------


def test_ams_exact_f2_and_bounds(spark):
    """Exact side: keys [a,a,b] → F₂ = 2² + 1² = 5, n_keys = 2. Sketch
    side: each register is a ±1 sum, so f2_est ≤ n_rows² and ≥ 0."""
    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    row = ams_f2_report(df, "k").collect()[0]
    assert (row["n_rows"], row["n_keys"], row["f2_exact"]) == (3, 2, 5)
    assert 0 <= row["f2_est"] <= 9


def test_ams_estimate_within_band_on_fixture(spark, sf_dir):
    """Measured-error discipline: at every fixture SF the 16-register
    mean lands within ±50% of exact F₂ (block-digest family, measured
    1.21/0.61/0.89 at sf0.001/sf0.01/sf0.1; the √(2/16) ≈ 35% relative
    sd makes ±50% a meaningful pin for THIS hash family — a broken sign
    function lands near n_rows²/16, far outside)."""
    from kinesis_stream_video_project_spark import io

    li = io.load_table(spark, sf_dir, "lineitem")
    row = ams_f2_report(li, "l_partkey").collect()[0]
    assert 0.5 <= row["f2_est"] / row["f2_exact"] <= 1.5


def test_ams_refuses_bad_estimator_count(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="n_estimators"):
        ams_f2_report(df, "k", n_estimators=0)


# ---------------------------------------------------------------------------
# Deterministic permutation test
# ---------------------------------------------------------------------------


def test_permutation_separated_groups_reject(spark):
    """A=[1000]×10 vs B=[0]×10: only the two all-or-nothing relabelings
    reach D_obs, so n_ge ≈ 0 and p ≈ 1/201 — the test must reject."""
    rows = [("a", i, 1000) for i in range(10)] + [
        ("b", i + 10, 0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    r = permutation_test_means(df, "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"], r["mean_a"], r["mean_b"]) == (10, 10, 1000.0, 0.0)
    assert r["d_obs"] == 100000 and r["p_value"] <= 0.01


def test_permutation_identical_groups_accept_and_reproduce(spark):
    """All-equal values: every relabeling gives D_b = D_obs = 0, so
    n_ge = n_perm and p = 1.0; a second run is bit-identical (the md5
    determinism point)."""
    rows = [("a", i, 7) for i in range(8)] + [("b", i + 8, 7) for i in range(8)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    r1 = permutation_test_means(df, "a", "b", n_perm=50).collect()[0]
    r2 = permutation_test_means(df, "a", "b", n_perm=50).collect()[0]
    assert r1["d_obs"] == 0 and r1["n_ge"] == 50 and r1["p_value"] == 1.0
    assert tuple(r1) == tuple(r2)


def test_permutation_refusals(spark):
    df = spark.createDataFrame([("a", 1, 1)], "grp string, x long, y long")
    with pytest.raises(ValueError, match="distinct"):
        permutation_test_means(df, "a", "a")
    with pytest.raises(ValueError, match="n_perm"):
        permutation_test_means(df, "a", "b", n_perm=1)


# ---------------------------------------------------------------------------
# Welch t²
# ---------------------------------------------------------------------------


def test_welch_handchecked(spark):
    """a=[1,2,3], b=[7,9]: means 2/8, s²/n = 1/3 and 1 → t² = 36/(4/3)
    = 27; df = (4/3)² / ((1/3)²/2 + 1²/1) = 1.6842."""
    rows = [("a", 1), ("a", 2), ("a", 3), ("b", 7), ("b", 9)]
    df = spark.createDataFrame(rows, "grp string, y long")
    r = welch_t2_pairs(df).collect()[0]
    assert (r["g_a"], r["g_b"], r["n_a"], r["n_b"]) == ("a", "b", 3, 2)
    assert (r["t2"], r["df_welch"]) == (27.0, 1.6842)


def test_welch_drops_singletons_and_nulls_zero_variance(spark):
    """n=1 groups are dropped (no pair emitted for them); a pair of
    zero-variance groups emits NULL t² instead of dividing by zero."""
    rows = [
        ("solo", 5),
        ("c1", 4), ("c1", 4),
        ("c2", 9), ("c2", 9),
    ]
    df = spark.createDataFrame(rows, "grp string, y long")
    out = {(r["g_a"], r["g_b"]): r for r in welch_t2_pairs(df).collect()}
    assert set(out) == {("c1", "c2")}
    assert out[("c1", "c2")]["t2"] is None


# ---------------------------------------------------------------------------
# Item-item CF
# ---------------------------------------------------------------------------


def test_itemitem_handchecked(spark, sf_dir):
    """Orders {1:(A,B), 2:(A,B), 3:(A,C)} → n_A=3, n_B=2, n_C=1;
    co(A,B)=2 is the only pair at co ≥ 2; cos²(A,B) = 4/6 = 0.6667,
    symmetric from both seeds; C gets no recommendations."""
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round15 as r15

    li = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 100), (2, 200), (3, 100), (3, 300)],
        "l_orderkey long, l_partkey long",
    )
    with mock.patch.object(r15.io, "load_table", lambda *_a: li):
        rows = r15._itemitem_cosine_recs(spark, "unused").collect()
    got = {(r["seed_part"], r["nbr_part"]): r for r in rows}
    assert set(got) == {(100, 200), (200, 100)}
    assert got[(100, 200)]["cos2"] == 0.6667
    assert got[(100, 200)]["co_orders"] == 2 and got[(100, 200)]["rank"] == 1


def test_itemitem_structural_laws(spark, sf_dir):
    """On the fixture: ≤5 recs per seed with dense ranks from 1, no
    self-recommendation, co ≥ 2, and cos² ∈ (0, 1]."""
    from kinesis_stream_video_project_spark.plans.queries_round15 import (
        _itemitem_cosine_recs,
    )

    out = _itemitem_cosine_recs(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out["seed_part"] != out["nbr_part"]).all()
    assert (out["co_orders"] >= 2).all()
    assert ((out["cos2"] > 0) & (out["cos2"] <= 1)).all()
    for _, g in out.groupby("seed_part"):
        ranks = sorted(g["rank"])
        assert ranks == list(range(1, len(ranks) + 1)) and len(ranks) <= 5


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal
# ---------------------------------------------------------------------------


def test_hw_fold_locks_onto_pure_period():
    """A noiseless period-7 series: level locks at the mean, trend at 0,
    and forecast_next reproduces the cycle EXACTLY — including the wrap
    from the last pattern position back to the first."""
    from kinesis_stream_video_project_spark.operators.forecast import hw_fold

    pat = [100, 110, 120, 130, 140, 150, 160]
    pdf = pd.DataFrame(
        {"grp": ["s"] * 21, "step": range(1, 22), "xs": pat * 3}
    )
    out = hw_fold(pdf)
    tail = out[out["step"] >= 19].set_index("step")
    assert (tail["level_s"] == 130).all() and (tail["trend_s"] == 0).all()
    assert list(tail["forecast_next"]) == [150, 160, 100]


def test_hw_fold_short_group_emits_nothing_and_init_is_exact():
    """Groups under 7 points emit nothing; at exactly 7 the seed row is
    l = tdiv(Σx, 7), b = 0, season = x₇ − l, forecast = l + s₁."""
    from kinesis_stream_video_project_spark.operators.forecast import hw_fold

    pdf = pd.DataFrame(
        {
            "grp": ["short"] * 6 + ["full"] * 7,
            "step": list(range(1, 7)) + list(range(1, 8)),
            "xs": [5] * 6 + [10, 20, 30, 40, 50, 60, 100],
        }
    )
    out = hw_fold(pdf)
    assert (out["grp"] == "full").all() and len(out) == 1
    r = out.iloc[0]
    # l = 310 // 7 = 44; s7 = 100 - 44 = 56; s1 = 10 - 44 = -34
    assert (r["level_s"], r["trend_s"], r["season_s"]) == (44, 0, 56)
    assert r["forecast_next"] == 44 + 0 + (10 - 44)


def test_hw_beats_naive_on_truly_seasonal_series(spark):
    """On a seasonal+trend series (the regime the operator exists for)
    the HW one-step MAE beats seasonal-naive — the skill metric goes
    BELOW 1 (on the non-seasonal fixture it sits ≈1.1, stated in the
    query docstring)."""
    from kinesis_stream_video_project_spark.operators.forecast import hw_fold

    pat = [0, 100, 200, 300, 400, 500, 600]
    xs = [pat[i % 7] + 5 * i for i in range(70)]
    pdf = pd.DataFrame({"grp": ["s"] * 70, "step": range(1, 71), "xs": xs})
    out = hw_fold(pdf).set_index("step")
    e_hw, e_nv = 0, 0
    for t in range(7, 70):
        e_hw += abs(xs[t] - out.loc[t]["forecast_next"])
        e_nv += abs(xs[t] - xs[t - 7])
    assert e_hw < e_nv


# ---------------------------------------------------------------------------
# Kaplan-Meier survival
# ---------------------------------------------------------------------------


def test_km_handchecked(spark):
    """Durations/events (1,1),(2,1),(3,0),(4,1),(5,0): S(1)=4/5=0.8,
    S(2)=0.8·3/4=0.6, the censoring at 3 shrinks the risk set without a
    row, S(4)=0.6·1/2=0.3 — the textbook product-limit walk."""
    from kinesis_stream_video_project_spark.operators.survival import km_survival

    rows = [("g", 1, 1), ("g", 2, 1), ("g", 3, 0), ("g", 4, 1), ("g", 5, 0)]
    df = spark.createDataFrame(rows, "grp string, duration long, event long")
    got = [
        (r["t"], r["n_risk"], r["n_events"], r["survival"])
        for r in km_survival(df).orderBy("t").collect()
    ]
    assert got == [(1, 5, 1, 0.8), (2, 4, 1, 0.6), (4, 2, 1, 0.3)]


def test_km_tie_rule_censored_at_t_still_at_risk(spark):
    """A death and a censoring at the same t: the censored subject
    counts in n_risk at t (deaths precede censorings — the standard
    convention, stated in the docstring): S(2) = 1 − 1/3 = 0.6667."""
    from kinesis_stream_video_project_spark.operators.survival import km_survival

    rows = [("g", 2, 1), ("g", 2, 0), ("g", 3, 0)]
    df = spark.createDataFrame(rows, "grp string, duration long, event long")
    r = km_survival(df).collect()[0]
    assert (r["t"], r["n_risk"], r["n_events"], r["n_censored"]) == (2, 3, 1, 1)
    assert r["survival"] == 0.6667


def test_km_refuses_bad_event_flag(spark):
    from kinesis_stream_video_project_spark.operators.survival import km_survival

    df = spark.createDataFrame(
        [("g", 1, 2)], "grp string, duration long, event long"
    )
    with pytest.raises(Exception, match="event must be 0 or 1"):
        km_survival(df).collect()


def test_km_fixture_laws(spark, sf_dir):
    """On the real tenure data: per segment the curve is strictly
    positive, non-increasing in t, bounded by 1, and both deaths and
    censorings occur (the 12 h rule was CHOSEN because a 30-day rule
    censors everyone — measured, stated in the query docstring)."""
    from kinesis_stream_video_project_spark.plans.queries_round15 import (
        _km_user_tenure_by_segment,
    )

    out = _km_user_tenure_by_segment(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert ((out["survival"] > 0) & (out["survival"] <= 1)).all()
    assert (out["n_events"] > 0).all()
    for _, g in out.sort_values("t").groupby("c_mktsegment"):
        assert g["survival"].is_monotonic_decreasing
    assert out["n_censored"].sum() + out["n_events"].sum() <= out["n_risk"].max() * 5


# ---------------------------------------------------------------------------
# Hilbert curve layout audit
# ---------------------------------------------------------------------------


def _xy2d_ref(order_bits: int, x: int, y: int) -> int:
    """Independent Python reference of the canonical Hilbert xy2d walk
    (n-reflection variant) — the third implementation bridging the
    Spark stage chain and the generated SQL CTEs."""
    n = 1 << order_bits
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = n - 1 - x, n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_stages_match_reference_and_curve_laws(spark):
    """Exhaustive bits=5 grid: the Spark stage chain equals the Python
    reference on all 1024 cells, the index is a bijection onto
    [0, 1024), and consecutive indices are grid-adjacent (unit Manhattan
    step) — the property that DEFINES a Hilbert curve."""
    from kinesis_stream_video_project_spark.operators.layout import hilbert_stages

    bits, n = 5, 32
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    rows = hilbert_stages(df, "x", "y", bits, "hd").collect()
    assert all(r["hd"] == _xy2d_ref(bits, r["x"], r["y"]) for r in rows)
    cells = {r["hd"]: (r["x"], r["y"]) for r in rows}
    assert set(cells) == set(range(n * n))
    assert all(
        abs(cells[d][0] - cells[d + 1][0]) + abs(cells[d][1] - cells[d + 1][1])
        == 1
        for d in range(n * n - 1)
    )


def test_curve_audit_hilbert_ties_zorder_on_aligned_blocks(spark, sf_dir):
    """The measured aligned-quadrant equivalence (stated in the query
    docstring): at power-of-two block granularity Hilbert and Z-order
    touch the SAME number of blocks and read the SAME rows. Row-major is
    NOT asserted either way — it wins at sf0.001 (246 vs 580 rows read,
    the r10 zorder-audit finding: a tiny custkey range makes x-major
    clustering optimal) and loses 3.4× at sf0.1; the audit reports, the
    caller decides."""
    from kinesis_stream_video_project_spark.plans.queries_round15 import (
        _hilbert_locality_audit,
    )

    rows = {r["layout"]: r for r in _hilbert_locality_audit(spark, sf_dir).collect()}
    assert set(rows) == {"zorder", "hilbert", "rowmajor"}
    assert rows["hilbert"]["n_rows_read"] == rows["zorder"]["n_rows_read"]
    assert (
        rows["hilbert"]["n_blocks_touched"] == rows["zorder"]["n_blocks_touched"]
    )


def test_hilbert_prefix_property(spark):
    """The truncated walk's top bits equal the full walk's: at bits=7,
    a 4-level partial index >> 6 equals the full index >> 6 for every
    cell — the property that lets the audit compute 8-bit blocks with
    4 of 14 levels."""
    from kinesis_stream_video_project_spark.operators.layout import hilbert_stages

    bits, n = 7, 128
    df = spark.createDataFrame(
        [(x, y) for x in range(0, n, 3) for y in range(0, n, 3)],
        "x long, y long",
    )
    full = hilbert_stages(df, "x", "y", bits, "hd_full")
    both = hilbert_stages(full, "x", "y", bits, "hd_part", levels=4)
    bad = both.filter(
        F.shiftright("hd_full", 6) != F.shiftright("hd_part", 6)
    ).count()
    assert bad == 0
    with pytest.raises(ValueError, match="levels"):
        hilbert_stages(df, "x", "y", bits, "hd", levels=0)


def test_curve_audit_refuses_out_of_range(spark):
    from kinesis_stream_video_project_spark.operators.layout import (
        curve_locality_audit,
    )

    df = spark.createDataFrame([(1 << 14, 1)], "x long, y long")
    with pytest.raises(Exception, match="outside"):
        curve_locality_audit(df, "x", "y", 0, 10, 10, 5).collect()


# ---------------------------------------------------------------------------
# Log-rank test
# ---------------------------------------------------------------------------


def test_logrank_handchecked_two_groups(spark):
    """A: (1,†),(2,†); B: (2,†),(3,censored). t=1: n=4, n1A=2, d=1 →
    oe_A = 0.5, v = 1·2·2·3/48 = 0.25. t=2: n=3, n1A=1, d=2 →
    oe_A = 1/3, v = 2·1·2·1/18 = 2/9. Σoe_A = 0.8333, Σv = 0.4722,
    χ² = 1.4706; B is the exact mirror (Σoe_B = −Σoe_A, same χ²) —
    the two-group antisymmetry."""
    from kinesis_stream_video_project_spark.operators.survival import (
        logrank_vs_rest,
    )

    rows = [("A", 1, 1), ("A", 2, 1), ("B", 2, 1), ("B", 3, 0)]
    df = spark.createDataFrame(rows, "grp string, duration long, event long")
    got = {r["grp"]: r for r in logrank_vs_rest(df).collect()}
    a, b = got["A"], got["B"]
    assert (a["n_deaths"], b["n_deaths"]) == (2, 1)
    assert (a["sum_oe"], a["sum_v"], a["chi2"]) == (0.8333, 0.4722, 1.4706)
    assert (b["sum_oe"], b["sum_v"], b["chi2"]) == (-0.8333, 0.4722, 1.4706)


def test_logrank_fixture_laws(spark, sf_dir):
    """vs-rest closure: per death time Σ_g (d1 − d·n1/n) = 0, so the
    r4-rounded sum_oe column sums to ~0 across segments; χ² ≥ 0; per-
    group deaths sum to the cohort's total churn count."""
    from kinesis_stream_video_project_spark.plans.queries_round15 import (
        _logrank_tenure_by_segment,
        _tenure_subjects,
    )

    out = _logrank_tenure_by_segment(spark, sf_dir).toPandas()
    n_segments = (
        _tenure_subjects(spark, sf_dir)
        .select("c_mktsegment")
        .distinct()
        .count()
    )
    assert len(out) == n_segments  # 4 at sf0.001 (15 users), 5 above
    assert abs(out["sum_oe"].sum()) <= 0.001
    assert (out["chi2"].dropna() >= 0).all()
    total_events = (
        _tenure_subjects(spark, sf_dir).agg(F.sum("event")).collect()[0][0]
    )
    assert out["n_deaths"].sum() == total_events


# ---------------------------------------------------------------------------
# Markov transition model
# ---------------------------------------------------------------------------


def test_markov_matrix_handchecked(spark):
    """Sequence view→click→purchase→view→click (one user): cells
    (v,c)=2, (c,p)=1, (p,v)=1; V=3 observed next types; row 'view' has
    rt=2 so P(click|view) = (2+1)/(2+3) = 0.6 exactly."""
    import datetime as dt
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round15 as r15

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    seq = ["view", "click", "purchase", "view", "click"]
    rows = [
        (i, base + dt.timedelta(seconds=i), 1, ty, 1.0, None)
        for i, ty in enumerate(seq)
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with mock.patch.object(r15.io, "load_table", lambda *_a: events):
        got = {
            (r["prev_ty"], r["next_ty"]): r
            for r in r15._markov_transition_matrix(spark, "unused").collect()
        }
    assert set(got) == {("view", "click"), ("click", "purchase"), ("purchase", "view")}
    r = got[("view", "click")]
    assert (r["c"], r["p_num"], r["p_den"], r["p"]) == (2, 3, 5, 0.6)


def test_markov_matrix_smoothing_law_on_fixture(spark, sf_dir):
    """Laplace closure: per prev row, Σ_observed p_num + (V − n_observed)
    · 1 = p_den — the smoothed distribution sums to exactly 1 over all V
    types (unobserved cells implicitly carry p_num = 1)."""
    from kinesis_stream_video_project_spark.plans.queries_round15 import (
        _markov_transition_matrix,
    )

    out = _markov_transition_matrix(spark, sf_dir).toPandas()
    v = out["next_ty"].nunique()
    for prev, g in out.groupby("prev_ty"):
        den = g["p_den"].iloc[0]
        assert (g["p_den"] == den).all()
        assert g["p_num"].sum() + (v - len(g)) == den, prev


def test_markov_backtest_laws(spark, sf_dir):
    """Temporal holdout: n_correct and n_majority are bounded by n_test,
    accuracies are their exact r4 ratios, and the Markov predictor is at
    least as good as majority-class on this fixture (per-prev argmax can
    only refine the global argmax when transitions carry signal; equal
    when they don't — both outcomes are valid, the INVARIANT is
    accuracy >= 0 and the columns agree)."""
    from kinesis_stream_video_project_spark.plans.queries_round15 import (
        _markov_backtest_accuracy,
    )

    r = _markov_backtest_accuracy(spark, sf_dir).collect()[0]
    assert 0 < r["n_test"]
    assert 0 <= r["n_correct"] <= r["n_test"]
    assert 0 <= r["n_majority"] <= r["n_test"]
    import math

    assert r["accuracy"] == math.floor(r["n_correct"] / r["n_test"] * 10000 + 0.5) / 10000


# ---------------------------------------------------------------------------
# Module lockstep gate (3 SFs)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_round15_module_entries_match_oracles(spark, sf):
    """Driver-style rendered-value check over every pre-wired r15 query
    — the lockstep gate, run at ALL THREE SFs."""
    from kinesis_stream_video_project_spark.plans import queries_round15 as q15

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    assert len(q15.QUERIES) == 12
    for name, fn in q15.QUERIES.items():
        got = fn(spark, sf).toPandas()
        want = con.sql(q15.ORACLES[name]).df()
        assert sorted(got.columns) == sorted(want.columns), name
        assert _rendered(got).equals(_rendered(want)), name
        assert len(got) > 0, name
