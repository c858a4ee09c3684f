"""Round-14 queue: SCD2 dimension build, Holt linear smoothing,
referential-integrity/coverage audit, IVF-ADC composed ANN — operator
unit pins + the module lockstep rendered-value gate (the
queries_round11/12/13 discipline: the module stays consistent with
operator-signature changes every round until a driver window registers
it)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators.forecast import holt_fold
from kinesis_stream_video_project_spark.operators.scd import scd2_history

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _rendered(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ---------------------------------------------------------------------------
# SCD2 history build (Kimball Type-2)
# ---------------------------------------------------------------------------

_CH_SCHEMA = "k long, op string, seq long, p string"


def test_scd2_handchecked(spark):
    """Key 1: I(a)@1, U(a)@2 collapsed (no-op), U(b)@3 opens v2 closing
    v1 at 3, D@4 closes v2, I(a)@5 reopens (delete breaks the collapse
    chain). Key 2: lone delete emits nothing."""
    rows = [
        (1, "I", 1, "a"),
        (1, "U", 2, "a"),
        (1, "U", 3, "b"),
        (1, "D", 4, None),
        (1, "I", 5, "a"),
        (2, "D", 1, None),
    ]
    df = spark.createDataFrame(rows, _CH_SCHEMA)
    got = {
        (r.k, r.p, r.valid_from, r.valid_to, r.is_current)
        for r in scd2_history(df, "k", "p").collect()
    }
    assert got == {
        (1, "a", 1, 3, False),
        (1, "b", 3, 4, False),
        (1, "a", 5, None, True),
    }


def test_scd2_null_payload_collapse_is_null_safe(spark):
    """Two consecutive NULL-payload updates collapse (eqNullSafe), and a
    NULL payload is a real version distinct from a non-NULL one."""
    rows = [(1, "I", 1, "a"), (1, "U", 2, None), (1, "U", 3, None)]
    df = spark.createDataFrame(rows, _CH_SCHEMA)
    got = {
        (r.p, r.valid_from, r.valid_to) for r in scd2_history(df, "k", "p").collect()
    }
    assert got == {("a", 1, 2), (None, 2, None)}


def test_scd2_refuses_duplicate_seq(spark):
    df = spark.createDataFrame(
        [(1, "I", 1, "a"), (1, "U", 1, "b")], _CH_SCHEMA
    )
    with pytest.raises(Exception, match="version order is ambiguous"):
        scd2_history(df, "k", "p").collect()


def test_scd2_refuses_unknown_op(spark):
    df = spark.createDataFrame([(1, "X", 1, "a")], _CH_SCHEMA)
    with pytest.raises(Exception, match="unknown op"):
        scd2_history(df, "k", "p").collect()


def test_scd2_versions_partition_cleanly(spark, sf_dir):
    """Structural laws on the real changelog: per key, intervals are
    disjoint and ordered (each valid_to equals some later version's
    valid_from or is NULL), and exactly zero-or-one open version per
    key."""
    from kinesis_stream_video_project_spark.plans.queries_round14 import (
        _scd2_customer_history,
    )

    out = _scd2_customer_history(spark, sf_dir).toPandas()
    by_key = out.sort_values(["c_custkey", "valid_from"]).groupby("c_custkey")
    for _, g in by_key:
        opens = g["is_current"].sum()
        assert opens <= 1
        closed = g[g["valid_to"].notna()]
        assert (closed["valid_to"] > closed["valid_from"]).all()


# ---------------------------------------------------------------------------
# Holt linear smoothing (all-integer recursion)
# ---------------------------------------------------------------------------


def test_holt_fold_handchecked():
    """xs = [10, 14, 20]: l1=10, b1=4; t2: l=(14+10+4)//2=14,
    b=(14-10+4)//2=4; t3: l=(20+14+4)//2=19, b=(19-14+4)//2=4."""
    pdf = pd.DataFrame(
        {"grp": ["a"] * 3, "step": [1, 2, 3], "xs": [10, 14, 20]}
    )
    out = holt_fold(pdf)
    got = list(
        zip(out["step"], out["level_s"], out["trend_s"], out["forecast_next"])
    )
    assert got == [(1, 10, 4, 14), (2, 14, 4, 18), (3, 19, 4, 23)]


def test_holt_fold_skips_short_series_and_matches_pandas_trend():
    """Singleton groups emit nothing; a perfectly linear series locks
    trend to the slope and forecast to the next point exactly (the
    forecaster sanity law)."""
    pdf = pd.DataFrame(
        {
            "grp": ["solo"] + ["lin"] * 5,
            "step": [1, 1, 2, 3, 4, 5],
            "xs": [7, 100, 110, 120, 130, 140],
        }
    )
    out = holt_fold(pdf)
    assert (out["grp"] == "lin").all()
    last = out[out["step"] == 5].iloc[0]
    assert last["trend_s"] == 10 and last["forecast_next"] == 150


def test_holt_fold_negative_values_truncate_like_duckdb():
    """tdiv (truncation toward zero) on a negative level delta — the
    CUSUM portability lesson: Python's // floors, DuckDB's // truncates;
    the fold must truncate."""
    pdf = pd.DataFrame(
        {"grp": ["n"] * 2, "step": [1, 2], "xs": [0, -3]}
    )
    out = holt_fold(pdf)
    # l1=0, b1=-3; t2: l=(-3+0-3)//2 -> tdiv(-6,2)=-3; b=tdiv(-3-0-3,2)=-3
    row = out[out["step"] == 2].iloc[0]
    assert row["level_s"] == -3 and row["trend_s"] == -3


# ---------------------------------------------------------------------------
# Referential-integrity / coverage audit
# ---------------------------------------------------------------------------


def test_ri_audit_fixture_laws(spark, sf_dir):
    """The generated fixture is referentially intact (zero orphans on
    every relation — the audit PASSING is the expected result; unlike
    real TPC-H the generator gives every customer an order, probed),
    and the reverse-coverage column is non-degenerate on the soft
    events->customer link (customers who never emitted an event)."""
    from kinesis_stream_video_project_spark.plans.queries_round14 import (
        _ri_coverage_audit,
    )

    rows = {r["relation"]: r for r in _ri_coverage_audit(spark, sf_dir).collect()}
    assert len(rows) == 9
    assert all(r["n_orphans"] == 0 for r in rows.values())
    assert rows["events->customer"]["n_unref_parents"] > 0


def test_ri_audit_counts_orphans_and_nulls(spark):
    """Synthetic relation with a NULL FK and a dangling FK: both count
    as orphans; unreferenced parents counted once each."""
    from kinesis_stream_video_project_spark.plans import queries_round14 as r14

    child = spark.createDataFrame(
        [(1,), (1,), (99,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    import unittest.mock as mock

    def fake_load(spark_, sf_dir_, table):
        return {"c": child, "p": parent}[table]

    with mock.patch.object(r14.io, "load_table", fake_load):
        with mock.patch.object(
            r14, "_RI_RELATIONS", (("c->p", "c", "fk", "p", "pk"),)
        ):
            row = r14._ri_coverage_audit(spark, "unused").collect()[0]
    assert (row["n_child"], row["n_orphans"], row["n_unref_parents"]) == (
        4,
        2,
        2,
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust slope
# ---------------------------------------------------------------------------


def test_theilsen_handchecked_and_robust(spark):
    """Points (0,0),(1,10),(2,20),(3,1000): OLS is dragged far above 10
    by the outlier; Theil-Sen's 6 pairwise slopes sorted by
    (slope, num, den) are [(10,1),(10,1),(20,2),(1000,3),(990,2),
    (980,1)] -> lower median (rank 3) is slope 10 as the exact
    rational (20, 2). Two-point group: its single pair IS the
    median."""
    from kinesis_stream_video_project_spark.operators.forecast import (
        theilsen_slope,
    )

    rows = [("a", 0, 0), ("a", 1, 10), ("a", 2, 20), ("a", 3, 1000),
            ("b", 0, 5), ("2", 2, 9)]
    rows = [r for r in rows if r[0] != "2"] + [("b", 2, 9)]
    df = spark.createDataFrame(rows, "grp string, x long, y long")
    got = {r["grp"]: (r["slope"], r["num"], r["den"], r["n_pairs"])
           for r in theilsen_slope(df).collect()}
    assert got["a"] == (10.0, 20, 2, 6)
    assert got["b"] == (2.0, 4, 2, 1)


# ---------------------------------------------------------------------------
# Deterministic percentile bootstrap
# ---------------------------------------------------------------------------


def test_bootstrap_ci_laws(spark, sf_dir):
    """Structural laws on the real weekly ledger: ci_lo <= mean <= ci_hi
    per group (a percentile interval of resampled means brackets the
    point estimate on this data), lo < hi at B=200, and the interval is
    REPRODUCIBLE (two runs identical - the whole point of md5-seeded
    resampling)."""
    from kinesis_stream_video_project_spark.plans.queries_round14 import (
        _bootstrap_weekly_ci,
    )

    rows = {r["grp"]: r for r in _bootstrap_weekly_ci(spark, sf_dir).collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert r["ci_lo"] <= r["mean_y"] <= r["ci_hi"]
        assert r["ci_lo"] < r["ci_hi"]
    again = {r["grp"]: r for r in _bootstrap_weekly_ci(spark, sf_dir).collect()}
    assert {k: tuple(v) for k, v in rows.items()} == {
        k: tuple(v) for k, v in again.items()
    }


def test_bootstrap_refusals(spark):
    from kinesis_stream_video_project_spark.operators.bootstrap import (
        bootstrap_mean_ci,
    )

    df = spark.createDataFrame([("a", 1)], "grp string, y long")
    with pytest.raises(ValueError, match="alpha_pct"):
        bootstrap_mean_ci(df, alpha_pct=60)
    with pytest.raises(ValueError, match="n_boot"):
        bootstrap_mean_ci(df, n_boot=1)


def test_bootstrap_degenerate_group_collapses(spark):
    """A group whose values are all identical gets a zero-width interval
    equal to the mean (every resample sums the same) - the sanity law
    that catches a broken draw join immediately."""
    from kinesis_stream_video_project_spark.operators.bootstrap import (
        bootstrap_mean_ci,
    )

    df = spark.createDataFrame(
        [("c", 7), ("c", 7), ("c", 7), ("c", 7)], "grp string, y long"
    )
    row = bootstrap_mean_ci(df, n_boot=20).collect()[0]
    assert (row["mean_y"], row["ci_lo"], row["ci_hi"]) == (7.0, 7.0, 7.0)


# ---------------------------------------------------------------------------
# IVF-ADC composed ANN
# ---------------------------------------------------------------------------


def test_ivfadc_recall_floor_beats_flat_pq(spark, sf_dir):
    """Quality contract of the composed tier: recall@10 vs the exact
    cosine tier >= the registered flat-PQ tier's 0.2 floor (measured
    0.50/0.28 at sf0.01/sf0.1 at the registered 8-cell/nprobe-4/8×256
    geometry vs flat PQ's 0.56/0.24 — residual PQ BEATS flat PQ at
    sf0.1 even while scanning only 4 of 8 cells, whose pruning alone
    caps recall at 0.66 there; an 8×16 codebook measured 0.20/0.08,
    which is why the registered geometry is 256)."""
    from kinesis_stream_video_project_spark.operators import similarity as sim

    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    adc = sim.ivfadc_topk(q, e, k=10).select("query_id", "vec_id")
    exact = sim.cosine_topk(q, e, k=10).select("query_id", "vec_id")
    assert adc.join(exact, ["query_id", "vec_id"], "left_semi").count() >= 10


# ---------------------------------------------------------------------------
# Module lockstep gate (3 SFs)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sf", SFS)
def test_round14_module_entries_match_oracles(spark, sf):
    """Driver-style rendered-value check over every pre-wired r14 query
    — the lockstep gate, run at ALL THREE SFs (the module was validated
    at 3 SFs before it was written; this keeps it true)."""
    from kinesis_stream_video_project_spark.plans import queries_round14 as q14

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    assert len(q14.QUERIES) == 9
    for name, fn in q14.QUERIES.items():
        got = fn(spark, sf).toPandas()
        want = con.sql(q14.ORACLES[name]).df()
        assert sorted(got.columns) == sorted(want.columns), name
        assert _rendered(got).equals(_rendered(want)), name
        assert len(got) > 0, name
