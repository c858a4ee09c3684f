"""Tests for the data-quality operators (column_profile / profile_drift /
exact_quantile / winsorize) — hand-checked frames, brute-force references,
and drift-flag semantics including schema drift."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators import profiling, stats


def test_column_profile_handchecked(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (3, "a", None), (4, None, 2.5)],
        "id int, s string, d double",
    )
    got = {
        r["col_name"]: (r["n_rows"], r["n_non_null"], r["n_distinct"])
        for r in profiling.column_profile(df).collect()
    }
    assert got == {
        "id": (4, 4, 4),
        "s": (4, 3, 2),
        "d": (4, 2, 2),
    }


def test_column_profile_matches_duckdb_on_documents(spark, sf_dir):
    import duckdb

    d = io.load_table(spark, sf_dir, "documents")
    got = {
        r["col_name"]: (r["n_rows"], r["n_non_null"], r["n_distinct"])
        for r in profiling.column_profile(
            d, ["doc_id", "lang", "source", "n_chars"]
        ).collect()
    }
    con = duckdb.connect()
    want = {}
    for c in ["doc_id", "lang", "source", "n_chars"]:
        want[c] = con.execute(
            f"SELECT COUNT(*), COUNT({c}), COUNT(DISTINCT CAST({c} AS VARCHAR))"
            f" FROM '{sf_dir}/documents.parquet'"
        ).fetchone()
    assert got == want


def test_profile_drift_flags_null_rate_shift_and_schema_drift(spark):
    a = spark.createDataFrame(
        [(i, "x" if i % 10 else None) for i in range(100)], "id int, s string"
    )
    # 20% nulls in b vs 10% in a → 10pp shift > default 5pp threshold
    b = spark.createDataFrame(
        [(i, "x" if i % 5 else None, 1.0) for i in range(100)],
        "id int, s string, extra double",
    )
    rows = {
        r["col_name"]: r
        for r in profiling.profile_drift(a, b, cols=["id", "s", "extra"]).collect()
    }
    assert rows["s"]["null_rate_shifted"] is True
    assert rows["id"]["null_rate_shifted"] is False
    # schema drift: `extra` exists only in b → a-side nulls; the shift
    # flag coalesces to False (one-sidedness IS the signal, and a null
    # boolean would render asymmetrically across engines)
    assert rows["extra"]["n_rows_a"] is None
    assert rows["extra"]["n_rows_b"] == 100
    assert rows["extra"]["null_rate_shifted"] is False
    # exact-rational cardinality ratio carried as integers
    assert rows["id"]["distinct_ratio_num"] == rows["id"]["distinct_ratio_den"]


def test_exact_quantile_and_winsorize_bruteforce(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 97, -40]
    df = spark.createDataFrame([(1, v) for v in vals], "g int, v long")

    def q_ref(xs, num, den):
        xs_sorted = sorted(xs)
        n = len(xs_sorted)
        cum = 0
        for val, w in sorted(Counter(xs_sorted).items()):
            cum += w
            if den * cum >= num * n:
                return val

    for num, den in [(1, 2), (1, 4), (95, 100), (1, 1), (5, 100)]:
        got = stats.exact_quantile(df, "g", "v", num, den).collect()[0]["q"]
        assert got == q_ref(vals, num, den), (num, den)
    lo, hi = q_ref(vals, 5, 100), q_ref(vals, 95, 100)
    wins = {
        tuple(r)
        for r in stats.winsorize(df, "g", "v")
        .select("v", "v_wins")
        .collect()
    }
    assert wins == {(v, min(max(v, lo), hi)) for v in vals}
    assert stats.exact_quantile(df, "g", "v", 1, 1).collect()[0]["q"] == 97


def test_exact_quantile_rejects_bad_fraction(spark):
    df = spark.createDataFrame([(1, 1)], "g int, v long")
    with pytest.raises(ValueError):
        stats.exact_quantile(df, "g", "v", 0, 2)
    with pytest.raises(ValueError):
        stats.exact_quantile(df, "g", "v", 3, 2)


def test_winsorize_tames_moments_but_preserves_bulk(spark, sf_dir):
    """On the real events table: winsorizing the scaled metric leaves the
    median untouched (bulk preserved) while the max collapses to the 95th
    percentile (tail tamed)."""
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long

    e = io.load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    df = e.select(
        "event_type", scaled_long(F.col("value"), 1000000).alias("vu")
    )
    w = stats.winsorize(df, "event_type", "vu")
    agg = (
        w.groupBy("event_type")
        .agg(F.max("vu").alias("mx"), F.max("vu_wins").alias("mxw"))
        .collect()
    )
    q95 = {
        r["event_type"]: r["q"]
        for r in stats.exact_quantile(df, "event_type", "vu", 95, 100).collect()
    }
    for r in agg:
        assert r["mxw"] == min(r["mx"], q95[r["event_type"]])
    med_raw = stats.exact_quantile(df, "event_type", "vu", 1, 2)
    med_wins = stats.exact_quantile(w, "event_type", "vu_wins", 1, 2)
    a = {r["event_type"]: r["q"] for r in med_raw.collect()}
    b = {r["event_type"]: r["q"] for r in med_wins.collect()}
    assert a == b


def test_exact_quantile_excludes_nulls(spark):
    """Nulls sort FIRST in Spark windows, so an unfiltered null row would
    inflate tw and shift every quantile downward — [1,2,3,NULL]'s median
    must be 2 (of the non-null values), not 1."""
    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (1, None)], "g int, v long"
    )
    assert stats.exact_quantile(df, "g", "v", 1, 2).collect()[0]["q"] == 2
    w = stats.winsorize(df, "g", "v", lo=(1, 4), hi=(3, 4))
    got = {r["v"]: r["v_wins"] for r in w.collect()}
    assert got == {1: 1, 2: 2, 3: 3, None: None}


def test_profile_drift_default_cols_is_schema_union(spark):
    """With cols unspecified, a column present in only one snapshot must
    STILL appear in the report (one-sided nulls) — an intersection
    default would hide exactly the schema drift the report exists for."""
    a = spark.createDataFrame([(1, "x")], "id int, only_a string")
    b = spark.createDataFrame([(1, 2.0)], "id int, only_b double")
    cols = {r["col_name"] for r in profiling.profile_drift(a, b).collect()}
    assert cols == {"id", "only_a", "only_b"}
