"""Round-13 queue: priority sampling, compaction planning, FastSS
edit-distance join, integer proportion z-test — operator unit pins +
the module lockstep rendered-value gate (the queries_round11/round12
discipline: the module stays consistent with operator-signature
changes every round until a driver window registers it)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.operators.editdist import (
    deletion_variants,
    fastss_pairs,
)
from kinesis_stream_video_project_spark.operators.layout import compaction_plan
from kinesis_stream_video_project_spark.operators.sampling import priority_sample
from kinesis_stream_video_project_spark.operators.stats import (
    proportion_ztest_vs_global,
)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _rendered(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Priority sampling (Duffield/Lund/Thorup JACM 2007, integer md5 form)
# ---------------------------------------------------------------------------


def test_priority_sample_is_mergeable(spark):
    """THE scale property: the top-k of the whole frame equals the
    merged top-k of any partitioning (priority is a pure row function;
    top-k is distributive) — sampled on 1 vs 16 partitions."""
    df = spark.createDataFrame(
        [(i, 1 + i % 7) for i in range(500)], "k long, w long"
    )
    one = priority_sample(df.coalesce(1), "k", F.col("w"), 32).collect()
    many = priority_sample(df.repartition(16), "k", F.col("w"), 32).collect()
    assert sorted(one) == sorted(many)
    assert len(one) == 32


def test_priority_sample_weight_monotone(spark):
    """Same md5 rank, larger weight => smaller priority => likelier to
    be sampled: duplicate each key's weight x100 in a second frame and
    check every priority shrank (integer DIV monotonicity)."""
    df = spark.createDataFrame([(i, 2) for i in range(100)], "k long, w long")
    p1 = {
        r["k"]: r["priority"]
        for r in priority_sample(df, "k", F.col("w"), 100).collect()
    }
    df2 = spark.createDataFrame(
        [(i, 200) for i in range(100)], "k long, w long"
    )
    p2 = {
        r["k"]: r["priority"]
        for r in priority_sample(df2, "k", F.col("w"), 100).collect()
    }
    assert all(p2[k] <= p1[k] for k in p1)


def test_priority_sample_grouped(spark):
    df = spark.createDataFrame(
        [(f"g{i % 3}", i, 1 + i % 5) for i in range(300)],
        "g string, k long, w long",
    )
    out = priority_sample(df, "k", F.col("w"), 4, group_col="g").toPandas()
    assert (out.groupby("g").size() == 4).all()


def test_priority_sample_refusals(spark):
    df = spark.createDataFrame([(1, 0)], "k long, w long")
    with pytest.raises(ValueError, match="k must be positive"):
        priority_sample(df, "k", F.col("w"), 0)
    with pytest.raises(Exception, match="non-positive or NULL weight"):
        priority_sample(df, "k", F.col("w"), 1).collect()


def test_priority_sample_refuses_null_weight(spark):
    """ADVICE r10: `w <= 0` is NULL (not true) for a NULL weight, so a
    NULL-weight row used to bypass the raise, take a NULL priority, and
    silently win every slot under ASC NULLS FIRST — the guard must
    refuse loudly, not sample silently."""
    df = spark.createDataFrame([(1, None), (2, 5)], "k long, w long")
    with pytest.raises(Exception, match="non-positive or NULL weight"):
        priority_sample(df, "k", F.col("w"), 1).collect()


# ---------------------------------------------------------------------------
# Sequential-fill compaction plan
# ---------------------------------------------------------------------------


def test_compaction_plan_handchecked(spark):
    """Sizes 60,60,60,100,250,10 into target-100 bins: cum-before
    0,60,120,180,280,530 -> bins 0,0,1,1,2,5 — the 250-byte file lands
    alone past its bin (planner never splits files; stated) and the
    trailing small file opens bin 5."""
    df = spark.createDataFrame(
        [("p", i, s) for i, s in enumerate([60, 60, 60, 100, 250, 10])],
        "part string, f long, sz long",
    )
    out = {
        r["bin"]: (r["n_files"], r["bin_bytes"])
        for r in compaction_plan(df, "part", "f", "sz", 100).collect()
    }
    assert out == {0: (2, 120), 1: (2, 160), 2: (1, 250), 5: (1, 10)}


def test_compaction_plan_conserves_bytes_and_order(spark):
    import random

    rnd = random.Random(7)
    rows = [
        (f"p{i % 4}", i, rnd.randrange(1, 5000)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "part string, f long, sz long")
    out = compaction_plan(df, "part", "f", "sz", 8000).toPandas()
    assert int(out["bin_bytes"].sum()) == sum(r[2] for r in rows)
    assert int(out["n_files"].sum()) == len(rows)
    # sequential fill: bins are contiguous file-id ranges per partition
    for _, g in out.groupby("partition"):
        g = g.sort_values("bin")
        assert (g["first_file"] <= g["last_file"]).all()
        assert (
            g["first_file"].iloc[1:].values > g["last_file"].iloc[:-1].values
        ).all()


def test_compaction_plan_refuses_bad_target(spark):
    df = spark.createDataFrame([("p", 1, 1)], "part string, f long, sz long")
    with pytest.raises(ValueError, match="target_bytes"):
        compaction_plan(df, "part", "f", "sz", 0)


# ---------------------------------------------------------------------------
# FastSS deletion-neighborhood edit-distance join
# ---------------------------------------------------------------------------


def test_fastss_completeness_vs_bruteforce(spark):
    """The blocking theorem end-to-end: pair set == definitional
    all-pairs levenshtein, d = 1 and d = 2, on a crafted vocabulary
    with substitutions, indels, a transposition (d = 2 under plain
    Levenshtein) and far-apart terms."""
    vocab = [
        "receive", "recieve", "kitten", "sitten", "sittin", "mitten",
        "fast", "hash", "cast", "castle", "category", "inventory",
    ]
    df = spark.createDataFrame([(t,) for t in vocab], "term string")
    con = duckdb.connect()
    con.sql("CREATE TABLE v(t VARCHAR)")
    con.executemany("INSERT INTO v VALUES (?)", [(t,) for t in vocab])
    for d in (1, 2):
        got = sorted(
            (r["term_a"], r["term_b"], r["dist"])
            for r in fastss_pairs(df, max_dist=d).collect()
        )
        want = sorted(
            tuple(r)
            for r in con.sql(
                "SELECT a.t, b.t, CAST(levenshtein(a.t, b.t) AS BIGINT)"
                " FROM v a JOIN v b ON a.t < b.t"
                f" WHERE levenshtein(a.t, b.t) BETWEEN 1 AND {d}"
                "   AND length(a.t) >= 4 AND length(b.t) >= 4"
            ).fetchall()
        )
        assert got == want, d
    assert ("receive", "recieve", 2) in got  # the transposition, at d=2


def test_fastss_min_len_filter(spark):
    df = spark.createDataFrame([("ab",), ("ac",), ("abcd",)], "term string")
    assert fastss_pairs(df, min_len=4).count() == 0
    assert fastss_pairs(df, min_len=2).count() == 1


def test_deletion_variants_refuses_d3():
    with pytest.raises(ValueError, match="max_dist"):
        deletion_variants("t", 3)


# ---------------------------------------------------------------------------
# Integer two-proportion z-test vs global
# ---------------------------------------------------------------------------


def test_ztest_handchecked(spark):
    """Global 120/1000. A 30/100: (30000-12000)^2 = 3.24e8 >
    4*120*880*100 = 4.224e7 -> fires. B 12/100 sits exactly on the
    global rate (diff = 0) -> not. C 78/800: (78000-96000)^2 = 3.24e8
    < 4*120*880*800 = 3.3792e8 -> not (a margin the float z-test puts
    at |z| ~ 1.96, i.e. genuinely near the boundary — the integer
    comparison decides it exactly)."""
    rows = (
        [("A", 1)] * 30 + [("A", 0)] * 70
        + [("B", 1)] * 12 + [("B", 0)] * 88
        + [("C", 1)] * 78 + [("C", 0)] * 722
    )
    df = spark.createDataFrame(rows, "g string, s int")
    out = {
        r["group"]: r["significant"]
        for r in proportion_ztest_vs_global(
            df, "g", F.col("s") == 1, F.lit(True)
        ).collect()
    }
    assert out == {"A": True, "B": False, "C": False}


def test_ztest_overflow_guard(spark):
    """Counts past the DECIMAL(38,0) exactness bound are refused
    loudly in-plan, not silently wrapped: success/trial are COLUMNS, so
    integer 'per-row counts' drive the aggregated totals past 10^19
    with four rows."""
    df = spark.createDataFrame([("A",)] * 4, "g string")
    big = proportion_ztest_vs_global(
        df, "g", F.lit(5 * 10**9), F.lit(10**10)
    )
    with pytest.raises(Exception, match="exactness bound"):
        big.collect()


@pytest.mark.parametrize("sf", SFS)
def test_round13_module_entries_match_oracles(spark, sf):
    """Driver-style rendered-value check over every pre-wired r13 query
    — the lockstep gate, run at ALL THREE SFs (the module was validated
    at 3 SFs before it was written; this keeps it true)."""
    from kinesis_stream_video_project_spark.plans import queries_round13 as q13

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    assert len(q13.QUERIES) == 7
    for name, fn in q13.QUERIES.items():
        got = fn(spark, sf).toPandas()
        want = con.sql(q13.ORACLES[name]).df()
        assert sorted(got.columns) == sorted(want.columns), name
        assert _rendered(got).equals(_rendered(want)), name
        assert len(got) > 0, name
