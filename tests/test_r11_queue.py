"""Round-11 registration queue, part 1: KMV bottom-k distinct sketch and
the γ=2 DDSketch-style log-bucket quantile sketch — pytest-verified with
validated DuckDB oracle shapes before registration (the
paste-don't-debug discipline, sixth round running)."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators import ddsketch, kmv

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _rendered(df_pandas):
    cols = sorted(df_pandas.columns)
    return (
        df_pandas[cols].astype(str).sort_values(cols).reset_index(drop=True)
    )


def _con(sf):
    con = duckdb.connect()
    for t in ("events", "customer", "orders"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def _py_rank(key) -> int:
    return int(hashlib.md5(str(key).encode()).hexdigest()[:12], 16)


# ---------------------------------------------------------------------------
# KMV distinct sketch (Bar-Yossef et al. 2002; Beyer et al. 2007)
# ---------------------------------------------------------------------------


def test_kmv_rank_portable(spark):
    """Ranks must equal both DuckDB's md5-substring derivation and the
    Python hashlib twin."""
    df = spark.createDataFrame([(42,), (7,), (123456789,)], "k long")
    got = {r["k"]: r["rank"] for r in df.select("k", kmv.kmv_rank(F.col("k")).alias("rank")).collect()}
    for k, rank in got.items():
        want_duck = duckdb.sql(
            f"SELECT ('0x' || substr(md5(CAST({k} AS VARCHAR)), 1, 12))::BIGINT"
        ).fetchone()[0]
        assert rank == want_duck == _py_rank(k), (k, rank, want_duck)


def test_kmv_bottomk_handchecked(spark):
    """k=3 over six keys in one group: the sketch is exactly the three
    smallest md5 ranks in rank order."""
    keys = [10, 11, 12, 13, 14, 15]
    df = spark.createDataFrame([("g", k) for k in keys], "grp string, k long")
    got = [
        (r["pos"], r["rank"])
        for r in kmv.kmv_bottomk(df, "k", "grp", k=3, n_salts=2)
        .orderBy("pos")
        .collect()
    ]
    want = sorted(_py_rank(k) for k in keys)[:3]
    assert got == [(i + 1, rank) for i, rank in enumerate(want)]


def test_kmv_rejects_degenerate_params(spark):
    df = spark.createDataFrame([("g", 1)], "grp string, k long")
    with pytest.raises(ValueError, match="kmv_bottomk"):
        kmv.kmv_bottomk(df, "k", "grp", k=1)
    with pytest.raises(ValueError, match="kmv_bottomk"):
        kmv.kmv_bottomk(df, "k", "grp", k=8, n_salts=0)


def test_kmv_merge_law(spark):
    """bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)) — the
    mergeability that makes the 100 TB map-side combine sound."""
    cust = io.load_table(spark, "/root/testdata/sf0.01", "customer")
    a = cust.filter(F.col("c_custkey") % 2 == 0)
    b = cust.filter(F.col("c_custkey") % 2 == 1)
    whole = kmv.kmv_bottomk(cust, "c_custkey", "c_nationkey", k=16)
    pa = kmv.kmv_bottomk(a, "c_custkey", "c_nationkey", k=16)
    pb = kmv.kmv_bottomk(b, "c_custkey", "c_nationkey", k=16)
    w = Window.partitionBy("c_nationkey").orderBy("rank")
    merged = (
        pa.select("c_nationkey", "rank")
        .union(pb.select("c_nationkey", "rank"))
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= 16)
        .select("c_nationkey", F.col("pos").cast("long").alias("pos"), "rank")
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


KMV_ORACLE = """
WITH d AS (SELECT DISTINCT c_nationkey, c_custkey FROM customer),
r AS (SELECT c_nationkey, c_custkey,
             ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12))::BIGINT AS rank
      FROM d),
b AS (SELECT c_nationkey, rank,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY rank, c_custkey) AS pos
      FROM r),
f AS (SELECT c_nationkey, COUNT(*) AS n_hashes, MAX(rank) AS kth_rank
      FROM b WHERE pos <= 32 GROUP BY 1),
e AS (SELECT c_nationkey, COUNT(*) AS exact_distinct FROM d GROUP BY 1),
j AS (SELECT e.c_nationkey, exact_distinct, n_hashes, kth_rank,
             CASE WHEN n_hashes < 32 THEN n_hashes
                  ELSE (31 * (1::BIGINT << 48)) // kth_rank END AS kmv_est
      FROM e JOIN f USING (c_nationkey))
SELECT c_nationkey, CAST(exact_distinct AS BIGINT) AS exact_distinct,
       CAST(n_hashes AS BIGINT) AS n_hashes, kth_rank,
       CAST(kmv_est AS BIGINT) AS kmv_est,
       CAST(kmv_est - exact_distinct AS BIGINT) AS err
FROM j
"""


@pytest.mark.parametrize("sf", SFS)
def test_kmv_oracle_shape_matches(spark, sf):
    cust = io.load_table(spark, sf, "customer")
    got = kmv.kmv_distinct_estimates(cust, "c_custkey", "c_nationkey", k=32).toPandas()
    con = _con(sf)
    want = con.sql(KMV_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf


@pytest.mark.parametrize(
    "sf,engaged", [(SFS[0], False), (SFS[1], True), (SFS[2], True)]
)
def test_kmv_estimator_regimes(spark, sf, engaged):
    """sf0.001 keeps every group under k (estimate exact by definition);
    sf>=0.01 fills every sketch and the probed relative error stays in
    [0.7, 1.5] at k=32 (measured — KMV stddev ~ n/sqrt(k-1) ≈ 0.18n)."""
    cust = io.load_table(spark, sf, "customer")
    rows = kmv.kmv_distinct_estimates(cust, "c_custkey", "c_nationkey", k=32).collect()
    assert len(rows) == 25
    for r in rows:
        if not engaged:
            assert r["n_hashes"] == r["exact_distinct"] < 32
            assert r["kmv_est"] == r["exact_distinct"] and r["err"] == 0
        else:
            assert r["n_hashes"] == 32
            ratio = r["kmv_est"] / r["exact_distinct"]
            assert 0.7 <= ratio <= 1.5, (r["c_nationkey"], ratio)


# ---------------------------------------------------------------------------
# DDSketch γ=2 log-bucket quantiles (Masson, Lee & Rindal, VLDB 2019)
# ---------------------------------------------------------------------------


def test_dd_bucket_handchecked(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (4,), (255,), (256,)], "v long")
    got = [r["b"] for r in df.select(ddsketch.dd_bucket(F.col("v")).alias("b")).orderBy("v").collect()]
    assert got == [0, 1, 1, 2, 7, 8]


def test_dd_sketch_refuses_below_one(spark):
    df = spark.createDataFrame([("g", 0)], "grp string, v long")
    with pytest.raises(Exception, match="no log2 bucket"):
        ddsketch.dd_sketch(df, "v", "grp").collect()


def test_dd_quantiles_handchecked(spark):
    """Eight values 1..8 in one group: n=8; q=500 → rank 4 → value 4 →
    bucket 2 → est 6; q=990 → rank 8 → value 8 → bucket 3 → est 12."""
    df = spark.createDataFrame([("g", v) for v in range(1, 9)], "grp string, v long")
    got = {
        r["q_permille"]: (r["n"], r["dd_est"])
        for r in ddsketch.dd_quantiles(df, "v", "grp", q_permille=(500, 990)).collect()
    }
    assert got == {500: (8, 6), 990: (8, 12)}


def test_dd_quantiles_rejects_bad_q(spark):
    df = spark.createDataFrame([("g", 1)], "grp string, v long")
    with pytest.raises(ValueError, match="q_permille"):
        ddsketch.dd_quantiles(df, "v", "grp", q_permille=(0,))


def test_dd_merge_cellwise(spark):
    """sketch(A ∪ B) == cell-wise sum of sketch(A) and sketch(B)."""
    orders = io.load_table(spark, "/root/testdata/sf0.01", "orders").select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    a = orders.filter(F.col("cents") % 2 == 0)
    b = orders.filter(F.col("cents") % 2 == 1)
    whole = ddsketch.dd_sketch(orders, "cents", "o_orderpriority")
    merged = (
        ddsketch.dd_sketch(a, "cents", "o_orderpriority")
        .union(ddsketch.dd_sketch(b, "cents", "o_orderpriority"))
        .groupBy("o_orderpriority", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


DD_ORACLE = """
WITH v AS (SELECT o_orderpriority,
                  CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
           FROM orders),
s AS (SELECT o_orderpriority, length(bin(cents)) - 1 AS bucket, COUNT(*) AS cnt
      FROM v GROUP BY 1, 2),
c AS (SELECT o_orderpriority, bucket,
             SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bucket) AS cum,
             SUM(cnt) OVER (PARTITION BY o_orderpriority) AS n
      FROM s),
p AS (SELECT o_orderpriority, bucket, cum, n, q
      FROM c, (SELECT UNNEST([500, 900, 990]) AS q)),
h AS (SELECT o_orderpriority, q, n, bucket,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority, q ORDER BY bucket) AS rn
      FROM p WHERE cum >= (q * n + 999) // 1000)
SELECT o_orderpriority, CAST(q AS BIGINT) AS q_permille, CAST(n AS BIGINT) AS n,
       CAST(CASE WHEN bucket = 0 THEN 1
                 ELSE 3::BIGINT << (bucket - 1) END AS BIGINT) AS dd_est
FROM h WHERE rn = 1
"""


@pytest.mark.parametrize("sf", SFS)
def test_dd_oracle_shape_matches(spark, sf):
    orders = io.load_table(spark, sf, "orders").select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    got = ddsketch.dd_quantiles(orders, "cents", "o_orderpriority").toPandas()
    con = _con(sf)
    want = con.sql(DD_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf


@pytest.mark.parametrize("sf", SFS)
def test_dd_containment_law(spark, sf):
    """The hard γ=2 bound: est / exact-disc-quantile ∈ (3/4, 3/2] for
    every (group, q) — the walk lands in the bucket holding the exact
    rank-ceil(q·n) element and estimates its arithmetic midpoint."""
    orders = io.load_table(spark, sf, "orders").select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    got = {
        (r["o_orderpriority"], r["q_permille"]): r["dd_est"]
        for r in ddsketch.dd_quantiles(orders, "cents", "o_orderpriority").collect()
    }
    con = _con(sf)
    exact = con.sql(
        """
        WITH v AS (SELECT o_orderpriority,
                          CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
                   FROM orders),
        r AS (SELECT o_orderpriority, cents,
                     ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY cents) AS rnk,
                     COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
              FROM v)
        SELECT o_orderpriority, q, MIN(cents) AS exact_q
        FROM r, (SELECT UNNEST([500, 900, 990]) AS q)
        WHERE rnk >= (q * n + 999) // 1000
        GROUP BY 1, 2
        """
    ).fetchall()
    assert len(exact) == len(got)
    for grp, q, exact_q in exact:
        ratio = got[(grp, q)] / exact_q
        assert 0.75 < ratio <= 1.5, (grp, q, ratio)


# ---------------------------------------------------------------------------
# Sweep-line interval concurrency (operators/intervals.py)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators import intervals  # noqa: E402


def test_concurrency_handchecked(spark):
    """Three intervals on one key: [d1,d3], [d2,d4], [d6,d6] — peak 2 on
    d2; the singleton re-raises to 1 after a 0 gap."""
    rows = [
        ("s", "2020-01-01", "2020-01-03"),
        ("s", "2020-01-02", "2020-01-04"),
        ("s", "2020-01-06", "2020-01-06"),
    ]
    df = spark.createDataFrame(rows, "k string, s string, e string")
    got = {
        str(r["d"]): r["concurrent"]
        for r in intervals.concurrency_by_day(df, "k", "s", "e").collect()
    }
    assert got == {
        "2020-01-01": 1,
        "2020-01-02": 2,
        "2020-01-04": 1,
        "2020-01-05": 0,
        "2020-01-06": 1,
        "2020-01-07": 0,
    }
    peak = intervals.peak_concurrency(df, "k", "s", "e", top=5).collect()
    assert [(r["rnk"], r["k"], r["peak_concurrent"], r["peak_day"]) for r in peak] == [
        (1, "s", 2, "2020-01-02")
    ]


def test_peak_concurrency_rejects_bad_top(spark):
    df = spark.createDataFrame([("s", "2020-01-01", "2020-01-02")], "k string, s string, e string")
    with pytest.raises(ValueError, match="top"):
        intervals.peak_concurrency(df, "k", "s", "e", top=0)


CONCURRENCY_ORACLE = """
WITH iv AS (SELECT l_suppkey AS k, CAST(l_shipdate AS DATE) AS s FROM lineitem),
b AS (SELECT k, s AS d, 1 AS delta FROM iv
      UNION ALL SELECT k, s + 8, -1 FROM iv),
g AS (SELECT k, d, SUM(delta) AS delta FROM b GROUP BY 1, 2),
c AS (SELECT k, d, SUM(delta) OVER (PARTITION BY k ORDER BY d) AS cum FROM g),
p AS (SELECT k, MAX(cum) AS peak FROM c GROUP BY 1),
f AS (SELECT c.k, p.peak, MIN(c.d) AS pd
      FROM c JOIN p ON c.k = p.k AND c.cum = p.peak GROUP BY 1, 2),
r AS (SELECT k, peak, pd, ROW_NUMBER() OVER (ORDER BY peak DESC, k) AS rnk FROM f)
SELECT CAST(rnk AS BIGINT) AS rnk, k AS l_suppkey,
       CAST(peak AS BIGINT) AS peak_concurrent,
       strftime(pd, '%Y-%m-%d') AS peak_day
FROM r WHERE rnk <= 20
"""


@pytest.mark.parametrize("sf", SFS)
def test_peak_concurrency_oracle_shape_matches(spark, sf):
    li = io.load_table(spark, sf, "lineitem").withColumn(
        "transit_end", F.date_add(F.to_date("l_shipdate"), 7)
    )
    got = intervals.peak_concurrency(
        li, "l_suppkey", "l_shipdate", "transit_end", top=20
    ).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = con.sql(CONCURRENCY_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf


def test_peak_concurrency_nondegenerate(spark):
    """Fixture probe: peaks must exceed 1 (overlap actually happens) and
    vary across the top-20 (the r3 empties-audit habit)."""
    li = io.load_table(spark, "/root/testdata/sf0.01", "lineitem").withColumn(
        "transit_end", F.date_add(F.to_date("l_shipdate"), 7)
    )
    rows = intervals.peak_concurrency(
        li, "l_suppkey", "l_shipdate", "transit_end", top=20
    ).collect()
    assert len(rows) == 20
    peaks = [r["peak_concurrent"] for r in rows]
    assert max(peaks) > 1 and len(set(peaks)) > 1


# ---------------------------------------------------------------------------
# Last-touch attribution (operators/funnel.py)
# ---------------------------------------------------------------------------

from datetime import datetime  # noqa: E402

from kinesis_stream_video_project_spark.operators.funnel import (  # noqa: E402
    attribution_last_touch,
)


def _ev(uid, sec, ty, eid, val=1.0):
    return (eid, datetime(2020, 1, 1, 0, 0, sec), uid, ty, val, "{}")


EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_attribution_handchecked(spark):
    """u1: click@1 then purchase@5 within horizon → click; u2: view@1,
    purchase@50 beyond 10 s horizon → none; u3: purchase@0 with no
    touch → none."""
    rows = [
        _ev(1, 1, "click", 10),
        _ev(1, 5, "purchase", 11, 2.5),
        _ev(2, 1, "view", 20),
        _ev(2, 50, "purchase", 21, 1.0),
        _ev(3, 0, "purchase", 30, 4.0),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        r["channel"]: (r["n_conversions"], r["sum_value_milli"])
        for r in attribution_last_touch(
            df, "purchase", ["click", "view", "signup"], horizon_s=10
        ).collect()
    }
    assert got == {"click": (1, 2500), "none": (2, 5000)}


def test_attribution_simultaneous_and_tie_rules(spark):
    """A touch AT the conversion timestamp is simultaneous (not
    sequenced — excluded by the RANGE frame); two touches sharing the
    winning µs credit the min-event_id channel."""
    rows = [
        _ev(1, 5, "click", 10),   # simultaneous with conversion -> ignored
        _ev(1, 2, "view", 11),
        _ev(1, 5, "purchase", 12, 1.0),
        _ev(2, 3, "view", 20),    # tie at sec 3: min event_id wins -> view
        _ev(2, 3, "click", 21),
        _ev(2, 7, "purchase", 22, 1.0),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        r["channel"]: r["n_conversions"]
        for r in attribution_last_touch(
            df, "purchase", ["click", "view"], horizon_s=100
        ).collect()
    }
    assert got == {"view": 2}


def test_attribution_rejects_conversion_as_channel(spark):
    df = spark.createDataFrame([_ev(1, 1, "click", 1)], EV_SCHEMA)
    with pytest.raises(ValueError, match="conversion_type"):
        attribution_last_touch(df, "click", ["click"], horizon_s=10)


ATTRIBUTION_ORACLE = """
WITH ev AS (SELECT user_id AS u, epoch_us(ts) AS us, event_type AS ty, event_id AS id,
                   CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vm,
                   event_type IN ('click', 'view', 'signup') AS is_ch
            FROM events),
t AS (SELECT u, us, arg_min(ty, id) AS channel FROM ev WHERE is_ch GROUP BY 1, 2),
w AS (SELECT u, us, ty, vm,
             MAX(CASE WHEN is_ch THEN us END) OVER
               (PARTITION BY u ORDER BY us
                RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS att
      FROM ev),
conv AS (SELECT u, us, vm,
                CASE WHEN us - att <= 86400::BIGINT * 1000000 THEN att END AS att
         FROM w WHERE ty = 'purchase'),
cr AS (SELECT COALESCE(t.channel, 'none') AS channel, conv.vm
       FROM conv LEFT JOIN t ON conv.u = t.u AND conv.att = t.us)
SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(SUM(vm) AS BIGINT) AS sum_value_milli
FROM cr GROUP BY 1
"""


@pytest.mark.parametrize("sf", SFS)
def test_attribution_oracle_shape_matches(spark, sf):
    ev = io.load_table(spark, sf, "events")
    got = attribution_last_touch(
        ev, "purchase", ["click", "view", "signup"], horizon_s=86400
    ).toPandas()
    con = _con(sf)
    want = con.sql(ATTRIBUTION_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    # both branches engaged: attributed channels AND 'none' present
    assert "none" in set(got["channel"]) and len(got) >= 4


# ---------------------------------------------------------------------------
# Readability (operators/lm.py) and char-class profile (operators/profiling.py)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators.lm import readability_report  # noqa: E402
from kinesis_stream_video_project_spark.operators.profiling import (  # noqa: E402
    char_class_profile,
)


def test_readability_handchecked(spark):
    """'the cat. it runs!' → W=4, S=2, SYL=4 →
    206835 - 4060//2 - 338400//4 = 120205."""
    df = spark.createDataFrame([(1, "the cat. it runs!")], "doc_id long, text string")
    r = readability_report(df).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (4, 2, 4)
    assert r["flesch_milli"] == 206835 - (1015 * 4) // 2 - (84600 * 4) // 4 == 120205


def test_readability_sentencefree_floor(spark):
    """No sentence marks → S floors at 1 (the fixture regime)."""
    df = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    r = readability_report(df).collect()[0]
    assert r["n_sentences"] == 1 and r["n_words"] == 2


READABILITY_ORACLE = """
WITH s AS (SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
  CAST(GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS BIGINT) AS n_sentences,
  CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT) AS n_syllables
FROM documents)
SELECT doc_id, n_words, n_sentences, n_syllables,
  CAST(206835 - (1015 * n_words) // n_sentences
       - (84600 * n_syllables) // n_words AS BIGINT) AS flesch_milli
FROM s
"""


@pytest.mark.parametrize("sf", SFS)
def test_readability_oracle_shape_matches(spark, sf):
    docs = io.load_table(spark, sf, "documents")
    got = readability_report(docs).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(READABILITY_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    # fixture regime: S==1 everywhere, but the score still varies
    assert set(got["n_sentences"]) == {1}
    assert got["flesch_milli"].nunique() > 10


def test_char_class_profile_handchecked(spark):
    """'{"k": 87}' → 9 chars: 2 digits, 1 alpha, 1 space, 5 other."""
    df = spark.createDataFrame([("a", '{"k": 87}')], "grp string, x string")
    r = char_class_profile(df, "x", "grp").collect()[0]
    assert (r["n_rows"], r["n_chars"]) == (1, 9)
    assert (
        r["digit_permille"],
        r["alpha_permille"],
        r["ws_permille"],
        r["other_permille"],
    ) == (1000 * 2 // 9, 1000 * 1 // 9, 1000 * 1 // 9, 1000 * 5 // 9)


CHAR_CLASS_ORACLE = """
WITH s AS (SELECT event_type,
  CAST(length(props) AS BIGINT) AS n,
  CAST(length(props) - length(regexp_replace(props, '[0-9]', '', 'g')) AS BIGINT) AS d,
  CAST(length(props) - length(regexp_replace(props, '[a-zA-Z]', '', 'g')) AS BIGINT) AS a,
  CAST(length(props) - length(regexp_replace(props, ' ', '', 'g')) AS BIGINT) AS w,
  CAST(length(props) - length(regexp_replace(props, '[^0-9a-zA-Z ]', '', 'g')) AS BIGINT) AS o
FROM events)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(n) AS BIGINT) AS n_chars,
       CAST((1000 * SUM(d)) // SUM(n) AS BIGINT) AS digit_permille,
       CAST((1000 * SUM(a)) // SUM(n) AS BIGINT) AS alpha_permille,
       CAST((1000 * SUM(w)) // SUM(n) AS BIGINT) AS ws_permille,
       CAST((1000 * SUM(o)) // SUM(n) AS BIGINT) AS other_permille
FROM s GROUP BY 1
"""


@pytest.mark.parametrize("sf", SFS)
def test_char_class_profile_oracle_shape_matches(spark, sf):
    ev = io.load_table(spark, sf, "events")
    got = char_class_profile(ev, "props", "event_type").toPandas()
    con = _con(sf)
    want = con.sql(CHAR_CLASS_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    # non-degenerate: digits present, classes differ
    assert (got["digit_permille"] > 0).all()
    assert (got["other_permille"] > 0).all()


# ---------------------------------------------------------------------------
# Iterative BPE trainer (operators/lm.py — Sennrich et al. 2016)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators.lm import bpe_train_merges  # noqa: E402


def _ref_bpe(words, n):
    """Python reference: get_stats (overlapping adjacent counts) +
    greedy-leftmost non-overlapping merge, (count desc, x, y) tie-break."""
    import collections

    vocab = collections.Counter(tuple(w) for w in words)
    merges = []
    for rank in range(1, n + 1):
        stats = collections.Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += c
        if not stats:
            break
        (x, y), cnt = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, x, y, cnt))
        nv = collections.Counter()
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] += c
        vocab = nv
    return merges


def test_bpe_train_matches_reference_fold(spark):
    """Crafted corpus exercising the run-overlap case ([a,a,a,a] must
    re-tokenize to [aa,aa], not [aa,a,a]) and a multi-char merge chain
    (h+e then t+he)."""
    corpus = ["aaaa aab the the the fast aaa", "aab aab key key the"]
    want = _ref_bpe(" ".join(corpus).split(" "), 4)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = [
        (r["merge_rank"], r["sym_x"], r["sym_y"], r["pair_count"])
        for r in bpe_train_merges(df, 4).orderBy("merge_rank").collect()
    ]
    assert got == want


def test_bpe_train_rejects_bad_n(spark):
    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train_merges(df, 0)
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train_merges(df, 9)


def _bpe_oracle(n_merges: int) -> str:
    parts = [
        """
WITH w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
           FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
           GROUP BY 1),
v1 AS (SELECT regexp_replace(word, '(.)', ' \\1 ', 'g') AS sym, wc FROM w)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f""",
s{i} AS (SELECT string_split(trim(sym), '  ') AS s, wc FROM v{i}),
p{i} AS (SELECT s[i] AS sym_x, s[i + 1] AS sym_y, wc
         FROM s{i}, LATERAL UNNEST(generate_series(1, len(s) - 1)) AS u(i)),
c{i} AS (SELECT sym_x, sym_y, CAST(SUM(wc) AS BIGINT) AS pair_count
         FROM p{i} GROUP BY 1, 2),
t{i} AS (SELECT sym_x, sym_y, pair_count FROM c{i}
         ORDER BY pair_count DESC, sym_x, sym_y LIMIT 1),
v{i + 1} AS (SELECT replace(sym, ' ' || t{i}.sym_x || '  ' || t{i}.sym_y || ' ',
                            ' ' || t{i}.sym_x || t{i}.sym_y || ' ') AS sym, wc
             FROM v{i}, t{i})"""
        )
    selects = [
        f"SELECT CAST({i} AS BIGINT) AS merge_rank, sym_x, sym_y, pair_count FROM t{i}"
        for i in range(1, n_merges + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


@pytest.mark.parametrize("sf", SFS)
def test_bpe_train_oracle_shape_matches(spark, sf):
    docs = io.load_table(spark, sf, "documents")
    got = bpe_train_merges(docs, 3).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(_bpe_oracle(3)).df()
    assert _rendered(got).equals(_rendered(want)), sf
    assert len(got) == 3  # non-degenerate: three real merges learned


# ---------------------------------------------------------------------------
# Statistical tests: chi-square independence + two-sample KS (operators/stats.py)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators.stats import (  # noqa: E402
    chi_square_cells,
    ks_two_sample,
)


def test_chi_square_handchecked(spark):
    """2x2 with obs a1b1=10, a1b2=20, a2b1=30, a2b2=40: n=100,
    cell (a1,b1): rt=30, ct=40 -> (10*100-1200)^2*1000 // (30*40*100)
    = 40000*1000 // 120000 = 333."""
    rows = (
        [("a1", "b1")] * 10 + [("a1", "b2")] * 20
        + [("a2", "b1")] * 30 + [("a2", "b2")] * 40
    )
    df = spark.createDataFrame(rows, "a string, b string")
    got = {
        (r["a"], r["b"]): (
            r["obs"], r["row_total"], r["col_total"], r["n"], r["contrib_milli"]
        )
        for r in chi_square_cells(df, "a", "b").collect()
    }
    assert got[("a1", "b1")] == (10, 30, 40, 100, 333)
    assert got[("a2", "b2")] == (40, 70, 60, 100, (40 * 100 - 4200) ** 2 * 1000 // (70 * 60 * 100))
    assert len(got) == 4


def test_chi_square_materializes_zero_cells(spark):
    """A never-observed (a,b) combo is a REAL cell with obs=0 and
    contribution 1000*rt*ct div n."""
    rows = [("x", "p")] * 3 + [("x", "q")] * 2 + [("y", "p")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    got = {
        (r["a"], r["b"]): (r["obs"], r["contrib_milli"])
        for r in chi_square_cells(df, "a", "b").collect()
    }
    assert got[("y", "q")] == (0, 1000 * 5 * 2 // 10)
    assert len(got) == 4


def test_chi_square_refuses_cell_blowup(spark):
    df = spark.createDataFrame([("a", "b"), ("c", "d")], "a string, b string")
    with pytest.raises(Exception, match="max_cells"):
        chi_square_cells(df, "a", "b", max_cells=2).collect()


def test_chi_square_tracks_float_statistic(spark):
    """Summed contrib_milli must sit within |cells| milli-units under the
    float chi-square (per-cell floor) on the fixture pair."""
    orders = io.load_table(spark, "/root/testdata/sf0.01", "orders")
    cells = chi_square_cells(orders, "o_orderpriority", "o_orderstatus").collect()
    got_milli = sum(r["contrib_milli"] for r in cells)
    f = sum(
        (r["obs"] - r["row_total"] * r["col_total"] / r["n"]) ** 2
        / (r["row_total"] * r["col_total"] / r["n"])
        for r in cells
    )
    assert 0 <= f * 1000 - got_milli <= len(cells), (got_milli, f * 1000)


CHI2_ORACLE = """
WITH l AS (SELECT o_orderpriority AS a, o_orderstatus AS b,
                  CAST(COUNT(*) AS BIGINT) AS obs FROM orders GROUP BY 1, 2),
r AS (SELECT a, SUM(obs) AS rt FROM l GROUP BY 1),
c AS (SELECT b, SUM(obs) AS ct FROM l GROUP BY 1),
t AS (SELECT SUM(obs) AS n FROM l),
x AS (SELECT r.a, c.b, COALESCE(l.obs, 0) AS obs, rt, ct, n
      FROM r CROSS JOIN c CROSS JOIN t
      LEFT JOIN l ON l.a = r.a AND l.b = c.b)
SELECT a AS o_orderpriority, b AS o_orderstatus, CAST(obs AS BIGINT) AS obs,
       CAST(rt AS BIGINT) AS row_total, CAST(ct AS BIGINT) AS col_total,
       CAST(n AS BIGINT) AS n,
       CAST((1000 * CAST(obs * n - rt * ct AS HUGEINT)
                  * CAST(obs * n - rt * ct AS HUGEINT))
            // (CAST(rt AS HUGEINT) * ct * n) AS BIGINT) AS contrib_milli
FROM x
"""


@pytest.mark.parametrize("sf", SFS)
def test_chi_square_oracle_shape_matches(spark, sf):
    orders = io.load_table(spark, sf, "orders")
    got = chi_square_cells(orders, "o_orderpriority", "o_orderstatus").toPandas()
    con = _con(sf)
    want = con.sql(CHI2_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    assert len(got) >= 10  # priorities x statuses, zero cells included


def test_ks_handchecked(spark):
    """g1 = {1,2}, g2 = {2,3,4}: ledger walk gives max |cum1*n2-cum2*n1|
    at v=2: |2*3 - 1*2| = 4 -> permille = 4000 // 6 = 666."""
    rows = [("g1", 1.0), ("g1", 2.0), ("g2", 2.0), ("g2", 3.0), ("g2", 4.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_two_sample(df, "v", "g", "g1", "g2").collect()[0]
    assert (r["n1"], r["n2"], r["d_scaled"], r["ks_permille"]) == (2, 3, 4, 666)


def test_ks_identical_samples_zero(spark):
    rows = [("a", float(v)) for v in range(5)] + [("b", float(v)) for v in range(5)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = ks_two_sample(df, "v", "g", "a", "b").collect()[0]
    assert r["d_scaled"] == 0 and r["ks_permille"] == 0


KS_ORACLE = """
WITH v AS (SELECT value AS v,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
           FROM events WHERE event_type IN ('purchase', 'click')),
l AS (SELECT v, SUM(g1) AS c1, COUNT(*) - SUM(g1) AS c2 FROM v GROUP BY 1),
c AS (SELECT SUM(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum1,
             SUM(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum2
      FROM l),
t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM l)
SELECT n1, n2, CAST(MAX(ABS(cum1 * n2 - cum2 * n1)) AS BIGINT) AS d_scaled,
       CAST((1000 * MAX(ABS(cum1 * n2 - cum2 * n1))) // (n1 * n2) AS BIGINT)
         AS ks_permille
FROM c, t GROUP BY n1, n2
"""


@pytest.mark.parametrize("sf", SFS)
def test_ks_oracle_shape_matches(spark, sf):
    ev = io.load_table(spark, sf, "events")
    got = ks_two_sample(ev, "value", "event_type", "purchase", "click").toPandas()
    con = _con(sf)
    want = con.sql(KS_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    assert len(got) == 1


# ---------------------------------------------------------------------------
# Distributional audits: Mann-Whitney U, Benford, Gini (operators/stats.py)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators.stats import (  # noqa: E402
    benford_deviation,
    gini_concentration,
    mann_whitney_u,
)


def test_mann_whitney_handchecked(spark):
    """g1={1,2}, g2={2,3,4}: U1 = 0.5 (one tie pair) -> u1_x2=1,
    u2_x2=11, auc = 1000*1 // 12 = 83."""
    rows = [("g1", 1.0), ("g1", 2.0), ("g2", 2.0), ("g2", 3.0), ("g2", 4.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = mann_whitney_u(df, "v", "g", "g1", "g2").collect()[0]
    assert (r["n1"], r["n2"], r["u1_x2"], r["u2_x2"], r["auc_permille"]) == (
        2, 3, 1, 11, 83,
    )


def test_mann_whitney_matches_bruteforce():
    """Hypothesis pin: the doubled ledger statistic equals brute-force
    pair counting (2 per win + 1 per tie) and the U identity holds."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        a=st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=12),
        b=st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=12),
    )
    def run(a, b):
        import collections

        pooled = sorted(collections.Counter([(x, 1) for x in a] + [(x, 0) for x in b]).items())
        # ledger replay of the operator's arithmetic
        ledger = {}
        for (v, is1), c in pooled:
            c1, c2 = ledger.get(v, (0, 0))
            ledger[v] = (c1 + (c if is1 else 0), c2 + (0 if is1 else c))
        m, r1x2 = 0, 0
        for v in sorted(ledger):
            c1, c2 = ledger[v]
            r1x2 += c1 * (2 * m + c1 + c2 + 1)
            m += c1 + c2
        u1 = r1x2 - len(a) * (len(a) + 1)
        brute = sum(2 for x in a for y in b if x > y) + sum(
            1 for x in a for y in b if x == y
        )
        assert u1 == brute
        assert u1 + (2 * len(a) * len(b) - u1) == 2 * len(a) * len(b)

    run()


MWU_ORACLE = """
WITH v AS (SELECT value AS v,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g1
           FROM events WHERE event_type IN ('purchase', 'click')),
l AS (SELECT v, SUM(g1) AS c1, COUNT(*) - SUM(g1) AS c2 FROM v GROUP BY 1),
wk AS (SELECT c1, c2,
              COALESCE(SUM(c1 + c2) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS m
       FROM l),
s AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2,
             SUM(CAST(c1 * (2 * m + c1 + c2 + 1) AS HUGEINT)) AS r1x2
      FROM wk)
SELECT n1, n2,
       CAST(r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1) AS BIGINT) AS u1_x2,
       CAST(2 * CAST(n1 AS HUGEINT) * n2
            - (r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1)) AS BIGINT) AS u2_x2,
       CAST((1000 * (r1x2 - CAST(n1 AS HUGEINT) * (n1 + 1)))
            // (2 * n1 * n2) AS BIGINT) AS auc_permille
FROM s
"""


@pytest.mark.parametrize("sf", SFS)
def test_mann_whitney_oracle_shape_matches(spark, sf):
    ev = io.load_table(spark, sf, "events")
    got = mann_whitney_u(ev, "value", "event_type", "purchase", "click").toPandas()
    con = _con(sf)
    want = con.sql(MWU_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf


def test_benford_handchecked(spark):
    """cents of [1.00, 1.99, 23.00, 9.11]: digits 1,1,2,9 -> digit 1
    observed 500 milli vs expected 301 -> deviation +199."""
    df = spark.createDataFrame(
        [(1.00,), (1.99,), (23.00,), (9.11,)], "v double"
    )
    got = {r["digit"]: r for r in benford_deviation(df, "v").collect()}
    assert len(got) == 9
    assert got[1]["n_d"] == 2 and got[1]["observed_milli"] == 500
    assert got[1]["deviation_milli"] == 500 - 301
    assert got[3]["n_d"] == 0 and got[3]["observed_milli"] == 0
    assert got[3]["deviation_milli"] == -125


def test_benford_refuses_subscale_values(spark):
    df = spark.createDataFrame([(0.001,)], "v double")
    with pytest.raises(Exception, match="no first significant digit"):
        benford_deviation(df, "v").collect()


BENFORD_ORACLE = """
WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100.0 + 0.5)
                    AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit FROM orders),
o AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_d FROM d GROUP BY 1),
e AS (SELECT * FROM (VALUES (1, 301), (2, 176), (3, 125), (4, 97), (5, 79),
                            (6, 67), (7, 58), (8, 51), (9, 46))
      AS t(digit, expected_milli)),
t AS (SELECT SUM(n_d) AS n FROM o)
SELECT e.digit, CAST(COALESCE(n_d, 0) AS BIGINT) AS n_d,
       CAST((1000 * COALESCE(n_d, 0)) // n AS BIGINT) AS observed_milli,
       CAST(expected_milli AS BIGINT) AS expected_milli,
       CAST((1000 * COALESCE(n_d, 0)) // n - expected_milli AS BIGINT)
         AS deviation_milli
FROM e LEFT JOIN o ON e.digit = o.digit CROSS JOIN t
"""


@pytest.mark.parametrize("sf", SFS)
def test_benford_oracle_shape_matches(spark, sf):
    orders = io.load_table(spark, sf, "orders")
    got = benford_deviation(orders, "o_totalprice").toPandas()
    con = _con(sf)
    want = con.sql(BENFORD_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    assert len(got) == 9 and got["n_d"].sum() > 0


def test_gini_handchecked(spark):
    """Per-entity values [1, 1, 2]: G = (2*900 - 4*400)/(3*400) ->
    166 permille; all-equal -> 0."""
    df = spark.createDataFrame(
        [("a", 1.0), ("b", 1.0), ("c", 2.0)], "e string, v double"
    )
    r = gini_concentration(df, "v", "e").collect()[0]
    assert (r["n_entities"], r["total"], r["gini_permille"]) == (3, 400, 166)
    eq = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0)], "e string, v double"
    )
    assert gini_concentration(eq, "v", "e").collect()[0]["gini_permille"] == 0


GINI_ORACLE = """
WITH p AS (SELECT l_suppkey AS e,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                       AS DECIMAL(38,2)) AS x
           FROM lineitem GROUP BY 1),
s AS (SELECT CAST(x * 100 AS HUGEINT) AS xc, e FROM p),
r AS (SELECT xc, ROW_NUMBER() OVER (ORDER BY xc, e) AS i FROM s),
a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_entities, SUM(xc) AS s0,
             SUM(CAST(i AS HUGEINT) * xc) AS s1
      FROM r)
SELECT n_entities, CAST(s0 AS BIGINT) AS total,
       CAST((1000 * (2 * s1 - (n_entities + 1) * s0))
            // (n_entities * s0) AS BIGINT) AS gini_permille
FROM a
"""


@pytest.mark.parametrize("sf", SFS)
def test_gini_oracle_shape_matches(spark, sf):
    li = io.load_table(spark, sf, "lineitem")
    got = gini_concentration(li, "l_extendedprice", "l_suppkey").toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = con.sql(GINI_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    g = int(got["gini_permille"].iloc[0])
    assert 0 < g < 1000  # non-degenerate concentration


# ---------------------------------------------------------------------------
# Top-k WITH TIES (operators/ranking.py)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators.ranking import topk_with_ties  # noqa: E402


def test_topk_with_ties_handchecked(spark):
    """[5,3,3,2] with k=2: the 3s straddle the cutoff at rank 2 and are
    BOTH kept (3 rows — row_number would cut one arbitrarily);
    [5,5,3,3,2] with k=2 keeps only the 5s (ranks 1,1 — the 3s sit at
    rank 3, past the cutoff) while dense=True keeps the top-2 VALUE
    tiers (4 rows) — three different contracts, all pinned."""
    straddle = spark.createDataFrame(
        [("g", 5), ("g", 3), ("g", 3), ("g", 2)], "g string, v long"
    )
    got = sorted(
        (r["v"], r["rk"]) for r in topk_with_ties(straddle, "g", "v", 2).collect()
    )
    assert got == [(3, 2), (3, 2), (5, 1)]
    rows = [("g", 5), ("g", 5), ("g", 3), ("g", 3), ("g", 2)]
    df = spark.createDataFrame(rows, "g string, v long")
    got2 = sorted(
        (r["v"], r["rk"]) for r in topk_with_ties(df, "g", "v", 2).collect()
    )
    assert got2 == [(5, 1), (5, 1)]
    dense = sorted(
        (r["v"], r["rk"]) for r in topk_with_ties(df, "g", "v", 2, dense=True).collect()
    )
    assert dense == [(3, 2), (3, 2), (5, 1), (5, 1)]


def test_topk_with_ties_rejects_bad_k(spark):
    df = spark.createDataFrame([("g", 1)], "g string, v long")
    with pytest.raises(ValueError, match="k must"):
        topk_with_ties(df, "g", "v", 0)


TIES_ORACLE = """
WITH r AS (SELECT l_suppkey, l_quantity,
                  RANK() OVER (PARTITION BY l_suppkey
                               ORDER BY l_quantity DESC) AS rk
           FROM lineitem)
SELECT l_suppkey, l_quantity, CAST(rk AS BIGINT) AS rk
FROM r WHERE rk <= 2
"""


@pytest.mark.parametrize("sf", SFS)
def test_topk_with_ties_oracle_shape_matches(spark, sf):
    li = io.load_table(spark, sf, "lineitem").select("l_suppkey", "l_quantity")
    got = topk_with_ties(li, "l_suppkey", "l_quantity", 2).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * FROM '{sf}/lineitem.parquet'")
    want = con.sql(TIES_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    # the WITH-TIES contract is material here: far more rows than 2/group
    n_groups = got["l_suppkey"].nunique()
    assert len(got) > 4 * n_groups


# ---------------------------------------------------------------------------
# BPE apply (train→apply roundtrip, operators/lm.py)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators.lm import bpe_apply_report  # noqa: E402


def test_bpe_apply_handchecked(spark):
    """Corpus 'aaaa ab' with 1 merge: (a,a) wins (count 3); aaaa →
    [aa,aa], ab stays [a,b] → 6 char tokens, 4 bpe tokens, 666
    permille."""
    df = spark.createDataFrame([(1, "aaaa ab")], "doc_id long, text string")
    r = bpe_apply_report(df, 1).collect()[0]
    assert (
        r["n_char_tokens"], r["n_bpe_tokens"], r["compression_permille"]
    ) == (6, 4, 666)


def test_bpe_apply_matches_reference_fold(spark):
    """Per-doc counts must equal applying the Python reference trainer's
    merges word by word."""
    corpus = ["aaaa aab the the the fast aaa", "aab aab key key the"]
    n = 4
    merges = [(x, y) for _, x, y, _ in _ref_bpe(" ".join(corpus).split(" "), n)]

    def apply_word(w):
        syms = list(w)
        for x, y in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_char_tokens"], r["n_bpe_tokens"])
        for r in bpe_apply_report(df, n).collect()
    }
    for i, t in enumerate(corpus):
        words = t.split(" ")
        want = (sum(len(w) for w in words), sum(apply_word(w) for w in words))
        assert got[i] == want, (i, got[i], want)


def _bpe_apply_oracle(n_merges: int) -> str:
    parts = [
        """
WITH w AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS wc
           FROM (SELECT UNNEST(string_split(text, ' ')) AS word FROM documents)
           GROUP BY 1),
v1 AS (SELECT word, regexp_replace(word, '(.)', ' \\1 ', 'g') AS sym, wc FROM w)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f""",
s{i} AS (SELECT string_split(trim(sym), '  ') AS s, wc FROM v{i}),
p{i} AS (SELECT s[i] AS sym_x, s[i + 1] AS sym_y, wc
         FROM s{i}, LATERAL UNNEST(generate_series(1, len(s) - 1)) AS u(i)),
c{i} AS (SELECT sym_x, sym_y, CAST(SUM(wc) AS BIGINT) AS pair_count
         FROM p{i} GROUP BY 1, 2),
t{i} AS (SELECT sym_x, sym_y, pair_count FROM c{i}
         ORDER BY pair_count DESC, sym_x, sym_y LIMIT 1),
v{i + 1} AS (SELECT word,
                    replace(sym, ' ' || t{i}.sym_x || '  ' || t{i}.sym_y || ' ',
                            ' ' || t{i}.sym_x || t{i}.sym_y || ' ') AS sym, wc
             FROM v{i}, t{i})"""
        )
    parts.append(
        f""",
pw AS (SELECT word, len(string_split(trim(sym), '  ')) AS n_syms
       FROM v{n_merges + 1}),
dw AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS word FROM documents)
SELECT doc_id, CAST(SUM(length(word)) AS BIGINT) AS n_char_tokens,
       CAST(SUM(n_syms) AS BIGINT) AS n_bpe_tokens,
       CAST((1000 * SUM(n_syms)) // SUM(length(word)) AS BIGINT)
         AS compression_permille
FROM dw JOIN pw USING (word) GROUP BY 1"""
    )
    return "".join(parts)


@pytest.mark.parametrize("sf", SFS)
def test_bpe_apply_oracle_shape_matches(spark, sf):
    docs = io.load_table(spark, sf, "documents")
    got = bpe_apply_report(docs, 3).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(_bpe_apply_oracle(3)).df()
    assert _rendered(got).equals(_rendered(want)), sf
    # three merges must actually compress the corpus: the overwhelming
    # majority of docs land under 1000 permille (a doc whose words
    # contain none of the three merged pairs legitimately stays at 1000)
    assert (got["compression_permille"] < 1000).mean() > 0.9
    assert (got["n_bpe_tokens"] <= got["n_char_tokens"]).all()
    assert (got["n_bpe_tokens"] < got["n_char_tokens"]).any()


# ---------------------------------------------------------------------------
# Pre-wired registration module: every entry end-to-end vs its oracle
# ---------------------------------------------------------------------------


def test_round11_module_entries_match_oracles(spark):
    """The driver-style rendered-value check over every pre-wired r11
    query at sf0.01 — the same gate the registry sweep applies, run
    against the module that will be registered in the r11 window."""
    from kinesis_stream_video_project_spark.plans import queries_round11 as q11

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    assert len(q11.QUERIES) == 27
    for name, fn in q11.QUERIES.items():
        got = fn(spark, sf).toPandas()
        want = con.sql(q11.ORACLES[name]).df()
        assert sorted(got.columns) == sorted(want.columns), name
        assert _rendered(got).equals(_rendered(want)), name
        assert len(got) > 0, name


# ---------------------------------------------------------------------------
# Exact ACF + Gini impurity (operators/stats.py)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators.stats import (  # noqa: E402
    acf_exact,
    gini_impurity,
)


def test_acf_handchecked(spark):
    """x=[1,2,3,4]: r1 = 1.25/5 = 0.25 -> 250; r2 = -1.5/5 = -0.3 ->
    -300 (negative division truncates identically both engines)."""
    rows = [("2020-01-0%d" % (i + 1), v) for i, v in enumerate([1, 2, 3, 4])]
    df = spark.createDataFrame(rows, "d string, x long").select(
        F.to_date("d").alias("d"), "x"
    )
    got = {r["lag"]: r["acf_permille"] for r in acf_exact(df, "d", "x", 2).collect()}
    assert got == {1: 250, 2: -300}


def test_acf_matches_float_reference():
    """Hypothesis pin: the integer formula tracks the float ACF within
    one permille floor step on random small series."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        xs=st.lists(st.integers(min_value=0, max_value=9), min_size=4, max_size=20),
        k=st.integers(min_value=1, max_value=3),
    )
    def run(xs, k):
        n = len(xs)
        if k >= n:
            return
        s = sum(xs)
        sxx = sum(x * x for x in xs)
        den = n * n * sxx - n * s * s
        if den == 0:  # constant series: ACF undefined
            return
        sxy = sum(xs[t] * xs[t + k] for t in range(n - k))
        sh = sum(xs[: n - k])
        st_ = sum(xs[k:])
        num = n * n * sxy - n * s * (sh + st_) + (n - k) * s * s
        from kinesis_stream_video_project_spark.functions.numeric import tdiv

        got = tdiv(1000 * num, den) if num >= 0 else -tdiv(-1000 * num, den)
        mu = s / n
        fnum = sum((xs[t] - mu) * (xs[t + k] - mu) for t in range(n - k))
        fden = sum((x - mu) ** 2 for x in xs)
        want = 1000 * fnum / fden
        assert abs(got - want) <= 1.0001, (xs, k, got, want)

    run()


ACF_ORACLE = """
WITH ser AS (SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
             FROM orders GROUP BY 1),
bounds AS (SELECT MIN(d) AS mn, MAX(d) AS mx FROM ser),
days AS (SELECT CAST(UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS d
         FROM bounds),
filled AS (SELECT days.d, COALESCE(ser.x, 0) AS x
           FROM days LEFT JOIN ser ON days.d = ser.d),
b AS (SELECT datediff('day', DATE '1970-01-01', d) AS t, x FROM filled),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               SUM(CAST(x AS HUGEINT)) AS s,
               SUM(CAST(x AS HUGEINT) * x) AS sxx FROM b),
l AS (SELECT UNNEST(generate_series(1, 7)) AS lag),
p AS (SELECT lag, SUM(CAST(a.x AS HUGEINT) * c.x) AS sxy,
             SUM(CAST(a.x AS HUGEINT)) AS sh,
             SUM(CAST(c.x AS HUGEINT)) AS st, COUNT(*) AS npairs
      FROM b a CROSS JOIN l JOIN b c ON c.t = a.t + lag GROUP BY 1)
SELECT CAST(lag AS BIGINT) AS lag, n_days,
       CAST((1000 * (CAST(n_days AS HUGEINT) * n_days * sxy
                     - n_days * s * (sh + st) + npairs * s * s))
            // (CAST(n_days AS HUGEINT) * n_days * sxx - n_days * s * s)
            AS BIGINT) AS acf_permille
FROM p, tot ORDER BY lag
"""


def _daily_orders_filled(spark, sf):
    orders = io.load_table(spark, sf, "orders")
    ser = orders.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("x")
    )
    bounds = ser.agg(F.min("d").alias("mn"), F.max("d").alias("mx"))
    days = bounds.select(
        F.explode(F.expr("sequence(mn, mx, interval 1 day)")).alias("d")
    )
    return days.join(ser, "d", "left").select(
        "d", F.coalesce("x", F.lit(0)).alias("x")
    )


@pytest.mark.parametrize("sf", SFS)
def test_acf_oracle_shape_matches(spark, sf):
    """Gap-filled daily order counts (1094/2405 days exist at sf0.001 —
    without zero-fill 'lag 1' would mean different things per SF)."""
    got = acf_exact(_daily_orders_filled(spark, sf), "d", "x", 7).toPandas()
    con = _con(sf)
    want = con.sql(ACF_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    assert len(got) == 7


def test_acf_rejects_bad_lag(spark):
    df = spark.createDataFrame([("2020-01-01", 1)], "d string, x long")
    with pytest.raises(ValueError, match="max_lag"):
        acf_exact(df, "d", "x", 0)


def test_gini_impurity_handchecked(spark):
    """Pure group -> 0; 50/50 -> 500; 4-way uniform -> 750."""
    rows = (
        [("p", "a")] * 3
        + [("h", "a"), ("h", "b")]
        + [("u", "a"), ("u", "b"), ("u", "c"), ("u", "d")]
    )
    df = spark.createDataFrame(rows, "g string, l string")
    got = {
        r["g"]: (r["n"], r["n_labels"], r["impurity_permille"])
        for r in gini_impurity(df, "l", "g").collect()
    }
    assert got == {"p": (3, 1, 0), "h": (2, 2, 500), "u": (4, 4, 750)}


GINI_IMPURITY_ORACLE = """
WITH l AS (SELECT c_nationkey AS g, o_orderpriority AS lab,
                  CAST(COUNT(*) AS BIGINT) AS c
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY 1, 2),
a AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS n_labels,
             SUM(CAST(c AS HUGEINT) * c) AS sc2
      FROM l GROUP BY 1)
SELECT g AS c_nationkey, n, n_labels,
       CAST((1000 * (CAST(n AS HUGEINT) * n - sc2))
            // (CAST(n AS HUGEINT) * n) AS BIGINT) AS impurity_permille
FROM a
"""


@pytest.mark.parametrize("sf", SFS)
def test_gini_impurity_oracle_shape_matches(spark, sf):
    orders = io.load_table(spark, sf, "orders")
    cust = io.load_table(spark, sf, "customer")
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        "c_nationkey", "o_orderpriority"
    )
    got = gini_impurity(j, "o_orderpriority", "c_nationkey").toPandas()
    con = _con(sf)
    want = con.sql(GINI_IMPURITY_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    # priorities are near-uniform 5-way: impurity close to 800, never pure
    assert (got["impurity_permille"] > 600).all()


# ---------------------------------------------------------------------------
# nDCG@k retrieval evaluation (operators/similarity.py)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators import similarity as sim  # noqa: E402


def test_ndcg_handchecked(spark):
    """truth={a,b,c}; candidate [a,x,b]: dcg=1000+500, idcg=2131 ->
    703; the perfect ranking scores exactly 1000."""
    cand = spark.createDataFrame(
        [(1, "a", 1), (1, "x", 2), (1, "b", 3)],
        "query_id long, vec_id string, rank long",
    )
    truth = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c")], "query_id long, vec_id string"
    )
    r = sim.ndcg_binary(cand, truth, k=3).collect()[0]
    assert (r["n_relevant"], r["dcg_milli"], r["idcg_milli"]) == (3, 1500, 2131)
    assert r["ndcg_milli"] == 1500 * 1000 // 2131 == 703
    perfect = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (1, "c", 3)],
        "query_id long, vec_id string, rank long",
    )
    assert sim.ndcg_binary(perfect, truth, k=3).collect()[0]["ndcg_milli"] == 1000


def test_ndcg_refusals(spark):
    cand = spark.createDataFrame(
        [(1, "a", 11)], "query_id long, vec_id string, rank long"
    )
    truth = spark.createDataFrame([(1, "a")], "query_id long, vec_id string")
    with pytest.raises(ValueError, match="literal discount table"):
        sim.ndcg_binary(cand, truth, k=11)
    with pytest.raises(Exception, match="outside"):
        sim.ndcg_binary(cand, truth, k=10).collect()


@pytest.mark.parametrize("sf", SFS)
def test_ndcg_self_is_perfect_and_ivf_measured(spark, sf):
    """ndcg(exact, exact) = 1000 for every query; ndcg(ivf@nprobe2,
    exact) lands in (0, 1000] and tracks the known recall band."""
    e = io.load_table(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.cosine_topk(q, e, k=10)
    self_scores = sim.ndcg_binary(exact, exact.select("query_id", "vec_id"), k=10)
    assert set(r["ndcg_milli"] for r in self_scores.collect()) == {1000}
    ivf = sim.ivf_topk(q, e, k=10, nprobe=2)
    scores = {
        r["query_id"]: r["ndcg_milli"]
        for r in sim.ndcg_binary(
            ivf, exact.select("query_id", "vec_id"), k=10
        ).collect()
    }
    assert len(scores) == 5
    # nprobe=2 IVF can legitimately miss a query's whole exact set at
    # tiny SF (recall band 0.22-0.42, measured r3) — 0 is an honest score
    assert all(0 <= v <= 1000 for v in scores.values()), scores
    assert any(v > 0 for v in scores.values()), scores


# ---------------------------------------------------------------------------
# CDC changeset application (operators/cdc.py)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators.cdc import cdc_apply  # noqa: E402


def test_cdc_apply_handchecked(spark):
    """U updates, D (latest seq) deletes, I inserts an absent key, a
    same-seq D beats U, and a NULL upsert payload WINS (not falls back)."""
    snap = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "C"), (5, "E"), (6, "FF")],
        "k long, p string",
    )
    rows = [
        (2, "U", 1, "B2"),
        (2, "D", 2, None),      # latest change for 2: delete
        (3, "U", 1, "C2"),      # update survives
        (4, "I", 1, "D1"),      # insert new key
        (5, "U", 1, "x"),
        (5, "D", 1, None),      # same seq: D outranks U
        (6, "U", 9, None),      # NULL payload upsert wins
    ]
    ch = spark.createDataFrame(rows, "k long, op string, seq long, p string")
    got = {r["k"]: r["p"] for r in cdc_apply(snap, ch, "k", "p").collect()}
    assert got == {1: "A", 3: "C2", 4: "D1", 6: None}


def test_cdc_apply_refusals(spark):
    snap = spark.createDataFrame([(1, "A")], "k long, p string")
    bad_op = spark.createDataFrame(
        [(1, "X", 1, "z")], "k long, op string, seq long, p string"
    )
    with pytest.raises(Exception, match="unknown op"):
        cdc_apply(snap, bad_op, "k", "p").collect()
    dup_snap = spark.createDataFrame([(1, "A"), (1, "B")], "k long, p string")
    ch = spark.createDataFrame(
        [(1, "U", 1, "z")], "k long, op string, seq long, p string"
    )
    with pytest.raises(Exception, match="not unique"):
        cdc_apply(dup_snap, ch, "k", "p").collect()
    amb = spark.createDataFrame(
        [(1, "U", 1, "a"), (1, "U", 1, "b")],
        "k long, op string, seq long, p string",
    )
    with pytest.raises(Exception, match="no deterministic winner"):
        cdc_apply(snap, amb, "k", "p").collect()


CDC_ORACLE = """
WITH ch AS (SELECT o_custkey AS k,
                   CASE o_orderstatus WHEN 'F' THEN 'U' WHEN 'O' THEN 'I'
                        ELSE 'D' END AS op,
                   o_orderkey AS seq, o_orderpriority AS newp
            FROM orders),
r AS (SELECT k, op, newp,
             seq * 4 + CASE op WHEN 'D' THEN 3 WHEN 'U' THEN 2 ELSE 1 END AS ord
      FROM ch),
w AS (SELECT k, arg_max(op, ord) AS op, arg_max(newp, ord) AS newp
      FROM r GROUP BY 1),
m AS (SELECT c.c_custkey AS sk, c.c_mktsegment AS old, w.k, w.op, w.newp
      FROM customer c FULL OUTER JOIN w ON c.c_custkey = w.k)
SELECT COALESCE(sk, k) AS c_custkey,
       CASE WHEN op IS NULL THEN old ELSE newp END AS c_mktsegment
FROM m WHERE op IS NULL OR op != 'D'
"""


@pytest.mark.parametrize("sf", SFS)
def test_cdc_apply_oracle_shape_matches(spark, sf):
    """Synthetic changeset derived from orders (key=custkey,
    seq=orderkey, F->U / O->I / P->D, payload=priority) applied to the
    customer snapshot — deterministic, both branches engaged."""
    cust = io.load_table(spark, sf, "customer")
    orders = io.load_table(spark, sf, "orders")
    changes = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.expr(
            "CASE o_orderstatus WHEN 'F' THEN 'U' WHEN 'O' THEN 'I' "
            "ELSE 'D' END"
        ).alias("op"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderpriority").alias("c_mktsegment"),
    )
    got = cdc_apply(
        cust.select("c_custkey", "c_mktsegment"),
        changes,
        "c_custkey",
        "c_mktsegment",
    ).toPandas()
    con = _con(sf)
    want = con.sql(CDC_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    n_cust = cust.count()
    assert 0 < len(got) < n_cust  # deletes actually removed someone


# ---------------------------------------------------------------------------
# k-anonymity / l-diversity audit (operators/profiling.py)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators.profiling import (  # noqa: E402
    anonymity_report,
)


def test_anonymity_handchecked(spark):
    """Class (a,x): 3 rows, 2 sensitive values, k=3 -> not below; class
    (b,y): 1 row -> below_k and homogeneous."""
    rows = [
        ("a", "x", "s1"), ("a", "x", "s1"), ("a", "x", "s2"),
        ("b", "y", "s1"),
    ]
    df = spark.createDataFrame(rows, "q1 string, q2 string, s string")
    got = {
        (r["q1"], r["q2"]): (r["class_size"], r["l_distinct"], r["below_k"])
        for r in anonymity_report(df, ["q1", "q2"], "s", k=3).collect()
    }
    assert got == {("a", "x"): (3, 2, False), ("b", "y"): (1, 1, True)}


def test_anonymity_refusals(spark):
    df = spark.createDataFrame([("a", "s")], "q string, s string")
    with pytest.raises(ValueError, match="QI column"):
        anonymity_report(df, [], "s")
    with pytest.raises(ValueError, match="k must"):
        anonymity_report(df, ["q"], "s", k=1)


ANONYMITY_ORACLE = """
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS class_size,
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS l_distinct,
       COUNT(*) < 5 AS below_k
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
"""


@pytest.mark.parametrize("sf", SFS)
def test_anonymity_oracle_shape_matches(spark, sf):
    orders = io.load_table(spark, sf, "orders")
    cust = io.load_table(spark, sf, "customer")
    j = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        "c_nationkey", "c_mktsegment", "o_orderpriority"
    )
    got = anonymity_report(
        j, ["c_nationkey", "c_mktsegment"], "o_orderpriority", k=5
    ).toPandas()
    con = _con(sf)
    want = con.sql(ANONYMITY_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    assert len(got) > 0


# ---------------------------------------------------------------------------
# Bag-semantics set ops (EXCEPT ALL / INTERSECT ALL)
# ---------------------------------------------------------------------------


def test_bag_set_ops_multiset_law(spark):
    """The multiset law: except_all keeps max(0, cA-cB) copies and
    intersect_all min(cA, cB) — checked per key against direct counts,
    and materially different from the distinct variants."""
    from kinesis_stream_video_project_spark.plans.queries_round11 import (
        _bag_set_ops,
    )

    sf = "/root/testdata/sf0.01"
    li = io.load_table(spark, sf, "lineitem")
    ca = {
        r["l_suppkey"]: r["n"]
        for r in li.filter(F.col("l_quantity") >= 25)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    cb = {
        r["l_suppkey"]: r["n"]
        for r in li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = _bag_set_ops(spark, sf).collect()
    for r in got:
        a, b = ca.get(r["l_suppkey"], 0), cb.get(r["l_suppkey"], 0)
        want = max(0, a - b) if r["op"] == "except_all" else min(a, b)
        assert r["n"] == want, (r, a, b)
    # multiplicity is material: bag counts exceed 1 somewhere
    assert any(r["n"] > 1 for r in got)


# ---------------------------------------------------------------------------
# Exact whole-corpus all-pairs Jaccard via prefix filtering (operators/dedup.py)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators.dedup import (  # noqa: E402
    allpairs_jaccard_prefix,
)


def test_allpairs_prefix_refuses_zero_threshold(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="threshold_permille"):
        allpairs_jaccard_prefix(df, 0)


@pytest.mark.parametrize("sf", SFS[:2])
@pytest.mark.parametrize("t", [500, 800])
def test_allpairs_prefix_complete_vs_bruteforce(spark, sf, t):
    """The prefix theorem's completeness claim, checked literally: the
    operator's pair set equals the quadratic Python brute force over
    3-shingle sets — every pair, every count, both thresholds."""
    docs = io.load_table(spark, sf, "documents").collect()

    def sh(text):
        toks = text.split(" ")
        n = max(len(toks) - 2, 1)
        return {" ".join(toks[i : i + 3]) for i in range(n)}

    sets = {r["doc_id"]: sh(r["text"]) for r in docs}
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            denom = len(sets[a]) + len(sets[b]) - inter
            jp = 1000 * inter // denom
            if jp >= t:
                want[(a, b)] = (inter, len(sets[a]), len(sets[b]), jp)
    got = {
        (r["doc_a"], r["doc_b"]): (
            r["inter"], r["size_a"], r["size_b"], r["jaccard_permille"]
        )
        for r in allpairs_jaccard_prefix(
            io.load_table(spark, sf, "documents"), t
        ).collect()
    }
    assert got == want and len(want) > 0, (sf, t, len(got), len(want))


def test_allpairs_prefix_sees_cross_block_pairs(spark):
    """The capability the blocked tier lacks by design: a near-identical
    pair in DIFFERENT (source, lang) blocks is invisible to
    blocked_jaccard_near_dups but found here."""
    rows = [
        (1, "x y z w v u t s r q", "a", "en"),
        (2, "x y z w v u t s r q", "b", "de"),  # other block, same text
        (3, "completely different words here now", "a", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")
    from kinesis_stream_video_project_spark.operators.dedup import (
        blocked_jaccard_near_dups,
    )
    blocked = blocked_jaccard_near_dups(df, threshold=0.8, shingle_k=3).collect()
    assert blocked == []  # blind across blocks
    got = allpairs_jaccard_prefix(df, 800).collect()
    assert [(r["doc_a"], r["doc_b"], r["jaccard_permille"]) for r in got] == [
        (1, 2, 1000)
    ]


# ---------------------------------------------------------------------------
# Functional-dependency violation audit (operators/profiling.py)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators.profiling import (  # noqa: E402
    fd_violations,
)


def test_fd_violations_handchecked(spark):
    rows = [("a", 1), ("a", 1), ("b", 1), ("b", 2)]
    df = spark.createDataFrame(rows, "l string, r long")
    got = {
        r["l"]: (r["n_rows"], r["n_distinct_rhs"], r["violating"])
        for r in fd_violations(df, ["l"], "r").collect()
    }
    assert got == {"a": (2, 1, False), "b": (2, 2, True)}
    with pytest.raises(ValueError, match="LHS"):
        fd_violations(df, [], "r")


FD_ORACLE = """
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT c_name) AS BIGINT) AS n_distinct_rhs,
       COUNT(DISTINCT c_name) > 1 AS violating
FROM customer GROUP BY 1, 2
"""


@pytest.mark.parametrize("sf", SFS)
def test_fd_violations_oracle_shape_matches(spark, sf):
    """(nation, segment) -> name obviously fails as an FD (many
    customers share a nation+segment) — the audit proves it violating
    everywhere rather than assuming; a key -> attribute FD holds."""
    cust = io.load_table(spark, sf, "customer")
    got = fd_violations(cust, ["c_nationkey", "c_mktsegment"], "c_name").toPandas()
    con = _con(sf)
    want = con.sql(FD_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    held = fd_violations(cust, ["c_custkey"], "c_name").collect()
    assert all(not r["violating"] for r in held)  # key FD holds


# ---------------------------------------------------------------------------
# Hypothesis semantic pins: attribution + CDC vs Python reference replays
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1])
def test_attribution_matches_python_replay(spark, seed):
    """Random small event streams (timestamp collisions forced) against
    a literal Python implementation of the contract: strictly-before
    RANGE semantics, min-event_id tie at the winning second, horizon,
    and 'none' fallback. Two seeded draws keep runtime bounded while
    covering tie layouts hypothesis would shrink to anyway."""
    import random

    rng = random.Random(seed)
    rows = []
    eid = 0
    for uid in range(1, 6):
        for _ in range(rng.randint(1, 12)):
            eid += 1
            rows.append(
                (
                    eid,
                    datetime(2020, 1, 1, 0, 0, rng.randint(0, 9)),
                    uid,
                    rng.choice(["click", "view", "purchase"]),
                    round(rng.uniform(0.1, 5.0), 2),
                    "{}",
                )
            )
    horizon = rng.choice([2, 5])
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        r["channel"]: (r["n_conversions"], r["sum_value_milli"])
        for r in attribution_last_touch(
            df, "purchase", ["click", "view"], horizon_s=horizon
        ).collect()
    }

    import collections
    import math

    want = collections.defaultdict(lambda: [0, 0])
    by_uid = collections.defaultdict(list)
    for e in rows:
        by_uid[e[2]].append(e)
    for uid, evs in by_uid.items():
        for e in evs:
            if e[3] != "purchase":
                continue
            p_us = int(e[1].timestamp() * 1_000_000)
            touches = [
                t
                for t in evs
                if t[3] in ("click", "view")
                and int(t[1].timestamp() * 1_000_000) < p_us
                and p_us - int(t[1].timestamp() * 1_000_000) <= horizon * 1_000_000
            ]
            if touches:
                best_us = max(int(t[1].timestamp() * 1_000_000) for t in touches)
                winner = min(
                    (t for t in touches if int(t[1].timestamp() * 1_000_000) == best_us),
                    key=lambda t: t[0],
                )
                ch = winner[3]
            else:
                ch = "none"
            want[ch][0] += 1
            want[ch][1] += math.floor(e[4] * 1000.0 + 0.5)
    assert got == {k: tuple(v) for k, v in want.items()}, (seed, got, dict(want))


def test_cdc_apply_matches_python_replay(spark):
    """Hypothesis pin: cdc_apply equals a literal Python merge for any
    snapshot + changeset with unique (key, seq) pairs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # Build one Spark-free strategy, run Spark comparisons on a few
    # hypothesis-generated cases collected eagerly (a Spark job per
    # hypothesis example would be minutes).
    cases = []

    @settings(max_examples=25, deadline=None)
    @given(
        snap=st.dictionaries(
            st.integers(min_value=1, max_value=8),
            st.sampled_from(["A", "B", "C"]),
            max_size=6,
        ),
        ch=st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=10),  # key
                st.sampled_from(["I", "U", "D"]),
                st.sampled_from(["x", "y", None]),
            ),
            max_size=10,
        ),
    )
    def collect(snap, ch):
        cases.append((dict(snap), list(ch)))

    collect()

    def py_merge(snap, changes):
        best = {}
        for seq, (k, op, p) in enumerate(changes):
            ordk = seq * 4 + {"D": 3, "U": 2, "I": 1}[op]
            if k not in best or ordk > best[k][0]:
                best[k] = (ordk, op, p)
        out = dict(snap)
        for k, (_, op, p) in best.items():
            if op == "D":
                out.pop(k, None)
            else:
                out[k] = p
        return out

    for snap, ch in cases[:8]:  # 8 Spark comparisons, rest replay-only
        changes = [(k, op, seq, p) for seq, (k, op, p) in enumerate(ch)]
        sdf = spark.createDataFrame(
            [(k, v) for k, v in snap.items()] or [(999999, "Z")],
            "k long, p string",
        )
        snap_eff = snap or {999999: "Z"}
        cdf = spark.createDataFrame(
            changes or [(999998, "I", 0, "w")],
            "k long, op string, seq long, p string",
        )
        ch_eff = ch or [(999998, "I", "w")]
        got = {
            r["k"]: r["p"] for r in cdc_apply(sdf, cdf, "k", "p").collect()
        }
        assert got == py_merge(snap_eff, ch_eff), (snap, ch)
    # and the pure replay logic holds on every generated case
    for snap, ch in cases:
        py_merge(snap, ch)  # no exceptions, total function


# ---------------------------------------------------------------------------
# KMV set-operation estimates (operators/kmv.py — Beyer et al. 2007 §4)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators.kmv import (  # noqa: E402
    kmv_set_op_estimates,
)


def test_kmv_set_ops_exact_when_unsaturated(spark):
    """Sketches holding the whole sets collapse every estimate to the
    exact value — the n<k branch of the whole estimator chain."""
    a = spark.createDataFrame([(i,) for i in range(1, 9)], "k long")
    b = spark.createDataFrame([(i,) for i in range(5, 13)], "k long")
    r = kmv_set_op_estimates(a, b, "k", k=64).collect()[0]
    assert (r["exact_a"], r["exact_b"], r["exact_union"], r["exact_inter"]) == (
        8, 8, 12, 4,
    )
    assert (r["est_a"], r["est_b"], r["est_union"], r["est_inter"]) == (8, 8, 12, 4)
    assert r["jaccard_est_permille"] == r["jaccard_exact_permille"] == 4000 // 12


@pytest.mark.parametrize("sf", SFS)
def test_kmv_set_ops_estimator_bands(spark, sf):
    """Saturated regime (urgent vs low customer sets): ρ-Jaccard within
    ±60 permille of exact and the intersection estimate within
    [0.6, 1.5]× — probed 765-781 vs 755-782 and 0.96-1.32× across the
    three SFs at k=64."""
    o = io.load_table(spark, sf, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT")
    b = o.filter(F.col("o_orderpriority") == "5-LOW")
    r = kmv_set_op_estimates(a, b, "o_custkey", k=64).collect()[0]
    assert abs(r["jaccard_est_permille"] - r["jaccard_exact_permille"]) <= 60
    ratio = r["est_inter"] / r["exact_inter"]
    assert 0.6 <= ratio <= 1.5, dict(r.asDict())


KMV_SETOPS_ORACLE = """
WITH a0 AS (SELECT DISTINCT o_custkey AS kk FROM orders
            WHERE o_orderpriority = '1-URGENT'),
b0 AS (SELECT DISTINCT o_custkey AS kk FROM orders
       WHERE o_orderpriority = '5-LOW'),
ar AS (SELECT kk, ('0x' || substr(md5(CAST(kk AS VARCHAR)), 1, 12))::BIGINT AS rank
       FROM a0),
br AS (SELECT kk, ('0x' || substr(md5(CAST(kk AS VARCHAR)), 1, 12))::BIGINT AS rank
       FROM b0),
a AS (SELECT rank FROM (SELECT rank, ROW_NUMBER() OVER (ORDER BY rank, kk) AS pos
                        FROM ar) WHERE pos <= 64),
b AS (SELECT rank FROM (SELECT rank, ROW_NUMBER() OVER (ORDER BY rank, kk) AS pos
                        FROM br) WHERE pos <= 64),
u AS (SELECT rank FROM (SELECT rank, ROW_NUMBER() OVER (ORDER BY rank) AS pos
                        FROM (SELECT DISTINCT rank
                              FROM (SELECT rank FROM a UNION ALL SELECT rank FROM b)))
      WHERE pos <= 64),
nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_both FROM u
       WHERE rank IN (SELECT rank FROM a) AND rank IN (SELECT rank FROM b)),
sa AS (SELECT CAST(COUNT(*) AS BIGINT) AS na, MAX(rank) AS ka FROM a),
sb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nbk, MAX(rank) AS kb FROM b),
su AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu, MAX(rank) AS ku FROM u),
exa AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_a FROM a0),
exb AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_b FROM b0),
exi AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_inter
        FROM a0 JOIN b0 USING (kk)),
j AS (SELECT *,
             CASE WHEN na < 64 THEN na ELSE (63 * (1::BIGINT << 48)) // ka END AS est_a,
             CASE WHEN nbk < 64 THEN nbk ELSE (63 * (1::BIGINT << 48)) // kb END AS est_b,
             CASE WHEN nu < 64 THEN nu ELSE (63 * (1::BIGINT << 48)) // ku END AS est_union
      FROM sa, sb, su, nb, exa, exb, exi)
SELECT exact_a, exact_b,
       CAST(exact_a + exact_b - exact_inter AS BIGINT) AS exact_union,
       exact_inter, nu AS n_union_sketch, n_both,
       CAST(est_a AS BIGINT) AS est_a, CAST(est_b AS BIGINT) AS est_b,
       CAST(est_union AS BIGINT) AS est_union,
       CAST((n_both * est_union) // nu AS BIGINT) AS est_inter,
       CAST((1000 * n_both) // nu AS BIGINT) AS jaccard_est_permille,
       CAST((1000 * exact_inter) // (exact_a + exact_b - exact_inter) AS BIGINT)
         AS jaccard_exact_permille
FROM j
"""


@pytest.mark.parametrize("sf", SFS)
def test_kmv_set_ops_oracle_shape_matches(spark, sf):
    o = io.load_table(spark, sf, "orders")
    a = o.filter(F.col("o_orderpriority") == "1-URGENT")
    b = o.filter(F.col("o_orderpriority") == "5-LOW")
    got = kmv_set_op_estimates(a, b, "o_custkey", k=64).toPandas()
    con = _con(sf)
    want = con.sql(KMV_SETOPS_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf


# ---------------------------------------------------------------------------
# Plan-hygiene pins for the PRE-WIRED module (the registry-wide rules,
# applied before registration so hazards surface now)
# ---------------------------------------------------------------------------


def test_round11_no_decimal_or_timestamp_outputs(spark):
    """Driver-hash portability (the registry-wide rule of
    test_plan_properties): no DECIMAL or raw-timestamp output columns
    anywhere in the pre-wired module."""
    from pyspark.sql.types import DecimalType, TimestampNTZType, TimestampType

    from kinesis_stream_video_project_spark.plans import queries_round11 as q11

    sf = "/root/testdata/sf0.001"
    offenders = []
    for name, fn in q11.QUERIES.items():
        for f in fn(spark, sf).schema.fields:
            if isinstance(f.dataType, (DecimalType, TimestampType, TimestampNTZType)):
                offenders.append((name, f.name, str(f.dataType)))
    assert not offenders, offenders


def test_round11_window_partitioning_budget(spark):
    """Unpartitioned windows in the module are exactly the adjudicated
    ledger walks (KS/MWU value ledgers, the ≤2k-row KMV union sketch,
    the gap-filled daily series' ACF never windows at all) — nothing
    windows over corpus-sized data without a partition key. Pinned by
    listing which queries may carry the SinglePartition window
    signature; any new one must be adjudicated here."""
    import re

    from kinesis_stream_video_project_spark.plans import queries_round11 as q11

    pat = re.compile(
        r"Window .*\n.*?Sort .*\n.*?Exchange SinglePartition", re.MULTILINE
    )
    allowed = {
        "ks_purchase_click",       # pooled distinct-VALUE ledger walk
        "mwu_purchase_click",      # same ledger shape
        "gini_supplier_revenue",   # |entities|-row ledger rank walk
        "kmv_setops_urgent_low",   # union sketch <= 2k rows
        "peak_transit_suppliers",  # |keys|-row final top-20 rank only
    }
    sf = "/root/testdata/sf0.001"
    offenders = []
    for name, fn in q11.QUERIES.items():
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        if pat.search(plan) and name not in allowed:
            offenders.append(name)
    assert not offenders, offenders


# ---------------------------------------------------------------------------
# Gopher quality rules (operators/lm.py — Rae et al. 2021 §A1.1)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators.lm import gopher_rules_report  # noqa: E402


def test_gopher_rules_handchecked(spark):
    """A 3-word doc fails word-count; 'the ... a' passes stopwords with
    exactly 2; a long-word doc fails mean word length."""
    rows = [
        (1, "the cat a"),                     # W=3 -> word-count fail; stops=2 pass
        (2, " ".join(["word"] * 60)),         # W=60 pass; stops=0 fail
        (3, " ".join(["abcdefghijklmnop"] * 60)),  # mean len 16 -> fail
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_rules_report(df).collect()}
    assert not got[1]["rule_word_count"] and got[1]["rule_stopwords"]
    assert got[1]["n_stopwords"] == 2 and got[1]["n_word_chars"] == 7
    assert got[2]["rule_word_count"] and not got[2]["rule_stopwords"]
    assert got[2]["rule_mean_word_len"]
    assert not got[3]["rule_mean_word_len"]
    assert not any(r["pass_all"] for r in got.values())


GOPHER_ORACLE = """
WITH s AS (SELECT doc_id,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
  CAST(list_sum(list_transform(string_split(text, ' '), t -> length(t)))
       AS BIGINT) AS n_word_chars,
  CAST(len(list_filter(string_split(text, ' '),
       t -> t IN ('the', 'and', 'of', 'to', 'a', 'in', 'is', 'it')))
       AS BIGINT) AS n_stopwords,
  CAST(len(list_filter(string_split(text, ' '),
       t -> regexp_matches(t, '[a-zA-Z]'))) AS BIGINT) AS n_alpha
FROM documents)
SELECT doc_id, n_words, n_word_chars, n_stopwords,
       n_words >= 50 AND n_words <= 100000 AS rule_word_count,
       3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words
         AS rule_mean_word_len,
       n_stopwords >= 2 AS rule_stopwords,
       10 * n_alpha >= 8 * n_words AS rule_alpha_words,
       (n_words >= 50 AND n_words <= 100000)
         AND (3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words)
         AND n_stopwords >= 2 AND 10 * n_alpha >= 8 * n_words AS pass_all
FROM s
"""


@pytest.mark.parametrize("sf", SFS)
def test_gopher_rules_oracle_shape_matches(spark, sf):
    docs = io.load_table(spark, sf, "documents")
    got = gopher_rules_report(docs).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.sql(GOPHER_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    # non-degenerate gate: pass_all splits the corpus
    frac = got["pass_all"].mean()
    assert 0.2 < frac < 0.9, frac


def test_round11_module_is_pure_jvm_and_budgeted(spark):
    """Every one of the 24 pre-wired queries compiles to a pure-JVM plan
    (no BatchEvalPython/ArrowEvalPython/MapInPandas anywhere — the
    whole r11 surface stays inside whole-stage codegen), and the
    row-local gate tier really is shuffle-free: readability and the
    Gopher rules plan ZERO exchanges; the one-aggregate audits
    (char-class, FD, anonymity) stay within one shuffle family.

    r15 exception: ``ndcg_tier_claims`` consumes ``sim.cosine_topk``,
    whose exact tier is now the broadcast-model Arrow recipe (ONE
    MapInPandas scoring each corpus batch in numpy — the r15
    optimization round's §4.2 rewrite, output bit-identical by the
    dim-sequential float64 contract). That query's guard flips to
    REQUIRING that node shape: MapInPandas present, still zero
    row-at-a-time BatchEvalPython anywhere."""
    from kinesis_stream_video_project_spark.plans import queries_round11 as q11

    sf = "/root/testdata/sf0.001"
    budgets = {
        "readability_scores": 0,
        "gopher_rules": 0,
        "props_charclass_profile": 1,
        "fd_nation_segment_name": 2,       # count_distinct plans partial+final
        "anonymity_nation_segment": 3,  # + the orders-customer join's exchange
    }
    for name, fn in q11.QUERIES.items():
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        if name == "ndcg_tier_claims":
            # The exact tier feeds several subtrees (scores + truth), so
            # the MapInPandas stage is REFERENCED more than once in the
            # tree string; require its presence and zero row-pickling
            # nodes rather than a reference count.
            assert "MapInPandas" in plan, name
            assert "BatchEvalPython" not in plan, name
            continue
        for node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                     "FlatMapGroupsInPandas"):
            assert node not in plan, f"{name}: Python node {node} in plan"
        if name in budgets:
            n_ex = plan.count("Exchange") - plan.count("ReusedExchange")
            assert n_ex <= budgets[name], (name, n_ex, budgets[name])


# ---------------------------------------------------------------------------
# Time-weighted average + OHLC bars (operators/stats.py)
# ---------------------------------------------------------------------------

from kinesis_stream_video_project_spark.operators.stats import (  # noqa: E402
    ohlc_bars,
    time_weighted_avg,
)


def test_twa_handchecked(spark):
    """u1 holds 1.0 for 10 s then 3.0 for 30 s -> twa = (1000*10 +
    3000*30)/40 = 2500 milli; the final value carries no weight; a
    single-event user reports span 0 / NULL twa."""
    rows = [
        _ev(1, 0, "view", 1, 1.0),
        _ev(1, 10, "view", 2, 3.0),
        _ev(1, 40, "view", 3, 9.9),   # final value: zero weight
        _ev(2, 5, "view", 4, 7.0),    # singleton
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        r["user_id"]: (r["n_events"], r["span_us"], r["twa_milli"])
        for r in time_weighted_avg(df, "value", "ts", "user_id").collect()
    }
    assert got[1] == (3, 40_000_000, 2500)
    assert got[2] == (1, 0, None)


def test_ohlc_handchecked(spark):
    """One hourly bar: open = first by time, close = last, high/low
    plain extremes; a same-timestamp tie resolves by event_id."""
    rows = [
        _ev(1, 10, "view", 2, 5.0),
        _ev(1, 5, "view", 1, 2.0),     # earliest -> open
        _ev(1, 50, "view", 3, 1.5),    # low
        _ev(1, 59, "view", 4, 4.0),
        _ev(1, 59, "view", 5, 3.5),    # same second, higher id -> close
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    r = ohlc_bars(df, "value", "ts", bar_seconds=3600).collect()[0]
    assert (r["n_events"], r["open_milli"], r["high_milli"], r["low_milli"],
            r["close_milli"]) == (5, 2000, 5000, 1500, 3500)


TWA_ORACLE = """
WITH s AS (SELECT user_id, CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vm,
                  epoch_us(ts) AS us, event_id,
                  LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY epoch_us(ts), event_id)
                    AS next_us
           FROM events),
a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             SUM(CASE WHEN next_us IS NOT NULL
                      THEN CAST(vm AS HUGEINT) * (next_us - us) END) AS num,
             CAST(COALESCE(SUM(CASE WHEN next_us IS NOT NULL
                                    THEN next_us - us END), 0) AS BIGINT)
               AS span_us
      FROM s GROUP BY 1)
SELECT user_id, n_events, span_us,
       CASE WHEN span_us > 0 THEN CAST(num // span_us AS BIGINT) END AS twa_milli
FROM a
"""


@pytest.mark.parametrize("sf", SFS)
def test_twa_oracle_shape_matches(spark, sf):
    ev = io.load_table(spark, sf, "events")
    got = time_weighted_avg(ev, "value", "ts", "user_id").toPandas()
    con = _con(sf)
    want = con.sql(TWA_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    # TWA differs from the plain mean (the sampling-bias point)
    assert got["twa_milli"].notna().all()


OHLC_ORACLE = """
WITH s AS (SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600 AS BIGINT)
             AS bar_start,
           CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS vm,
           epoch_us(ts) AS us, event_id
           FROM events)
SELECT bar_start, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(arg_min(vm, lpad(CAST(us AS VARCHAR), 20, '0') ||
                        lpad(CAST(event_id AS VARCHAR), 10, '0')) AS BIGINT)
         AS open_milli,
       CAST(MAX(vm) AS BIGINT) AS high_milli,
       CAST(MIN(vm) AS BIGINT) AS low_milli,
       CAST(arg_max(vm, lpad(CAST(us AS VARCHAR), 20, '0') ||
                        lpad(CAST(event_id AS VARCHAR), 10, '0')) AS BIGINT)
         AS close_milli
FROM s GROUP BY 1
"""


@pytest.mark.parametrize("sf", SFS)
def test_ohlc_oracle_shape_matches(spark, sf):
    ev = io.load_table(spark, sf, "events")
    got = ohlc_bars(ev, "value", "ts").toPandas()
    con = _con(sf)
    want = con.sql(OHLC_ORACLE).df()
    assert _rendered(got).equals(_rendered(want)), sf
    assert (got["low_milli"] <= got["high_milli"]).all()
    assert len(got) > 10


# ---------------------------------------------------------------------------
# Extra property pins: DDSketch containment & Gini float tracking
# ---------------------------------------------------------------------------


def test_dd_containment_property():
    """Hypothesis pin of the γ=2 law on arbitrary positive ints: the
    bucket-midpoint estimate of the rank-ceil(q·n) element is within
    (3/4, 3/2] of the true element, for every q."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=100, deadline=None)
    @given(
        xs=st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=40),
        q=st.integers(min_value=1, max_value=1000),
    )
    def run(xs, q):
        n = len(xs)
        srt = sorted(xs)
        true = srt[(q * n + 999) // 1000 - 1]
        b = true.bit_length() - 1
        est = 1 if b == 0 else 3 << (b - 1)
        assert 0.75 < est / true <= 1.5, (true, est)

    run()


def test_gini_tracks_float_formula():
    """Hypothesis pin: the scaled-integer Gini is within one permille
    floor step of the float rank formula on random positive ledgers."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=100, deadline=None)
    @given(
        xs=st.lists(st.integers(min_value=1, max_value=10**6), min_size=2, max_size=30),
    )
    def run(xs):
        srt = sorted(xs)
        n = len(srt)
        s0 = sum(srt)
        s1 = sum((i + 1) * x for i, x in enumerate(srt))
        got = (1000 * (2 * s1 - (n + 1) * s0)) // (n * s0)
        want = 1000.0 * (2 * s1 - (n + 1) * s0) / (n * s0)
        assert 0 <= want - got < 1 or got == want
        assert 0 <= got < 1000

    run()


def test_topk_with_ties_matches_python_replay(spark):
    """Seeded random frames with heavy collisions vs a literal Python
    implementation of all three cutoff contracts (rank, dense_rank,
    row_number-excluded) — the multiset the fixture can't force."""
    import random

    rng = random.Random(42)
    rows = [
        (g, rng.randint(0, 4))
        for g in ["a", "b", "c"]
        for _ in range(rng.randint(1, 15))
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    for k in (1, 2):
        for dense in (False, True):
            got = sorted(
                (r["g"], r["v"], r["rk"])
                for r in topk_with_ties(df, "g", "v", k, dense=dense).collect()
            )
            want = []
            byg = {}
            for g, v in rows:
                byg.setdefault(g, []).append(v)
            for g, vs in byg.items():
                vs_desc = sorted(vs, reverse=True)
                distinct_desc = sorted(set(vs), reverse=True)
                for v in vs:
                    if dense:
                        rk = distinct_desc.index(v) + 1
                    else:
                        rk = vs_desc.index(v) + 1  # first position = rank
                    if rk <= k:
                        want.append((g, v, rk))
            assert got == sorted(want), (k, dense)
