"""Bigram-LM surprisal (r7 registration queue): brute-force equality,
oracle-shape cross-check (pre-validates the r7 DuckDB twin), and
partition invariance."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators import lm

_ORACLE_SHAPE = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
bgs AS (
  SELECT doc_id, t[i] AS prev, t[i + 1] AS cur
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
),
bgc AS (SELECT prev, cur, COUNT(*) AS c_bigram FROM bgs GROUP BY 1, 2),
pc AS (SELECT prev, CAST(SUM(c_bigram) AS BIGINT) AS c_prev FROM bgc GROUP BY 1),
s AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         SUM(CAST((pc.c_prev * 1000000000) // bgc.c_bigram AS HUGEINT)) AS s
  FROM bgs JOIN bgc USING (prev, cur) JOIN pc USING (prev)
  GROUP BY doc_id
)
SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       (floor((CAST(s AS DOUBLE) / n_bigrams / 1000000000.0) * 10000.0 + 0.5)
        / 10000.0) AS surprisal
FROM s
"""


def test_bigram_surprisal_matches_bruteforce(spark, sf_dir):
    d = io.load_table(spark, sf_dir, "documents")
    got = {
        r.doc_id: (r.n_bigrams, r.surprisal)
        for r in lm.bigram_surprisal(d).collect()
    }
    docs = {r.doc_id: r.text.split(" ") for r in d.collect()}
    bgc: dict = {}
    pc: dict = {}
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            bgc[(a, b)] = bgc.get((a, b), 0) + 1
            pc[a] = pc.get(a, 0) + 1
    for doc_id, toks in docs.items():
        n = len(toks) - 1
        if n <= 0:
            assert doc_id not in got
            continue
        s = sum((pc[a] * 10**9) // bgc[(a, b)] for a, b in zip(toks, toks[1:]))
        want = math.floor((s / n / 1e9) * 1e4 + 0.5) / 1e4
        assert got[doc_id] == (n, want), doc_id


def test_bigram_surprisal_oracle_shape_matches(spark, sf_dir):
    """The exact DuckDB twin the r7 registration will ship — validated
    now so registration is a paste, not a debug session."""
    import duckdb

    d = io.load_table(spark, sf_dir, "documents")
    got = (
        lm.bigram_surprisal(d)
        .orderBy("doc_id")
        .toPandas()
        .astype(str)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.sql(_ORACLE_SHAPE + " ORDER BY doc_id")
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want)


def test_bigram_surprisal_partition_invariant(spark, sf_dir):
    d = io.load_table(spark, sf_dir, "documents")
    a = {
        (r.doc_id, r.n_bigrams, r.surprisal)
        for r in lm.bigram_surprisal(d.repartition(13)).collect()
    }
    b = {
        (r.doc_id, r.n_bigrams, r.surprisal)
        for r in lm.bigram_surprisal(d.coalesce(1)).collect()
    }
    assert a == b and len(a) > 0


def test_bigram_surprisal_scores_formulaic_below_unique(spark):
    """A document riding the corpus' DOMINANT continuation of each prev
    must score below a document taking rare continuations of the same
    prevs — the ranking property the quality gate consumes. (Note
    surprisal here measures continuation diversity: a prev with a single
    corpus-wide continuation has P(cur|prev)=1 however rare the words,
    so the probe corpus must spread continuations across documents.)"""
    rows = [
        (1, "a b a b a b"),
        (2, "a x a y a z"),
        (3, "a b a b a b"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.surprisal for r in lm.bigram_surprisal(d).collect()}
    assert got[1] == got[3] < got[2]


# ---------------------------------------------------------------------------
# Seasonal residual anomalies (r7 registration queue) — same file to avoid
# another Spark-session module; these pin the composite-key stats path.
# ---------------------------------------------------------------------------


def test_composite_key_quantile_matches_per_group(spark):
    """(g1, g2) composite quantiles must equal the single-key result on
    the concatenated key — the multi-column support added in r6."""
    from kinesis_stream_video_project_spark.operators import stats

    rows = [
        (g1, g2, v)
        for g1 in ("a", "b")
        for g2 in (0, 1)
        for v in ([1, 2, 3, 4, 100] if g2 else [10, 20, 30])
    ]
    df = spark.createDataFrame(rows, "g1 string, g2 int, v long")
    multi = {
        (r.g1, r.g2): r.q
        for r in stats.exact_quantile(df, ["g1", "g2"], "v", 1, 2).collect()
    }
    concat = df.withColumn("gk", F.concat_ws("#", "g1", "g2"))
    single = {
        tuple(r.gk.split("#")): r.q
        for r in stats.exact_quantile(concat, "gk", "v", 1, 2).collect()
    }
    assert multi == {(a, int(b)): q for (a, b), q in single.items()}
    assert multi[("a", 1)] == 3 and multi[("a", 0)] == 20


def test_seasonal_residual_flags_handchecked(spark):
    """A metric that is high at hour 3 and low elsewhere: a high value at
    hour 14 must flag, the same value at hour 3 must NOT (the
    calendar-awareness that a flat per-key threshold cannot express)."""
    import datetime as dt

    from kinesis_stream_video_project_spark.operators import stats

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    eid = 0
    # natural variance in both seasons (a constant series has MAD = 0 and
    # flags ANY deviation — the documented degenerate case, not this test)
    for day in range(8):
        for hour, v in [(3, 1000 + (day % 5) * 5), (14, 10 + day % 3)]:
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(days=day, hours=hour), "etl", v)
            )
    # day 8: the anomaly — hour-14 reading spikes to the hour-3 level,
    # while an hour-3 reading in the usual band stays normal.
    rows.append((100, base + dt.timedelta(days=8, hours=14), "etl", 1000))
    rows.append((101, base + dt.timedelta(days=8, hours=3), "etl", 1001))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, vu long"
    )
    flagged = {
        r.event_id
        for r in stats.seasonal_residual_flags(
            df,
            key_cols=["event_type"],
            season_col=F.hour("ts"),
            value_col="vu",
            id_cols=["event_id"],
        ).collect()
    }
    assert 100 in flagged and 101 not in flagged


def test_seasonal_residual_flags_on_fixture_and_oracle_shape(spark, sf_dir):
    """Real events table vs the DuckDB twin the r7 registration will ship
    (composite-key median walks + integer flag)."""
    import duckdb

    from kinesis_stream_video_project_spark.functions.numeric import scaled_long
    from kinesis_stream_video_project_spark.operators import stats

    e = io.load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    df = e.select(
        "event_id",
        "event_type",
        "ts",
        scaled_long(F.col("value"), 1000000).alias("vu"),
    )
    got = {
        (r.event_id, r.season)
        for r in stats.seasonal_residual_flags(
            df,
            key_cols=["event_type"],
            season_col=F.hour("ts"),
            value_col="vu",
            id_cols=["event_id"],
        ).collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = {
        (r[0], r[1])
        for r in con.sql(
            """
WITH vu AS (
  SELECT event_id, event_type, hour(ts) AS season,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vu
  FROM events WHERE value IS NOT NULL
),
cnt AS (SELECT event_type, season, vu AS v, COUNT(*) AS w FROM vu GROUP BY 1,2,3),
cum AS (
  SELECT event_type, season, v,
         SUM(w) OVER (PARTITION BY event_type, season ORDER BY v) AS cw,
         SUM(w) OVER (PARTITION BY event_type, season) AS tw
  FROM cnt
),
med AS (
  SELECT event_type, season, MIN(CASE WHEN 2*cw >= tw THEN v END) AS med
  FROM cum GROUP BY 1, 2
),
dev AS (
  SELECT v.event_type, v.season, ABS(v.vu - m.med) AS dv
  FROM vu v JOIN med m USING (event_type, season)
),
dcnt AS (SELECT event_type, season, dv, COUNT(*) AS w FROM dev GROUP BY 1,2,3),
dcum AS (
  SELECT event_type, season, dv,
         SUM(w) OVER (PARTITION BY event_type, season ORDER BY dv) AS cw,
         SUM(w) OVER (PARTITION BY event_type, season) AS tw
  FROM dcnt
),
mad AS (
  SELECT event_type, season, MIN(CASE WHEN 2*cw >= tw THEN dv END) AS mad
  FROM dcum GROUP BY 1, 2
)
SELECT v.event_id, v.season
FROM vu v JOIN med USING (event_type, season) JOIN mad USING (event_type, season)
WHERE ABS(v.vu - med.med) > 4 * mad.mad
"""
        ).fetchall()
    }
    assert got == want and len(got) > 0


def test_bigram_surprisal_overflow_guard(spark):
    """The per-term product c_prev·scale past BIGINT must refuse with a
    usable scale suggestion, never wrap (review finding, r6; the guard is
    an in-plan raise_error branch, so it surfaces at the first violating
    row of an action rather than as an extra driver-side scan job)."""
    import re

    import pytest

    d = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    with pytest.raises(Exception, match="exceeds BIGINT") as ei:
        # collect(), not count(): column pruning would drop the guarded
        # term entirely from a count-only plan (wrong values are never
        # OBSERVABLE without evaluating the term, so that is sound).
        lm.bigram_surprisal(d, scale=10**19).collect()
    # The per-row advice names the bound for the row that happened to
    # fail first (partition-order nondeterministic); the CORPUS-safe
    # scale divides by the hottest prev count — max(c_prev)=2 here.
    assert re.search(r"at most \d+", str(ei.value))
    corpus_safe = (2**63 - 1) // 2
    assert (
        lm.bigram_surprisal(d, scale=corpus_safe).collect()[0]["n_bigrams"]
        == 3
    )
