"""Verbatim span detection (r8 registration queue): hand-checked diagonal
islands, brute-force fixture equality, the validated DuckDB oracle shape,
the boilerplate df guard, and partition invariance."""

from __future__ import annotations

import hashlib

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators import spans

_L = 8

_ORACLE_SHAPE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, i.i AS pos,
         ('0x' || substr(md5(array_to_string(t[i.i:i.i+{Lm1}], ' ')), 1, 15))::BIGINT AS gh
  FROM toks, UNNEST(generate_series(1, len(t) - {Lm1})) AS i(i)
  WHERE len(t) >= {L}
),
ok AS (
  SELECT gh FROM (
    SELECT gh, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY gh
  ) WHERE df <= {max_df}
),
g AS (SELECT grams.* FROM grams JOIN ok USING (gh)),
m AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pos_a,
         a.pos - b.pos AS diag
  FROM g a JOIN g b ON a.gh = b.gh AND a.doc_id < b.doc_id
),
isl AS (
  SELECT doc_a, doc_b, diag,
         pos_a - row_number() OVER (
           PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS isl
  FROM m
),
runs AS (
  SELECT doc_a, doc_b, diag, isl, COUNT(*) AS run
  FROM isl GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b, CAST(SUM(run) AS BIGINT) AS n_shared_grams,
       CAST(MAX(run) + {Lm1} AS BIGINT) AS max_span_tokens
FROM runs GROUP BY 1, 2
"""


def oracle_sql(span_tokens: int = _L, max_df: int = 20) -> str:
    return _ORACLE_SHAPE.format(
        L=span_tokens, Lm1=span_tokens - 1, max_df=max_df
    )


def _brute(rows, span_tokens, max_df):
    """Python replay of the exact semantics (md5 hashes included, so a
    collision would affect brute force and engines identically)."""
    grams: dict = {}
    for doc_id, text in rows:
        toks = text.split(" ")
        if len(toks) < span_tokens:
            continue
        for p in range(len(toks) - span_tokens + 1):
            gram = " ".join(toks[p : p + span_tokens])
            gh = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
            grams.setdefault(gh, []).append((doc_id, p + 1))
    pair_matches: dict = {}
    for gh, posts in grams.items():
        if len({d for d, _ in posts}) > max_df:
            continue
        for da, pa in posts:
            for db, pb in posts:
                if da < db:
                    pair_matches.setdefault((da, db), set()).add((pa, pb))
    out = {}
    for pair, ms in pair_matches.items():
        by_diag: dict = {}
        for pa, pb in ms:
            by_diag.setdefault(pa - pb, []).append(pa)
        best = 0
        for poss in by_diag.values():
            poss.sort()
            run = 1
            for x, y in zip(poss, poss[1:]):
                run = run + 1 if y == x + 1 else 1
                best = max(best, run)
            best = max(best, run if len(poss) > 1 else 1)
        out[pair] = (len(ms), best + span_tokens - 1)
    return out


def test_verbatim_spans_handchecked(spark):
    """Planted spans with L=4: a 5-token shared run = 2 consecutive grams
    on one diagonal; a run split by one divergent token reports as two
    length-4 runs; a doc shorter than L emits nothing."""
    rows = [
        (1, "a b c d e f g h"),
        (2, "x x a b c d e y"),
        (3, "a b c d q e f g h"),
        (4, "a b c"),  # < L tokens: no grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): (r.n_shared_grams, r.max_span_tokens)
        for r in spans.verbatim_span_pairs(df, span_tokens=4).collect()
    }
    # 1-2: "a b c d e" = grams (1,3) and (2,4) on diag -2 -> span 5
    assert got[(1, 2)] == (2, 5)
    # 1-3: "a b c d" at (1,1) and "e f g h" at (5,6) -> two 1-gram runs
    assert got[(1, 3)] == (2, 4)
    # 2-3: only "a b c d" survives (the e-run diverges at q)
    assert got[(2, 3)] == (1, 4)
    assert not any(4 in pair for pair in got)
    assert got == _brute([(i, t) for i, t in rows], 4, 20)


def test_verbatim_spans_df_guard_drops_boilerplate(spark):
    """A gram shared by MORE than max_df docs must be excluded before the
    pair join (df² pair-row blowup, no pair-specific signal); pairs whose
    only overlap was that gram disappear."""
    boiler = "w x y z"
    rows = [(i, f"doc{i} unique{i} " + boiler) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wide = {
        (r.doc_a, r.doc_b)
        for r in spans.verbatim_span_pairs(df, span_tokens=4, max_df=10).collect()
    }
    assert len(wide) == 10  # all C(5,2) pairs share the boilerplate gram
    tight = spans.verbatim_span_pairs(df, span_tokens=4, max_df=3).collect()
    assert tight == []


def test_verbatim_spans_matches_bruteforce_on_fixture(spark, sf_dir):
    d = io.load_table(spark, sf_dir, "documents")
    got = {
        (r.doc_a, r.doc_b): (r.n_shared_grams, r.max_span_tokens)
        for r in spans.verbatim_span_pairs(d, span_tokens=_L).collect()
    }
    rows = [(r.doc_id, r.text) for r in d.collect()]
    want = _brute(rows, _L, 20)
    assert got == want and len(got) > 0


def test_verbatim_spans_oracle_shape_matches(spark, sf_dir):
    """The exact DuckDB twin an r8 registration would ship — validated now
    (the paste-don't-debug discipline)."""
    import duckdb

    d = io.load_table(spark, sf_dir, "documents")
    got = (
        spans.verbatim_span_pairs(d, span_tokens=_L)
        .orderBy("doc_a", "doc_b")
        .toPandas()
        .astype(str)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.sql(oracle_sql() + " ORDER BY doc_a, doc_b")
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0


def test_verbatim_spans_partition_invariant(spark, sf_dir):
    d = io.load_table(spark, sf_dir, "documents")
    a = {
        tuple(r)
        for r in spans.verbatim_span_pairs(d.repartition(13), span_tokens=_L).collect()
    }
    b = {
        tuple(r)
        for r in spans.verbatim_span_pairs(d.coalesce(1), span_tokens=_L).collect()
    }
    assert a == b and len(a) > 0
