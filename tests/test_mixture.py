"""Budget-fill mixture assembly (r7 registration queue): hand-checked
waterfall, brute-force equality on the fixture, the validated DuckDB
oracle shape, and the boundary edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.functions.text import tokens
from kinesis_stream_video_project_spark.operators import mixture

_ORACLE_SHAPE = """
WITH d AS (
  SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
tot AS (
  SELECT source, SUM(n_tokens) AS src_tokens, COUNT(*) AS src_docs FROM d GROUP BY source
),
led AS (
  SELECT source, src_tokens, src_docs,
         greatest(0, least({budget} - (SUM(src_tokens) OVER (ORDER BY source) - src_tokens),
                           src_tokens)) AS remaining
  FROM tot
),
part AS (
  SELECT d.source,
         CAST(COUNT(*) AS BIGINT) AS n_docs_taken,
         CAST(SUM(n_tokens) AS BIGINT) AS tokens_taken
  FROM (
    SELECT d.source, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY d.source ORDER BY doc_id) AS cum,
           led.remaining
    FROM d JOIN led USING (source)
    WHERE led.remaining > 0 AND led.remaining < led.src_tokens
  ) d
  WHERE cum <= remaining
  GROUP BY d.source
)
SELECT source,
       CAST(src_docs AS BIGINT) AS n_docs_taken,
       CAST(src_tokens AS BIGINT) AS tokens_taken
FROM led WHERE remaining >= src_tokens
UNION ALL
SELECT source, n_docs_taken, tokens_taken FROM part
UNION ALL
SELECT source, 0, 0 FROM led WHERE remaining <= 0 AND src_tokens > 0
UNION ALL
SELECT source, 0, 0 FROM led
WHERE remaining > 0 AND remaining < src_tokens
  AND source NOT IN (SELECT source FROM part)
"""


def _fixture_docs(spark, sf_dir):
    d = io.load_table(spark, sf_dir, "documents")
    return d.select(
        "source", "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
    )


def test_budget_fill_handchecked(spark):
    rows = [
        ("a", 1, 10), ("a", 2, 10),          # 20 tokens total
        ("b", 3, 10), ("b", 4, 100), ("b", 5, 5),  # boundary source
        ("c", 6, 1),                          # past the budget
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    got = {
        r.source: (r.n_docs_taken, r.tokens_taken)
        for r in mixture.budget_fill(df, budget_tokens=40).collect()
    }
    # a fits whole (20); b's remaining is 20: doc 3 (10) fits, doc 4
    # (100) overflows and STOPS the source (doc 5 may not leapfrog);
    # c gets nothing.
    assert got == {"a": (2, 20), "b": (1, 10), "c": (0, 0)}


def test_budget_fill_first_doc_overflow_boundary(spark):
    rows = [("a", 1, 10), ("b", 2, 100), ("c", 3, 1)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    got = {
        r.source: (r.n_docs_taken, r.tokens_taken)
        for r in mixture.budget_fill(df, budget_tokens=50).collect()
    }
    assert got == {"a": (1, 10), "b": (0, 0), "c": (0, 0)}


def test_budget_fill_zero_token_source_single_row(spark):
    """A source whose total token count is 0 satisfied BOTH the
    whole-source (>=) and empty (<=0) branch predicates and emitted two
    contradictory rows (review finding, r6). The canonical row is the
    whole branch's (source, n_docs, 0) — every zero-token doc fits any
    budget — and each source must appear exactly once, budget 0
    included."""
    rows = [("a", 1, 10), ("b", 2, 0), ("b", 3, 0), ("c", 4, 5)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    out = mixture.budget_fill(df, budget_tokens=10).collect()
    assert len(out) == 3  # one row per source, no duplicates
    got = {r.source: (r.n_docs_taken, r.tokens_taken) for r in out}
    assert got == {"a": (1, 10), "b": (2, 0), "c": (0, 0)}
    # budget exhausted before the zero-token source: still one row,
    # still "taken" (its docs cost nothing).
    out0 = mixture.budget_fill(df, budget_tokens=0).collect()
    assert len(out0) == 3
    got0 = {r.source: (r.n_docs_taken, r.tokens_taken) for r in out0}
    assert got0 == {"a": (0, 0), "b": (2, 0), "c": (0, 0)}


def test_budget_fill_matches_bruteforce_on_fixture(spark, sf_dir):
    df = _fixture_docs(spark, sf_dir)
    rows = sorted(
        ((r.source, r.doc_id, r.n_tokens) for r in df.collect()),
        key=lambda t: (t[0], t[1]),
    )
    total = sum(t[2] for t in rows)
    budget = total // 3  # lands the boundary inside a middle source
    # Brute force mirrors the SPEC: allocation cascades by FULL source
    # totals (unused boundary budget is forfeited, not rolled forward).
    want: dict = {}
    before = 0
    by_src: dict = {}
    for src, _id, tok in rows:
        by_src.setdefault(src, []).append(tok)
    for src in sorted(by_src):
        want[src] = [0, 0]
        allocation = max(0, min(budget - before, sum(by_src[src])))
        cum = 0
        for tok in by_src[src]:
            if cum + tok > allocation:
                break
            cum += tok
            want[src][0] += 1
            want[src][1] += tok
        before += sum(by_src[src])
    got = {
        r.source: [r.n_docs_taken, r.tokens_taken]
        for r in mixture.budget_fill(df, budget_tokens=budget).collect()
    }
    assert got == want
    assert sum(v[1] for v in got.values()) <= budget


def test_budget_fill_oracle_shape_matches(spark, sf_dir):
    import duckdb

    df = _fixture_docs(spark, sf_dir)
    total = df.agg(F.sum("n_tokens")).first()[0]
    budget = int(total) // 3
    got = (
        mixture.budget_fill(df, budget_tokens=budget)
        .orderBy("source")
        .toPandas()
        .astype(str)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.sql(_ORACLE_SHAPE.format(budget=budget) + " ORDER BY source")
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want)
