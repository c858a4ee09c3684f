"""Round-12 registration queue: PPJoin positional filter over the exact
AllPairs tier, the Heaps-law vocabulary-growth curve, rare-shingle
nearest neighbors, Hamilton largest-remainder stratified allocation,
the left-outer stream-stream interval join, and counting-algebra
incremental view maintenance — pytest-verified with
validated DuckDB oracle shapes before registration (the
paste-don't-debug discipline, sixth round running)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators.dedup import (
    allpairs_jaccard_prefix,
)
from kinesis_stream_video_project_spark.operators.lm import heaps_law_curve
from kinesis_stream_video_project_spark.operators.retrieval import (
    rare_shingle_neighbors,
)
from kinesis_stream_video_project_spark.operators.sampling import (
    stratified_allocation,
)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def _rendered(df_pandas):
    cols = sorted(df_pandas.columns)
    return (
        df_pandas[cols].astype(str).sort_values(cols).reset_index(drop=True)
    )


def _con(sf):
    con = duckdb.connect()
    for t in ("events", "documents", "orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


# ---------------------------------------------------------------------------
# PPJoin positional filter (Xiao, Wang, Lin & Yu, WWW 2008)
# ---------------------------------------------------------------------------

ALLPAIRS_600_ORACLE_SHAPE = """
WITH toks AS (SELECT doc_id, unnest(list_distinct(list_transform(
         generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
         i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')))) AS tok
       FROM documents),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS ninter
          FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b, ninter AS inter, sa.n AS size_a, sb.n AS size_b,
       CAST((1000 * ninter) // (sa.n + sb.n - ninter) AS BIGINT) AS jaccard_permille
FROM inter
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE (1000 * ninter) // (sa.n + sb.n - ninter) >= 600
"""


@pytest.mark.parametrize("sf", SFS[:2] + SFS[2:])
@pytest.mark.parametrize("t", [500, 800])
def test_ppjoin_equals_prefix_form(spark, sf, t):
    """The positional filter must be output-invariant: it prunes
    CANDIDATES that verification would reject anyway, never pairs —
    checked pair-for-pair against the plain prefix form at every SF and
    two thresholds."""
    docs = io.load_table(spark, sf, "documents")
    key = lambda r: (  # noqa: E731
        r["doc_a"], r["doc_b"], r["inter"], r["size_a"], r["size_b"],
        r["jaccard_permille"],
    )
    base = sorted(key(r) for r in allpairs_jaccard_prefix(docs, t).collect())
    pos = sorted(
        key(r)
        for r in allpairs_jaccard_prefix(docs, t, positional=True).collect()
    )
    assert base == pos and len(base) > 0


def test_ppjoin_positional_filter_prunes_candidates(spark):
    """The filter's reason to exist, measured: on the sf0.1 corpus at
    t=800 the distinct verify-candidate set must shrink vs the plain
    prefix+length form (the exact figures live in the operator
    docstring; this pins the direction so a regression that silently
    disables the filter fails loudly)."""
    from pyspark.sql.window import Window

    from kinesis_stream_video_project_spark.operators.dedup import shingles_of

    tp = 800
    d = io.load_table(spark, "/root/testdata/sf0.1", "documents")
    staged = d.select(
        F.col("doc_id").alias("doc"), F.split("text", " ").alias("_toks")
    )
    toks = (
        staged.select(
            "doc", F.array_distinct(shingles_of(F.col("_toks"), 3)).alias("tok")
        )
        .withColumn("sz", F.size("tok").cast("long"))
        .localCheckpoint()
    )
    posting = toks.select("doc", "sz", F.explode("tok").alias("token"))
    dfreq = posting.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("doc").orderBy("_df", "token")
    prefix = (
        posting.join(dfreq, "token")
        .withColumn("_pos", F.row_number().over(w))
        .filter(
            F.col("_pos")
            <= F.col("sz") - F.expr(f"(sz * {tp} + 999) div 1000") + 1
        )
        .select("token", "doc", "sz", "_pos")
    )
    p2 = prefix.select(
        F.col("token"),
        F.col("doc").alias("doc_b"),
        F.col("sz").alias("size_b"),
        F.col("_pos").alias("_pos_b"),
    )
    lenf = (
        prefix.join(p2, "token")
        .filter(F.col("doc") < F.col("doc_b"))
        .filter(
            (F.col("size_b") * tp <= F.col("sz") * 1000)
            & (F.col("sz") * tp <= F.col("size_b") * 1000)
        )
    )
    posf = lenf.filter(
        (
            1
            + F.least(
                F.col("sz") - F.col("_pos"), F.col("size_b") - F.col("_pos_b")
            )
        )
        * (1000 + tp)
        >= tp * (F.col("sz") + F.col("size_b"))
    )
    n_len = lenf.select("doc", "doc_b").distinct().count()
    n_pos = posf.select("doc", "doc_b").distinct().count()
    assert n_pos < n_len, (n_pos, n_len)
    assert n_pos > 0


@pytest.mark.parametrize("sf", SFS)
def test_ppjoin_600_oracle_shape_matches(spark, sf):
    """The registration form (t=600, positional=True) bit-exact vs the
    DuckDB brute-force definitional oracle."""
    got = _rendered(
        allpairs_jaccard_prefix(
            io.load_table(spark, sf, "documents"), 600, positional=True
        ).toPandas()
    )
    con = _con(sf)
    want = _rendered(con.sql(ALLPAIRS_600_ORACLE_SHAPE).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0, sf


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth (3-shingle types, doc_id-range checkpoints)
# ---------------------------------------------------------------------------

HEAPS_ORACLE_SHAPE = """
WITH w AS (SELECT CAST((MAX(doc_id) + 20) // 20 AS BIGINT) AS w FROM documents),
t0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
occ AS (
  SELECT doc_id // (SELECT w FROM w) AS bucket, doc_id,
         unnest(list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS g
  FROM t0
),
occ2 AS (SELECT * FROM occ WHERE g IS NOT NULL AND g <> ''),
pb AS (SELECT bucket, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
              CAST(COUNT(*) AS BIGINT) AS n_tokens
       FROM occ2 GROUP BY 1),
fs AS (SELECT g, MIN(bucket) AS bucket FROM occ2 GROUP BY 1),
nt AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS new_types FROM fs GROUP BY 1)
SELECT pb.bucket, n_docs, n_tokens,
       CAST(COALESCE(new_types, 0) AS BIGINT) AS new_types,
       CAST(SUM(n_tokens) OVER (ORDER BY pb.bucket) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(new_types, 0)) OVER (ORDER BY pb.bucket) AS BIGINT)
         AS cum_types
FROM pb LEFT JOIN nt USING (bucket)
"""


def test_heaps_handchecked(spark):
    """Two buckets, crafted: doc 0 introduces both its shingles; doc 1
    (bucket 1) repeats one and introduces one new type."""
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "a b c e")], "doc_id long, text string"
    )
    rows = {
        r["bucket"]: (
            r["n_docs"], r["n_tokens"], r["new_types"],
            r["cum_tokens"], r["cum_types"],
        )
        for r in heaps_law_curve(df, n_buckets=2).collect()
    }
    # doc 0 -> shingles {a b c, b c d}; doc 1 -> {a b c, b c e}
    assert rows[0] == (1, 2, 2, 2, 2)
    assert rows[1] == (1, 2, 1, 4, 3)


def test_heaps_refuses_degenerate_buckets(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        heaps_law_curve(df, n_buckets=0)


@pytest.mark.parametrize("sf", SFS)
def test_heaps_oracle_shape_matches(spark, sf):
    got = _rendered(
        heaps_law_curve(io.load_table(spark, sf, "documents")).toPandas()
    )
    con = _con(sf)
    want = _rendered(con.sql(HEAPS_ORACLE_SHAPE).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) == 20, sf


def test_heaps_curve_is_nondegenerate_and_monotone(spark, sf_dir):
    """The reason 3-shingles are the type universe: new_types must be
    positive in bucket 0 AND somewhere after it (the unigram curve
    flatlines after bucket 0 — probed [31, 0, 0, ...]); cum columns
    must be nondecreasing."""
    rows = (
        heaps_law_curve(io.load_table(spark, sf_dir, "documents"))
        .orderBy("bucket")
        .collect()
    )
    nt = [r["new_types"] for r in rows]
    assert nt[0] > 0 and sum(nt[1:]) > 0
    cum_to = [r["cum_tokens"] for r in rows]
    cum_ty = [r["cum_types"] for r in rows]
    assert cum_to == sorted(cum_to) and cum_ty == sorted(cum_ty)


# ---------------------------------------------------------------------------
# Rare-shingle nearest neighbors (inverse-df-weighted overlap top-k)
# ---------------------------------------------------------------------------

NEIGHBORS_ORACLE_SHAPE = """
WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
posts AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(t) - 2, 1)),
           i -> array_to_string(list_slice(t, i, i + 2), ' ')))) AS g
  FROM t0
),
dfq AS (SELECT g, COUNT(*) AS df FROM posts GROUP BY 1
        HAVING COUNT(*) BETWEEN 2 AND 20),
wt AS (SELECT p.doc_id, p.g, CAST(1000000 // df AS BIGINT) AS wt
       FROM posts p JOIN dfq USING (g)),
pairs AS (
  SELECT a.doc_id, b.doc_id AS neighbor_id,
         CAST(COUNT(*) AS BIGINT) AS n_shared,
         CAST(SUM(a.wt) AS BIGINT) AS score_scaled
  FROM wt a JOIN wt b ON a.g = b.g AND a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT doc_id, neighbor_id, n_shared, score_scaled,
       CAST(row_number() OVER (
         PARTITION BY doc_id ORDER BY score_scaled DESC, neighbor_id
       ) AS BIGINT) AS rank
FROM pairs
QUALIFY rank <= 5
"""


def test_neighbors_handchecked(spark):
    """Three docs: 0 and 1 share the rare shingle of 'x y z'; doc 2
    shares nothing rare with them beyond the df cap; weight = 10^6//df."""
    df = spark.createDataFrame(
        [
            (0, "x y z p q"),
            (1, "x y z r s"),
            (2, "m n o u v"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["neighbor_id"]): (r["n_shared"], r["score_scaled"])
        for r in rare_shingle_neighbors(df, k=5, max_df=20).collect()
    }
    # shared distinct shingle: only 'x y z' (df=2, weight 500000)
    assert got == {(0, 1): (1, 500_000), (1, 0): (1, 500_000)}


def test_neighbors_refuses_bad_params(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        rare_shingle_neighbors(df, k=0)
    with pytest.raises(ValueError):
        rare_shingle_neighbors(df, max_df=1)


def test_neighbors_df_cap_excludes_ubiquitous_shingles(spark):
    """A shingle present in MORE than max_df docs contributes nothing —
    the boilerplate defense: 4 docs sharing 'a b c' pair only through
    it at max_df>=4, not at max_df=3."""
    rows = [(i, "a b c " + f"u{i} v{i} w{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert rare_shingle_neighbors(df, k=3, max_df=3).count() == 0
    got = rare_shingle_neighbors(df, k=3, max_df=4)
    assert got.count() == 12  # each of 4 docs has 3 neighbors


@pytest.mark.parametrize("sf", SFS)
def test_neighbors_oracle_shape_matches(spark, sf):
    got = _rendered(
        rare_shingle_neighbors(
            io.load_table(spark, sf, "documents")
        ).toPandas()
    )
    con = _con(sf)
    want = _rendered(con.sql(NEIGHBORS_ORACLE_SHAPE).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0, sf


# ---------------------------------------------------------------------------
# Hamilton largest-remainder stratified allocation
# ---------------------------------------------------------------------------

ALLOC_ORACLE_SHAPE = """
WITH c AS (SELECT o_orderpriority AS stratum, CAST(COUNT(*) AS BIGINT) AS n_rows
           FROM orders GROUP BY 1),
n AS (SELECT SUM(n_rows) AS nn FROM c),
b AS (SELECT stratum, n_rows,
             (1000 * n_rows) // nn AS fl, (1000 * n_rows) % nn AS rem
      FROM c, n),
l AS (SELECT 1000 - SUM(fl) AS leftover FROM b),
a AS (SELECT stratum, n_rows,
             CAST(fl + CASE WHEN row_number() OVER (ORDER BY rem DESC, stratum ASC)
                                 <= (SELECT leftover FROM l)
                            THEN 1 ELSE 0 END AS BIGINT) AS alloc
      FROM b),
s AS (SELECT o_orderpriority AS stratum, o_orderkey,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 1000000,
                        o_orderkey) AS rk
      FROM orders),
ns AS (SELECT stratum, CAST(COUNT(*) AS BIGINT) AS n_sampled
       FROM s JOIN a USING (stratum) WHERE rk <= alloc GROUP BY 1)
SELECT a.stratum, a.n_rows, a.alloc,
       CAST(COALESCE(ns.n_sampled, 0) AS BIGINT) AS n_sampled
FROM a LEFT JOIN ns USING (stratum)
"""


def test_allocation_handchecked_largest_remainder(spark):
    """Budget 10 over strata of 7/2/1 rows: quotas 7.0/2.0/1.0 — exact;
    budget 10 over 5/3/2: quotas 5/3/2 exact; budget 7 over 5/3/2 rows
    (N=10): quotas 3.5/2.1/1.4, floors 3/2/1 (sum 6), remainders
    .5/.1/.4 -> the one leftover seat goes to stratum A (largest
    remainder 5/10)."""
    rows = (
        [("A", i) for i in range(5)]
        + [("B", 100 + i) for i in range(3)]
        + [("C", 200 + i) for i in range(2)]
    )
    df = spark.createDataFrame(rows, "src string, k long")
    got = {
        r["stratum"]: (r["n_rows"], r["alloc"], r["n_sampled"])
        for r in stratified_allocation(df, "src", 7, "k").collect()
    }
    assert got == {"A": (5, 4, 4), "B": (3, 2, 2), "C": (2, 1, 1)}


def test_allocation_tie_goes_to_smaller_stratum_key(spark):
    """Equal remainders: the leftover seat goes to the lexically
    smallest stratum (stated tie rule). Two strata of 1 row each,
    budget 1: remainders both 1/2 -> 'A' wins."""
    df = spark.createDataFrame(
        [("A", 1), ("B", 2)], "src string, k long"
    )
    got = {
        r["stratum"]: r["alloc"]
        for r in stratified_allocation(df, "src", 1, "k").collect()
    }
    assert got == {"A": 1, "B": 0}


def test_allocation_sums_to_budget_exactly(spark, sf_dir):
    """The property Hamilton exists for: sum(alloc) == budget EXACTLY
    (independent per-stratum rounding cannot promise this), and every
    stratum actually yields its allocation."""
    o = io.load_table(spark, sf_dir, "orders")
    rows = stratified_allocation(o, "o_orderpriority", 777, "o_orderkey").collect()
    assert sum(r["alloc"] for r in rows) == 777
    assert all(r["n_sampled"] == r["alloc"] for r in rows)


def test_allocation_refuses_negative_budget(spark):
    df = spark.createDataFrame([("A", 1)], "src string, k long")
    with pytest.raises(ValueError):
        stratified_allocation(df, "src", -1, "k")


@pytest.mark.parametrize("sf", SFS)
def test_allocation_oracle_shape_matches(spark, sf):
    got = _rendered(
        stratified_allocation(
            io.load_table(spark, sf, "orders"), "o_orderpriority", 1000,
            "o_orderkey",
        ).toPandas()
    )
    con = _con(sf)
    want = _rendered(con.sql(ALLOC_ORACLE_SHAPE).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) == 5, sf


# ---------------------------------------------------------------------------
# Pre-wired r12 module lockstep (the r11-module discipline)
# ---------------------------------------------------------------------------


def test_round12_module_entries_match_oracles(spark):
    """The driver-style rendered-value check over every pre-wired r12
    query at sf0.01 — the same gate the registry sweep applies, run
    against the module that will be registered when a window has room.
    Keeps the module in lockstep with any operator-signature change
    between now and registration (the r11 VERDICT item-6 discipline)."""
    from kinesis_stream_video_project_spark.plans import queries_round12 as q12

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    assert len(q12.QUERIES) == 7
    for name, fn in q12.QUERIES.items():
        got = fn(spark, sf).toPandas()
        want = con.sql(q12.ORACLES[name]).df()
        assert sorted(got.columns) == sorted(want.columns), name
        assert _rendered(got).equals(_rendered(want)), name
        assert len(got) > 0, name


# ---------------------------------------------------------------------------
# Scale-correct global rank / exact ntile (the rfm plan-guard rewrite)
# ---------------------------------------------------------------------------


def test_global_row_number_equals_window_form(spark):
    """The range-repartitioned rank must equal the single-partition
    window row_number on the same total order — checked over a frame
    spread across many partitions with adversarial value order."""
    from pyspark.sql.window import Window

    from kinesis_stream_video_project_spark.operators.ranking import (
        global_row_number,
    )

    rows = [(i, (i * 37) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(16)
    got = {
        r["k"]: r["_rn"]
        for r in global_row_number(df, ["v", "k"]).collect()
    }
    want = {
        r["k"]: r["_rn"]
        for r in df.withColumn(
            "_rn", F.row_number().over(Window.orderBy("v", "k"))
        ).collect()
    }
    assert got == want and len(got) == 500


@pytest.mark.parametrize("n,k", [(10, 4), (12, 4), (3, 4), (1, 1), (7, 3), (100, 7)])
def test_exact_ntile_equals_sql_ntile(spark, n, k):
    """The closed-form bucket rule must reproduce SQL ntile(k) exactly,
    including N < k (every bucket size 1) and uneven remainders."""
    from pyspark.sql.window import Window

    from kinesis_stream_video_project_spark.operators.ranking import exact_ntile

    rows = [(i, (i * 13) % 29) for i in range(n)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(8)
    got = {
        r["k"]: r["b"] for r in exact_ntile(df, ["v", "k"], k, "b").collect()
    }
    want = {
        r["k"]: r["b"]
        for r in df.withColumn(
            "b", F.ntile(k).over(Window.orderBy("v", "k")).cast("long")
        ).collect()
    }
    assert got == want and len(got) == n


def test_global_row_number_plan_has_no_singlepartition_window(spark):
    """The primitive's reason to exist: the physical plan must carry a
    range exchange and NO Window-over-SinglePartition (the guard
    pattern), i.e. the global sort is parallel."""
    import re

    from kinesis_stream_video_project_spark.operators.ranking import (
        global_row_number,
    )

    df = spark.createDataFrame(
        [(i, i % 7) for i in range(100)], "k long, v long"
    )
    out = global_row_number(df, ["v", "k"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    pat = re.compile(
        r"Window .*\n.*?Sort .*\n.*?Exchange SinglePartition", re.MULTILINE
    )
    assert not pat.search(plan), plan
    # the range sort itself ran eagerly inside the localCheckpoint (the
    # plan starts at Scan ExistingRDD), so what the downstream plan can
    # show is: the ONLY window is partitioned on _gpid — never global
    assert "windowspecdefinition(_gpid" in plan, plan


# ---------------------------------------------------------------------------
# Incremental view maintenance (counting algebra, Blakeley et al. 1986)
# ---------------------------------------------------------------------------


def test_ivm_merge_handchecked(spark):
    """Base A(2 rows, 30), B(1, 5); delta D(A,10), D(B,5), I(C,7):
    A keeps one row totalling 20, B's count reaches zero and leaves the
    view, C appears fresh."""
    from kinesis_stream_video_project_spark.operators import ivm

    base = spark.createDataFrame(
        [("A", 10), ("A", 20), ("B", 5)], "k string, v long"
    )
    base_agg = ivm.agg_state(base, "k", "v")
    delta = spark.createDataFrame(
        [("A", 10, "D"), ("B", 5, "D"), ("C", 7, "I")],
        "k string, v long, op string",
    )
    got = {
        r["key"]: (r["n_rows"], r["total"])
        for r in ivm.merge_agg_deltas(base_agg, delta, "k", "v").collect()
    }
    assert got == {"A": (1, 20), "C": (1, 7)}


def test_ivm_refuses_corrupt_changelogs(spark):
    """A delete for a key the base never had (negative count) and an
    unknown op must fail LOUDLY in-plan — clamping would hide upstream
    corruption inside a 'successful' refresh."""
    from pyspark.errors import SparkRuntimeException

    from kinesis_stream_video_project_spark.operators import ivm

    base = spark.createDataFrame([("A", 10)], "k string, v long")
    base_agg = ivm.agg_state(base, "k", "v")
    bad_delete = spark.createDataFrame(
        [("Z", 3, "D")], "k string, v long, op string"
    )
    with pytest.raises(SparkRuntimeException):
        ivm.merge_agg_deltas(base_agg, bad_delete, "k", "v").collect()
    bad_op = spark.createDataFrame(
        [("A", 3, "X")], "k string, v long, op string"
    )
    with pytest.raises(SparkRuntimeException):
        ivm.merge_agg_deltas(base_agg, bad_op, "k", "v").collect()


def test_ivm_incremental_equals_recompute(spark, sf_dir):
    """The algebra's contract on real data: merge(V(base), delta) must
    equal agg_state over the final row set, and the fixture split must
    exercise BOTH interesting branches — a key leaving the view
    entirely and a key born from inserts alone."""
    from kinesis_stream_video_project_spark.operators import ivm
    from kinesis_stream_video_project_spark.operators.sampling import (
        hash_bucket,
    )

    o = io.load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("_cents"),
    )
    b = hash_bucket(F.col("o_orderkey"))
    bc = hash_bucket(F.col("o_custkey"), 100)
    base = o.filter(b < 80)
    deletes = base.filter(bc < 5)
    inserts = o.filter((b >= 80) & (bc >= 5))
    merged = ivm.merge_agg_deltas(
        ivm.agg_state(base, "o_custkey", "_cents"),
        deletes.withColumn("op", F.lit("D")).unionByName(
            inserts.withColumn("op", F.lit("I"))
        ),
        "o_custkey",
        "_cents",
    )
    final_rows = base.join(
        deletes.select("o_orderkey"), "o_orderkey", "left_anti"
    ).unionByName(inserts)
    recomputed = ivm.agg_state(final_rows, "o_custkey", "_cents")
    got = {r["key"]: (r["n_rows"], r["total"]) for r in merged.collect()}
    want = {
        r["key"]: (r["n_rows"], r["total"]) for r in recomputed.collect()
    }
    assert got == want and len(got) > 0
    base_keys = {r["key"] for r in ivm.agg_state(base, "o_custkey", "_cents").collect()}
    assert base_keys - set(got), "no key left the view — split degenerate"
    assert set(got) - base_keys, "no insert-born key — split degenerate"


@pytest.mark.parametrize("sf", SFS)
def test_ivm_oracle_shape_matches(spark, sf):
    from kinesis_stream_video_project_spark.plans import queries_round12 as q12

    got = _rendered(q12.QUERIES["ivm_orders_by_custkey"](spark, sf).toPandas())
    con = _con(sf)
    want = _rendered(con.sql(q12.ORACLES["ivm_orders_by_custkey"]).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0, sf


def test_ivm_stream_fold_chunking_invariance():
    """The online IVM fold is a pure sum — commutative and
    chunking-invariant by construction; pinned the way every dual-API
    fold in the repo is (hypothesis, 100 examples)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesis_stream_video_project_spark.streaming.jobs import (
        _ivm_stream_fold,
    )

    rows_st = st.lists(
        st.tuples(st.sampled_from(["I", "D"]), st.integers(-1000, 1000)),
        max_size=40,
    )

    @settings(max_examples=100, deadline=None)
    @given(rows=rows_st, cut=st.integers(0, 40), seed=st.randoms())
    def inner(rows, cut, seed):
        whole = _ivm_stream_fold(0, 0, rows)
        cut = min(cut, len(rows))
        n, t = _ivm_stream_fold(0, 0, rows[:cut])
        chunked = _ivm_stream_fold(n, t, rows[cut:])
        assert whole == chunked
        shuffled = list(rows)
        seed.shuffle(shuffled)
        assert _ivm_stream_fold(0, 0, shuffled) == whole

    inner()


def test_ivm_stream_fold_refuses_unknown_op():
    from kinesis_stream_video_project_spark.streaming.jobs import (
        _ivm_stream_fold,
    )

    with pytest.raises(ValueError, match="unknown op"):
        _ivm_stream_fold(0, 0, [("X", 1)])


def test_allocation_budget_law_hypothesis(spark):
    """Hamilton's defining law over random strata shapes: for any
    multiset of stratum sizes and any budget ≤ N, sum(alloc) == budget
    and every alloc ≤ its stratum size (hypothesis, driver-side math
    checked through the real operator on small frames)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesis_stream_video_project_spark.operators.sampling import (
        stratified_allocation,
    )

    @settings(max_examples=12, deadline=None)
    @given(
        sizes=st.lists(st.integers(1, 9), min_size=1, max_size=5),
        budget_frac=st.integers(0, 100),
    )
    def inner(sizes, budget_frac):
        n = sum(sizes)
        budget = (n * budget_frac) // 100
        rows = []
        k = 0
        for si, sz in enumerate(sizes):
            for _ in range(sz):
                rows.append((f"s{si}", k))
                k += 1
        df = spark.createDataFrame(rows, "src string, k long")
        out = stratified_allocation(df, "src", budget, "k").collect()
        assert sum(r["alloc"] for r in out) == budget
        by = {r["stratum"]: r for r in out}
        for si, sz in enumerate(sizes):
            r = by[f"s{si}"]
            assert r["alloc"] <= sz and r["n_sampled"] == r["alloc"]

    inner()


# ---------------------------------------------------------------------------
# Multiwindow SLO burn-rate alerts (Google SRE Workbook ch. 5)
# ---------------------------------------------------------------------------

BURN_ORACLE_SHAPE = """
WITH led AS (
  SELECT epoch_us(ts) // 60000000 AS m,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errors,
         COUNT(*) AS total
  FROM events GROUP BY 1
),
sc AS (
  SELECT m,
         SUM(errors) OVER (ORDER BY m RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS le,
         SUM(total)  OVER (ORDER BY m RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS lt,
         SUM(errors) OVER (ORDER BY m RANGE BETWEEN 4 PRECEDING AND CURRENT ROW) AS se,
         SUM(total)  OVER (ORDER BY m RANGE BETWEEN 4 PRECEDING AND CURRENT ROW) AS st
  FROM led
)
SELECT CAST(m * 60000000 AS BIGINT) AS minute_us,
       CAST(le AS BIGINT) AS long_errors, CAST(lt AS BIGINT) AS long_total,
       CAST(se AS BIGINT) AS short_errors, CAST(st AS BIGINT) AS short_total,
       CAST((le * 1000 * 1000) // (230 * lt) AS BIGINT) AS long_burn_permille,
       CAST((se * 1000 * 1000) // (230 * st) AS BIGINT) AS short_burn_permille
FROM sc
WHERE le * 1000 * 1000 > 1000 * 230 * lt
  AND se * 1000 * 1000 > 1000 * 230 * st
"""


def test_burn_rate_handchecked(spark):
    """Crafted series, SLO 500 (budget 500), burn 1x, windows 3m/1m:
    minutes 0-2 are clean (ratio 0), minute 3 is all errors — its
    short window (itself) burns 2x and its long window (m1-m3) burns
    at ratio 1/3 < 1/2... so NO alert; minutes 4-5 all errors push the
    long window over — multiwindow means the sustained signal gates
    the instantaneous one."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    rows = []
    eid = 0
    # minutes 0-2: 2 views each; minutes 3-5: 2 errors each
    for m in range(6):
        for _ in range(2):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(minutes=m), 1,
                 "error" if m >= 3 else "view", 1.0, "{}")
            )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from kinesis_stream_video_project_spark.operators.slo import (
        burn_rate_alerts,
    )

    got = sorted(
        r["minute_us"] // 60_000_000 % 10_000_000
        for r in burn_rate_alerts(
            ev, slo_permille=500, burn_x_permille=1000,
            long_minutes=3, short_minutes=1,
        ).collect()
    )
    base_m = int(base.timestamp()) // 60
    # m3: long window (m1-m3) ratio 2/6 = 333 <= 500 -> no alert;
    # m4: long (m2-m4) 4/6 = 666 > 500 AND short 2/2 -> alert;
    # m5: long (m3-m5) 6/6 AND short 2/2 -> alert
    assert got == [
        (base_m + 4) % 10_000_000, (base_m + 5) % 10_000_000
    ]


def test_burn_rate_multiday_long_window(spark):
    """The SRE-workbook TICKET rule's long window is 4320 minutes (3
    days) — wider than one day partition, so the stitch must copy each
    prior day's tail into EVERY later day it can still reach (advisor
    finding: a one-day stitch silently truncated the window).  Pinned
    bit-exact against a pure-pandas unpartitioned trailing window over
    a 5-day series whose error bursts sit just after day boundaries."""
    import datetime as dt

    import pandas as pd

    base = dt.datetime(2025, 3, 1, tzinfo=dt.timezone.utc)
    rows, eid = [], 0
    # one event every 37 minutes across 5 days; errors in bursts that
    # start shortly after each midnight so the multi-day lookback is
    # what decides the alert
    for i in range(5 * 1440 // 37):
        m = i * 37
        is_err = (m % 1440) < 300 and (m // 1440) in (1, 2, 3)
        eid += 1
        rows.append(
            (eid, base + dt.timedelta(minutes=m), 1,
             "error" if is_err else "view", 1.0, "{}")
        )
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from kinesis_stream_video_project_spark.operators.slo import (
        burn_rate_alerts,
    )

    long_m, short_m, slo, burn = 4320, 360, 900, 1000
    got = sorted(
        (r["minute_us"], r["long_errors"], r["long_total"],
         r["short_errors"], r["short_total"])
        for r in burn_rate_alerts(
            ev, slo_permille=slo, burn_x_permille=burn,
            long_minutes=long_m, short_minutes=short_m,
        ).collect()
    )
    led = (
        pd.DataFrame(rows, columns=["e", "ts", "u", "t", "v", "p"])
        .assign(m=lambda d: d["ts"].astype("int64") // (60 * 10**9),
                err=lambda d: (d["t"] == "error").astype(int))
        .groupby("m")
        .agg(errors=("err", "sum"), total=("err", "size"))
        .reset_index()
        .sort_values("m")
    )
    budget = 1000 - slo
    want = []
    for _, r in led.iterrows():
        lw = led[(led["m"] >= r["m"] - (long_m - 1)) & (led["m"] <= r["m"])]
        sw = led[(led["m"] >= r["m"] - (short_m - 1)) & (led["m"] <= r["m"])]
        le, lt = int(lw["errors"].sum()), int(lw["total"].sum())
        se, st = int(sw["errors"].sum()), int(sw["total"].sum())
        if (le * 1000 * 1000 > burn * budget * lt
                and se * 1000 * 1000 > burn * budget * st):
            want.append((int(r["m"]) * 60_000_000, le, lt, se, st))
    assert len(want) > 0  # the scenario actually alerts
    assert got == sorted(want)


def test_burn_rate_refuses_degenerate_params(spark):
    from kinesis_stream_video_project_spark.operators.slo import (
        burn_rate_alerts,
    )

    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string"
    )
    with pytest.raises(ValueError, match="no error budget"):
        burn_rate_alerts(ev, slo_permille=1000)
    with pytest.raises(ValueError, match="short_minutes"):
        burn_rate_alerts(ev, short_minutes=60, long_minutes=60)


@pytest.mark.parametrize("sf", SFS)
def test_burn_rate_oracle_shape_matches(spark, sf):
    """Bit-exact vs the DuckDB global-RANGE-window replay at the
    registration parameters (SLO 770permille, 1x burn, 60m/5m) — the day
    -partition stitch must be invisible in the output. Non-degenerate
    BOTH ways (some minutes alert, not all: 218/988, 1728/8961,
    3620/38859 probed)."""
    from kinesis_stream_video_project_spark.operators.slo import (
        burn_rate_alerts,
    )

    got = burn_rate_alerts(
        io.load_table(spark, sf, "events"),
        slo_permille=770, burn_x_permille=1000,
    )
    con = _con(sf)
    want = con.sql(BURN_ORACLE_SHAPE).df()
    n_alert = len(want)
    gp = _rendered(got.toPandas())
    assert list(gp.columns) == list(_rendered(want).columns)
    assert gp.equals(_rendered(want)), sf
    n_minutes = con.sql(
        "SELECT COUNT(DISTINCT epoch_us(ts) // 60000000) FROM events"
    ).fetchone()[0]
    assert 0 < n_alert < n_minutes, (sf, n_alert, n_minutes)
