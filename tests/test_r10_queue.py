"""Round-10 registration queue: Count-Min sketch audit, Good-Turing
frequency spectrum, Z-order locality audit, exact range-partition
bounds — pytest-verified with validated DuckDB oracle shapes before
registration (the paste-don't-debug discipline, fifth round running)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators import cms, layout
from kinesis_stream_video_project_spark.operators.lm import good_turing_counts

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
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

CMS_ORACLE_SHAPE = """
WITH ev AS (SELECT user_id FROM events),
exact AS (SELECT user_id, COUNT(*) AS exact_cnt FROM ev GROUP BY user_id),
cells AS (
  SELECT j,
         (('0x' || substr(md5(j || ':' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % {w}) AS bucket,
         COUNT(*) AS cnt
  FROM ev, (SELECT UNNEST([0, 1, 2]) AS j)
  GROUP BY 1, 2
),
est AS (
  SELECT e.user_id, e.exact_cnt, MIN(s.cnt) AS cms_est
  FROM exact e, (SELECT UNNEST([0, 1, 2]) AS j) d
  JOIN cells s
    ON s.j = d.j
   AND s.bucket = (('0x' || substr(md5(d.j || ':' || CAST(e.user_id AS VARCHAR)), 1, 8))::BIGINT % {w})
  GROUP BY 1, 2
)
SELECT user_id, CAST(exact_cnt AS BIGINT) AS exact_cnt,
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overcount
FROM est
"""


def test_cms_bucket_portable(spark):
    """Row-j buckets must equal DuckDB's md5-substring derivation."""
    df = spark.createDataFrame([(42,), (7,)], "user_id long")
    got = {
        (r["user_id"], j): r[f"b{j}"]
        for r in df.select(
            "user_id",
            *[cms.cms_bucket(F.col("user_id"), j, 16).alias(f"b{j}") for j in range(3)],
        ).collect()
        for j in range(3)
    }
    for (k, j), b in got.items():
        want = duckdb.sql(
            f"SELECT ('0x' || substr(md5('{j}:{k}'), 1, 8))::BIGINT % 16"
        ).fetchone()[0]
        assert b == want, (k, j, b, want)


def test_cms_handchecked(spark):
    """3 keys, width 2: every estimate >= exact, sum invariant per row."""
    rows = [(1,)] * 5 + [(2,)] * 3 + [(3,)] * 2
    df = spark.createDataFrame(rows, "user_id long")
    sk = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms.cms_sketch(df, "user_id", width=2, depth=3).collect()
    }
    for j in range(3):
        assert sum(v for (jj, _), v in sk.items() if jj == j) == 10
    est = cms.cms_estimates(df, "user_id", width=2, depth=3).collect()
    exact = {1: 5, 2: 3, 3: 2}
    assert len(est) == 3
    for r in est:
        assert r["exact_cnt"] == exact[r["user_id"]]
        assert r["cms_est"] >= r["exact_cnt"]
        assert r["overcount"] == r["cms_est"] - r["exact_cnt"]


def test_cms_rejects_degenerate_params(spark):
    df = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(ValueError):
        cms.cms_sketch(df, "user_id", width=1)
    with pytest.raises(ValueError):
        cms.cms_sketch(df, "user_id", width=8, depth=0)


@pytest.mark.parametrize("sf", SFS)
def test_cms_oracle_shape_matches(spark, sf):
    got = cms.cms_estimates(
        io.load_table(spark, sf, "events"), "user_id", width=16, depth=3
    )
    con = _con(sf)
    want = con.sql(CMS_ORACLE_SHAPE.format(w=16)).df()
    assert _rendered(got.toPandas()).equals(_rendered(want)), sf
    # one-sided error law over EVERY key
    assert got.filter(F.col("cms_est") < F.col("exact_cnt")).count() == 0


# ---------------------------------------------------------------------------
# Good-Turing frequency-of-frequencies (Good 1953; Gale & Sampson 1995)
# ---------------------------------------------------------------------------

GT_ORACLE_SHAPE = """
WITH toks AS (
  SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
),
tc AS (SELECT w, COUNT(*) AS r FROM toks WHERE w IS NOT NULL AND w <> '' GROUP BY w),
spec AS (SELECT r, COUNT(*) AS n_r FROM tc GROUP BY r)
SELECT CAST(s.r AS BIGINT) AS r, CAST(s.n_r AS BIGINT) AS n_r,
       CAST(((s.r + 1) * COALESCE(n1.n_r, 0) * 1000000) // s.n_r AS BIGINT) AS r_star_scaled
FROM spec s LEFT JOIN spec n1 ON n1.r = s.r + 1
"""


def test_good_turing_handchecked(spark):
    # terms: a a a b b c  ->  r=1:{c}, r=2:{b}, r=3:{a}
    df = spark.createDataFrame([(1, "a a a b b c")], "doc_id long, text string")
    got = {r["r"]: (r["n_r"], r["r_star_scaled"]) for r in good_turing_counts(df).collect()}
    # r=1: n_1=1, r* = 2*n_2/n_1 = 2*1/1 -> 2_000_000
    # r=2: n_2=1, r* = 3*n_3/n_2 = 3*1/1 -> 3_000_000
    # r=3: n_3=1, n_4=0 -> 0
    assert got == {1: (1, 2_000_000), 2: (1, 3_000_000), 3: (1, 0)}


@pytest.mark.parametrize("sf", SFS)
def test_good_turing_oracle_shape_matches(spark, sf):
    got = good_turing_counts(io.load_table(spark, sf, "documents"))
    con = _con(sf)
    want = con.sql(GT_ORACLE_SHAPE).df()
    assert _rendered(got.toPandas()).equals(_rendered(want)), sf


# ---------------------------------------------------------------------------
# Z-order locality audit
# ---------------------------------------------------------------------------


def _zorder_interleave_sql(xe: str, ye: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({xe} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ye} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


ZORDER_ORACLE_SHAPE = """
WITH base AS (
  SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS x,
         CAST(o_custkey AS BIGINT) AS y
  FROM orders
),
ymax AS (SELECT MAX(y) AS my FROM base),
keyed AS (
  SELECT (x BETWEEN 1460 AND 1825
          AND y BETWEEN (SELECT my FROM ymax) // 10 AND (SELECT my FROM ymax) // 5) AS hit,
         ({z}) >> {shift} AS zb,
         ((x << {bits}) + y) >> {shift} AS rb
  FROM base
),
zt AS (SELECT DISTINCT zb FROM keyed WHERE hit),
rt AS (SELECT DISTINCT rb FROM keyed WHERE hit),
z AS (
  SELECT 'zorder' AS layout,
         SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS n_rect_rows,
         COUNT(DISTINCT zb) AS n_blocks_touched,
         COUNT(*) AS n_rows_read
  FROM keyed WHERE zb IN (SELECT zb FROM zt)
),
r AS (
  SELECT 'rowmajor' AS layout,
         SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS n_rect_rows,
         COUNT(DISTINCT rb) AS n_blocks_touched,
         COUNT(*) AS n_rows_read
  FROM keyed WHERE rb IN (SELECT rb FROM rt)
)
SELECT layout, CAST(n_rect_rows AS BIGINT) AS n_rect_rows,
       CAST(n_blocks_touched AS BIGINT) AS n_blocks_touched,
       CAST(n_rows_read AS BIGINT) AS n_rows_read,
       CAST((n_rows_read * 1000) // n_rect_rows AS BIGINT) AS read_amp_permille
FROM (SELECT * FROM z UNION ALL SELECT * FROM r)
"""


def test_zorder_key_handchecked(spark):
    # x=0b10, y=0b11 (bits=2) -> z = x0<<0 | y0<<1 | x1<<2 | y1<<3
    #   x0=0, y0=1, x1=1, y1=1 -> 0 + 2 + 4 + 8 = 14
    df = spark.createDataFrame([(2, 3)], "x long, y long")
    got = df.select(layout.zorder_key(F.col("x"), F.col("y"), 2).alias("z")).collect()
    assert got[0]["z"] == 14


def test_zorder_refuses_overflow(spark):
    df = spark.createDataFrame([(1 << 15, 1)], "x long, y long")
    with pytest.raises(Exception, match="zorder_locality_audit"):
        layout.zorder_locality_audit(
            df, "x", "y", 0, 10, 10, 5, bits=14
        ).collect()


def _orders_xy(spark, sf):
    return io.load_table(spark, sf, "orders").select(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.col("o_custkey").cast("long").alias("y"),
    )


@pytest.mark.parametrize("sf", SFS)
def test_zorder_oracle_shape_matches(spark, sf):
    got = layout.zorder_locality_audit(
        _orders_xy(spark, sf), "x", "y", 1460, 1825, 10, 5, bits=14, bucket_bits=8
    )
    z = _zorder_interleave_sql("x", "y", 14)
    con = _con(sf)
    want = con.sql(ZORDER_ORACLE_SHAPE.format(z=z, bits=14, shift=2 * 14 - 8)).df()
    assert _rendered(got.toPandas()).equals(_rendered(want)), sf


def test_zorder_audit_is_decision_grade(spark, sf_dir):
    """At sf0.1 the z-order layout must beat row-major on rows read —
    the probed regime the docstring claims (at smaller SFs row-major
    wins; the audit reports, the consumer decides)."""
    rows = {
        r["layout"]: r
        for r in layout.zorder_locality_audit(
            _orders_xy(spark, "/root/testdata/sf0.1"),
            "x", "y", 1460, 1825, 10, 5, bits=14, bucket_bits=8,
        ).collect()
    }
    assert rows["zorder"]["n_rows_read"] < rows["rowmajor"]["n_rows_read"]
    assert rows["zorder"]["n_rect_rows"] == rows["rowmajor"]["n_rect_rows"] > 0


# ---------------------------------------------------------------------------
# Exact range-partition bounds
# ---------------------------------------------------------------------------

BOUNDS_ORACLE_SHAPE = """
WITH ledger AS (
  SELECT CAST(l_quantity AS BIGINT) AS v, COUNT(*) AS cnt FROM lineitem GROUP BY 1
),
tot AS (SELECT SUM(cnt) AS n_total FROM ledger),
assigned AS (
  SELECT v, cnt,
         COALESCE(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM ledger
)
SELECT CAST((cum_before * {n}) // (SELECT n_total FROM tot) AS BIGINT) AS part,
       CAST(MAX(v) AS BIGINT) AS upper_value,
       CAST(SUM(cnt) AS BIGINT) AS n_rows
FROM assigned
GROUP BY 1
"""


def test_range_bounds_handchecked(spark):
    # values: 1x4, 2x4, 3x2  (N=10, n_parts=2 -> target 5)
    rows = [(1,)] * 4 + [(2,)] * 4 + [(3,)] * 2
    df = spark.createDataFrame(rows, "v long")
    got = {
        r["part"]: (r["upper_value"], r["n_rows"])
        for r in layout.range_partition_bounds(df, "v", 2).collect()
    }
    # v=1: cum_before 0 -> part 0; v=2: cum_before 4 -> part 0 (4*2//10=0);
    # v=3: cum_before 8 -> part 1. Tie-group 2 cannot split: part 0 gets 8 rows.
    assert got == {0: (2, 8), 1: (3, 2)}


def test_range_bounds_giant_tie_leaves_parts_empty(spark):
    df = spark.createDataFrame([(7,)] * 9 + [(9,)], "v long")
    got = {
        r["part"]: (r["upper_value"], r["n_rows"])
        for r in layout.range_partition_bounds(df, "v", 4).collect()
    }
    # the 9-row tie at v=7 occupies part 0 entirely; v=9 starts at
    # cum_before=9 -> part 3; parts 1-2 are empty (absent) — the skew
    # the audit exists to expose.
    assert got == {0: (7, 9), 3: (9, 1)}


@pytest.mark.parametrize("sf", SFS)
def test_range_bounds_oracle_shape_matches(spark, sf):
    got = layout.range_partition_bounds(
        io.load_table(spark, sf, "lineitem"), "l_quantity", 8
    )
    con = _con(sf)
    want = con.sql(BOUNDS_ORACLE_SHAPE.format(n=8)).df()
    assert _rendered(got.toPandas()).equals(_rendered(want)), sf
    # partition law: row counts sum to N
    n = con.sql("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert got.agg(F.sum("n_rows")).collect()[0][0] == n


# ---------------------------------------------------------------------------
# Matryoshka-style truncated-prefix two-stage retrieval (Kusupati et al. 2022)
# ---------------------------------------------------------------------------

TRUNC_ORACLE_SHAPE = """
WITH t_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id,
         (floor((
            list_sum(list_transform(generate_series(1, {d}),
              i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(generate_series(1, {d}),
                 i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
               * sqrt(list_sum(list_transform(generate_series(1, {d}),
                 i -> CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))))
          ) * 10000.0 + 0.5) / 10000.0) AS tcos
  FROM embeddings q, embeddings c
  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
),
short AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY tcos DESC, vec_id) AS r
    FROM t_scored
  ) WHERE r <= 50
),
reranked AS (
  SELECT s.query_id, s.vec_id,
         (floor((
            list_sum(list_transform(generate_series(1, 64),
              i -> CAST(qv.embedding[i] AS DOUBLE) * CAST(cv.embedding[i] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(qv.embedding[i] AS DOUBLE) * CAST(qv.embedding[i] AS DOUBLE))))
               * sqrt(list_sum(list_transform(generate_series(1, 64),
                 i -> CAST(cv.embedding[i] AS DOUBLE) * CAST(cv.embedding[i] AS DOUBLE)))))
          ) * 10000.0 + 0.5) / 10000.0) AS cos_sim
  FROM short s
  JOIN embeddings qv ON qv.vec_id = s.query_id
  JOIN embeddings cv ON cv.vec_id = s.vec_id
)
SELECT query_id, vec_id, cos_sim,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY cos_sim DESC, vec_id
       ) AS BIGINT) AS rank
FROM reranked
QUALIFY rank <= 10
"""


def _emb_queries(spark, sf):
    e = io.load_table(spark, sf, "embeddings")
    return e, e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_truncated_rerank_handchecked(spark):
    """3 orthogonal-ish vectors where the 2-dim prefix MISRANKS and the
    full-dim rerank fixes the order — the whole point of stage 2."""
    from kinesis_stream_video_project_spark.operators import similarity as sim

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 3.0, 0.0]),   # prefix-close to q, full-far
        (2, [0.8, 0.0, 0.0, 0.1]),   # prefix-further, full-close
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = e.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = sim.truncated_rerank_topk(
        q, e, dims=2, k=2, shortlist=2
    ).collect()
    assert [r["vec_id"] for r in got] == [2, 1]  # exact order, not prefix order


def test_truncated_rerank_rejects_bad_shortlist(spark):
    from kinesis_stream_video_project_spark.operators import similarity as sim

    e = spark.createDataFrame([(0, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        sim.truncated_rerank_topk(e, e, shortlist=0)


@pytest.mark.parametrize("sf", SFS)
def test_truncated_rerank_oracle_shape_matches(spark, sf):
    from kinesis_stream_video_project_spark.operators import similarity as sim

    e, q = _emb_queries(spark, sf)
    got = _rendered(
        sim.truncated_rerank_topk(q, e, dims=32, k=10, shortlist=50).toPandas()
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{sf}/embeddings.parquet'")
    want = _rendered(con.sql(TRUNC_ORACLE_SHAPE.format(d=32)).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) == 50


@pytest.mark.parametrize("sf", SFS)
def test_truncated_rerank_recall_floor_and_dominance(spark, sf):
    """Measured claims on NON-MRL embeddings: shortlist-50 rerank
    recall@10 >= 0.5 (probed 0.60-0.72), and rerank recall >= raw
    truncated recall (stage 2 only fixes stage-1 ordering mistakes)."""
    from kinesis_stream_video_project_spark.operators import similarity as sim

    e, q = _emb_queries(spark, sf)
    exact = sim.cosine_topk(q, e, k=10).select("query_id", "vec_id")
    rer = sim.truncated_rerank_topk(q, e, dims=32, k=10, shortlist=50).select(
        "query_id", "vec_id"
    )
    tq = q.select("query_id", F.slice("embedding", 1, 32).alias("embedding"))
    tc = e.select("vec_id", F.slice("embedding", 1, 32).alias("embedding"))
    raw = sim.cosine_topk(tq, tc, k=10).select("query_id", "vec_id")
    tot = exact.count()
    rer_hits = exact.intersect(rer).count()
    raw_hits = exact.intersect(raw).count()
    assert tot == 50
    assert rer_hits / tot >= 0.5, (sf, rer_hits, tot)
    assert rer_hits >= raw_hits, (sf, rer_hits, raw_hits)


# ---------------------------------------------------------------------------
# Video frame-difference energy and scene cuts
# ---------------------------------------------------------------------------

SAD_ORACLE_SHAPE = """
WITH vids AS (SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2),
fr AS (SELECT media_id, text, (length(text) // {fs}) AS n_frames FROM vids),
pairs AS (
  SELECT media_id, t.i AS frame_no,
         list_sum(list_transform(generate_series(1, {fs}),
           j -> abs(ascii(substr(text, t.i * {fs} + j, 1))
                  - ascii(substr(text, (t.i + 1) * {fs} + j, 1))))) AS sad
  FROM fr, UNNEST(generate_series(0, n_frames - 2)) AS t(i)
  WHERE n_frames >= 2
)
SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no, CAST(sad AS BIGINT) AS sad
FROM pairs
"""

CUTS_ORACLE_SHAPE = (
    SAD_ORACLE_SHAPE.replace(
        "SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no, CAST(sad AS BIGINT) AS sad\nFROM pairs",
        """
, per_media AS (
  SELECT media_id, SUM(sad) AS sum_sad, COUNT(*) AS n_pairs FROM pairs GROUP BY media_id
)
SELECT p.media_id, CAST(p.frame_no AS BIGINT) AS frame_no, CAST(p.sad AS BIGINT) AS sad,
       CAST((m.sum_sad * 1000) // m.n_pairs AS BIGINT) AS mean_sad_scaled
FROM pairs p JOIN per_media m USING (media_id)
WHERE p.sad * m.n_pairs * {den} > m.sum_sad * {num}
""",
    )
)


def _manifest(spark, sf):
    from kinesis_stream_video_project_spark.operators import multimodal as mm

    return mm.media_manifest(io.load_table(spark, sf, "documents"))


def test_frame_diff_handchecked(spark):
    from kinesis_stream_video_project_spark.operators import multimodal as mm

    # one video (media_id % 3 == 2): payload 'aaaabbbbcccc' at fs=4 ->
    # frames [aaaa, bbbb, cccc]; SAD(0)=4*1, SAD(1)=4*1
    df = spark.createDataFrame(
        [(2, "video", bytearray(b"aaaabbbbcccc"))],
        "media_id long, media_type string, payload binary",
    )
    got = {
        r["frame_no"]: r["sad"]
        for r in mm.frame_diff_energy(df, frame_size=4).collect()
    }
    assert got == {0: 4, 1: 4}


def test_frame_diff_short_video_emits_no_row(spark):
    from kinesis_stream_video_project_spark.operators import multimodal as mm

    df = spark.createDataFrame(
        [(2, "video", bytearray(b"aaaab"))],  # 1 full frame at fs=4
        "media_id long, media_type string, payload binary",
    )
    assert mm.frame_diff_energy(df, frame_size=4).count() == 0


def test_scene_cuts_handchecked(spark):
    from kinesis_stream_video_project_spark.operators import multimodal as mm

    # frames: aaaa aaaa zzzz -> SADs [0, 100]; mean 50; num/den=9/8 ->
    # cut iff sad*2*8 > 100*9 -> only the 100 spike (1600 > 900).
    df = spark.createDataFrame(
        [(2, "video", bytearray(b"aaaaaaaa" + b"zzzz"))],
        "media_id long, media_type string, payload binary",
    )
    got = mm.scene_cuts(df, frame_size=4, num=9, den=8).collect()
    assert len(got) == 1
    assert (got[0]["frame_no"], got[0]["sad"], got[0]["mean_sad_scaled"]) == (
        1,
        4 * 25,
        50 * 1000,
    )


@pytest.mark.parametrize("sf", SFS)
def test_frame_diff_oracle_shape_matches(spark, sf):
    from kinesis_stream_video_project_spark.operators import multimodal as mm

    got = mm.frame_diff_energy(_manifest(spark, sf), frame_size=64)
    con = _con(sf)
    want = con.sql(SAD_ORACLE_SHAPE.format(fs=64)).df()
    assert _rendered(got.toPandas()).equals(_rendered(want)), sf
    assert got.count() > 0


@pytest.mark.parametrize("sf", SFS)
def test_scene_cuts_oracle_shape_matches(spark, sf):
    from kinesis_stream_video_project_spark.operators import multimodal as mm

    got = mm.scene_cuts(_manifest(spark, sf), frame_size=64, num=9, den=8)
    con = _con(sf)
    want = con.sql(CUTS_ORACLE_SHAPE.format(fs=64, num=9, den=8)).df()
    assert _rendered(got.toPandas()).equals(_rendered(want)), sf
    n = got.count()
    assert n > 0, f"{sf}: threshold degenerate (no cuts flagged)"


# ---------------------------------------------------------------------------
# Online sessionization: pure-fold laws (streaming/jobs.py::_session_fold)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _fold_all(ts_list, gap_us, chunks):
    from kinesis_stream_video_project_spark.streaming.jobs import _session_fold

    start = end = None
    n = 0
    emits = []
    i = 0
    for size in chunks:
        start, end, n, e = _session_fold(start, end, n, gap_us, ts_list[i : i + size])
        emits.extend(e)
        i += size
    start, end, n, e = _session_fold(start, end, n, gap_us, ts_list[i:])
    emits.extend(e)
    return start, end, n, emits


class TestSessionFoldLaws:
    @settings(max_examples=100, deadline=None)
    @given(
        ts=st.lists(st.integers(0, 10_000), min_size=0, max_size=40),
        gap=st.integers(1, 2_000),
        cut=st.data(),
    )
    def test_chunking_invariance_and_island_equivalence(self, ts, gap, cut):
        """Folding an in-order feed through ANY chunk boundaries yields
        the same emits and final state as one fold; and the closed
        sessions equal the reference islands computation."""
        ts = sorted(ts)
        n_cuts = cut.draw(st.integers(0, 5))
        sizes = [
            cut.draw(st.integers(0, len(ts))) for _ in range(n_cuts)
        ]
        sizes = [s for s in sizes if s <= len(ts)]
        one = _fold_all(ts, gap, [])
        many = _fold_all(ts, gap, sizes)
        assert one == many

        # reference islands over the full list
        want = []
        cur = []
        for t in ts:
            if not cur or t - cur[-1] <= gap:
                cur.append(t)
            else:
                want.append((cur[0], cur[-1], len(cur)))
                cur = [t]
        open_sess = (cur[0], cur[-1], len(cur)) if cur else None
        start, end, n, emits = one
        assert emits == want
        if open_sess is None:
            assert start is None and n == 0
        else:
            assert (start, end, n) == open_sess

    def test_straggler_absorbed_not_retracted(self):
        from kinesis_stream_video_project_spark.streaming.jobs import _session_fold

        # open session [100, 200]; straggler at 150 arrives in a later
        # chunk: absorbed (n grows), bounds unchanged — never retracts.
        start, end, n, e = _session_fold(None, None, 0, 50, [100, 150, 200])
        assert (start, end, n, e) == (100, 200, 3, [])
        start, end, n, e = _session_fold(start, end, n, 50, [150])
        assert (start, end, n, e) == (100, 200, 4, [])


# ---------------------------------------------------------------------------
# Join-size / skew profile (exact planning statistic)
# ---------------------------------------------------------------------------

JOINPROF_ORACLE_SHAPE = """
WITH la AS (SELECT user_id AS k, COUNT(*) AS cl FROM events GROUP BY 1),
ra AS (SELECT user_id AS k, COUNT(*) AS cr FROM events GROUP BY 1),
per_key AS (SELECT k, cl * cr AS rows_k FROM la JOIN ra USING (k)),
stats AS (
  SELECT COUNT(*) AS n_common_keys,
         CAST(SUM(rows_k) AS BIGINT) AS join_rows,
         CAST(MAX(rows_k) AS BIGINT) AS max_key_rows
  FROM per_key
),
top AS (
  SELECT MIN(k) AS max_key FROM per_key, stats WHERE rows_k = max_key_rows
),
n AS (SELECT COUNT(*) AS n_rows FROM events)
SELECT CAST(n.n_rows AS BIGINT) AS n_left, CAST(n.n_rows AS BIGINT) AS n_right,
       CAST(s.n_common_keys AS BIGINT) AS n_common_keys, s.join_rows,
       t.max_key, s.max_key_rows,
       CAST((s.max_key_rows * 1000) // s.join_rows AS BIGINT) AS max_key_share_permille
FROM stats s, top t, n
"""


def test_join_size_profile_handchecked(spark):
    from kinesis_stream_video_project_spark.operators.profiling import (
        join_size_profile,
    )

    left = spark.createDataFrame([(1,), (1,), (2,), (3,)], "k long")
    right = spark.createDataFrame([(1,), (2,), (2,), (9,)], "k long")
    r = join_size_profile(left, right, "k").collect()[0]
    # common keys {1: 2*1, 2: 1*2} -> join_rows 4, max 2 shared by keys
    # 1 and 2 -> max_key = 1 (smallest)
    assert (
        r["n_left"], r["n_right"], r["n_common_keys"], r["join_rows"],
        r["max_key"], r["max_key_rows"], r["max_key_share_permille"],
    ) == (4, 4, 2, 4, 1, 2, 500)


def test_join_size_profile_equals_materialized_join(spark):
    """The law the profile exists for: join_rows == COUNT(*) of the real
    join, computed without running it."""
    from kinesis_stream_video_project_spark.operators.profiling import (
        join_size_profile,
    )

    sf = "/root/testdata/sf0.001"
    o = io.load_table(spark, sf, "orders")
    li = io.load_table(spark, sf, "lineitem")
    prof = join_size_profile(
        o, li, key="", left_key="o_orderkey", right_key="l_orderkey"
    ).collect()[0]
    real = o.join(li, o["o_orderkey"] == li["l_orderkey"]).count()
    assert prof["join_rows"] == real > 0


@pytest.mark.parametrize("sf", SFS)
def test_join_size_profile_oracle_shape_matches(spark, sf):
    """Self-join profile of events on user_id — the skew-audit shape
    (join_rows = sum of per-user count squares)."""
    from kinesis_stream_video_project_spark.operators.profiling import (
        join_size_profile,
    )

    ev = io.load_table(spark, sf, "events")
    got = join_size_profile(ev, ev, "user_id")
    con = _con(sf)
    want = con.sql(JOINPROF_ORACLE_SHAPE).df()
    assert _rendered(got.toPandas()).equals(_rendered(want)), sf


# ---------------------------------------------------------------------------
# dHash multi-index Hamming near-dups (Norouzi/Punjani/Fleet 2012)
# ---------------------------------------------------------------------------


def test_dhash_near_dups_handchecked(spark):
    from kinesis_stream_video_project_spark.operators import multimodal as mm

    rows = [
        (1, 0),            # baseline
        (2, 1),            # hamming 1 from 1 -> pair
        (3, 0b111 << 20),  # hamming 3 from 1 -> pair (band 1 differs only)
        (4, 0xFF << 24),   # hamming 8 from 1 -> excluded
    ]
    h = spark.createDataFrame(rows, "media_id long, dhash long")
    got = sorted(
        (r["media_id_a"], r["media_id_b"], r["hamming"])
        for r in mm.dhash_near_dups(h, max_hamming=3).collect()
    )
    # (2,3) shares the all-zero bands 2-3 so it IS a candidate, but its
    # hamming is 4 > 3 — the verify filters it; (1,4) differs in 8 bits.
    assert got == [(1, 2, 1), (1, 3, 3)], got


def test_dhash_near_dups_rejects_incomplete_params(spark):
    from kinesis_stream_video_project_spark.operators import multimodal as mm

    h = spark.createDataFrame([(1, 0)], "media_id long, dhash long")
    with pytest.raises(ValueError, match="completeness"):
        mm.dhash_near_dups(h, max_hamming=4, bands=4)


@pytest.mark.parametrize(
    "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
)
def test_dhash_near_dups_complete_vs_brute_force(spark, sf):
    """Pigeonhole completeness on real hashes: the banded candidate
    pipeline finds EXACTLY the all-pairs Hamming <= 3 set (the
    definitional quadratic form — fine at oracle scale)."""
    from kinesis_stream_video_project_spark.operators import multimodal as mm

    h = mm.image_dhash(
        mm.media_manifest(io.load_table(spark, sf, "documents"))
    ).cache()
    got = sorted(
        (r["media_id_a"], r["media_id_b"], r["hamming"])
        for r in mm.dhash_near_dups(h, max_hamming=3).collect()
    )
    l, r = h.alias("l"), h.alias("r")
    brute = sorted(
        (x["media_id_a"], x["media_id_b"], x["hamming"])
        for x in l.join(r, F.col("l.media_id") < F.col("r.media_id"))
        .select(
            F.col("l.media_id").alias("media_id_a"),
            F.col("r.media_id").alias("media_id_b"),
            F.bit_count(F.expr("l.dhash ^ r.dhash")).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    )
    h.unpersist()
    assert got == brute


DHASH_PAIRS_ORACLE_SHAPE = """
WITH bytes AS (
  SELECT doc_id AS media_id, list_transform(
           generate_series(1, nbytes),
           j -> (strpos('0123456789abcdef', hx[2*j-1]) - 1) * 16
              + (strpos('0123456789abcdef', hx[2*j]) - 1)
         ) AS bs, nbytes AS L
  FROM (SELECT doc_id, string_split(lower(hex(encode(text))), '') AS hx,
               octet_length(encode(text)) AS nbytes
        FROM documents)
),
vals AS (
  SELECT media_id, list_transform(
           generate_series(0, 63),
           b -> CASE WHEN ((b + 1) * L) // 64 > (b * L) // 64
                THEN list_sum(list_slice(bs, (b * L) // 64 + 1,
                                         ((b + 1) * L) // 64))
                     // (((b + 1) * L) // 64 - (b * L) // 64)
                ELSE 0 END
         ) AS v
  FROM bytes
),
hashed AS (
  SELECT media_id,
         list_sum(list_transform(
           generate_series(0, 55),
           k -> CASE WHEN v[(k // 7) * 8 + (k % 7) + 2]
                          > v[(k // 7) * 8 + (k % 7) + 1]
                THEN 1 << k ELSE 0 END
         )) AS dhash
  FROM vals
),
banded AS (
  SELECT media_id, dhash, i.i AS band_no,
         (dhash >> (14 * i.i)) & 16383 AS band_val
  FROM hashed, UNNEST(generate_series(0, 3)) AS i(i)
),
pairs AS (
  SELECT DISTINCT l.media_id AS media_id_a, r.media_id AS media_id_b,
                  l.dhash AS ha, r.dhash AS hb
  FROM banded l
  JOIN banded r ON l.band_no = r.band_no AND l.band_val = r.band_val
              AND l.media_id < r.media_id
)
SELECT media_id_a, media_id_b,
       CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
FROM pairs WHERE bit_count(xor(ha, hb)) <= 3
"""


def test_dhash_near_dups_oracle_shape_matches_sf01(spark):
    """Full-pipeline oracle at sf0.1 — the SF where the fixture plants
    hash-identical payloads (8 pairs, all hamming 0; probed)."""
    from kinesis_stream_video_project_spark.operators import multimodal as mm

    sf = "/root/testdata/sf0.1"
    got = mm.dhash_near_dups(
        mm.image_dhash(mm.media_manifest(io.load_table(spark, sf, "documents"))),
        max_hamming=3,
    )
    con = _con(sf)
    want = con.sql(DHASH_PAIRS_ORACLE_SHAPE).df()
    assert _rendered(got.toPandas()).equals(_rendered(want))
    assert got.count() == 8


def test_dhash_near_dups_decodes_corpus_once(spark):
    """Scale pin: the decode+hash Python stage must NOT appear in the
    pair-join plan (python subtrees never canonicalize equal, so without
    the lineage break the corpus would decode TWICE — measured)."""
    from kinesis_stream_video_project_spark.operators import multimodal as mm

    h = mm.image_dhash(
        mm.media_manifest(io.load_table(spark, "/root/testdata/sf0.001", "documents"))
    )
    df = mm.dhash_near_dups(h)
    df.count()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan, plan
    assert "SortMergeJoin" in plan


def test_cms_sketches_merge_cellwise(spark):
    """Mergeability — the 100 TB property: sketch(A ∪ B) equals the
    cell-wise SUM of sketch(A) and sketch(B), which is why partition-
    local partials combine associatively (map-side combine)."""
    ev = io.load_table(spark, "/root/testdata/sf0.001", "events")
    a = ev.filter("event_id % 2 = 0")
    b = ev.filter("event_id % 2 = 1")
    whole = {
        (r["j"], r["bucket"]): r["cnt"]
        for r in cms.cms_sketch(ev, "user_id", 16, 3).collect()
    }
    merged: dict = {}
    for part in (a, b):
        for r in cms.cms_sketch(part, "user_id", 16, 3).collect():
            k = (r["j"], r["bucket"])
            merged[k] = merged.get(k, 0) + r["cnt"]
    assert merged == whole and len(whole) > 0


# ---------------------------------------------------------------------------
# Classification report (per-class precision/recall/F1 over lang-ID)
# ---------------------------------------------------------------------------


def test_classification_report_handchecked(spark):
    from kinesis_stream_video_project_spark.operators.stats import (
        classification_report,
    )

    rows = [
        ("en", "en"), ("en", "en"), ("en", "es"),   # en: tp2 fn1
        ("es", "es"),                               # es: tp1, fp1 (the en->es)
        ("de", "en"),                               # de: tp0 fn1; en gains fp1
    ]
    df = spark.createDataFrame(rows, "actual string, predicted string")
    got = {
        r["label"]: (
            r["tp"], r["fp"], r["fn"], r["support"],
            r["precision_permille"], r["recall_permille"], r["f1_permille"],
        )
        for r in classification_report(df).collect()
    }
    assert got == {
        "en": (2, 1, 1, 3, 666, 666, 666),
        "es": (1, 1, 0, 1, 500, 1000, 666),
        "de": (0, 0, 1, 1, 0, 0, 0),
    }


LANG_REPORT_ORACLE_SHAPE = """
WITH scores AS (
  SELECT doc_id, lang, {markers}
  FROM documents
),
pred AS (
  SELECT lang AS _a,
       CASE WHEN s_en >= s_es AND s_en >= s_zh AND s_en >= s_de AND s_en >= s_fr THEN 'en'
            WHEN s_es >= s_zh AND s_es >= s_de AND s_es >= s_fr THEN 'es'
            WHEN s_zh >= s_de AND s_zh >= s_fr THEN 'zh'
            WHEN s_de >= s_fr THEN 'de'
            ELSE 'fr' END AS _p
  FROM scores
),
ledger AS (SELECT _a, _p, COUNT(*) AS _n FROM pred GROUP BY 1, 2),
tp AS (SELECT _a AS label, _n AS tp FROM ledger WHERE _a = _p),
pt AS (SELECT _p AS label, SUM(_n) AS pred_n FROM ledger GROUP BY 1),
at AS (SELECT _a AS label, SUM(_n) AS support FROM ledger GROUP BY 1),
base AS (
  SELECT COALESCE(at.label, pt.label) AS label,
         COALESCE(tp.tp, 0) AS tp,
         COALESCE(pt.pred_n, 0) - COALESCE(tp.tp, 0) AS fp,
         COALESCE(at.support, 0) - COALESCE(tp.tp, 0) AS fn,
         COALESCE(at.support, 0) AS support
  FROM at FULL JOIN pt ON at.label = pt.label
  LEFT JOIN tp ON COALESCE(at.label, pt.label) = tp.label
)
SELECT label, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(support AS BIGINT) AS support,
       CAST(CASE WHEN tp + fp = 0 THEN 0 ELSE (1000 * tp) // (tp + fp) END AS BIGINT) AS precision_permille,
       CAST(CASE WHEN tp + fn = 0 THEN 0 ELSE (1000 * tp) // (tp + fn) END AS BIGINT) AS recall_permille,
       CAST(CASE WHEN 2 * tp + fp + fn = 0 THEN 0 ELSE (2000 * tp) // (2 * tp + fp + fn) END AS BIGINT) AS f1_permille
FROM base
"""


@pytest.mark.parametrize("sf", SFS)
def test_lang_id_classification_report_oracle_shape_matches(spark, sf):
    from kinesis_stream_video_project_spark.operators.stats import (
        classification_report,
    )
    from kinesis_stream_video_project_spark.plans.queries_llm import (
        _LANG_MARKERS,
        _marker_sql,
    )
    from kinesis_stream_video_project_spark.plans import registry

    pred = (
        registry.queries()["lang_id_ngram"](spark, sf)
        .join(
            io.load_table(spark, sf, "documents").select("doc_id", "lang"),
            "doc_id",
        )
        .select(F.col("lang").alias("actual"), F.col("predicted_lang").alias("predicted"))
    )
    got = classification_report(pred)
    markers = ",\n         ".join(
        f"{_marker_sql(lang)} AS s_{lang}" for lang in ("en", "es", "zh", "de", "fr")
    )
    con = _con(sf)
    want = con.sql(LANG_REPORT_ORACLE_SHAPE.format(markers=markers)).df()
    assert _rendered(got.toPandas()).equals(_rendered(want)), sf
    assert got.count() > 0


# ---------------------------------------------------------------------------
# Session regex pattern matching (MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------

PATTERN_ORACLE_SHAPE = """
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, substr(event_type, 1, 1) AS ini,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessed AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM base
),
per_session AS (
  SELECT user_id, sess, MIN(us) AS session_start_us,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         string_agg(ini, '' ORDER BY us, event_id) AS seq
  FROM sessed GROUP BY user_id, sess
)
SELECT user_id, session_start_us, n_events,
       CAST(len(regexp_extract_all(seq, '{pattern}')) AS BIGINT) AS n_matches
FROM per_session
WHERE len(regexp_extract_all(seq, '{pattern}')) > 0
"""


def test_session_pattern_handchecked(spark):
    import datetime as dt

    from kinesis_stream_video_project_spark.operators.funnel import (
        session_pattern_matches,
    )

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    def ev(eid, sec, etype):
        return (int(eid), base + dt.timedelta(seconds=sec), 1, etype)

    # one session: v e c p  -> 'vecp' matches v[evsc]*c[evsc]*p once;
    # second session (gap > 60): p v c -> 'pvc' no match
    rows = [
        ev(1, 0, "view"), ev(2, 10, "error"), ev(3, 20, "click"),
        ev(4, 30, "purchase"),
        ev(5, 300, "purchase"), ev(6, 310, "view"), ev(7, 320, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = session_pattern_matches(df, gap_s=60).collect()
    base_us = int(base.timestamp()) * 1_000_000
    assert len(got) == 1
    assert (
        got[0]["user_id"], got[0]["session_start_us"],
        got[0]["n_events"], got[0]["n_matches"],
    ) == (1, base_us, 4, 1)


def test_session_pattern_nonoverlapping_count(spark):
    import datetime as dt

    from kinesis_stream_video_project_spark.operators.funnel import (
        session_pattern_matches,
    )

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    # 'vcpvcp' -> two non-overlapping clean conversions in one session
    types = ["view", "click", "purchase", "view", "click", "purchase"]
    rows = [
        (i + 1, base + dt.timedelta(seconds=5 * i), 1, t)
        for i, t in enumerate(types)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = session_pattern_matches(df, gap_s=60).collect()
    assert len(got) == 1 and got[0]["n_matches"] == 2


@pytest.mark.parametrize("sf", SFS)
def test_session_pattern_oracle_shape_matches(spark, sf):
    from kinesis_stream_video_project_spark.operators.funnel import (
        session_pattern_matches,
    )

    got = session_pattern_matches(
        io.load_table(spark, sf, "events"), gap_s=86400
    )
    con = _con(sf)
    want = con.sql(
        PATTERN_ORACLE_SHAPE.format(
            gap_us=86400 * 1_000_000, pattern="v[evsc]*c[evsc]*p"
        )
    ).df()
    assert _rendered(got.toPandas()).equals(_rendered(want)), sf
    assert got.count() > 0, f"{sf}: pattern degenerate"


# ---------------------------------------------------------------------------
# Layout-operator laws (hypothesis)
# ---------------------------------------------------------------------------


class TestLayoutLaws:
    @settings(max_examples=50, deadline=None)
    @given(
        x=st.integers(0, (1 << 14) - 1),
        y=st.integers(0, (1 << 14) - 1),
    )
    def test_zorder_key_is_invertible(self, x, y):
        """The Morton key loses nothing: de-interleaving the python
        reference of the same bit formula recovers (x, y) exactly."""
        z = 0
        for i in range(14):
            z += ((x >> i) & 1) << (2 * i)
            z += ((y >> i) & 1) << (2 * i + 1)
        rx = sum(((z >> (2 * i)) & 1) << i for i in range(14))
        ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(14))
        assert (rx, ry) == (x, y)

    @settings(max_examples=25, deadline=None)
    @given(
        vals=st.lists(st.integers(0, 20), min_size=1, max_size=60),
        n_parts=st.integers(1, 8),
    )
    def test_range_bounds_laws(self, spark, vals, n_parts):
        """Partition laws: row counts sum to N; parts and upper bounds
        are strictly increasing; every part id is in [0, n_parts)."""
        from kinesis_stream_video_project_spark.operators.layout import (
            range_partition_bounds,
        )

        df = spark.createDataFrame([(v,) for v in vals], "v long")
        rows = sorted(
            (r["part"], r["upper_value"], r["n_rows"])
            for r in range_partition_bounds(df, "v", n_parts).collect()
        )
        assert sum(r[2] for r in rows) == len(vals)
        parts = [r[0] for r in rows]
        uppers = [r[1] for r in rows]
        assert parts == sorted(set(parts))
        assert uppers == sorted(set(uppers))
        assert all(0 <= p < n_parts for p in parts)


# ---------------------------------------------------------------------------
# Bipartite HITS (Kleinberg 1999) over the customer->part purchase graph
# ---------------------------------------------------------------------------

HITS_ORACLE_SHAPE = """
WITH e AS (
  SELECT DISTINCT o_custkey AS h, l_partkey AS a
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
h0 AS (SELECT DISTINCT h, CAST(1000000 AS BIGINT) AS s FROM e),
a1 AS (SELECT a, CAST(SUM(s) AS BIGINT) AS s FROM e JOIN h0 USING (h) GROUP BY a),
h1 AS (SELECT h, CAST(SUM(s) AS BIGINT) AS s FROM e JOIN a1 USING (a) GROUP BY h),
a2 AS (SELECT a, CAST(SUM(s) AS BIGINT) AS s FROM e JOIN h1 USING (h) GROUP BY a),
h2 AS (SELECT h, CAST(SUM(s) AS BIGINT) AS s FROM e JOIN a2 USING (a) GROUP BY h)
SELECT h AS node_id, 'hub' AS role, s AS score_scaled FROM h2
UNION ALL
SELECT a AS node_id, 'authority' AS role, s AS score_scaled FROM a2
"""


def _purchase_edges(spark, sf):
    o = io.load_table(spark, sf, "orders")
    li = io.load_table(spark, sf, "lineitem")
    return o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_custkey").alias("hub"), F.col("l_partkey").alias("auth")
    )


def test_hits_handchecked(spark):
    from kinesis_stream_video_project_spark.operators.graph import hits_bipartite

    # K_{1,2} plus an isolated pair: hub 1 -> {10, 11}; hub 2 -> {11}
    e = spark.createDataFrame([(1, 10), (1, 11), (2, 11)], "hub long, auth long")
    got = {
        (r["role"], r["node_id"]): r["score_scaled"]
        for r in hits_bipartite(e, iters=1, scale=10).collect()
    }
    # a1: 10 -> 10, 11 -> 20; h1: 1 -> 10+20=30, 2 -> 20
    assert got == {
        ("authority", 10): 10,
        ("authority", 11): 20,
        ("hub", 1): 30,
        ("hub", 2): 20,
    }


def test_hits_refuses_overflow(spark):
    from kinesis_stream_video_project_spark.operators.graph import hits_bipartite

    e = spark.createDataFrame(
        [(1, a) for a in range(10)] + [(h, 1) for h in range(10)],
        "hub long, auth long",
    )
    with pytest.raises(ValueError, match="largest safe scale"):
        hits_bipartite(e, iters=8, scale=10**12)


@pytest.mark.parametrize("sf", SFS)
def test_hits_oracle_shape_matches(spark, sf):
    from kinesis_stream_video_project_spark.operators.graph import hits_bipartite

    got = hits_bipartite(_purchase_edges(spark, sf), iters=2)
    con = _con(sf)
    want = con.sql(HITS_ORACLE_SHAPE).df()
    assert _rendered(got.toPandas()).equals(_rendered(want)), sf
    assert got.count() > 0


# ---------------------------------------------------------------------------
# Batch replay of the session fold (== gaps-and-islands, hash-checkable)
# ---------------------------------------------------------------------------

SESSIONS_ORACLE_SHAPE = """
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessed AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM base
)
SELECT user_id, MIN(us) AS session_start_us, MAX(us) AS session_end_us,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessed GROUP BY user_id, sess
"""


@pytest.mark.parametrize("sf", SFS)
def test_closed_sessions_replay_matches_islands_oracle(spark, sf):
    from kinesis_stream_video_project_spark.operators.funnel import (
        closed_sessions,
    )

    got = closed_sessions(io.load_table(spark, sf, "events"), gap_s=1800)
    con = _con(sf)
    want = con.sql(SESSIONS_ORACLE_SHAPE.format(gap_us=1800 * 1_000_000)).df()
    assert _rendered(got.toPandas()).equals(_rendered(want)), sf
    assert got.count() > 0


def test_round10b_module_entries_match_oracles(spark):
    """The driver-style rendered-value check over every pre-wired
    r10-remainder query at sf0.01 — the queries_round11/round12 lockstep
    discipline: keeps the module consistent with operator-signature
    changes every round until the r10 window registers it.
    dhash_near_dups is checked for CONSISTENCY but exempted from the
    non-empty assert (0 pairs below sf0.1 — probed; see the module
    docstring's registration caveat)."""
    from kinesis_stream_video_project_spark.plans import queries_round10b as q10b

    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    assert len(q10b.QUERIES) == 9
    for name, fn in q10b.QUERIES.items():
        got = fn(spark, sf).toPandas()
        want = con.sql(q10b.ORACLES[name]).df()
        assert sorted(got.columns) == sorted(want.columns), name
        assert _rendered(got).equals(_rendered(want)), name
        if name != "dhash_near_dups":
            assert len(got) > 0, name
