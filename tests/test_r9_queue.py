"""Round-9 registration queue: Bloom-tier decontamination, trigram
stupid-backoff scoring, audio silence runs, n-gram novelty, int8
scalar-quantization ANN tier, neighborhood Jaccard, clustering
coefficient, RFM segmentation — pytest-verified with validated DuckDB
oracle shapes before registration (the paste-don't-debug discipline,
fourth round running)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io


def _rendered(df_pandas):
    cols = sorted(df_pandas.columns)
    return (
        df_pandas[cols].astype(str).sort_values(cols).reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# Bloom decontamination
# ---------------------------------------------------------------------------

BLOOM_ORACLE_SHAPE = """
WITH doc_grams AS (
  SELECT doc_id,
         UNNEST(list_distinct(list_transform(
           generate_series(1, greatest(len(string_split(text, ' ')) - 4, 1)),
           i -> array_to_string(list_slice(string_split(text, ' '), i, i + 4), ' ')
         ))) AS g
  FROM documents
),
doc_grams5 AS (
  SELECT doc_id, g FROM doc_grams WHERE len(string_split(g, ' ')) = 5
),
ev AS (
  SELECT DISTINCT g FROM doc_grams5
  WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100) >= 90
),
bits AS (
  SELECT DISTINCT UNNEST([
    ('0x' || substr(md5(g), 1, 5))::BIGINT % 65536,
    ('0x' || substr(md5(g), 6, 5))::BIGINT % 65536,
    ('0x' || substr(md5(g), 11, 5))::BIGINT % 65536
  ]) AS p
  FROM ev
),
tg AS (
  SELECT doc_id, g FROM doc_grams5
  WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 100) < 80
),
probed AS (
  SELECT doc_id, g,
         CASE WHEN ('0x' || substr(md5(g), 1, 5))::BIGINT % 65536 IN (SELECT p FROM bits)
               AND ('0x' || substr(md5(g), 6, 5))::BIGINT % 65536 IN (SELECT p FROM bits)
               AND ('0x' || substr(md5(g), 11, 5))::BIGINT % 65536 IN (SELECT p FROM bits)
              THEN 1 ELSE 0 END AS bloom,
         CASE WHEN g IN (SELECT g FROM ev) THEN 1 ELSE 0 END AS tru
  FROM tg
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(bloom) AS BIGINT) AS n_bloom_hits,
       CAST(SUM(tru) AS BIGINT) AS n_true_hits,
       CAST(SUM(bloom) - SUM(tru) AS BIGINT) AS n_false_positives
FROM probed GROUP BY doc_id
"""


def test_bloom_positions_portable(spark):
    """The k=3 bit positions must be the md5-substring integers DuckDB
    derives — same portable-hash family as hash_bucket."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import bloom

    df = spark.createDataFrame([("alpha beta",)], "g string")
    got = df.select(*bloom.bloom_positions(F.col("g"))).collect()[0]
    want = duckdb.sql(
        "SELECT ('0x' || substr(md5('alpha beta'), 1, 5))::BIGINT % 65536,"
        "       ('0x' || substr(md5('alpha beta'), 6, 5))::BIGINT % 65536,"
        "       ('0x' || substr(md5('alpha beta'), 11, 5))::BIGINT % 65536"
    ).fetchone()
    assert tuple(got) == tuple(want)


def test_bloom_no_false_negatives_handchecked(spark):
    """Bloom law on a crafted corpus: every true hit bloom-hits
    (no-false-negative), bloom >= true per doc, and a doc sharing no
    gram still counts its grams."""
    from kinesis_stream_video_project_spark.operators import bloom

    train = spark.createDataFrame(
        [
            (1, "a b c d e f"),     # shares 'a b c d e' with eval
            (2, "q r s t u v w"),   # shares nothing
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "a b c d e")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_grams, r.n_bloom_hits, r.n_true_hits, r.n_false_positives)
        for r in bloom.bloom_decontaminate(train, ev).collect()
    }
    assert got[1][0] == 2 and got[1][2] == 1  # 2 grams, 1 true hit
    assert got[1][1] >= got[1][2]             # no false negatives
    assert got[2][0] == 3 and got[2][2] == 0
    for _, (ng, nb, nt, nfp) in got.items():
        assert nfp == nb - nt >= 0


def test_bloom_short_doc_emits_no_row(spark):
    """Docs under n tokens carry no gram and emit no row (the bigram
    <2-token contract)."""
    from kinesis_stream_video_project_spark.operators import bloom

    train = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    ev = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    assert bloom.bloom_decontaminate(train, ev).collect() == []


def test_bloom_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs the DuckDB bitmap-semantics replay on the fixture
    train/eval hash split, and non-degenerate: some doc has a true hit
    (the corpus plants near/exact dups across the split)."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import bloom
    from kinesis_stream_video_project_spark.operators.sampling import (
        hash_bucket,
    )

    d = io.load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    got = _rendered(
        bloom.bloom_decontaminate(
            d.filter(b < 80), d.filter(b >= 90)
        ).toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = _rendered(con.sql(BLOOM_ORACLE_SHAPE).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0
    tot_true = got["n_true_hits"].astype(int).sum()
    assert tot_true > 0


# ---------------------------------------------------------------------------
# Trigram stupid backoff
# ---------------------------------------------------------------------------

BACKOFF_ORACLE_SHAPE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (
  SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
  FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
),
tric AS (SELECT w1, w2, w3, COUNT(*) AS c123 FROM pos GROUP BY 1, 2, 3),
trik AS (SELECT * FROM tric ORDER BY c123 DESC, w1, w2, w3 LIMIT {tb}),
big AS (
  SELECT t[i] AS b1, t[i+1] AS b2, COUNT(*) AS cb
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i) GROUP BY 1, 2
),
bik AS (SELECT * FROM big ORDER BY cb DESC, b1, b2 LIMIT {bb}),
uni AS (
  SELECT w, COUNT(*) AS cu
  FROM (SELECT UNNEST(t) AS w FROM toks) GROUP BY 1
),
nt AS (SELECT CAST(SUM(cu) AS BIGINT) AS n FROM uni),
sc AS (
  SELECT p.doc_id,
         CASE WHEN tk.c123 IS NOT NULL THEN 'tri'
              WHEN bk.cb IS NOT NULL THEN 'bi' ELSE 'uni' END AS pth,
         CASE WHEN tk.c123 IS NOT NULL THEN (tk.c123 * {scale}) // bg.cb
              WHEN bk.cb IS NOT NULL
                THEN (((bk.cb * {scale}) // u2.cu) * 2) // 5
              ELSE (((u3.cu * {scale}) // nt.n) * 4) // 25 END AS term
  FROM pos p
  LEFT JOIN trik tk ON tk.w1 = p.w1 AND tk.w2 = p.w2 AND tk.w3 = p.w3
  LEFT JOIN big bg ON bg.b1 = p.w1 AND bg.b2 = p.w2
  LEFT JOIN bik bk ON bk.b1 = p.w2 AND bk.b2 = p.w3
  JOIN uni u2 ON u2.w = p.w2
  JOIN uni u3 ON u3.w = p.w3
  CROSS JOIN nt
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_positions,
       CAST(SUM(CASE WHEN pth = 'tri' THEN 1 ELSE 0 END) AS BIGINT) AS n_tri,
       CAST(SUM(CASE WHEN pth = 'bi' THEN 1 ELSE 0 END) AS BIGINT) AS n_bi,
       CAST(SUM(CASE WHEN pth = 'uni' THEN 1 ELSE 0 END) AS BIGINT) AS n_uni,
       CAST(SUM(term) AS BIGINT) AS score_scaled
FROM sc GROUP BY doc_id
"""


def test_stupid_backoff_handchecked(spark):
    """Budget 1 trigram / 1 bigram over 'a b c a b c' + 'a b x':
    trigram counts (a,b,c)=2 (b,c,a)=1 (c,a,b)=1 (a,b,x)=1 -> kept:
    (a,b,c). Bigrams (a,b)=3 (b,c)=2 (c,a)=1 (b,x)=1 -> kept (a,b).
    Doc 2's positions: (a,b,x): not kept tri; (b,x) not kept bi ->
    uni path on x: cu(x)=1, N=9 -> ((1000000 // 9)*4)//25 =
    (111111*4)//25 = 17777.
    Doc 1: (a,b,c) tri path (2*10^6)//3 = 666666 twice; (b,c,a):
    (c,a) bi not kept -> uni on a: cu(a)=3 -> ((3000000//9)*4)//25
    = (333333*4)//25 = 53333; (c,a,b): (a,b) IS kept bi: cb=3,
    cu(a)=3 -> ((3000000//3)*2)//5 = 400000."""
    from kinesis_stream_video_project_spark.operators import lm

    docs = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b x")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_positions, r.n_tri, r.n_bi, r.n_uni, r.score_scaled)
        for r in lm.stupid_backoff_scores(
            docs, tri_budget=1, bi_budget=1, scale=10**6
        ).collect()
    }
    assert got[2] == (1, 0, 0, 1, 17777)
    assert got[1] == (4, 2, 1, 1, 666666 * 2 + 400000 + 53333)


def test_stupid_backoff_short_doc_no_row(spark):
    from kinesis_stream_video_project_spark.operators import lm

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert lm.stupid_backoff_scores(docs).collect() == []


def test_stupid_backoff_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs the DuckDB oracle at the registered budgets
    (tri 2000 / bi 500), and ALL THREE backoff paths non-empty at the
    fixture SF (the budget-pruning rationale: an absolute min-count
    cannot keep all paths live across corpus sizes)."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import lm

    d = io.load_table(spark, sf_dir, "documents")
    pdf = lm.stupid_backoff_scores(d).toPandas()
    got = _rendered(pdf)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = _rendered(
        con.sql(
            BACKOFF_ORACLE_SHAPE.format(tb=2000, bb=500, scale=10**6)
        ).df()
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0
    assert pdf["n_tri"].astype(int).sum() > 0
    assert pdf["n_bi"].astype(int).sum() > 0
    assert pdf["n_uni"].astype(int).sum() > 0


# ---------------------------------------------------------------------------
# Audio silence runs
# ---------------------------------------------------------------------------

SILENCE_ORACLE_SHAPE = """
WITH chars AS (SELECT doc_id, len(text) AS n, text FROM documents),
samples AS (
  SELECT doc_id, j.j AS j,
         ord(substr(text, 2*j.j - 1, 1)) + 256 * ord(substr(text, 2*j.j, 1)) AS raw
  FROM chars, UNNEST(generate_series(1, CAST(n // 2 AS BIGINT))) AS j(j)
),
signed AS (
  SELECT doc_id, j,
         CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS s
  FROM samples
),
framed AS (SELECT doc_id, (j - 1) // 64 AS frame_no, s FROM signed),
agg AS (
  SELECT doc_id, frame_no, COUNT(*) AS cnt,
         CAST(SUM(s * s) AS BIGINT) AS e
  FROM framed GROUP BY 1, 2
),
f AS (SELECT doc_id AS media_id, frame_no, e FROM agg WHERE cnt = 64),
m AS (SELECT media_id, COUNT(*) AS nf, SUM(e) AS se FROM f GROUP BY 1),
sil AS (
  SELECT f.media_id, f.frame_no
  FROM f JOIN m USING (media_id)
  WHERE f.e * 1000 * m.nf < m.se * 950
),
isl AS (
  SELECT media_id, frame_no,
         frame_no - row_number() OVER (
           PARTITION BY media_id ORDER BY frame_no) AS g
  FROM sil
)
SELECT media_id, CAST(MIN(frame_no) AS BIGINT) AS start_frame,
       CAST(MAX(frame_no) AS BIGINT) AS end_frame,
       CAST(COUNT(*) AS BIGINT) AS n_frames
FROM isl GROUP BY media_id, g
"""


def test_audio_silence_runs_handchecked(spark):
    """5 frames of 4 samples: loud/loud/quiet/quiet/loud (amp 1000 vs
    10). Mean energy ≈ 2.4e6, so both quiet frames flag and merge into
    ONE run [2, 3]; the loud frames emit nothing."""
    import struct

    from kinesis_stream_video_project_spark.operators import multimodal

    samples = [1000] * 8 + [10] * 8 + [1000] * 4
    payload = b"".join(struct.pack("<h", s) for s in samples)
    man = spark.createDataFrame(
        [(7, "audio", payload, (0, 0, "x"))],
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,origin:string>",
    )
    got = [
        (r.media_id, r.start_frame, r.end_frame, r.n_frames)
        for r in multimodal.audio_silence_runs(man, frame_samples=4).collect()
    ]
    assert got == [(7, 2, 3, 2)]
    # all-equal frames: nothing below 95% of the mean -> no rows
    flat = b"".join(struct.pack("<h", 500) for _ in range(20))
    man2 = spark.createDataFrame(
        [(8, "audio", flat, (0, 0, "x"))],
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,origin:string>",
    )
    assert multimodal.audio_silence_runs(man2, frame_samples=4).collect() == []


def test_audio_silence_runs_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs the DuckDB replay (energy CTE + cross-multiplied
    threshold + islands) on the fixture manifest; non-degenerate (the
    ASCII corpus has ~8% of frames under 95% of their media mean)."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import multimodal

    d = io.load_table(spark, sf_dir, "documents")
    got = _rendered(
        multimodal.audio_silence_runs(
            multimodal.media_manifest(d)
        ).toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = _rendered(con.sql(SILENCE_ORACLE_SHAPE).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0


# ---------------------------------------------------------------------------
# N-gram novelty
# ---------------------------------------------------------------------------

NOVELTY_ORACLE_SHAPE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
posts AS (
  SELECT DISTINCT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gh
  FROM (
    SELECT doc_id,
           UNNEST(list_transform(
             generate_series(1, len(t) - {n} + 1),
             i -> array_to_string(list_slice(t, i, i + {n} - 1), ' ')
           )) AS g
    FROM toks WHERE len(t) >= {n}
  )
),
fst AS (SELECT gh, MIN(doc_id) AS fd FROM posts GROUP BY 1)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST((SUM(CASE WHEN fd = doc_id THEN 1 ELSE 0 END) * 1000)
            // COUNT(*) AS BIGINT) AS novelty_permille
FROM posts JOIN fst USING (gh) GROUP BY doc_id
"""


def test_ngram_novelty_handchecked(spark):
    """n=2 over: doc1 'a b c' (grams ab, bc — both novel), doc2
    'b c d' (bc seen in doc1, cd novel -> 500 permille), doc3 'a b c'
    (all grams first seen earlier -> 0), doc4 'x' (<n tokens -> no
    row)."""
    from kinesis_stream_video_project_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "b c d"), (3, "a b c"), (4, "x")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.n_novel, r.novelty_permille)
        for r in dd.ngram_novelty(docs, n=2).collect()
    }
    assert got == {1: (2, 2, 1000), 2: (2, 1, 500), 3: (2, 0, 0)}


def test_ngram_novelty_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs the DuckDB replay at the registered n=8;
    non-degenerate BOTH ways at the fixture SF: some doc has novelty
    < 1000 (the planted dup clusters) and some has novelty 1000."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import dedup as dd

    d = io.load_table(spark, sf_dir, "documents")
    pdf = dd.ngram_novelty(d).toPandas()
    got = _rendered(pdf)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = _rendered(con.sql(NOVELTY_ORACLE_SHAPE.format(n=8)).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0
    pm = pdf["novelty_permille"].astype(int)
    assert (pm < 1000).any() and (pm == 1000).any()


# ---------------------------------------------------------------------------
# SQ8 scalar-quantized ANN tier
# ---------------------------------------------------------------------------

SQ8_ORACLE_SHAPE = """
WITH bounds AS (
  SELECT i.i AS dim, MIN(CAST(e.embedding[i.i] AS DOUBLE)) AS mn,
         MAX(CAST(e.embedding[i.i] AS DOUBLE)) AS mx
  FROM embeddings e, UNNEST(generate_series(1, 64)) AS i(i)
  GROUP BY i.i
),
codes AS (
  SELECT v.vec_id, i.i AS dim,
         CASE WHEN b.mx = b.mn THEN 0
              ELSE CAST(floor((CAST(v.embedding[i.i] AS DOUBLE) - b.mn)
                              / (b.mx - b.mn) * 254.0 + 0.5) AS BIGINT) - 127
         END AS code
  FROM embeddings v, UNNEST(generate_series(1, 64)) AS i(i)
  JOIN bounds b ON b.dim = i.i
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id,
         CAST(SUM(q.code * c.code) AS BIGINT) AS score_q
  FROM codes q JOIN codes c USING (dim)
  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
  GROUP BY 1, 2
)
SELECT query_id, vec_id, score_q,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY score_q DESC, vec_id
       ) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= 10
"""


def test_sq8_quantize_handchecked(spark):
    """Known codebook: dim bounds [0, 2] and [0, 4]; x = (1, 2) ->
    normalized 0.5 both -> floor(127.5) - 127 = 0. Extremes map to
    ±127; a degenerate dim (mx == mn) codes 0."""
    from kinesis_stream_video_project_spark.operators import similarity as sim

    e = spark.createDataFrame(
        [(1, [0.0, 0.0, 7.0]), (2, [2.0, 4.0, 7.0])],
        "vec_id long, embedding array<float>",
    )
    b = sim.sq8_bounds(e).collect()[0]
    assert b.mins == [0.0, 0.0, 7.0] and b.maxs == [2.0, 4.0, 7.0]
    from pyspark.sql import functions as F2

    codes = {
        r.vec_id: r.q
        for r in e.crossJoin(F2.broadcast(sim.sq8_bounds(e)))
        .select(
            "vec_id",
            sim._sq8_quantize(
                F2.col("embedding"), F2.col("mins"), F2.col("maxs")
            ).alias("q"),
        )
        .collect()
    }
    assert codes[1] == [-127, -127, 0]  # minima -> -127; degenerate -> 0
    assert codes[2] == [127, 127, 0]    # maxima -> +127


def test_sq8_topk_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs the DuckDB quantize-and-score replay (query set
    vec_id < 5, the cosine_topk convention)."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import similarity as sim

    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = _rendered(sim.sq8_topk(q, e, k=10).toPandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = _rendered(con.sql(SQ8_ORACLE_SHAPE).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) == 50


def test_sq8_recall_vs_exact_floor(spark, sf_dir):
    """The tier's quality contract: recall@10 of the int8 tier against
    the exact cosine tier stays >= 0.5 on the fixture (measured 0.7-1.0
    across SFs — int8 loses far less than the 4x memory it saves; the
    IVF tier's 0.35 floor is the comparable claim)."""
    from kinesis_stream_video_project_spark.operators import similarity as sim

    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    sq = sim.sq8_topk(q, e, k=10).select("query_id", "vec_id")
    ex = sim.cosine_topk(q, e, k=10).select("query_id", "vec_id")
    n_overlap = sq.join(ex, ["query_id", "vec_id"], "left_semi").count()
    assert n_overlap >= 0.5 * 50


# ---------------------------------------------------------------------------
# Neighborhood Jaccard + clustering coefficient (≤3-part basket graph)
# ---------------------------------------------------------------------------

_GRAPH3_CTE = """
li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
ok AS (SELECT l_orderkey FROM li GROUP BY 1 HAVING COUNT(*) <= 3),
li2 AS (SELECT li.* FROM li JOIN ok USING (l_orderkey)),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM li2 a JOIN li2 b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
b AS MATERIALIZED (SELECT p1 AS src, p2 AS dst FROM e UNION ALL SELECT p2, p1 FROM e),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM b GROUP BY src)
"""

JACCARD_ORACLE_SHAPE = (
    "WITH " + _GRAPH3_CTE + """,
cm AS (
  SELECT a.dst AS p_a, b2.dst AS p_b, COUNT(*) AS n_common
  FROM b a JOIN b b2 ON a.src = b2.src AND a.dst < b2.dst
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT p_a, p_b, CAST(n_common AS BIGINT) AS n_common,
       CAST((n_common * 1000) // (da.deg + db.deg - n_common) AS BIGINT)
         AS jaccard_permille
FROM cm JOIN deg da ON da.src = p_a JOIN deg db ON db.src = p_b
"""
)

CC_ORACLE_SHAPE = (
    "WITH " + _GRAPH3_CTE + """,
w AS (
  SELECT a.src AS c, a.dst AS p_a, b2.dst AS p_b
  FROM b a JOIN b b2 ON a.src = b2.src AND a.dst < b2.dst
),
tri AS (SELECT w.* FROM w JOIN e ON e.p1 = w.p_a AND e.p2 = w.p_b),
tc AS (SELECT c AS p, COUNT(*) AS nt FROM tri GROUP BY 1)
SELECT d.src AS p, CAST(d.deg AS BIGINT) AS deg,
       CAST(COALESCE(tc.nt, 0) AS BIGINT) AS n_triangles,
       CAST((COALESCE(tc.nt, 0) * 2000) // (d.deg * (d.deg - 1)) AS BIGINT)
         AS cc_permille
FROM deg d LEFT JOIN tc ON tc.p = d.src
WHERE d.deg >= 2
"""
)


def _g_edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "p1 long, p2 long, n_orders long"
    )


def test_neighbor_jaccard_handchecked(spark):
    """Square 1-2-3-4: diagonals share both neighbours -> J = 2/2 =
    1000 permille; adjacent pairs share none -> absent. K3: every pair
    shares exactly the third node -> J = 1/3 = 333."""
    from kinesis_stream_video_project_spark.operators import graph

    sq = _g_edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    got = {
        (r.p_a, r.p_b): (r.n_common, r.jaccard_permille)
        for r in graph.neighbor_jaccard(sq).collect()
    }
    assert got == {(1, 3): (2, 1000), (2, 4): (2, 1000)}

    k3 = _g_edges(spark, [(1, 2), (2, 3), (1, 3)])
    got = {
        (r.p_a, r.p_b): (r.n_common, r.jaccard_permille)
        for r in graph.neighbor_jaccard(k3).collect()
    }
    assert got == {(1, 2): (1, 333), (1, 3): (1, 333), (2, 3): (1, 333)}
    # min_common floors the K3 single-witness pairs away
    assert graph.neighbor_jaccard(k3, min_common=2).collect() == []


def test_clustering_coefficient_handchecked(spark):
    """K3: every node cc = 1000 (1 triangle, deg 2). Square: deg-2
    nodes, zero triangles -> cc 0. Path 1-2-3: only node 2 has deg >=
    2; leaves are excluded."""
    from kinesis_stream_video_project_spark.operators import graph

    k3 = _g_edges(spark, [(1, 2), (2, 3), (1, 3)])
    got = {
        r.p: (r.deg, r.n_triangles, r.cc_permille)
        for r in graph.clustering_coefficient(k3).collect()
    }
    assert got == {1: (2, 1, 1000), 2: (2, 1, 1000), 3: (2, 1, 1000)}

    sq = _g_edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    got = {
        r.p: r.cc_permille
        for r in graph.clustering_coefficient(sq).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 0}

    path = _g_edges(spark, [(1, 2), (2, 3)])
    got = {
        r.p: (r.deg, r.n_triangles, r.cc_permille)
        for r in graph.clustering_coefficient(path).collect()
    }
    assert got == {2: (2, 0, 0)}


def test_neighbor_jaccard_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs DuckDB on the ≤3-part basket graph at min_common=2
    (probed 2737/4476/4864 pairs at the three SFs — the floor keeps the
    output evidence-weighted instead of |wedge-pairs|-sized)."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import graph

    li = io.load_table(spark, sf_dir, "lineitem")
    sets3 = graph.order_part_sets(li).filter(F.size("ps") <= 3)
    got = _rendered(
        graph.neighbor_jaccard(
            graph.edges_from_sets(sets3), min_common=2
        ).toPandas()
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    want = _rendered(con.sql(JACCARD_ORACLE_SHAPE).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0


def test_clustering_coefficient_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs DuckDB on the ≤3-part basket graph (probed
    1503/9540/89217 triangles at the three SFs — the ≤2 cap of the RA
    registration has ZERO triangles at sf0.1, which is why this family
    registers at ≤3); nonzero cc somewhere."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import graph

    li = io.load_table(spark, sf_dir, "lineitem")
    sets3 = graph.order_part_sets(li).filter(F.size("ps") <= 3)
    pdf = graph.clustering_coefficient(
        graph.edges_from_sets(sets3)
    ).toPandas()
    got = _rendered(pdf)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    want = _rendered(con.sql(CC_ORACLE_SHAPE).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0
    assert (pdf["cc_permille"].astype(int) > 0).any()


# ---------------------------------------------------------------------------
# RFM segmentation
# ---------------------------------------------------------------------------

RFM_ORACLE_SHAPE = """
WITH pc AS (
  SELECT o_custkey, MAX(o_orderdate) AS r,
         COUNT(*) AS f, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
  FROM orders GROUP BY 1
)
SELECT o_custkey AS custkey,
       CAST(ntile(4) OVER (ORDER BY r, o_custkey) AS BIGINT) AS r_q,
       CAST(ntile(4) OVER (ORDER BY f, o_custkey) AS BIGINT) AS f_q,
       CAST(ntile(4) OVER (ORDER BY m, o_custkey) AS BIGINT) AS m_q,
       CAST(ntile(4) OVER (ORDER BY r, o_custkey) * 100
            + ntile(4) OVER (ORDER BY f, o_custkey) * 10
            + ntile(4) OVER (ORDER BY m, o_custkey) AS BIGINT) AS segment_code
FROM pc
"""


def test_rfm_handchecked(spark):
    """5 customers, n_tiles=2: ntile(2) over 5 rows puts 3 in bucket 1
    and 2 in bucket 2 (earlier buckets larger — the SQL rule). Customer
    50 (latest date, most orders, biggest spend) codes 222; customer 10
    (earliest/fewest/least) codes 111."""
    import datetime as dt

    from kinesis_stream_video_project_spark.operators import stats

    rows = []
    oid = 0
    for ck, (day, n_orders, price) in {
        10: (1, 1, 10.0),
        20: (2, 2, 20.0),
        30: (3, 3, 30.0),
        40: (4, 4, 40.0),
        50: (5, 5, 50.0),
    }.items():
        for i in range(n_orders):
            oid += 1
            rows.append(
                (oid, ck, dt.date(1995, 1, day), float(price))
            )
    o = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double"
    )
    got = {
        r.custkey: (r.r_q, r.f_q, r.m_q, r.segment_code)
        for r in stats.rfm_segments(o, n_tiles=2).collect()
    }
    assert got[10] == (1, 1, 1, 111)
    assert got[50] == (2, 2, 2, 222)
    assert got[30] == (1, 1, 1, 111)  # rank 3 of 5 -> first (larger) bucket
    assert got[40] == (2, 2, 2, 222)


def test_rfm_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs DuckDB ntile over the same total orders; segment
    diversity sanity (>= 10 distinct codes at the fixture SF)."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import stats

    o = io.load_table(spark, sf_dir, "orders")
    pdf = stats.rfm_segments(o).toPandas()
    got = _rendered(pdf)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM '{sf_dir}/orders.parquet'")
    want = _rendered(con.sql(RFM_ORACLE_SHAPE).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0
    assert pdf["segment_code"].nunique() >= 10


# ---------------------------------------------------------------------------
# Two-stage SQ8 shortlist -> exact rerank
# ---------------------------------------------------------------------------

RERANK_ORACLE_SHAPE = """
WITH bounds AS (
  SELECT i.i AS dim, MIN(CAST(e.embedding[i.i] AS DOUBLE)) AS mn,
         MAX(CAST(e.embedding[i.i] AS DOUBLE)) AS mx
  FROM embeddings e, UNNEST(generate_series(1, 64)) AS i(i)
  GROUP BY i.i
),
codes AS (
  SELECT v.vec_id, i.i AS dim,
         CASE WHEN b.mx = b.mn THEN 0
              ELSE CAST(floor((CAST(v.embedding[i.i] AS DOUBLE) - b.mn)
                              / (b.mx - b.mn) * 254.0 + 0.5) AS BIGINT) - 127
         END AS code
  FROM embeddings v, UNNEST(generate_series(1, 64)) AS i(i)
  JOIN bounds b ON b.dim = i.i
),
q_scored AS (
  SELECT q.vec_id AS query_id, c.vec_id,
         CAST(SUM(q.code * c.code) AS BIGINT) AS score_q
  FROM codes q JOIN codes c USING (dim)
  WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY score_q DESC, vec_id) AS r
    FROM q_scored
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


def test_sq8_rerank_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs the DuckDB two-stage replay (int8 shortlist of 50,
    exact r4-rounded cosine rerank to 10)."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import similarity as sim

    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = _rendered(sim.sq8_rerank_topk(q, e, k=10, shortlist=50).toPandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = _rendered(con.sql(RERANK_ORACLE_SHAPE).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) == 50


def test_sq8_rerank_dominates_raw_sq8(spark, sf_dir):
    """The composition claim: reranking the shortlist with exact cosine
    can only FIX quantized-ordering mistakes, never add misses — so
    rerank recall@10 (vs the exact tier) >= raw sq8 recall@10, and the
    reranked list's per-query cosine ordering is exact among
    candidates."""
    from kinesis_stream_video_project_spark.operators import similarity as sim

    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = sim.cosine_topk(q, e, k=10).select("query_id", "vec_id")
    raw = sim.sq8_topk(q, e, k=10).select("query_id", "vec_id")
    rer = sim.sq8_rerank_topk(q, e, k=10, shortlist=50).select(
        "query_id", "vec_id"
    )
    raw_overlap = raw.join(exact, ["query_id", "vec_id"], "left_semi").count()
    rer_overlap = rer.join(exact, ["query_id", "vec_id"], "left_semi").count()
    assert rer_overlap >= raw_overlap
    assert rer_overlap >= 0.7 * 50


# ---------------------------------------------------------------------------
# Row-local / streaming Bloom scorer (the physical-bitmap form)
# ---------------------------------------------------------------------------


def test_bloom_rowlocal_equals_join_form(spark, sf_dir):
    """The physical-bitmap row-local scorer must make bit-identical
    bloom decisions to the position-set join form on the fixture split
    (bitmap-bit-set ⟺ position-in-set by construction; this pins the
    packing arithmetic — 32-bit words, power lookup, bitwiseAND)."""
    from kinesis_stream_video_project_spark.operators import bloom
    from kinesis_stream_video_project_spark.operators.sampling import (
        hash_bucket,
    )

    d = io.load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    train, ev = d.filter(b < 80), d.filter(b >= 90)
    want = {
        r.doc_id: (r.n_grams, r.n_bloom_hits)
        for r in bloom.bloom_decontaminate(train, ev).collect()
    }
    got = {
        r.doc_id: (r.n_grams, r.n_bloom_hits)
        for r in bloom.bloom_scores_rowlocal(train, ev).collect()
    }
    assert got == want and len(got) > 0


def test_bloom_rowlocal_streaming_drain(spark, tmp_path):
    """The same operator applied to a STREAMING frame: two-file
    availableNow drain scores every arriving doc against the broadcast
    bitmap (stream-static, stateless) and matches the batch run on the
    union — the decontaminate-at-ingest path."""
    import time

    rows1 = [(1, "a b c d e f g"), (2, "q r s t u v")]
    rows2 = [(3, "a b c d e zzz"), (4, "m n o p q r s")]
    ev_rows = [(100, "a b c d e")]
    schema = "doc_id long, text string"
    src = tmp_path / "docs_src"
    src.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "f1"))
    time.sleep(1.1)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src / "f2"))

    from kinesis_stream_video_project_spark.operators import bloom

    ev = spark.createDataFrame(ev_rows, schema)
    stream = (
        spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    out = bloom.bloom_scores_rowlocal(stream, ev)
    q = (
        out.writeStream.format("memory")
        .queryName("bloom_stream_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_bloom"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.n_grams, r.n_bloom_hits)
        for r in spark.sql("SELECT * FROM bloom_stream_out").collect()
    }
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = {
        (r.doc_id, r.n_grams, r.n_bloom_hits)
        for r in bloom.bloom_scores_rowlocal(batch, ev).collect()
    }
    assert got == want and len(got) == 4
    # doc 1 contains the eval 5-gram -> at least one bloom hit
    assert any(d == 1 and nb >= 1 for d, _ng, nb in got)


# ---------------------------------------------------------------------------
# Token-bucket rate limiting (7th both-API stateful op)
# ---------------------------------------------------------------------------

RATELIMIT_ORACLE_SHAPE = """
WITH RECURSIVE ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
fold AS (
  SELECT user_id, CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS tokens_us,
         CAST(-1 AS BIGINT) AS last_us,
         CAST(NULL AS BIGINT) AS ts_us, CAST(NULL AS BIGINT) AS event_id,
         CAST(NULL AS BOOLEAN) AS admitted
  FROM (SELECT DISTINCT user_id FROM ev)
  UNION ALL
  SELECT e.user_id, e.rn,
         CASE WHEN (CASE WHEN f.last_us < 0 THEN {cap}
                    ELSE LEAST({cap}, f.tokens_us
                         + ((e.ts_us - f.last_us) * {refill}) // {per_s}) END)
                   >= {cost}
              THEN (CASE WHEN f.last_us < 0 THEN {cap}
                    ELSE LEAST({cap}, f.tokens_us
                         + ((e.ts_us - f.last_us) * {refill}) // {per_s}) END)
                   - {cost}
              ELSE (CASE WHEN f.last_us < 0 THEN {cap}
                    ELSE LEAST({cap}, f.tokens_us
                         + ((e.ts_us - f.last_us) * {refill}) // {per_s}) END)
         END,
         e.ts_us, e.ts_us, e.event_id,
         (CASE WHEN f.last_us < 0 THEN {cap}
               ELSE LEAST({cap}, f.tokens_us
                    + ((e.ts_us - f.last_us) * {refill}) // {per_s}) END)
         >= {cost}
  FROM fold f JOIN ev e ON e.user_id = f.user_id AND e.rn = f.rn + 1
)
SELECT user_id, ts_us, event_id, admitted, tokens_us AS tokens_us_after
FROM fold WHERE rn > 0
"""


def _rl_oracle(cap_tokens=2, cost_tokens=1, refill=1, per_s=14400):
    return RATELIMIT_ORACLE_SHAPE.format(
        cap=cap_tokens * 1_000_000,
        cost=cost_tokens * 1_000_000,
        refill=refill,
        per_s=per_s,
    )


def test_token_bucket_fold_handchecked():
    """cap 2, cost 1, 1 token/10 s: cold start = full bucket (2). Burst
    of 3 at t=0: admit, admit, REJECT (reject spends nothing). +5 s:
    half a token — still reject. +10 s more: 1.5 tokens — admit (0.5
    left). +100 s: clamped to cap, admit."""
    from kinesis_stream_video_project_spark.operators.ratelimit import (
        token_bucket_fold,
    )

    S = 1_000_000
    rows = [
        (0, 1), (0, 2), (0, 3),
        (5 * S, 4),
        (15 * S, 5),
        (115 * S, 6),
    ]
    _t, _l, emits = token_bucket_fold(0, -1, rows, 1, 10, 2, 1)
    assert [(e[1], e[2], e[3]) for e in emits] == [
        (1, True, 1 * S),
        (2, True, 0),
        (3, False, 0),
        (4, False, S // 2),
        (5, True, S // 2),      # 0.5 + 1.0 gained - 1 cost
        (6, True, 1 * S),       # clamped to 2, spend 1
    ]


def test_rate_limit_oracle_shape_matches(spark, sf_dir):
    """The batch twin vs the recursive-CTE DuckDB fold at the probed
    registration parameters (1 token/4 h, cap 2 — 5.3-5.7% rejected at
    every SF; 1/7200/3 was probed at 0.1-0.7%, too thin to be a
    meaningful gate)."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import ratelimit as rl

    ev = io.load_table(spark, sf_dir, "events")
    pdf = rl.rate_limit_decisions(ev).toPandas()
    got = _rendered(pdf)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = _rendered(con.sql(_rl_oracle()).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0
    n_rej = (~pdf["admitted"]).sum()
    assert n_rej > 0 and n_rej < len(pdf)


def test_rate_limit_stream_equals_batch_both_apis(spark, tmp_path):
    """Two-file event-time-ordered drain through BOTH stateful APIs
    equals the batch replay decision-for-decision (shared fold; the
    two-API discipline's seventh op)."""
    import datetime as dt
    import time

    from kinesis_stream_video_project_spark.operators import ratelimit as rl
    from kinesis_stream_video_project_spark.streaming import jobs

    base = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    mk = lambda s, u, i: (i, base + dt.timedelta(seconds=s), u, "e")
    rows1 = [mk(0, 1, 1), mk(1, 1, 2), mk(2, 1, 3), mk(0, 2, 4)]
    rows2 = [mk(20000, 1, 5), mk(40000, 2, 6), mk(40001, 2, 7)]
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    src = tmp_path / "rl_src"
    src.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(
        str(src / "f1")
    )
    time.sleep(1.1)
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(
        str(src / "f2")
    )
    batch = spark.createDataFrame(rows1 + rows2, schema)
    want = {
        (r.user_id, r.ts_us, r.event_id, r.admitted, r.tokens_us_after)
        for r in rl.rate_limit_decisions(
            batch, refill_tokens=1, per_seconds=10000, capacity_tokens=2
        ).collect()
    }
    for name, fn in [
        ("gs", jobs.rate_limit_stream),
        ("tws", jobs.rate_limit_stream_tws),
    ]:
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src / "*"))
        )
        out = fn(
            stream, refill_tokens=1, per_seconds=10000, capacity_tokens=2
        )
        q = (
            out.writeStream.format("memory")
            .queryName(f"rl_out_{name}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_rl_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.user_id, r.ts_us, r.event_id, r.admitted, r.tokens_us_after)
            for r in spark.sql(f"SELECT * FROM rl_out_{name}").collect()
        }
        assert got == want, name
    # the crafted sequence exercises both outcomes
    assert any(not a for _u, _t, _e, a, _k in want)
    assert any(a for _u, _t, _e, a, _k in want)


# ---------------------------------------------------------------------------
# Product quantization (ADC top-k)
# ---------------------------------------------------------------------------

PQ_ORACLE_SHAPE = """
WITH sub AS (
  SELECT vec_id, s.s AS s,
         list_transform(list_slice(embedding, s.s*8 + 1, s.s*8 + 8),
                        x -> CAST(x AS DOUBLE)) AS sv
  FROM embeddings, UNNEST(generate_series(0, 7)) AS s(s)
),
a0 AS (SELECT vec_id, s, sv, CAST(vec_id % 256 AS INT) AS cell FROM sub),
c1 AS (
  SELECT s, cell, list(mean_c ORDER BY dim) AS centroid
  FROM (
    SELECT s, cell, d.d AS dim, AVG(sv[d.d]) AS mean_c
    FROM a0, UNNEST(generate_series(1, 8)) AS d(d)
    GROUP BY s, cell, d.d
  ) GROUP BY s, cell
),
a1 AS (
  SELECT vec_id, s, sv, cell FROM (
    SELECT a.vec_id, a.s, a.sv, c.cell,
           row_number() OVER (
             PARTITION BY a.vec_id, a.s
             ORDER BY list_sum(list_transform(generate_series(1, 8),
                        i -> (a.sv[i] - c.centroid[i])
                           * (a.sv[i] - c.centroid[i]))) ASC,
                      c.cell ASC) AS rn
    FROM sub a JOIN c1 c ON c.s = a.s
  ) WHERE rn = 1
),
c2 AS (
  SELECT s, cell, list(mean_c ORDER BY dim) AS centroid
  FROM (
    SELECT s, cell, d.d AS dim, AVG(sv[d.d]) AS mean_c
    FROM a1, UNNEST(generate_series(1, 8)) AS d(d)
    GROUP BY s, cell, d.d
  ) GROUP BY s, cell
),
codes AS (
  SELECT vec_id, s, cell AS code FROM (
    SELECT a.vec_id, a.s, c.cell,
           row_number() OVER (
             PARTITION BY a.vec_id, a.s
             ORDER BY list_sum(list_transform(generate_series(1, 8),
                        i -> (a.sv[i] - c.centroid[i])
                           * (a.sv[i] - c.centroid[i]))) ASC,
                      c.cell ASC) AS rn
    FROM sub a JOIN c2 c ON c.s = a.s
  ) WHERE rn = 1
),
lut AS (
  SELECT q.vec_id AS query_id, q.s, c.cell AS code,
         list_sum(list_transform(generate_series(1, 8),
                  i -> q.sv[i] * c.centroid[i])) AS pdot
  FROM sub q JOIN c2 c ON c.s = q.s
  WHERE q.vec_id < 5
),
sc AS (
  SELECT l.query_id, k.vec_id,
         (floor(SUM(l.pdot) * 10000.0 + 0.5) / 10000.0) AS score_q
  FROM codes k JOIN lut l ON l.s = k.s AND l.code = k.code
  WHERE k.vec_id <> l.query_id
  GROUP BY 1, 2
)
SELECT query_id, vec_id, score_q,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY score_q DESC, vec_id
       ) AS BIGINT) AS rank
FROM sc
QUALIFY rank <= 10
"""


def test_pq_codes_shape(spark):
    """Every vector gets exactly n_subspaces codes in
    [0, n_centroids); a corpus of two well-separated groups codes the
    groups to different cells in every subspace."""
    from kinesis_stream_video_project_spark.operators import similarity as sim

    rows = [(i, [float(i % 2) * 10.0] * 64) for i in range(8)]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents, codes = sim.pq_train_codes(e, n_centroids=4)
    got = {(r.vec_id, r.s): r.code for r in codes.collect()}
    assert len(got) == 8 * 8
    assert all(0 <= c < 4 for c in got.values())
    for s in range(8):
        even = {got[(i, s)] for i in range(0, 8, 2)}
        odd = {got[(i, s)] for i in range(1, 8, 2)}
        assert len(even) == 1 and len(odd) == 1 and even != odd


def test_pq_adc_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs the DuckDB replay of the full PQ pipeline (subspace
    split → deterministic Lloyd → encode → LUT ADC scoring) at the
    registered 8×256 geometry — the float-Lloyd determinism precedent
    ivf_kmeans_topk has held since r4, one level deeper."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import similarity as sim

    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = _rendered(sim.pq_adc_topk(q, e, k=10, n_centroids=256).toPandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = _rendered(con.sql(PQ_ORACLE_SHAPE).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) == 50


def test_pq_recall_floor(spark, sf_dir):
    """Quality contract of the 32x-compression tier: recall@10 vs the
    exact cosine tier >= 0.2 (measured 0.56 at sf0.01 and 0.24 at
    sf0.1 — PQ at 8 bytes per vector is far lossier than SQ8's 64, and
    recall degrades with corpus density; the ladder's point is choosing
    the trade, the floor documents it, and the production answer to a
    tighter budget is the PQ-shortlist -> exact-rerank composition the
    SQ8 tier demonstrates)."""
    from kinesis_stream_video_project_spark.operators import similarity as sim

    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pq = sim.pq_adc_topk(q, e, k=10, n_centroids=256).select(
        "query_id", "vec_id"
    )
    exact = sim.cosine_topk(q, e, k=10).select("query_id", "vec_id")
    assert pq.join(exact, ["query_id", "vec_id"], "left_semi").count() >= 10


def test_curation_pipeline_v4_registration_oracle(spark, sf_dir):
    """The composed pipeline's registered Spark/oracle pair,
    rendered-value exact (funnel probed non-degenerate at every SF:
    395→372 / 395→365 / 3965→2482 docs kept)."""
    import duckdb

    from kinesis_stream_video_project_spark.plans import registry

    spec = registry.all_queries()["curation_pipeline_v4"]
    got = _rendered(spec.fn(spark, sf_dir).toPandas())
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = _rendered(con.sql(spec.oracle).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) == 20
