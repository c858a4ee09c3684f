"""Round-8 registration queue: resource-allocation link prediction,
BM25 retrieval, BPE merge candidates — pytest-verified with validated
DuckDB oracle shapes before registration (the paste-don't-debug
discipline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators import graph

_SCALE = 10**9

RA_ORACLE_SHAPE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
b AS MATERIALIZED (SELECT p1 AS src, p2 AS dst FROM e UNION ALL SELECT p2, p1 FROM e),
deg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM b GROUP BY src),
w AS (
  SELECT a.dst AS p_a, b2.dst AS p_b, {scale} // d.deg AS contrib
  FROM b a
  JOIN b b2 ON a.src = b2.src AND a.dst < b2.dst
  JOIN deg d ON d.src = a.src
),
s AS (
  SELECT p_a, p_b, CAST(SUM(contrib) AS BIGINT) AS ra_scaled
  FROM w GROUP BY 1, 2
)
SELECT s.p_a, s.p_b, s.ra_scaled FROM s
WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.p1 = s.p_a AND e.p2 = s.p_b)
"""


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1) for a, b in pairs], "p1 long, p2 long, n_orders long"
    )


def test_ra_linkpred_handchecked(spark):
    """Path 1-2-3: RA(1,3) = scale div deg(2). Square 1-2-3-4: both
    diagonals score 2·(scale div 2) = scale. K3: every pair adjacent ->
    empty (prediction targets NEW links only)."""
    path = _edges(spark, [(1, 2), (2, 3)])
    got = {
        (r.p_a, r.p_b): r.ra_scaled
        for r in graph.ra_link_prediction(path, scale=_SCALE).collect()
    }
    assert got == {(1, 3): _SCALE // 2}

    square = _edges(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    got = {
        (r.p_a, r.p_b): r.ra_scaled
        for r in graph.ra_link_prediction(square, scale=_SCALE).collect()
    }
    assert got == {(1, 3): _SCALE, (2, 4): _SCALE}

    k3 = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    assert graph.ra_link_prediction(k3, scale=_SCALE).collect() == []


def test_ra_linkpred_hub_cap(spark):
    """max_wedge_degree drops high-degree CENTERS before the wedge join
    (deg² rows each worth ~scale/deg -> nothing); with the star hub
    capped out, no wedges survive."""
    star = _edges(spark, [(0, i) for i in range(1, 6)] + [(1, 2)])
    full = {
        (r.p_a, r.p_b): r.ra_scaled
        for r in graph.ra_link_prediction(star, scale=_SCALE).collect()
    }
    # every leaf pair except the adjacent (1,2) shares hub 0 (deg 5)
    assert len(full) == 9 and set(full.values()) == {_SCALE // 5}
    capped = graph.ra_link_prediction(
        star, scale=_SCALE, max_wedge_degree=4
    ).collect()
    assert capped == []


def test_ra_linkpred_matches_bruteforce_and_oracle(spark, sf_dir):
    """Full RA pair set on the fixture co-purchase graph vs a python
    replay AND the DuckDB oracle shape an r8 registration would ship."""
    import duckdb

    edges = graph.copurchase_edges(io.load_table(spark, sf_dir, "lineitem"))
    got = {
        (r.p_a, r.p_b): r.ra_scaled
        for r in graph.ra_link_prediction(edges, scale=_SCALE).collect()
    }
    pairs = {(r.p1, r.p2) for r in edges.select("p1", "p2").collect()}
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want: dict = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if b in adj[a]:
                continue
            common = adj[a] & adj[b]
            if common:
                want[(a, b)] = sum(_SCALE // len(adj[c]) for c in common)
    assert got == want and len(got) > 0

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    oracle = {
        (r[0], r[1]): r[2]
        for r in con.sql(RA_ORACLE_SHAPE.format(scale=_SCALE)).fetchall()
    }
    assert got == oracle


BM25_ORACLE_SHAPE = """
WITH tok AS (
    SELECT doc_id, len(string_split(text, ' ')) AS dl,
           UNNEST(string_split(text, ' ')) AS term
    FROM documents
),
tf AS (
    SELECT doc_id, term, MAX(dl) AS dl, COUNT(*) AS tf
    FROM tok GROUP BY doc_id, term
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
st AS (
    SELECT COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avgdl
    FROM documents
),
q AS (SELECT term, df FROM df ORDER BY df DESC, term LIMIT 5),
scored AS (
    SELECT tf.doc_id,
           SUM(((st.n_docs - q.df + 0.5) / (q.df + 0.5))
               * ((CAST(tf.tf AS DOUBLE) * 2.2)
                  / (CAST(tf.tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(tf.dl AS DOUBLE) / st.avgdl))))
              ) AS raw
    FROM tf JOIN q USING (term) CROSS JOIN st
    GROUP BY tf.doc_id
)
SELECT doc_id,
       (floor((raw) * 10000.0 + 0.5) / 10000.0) AS score,
       CAST(row_number() OVER (
            ORDER BY (floor((raw) * 10000.0 + 0.5) / 10000.0) DESC, doc_id
       ) AS BIGINT) AS rnk
FROM scored
QUALIFY rnk <= 20
"""


def test_bm25_saturation_and_length_norm(spark):
    """The two effects BM25 adds over tf/dl scoring: (a) tf SATURATION —
    doubling an already-high tf must add less than doubling a low tf;
    (b) LENGTH normalization — the same tf in a longer doc scores less."""
    from kinesis_stream_video_project_spark.operators import retrieval

    rows = [
        (1, "t x"),          # tf=1, dl=2
        (2, "t t t t x"),    # tf=4: saturated, not ~4x doc 1
        (3, "t x x x x x x x x x"),  # tf=1 in a 10-token doc
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.score
        for r in retrieval.bm25_topk(d, k=10, n_query_terms=1).collect()
    }
    # all three docs contain the top-df term 'x'... the query set is the
    # single highest-df term; 'x' appears in all 3 docs (df=3), 't' in 3
    # too -> tiebreak by term name takes 't'. Both have df=3; 't' < 'x'.
    assert set(got) == {1, 2, 3}
    # saturation: doc2's tf=4 must score < 4x doc1's tf=1 contribution
    assert got[2] < 4 * got[1]
    assert got[2] > got[1]  # but more tf still scores higher
    # length norm: same tf=1, dl=10 vs dl=2 -> lower score
    assert got[3] < got[1]


def test_bm25_oracle_shape_matches_at_all_sfs(spark):
    """The exact DuckDB twin an r8 registration would ship, rendered-value
    compared at every fixture SF (the registration gate, pre-run)."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import retrieval

    for sf_dir in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        d = io.load_table(spark, sf_dir, "documents")
        got = (
            retrieval.bm25_topk(d, k=20)
            .orderBy("rnk")
            .toPandas()
            .astype(str)
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        want = (
            con.sql(BM25_ORACLE_SHAPE + " ORDER BY rnk")
            .df()
            .astype(str)
            .reset_index(drop=True)
        )
        assert list(got.columns) == list(want.columns), sf_dir
        assert got.equals(want) and len(got) == 20, sf_dir


BPE_ORACLE_SHAPE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bgs AS (
  SELECT t[i] AS prev, t[i + 1] AS cur
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
),
c AS (SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM bgs GROUP BY 1, 2)
SELECT prev, cur, n_pairs,
       CAST(row_number() OVER (ORDER BY n_pairs DESC, prev, cur) AS BIGINT) AS rnk
FROM c
QUALIFY rnk <= 20
"""


def test_bpe_merge_topk_handchecked_and_oracle(spark, sf_dir):
    """One BPE merge step's candidate ranking: most frequent adjacent pair
    first, (prev, cur) tiebreak; DuckDB twin validated on the fixture."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import lm

    rows = [(1, "a b a b c"), (2, "a b x")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.prev, r.cur, r.n_pairs, r.rnk)
        for r in lm.bpe_merge_topk(d, k=3).orderBy("rnk").collect()
    ]
    # pairs: (a,b)x3, (b,a)x1, (b,c)x1, (b,x)x1 -> top3 with tiebreak
    assert got == [("a", "b", 3, 1), ("b", "a", 1, 2), ("b", "c", 1, 3)]

    fx = io.load_table(spark, sf_dir, "documents")
    got_fx = (
        lm.bpe_merge_topk(fx, k=20)
        .orderBy("rnk")
        .toPandas()
        .astype(str)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.sql(BPE_ORACLE_SHAPE + " ORDER BY rnk")
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got_fx.columns) == list(want.columns)
    assert got_fx.equals(want) and len(got_fx) == 20


AUDIO_ORACLE_SHAPE = """
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
framed AS (SELECT doc_id, (j - 1) // {fs} AS frame_no, s FROM signed),
agg AS (
  SELECT doc_id, frame_no, COUNT(*) AS cnt,
         CAST(SUM(s * s) AS BIGINT) AS energy_ssq,
         CAST(MAX(ABS(s)) AS BIGINT) AS peak
  FROM framed GROUP BY 1, 2
)
SELECT doc_id AS media_id, CAST(frame_no AS BIGINT) AS frame_no,
       CAST({fs} AS BIGINT) AS n_samples, energy_ssq, peak
FROM agg WHERE cnt = {fs}
"""


def test_audio_energy_frames_handchecked(spark):
    """Exact PCM16-LE reassembly: a crafted byte payload with known
    samples (incl. a negative one), a trailing odd byte, and a partial
    trailing frame — both dropped per the stated contract."""
    import struct

    from kinesis_stream_video_project_spark.operators import multimodal

    samples = [0, 1000, -1000, 32767, -32768, 7, 8, 9]  # 2 frames of 4
    payload = b"".join(struct.pack("<h", s) for s in samples)
    payload += struct.pack("<h", 42) + b"\x05"  # partial frame + odd byte
    m = spark.createDataFrame(
        [(1, "audio", payload, (0, 0, "x"))],
        "media_id long, media_type string, payload binary, "
        "meta struct<width:int,height:int,origin:string>",
    )
    got = {
        (r.media_id, r.frame_no): (r.n_samples, r.energy_ssq, r.peak)
        for r in multimodal.audio_energy_frames(m, frame_samples=4).collect()
    }
    f0 = sum(s * s for s in samples[:4])
    f1 = sum(s * s for s in samples[4:8])
    assert got == {
        (1, 0): (4, f0, 32767),
        (1, 1): (4, f1, 32768),
    }


def test_audio_energy_frames_oracle_shape_matches(spark, sf_dir):
    """media_manifest payloads are utf-8 text; on the ASCII fixture the
    DuckDB oracle replays the exact int16 reassembly from code points —
    the r8 registration's hash gate, pre-validated."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import multimodal

    d = io.load_table(spark, sf_dir, "documents")
    m = multimodal.media_manifest(d)
    got = (
        multimodal.audio_energy_frames(m, frame_samples=64)
        .orderBy("media_id", "frame_no")
        .toPandas()
        .astype(str)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.sql(AUDIO_ORACLE_SHAPE.format(fs=64) + " ORDER BY media_id, frame_no")
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0
