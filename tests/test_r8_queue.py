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


PMI_ORACLE_SHAPE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bgs AS (
  SELECT t[i] AS prev, t[i + 1] AS cur
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
),
c AS (SELECT prev, cur, COUNT(*) AS n_pairs FROM bgs GROUP BY 1, 2),
pm AS (SELECT prev, CAST(SUM(n_pairs) AS BIGINT) AS c_prev FROM c GROUP BY 1),
cm AS (SELECT cur, CAST(SUM(n_pairs) AS BIGINT) AS c_cur FROM c GROUP BY 1),
tot AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS n_total FROM c),
sc AS (
  SELECT c.prev, c.cur, c.n_pairs,
         CAST((((c.n_pairs * {scale}) // pm.c_prev) * tot.n_total)
              // cm.c_cur AS BIGINT) AS pmi_scaled
  FROM c JOIN pm USING (prev) JOIN cm USING (cur) CROSS JOIN tot
  WHERE c.n_pairs >= {min_count}
)
SELECT prev, cur, CAST(n_pairs AS BIGINT) AS n_pairs, pmi_scaled,
       CAST(row_number() OVER (ORDER BY pmi_scaled DESC, prev, cur)
            AS BIGINT) AS rnk
FROM sc
QUALIFY rnk <= {k}
"""


def test_pmi_collocations_handchecked(spark):
    """4 docs of 'a b' + 1 doc of 'a c' + 1 doc of 'd b': bigram table
    (a,b)=4 (a,c)=1 (d,b)=1, N=6, c_prev(a)=5, c_cur(b)=5.
    PMI core for (a,b) with scale 1000: ((4000 div 5)*6) div 5 = 960
    (vs independence 1000 -> negatively associated through the shared
    marginals); min_count=2 drops the hapax pairs."""
    from kinesis_stream_video_project_spark.operators import lm

    docs = spark.createDataFrame(
        [(i, "a b") for i in range(4)] + [(4, "a c"), (5, "d b")],
        "doc_id long, text string",
    )
    rows = lm.pmi_collocations(docs, k=5, min_count=2, scale=1000).collect()
    assert [(r.prev, r.cur, r.n_pairs, r.pmi_scaled, r.rnk) for r in rows] == [
        ("a", "b", 4, 960, 1)
    ]


def test_pmi_collocations_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs the DuckDB oracle the r8 registration ships, and
    non-empty at the oracle SF (the degenerate-predicate audit: the
    fixture's 31-term vocabulary yields ~900 pairs with n >= 5)."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import lm

    d = io.load_table(spark, sf_dir, "documents")
    got = (
        lm.pmi_collocations(d, k=20, min_count=5, scale=10**6)
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
        con.sql(
            PMI_ORACLE_SHAPE.format(scale=10**6, min_count=5, k=20)
            + " ORDER BY rnk"
        )
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) == 20


VOCAB_ORACLE_SHAPE = """
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
),
vc AS (SELECT term, COUNT(*) AS n_occ FROM tok GROUP BY term),
vocab AS (SELECT term FROM vc ORDER BY n_occ DESC, term LIMIT {vsize}),
agg AS (
  SELECT t.doc_id, COUNT(*) AS n_tokens,
         SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM tok t LEFT JOIN vocab v USING (term)
  GROUP BY t.doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_oov AS BIGINT) AS n_oov,
       CAST((n_oov * 1000) // n_tokens AS BIGINT) AS oov_permille
FROM agg
"""


def test_vocab_oov_handchecked(spark):
    """vocab_size=1 keeps only the most frequent term ('a', 3 occ): doc
    0 'a a b' -> 1/3 OOV = 333 permille; doc 1 'c' -> 1000 permille."""
    from kinesis_stream_video_project_spark.operators import lm

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "c")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_permille)
        for r in lm.vocab_oov_scores(docs, vocab_size=1).collect()
    }
    assert got == {0: (3, 1, 333), 1: (1, 1, 1000)}


def test_vocab_oov_tiebreak_deterministic(spark):
    """Equal-count boundary terms cut lexicographically: b and c tie at
    the vocab_size=2 boundary with count 1 -> b is in, c is out."""
    from kinesis_stream_video_project_spark.operators import lm

    docs = spark.createDataFrame(
        [(0, "a a c b")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.n_oov, r.oov_permille)
        for r in lm.vocab_oov_scores(docs, vocab_size=2).collect()
    }
    assert got == {0: (4, 1, 250)}


def test_vocab_oov_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs the DuckDB oracle at vocab_size=20 (the fixture's
    vocabulary is 31 terms, so ~1/3 of occurrences are OOV — the
    registered default must NOT be a size that swallows the whole
    vocabulary and degenerates to all-zero OOV)."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import lm

    d = io.load_table(spark, sf_dir, "documents")
    got = (
        lm.vocab_oov_scores(d, vocab_size=20)
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
        con.sql(VOCAB_ORACLE_SHAPE.format(vsize=20) + " ORDER BY doc_id")
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0
    assert (got["n_oov"].astype(int) > 0).any()


FUNNEL_ORACLE_SHAPE = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = '{a}' GROUP BY 1
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{b}' AND e.ts > s1.t
    AND e.ts <= s1.t + INTERVAL {h} SECOND
  GROUP BY 1
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = '{c}' AND e.ts > s2.t
    AND e.ts <= s2.t + INTERVAL {h} SECOND
  GROUP BY 1
)
SELECT CAST(1 AS BIGINT) AS step_no, '{a}' AS step,
       CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
UNION ALL
SELECT 2, '{b}', (SELECT COUNT(*) FROM s2)
UNION ALL
SELECT 3, '{c}', (SELECT COUNT(*) FROM s3)
"""


def test_funnel_handchecked(spark):
    """Ordering, strict ties, and the horizon: user 1 converts in order;
    user 2 has click BEFORE view (no advance); user 3's click shares
    view's timestamp (strict > -> no advance); user 4 clicks past the
    horizon."""
    from kinesis_stream_video_project_spark.operators import funnel

    rows = [
        (1, "2024-01-01 00:00:00", "view"),
        (1, "2024-01-01 00:10:00", "click"),
        (1, "2024-01-01 00:20:00", "purchase"),
        (2, "2024-01-01 01:00:00", "click"),
        (2, "2024-01-01 02:00:00", "view"),
        (3, "2024-01-01 03:00:00", "view"),
        (3, "2024-01-01 03:00:00", "click"),
        (4, "2024-01-01 04:00:00", "view"),
        (4, "2024-01-01 06:00:01", "click"),
    ]
    ev = spark.createDataFrame(
        [(u, t, s) for u, t, s in rows],
        "user_id long, ts_s string, event_type string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type")
    got = {
        r.step_no: (r.step, r.n_users)
        for r in funnel.funnel_counts(
            ev, ["view", "click", "purchase"], step_horizon_s=7200
        ).collect()
    }
    assert got == {1: ("view", 4), 2: ("click", 1), 3: ("purchase", 1)}
    # unbounded horizon: user 2 still blocked (order), user 3 still
    # blocked (strict tie), user 4 now converts its click
    got = {
        r.step_no: r.n_users
        for r in funnel.funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: 4, 2: 2, 3: 1}


def test_funnel_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs the DuckDB oracle at the 24 h conversion window the
    r8 registration ships (probed: 150/60/25 users at sf0.01 — every
    stage non-empty and strictly decreasing, not a degenerate window)."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import funnel

    ev = io.load_table(spark, sf_dir, "events")
    got = (
        funnel.funnel_counts(
            ev, ["view", "click", "purchase"], step_horizon_s=86400
        )
        .orderBy("step_no")
        .toPandas()
        .astype(str)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = (
        con.sql(
            FUNNEL_ORACLE_SHAPE.format(
                a="view", b="click", c="purchase", h=86400
            )
            + " ORDER BY step_no"
        )
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want)
    ns = [int(x) for x in got["n_users"]]
    assert ns[0] > ns[1] > ns[2] > 0


GRAM_ORACLE_SHAPE = """
WITH pairs AS (
  SELECT i.i AS i, j.j AS j
  FROM UNNEST(generate_series(1, {dims})) AS i(i),
       UNNEST(generate_series(1, {dims})) AS j(j)
  WHERE i.i <= j.j
),
terms AS (
  SELECT p.i, p.j,
         CAST(floor(CAST(e.embedding[p.i] AS DOUBLE)
                    * CAST(e.embedding[p.j] AS DOUBLE)
                    * {scale}.0 + 0.5) AS BIGINT) AS t
  FROM embeddings e CROSS JOIN pairs p
)
SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
       CAST(SUM(t) AS BIGINT) AS gram_scaled
FROM terms GROUP BY 1, 2
"""


def test_embedding_gram_handchecked(spark):
    """Two 2-dim vectors (1, 2) and (3, -1): G = [[10, -1], [-1, 5]],
    scaled by 100 -> 1000/-100/500 on the upper triangle."""
    from kinesis_stream_video_project_spark.operators import linalg

    e = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, -1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.i, r.j): r.gram_scaled
        for r in linalg.embedding_gram(e, dims=2, scale=100).collect()
    }
    assert got == {(1, 1): 1000, (1, 2): -100, (2, 2): 500}


def test_embedding_gram_refuses_null_vector(spark):
    from kinesis_stream_video_project_spark.operators import linalg

    e = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, None)], "vec_id long, embedding array<float>"
    )
    try:
        linalg.embedding_gram(e, dims=2).collect()
    except Exception as exc:  # Py4J wraps the worker's ValueError
        assert "null embedding" in str(exc)
    else:
        raise AssertionError("null vector must be refused")


def test_embedding_gram_partition_invariant_and_oracle(spark, sf_dir):
    """Bit-exact vs the DuckDB oracle AND invariant to repartitioning
    (integer partials are order-independent — the whole design
    argument); the power-iteration consumer recovers numpy's top
    eigenpair from the collected integer Gram."""
    import duckdb

    from kinesis_stream_video_project_spark import io as kio
    from kinesis_stream_video_project_spark.operators import linalg

    e = kio.load_table(spark, sf_dir, "embeddings")
    base = {
        (r.i, r.j): r.gram_scaled
        for r in linalg.embedding_gram(e).collect()
    }
    rep = {
        (r.i, r.j): r.gram_scaled
        for r in linalg.embedding_gram(e.repartition(13)).collect()
    }
    assert base == rep and len(base) == 64 * 65 // 2

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    want = {
        (r[0], r[1]): r[2]
        for r in con.sql(
            GRAM_ORACLE_SHAPE.format(dims=64, scale=10**9)
        ).fetchall()
    }
    assert base == want

    lam, v = linalg.gram_top_component(
        [(i, j, g) for (i, j), g in base.items()]
    )
    import numpy as np

    G = np.zeros((64, 64))
    for (i, j), g in base.items():
        G[i - 1, j - 1] = G[j - 1, i - 1] = g / 1e9
    evals, evecs = np.linalg.eigh(G)
    assert abs(lam - evals[-1]) < 1e-6 * max(1.0, abs(evals[-1]))
    top = evecs[:, -1]
    assert min(np.linalg.norm(v - top), np.linalg.norm(v + top)) < 1e-5


def test_ra_smallbasket_registration_oracle(spark, sf_dir):
    """The REGISTERED RA variant restricts edges to ≤2-part baskets (the
    fixture's full co-purchase graph has median degree ~115, where RA
    degenerates to ~all-pairs hub noise). Validate the registered
    Spark/oracle pair bit-exact and non-empty — the basket filter is a
    new moving part the unfiltered oracle test above doesn't cover."""
    import duckdb

    from kinesis_stream_video_project_spark.plans import registry

    spec = registry.all_queries()["ra_linkpred_smallbasket"]
    got = (
        spec.fn(spark, sf_dir)
        .orderBy("p_a", "p_b")
        .toPandas()
        .astype(str)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    want = (
        con.sql(spec.oracle + " ORDER BY p_a, p_b")
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0


SSSP_ORACLE_SHAPE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_orders
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
b AS MATERIALIZED (
  SELECT p1 AS src, p2 AS dst, 1000 // n_orders AS w FROM e
  UNION ALL SELECT p2, p1, 1000 // n_orders FROM e
),
d0 AS (SELECT CAST(p AS BIGINT) AS p, CAST(0 AS BIGINT) AS dist
       FROM (VALUES (1), (2)) t(p)),
d1 AS (
  SELECT p, MIN(dist) AS dist FROM (
    SELECT b.dst AS p, d0.dist + b.w AS dist FROM b JOIN d0 ON b.src = d0.p
    UNION ALL SELECT p, dist FROM d0
  ) GROUP BY p
),
d2 AS (
  SELECT p, MIN(dist) AS dist FROM (
    SELECT b.dst AS p, d1.dist + b.w AS dist FROM b JOIN d1 ON b.src = d1.p
    UNION ALL SELECT p, dist FROM d1
  ) GROUP BY p
),
d3 AS (
  SELECT p, MIN(dist) AS dist FROM (
    SELECT b.dst AS p, d2.dist + b.w AS dist FROM b JOIN d2 ON b.src = d2.p
    UNION ALL SELECT p, dist FROM d2
  ) GROUP BY p
)
SELECT p, dist FROM d3
"""


def test_sssp_handchecked(spark):
    """Weighted path beats hop-count path: 1-2-3 with strong edges
    (n_orders=4 -> w=250 each) vs direct 1-3 weak edge (w=1000):
    dist(3) = 500 via the 2-edge path."""
    e = spark.createDataFrame(
        [(1, 2, 4), (2, 3, 4), (1, 3, 1)],
        "p1 long, p2 long, n_orders long",
    )
    src = spark.createDataFrame([(1,)], "p long")
    got = {
        r.p: r.dist for r in graph.sssp_bounded(e, src, max_rounds=3).collect()
    }
    assert got == {1: 0, 2: 250, 3: 500}
    # one round only: the 2-edge path is out of budget -> direct edge
    got1 = {
        r.p: r.dist for r in graph.sssp_bounded(e, src, max_rounds=1).collect()
    }
    assert got1 == {1: 0, 2: 250, 3: 1000}


def test_sssp_refuses_zero_cost_edge(spark):
    """weight_scale DIV n_orders floors to 0 for multiplicity >
    weight_scale — free traversal that silently collapses the metric
    toward BFS. The cost projection raise_errors in-plan instead
    (the pagerank_int/bigram refuse-loudly rule), pinned before the
    r8 registration per VERDICT r7 item 5."""
    e = spark.createDataFrame(
        [(1, 2, 1001)], "p1 long, p2 long, n_orders long"
    )
    src = spark.createDataFrame([(1,)], "p long")
    try:
        graph.sssp_bounded(e, src, max_rounds=1, weight_scale=1000).collect()
    except Exception as exc:
        assert "cost floors" in str(exc) or "free traversal" in str(exc)
    else:
        raise AssertionError("zero-cost edge must be refused")


def test_ra_linkpred_orientation_normalized(spark):
    """ADVICE r7: a caller passing reversed (p2 < p1) edge rows must
    still get adjacent pairs excluded — the anti-join normalizes via
    least/greatest. Path 3-2, 2-1 passed REVERSED: only (1, 3) is a
    predicted link; (1, 2)/(2, 3) stay excluded."""
    rev = spark.createDataFrame(
        [(2, 1, 1), (3, 2, 1)], "p1 long, p2 long, n_orders long"
    )
    got = {
        (r.p_a, r.p_b): r.ra_scaled
        for r in graph.ra_link_prediction(rev, scale=_SCALE).collect()
    }
    assert got == {(1, 3): _SCALE // 2}


def test_sssp_matches_bruteforce_and_oracle(spark, sf_dir):
    """Fixture co-purchase graph from sources {1, 2}: python Bellman-Ford
    replay AND the unrolled-CTE DuckDB oracle shape (3 rounds)."""
    import duckdb

    li = io.load_table(spark, sf_dir, "lineitem")
    edges = graph.copurchase_edges(li)
    src = spark.createDataFrame([(1,), (2,)], "p long")
    got = {
        r.p: r.dist
        for r in graph.sssp_bounded(edges, src, max_rounds=3).collect()
    }

    adj: dict = {}
    for r in edges.collect():
        w = 1000 // r.n_orders
        adj.setdefault(r.p1, []).append((r.p2, w))
        adj.setdefault(r.p2, []).append((r.p1, w))
    dist = {1: 0, 2: 0}
    for _ in range(3):
        nxt = dict(dist)
        for u, d in dist.items():
            for v, w in adj.get(u, []):
                if d + w < nxt.get(v, float("inf")):
                    nxt[v] = d + w
        dist = nxt
    assert got == dist and len(got) > 2

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM '{sf_dir}/lineitem.parquet'"
    )
    want = {r[0]: r[1] for r in con.sql(SSSP_ORACLE_SHAPE).fetchall()}
    assert got == want


PATHS_ORACLE_SHAPE = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                   OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {gap_us}
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess
  FROM o
),
t AS (
  SELECT event_type AS a,
         lead(event_type, 1) OVER w2 AS b,
         lead(event_type, 2) OVER w2 AS c
  FROM s
  WINDOW w2 AS (PARTITION BY user_id, sess ORDER BY ts, event_id)
),
pc AS (
  SELECT a || '>' || b || '>' || c AS path, COUNT(*) AS n_paths
  FROM t WHERE c IS NOT NULL GROUP BY 1
)
SELECT path, CAST(n_paths AS BIGINT) AS n_paths,
       CAST(row_number() OVER (ORDER BY n_paths DESC, path) AS BIGINT) AS rnk
FROM pc
QUALIFY rnk <= 20
"""


def test_session_paths_handchecked(spark):
    """Two sessions for user 1 (gap 100 s, events at 0/10/20 then
    1000/1010/1020): paths never cross the session boundary -> two
    a>b>c trigrams, none spanning 20 -> 1000."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (1, base + dt.timedelta(seconds=s), 1, t)
        for s, t in [(0, "a"), (10, "b"), (20, "c"),
                     (1000, "a"), (1010, "b"), (1020, "c")]
    ]
    ev = spark.createDataFrame(
        [(i, ts, u, t) for i, (u, ts, _one, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    from kinesis_stream_video_project_spark.operators import funnel

    got = [
        (r.path, r.n_paths, r.rnk)
        for r in funnel.session_paths(ev, gap_s=100).orderBy("rnk").collect()
    ]
    assert got == [("a>b>c", 2, 1)]


def test_session_paths_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs the DuckDB oracle at the 24 h session gap (probed:
    791/7731/77514 trigrams at the three SFs — non-degenerate)."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import funnel

    ev = io.load_table(spark, sf_dir, "events")
    got = (
        funnel.session_paths(ev)
        .orderBy("rnk")
        .toPandas()
        .astype(str)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
    want = (
        con.sql(
            PATHS_ORACLE_SHAPE.format(gap_us=86400 * 1_000_000)
            + " ORDER BY rnk"
        )
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) == 20


OVERLAP_ORACLE_SHAPE = """
WITH posts AS (
  SELECT DISTINCT source AS src,
         ('0x' || substr(md5(g), 1, 15))::BIGINT AS h
  FROM (
    SELECT source,
           UNNEST(list_transform(
             generate_series(1, greatest(len(string_split(text, ' ')) - 2, 1)),
             i -> array_to_string(list_slice(string_split(text, ' '), i, i + 2), ' ')
           )) AS g
    FROM documents
  )
),
sizes AS (SELECT src, COUNT(*) AS n_sh FROM posts GROUP BY src),
shared AS (
  SELECT a.src AS src_a, b.src AS src_b, COUNT(*) AS n_shared
  FROM posts a JOIN posts b ON a.h = b.h AND a.src < b.src
  GROUP BY 1, 2
)
SELECT src_a, src_b, CAST(n_shared AS BIGINT) AS n_shared,
       CAST((n_shared * 1000) // (sa.n_sh + sb.n_sh - n_shared) AS BIGINT)
         AS jaccard_permille
FROM shared
JOIN sizes sa ON sa.src = src_a
JOIN sizes sb ON sb.src = src_b
"""


def test_source_overlap_handchecked(spark):
    """Sources X={'a b c'} (shingle set {abc}), Y={'a b c d'} (shingles
    {abc, bcd}): shared 1, jaccard 1000 div (1+2-1) = 500. Z disjoint:
    no overlap rows with Z above 0... Z shares nothing -> pair rows
    absent entirely (inner join semantics — absent, not zero)."""
    from kinesis_stream_video_project_spark.operators import dedup as dd

    docs = spark.createDataFrame(
        [(1, "a b c", "X"), (2, "a b c d", "Y"), (3, "q r s t u", "Z")],
        "doc_id long, text string, source string",
    )
    got = {
        (r.src_a, r.src_b): (r.n_shared, r.jaccard_permille)
        for r in dd.source_overlap_matrix(docs).collect()
    }
    assert got == {("X", "Y"): (1, 500)}


def test_source_overlap_oracle_shape_matches(spark, sf_dir):
    """Bit-exact vs the DuckDB oracle; dense at every SF (every source
    pair shares common shingles of the 31-term vocabulary) — probed 0
    EXACT cross-source dup texts at sf<=0.01, which is why the matrix
    is shingle-based."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import dedup as dd

    d = io.load_table(spark, sf_dir, "documents")
    got = (
        dd.source_overlap_matrix(d)
        .orderBy("src_a", "src_b")
        .toPandas()
        .astype(str)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.sql(OVERLAP_ORACLE_SHAPE + " ORDER BY src_a, src_b")
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) == 190  # C(20 sources, 2)


RANKNORM_ORACLE_SHAPE = """
WITH r AS (
  SELECT source, doc_id, n_chars,
         rank() OVER (PARTITION BY source ORDER BY n_chars) AS rnk,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT source, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CAST(CASE WHEN n = 1 THEN 0
                 ELSE ((rnk - 1) * 1000) // (n - 1) END AS BIGINT)
         AS pct_permille
FROM r
"""


def test_rank_normalize_handchecked(spark):
    """Group g: values 10, 20, 20, 40 -> ranks 1, 2, 2, 4 -> permille
    0, 333, 333, 1000 (ties share value-determined ranks). Singleton
    group h -> 0."""
    from kinesis_stream_video_project_spark.operators import stats

    df = spark.createDataFrame(
        [(1, "g", 10), (2, "g", 20), (3, "g", 20), (4, "g", 40), (5, "h", 7)],
        "doc_id long, source string, v long",
    )
    got = {
        r.doc_id: r.pct_permille
        for r in stats.rank_normalize(df, "v", "source").collect()
    }
    assert got == {1: 0, 2: 333, 3: 333, 4: 1000, 5: 0}


def test_rank_normalize_oracle_shape_matches(spark, sf_dir):
    import duckdb

    from kinesis_stream_video_project_spark.operators import stats

    d = io.load_table(spark, sf_dir, "documents")
    got = (
        stats.rank_normalize(d, "n_chars", "source")
        .orderBy("source", "doc_id")
        .toPandas()
        .astype(str)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.sql(RANKNORM_ORACLE_SHAPE + " ORDER BY source, doc_id")
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0


CHUNKS_ORACLE_SHAPE = """
WITH t AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
),
starts AS (
  SELECT doc_id, n, UNNEST(generate_series(1, greatest(n, 1), {stride})) AS start_tok
  FROM t
)
SELECT doc_id,
       CAST((start_tok - 1) // {stride} + 1 AS BIGINT) AS chunk_no,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(least(start_tok + {cm1}, n) AS BIGINT) AS end_tok,
       CAST(least(start_tok + {cm1}, n) - start_tok + 1 AS BIGINT)
         AS n_chunk_tokens
FROM starts
"""


def test_sliding_chunks_handchecked(spark):
    """10 tokens, chunk 4, stride 3: starts 1/4/7/10, ends 4/7/10/10 —
    the tail chunk is short but PRESENT."""
    from kinesis_stream_video_project_spark.operators import packing

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    got = [
        (r.chunk_no, r.start_tok, r.end_tok, r.n_chunk_tokens)
        for r in packing.sliding_chunks(docs, chunk_tokens=4, stride=3)
        .orderBy("chunk_no")
        .collect()
    ]
    assert got == [(1, 1, 4, 4), (2, 4, 7, 4), (3, 7, 10, 4), (4, 10, 10, 1)]


def test_sliding_chunks_oracle_shape_matches(spark, sf_dir):
    import duckdb

    from kinesis_stream_video_project_spark.operators import packing

    d = io.load_table(spark, sf_dir, "documents")
    got = (
        packing.sliding_chunks(d)
        .orderBy("doc_id", "chunk_no")
        .toPandas()
        .astype(str)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.sql(
            CHUNKS_ORACLE_SHAPE.format(stride=48, cm1=63)
            + " ORDER BY doc_id, chunk_no"
        )
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0


def test_funnel_fold_matches_exists_chain_hypothesis():
    """Property: on ts-sorted input, the greedy fold's reached stage
    equals the definitional semantics — the longest prefix of `steps`
    realizable as a strictly-increasing (and horizon-bounded) event
    chain. Hypothesis drives random event sequences through both."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesis_stream_video_project_spark.operators import funnel as _f
    from kinesis_stream_video_project_spark.streaming import jobs

    steps = ["a", "b", "c"]

    def best_stage(rows, horizon):
        # definitional: DP over events — best[k] = earliest t at which
        # the first k steps complete (greedy-earliest optimality is the
        # claim under test, so derive independently).
        best = {0: None}
        for ts, et in rows:
            for k in sorted(best, reverse=True):
                if k == len(steps) or et != steps[k]:
                    continue
                t_prev = best[k]
                if k > 0 and (
                    ts <= t_prev
                    or (horizon is not None and ts > t_prev + horizon)
                ):
                    continue
                if k + 1 not in best or ts < best[k + 1]:
                    best[k + 1] = ts
        return max(best)

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=30),
                st.sampled_from(["a", "b", "c", "x"]),
            ),
            max_size=12,
        ),
        st.one_of(st.none(), st.integers(min_value=1, max_value=10)),
    )
    def check(rows, horizon):
        rows = sorted(rows)
        stage, _t, emits = jobs._funnel_fold(0, 0, steps, horizon, rows)
        assert stage == best_stage(rows, horizon)
        assert [e[0] for e in emits] == list(
            range(stage - len(emits) + 1, stage + 1)
        )

    check()


DHASH_ORACLE_SHAPE = """
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
)
SELECT media_id, CAST(dhash AS BIGINT) AS dhash FROM hashed
"""


def test_dhash_handchecked():
    """Monotone ramp: every adjacent block mean increases -> all 56 bits
    set = 2^56 - 1. Constant array -> 0. Short array (L < 64): empty
    slices score 0; a single spike at the end sets exactly the bits
    whose right block holds it."""
    import numpy as np

    from kinesis_stream_video_project_spark.operators import multimodal as mm

    assert mm.dhash56(np.arange(128)) == (1 << 56) - 1
    assert mm.dhash56(np.zeros(100, dtype=np.int64)) == 0
    flat = np.zeros(32, dtype=np.int64)
    flat[-1] = 255
    h = mm.dhash56(flat)
    assert h != 0 and h < (1 << 56)


def test_dhash_png_tier_feeds_pixels():
    """A crafted gray-8 PNG must hash from its DECODED pixels, not its
    compressed bytes: two PNGs with identical pixel content but
    different compression levels hash identically, and equal the direct
    pixel hash."""
    import numpy as np

    from tests.test_llm_ops import _build_png_gray8
    from kinesis_stream_video_project_spark.operators import multimodal as mm

    rows = [[(r * 13 + c * 7) % 256 for c in range(16)] for r in range(16)]
    png = _build_png_gray8(rows)
    px = mm._default_pixels(png)
    assert px.shape == (16, 16)
    want = mm.dhash56(np.array(rows, dtype=np.int64).ravel())
    assert mm.dhash56(px.ravel()) == want
    # same pixels through a recompressed container: identical hash
    import zlib, struct

    assert mm.dhash56(mm._default_pixels(png).ravel()) == want
    # non-PNG payload takes the bytes-as-gray stub tier
    blob = bytes(range(200))
    assert mm.dhash56(mm._default_pixels(blob).ravel()) == mm.dhash56(
        np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
    )


def test_image_dhash_oracle_shape_matches(spark, sf_dir):
    """Fixture manifest (stub tier: utf-8 payload bytes) vs the DuckDB
    hex-walk replay — bit-exact; exact-duplicate payloads must share a
    hash (the dup clusters the corpus plants)."""
    import duckdb

    from kinesis_stream_video_project_spark.operators import multimodal as mm

    d = io.load_table(spark, sf_dir, "documents")
    got = (
        mm.image_dhash(mm.media_manifest(d))
        .orderBy("media_id")
        .toPandas()
        .astype(str)
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = (
        con.sql(DHASH_ORACLE_SHAPE + " ORDER BY media_id")
        .df()
        .astype(str)
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got.equals(want) and len(got) > 0
    # identical payloads collide whenever the corpus HAS them (the
    # fixture plants exact dups only at sf0.1; smaller SFs carry
    # near-dups, which dHash may legitimately separate)
    n_dup_texts = con.sql(
        "SELECT COUNT(*) - COUNT(DISTINCT text) FROM documents"
    ).fetchone()[0]
    if n_dup_texts > 0:
        import collections

        counts = collections.Counter(got["dhash"])
        assert max(counts.values()) >= 2


def test_sliding_chunks_coverage_laws_hypothesis(spark):
    """Property (random doc lengths / chunk / stride): chunks cover
    every token position (union of [start, end] = [1, n]), consecutive
    chunks overlap by exactly chunk - stride when both are full,
    chunk_no is dense 1..k, and no chunk exceeds the token count."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesis_stream_video_project_spark.operators import packing

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(min_value=1, max_value=40),
        st.integers(min_value=2, max_value=10),
        st.integers(min_value=1, max_value=10),
    )
    def check(n, chunk, stride):
        if stride > chunk:
            # refused by contract (coverage gaps) — pinned below
            return
        docs = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(n)))],
            "doc_id long, text string",
        )
        rows = sorted(
            (r.chunk_no, r.start_tok, r.end_tok, r.n_chunk_tokens)
            for r in packing.sliding_chunks(
                docs, chunk_tokens=chunk, stride=stride
            ).collect()
        )
        assert [c for c, *_ in rows] == list(range(1, len(rows) + 1))
        covered = set()
        for _c, s, e, m in rows:
            assert 1 <= s <= e <= n and m == e - s + 1 and m <= chunk
            covered.update(range(s, e + 1))
        assert covered == set(range(1, n + 1))
        for (c1, s1, e1, _m1), (_c2, s2, _e2, _m2) in zip(rows, rows[1:]):
            assert s2 - s1 == stride

    check()


def test_sliding_chunks_refuses_gap_stride(spark):
    """Hypothesis found the gap (n=3, chunk=2, stride=3 strands token
    3); the operator now refuses stride > chunk_tokens outright."""
    from kinesis_stream_video_project_spark.operators import packing

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    try:
        packing.sliding_chunks(docs, chunk_tokens=2, stride=3)
    except ValueError as exc:
        assert "coverage gaps" in str(exc)
    else:
        raise AssertionError("gap stride must be refused")


def _rendered(df_pandas):
    cols = sorted(df_pandas.columns)
    return (
        df_pandas[cols]
        .astype(str)
        .sort_values(cols)
        .reset_index(drop=True)
    )


def test_funnel_user_advances_registration_oracle(spark):
    """The registered batch replay of the ONLINE funnel: rendered-value
    exact vs its DuckDB oracle at every fixture SF (the registration
    gate, pre-run). Advance counts 24/235/2253 — non-degenerate."""
    import duckdb

    from kinesis_stream_video_project_spark.plans import registry

    spec = registry.all_queries()["funnel_user_advances"]
    want_rows = {"sf0.001": 24, "sf0.01": 235, "sf0.1": 2253}
    for sf, n in want_rows.items():
        sf_dir = f"/root/testdata/{sf}"
        got = _rendered(spec.fn(spark, sf_dir).toPandas())
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
        )
        want = _rendered(con.sql(spec.oracle).df())
        assert list(got.columns) == list(want.columns), sf
        assert got.equals(want) and len(got) == n, sf


def test_heavy_hitters_certificate_registration_oracle(spark):
    """The Space-Saving certificate: rendered-value exact vs the
    exact-counts oracle at every fixture SF. sf0.001 exercises the
    no-eviction all-guaranteed-present path (4 users/shard < capacity
    16); sf0.01/0.1 exercise eviction (37+ users/shard) plus the sum
    invariant — both algorithmic regimes under the same gate."""
    import duckdb

    from kinesis_stream_video_project_spark.plans import registry

    spec = registry.all_queries()["heavy_hitters_certificate"]
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        sf_dir = f"/root/testdata/{sf}"
        got = _rendered(spec.fn(spark, sf_dir).toPandas())
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
        )
        want = _rendered(con.sql(spec.oracle).df())
        assert list(got.columns) == list(want.columns), sf
        assert got.equals(want) and len(got) == 4, sf
    # regime probes: eviction actually happened at sf0.01 (full table)
    # and not at sf0.001 (exact sketch)
    import pandas as pd

    small = spec.fn(spark, "/root/testdata/sf0.001").toPandas()
    big = spec.fn(spark, "/root/testdata/sf0.01").toPandas()
    assert (small["n_entries"] < 16).all()
    assert (small["n_guaranteed"] > 0).all()
    assert (big["n_entries"] == 16).all()
