"""Round-4 scratch: prototype DuckDB oracles for the rows-only queries
(seq_pack_docs, watchdog_state_machine, multimodal_decoded, ivf_topk,
ann_recall_eval) before wiring them into the registry. Deleted before commit.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from oracle_utils import compare, duckdb_conn

from kinesis_stream_video_project_spark.session import get_spark
from kinesis_stream_video_project_spark.plans.registry import all_queries

SEQ_PACK_SQL = """
WITH RECURSIVE sized AS (
  SELECT source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 8 AS BIGINT) AS shard,
         doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source, shard ORDER BY doc_id) AS rn
  FROM sized
),
fold AS (
  SELECT source, shard, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_idx, n_tokens AS bin_fill
  FROM ranked WHERE rn = 1
  UNION ALL
  SELECT s.source, s.shard, s.doc_id, s.n_tokens, s.rn,
         CASE WHEN f.bin_fill + s.n_tokens > 512 THEN f.bin_idx + 1 ELSE f.bin_idx END,
         CASE WHEN f.bin_fill + s.n_tokens > 512 THEN s.n_tokens ELSE f.bin_fill + s.n_tokens END
  FROM fold f JOIN ranked s ON s.source = f.source AND s.shard = f.shard AND s.rn = f.rn + 1
)
SELECT source, shard, doc_id, n_tokens, bin_idx, bin_fill FROM fold
"""

WATCHDOG_SQL = """
WITH RECURSIVE probes AS (
  SELECT user_id AS device_id,
         epoch_us(ts) AS ts_us,
         (event_type <> 'error') AS ok,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
fold AS (
  SELECT device_id, CAST(0 AS BIGINT) AS rn,
         CAST(0 AS BIGINT) AS fail_cnt, CAST(0 AS BIGINT) AS esc,
         CAST(-1 AS BIGINT) AS last_us, CAST(NULL AS VARCHAR) AS action,
         CAST(NULL AS BIGINT) AS action_ts_us
  FROM (SELECT DISTINCT user_id AS device_id FROM events)
  UNION ALL
  SELECT p.device_id, p.rn,
         CASE
           WHEN f.last_us >= 0 AND p.ts_us < f.last_us + 300000000 THEN f.fail_cnt
           WHEN p.ok THEN 0
           WHEN f.fail_cnt + 1 >= 3 THEN 0
           ELSE f.fail_cnt + 1
         END AS fail_cnt,
         CASE
           WHEN f.last_us >= 0 AND p.ts_us < f.last_us + 300000000 THEN f.esc
           WHEN p.ok THEN 0
           WHEN f.fail_cnt + 1 >= 3 THEN f.esc + 1
           ELSE f.esc
         END AS esc,
         CASE
           WHEN f.last_us >= 0 AND p.ts_us < f.last_us + 300000000 THEN f.last_us
           WHEN NOT p.ok AND f.fail_cnt + 1 >= 3 THEN p.ts_us
           ELSE f.last_us
         END AS last_us,
         CASE
           WHEN f.last_us >= 0 AND p.ts_us < f.last_us + 300000000 THEN NULL
           WHEN NOT p.ok AND f.fail_cnt + 1 >= 3 THEN
             (['alert_email','restart_network_mgr','restart_gateway',
               'reconnect_wifi','usb_power_cycle','reboot'])[least(f.esc, 5) + 1]
           ELSE NULL
         END AS action,
         CASE
           WHEN f.last_us >= 0 AND p.ts_us < f.last_us + 300000000 THEN NULL
           WHEN NOT p.ok AND f.fail_cnt + 1 >= 3 THEN p.ts_us
           ELSE NULL
         END AS action_ts_us
  FROM fold f
  JOIN probes p ON p.device_id = f.device_id AND p.rn = f.rn + 1
)
SELECT device_id, action_ts_us, action
FROM fold WHERE action IS NOT NULL
"""

# multimodal_decoded: byte stats of the utf-8 payload. Hex-walk the blob.
_HEXVAL = "(strpos('0123456789abcdef', h[i]) - 1)"
MULTIMODAL_SQL = f"""
WITH bytes AS (
  SELECT doc_id, list_transform(
           generate_series(1, nbytes),
           j -> (strpos('0123456789abcdef', hx[2*j-1]) - 1) * 16
              + (strpos('0123456789abcdef', hx[2*j]) - 1)
         ) AS bs
  FROM (SELECT doc_id, string_split(lower(hex(encode(text))), '') AS hx,
               octet_length(encode(text)) AS nbytes
        FROM documents)
),
stats AS (
  SELECT doc_id, bs, len(bs) AS n,
         CAST(list_sum(bs) AS DOUBLE) / len(bs) AS mean_raw
  FROM bytes
),
hist AS (
  SELECT doc_id, b AS byte_val, COUNT(*) AS c
  FROM (SELECT doc_id, UNNEST(bs) AS b FROM bytes)
  GROUP BY doc_id, b
),
ent AS (
  SELECT h.doc_id,
         -SUM((CAST(c AS DOUBLE) / s.n) * log2(CAST(c AS DOUBLE) / s.n)) AS entropy_raw
  FROM hist h JOIN stats s USING (doc_id)
  GROUP BY h.doc_id
)
SELECT s.doc_id AS media_id,
       ['image','audio','video'][(s.doc_id % 3) + 1] AS media_type,
       CAST(s.n AS BIGINT) AS payload_bytes,
       CAST(s.doc_id % 640 + 64 AS INTEGER) AS width,
       CAST(s.doc_id % 480 + 48 AS INTEGER) AS height,
       (floor(s.mean_raw * 10000.0 + 0.5) / 10000.0) AS byte_mean,
       (floor(e.entropy_raw * 10000.0 + 0.5) / 10000.0) AS byte_entropy
FROM stats s JOIN ent e USING (doc_id)
"""


def _dd_cosine(a: str, b: str) -> str:
    def sq(v: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, len({v})), "
            f"i -> CAST({v}[i] AS DOUBLE) * CAST({v}[i] AS DOUBLE)))"
        )

    dot = (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )
    return f"({dot} / (sqrt({sq(a)}) * sqrt({sq(b)})))"


IVF_CORE = f"""
cents AS (
  SELECT label, list(mean_c ORDER BY dim) AS centroid
  FROM (
    SELECT label, dim, AVG(c) AS mean_c
    FROM (
      SELECT label, UNNEST(generate_series(1, len(embedding))) AS dim,
             UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS c
      FROM embeddings
    )
    GROUP BY label, dim
  )
  GROUP BY label
),
q AS (
  SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 5
),
cell_scores AS (
  SELECT q.query_id, q.qvec, c.label,
         {_dd_cosine('q.qvec', 'c.centroid')} AS cell_cos,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY {_dd_cosine('q.qvec', 'c.centroid')} DESC, c.label
         ) AS cr
  FROM q CROSS JOIN cents c
),
probed AS (SELECT query_id, qvec, label FROM cell_scores WHERE cr <= 2),
scored AS (
  SELECT p.query_id, e.vec_id,
         (floor(({_dd_cosine('p.qvec', 'e.embedding')}) * 10000.0 + 0.5) / 10000.0) AS cos_sim
  FROM probed p JOIN embeddings e USING (label)
  WHERE e.vec_id <> p.query_id
),
ranked_ivf AS (
  SELECT query_id, vec_id, cos_sim,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rank
  FROM scored
)
"""

IVF_SQL = f"WITH {IVF_CORE} SELECT query_id, vec_id, cos_sim, rank FROM ranked_ivf WHERE rank <= 10"

ANN_RECALL_SQL = f"""
WITH {IVF_CORE},
ivf AS (SELECT query_id, vec_id FROM ranked_ivf WHERE rank <= 10),
exact_scored AS (
  SELECT q.query_id, e.vec_id,
         (floor(({_dd_cosine('q.qvec', 'e.embedding')}) * 10000.0 + 0.5) / 10000.0) AS cos_sim
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
),
exact AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS rank
    FROM exact_scored
  ) WHERE rank <= 10
),
per_query AS (
  SELECT x.query_id,
         (floor((CAST(COUNT(i.vec_id) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / 10000.0) AS recall_at_10
  FROM exact x LEFT JOIN ivf i USING (query_id, vec_id)
  GROUP BY x.query_id
)
SELECT * FROM per_query
UNION ALL
SELECT CAST(-1 AS BIGINT) AS query_id,
       (floor(AVG(recall_at_10) * 10000.0 + 0.5) / 10000.0) AS recall_at_10
FROM per_query
"""


def main() -> None:
    sfs = sys.argv[1:] or ["0.001", "0.01"]
    spark = get_spark(app_name="scratch-r4", shuffle_partitions=8)
    qs = all_queries()
    cases = {
        "seq_pack_docs": SEQ_PACK_SQL,
        "watchdog_state_machine": WATCHDOG_SQL,
        "multimodal_decoded": MULTIMODAL_SQL,
        "ivf_topk": IVF_SQL,
        "ann_recall_eval": ANN_RECALL_SQL,
    }
    for sf in sfs:
        sf_dir = f"/root/testdata/sf{sf}"
        con = duckdb_conn(sf_dir)
        for name, sql in cases.items():
            try:
                got = qs[name].fn(spark, sf_dir)
                want = con.sql(sql).df()
                compare(got, want, name=f"{name}@sf{sf}")
                print(f"OK   {name}@sf{sf}  rows={len(want)}")
            except Exception as e:
                print(f"FAIL {name}@sf{sf}: {str(e)[:500]}")


if __name__ == "__main__":
    main()
