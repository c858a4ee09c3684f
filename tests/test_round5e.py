"""Property tests for the round-5e surface (CUSUM changepoints, RRF
fusion, phrase search): detector semantics on constructed drifts, fusion
invariants, and an independent brute-force phrase check."""

from __future__ import annotations

import pandas as pd
import pytest

from kinesis_stream_video_project_spark.plans import registry
from kinesis_stream_video_project_spark.plans.queries_round5e import cusum_fold

SPECS = registry.all_queries()


def _frame(vals, user=1):
    return pd.DataFrame(
        {
            "user_id": [user] * len(vals),
            "ts": range(len(vals)),
            "event_id": range(len(vals)),
            "vu": vals,
        }
    )


def test_cusum_catches_sustained_shift_zscore_misses():
    """A +35% sustained level shift (each step far below any 3σ
    single-point threshold for the calibration noise) must alarm 'up'
    within a bounded delay — the accumulation property that distinguishes
    CUSUM from rolling_zscore_anomalies."""
    calm = [100 + (i % 3) for i in range(20)]  # ref≈101, κ≈33, h≈330
    shifted = [160] * 30  # +~59 < κ? no: 160-101-33 = +26/step
    out = cusum_fold(_frame(calm + shifted))
    assert (out["direction"] == "up").any()
    first = out[out["direction"] == "up"]["event_id"].min()
    assert 20 <= first <= 40  # fires during the shift, not the calm phase
    # reset-on-alarm: a long sustained shift produces MULTIPLE alarms
    long_shift = [160] * 200
    out2 = cusum_fold(_frame(calm + long_shift))
    assert (out2["direction"] == "up").sum() >= 3


def test_cusum_symmetric_down_and_quiet_on_noise():
    calm = [1000 + (i % 5) for i in range(20)]
    dropped = [400] * 30
    out = cusum_fold(_frame(calm + dropped))
    assert (out["direction"] == "down").any()
    assert not (out["direction"] == "up").any()
    # stationary noise within ±κ of the reference never alarms
    steady = [1000 + (i * 7 % 11) for i in range(300)]
    assert len(cusum_fold(_frame(steady))) == 0


def test_cusum_short_series_excluded():
    """Users with < 21 rows have no post-calibration window: no alarms,
    no crash — mirrors the oracle's HAVING COUNT(*) >= 21."""
    assert len(cusum_fold(_frame([100, 5000] * 10))) == 0


def test_rrf_fusion_invariants(spark, sf_dir):
    """Structural laws of the fused ranking: exactly ≤10 rows per query,
    fused_rank is the dense 1..k prefix, rrf_scaled is non-increasing
    along fused_rank, and every score is a sum of at most two reciprocal
    weights from rank ≤ 30 (bounded above by 2·⌊10⁹/61⌋)."""
    rows = SPECS["rrf_fused_topk"].fn(spark, sf_dir).collect()
    byq: dict = {}
    for r in rows:
        byq.setdefault(r["query_id"], []).append(r)
    assert set(byq) == {0, 1, 2, 3, 4}
    max_w = 2 * (10**9 // 61)
    for q, rs in byq.items():
        rs = sorted(rs, key=lambda r: r["fused_rank"])
        assert [r["fused_rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 10
        scores = [r["rrf_scaled"] for r in rs]
        assert all(a >= b for a, b in zip(scores, scores[1:]))
        assert all(0 < s <= max_w for s in scores)
        assert all(r["doc_id"] != q for r in rs)


def test_phrase_search_matches_bruteforce(spark, sf_dir):
    """Independent third implementation: plain Python adjacency count over
    the raw parquet must equal the Spark bigram-filter result."""
    import duckdb

    got = {
        (r["doc_id"], r["n_hits"])
        for r in SPECS["phrase_search_docs"].fn(spark, sf_dir).collect()
    }
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    want = set()
    for doc_id, text in docs:
        toks = text.split(" ")
        n = sum(
            1
            for a, b in zip(toks, toks[1:])
            if a == "table" and b == "scan"
        )
        if n > 0:
            want.add((doc_id, n))
    assert got == want and len(want) > 0


def test_cusum_negative_calibration_matches_duckdb():
    """Signed metrics: a calibration window whose sum is negative must
    produce the SAME (ref, κ) on both sides. Python's // floors toward
    -inf while DuckDB's // truncates toward zero (-7//20 is -1 vs 0), so
    the fold uses numeric.tdiv — this test replays a negative-mean series
    through cusum_fold AND the oracle's recursive CTE over an in-memory
    relation and requires identical alarm sets."""
    import duckdb

    vals = [-7, -3, -11, -5, -2, -9, -1, -8, -4, -6] * 2 + [-300] * 15
    rows = [(1, i, i, v) for i, v in enumerate(vals)]  # user, eid, ts, v
    got = cusum_fold(
        pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": [r[2] for r in rows],
                "event_id": [r[1] for r in rows],
                "vu": [r[3] for r in rows],
            }
        )
    )
    got_set = set(zip(got["event_id"], got["direction"]))
    con = duckdb.connect()
    con.execute("CREATE TABLE ev (user_id BIGINT, event_id BIGINT, ts BIGINT, vu BIGINT)")
    con.executemany("INSERT INTO ev VALUES (?, ?, ?, ?)", rows)
    want = con.execute("""
WITH RECURSIVE seq AS (
  SELECT user_id, event_id, vu,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM ev
),
refs AS (
  SELECT user_id, CAST(SUM(vu) FILTER (WHERE rn <= 20) // 20 AS BIGINT) AS ref
  FROM seq GROUP BY user_id HAVING COUNT(*) >= 21
),
walk AS (
  SELECT s.user_id, s.event_id, s.rn,
         CAST(0 AS BIGINT) AS sp, CAST(0 AS BIGINT) AS sm,
         false AS alarm_up, false AS alarm_down
  FROM seq s JOIN refs r ON r.user_id = s.user_id WHERE s.rn = 20
  UNION ALL
  SELECT s.user_id, s.event_id, s.rn,
         CASE WHEN greatest(0, w.sp + s.vu - r.ref - r.ref // 3) > 10 * (r.ref // 3)
              THEN 0 ELSE greatest(0, w.sp + s.vu - r.ref - r.ref // 3) END,
         CASE WHEN greatest(0, w.sm + r.ref - s.vu - r.ref // 3) > 10 * (r.ref // 3)
              THEN 0 ELSE greatest(0, w.sm + r.ref - s.vu - r.ref // 3) END,
         greatest(0, w.sp + s.vu - r.ref - r.ref // 3) > 10 * (r.ref // 3),
         greatest(0, w.sm + r.ref - s.vu - r.ref // 3) > 10 * (r.ref // 3)
  FROM walk w
  JOIN seq s ON s.user_id = w.user_id AND s.rn = w.rn + 1
  JOIN refs r ON r.user_id = w.user_id
)
SELECT event_id, 'up' FROM walk WHERE alarm_up
UNION ALL SELECT event_id, 'down' FROM walk WHERE alarm_down
""").fetchall()
    want_set = {(e, d) for e, d in want}
    # sanity: Python floor-division would calibrate ref=-6 (sum=-112,
    # floor -6) vs truncation's -5 — the sets would differ; tdiv aligns.
    assert got_set == want_set
