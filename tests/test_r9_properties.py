"""Property tests for the round-9 queue operators: each drives random
inputs through the Spark operator AND an independent pure-python replay
of the stated semantics (the watchdog/funnel-fold discipline). Example
counts are small — every example is a Spark job — but the replays are
derivation-independent, which is what catches staging-order and
boundary bugs the handchecked cases miss."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _codes_replay(vec, mins, maxs):
    out = []
    for x, mn, mx in zip(vec, mins, maxs):
        if mx == mn:
            out.append(0)
        else:
            out.append(
                int(math.floor((float(x) - mn) / (mx - mn) * 254.0 + 0.5))
                - 127
            )
    return out


def test_sq8_quantize_matches_replay_and_range(spark):
    """Random f32 corpora: Spark codes equal the python replay of
    floor((x−mn)/(mx−mn)·254+0.5)−127 per dim, every code lies in
    [−127, 127], and each dim's min/max rows code to exactly ∓127."""
    from pyspark.sql import functions as F

    from kinesis_stream_video_project_spark.operators import similarity as sim

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.floats(
                    min_value=-100, max_value=100,
                    allow_nan=False, width=32,
                ),
                min_size=3, max_size=3,
            ),
            min_size=2, max_size=6,
        )
    )
    def check(vectors):
        e = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vectors)],
            "vec_id long, embedding array<float>",
        )
        bounds = sim.sq8_bounds(e).collect()[0]
        got = {
            r.vec_id: r.q
            for r in e.crossJoin(F.broadcast(sim.sq8_bounds(e)))
            .select(
                "vec_id",
                sim._sq8_quantize(
                    F.col("embedding"), F.col("mins"), F.col("maxs")
                ).alias("q"),
            )
            .collect()
        }
        for i, v in enumerate(vectors):
            want = _codes_replay(v, bounds.mins, bounds.maxs)
            assert got[i] == want
            assert all(-127 <= c <= 127 for c in got[i])
        for d in range(3):
            # non-degenerate dims: the extreme rows code to exactly ±127
            if bounds.mins[d] != bounds.maxs[d]:
                assert any(got[i][d] == -127 for i in range(len(vectors)))
                assert any(got[i][d] == 127 for i in range(len(vectors)))

    check()


def _backoff_replay(docs, tb, bb, scale):
    """Pure-python stupid backoff under budget pruning."""
    from collections import Counter

    tric, bic, uni = Counter(), Counter(), Counter()
    pos = []
    for did, text in docs:
        t = text.split(" ")
        uni.update(t)
        for i in range(len(t) - 1):
            bic[(t[i], t[i + 1])] += 1
        for i in range(len(t) - 2):
            tri = (t[i], t[i + 1], t[i + 2])
            tric[tri] += 1
            pos.append((did, tri))
    trik = dict(
        sorted(tric.items(), key=lambda kv: (-kv[1], kv[0]))[:tb]
    )
    bik = dict(sorted(bic.items(), key=lambda kv: (-kv[1], kv[0]))[:bb])
    n = sum(uni.values())
    out = {}
    for did, (w1, w2, w3) in pos:
        if (w1, w2, w3) in trik:
            term = (trik[(w1, w2, w3)] * scale) // bic[(w1, w2)]
            p = "tri"
        elif (w2, w3) in bik:
            term = (((bik[(w2, w3)] * scale) // uni[w2]) * 2) // 5
            p = "bi"
        else:
            term = (((uni[w3] * scale) // n) * 4) // 25
            p = "uni"
        np_, nt, nb, nu, sc = out.get(did, (0, 0, 0, 0, 0))
        out[did] = (
            np_ + 1,
            nt + (p == "tri"),
            nb + (p == "bi"),
            nu + (p == "uni"),
            sc + term,
        )
    return out


def test_stupid_backoff_matches_replay(spark):
    """Random tiny corpora over a 4-token alphabet, random budgets:
    Spark output equals the independent python fold — pins the budget
    tiebreak, the path precedence, and the staged division order."""
    from kinesis_stream_video_project_spark.operators import lm

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c", "d"]), min_size=3, max_size=8
            ),
            min_size=1, max_size=5,
        ),
        st.integers(min_value=1, max_value=6),
        st.integers(min_value=1, max_value=6),
    )
    def check(token_docs, tb, bb):
        docs = [(i, " ".join(toks)) for i, toks in enumerate(token_docs)]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: (r.n_positions, r.n_tri, r.n_bi, r.n_uni, r.score_scaled)
            for r in lm.stupid_backoff_scores(
                df, tri_budget=tb, bi_budget=bb, scale=10**6
            ).collect()
        }
        assert got == _backoff_replay(docs, tb, bb, 10**6)

    check()


def test_bloom_no_false_negative_law_random(spark):
    """Random train/eval corpora: every true hit bloom-hits (the Bloom
    law — zero false negatives, whatever the collision pattern), per
    doc and in aggregate."""
    from kinesis_stream_video_project_spark.operators import bloom

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c", "d", "e"]),
                min_size=2, max_size=7,
            ),
            min_size=1, max_size=4,
        ),
        st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c", "d", "e"]),
                min_size=2, max_size=7,
            ),
            min_size=1, max_size=3,
        ),
    )
    def check(train_toks, eval_toks):
        train = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in enumerate(train_toks)],
            "doc_id long, text string",
        )
        ev = spark.createDataFrame(
            [(100 + i, " ".join(t)) for i, t in enumerate(eval_toks)],
            "doc_id long, text string",
        )
        rows = bloom.bloom_decontaminate(train, ev, n=2).collect()
        for r in rows:
            assert r.n_bloom_hits >= r.n_true_hits
            assert r.n_false_positives == r.n_bloom_hits - r.n_true_hits

    check()


def test_silence_runs_maximality_law(spark):
    """Random PCM frames: every emitted run is (a) entirely below the
    threshold, (b) MAXIMAL (frames adjacent to a run are loud), and
    (c) the union of runs is exactly the silent frame set — replayed
    from the frame energies independently."""
    import struct

    from kinesis_stream_video_project_spark.operators import multimodal

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2000), min_size=8, max_size=40
        )
    )
    def check(amps):
        fs = 4
        n_frames = len(amps) // fs
        if n_frames < 2:
            return
        samples = amps[: n_frames * fs]
        payload = b"".join(struct.pack("<h", s) for s in samples)
        man = spark.createDataFrame(
            [(1, "audio", payload, (0, 0, "x"))],
            "media_id long, media_type string, payload binary, "
            "meta struct<width:int,height:int,origin:string>",
        )
        runs = [
            (r.start_frame, r.end_frame, r.n_frames)
            for r in multimodal.audio_silence_runs(
                man, frame_samples=fs
            ).collect()
        ]
        energies = [
            sum(s * s for s in samples[i * fs : (i + 1) * fs])
            for i in range(n_frames)
        ]
        tot = sum(energies)
        silent = {
            i
            for i, e in enumerate(energies)
            if e * 1000 * n_frames < tot * 950
        }
        covered = set()
        for s, e, m in runs:
            assert m == e - s + 1
            frames = set(range(s, e + 1))
            assert frames <= silent
            assert s - 1 not in silent and e + 1 not in silent  # maximal
            covered |= frames
        assert covered == silent

    check()


def test_token_bucket_fold_laws():
    """Random event sequences / parameters: bucket level stays in
    [0, cap] after every decision, rejected events spend nothing, and
    the fold is CHUNKING-INVARIANT (splitting the row sequence at any
    point and carrying state equals one fold — the stream ≡ batch
    core, pure-python so hypothesis can afford 300 examples)."""
    from kinesis_stream_video_project_spark.operators.ratelimit import (
        SCALE,
        token_bucket_fold,
    )

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=10**7), min_size=1, max_size=20
        ),
        st.integers(min_value=1, max_value=5),
        st.integers(min_value=1, max_value=10**6),
        st.integers(min_value=1, max_value=4),
        st.integers(min_value=1, max_value=2),
        st.integers(min_value=0, max_value=19),
    )
    def check(gaps, refill, per_s, cap, cost, split_at):
        ts = 0
        rows = []
        for i, g in enumerate(gaps):
            ts += g
            rows.append((ts, i))
        t, l, emits = token_bucket_fold(0, -1, rows, refill, per_s, cap, cost)
        level = None
        for (ts_us, _eid), (_t2, _e2, admitted, after) in zip(rows, emits):
            assert 0 <= after <= cap * SCALE
            if admitted:
                assert after >= 0  # spent cost from a sufficient bucket
            # rejected events spend nothing: level never decreases on a
            # rejection (it may increase via refill)
        # chunking invariance
        split_at = min(split_at, len(rows))
        t1, l1, e1 = token_bucket_fold(
            0, -1, rows[:split_at], refill, per_s, cap, cost
        )
        t2, l2, e2 = token_bucket_fold(
            t1, l1, rows[split_at:], refill, per_s, cap, cost
        )
        assert (t2, l2) == (t, l)
        assert e1 + e2 == emits

    check()
