"""Property tests for the buffered SCD2 core (streaming/jobs.py:
_scd2_fold / _scd2_buffered_step) — pure-Python, no Spark session.

The streaming tests pin concrete late/drop scenarios; these pin the two
algebraic laws the machinery must satisfy for EVERY input:

1. batching invariance — under in-order delivery, any split of the event
   sequence into micro-batches (any lateness) emits exactly the one-shot
   fold's closed intervals once the tail is flushed;
2. reorder transparency — arrivals shuffled by strictly less than the
   allowed lateness fold back into event order, so the emissions again
   equal the one-shot in-order fold (no drops can occur under that bound:
   when event e arrives, max_seen <= e.ts + lateness - 1, hence the
   frontier max_seen - lateness < e.ts).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_stream_video_project_spark.streaming.jobs import (
    _scd2_buffered_step,
    _scd2_fold,
)

# (ts, status-index) pairs; event_id assigned by list position (unique).
_events = st.lists(
    st.tuples(st.integers(min_value=0, max_value=50), st.integers(0, 2)),
    min_size=0,
    max_size=40,
)


def _mk(seq):
    return [(ts, eid, "ABC"[s]) for eid, (ts, s) in enumerate(seq)]


def _one_shot(rows):
    """Reference: fold the whole (ts, eid, status) list in event order."""
    rows = sorted(rows, key=lambda r: (r[0], r[1]))
    _, _, c_s, c_f, c_t = _scd2_fold(None, None, ((t, s) for t, _e, s in rows))
    return list(zip(c_s, c_f, c_t))


def _drive(arrival_order, batch_sizes, lateness):
    """Run _scd2_buffered_step over the arrival stream, then flush the tail
    (buffered rows + open interval) exactly like a final drain would."""
    cur_s, cur_f, frontier, pending = None, None, None, []
    emitted = []
    i = 0
    for n in batch_sizes:
        batch, i = arrival_order[i : i + n], i + n
        cur_s, cur_f, frontier, pending, closed = _scd2_buffered_step(
            cur_s, cur_f, frontier, pending, batch, lateness
        )
        emitted.extend(closed)
    # flush: fold everything still pending through the open interval
    pending = sorted(pending, key=lambda r: (r[0], r[1]))
    cur_s, cur_f, c_s, c_f, c_t = _scd2_fold(
        cur_s, cur_f, ((t, s) for t, _e, s in pending)
    )
    emitted.extend(zip(c_s, c_f, c_t))
    return emitted


@given(_events, st.data(), st.integers(min_value=0, max_value=60))
@settings(max_examples=200, deadline=None)
def test_batching_invariance_in_order(seq, data, lateness):
    rows = sorted(_mk(seq), key=lambda r: (r[0], r[1]))
    sizes = []
    left = len(rows)
    while left > 0:
        n = data.draw(st.integers(min_value=1, max_value=left))
        sizes.append(n)
        left -= n
    assert _drive(rows, sizes, lateness) == _one_shot(rows)


@given(_events, st.data(), st.integers(min_value=2, max_value=20))
@settings(max_examples=200, deadline=None)
def test_reorder_within_lateness_is_transparent(seq, data, lateness):
    rows = _mk(seq)
    # arrival key = ts + jitter with |jitter| <= (lateness-1)//2: any two
    # events whose arrival order swaps differ in ts by < lateness, so every
    # event is folded into its true position and none can be dropped.
    j = (lateness - 1) // 2
    jitters = [
        data.draw(st.integers(min_value=-j, max_value=j)) for _ in rows
    ]
    arrival = [
        r
        for _, r in sorted(
            zip(jitters, rows), key=lambda p: (p[1][0] + p[0], p[1][1])
        )
    ]
    sizes = []
    left = len(arrival)
    while left > 0:
        n = data.draw(st.integers(min_value=1, max_value=left))
        sizes.append(n)
        left -= n
    assert _drive(arrival, sizes, lateness) == _one_shot(rows)
