"""Hypothesis property tests for the watchdog transition function
(operators/watchdog.py::replay_device) — the SURVEY §5.2.4 plan: the state
machine must equal an independently-written fold of restart.sh's intent over
arbitrary probe sequences."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_stream_video_project_spark.config import (
    ESCALATION_LADDER,
    MAX_FAILED_CNT,
)
from kinesis_stream_video_project_spark.operators.watchdog import (
    WatchdogState,
    replay_device,
)


def independent_fold(seq: list[bool]) -> list[str]:
    """Deliberately re-written from the restart.sh description, not from the
    implementation: consecutive-failure counter, trip at 3, escalate through
    the ladder saturating at its last rung, full reset on any ok probe."""
    fails = 0
    level = 0
    out = []
    for ok in seq:
        if ok:
            fails, level = 0, 0
            continue
        fails += 1
        if fails == MAX_FAILED_CNT:
            out.append(ESCALATION_LADDER[min(level, len(ESCALATION_LADDER) - 1)])
            level += 1
            fails = 0
    return out


probe_seqs = st.lists(st.booleans(), min_size=0, max_size=200)


@settings(max_examples=300, deadline=None)
@given(probe_seqs)
def test_replay_matches_independent_fold(seq):
    probes = [(i * 1_000_000, ok) for i, ok in enumerate(seq)]
    actions, _ = replay_device(probes, WatchdogState())
    assert [a[1] for a in actions] == independent_fold(seq)


@settings(max_examples=300, deadline=None)
@given(probe_seqs)
def test_action_count_invariant(seq):
    """#actions == #times a run of >=3*k consecutive failures crosses a
    multiple of 3 — i.e. sum over maximal failure runs of floor(len/3)."""
    actions, _ = replay_device(
        [(i, ok) for i, ok in enumerate(seq)], WatchdogState()
    )
    runs, cur = [], 0
    for ok in seq:
        if ok:
            if cur:
                runs.append(cur)
            cur = 0
        else:
            cur += 1
    if cur:
        runs.append(cur)
    assert len(actions) == sum(r // MAX_FAILED_CNT for r in runs)


@settings(max_examples=200, deadline=None)
@given(probe_seqs, probe_seqs)
def test_replay_is_resumable(seq_a, seq_b):
    """Replaying a+b in one call == replaying a, carrying the state, then b —
    the property that makes batch-verified semantics valid for the streaming
    micro-batch form (state crosses batch boundaries)."""
    pa = [(i, ok) for i, ok in enumerate(seq_a)]
    pb = [(len(seq_a) + i, ok) for i, ok in enumerate(seq_b)]
    one_shot, final_one = replay_device(pa + pb, WatchdogState())
    first, mid = replay_device(pa, WatchdogState())
    second, final_two = replay_device(pb, mid)
    assert one_shot == first + second
    assert final_one.as_tuple() == final_two.as_tuple()
