"""Hypothesis property tests for the watchdog transition function
(operators/watchdog.py::replay_device) — the SURVEY §5.2.4 plan: the state
machine must equal an independently-written fold of restart.sh's intent over
arbitrary probe sequences, and the loop_time=300 s cooldown
(restart.sh:12,76-82,157) must suppress re-emission within its window."""

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


def independent_fold_cooldown(
    probes: list[tuple[int, bool]], cooldown_us: int
) -> list[tuple[int, str]]:
    """The cooldown spec, independently: a probe within cooldown of the last
    action is never observed (the reference process is asleep)."""
    fails, level, last = 0, 0, None
    out: list[tuple[int, str]] = []
    for ts, ok in probes:
        if last is not None and ts < last + cooldown_us:
            continue
        if ok:
            fails, level = 0, 0
            continue
        fails += 1
        if fails == MAX_FAILED_CNT:
            out.append(
                (ts, ESCALATION_LADDER[min(level, len(ESCALATION_LADDER) - 1)])
            )
            level += 1
            fails = 0
            last = ts
    return out


probe_seqs = st.lists(st.booleans(), min_size=0, max_size=200)

# Probe streams with irregular spacing: timestamps accumulate 1 s..10 min
# gaps, so sequences both inside and far beyond the cooldown window occur.
timed_seqs = st.lists(
    st.tuples(st.integers(min_value=1, max_value=600), st.booleans()),
    min_size=0,
    max_size=200,
).map(
    lambda gaps: [
        (sum(g for g, _ in gaps[: i + 1]) * 1_000_000, ok)
        for i, (_, ok) in enumerate(gaps)
    ]
)

COOLDOWN_US = 300 * 1_000_000


@settings(max_examples=300, deadline=None)
@given(probe_seqs)
def test_replay_matches_independent_fold(seq):
    probes = [(i * 1_000_000, ok) for i, ok in enumerate(seq)]
    actions, _ = replay_device(probes, WatchdogState(), cooldown_us=0)
    assert [a[1] for a in actions] == independent_fold(seq)


@settings(max_examples=300, deadline=None)
@given(probe_seqs)
def test_action_count_invariant(seq):
    """#actions == #times a run of >=3*k consecutive failures crosses a
    multiple of 3 — i.e. sum over maximal failure runs of floor(len/3)."""
    actions, _ = replay_device(
        [(i, ok) for i, ok in enumerate(seq)], WatchdogState(), cooldown_us=0
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
    one_shot, final_one = replay_device(pa + pb, WatchdogState(), cooldown_us=0)
    first, mid = replay_device(pa, WatchdogState(), cooldown_us=0)
    second, final_two = replay_device(pb, mid, cooldown_us=0)
    assert one_shot == first + second
    assert final_one.as_tuple() == final_two.as_tuple()


@settings(max_examples=300, deadline=None)
@given(timed_seqs)
def test_cooldown_matches_independent_fold(probes):
    actions, _ = replay_device(probes, WatchdogState())
    assert actions == independent_fold_cooldown(probes, COOLDOWN_US)


@settings(max_examples=300, deadline=None)
@given(timed_seqs)
def test_cooldown_spacing_invariant(probes):
    """No two actions within the cooldown window — the flood-suppression
    property restart.sh gets from sleeping loop_time."""
    actions, _ = replay_device(probes, WatchdogState())
    for (t1, _), (t2, _) in zip(actions, actions[1:]):
        assert t2 - t1 >= COOLDOWN_US


@settings(max_examples=200, deadline=None)
@given(timed_seqs)
def test_cooldown_resumable_across_batches(probes):
    """Suppression windows must span micro-batch boundaries: splitting the
    probe stream at every possible point and carrying the state yields the
    same actions as one replay (last_action_ts_us rides the state)."""
    one_shot, final_one = replay_device(probes, WatchdogState())
    cut = len(probes) // 2
    first, mid = replay_device(probes[:cut], WatchdogState())
    second, final_two = replay_device(probes[cut:], mid)
    assert one_shot == first + second
    assert final_one.as_tuple() == final_two.as_tuple()


def test_flood_emits_one_action_per_window():
    """Dense failure flood (10 s tick, restart.sh:157) for 2 h: exactly one
    action per ~(cooldown + 2 ticks), ladder ascending to saturation."""
    sec = 1_000_000
    probes = [(t * 10 * sec, False) for t in range(720)]
    actions, _ = replay_device(probes, WatchdogState())
    times = [a[0] // sec for a in actions]
    assert times == [20 + i * 320 for i in range(len(times))]
    assert len(times) == 23
    names = [a[1] for a in actions]
    assert names[:6] == list(ESCALATION_LADDER)
    assert set(names[6:]) == {"reboot"}
