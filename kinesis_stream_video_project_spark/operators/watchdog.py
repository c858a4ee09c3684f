"""The watchdog escalation state machine (reference restart.sh:68-158,
check_network.sh:44-92) as replayable per-key logic.

``replay_device`` is the single source of truth for the transition function;
it is used by BOTH the batch twin (applyInPandas over the probe log, O-22
batch form) and the streaming forms (applyInPandasWithState and
transformWithStateInPandas, streaming/jobs.py) — state semantics stay
identical by construction.

Semantics (intent of restart.sh, which has a latent syntax bug at :98 —
SURVEY.md §3.2 note — so intent is spec):

* per device, probes arrive in event-time order; ``ok`` probes reset the
  consecutive-failure counter AND the escalation level (a healthy probe ends
  an incident — restart.sh:92-95);
* each failed probe increments ``fail_cnt`` (restart.sh:90-91);
* when ``fail_cnt`` reaches ``MAX_FAILED_CNT`` (=3, restart.sh:15) the
  machine emits the remediation action at the current escalation level and
  escalates (restart.sh:104-156: email → NetworkManager → gateway → Wi-Fi →
  USB → reboot), then resets ``fail_cnt`` for the next batch of probes
  (restart.sh:76-82);
* the ladder saturates at ``reboot`` (restart.sh:149);
* **cooldown**: after a remediation fires, the reference sleeps
  ``loop_time=300`` s before probing again (restart.sh:12,76-82,157) — so
  probes inside ``[action_ts, action_ts + cooldown)`` are simply never
  observed. The machine models this by dropping such probes: no counter
  changes, no emissions, no re-alert flood. Pass ``cooldown_us=0`` for the
  pure counter ladder (the SQL-expressible form that
  ``escalation_actions``'s gaps-and-islands oracle checks — time
  suppression is inherently sequential and has no SQL twin).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from kinesis_stream_video_project_spark.config import (
    ESCALATION_LADDER,
    LOOP_COOLDOWN_SECONDS,
    MAX_FAILED_CNT,
)

#: Reference-faithful suppression window (restart.sh:12 loop_time=300).
LOOP_COOLDOWN_US = LOOP_COOLDOWN_SECONDS * 1_000_000


@dataclass
class WatchdogState:
    """Per-device mutable state — the Spark-side twin of the reference's
    process-global scalars kvs_failed_cnt / exec_cnt / is_reboot
    (restart.sh:13-24). ``last_action_ts_us`` (-1 = never) is the sleep
    clock behind restart.sh's loop_time cooldown."""

    fail_cnt: int = 0
    escalation_level: int = 0
    last_action_ts_us: int = -1
    actions: list = field(default_factory=list)

    def as_tuple(self) -> tuple[int, int, int]:
        return (self.fail_cnt, self.escalation_level, self.last_action_ts_us)


def step(
    state: WatchdogState,
    ts_us: int,
    ok: bool,
    cooldown_us: int = LOOP_COOLDOWN_US,
) -> tuple[int, str] | None:
    """Advance the machine by one probe; return an emitted action or None.

    A probe inside the cooldown window after the last action is unobserved
    (the reference process is asleep): state does not change at all.
    """
    if (
        cooldown_us > 0
        and state.last_action_ts_us >= 0
        and ts_us < state.last_action_ts_us + cooldown_us
    ):
        return None
    if ok:
        state.fail_cnt = 0
        state.escalation_level = 0
        return None
    state.fail_cnt += 1
    if state.fail_cnt < MAX_FAILED_CNT:
        return None
    action = ESCALATION_LADDER[min(state.escalation_level, len(ESCALATION_LADDER) - 1)]
    state.escalation_level += 1
    state.fail_cnt = 0  # counter reset after remediation (restart.sh:76-82)
    state.last_action_ts_us = ts_us
    return (ts_us, action)


def replay_device(
    probes: list[tuple[int, bool]],
    state: WatchdogState | None = None,
    cooldown_us: int = LOOP_COOLDOWN_US,
) -> tuple[list[tuple[int, str]], WatchdogState]:
    """Replay an ordered probe sequence through the machine.

    Returns (emitted actions [(ts_us, action)], final state). Resumable: pass
    the returned state back in with the next micro-batch of probes — this is
    exactly what the streaming form does with its GroupState.
    """
    st = state or WatchdogState()
    out: list[tuple[int, str]] = []
    for ts_us, ok in probes:
        emitted = step(st, ts_us, ok, cooldown_us=cooldown_us)
        if emitted is not None:
            out.append(emitted)
    return out, st
