"""Streaming transformation jobs (O-18..O-22): the watchdog pipeline's
streaming forms. Each takes a streaming DataFrame and returns a streaming
DataFrame; sinks live in sinks.py.

Every job here has an oracle-checked batch twin in plans/ (SURVEY.md §5.2.3):
identical expressions over the same window operators, so the semantics the
driver verifies in batch are the semantics these run incrementally.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructType,
)

from kinesis_stream_video_project_spark.config import METRIC_WINDOW_SECONDS
from kinesis_stream_video_project_spark.functions.numeric import tdiv
from kinesis_stream_video_project_spark.operators.watchdog import (
    WatchdogState,
    replay_device,
)


def stream_health_60s(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming form of the flagship: per-stream 60 s tumbling-window health
    (putmedia_check.sh:15,26-34 + restart.sh:57). Watermark bounds state
    (O-20): windows older than the watermark are finalized and evicted —
    the 100 TB requirement the batch twin doesn't exercise."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{METRIC_WINDOW_SECONDS} seconds").alias("w"),
            "user_id",
        )
        .agg(
            F.sum("value").alias("put_media_sum"),
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("user_id"),
            "put_media_sum",
            "n_events",
            "n_errors",
            (F.col("put_media_sum") > 0).alias("healthy"),
        )
    )


def enrich_with_catalog(events: DataFrame, catalog: DataFrame) -> DataFrame:
    """Stream-static join (SURVEY.md §3.4): enrich the metric/probe stream
    with the stream-catalog dimension (the `list-streams` registry,
    putmedia_check.sh:6), keeping only ACTIVE streams (check_wf.sh:13).

    The static side is broadcast — each executor joins its micro-batch
    locally with zero shuffle of the stream, which is what makes this viable
    when the stream side is 100 TB/day: the catalog (thousands of rows) moves
    once per executor, the events never move at all.
    """
    dim = F.broadcast(
        catalog.filter(F.col("status") == "ACTIVE").select(
            "stream_key", "stream_name", "device_name"
        )
    )
    return events.join(dim, events["user_id"] == dim["stream_key"], "inner").drop(
        "stream_key"
    )


def sliding_error_rate(
    events: DataFrame,
    watermark: str = "10 minutes",
    window: str = "5 minutes",
    slide: str = "1 minute",
) -> DataFrame:
    """Sliding-window error rate (O-19): each event lands in window/slide
    overlapping windows — the streaming form of the batch `sliding_windows`
    twin. Watermark bounds the open-window state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "user_id",
            "n_events",
            "n_errors",
            (F.col("n_errors") / F.col("n_events")).alias("error_rate"),
        )
    )


def session_activity(
    events: DataFrame, watermark: str = "10 minutes", gap: str = "5 minutes"
) -> DataFrame:
    """Session-window activity per device (O-19): dynamic-length windows that
    close after `gap` of silence — the streaming form of the reference's
    probe-batch + cooldown grouping (restart.sh:18-19,76-82)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def correlate_probe_metric(
    probes: DataFrame,
    metrics: DataFrame,
    watermark: str = "10 minutes",
    max_lag: str = "60 seconds",
) -> DataFrame:
    """Stream-stream interval join (O-14 streaming form): pair each probe
    with metric observations for the same device from the preceding
    ``max_lag`` — the reference's probe-vs-`[now-60s, now]`-window
    correlation (putmedia_check.sh:21-22) as a native join.

    Both sides carry watermarks and the join condition bounds metric_ts to
    [probe_ts - max_lag, probe_ts], so Spark derives state-eviction bounds
    for BOTH buffers — state is (rate x lag)-bounded, not unbounded.
    Input column contract: probes(device_id, ts, ok), metrics(user_id, ts,
    value).
    """
    p = probes.select(
        F.col("device_id").alias("p_device"),
        F.col("ts").alias("probe_ts"),
        F.col("ok").alias("probe_ok"),
    ).withWatermark("probe_ts", watermark)
    m = metrics.select(
        F.col("user_id").alias("m_device"),
        F.col("ts").alias("metric_ts"),
        F.col("value").alias("metric_value"),
    ).withWatermark("metric_ts", watermark)
    return p.join(
        m,
        (F.col("p_device") == F.col("m_device"))
        & (F.col("metric_ts") >= F.col("probe_ts") - F.expr(f"INTERVAL {max_lag}"))
        & (F.col("metric_ts") <= F.col("probe_ts")),
        "inner",
    ).select(
        F.col("p_device").alias("device_id"),
        "probe_ts",
        "probe_ok",
        "metric_ts",
        "metric_value",
    )


def streaming_dedup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming dedup on event id within the watermark horizon (O-21):
    state holds one key per id and is evicted at the watermark — bounded
    memory at any scale, unlike an unbounded dropDuplicates."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


_ACTION_SCHEMA = (
    StructType()
    .add("device_id", "long")
    .add("action_ts_us", "long")
    .add("action", "string")
)
_STATE_SCHEMA = (
    StructType()
    .add("fail_cnt", "integer")
    .add("escalation_level", "integer")
    .add("last_action_ts_us", "long")
)


def _require_event_id(probes: DataFrame, fn: str) -> None:
    """Both watchdog streaming forms tiebreak equal-ts probes on event_id —
    the same (ts, event_id) total order the batch twin
    (plans/queries_streaming_twins.py::watchdog_state_machine) folds in.
    Without it, equal-ts probes would replay in nondeterministic
    Arrow-chunk order, so the column is required rather than optional."""
    if "event_id" not in probes.columns:
        raise ValueError(
            f"{fn} requires an event_id column in the probe schema: it is "
            "the equal-ts tiebreaker that keeps the replay deterministic "
            "and equal to the batch twin's (ts, event_id) total order"
        )


def watchdog_actions(probes: DataFrame) -> DataFrame:
    """O-22 streaming form: the escalation state machine via
    applyInPandasWithState, keyed by device — per-key fault-tolerant state in
    the RocksDB store replaces restart.sh's process-global counters.

    The transition function is operators/watchdog.py::replay_device — the
    very same code the batch twin runs, so batch-verified semantics carry
    over to streaming by construction (including the loop_time=300 s
    cooldown: ``last_action_ts_us`` rides the state row, so suppression
    windows span micro-batch boundaries). Within a micro-batch rows are
    sorted by (ts, event_id) — event_id is required (see
    :func:`_require_event_id`); the gateway's probes are sequential per
    device and cross-batch reordering is bounded by the upstream watermark.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (device_id,) = key
        if state.exists:
            fail_cnt, esc, last_ts = state.get
            st = WatchdogState(
                fail_cnt=fail_cnt,
                escalation_level=esc,
                last_action_ts_us=last_ts,
            )
        else:
            st = WatchdogState()
        out_ts: list[int] = []
        out_action: list[str] = []
        # Concatenate ALL Arrow chunks BEFORE sorting (same reasoning as
        # scd2_status_stream): a device with more rows than the Arrow batch
        # size arrives as several pdfs in arbitrary order, and folding
        # per-chunk would replay probes out of event order.
        frames = [p for p in pdfs if len(p)]
        if frames:
            pdf = pd.concat(frames, ignore_index=True)
            pdf = pdf.sort_values(["ts", "event_id"])
            ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
            actions, st = replay_device(
                list(zip(ts_us, pdf["ok"].tolist())), st
            )
            out_ts.extend(a[0] for a in actions)
            out_action.extend(a[1] for a in actions)
        state.update(st.as_tuple())
        if out_ts:
            yield pd.DataFrame(
                {
                    "device_id": [device_id] * len(out_ts),
                    "action_ts_us": out_ts,
                    "action": out_action,
                }
            )

    _require_event_id(probes, "watchdog_actions")
    return probes.groupBy("device_id").applyInPandasWithState(
        update,
        outputStructType=_ACTION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def watchdog_actions_tws(probes: DataFrame) -> DataFrame:
    """O-22 streaming form on the Spark 4 arbitrary-state API
    (``transformWithStateInPandas``): same per-device escalation machine as
    :func:`watchdog_actions`, with the state in a typed ValueState handle.

    Versus ``applyInPandasWithState`` this is the forward path: composable
    state variables (value/list/map), timers for the cooldown semantics
    (restart.sh:76-82) without sentinel rows, and schema-evolvable state in
    the RocksDB store — the API Spark is converging on for 100 TB stateful
    jobs. Requires the RocksDB state-store provider (set by session.py;
    the HDFS-backed provider does not support transformWithState) AND the
    ``protobuf`` Python package (the driver-worker's state-server wire
    protocol) — without protobuf the query fails at start, so the test suite
    skips it and :func:`watchdog_actions` remains the portable form.

    Timer use (the capability applyInPandasWithState lacks): after each
    emitted action the processor registers a processing-time timer at
    ``now + LOOP_COOLDOWN_SECONDS``; when it fires on a device whose
    incident is over (counters at rest, cooldown elapsed), the state row is
    deleted — keys that recovered stop occupying the state store, which is
    what bounds state under 100 TB of device churn. The cooldown
    *correctness* does not depend on the timer (last_action_ts_us rides the
    state and suppresses by event time, identically to the other two
    forms); the timer is pure state hygiene.

    The transition function is the same operators/watchdog.py::replay_device
    the batch twin and the applyInPandasWithState form use, so all three
    surfaces share one verified semantics.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    from kinesis_stream_video_project_spark.config import LOOP_COOLDOWN_SECONDS

    class WatchdogProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("watchdog", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (device_id,) = key
            held = self._state.get()
            st = (
                WatchdogState(
                    fail_cnt=held[0],
                    escalation_level=held[1],
                    last_action_ts_us=held[2],
                )
                if held is not None
                else WatchdogState()
            )
            out_ts: list[int] = []
            out_action: list[str] = []
            # Concat-then-sort across Arrow chunks (same reasoning as the
            # applyInPandasWithState form): per-chunk sorting would replay
            # probes out of event order for large groups.
            frames = [p for p in rows if len(p)]
            if frames:
                pdf = pd.concat(frames, ignore_index=True)
                keys = ["ts", "event_id"]
                pdf = pdf.sort_values(keys)
                ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
                actions, st = replay_device(list(zip(ts_us, pdf["ok"].tolist())), st)
                out_ts.extend(a[0] for a in actions)
                out_action.extend(a[1] for a in actions)
            self._state.update(st.as_tuple())
            if out_ts:
                # State-hygiene timer: revisit this key after the cooldown.
                self._handle.registerTimer(
                    timerValues.getCurrentProcessingTimeInMs()
                    + LOOP_COOLDOWN_SECONDS * 1000
                )
                yield pd.DataFrame(
                    {
                        "device_id": [device_id] * len(out_ts),
                        "action_ts_us": out_ts,
                        "action": out_action,
                    }
                )

        def handleExpiredTimer(
            self, key, timerValues, expiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            held = self._state.get()
            if held is not None and held[0] == 0 and held[1] == 0:
                # Incident over and cooldown elapsed: drop the state row so
                # recovered devices cost nothing in the store.
                self._state.clear()
            yield from ()

        def close(self) -> None:
            pass

    _require_event_id(probes, "watchdog_actions_tws")
    return probes.groupBy("device_id").transformWithStateInPandas(
        statefulProcessor=WatchdogProcessor(),
        outputStructType=_ACTION_SCHEMA,
        outputMode="Append",
        timeMode="ProcessingTime",
    )


_SCD2_OUT_SCHEMA = (
    StructType()
    .add("user_id", "long")
    .add("status", "string")
    .add("valid_from_us", "long")
    .add("valid_to_us", "long")
)
_SCD2_STATE_SCHEMA = (
    StructType().add("status", "string").add("valid_from_us", "long")
)
# Buffered (allowed_lateness_us > 0) state: the open interval PLUS a per-key
# reorder buffer of not-yet-finalized events and the fold frontier (events at
# or below it are already folded; later arrivals below it are dropped, the
# standard watermark contract).
_SCD2_STATE_SCHEMA_BUFFERED = (
    StructType()
    .add("status", "string")
    .add("valid_from_us", "long")
    .add("frontier_us", "long")
    .add("buf_ts_us", ArrayType(LongType()))
    .add("buf_event_id", ArrayType(LongType()))
    .add("buf_status", ArrayType(StringType()))
)


def _scd2_fold(cur_status, cur_from, rows):
    """Pure change-detector over (ts_us, status) rows: returns the new open
    interval and the closed-interval columns. Module-level so the property
    tests can drive it directly (tests/test_scd2_properties.py)."""
    c_status: list[str] = []
    c_from: list[int] = []
    c_to: list[int] = []
    for t, s in rows:
        if cur_status is None:
            cur_status, cur_from = s, t
        elif s != cur_status:
            c_status.append(cur_status)
            c_from.append(cur_from)
            c_to.append(t - 1)
            cur_status, cur_from = s, t
    return cur_status, cur_from, c_status, c_from, c_to


def _scd2_buffered_step(
    cur_status, cur_from, frontier, pending, new_rows, lateness_us
):
    """Pure core of ONE buffered micro-batch step. ``pending``/``new_rows``
    are (ts_us, event_id, status) triples; returns the advanced state
    (cur_status, cur_from, frontier, pending') plus the closed intervals
    [(status, from_us, to_us), ...] this step finalized. Contract (the
    property tests pin it): rows STRICTLY before the frontier are dropped;
    rows at or past ``max_seen - lateness`` stay buffered; everything
    strictly below the cutoff folds in (ts, event_id) order. Both bounds
    are strict on the same side ON PURPOSE — folding ties AT the cutoff
    while dropping ties AT the frontier loses an equal-ts event that
    straddles a batch boundary (hypothesis found the two-events-same-ts
    lateness-0 counterexample); keeping ties buffered until the cutoff
    passes them preserves the (ts, event_id) fold order exactly."""
    pending = list(pending) + list(new_rows)
    if frontier is not None:
        pending = [r for r in pending if r[0] >= frontier]
    closed: list[tuple] = []
    if pending:
        pending.sort(key=lambda r: (r[0], r[1]))
        cutoff = pending[-1][0] - lateness_us
        n_ready = 0
        while n_ready < len(pending) and pending[n_ready][0] < cutoff:
            n_ready += 1
        if n_ready:
            cur_status, cur_from, c_status, c_from, c_to = _scd2_fold(
                cur_status,
                cur_from,
                ((t, s) for t, _e, s in pending[:n_ready]),
            )
            closed = list(zip(c_status, c_from, c_to))
            frontier = max(frontier or cutoff, cutoff)
            pending = pending[n_ready:]
    return cur_status, cur_from, frontier, pending, closed


def scd2_status_stream(
    events: DataFrame, allowed_lateness_us: int = 0
) -> DataFrame:
    """Streaming SCD2 build (the incremental form of
    plans/queries_round4.py::scd2_user_status): emit a CLOSED validity
    interval whenever a user's status changes; the OPEN interval rides
    per-user state across micro-batches (that is what makes it incremental
    — the batch twin re-derives open intervals per run, the stream carries
    them in the store and emits only deltas).

    Ordering contract (two modes):

    * ``allowed_lateness_us = 0`` (default): events are sorted WITHIN each
      micro-batch but folded in arrival order ACROSS micro-batches, so the
      append output equals the batch twin's ``is_current = false`` rows
      only under per-key in-order delivery across batches — true for
      Kinesis per partition key absent resharding, and for any
      replay/backfill source that splits the log by time. A late event
      (earlier ts arriving in a later micro-batch) folds out of order and
      produces wrong intervals; use the buffered mode when the source
      cannot guarantee per-key order.
    * ``allowed_lateness_us > 0``: a per-key reorder buffer holds events
      until the key's max seen ts STRICTLY exceeds them by the allowed
      lateness; only then are they folded (in (ts, event_id) order), so
      any event at most that late lands in the right place. Events
      arriving strictly before the fold frontier are dropped — the same
      contract as a Spark watermark. (Both bounds strict on the fold side:
      equal-ts ties stay buffered rather than half-folding, see
      ``_scd2_buffered_step``.) The buffered tail (events within lateness of max ts) is
      never folded until later input advances the frontier, exactly like
      an unfinalized window. Exercised with a genuinely late event in
      tests/test_streaming.py::test_scd2_stream_reorders_late_events.

    State = (current status, its start epoch-µs) plus, in buffered mode,
    the reorder buffer and frontier; transition logic is the same
    change-detection the batch twin expresses with lag()."""

    fold = _scd2_fold

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            cur_status, cur_from = state.get
        else:
            cur_status, cur_from = None, None
        # Concatenate ALL Arrow chunks BEFORE sorting: a group larger than
        # arrow.maxRecordsPerBatch arrives as several pdfs in arbitrary
        # order, and per-chunk sorting would fold later-chunk earlier
        # timestamps after earlier-chunk later ones (wrong intervals).
        frames = [p for p in pdfs if len(p)]
        c_status: list[str] = []
        if frames:
            batch = pd.concat(frames, ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"])
            ts_us = (batch["ts"].astype("int64") // 1000).tolist()
            cur_status, cur_from, c_status, c_from, c_to = fold(
                cur_status, cur_from, zip(ts_us, batch["event_type"].tolist())
            )
        state.update((cur_status, cur_from))
        if c_status:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(c_status),
                    "status": c_status,
                    "valid_from_us": c_from,
                    "valid_to_us": c_to,
                }
            )

    def update_buffered(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            cur_status, cur_from, frontier, b_ts, b_eid, b_st = state.get
            pending = list(zip(b_ts or [], b_eid or [], b_st or []))
        else:
            cur_status, cur_from, frontier, pending = None, None, None, []
        new_rows: list[tuple] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
            new_rows.extend(
                zip(ts_us, pdf["event_id"].tolist(), pdf["event_type"].tolist())
            )
        cur_status, cur_from, frontier, pending, closed = _scd2_buffered_step(
            cur_status, cur_from, frontier, pending, new_rows,
            allowed_lateness_us,
        )
        state.update(
            (
                cur_status,
                cur_from,
                frontier,
                [r[0] for r in pending],
                [r[1] for r in pending],
                [r[2] for r in pending],
            )
        )
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "status": [c[0] for c in closed],
                    "valid_from_us": [c[1] for c in closed],
                    "valid_to_us": [c[2] for c in closed],
                }
            )

    buffered = allowed_lateness_us > 0
    return events.groupBy("user_id").applyInPandasWithState(
        update_buffered if buffered else update,
        outputStructType=_SCD2_OUT_SCHEMA,
        stateStructType=(
            _SCD2_STATE_SCHEMA_BUFFERED if buffered else _SCD2_STATE_SCHEMA
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_EWMA_OUT_SCHEMA = (
    StructType().add("user_id", "long").add("event_id", "long").add("ewma", "double")
)
_EWMA_STATE_SCHEMA = StructType().add("y", "double")
_EWMA_STATE_SCHEMA_BUFFERED = (
    StructType()
    .add("y", "double")
    .add("frontier_us", "long")
    .add("buf_ts_us", ArrayType(LongType()))
    .add("buf_event_id", ArrayType(LongType()))
    .add("buf_value", ArrayType(DoubleType()))
)


def _ewma_fold(y, rows, alpha=0.5):
    """Pure EWMA recursion over (event_id, value) rows in fold order:
    y_t = (1-alpha)*y_{t-1} + alpha*x_t, seeded with the first value.
    Module-level so tests can drive it directly. The batch twin
    (plans/queries_round5b.py::ewma_metric) runs the same IEEE ops, so with
    in-order delivery the stream's emitted values are bit-identical."""
    out: list[tuple] = []
    for eid, v in rows:
        y = v if y is None else (1.0 - alpha) * y + alpha * v
        out.append((eid, y))
    return y, out


def _reorder_ready(frontier, pending, new_rows, lateness_us):
    """Pure reorder-buffer step shared by value-stream jobs: merge
    ``new_rows`` into ``pending`` (rows are (ts_us, event_id, payload...)
    tuples), drop rows strictly before the frontier, and release — in
    (ts, event_id) order — every row strictly below ``max_seen - lateness``.
    Same strict-on-both-sides bounds as ``_scd2_buffered_step`` (equal-ts
    ties stay buffered until the cutoff passes them — the hypothesis-found
    straddle rule); kept separate so the SCD2 core's pinned laws stay
    untouched. Returns (frontier', pending', ready)."""
    pending = list(pending) + list(new_rows)
    if frontier is not None:
        pending = [r for r in pending if r[0] >= frontier]
    ready: list[tuple] = []
    if pending:
        pending.sort(key=lambda r: (r[0], r[1]))
        cutoff = pending[-1][0] - lateness_us
        n_ready = 0
        while n_ready < len(pending) and pending[n_ready][0] < cutoff:
            n_ready += 1
        if n_ready:
            ready, pending = pending[:n_ready], pending[n_ready:]
            frontier = max(frontier or cutoff, cutoff)
    return frontier, pending, ready



def _keyed_value_stream(
    events: DataFrame,
    *,
    restore,
    persist,
    fold,
    emit,
    scale,
    out_schema,
    state_schema,
    buffered_state_schema,
    allowed_lateness_us: int,
):
    """Shared driver for the per-key value-fold stream jobs (EWMA,
    rolling z-score, CUSUM): ONE implementation of the state
    restore/persist shell, the per-batch notna + (ts, event_id) sort, the
    ns→µs scaling, the `_reorder_ready` buffered mode, and the
    parallel-array pending repack — the jobs supply only their fold
    (state × rows → state × emissions), state codec, value scaling, and
    emit frame. The shell logic is the cross-engine parity anchor (a fix
    applied to one copy of a triplicated shell silently breaks exactly
    one batch==stream equality), hence one copy.

    Contracts: ``restore(None)`` builds the initial state;
    ``restore(core_tuple)``/``persist(state)`` round-trip the non-buffer
    state fields; buffered mode appends (frontier, buf_ts, buf_eid,
    buf_val) after the core fields — ``buffered_state_schema`` must be
    ``state_schema`` + those four."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        st = restore(tuple(state.get) if state.exists else None)
        frames = [p for p in pdfs if len(p)]
        out_rows: list[tuple] = []
        if frames:
            batch = pd.concat(frames, ignore_index=True)
            batch = batch[batch["value"].notna()]
            batch = batch.sort_values(["ts", "event_id"])
            st, out_rows = fold(
                st, list(zip(batch["event_id"].tolist(), scale(batch["value"])))
            )
        state.update(persist(st))
        if out_rows:
            yield emit(user_id, out_rows)

    def update_buffered(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            raw = tuple(state.get)
            st = restore(raw[:-4])
            frontier, b_ts, b_eid, b_val = raw[-4:]
            pending = list(zip(b_ts or [], b_eid or [], b_val or []))
        else:
            st, frontier, pending = restore(None), None, []
        new_rows: list[tuple] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            pdf = pdf[pdf["value"].notna()]
            ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
            new_rows.extend(
                zip(ts_us, pdf["event_id"].tolist(), scale(pdf["value"]))
            )
        frontier, pending, ready = _reorder_ready(
            frontier, pending, new_rows, allowed_lateness_us
        )
        out_rows: list[tuple] = []
        if ready:
            st, out_rows = fold(st, [(eid, v) for _ts, eid, v in ready])
        state.update(
            (
                *persist(st),
                frontier,
                [r[0] for r in pending],
                [r[1] for r in pending],
                [r[2] for r in pending],
            )
        )
        if out_rows:
            yield emit(user_id, out_rows)

    buffered = allowed_lateness_us > 0
    return events.groupBy("user_id").applyInPandasWithState(
        update_buffered if buffered else update,
        outputStructType=out_schema,
        stateStructType=buffered_state_schema if buffered else state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

def ewma_stream(
    events: DataFrame, alpha: float = 0.5, allowed_lateness_us: int = 0
) -> DataFrame:
    """Streaming EWMA (the incremental form of
    plans/queries_round5b.py::ewma_metric): emit each event's smoothed
    value as it arrives; the running average rides per-user state across
    micro-batches. This is the de-noising the reference's watchdog loop
    would apply to its per-minute CloudWatch health metric
    (`putmedia_check.sh:26-34`) before the `-gt 0` threshold
    (`restart.sh:57`) — incremental by nature, one double of state per key.

    Ordering contract (same two modes as ``scd2_status_stream``):

    * ``allowed_lateness_us = 0``: events sort WITHIN each micro-batch but
      fold in arrival order ACROSS batches — the emitted values equal the
      batch twin's only under per-key in-order delivery (Kinesis per
      partition key absent resharding; any by-time replay). An EWMA value,
      once emitted, is never retracted, so a late event would corrupt every
      subsequent smoothed value for that key — use the buffered mode when
      the source cannot guarantee per-key order.
    * ``allowed_lateness_us > 0``: a per-key reorder buffer
      (``_reorder_ready``, the strict-bounds contract of the SCD2 buffered
      step) delays each event's emission until the key's max seen ts
      strictly exceeds it by the lateness; events at most that late fold —
      and therefore emit — in correct (ts, event_id) order. Earlier-still
      events are dropped, like a watermark.

    Defaults match the batch twin (alpha = 0.5, exact binary fraction:
    ``0.5*y + 0.5*x`` in both engines' IEEE doubles); emission rounds to
    4 dp with the repo's portable floor-rounding while the recursion stays
    unrounded in state — exactly the twin's discipline."""
    import numpy as np

    def emit(user_id, folded):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(folded),
                "event_id": [eid for eid, _ in folded],
                "ewma": np.floor(
                    np.array([y for _, y in folded], dtype="float64") * 10000.0
                    + 0.5
                )
                / 10000.0,
            }
        )

    return _keyed_value_stream(
        events,
        restore=lambda t: None if t is None else t[0],
        persist=lambda y: (y,),
        fold=lambda y, rows: _ewma_fold(y, rows, alpha),
        emit=emit,
        scale=lambda values: values.tolist(),
        out_schema=_EWMA_OUT_SCHEMA,
        state_schema=_EWMA_STATE_SCHEMA,
        buffered_state_schema=_EWMA_STATE_SCHEMA_BUFFERED,
        allowed_lateness_us=allowed_lateness_us,
    )


def _scale_micro(values) -> list:
    """Portable double→micro-unit integer scaling for the stream folds:
    floor(v·10⁶ + 0.5) — the SAME IEEE steps as numeric.scaled_long on
    the batch side. ONE definition shared by every detector stream job:
    the scaling rule is the cross-engine parity anchor, so a drift
    between jobs would silently break exactly one batch==stream equality.
    """
    import numpy as np

    return [
        int(x)
        for x in np.floor(
            np.asarray(values, dtype="float64") * 1000000.0 + 0.5
        ).astype("int64")
    ]


_ZSCORE_OUT_SCHEMA = (
    StructType()
    .add("user_id", "long")
    .add("event_id", "long")
    .add("value_micro", "long")
)
_ZSCORE_STATE_SCHEMA = StructType().add("window_vals", ArrayType(LongType()))
_ZSCORE_STATE_SCHEMA_BUFFERED = (
    StructType()
    .add("window_vals", ArrayType(LongType()))
    .add("frontier_us", "long")
    .add("buf_ts_us", ArrayType(LongType()))
    .add("buf_event_id", ArrayType(LongType()))
    .add("buf_value", ArrayType(LongType()))
)


def _zscore_fold(
    window_vals, rows, window_rows: int = 20, min_rows: int = 10, z: int = 3
):
    """Pure trailing-window z-test over (event_id, value_int) rows in fold
    order — the incremental form of operators/stats.py's
    ``rolling_zscore_flags``: append each value to the (≤ window_rows)-deep
    deque, then test the SAME cross-multiplied integer inequality
    (n·v − S)² > z²·(n·Q − S²) with Python's arbitrary-precision ints
    (exactly the batch side's DECIMAL(38,0) — no float ever). Returns
    (window_vals', flagged) where flagged is [(event_id, value_int)].
    Module-level so tests can drive it directly."""
    w = list(window_vals)
    flagged: list[tuple] = []
    for eid, v in rows:
        w.append(v)
        if len(w) > window_rows:
            w.pop(0)
        n = len(w)
        if n >= min_rows:
            s = sum(w)
            q = sum(x * x for x in w)
            dev = n * v - s
            if dev * dev > z * z * (n * q - s * s):
                flagged.append((eid, v))
    return w, flagged


def zscore_stream(
    events: DataFrame,
    allowed_lateness_us: int = 0,
    window_rows: int = 20,
    min_rows: int = 10,
    z: int = 3,
) -> DataFrame:
    """Streaming rolling-z-score anomaly flags (the incremental form of
    plans/queries_round5d.py::rolling_zscore_anomalies): emit an event the
    moment it deviates > z population-σ from its user's trailing window —
    the alerting shape the batch query only reports after the fact. State
    per key is the ≤ ``window_rows``-deep integer deque; arithmetic is the
    same all-integer inequality as the batch twin, so with per-key in-order
    delivery the emitted set is EXACTLY the batch twin's rows (pinned in
    tests/test_streaming.py across a multi-micro-batch drain).

    Ordering contract — same two modes as ``ewma_stream``/
    ``scd2_status_stream``: lateness = 0 sorts within each micro-batch and
    assumes per-key in-order delivery across batches (a flag, once
    emitted, is never retracted, and a late event shifts every subsequent
    window); lateness > 0 delays each event through the ``_reorder_ready``
    per-key reorder buffer so events at most that late fold in correct
    (ts, event_id) order.

    Values are scaled to integer micro-units with the SAME portable
    rounding as the batch side (floor(v·10⁶ + 0.5) — identical IEEE in
    numpy and Spark), so no float comparison anywhere."""
    def emit(user_id, flagged):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(flagged),
                "event_id": [eid for eid, _ in flagged],
                "value_micro": [v for _, v in flagged],
            }
        )

    return _keyed_value_stream(
        events,
        restore=lambda t: [] if t is None else list(t[0] or []),
        persist=lambda w: (w,),
        fold=lambda w, rows: _zscore_fold(w, rows, window_rows, min_rows, z),
        emit=emit,
        scale=_scale_micro,
        out_schema=_ZSCORE_OUT_SCHEMA,
        state_schema=_ZSCORE_STATE_SCHEMA,
        buffered_state_schema=_ZSCORE_STATE_SCHEMA_BUFFERED,
        allowed_lateness_us=allowed_lateness_us,
    )


_CUSUM_OUT_SCHEMA = (
    StructType()
    .add("user_id", "long")
    .add("event_id", "long")
    .add("direction", "string")
)
_CUSUM_STATE_SCHEMA = (
    StructType()
    .add("warmup", ArrayType(LongType()))
    .add("ref", "long")
    .add("sp", "long")
    .add("sm", "long")
)
_CUSUM_STATE_SCHEMA_BUFFERED = (
    StructType()
    .add("warmup", ArrayType(LongType()))
    .add("ref", "long")
    .add("sp", "long")
    .add("sm", "long")
    .add("frontier_us", "long")
    .add("buf_ts_us", ArrayType(LongType()))
    .add("buf_event_id", ArrayType(LongType()))
    .add("buf_value", ArrayType(LongType()))
)


def _cusum_step(warmup, ref, sp, sm, rows):
    """Pure incremental CUSUM over (event_id, value_int) rows — the
    streaming decomposition of plans/queries_round5e.py::cusum_fold:
    accumulate the first 20 values as the calibration buffer, derive
    (ref, κ=ref÷3, h=10κ) exactly once on the 20th, then run the
    two-sided reset-on-alarm recursion. Returns (warmup', ref', sp', sm',
    alarms) with alarms = [(event_id, direction)]. Fold order across
    calls must be the per-key (ts, event_id) order for batch equality."""
    warmup = list(warmup)
    alarms: list[tuple] = []
    for eid, v in rows:
        if ref is None:
            warmup.append(v)
            if len(warmup) == 20:
                ref = tdiv(sum(warmup), 20)
            continue
        kappa = tdiv(ref, 3)
        h = 10 * kappa
        sp = max(0, sp + v - ref - kappa)
        sm = max(0, sm + ref - v - kappa)
        if sp > h:
            alarms.append((eid, "up"))
            sp = 0
        if sm > h:
            alarms.append((eid, "down"))
            sm = 0
    return warmup, ref, sp, sm, alarms


def cusum_stream(
    events: DataFrame, allowed_lateness_us: int = 0
) -> DataFrame:
    """Streaming CUSUM changepoint alarms (the incremental form of
    plans/queries_round5e.py::cusum_changepoints): alarm the moment a
    sustained drift crosses the threshold instead of after a batch replay
    — this IS the reference watchdog's job (`restart.sh:68-158` escalates
    on sustained failure, not single blips), upgraded from a fixed `-gt 0`
    threshold to a self-calibrating sequential test. State per key:
    the ≤20-value calibration buffer, then three integers (ref, S⁺, S⁻).

    Same two ordering modes as ``ewma_stream``/``zscore_stream``; all
    arithmetic integer, so with per-key in-order delivery the emitted
    alarm set equals the batch twin's bit-for-bit (pinned in
    tests/test_streaming.py). Values scale through the same
    floor(v·10⁶ + 0.5) as the batch side."""
    def emit(user_id, alarms):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(alarms),
                "event_id": [eid for eid, _ in alarms],
                "direction": [d for _, d in alarms],
            }
        )

    def fold(st, rows):
        warmup, ref, sp, sm = st
        warmup, ref, sp, sm, alarms = _cusum_step(warmup, ref, sp, sm, rows)
        return (warmup, ref, sp, sm), alarms

    return _keyed_value_stream(
        events,
        restore=lambda t: (
            ([], None, 0, 0)
            if t is None
            else (list(t[0] or []), t[1], t[2], t[3])
        ),
        persist=lambda st: st,
        fold=fold,
        emit=emit,
        scale=_scale_micro,
        out_schema=_CUSUM_OUT_SCHEMA,
        state_schema=_CUSUM_STATE_SCHEMA,
        buffered_state_schema=_CUSUM_STATE_SCHEMA_BUFFERED,
        allowed_lateness_us=allowed_lateness_us,
    )


def cusum_stream_tws(events: DataFrame) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of :func:`cusum_stream`
    (unbuffered mode) — the EIGHTEENTH op on both stateful APIs. Same
    shared ``_cusum_step`` fold, same within-batch (ts, event_id) sort +
    micro scaling as ``_keyed_value_stream``'s unbuffered shell, no
    timers. GS ≡ TWS pinned on the same drain; the batch twin is the
    r10-green ``cusum_changepoints``."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class CusumProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("cusum", _CUSUM_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            got = self._state.get()
            if got is None:
                warmup, ref, sp, sm = [], None, 0, 0
            else:
                warmup, ref, sp, sm = list(got[0] or []), got[1], got[2], got[3]
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            batch = pd.concat(frames, ignore_index=True)
            batch = batch[batch["value"].notna()]
            batch = batch.sort_values(["ts", "event_id"])
            warmup, ref, sp, sm, alarms = _cusum_step(
                warmup,
                ref,
                sp,
                sm,
                list(zip(batch["event_id"].tolist(), _scale_micro(batch["value"]))),
            )
            self._state.update((warmup, ref, sp, sm))
            if alarms:
                yield pd.DataFrame(
                    {
                        "user_id": [int(user_id)] * len(alarms),
                        "event_id": [eid for eid, _ in alarms],
                        "direction": [d for _, d in alarms],
                    }
                )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=CusumProcessor(),
        outputStructType=_CUSUM_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


_SILENCE_OUT_SCHEMA = (
    StructType()
    .add("user_id", "long")
    .add("last_seen_us", "long")
    .add("silent_after_us", "long")
)
_SILENCE_STATE_SCHEMA = StructType().add("last_seen_us", "long")


def silence_alerts(
    events: DataFrame,
    silence_us: int = 300_000_000,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Silent-stream detection — alert when a key produces NO events for
    ``silence_us`` of event time. This is the reference watchdog's core
    failure signal inverted into push form: `check_wf.sh`/`restart.sh`
    POLL on a 300 s loop precisely because the absence of uploads is the
    thing to detect; an event-time timeout turns that poll into a state
    timer, so detection latency is the watermark delay rather than the
    poll period, and idle keys cost one (user_id, last_seen) row of state
    instead of a scheduled probe each.

    Mechanics: per key, state holds the max event-time seen; every update
    re-arms an EventTimeTimeout at ``last_seen + silence_us``. When the
    WATERMARK (driven by the whole stream's progress) passes that
    deadline, Spark invokes the function with ``hasTimedOut`` and no
    rows; the job emits one alert (user_id, last_seen_us, the deadline
    that expired) and clears the state — re-appearance later simply
    starts a fresh interval (the reference's recovery-reset,
    `restart.sh:94-96`). The deadline is clamped to just above the
    current watermark for keys that are ALREADY silent when first seen
    (setting a timeout at-or-before the watermark is an error).

    Scale: state is one long per key; timeouts batch-fire as the
    watermark advances — no per-key polling anywhere. Late events within
    the watermark simply refresh last_seen before the timer can fire."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            (last_us,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "last_seen_us": [last_us],
                    "silent_after_us": [last_us + silence_us],
                }
            )
            return
        last = state.get[0] if state.exists else None
        for pdf in pdfs:
            if not len(pdf):
                continue
            mx = int(pdf["ts"].astype("int64").max()) // 1000
            last = mx if last is None else max(last, mx)
        if last is not None:
            state.update((last,))
            deadline_ms = (last + silence_us) // 1000
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1))

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_SILENCE_OUT_SCHEMA,
            stateStructType=_SILENCE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def silence_alerts_tws(
    events: DataFrame,
    silence_us: int = 300_000_000,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of
    :func:`silence_alerts` — same absence-detection semantics on the
    forward-path stateful API, where EVENT-TIME TIMERS are first-class:
    each arrival refreshes the key's last-seen ValueState, deletes the
    previously armed timer (``listTimers``/``deleteTimer`` — capabilities
    the GroupState API lacks; there the re-arm is implicit), and registers
    a new one at last_seen + silence; ``handleExpiredTimer`` fires when
    the watermark passes the deadline, emits the alert, and clears the
    state so recovered keys cost nothing in the RocksDB store.

    Needs the RocksDB state-store provider and the ``protobuf`` package
    (state-server wire protocol), like :func:`watchdog_actions_tws`;
    :func:`silence_alerts` remains the portable form. Both share the
    semantics pinned by the applyInPandasWithState test (alert once per
    silent interval; data beats timeout; reset on re-appearance)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class SilenceProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._last = handle.getValueState(
                "last_seen", StructType().add("last_seen_us", "long")
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            held = self._last.get()
            last = held[0] if held is not None else None
            for pdf in rows:
                if not len(pdf):
                    continue
                mx = int(pdf["ts"].astype("int64").max()) // 1000
                last = mx if last is None else max(last, mx)
            if last is not None:
                self._last.update((last,))
                for t in self._handle.listTimers():
                    self._handle.deleteTimer(t)
                self._handle.registerTimer((last + silence_us) // 1000)
            yield from ()

        def handleExpiredTimer(
            self, key, timerValues, expiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            held = self._last.get()
            if held is not None:
                (last_us,) = held
                self._last.clear()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "last_seen_us": [last_us],
                        "silent_after_us": [last_us + silence_us],
                    }
                )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SilenceProcessor(),
            outputStructType=_SILENCE_OUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


# ---------------------------------------------------------------------------
# Stream-stream interval join (O-11's streaming form; r7 registration queue)
# ---------------------------------------------------------------------------

_FOLLOWUP_WITHIN_US = 4 * 3600 * 1_000_000


def followup_pairs_batch(
    events: DataFrame,
    trigger_type: str = "error",
    response_type: str = "purchase",
    within_us: int = _FOLLOWUP_WITHIN_US,
) -> DataFrame:
    """Batch twin of :func:`followup_join_stream`: every (trigger,
    response) event pair per user with the response inside
    ``(trigger_ts, trigger_ts + within_us]`` — the "did the user act
    after the failure" correlation the reference's operator would read
    off CloudWatch by hand (restart.sh reacts to the error signal; this
    measures what follows it). Emits ALL pairs (the deliberately
    order-free semantics a stream-stream inner join can reproduce
    incrementally; a first-response-only variant needs a per-trigger
    argmin, which streams only with another aggregation stage).

    Scale: an equi-join on user_id with the interval as a residual range
    predicate — shuffles both sides once on the key; per-key work is the
    per-user trigger×response product inside the window, bounded by the
    signal's own sparsity. 12/141/1466 pairs at sf0.001/0.01/0.1 with
    the 4 h default — non-degenerate at every SF."""
    t = events.filter(F.col("event_type") == trigger_type).select(
        "user_id",
        F.col("event_id").alias("trigger_event_id"),
        F.unix_micros("ts").alias("_t_us"),
    )
    r = events.filter(F.col("event_type") == response_type).select(
        F.col("user_id").alias("_r_user"),
        F.col("event_id").alias("response_event_id"),
        F.unix_micros("ts").alias("_r_us"),
    )
    return (
        t.join(
            r,
            (t["user_id"] == r["_r_user"])
            & (r["_r_us"] > t["_t_us"])
            & (r["_r_us"] <= t["_t_us"] + F.lit(within_us)),
        )
        .select(
            "user_id",
            "trigger_event_id",
            "response_event_id",
            (F.col("_r_us") - F.col("_t_us")).alias("lag_us"),
        )
    )


def followup_join_stream(
    events: DataFrame,
    trigger_type: str = "error",
    response_type: str = "purchase",
    within_us: int = _FOLLOWUP_WITHIN_US,
    watermark: str = "10 seconds",
) -> DataFrame:
    """STREAM-STREAM interval SELF-join (complementing
    correlate_probe_metric's two-stream form with the one-stream
    filtered-twice shape, and adding the executed-plan state-cleanup
    pin): both sides are unbounded, so Spark buffers each side's rows in
    state and the TIME-RANGE condition + watermarks are what bound it (triggers older than watermark − within can never
    match a future response and are evicted; responses older than the
    watermark likewise). An inner join emits pairs as soon as both sides
    have arrived — no watermark wait on the emission path, only on state
    cleanup — so a bounded drain produces exactly the batch twin's pair
    set (pinned in tests/test_streaming.py).

    The join condition must stay on the WATERMARKED event-time columns
    AND in a shape StreamingJoinHelper can analyze — ``t_ts + INTERVAL
    … MICROSECOND`` (TimeAdd of a literal interval). ``timestampadd(…)``
    or arithmetic over unix_micros() ints read identically but the state
    watermark extractor declines them ("Failed to extract state value
    watermark"), silently falling back to keep-forever join state — the
    100 TB failure mode this operator exists to avoid; the executed-plan
    pin in tests/test_streaming.py holds the analyzable shape in
    place."""
    t = (
        events.withWatermark("ts", watermark)
        .filter(F.col("event_type") == trigger_type)
        .select(
            "user_id",
            F.col("event_id").alias("trigger_event_id"),
            F.col("ts").alias("t_ts"),
        )
    )
    r = (
        events.withWatermark("ts", watermark)
        .filter(F.col("event_type") == response_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("response_event_id"),
            F.col("ts").alias("r_ts"),
        )
    )
    joined = t.join(
        r,
        F.expr(
            f"user_id = r_user AND r_ts > t_ts "
            f"AND r_ts <= t_ts + INTERVAL {within_us} MICROSECOND"
        ),
    )
    return joined.select(
        "user_id",
        "trigger_event_id",
        "response_event_id",
        (F.unix_micros("r_ts") - F.unix_micros("t_ts")).alias("lag_us"),
    )


def followup_outer_batch(
    events: DataFrame,
    trigger_type: str = "error",
    response_type: str = "purchase",
    within_us: int = _FOLLOWUP_WITHIN_US,
) -> DataFrame:
    """Batch twin of :func:`followup_outer_join_stream`: LEFT OUTER form
    of :func:`followup_pairs_batch` — every (trigger, response) pair per
    user with the response inside ``(t, t + within]``, PLUS one
    NULL-response row per trigger that has no response in its window
    (``response_event_id`` and ``lag_us`` NULL). The unmatched rows are
    the point: "error with no purchase following" is the absence signal
    on the JOIN path, complementing the silence detector's absence
    signal on the aggregation path.

    Scale: identical join shape to the inner twin (equi-join on user_id
    + residual range), just outer — unmatched triggers add ≤ |triggers|
    rows."""
    t = events.filter(F.col("event_type") == trigger_type).select(
        "user_id",
        F.col("event_id").alias("trigger_event_id"),
        F.unix_micros("ts").alias("_t_us"),
    )
    r = events.filter(F.col("event_type") == response_type).select(
        F.col("user_id").alias("_r_user"),
        F.col("event_id").alias("response_event_id"),
        F.unix_micros("ts").alias("_r_us"),
    )
    return (
        t.join(
            r,
            (t["user_id"] == r["_r_user"])
            & (r["_r_us"] > t["_t_us"])
            & (r["_r_us"] <= t["_t_us"] + F.lit(within_us)),
            "left_outer",
        )
        .select(
            "user_id",
            "trigger_event_id",
            "response_event_id",
            (F.col("_r_us") - F.col("_t_us")).alias("lag_us"),
        )
    )


def followup_outer_join_stream(
    events: DataFrame,
    trigger_type: str = "error",
    response_type: str = "purchase",
    within_us: int = _FOLLOWUP_WITHIN_US,
    watermark: str = "10 seconds",
) -> DataFrame:
    """STREAM-STREAM LEFT OUTER interval self-join — the state-expiry
    emission mechanism :func:`followup_join_stream` (inner) never
    exercises: matched pairs emit on arrival like the inner join, but an
    UNMATCHED trigger emits its NULL-response row only when the
    watermark passes ``t_ts + within`` and proves no response can still
    arrive — Spark's outer stream-stream join is exactly the
    watermark-finalization contract of the silence/session tiers applied
    to join state. Consequence (pinned, not a bug): a bounded drain
    leaves triggers within ``within`` of the final watermark PENDING —
    their no-response verdict is not yet provable — so drained output ==
    batch twin MINUS the trailing unprovable window (the unflushed-
    trailing-session contract; a spacer event far enough in the future
    flushes them, spacer-batch test).

    Same analyzable TimeAdd predicate shape as the inner form (the
    state-watermark extraction pin applies verbatim).

    Operational caveat (pinned): Catalyst pushes the event_type filters
    BELOW the EventTimeWatermark nodes, so each side's watermark tracks
    only ITS OWN type's max event time and the global mark is their
    MIN — a quiet period on EITHER type freezes the mark and delays
    every pending no-response verdict, even while other event types
    flow. The silence detector has the same property per key; here it
    is per SIDE. Deployments needing timely negatives on a sparse
    response type switch spark.sql.streaming.multipleWatermarkPolicy
    to max (documented Spark trade: max can drop late rows the min
    policy would keep)."""
    t = (
        events.withWatermark("ts", watermark)
        .filter(F.col("event_type") == trigger_type)
        .select(
            "user_id",
            F.col("event_id").alias("trigger_event_id"),
            F.col("ts").alias("t_ts"),
        )
    )
    r = (
        events.withWatermark("ts", watermark)
        .filter(F.col("event_type") == response_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("response_event_id"),
            F.col("ts").alias("r_ts"),
        )
    )
    joined = t.join(
        r,
        F.expr(
            f"user_id = r_user AND r_ts > t_ts "
            f"AND r_ts <= t_ts + INTERVAL {within_us} MICROSECOND"
        ),
        "left_outer",
    )
    return joined.select(
        "user_id",
        "trigger_event_id",
        "response_event_id",
        (F.unix_micros("r_ts") - F.unix_micros("t_ts")).alias("lag_us"),
    )


def seasonal_flags_stream(
    events: DataFrame,
    baseline: DataFrame,
    mad_mult: int = 4,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming application of a batch-learned seasonal baseline — the
    train-batch / score-stream split every production detector ends up
    with: `stats.seasonal_residual_flags` learns the per-(event_type,
    hour) median/MAD table offline (a broadcast-sized model), and this
    job flags live events against it with a stream-static join — no
    state at all, so throughput is scan-bound and the job restarts
    freely. The tradeoff vs the batch form is explicit: the stream
    scores against YESTERDAY's baseline (models update by swapping the
    static side at redeploy), while the batch twin's baseline includes
    the scored rows themselves; on identical inputs with the same
    baseline table the flag sets are identical (pinned in
    tests/test_streaming.py).

    ``baseline``: (event_type, season, med, mad) — the
    robust_center_spread output on a composite key; must be small
    enough to broadcast (|types × 24| rows here)."""
    vu = events.withWatermark("ts", watermark).select(
        "event_id",
        "user_id",
        "event_type",
        F.hour("ts").alias("season"),
        F.col("vu"),
    )
    from kinesis_stream_video_project_spark.operators.stats import (
        residual_outlier,
    )

    return (
        vu.join(F.broadcast(baseline), ["event_type", "season"])
        .filter(residual_outlier("vu", mad_mult))
        .select("event_id", "user_id", "event_type", "season", "vu", "med", "mad")
    )


# ---------------------------------------------------------------------------
# Streaming near-dup candidate detection (online MinHash-LSH; r7 queue)
# ---------------------------------------------------------------------------

_NEARDUP_OUT_SCHEMA = (
    StructType()
    .add("doc_a", "long")
    .add("doc_b", "long")
    .add("bucket", "long")
)
_NEARDUP_STATE_SCHEMA = (
    StructType()
    .add("ids", ArrayType(LongType()))
    .add("ts_us", ArrayType(LongType()))
)


def _neardup_banded(
    docs: DataFrame,
    n_hashes: int,
    n_bands: int,
    shingle_k: int,
    watermark: str,
) -> DataFrame:
    """Watermarked (doc_id, ts, bucket) rows — dedup.banded_bucket_keys
    (the ONE signature staging both stream forms and the equality test
    share) applied to the document stream."""
    from kinesis_stream_video_project_spark.operators.dedup import (
        banded_bucket_keys,
    )

    return banded_bucket_keys(
        docs.withWatermark("ts", watermark),
        extra_cols=("ts",),
        n_hashes=n_hashes,
        n_bands=n_bands,
        shingle_k=shingle_k,
    )


def _neardup_fold(
    members: "list[tuple[int, int]]",
    batch: "list[tuple[int, int]]",
    wm_us: int,
    horizon_us: int,
) -> "tuple[list[int], list[int], list[tuple[int, int]]]":
    """Pure per-bucket candidate fold shared by BOTH stateful APIs (and
    directly testable): ``members`` is the bucket's (id, ts_us) state,
    ``batch`` the new arrivals. Emits one (min, max) id pair per new doc
    × in-horizon member and returns the trimmed member list.

    Members are kept SORTED by (ts, id) — inserts use bisect, because
    late-but-valid rows (inside the watermark delay) arrive out of
    event-time order and a plain append would let the monotone trim
    pointer skip over an expired member hidden behind a newer one,
    emitting pairs past the horizon and making the output depend on
    micro-batch chunking (review finding, r6)."""
    import bisect

    out_a: list[int] = []
    out_b: list[int] = []
    batch = sorted(batch, key=lambda t: (t[1], t[0]))
    for doc_id, ts_us in batch:
        floor_us = max(ts_us, wm_us) - horizon_us
        cut = bisect.bisect_left(members, floor_us, key=lambda m: m[1])
        if cut:
            del members[:cut]
        for mid, _mts in members:
            if mid == doc_id:
                continue
            out_a.append(min(mid, doc_id))
            out_b.append(max(mid, doc_id))
        bisect.insort(members, (doc_id, ts_us), key=lambda m: (m[1], m[0]))
    return out_a, out_b, members


def near_dup_candidates_stream(
    docs: DataFrame,
    n_hashes: int = 24,
    n_bands: int = 6,
    shingle_k: int = 3,
    horizon_us: int = 24 * 3600 * 1_000_000,
    watermark: str = "10 seconds",
) -> DataFrame:
    """ONLINE MinHash-LSH: emit near-duplicate CANDIDATE pairs as
    documents arrive — the streaming form of the batch LSH tier's bucket
    self-join (operators/dedup.py::minhash_lsh_near_dups), for the
    ingest-time curation question "is this document a near-copy of
    something already in the last N hours of crawl" that a daily batch
    join answers a day too late. Signature defaults (24 hashes × 6
    bands) MATCH the batch tier's — a default call of both tiers sees
    the same collision curve, and n_hashes must divide n_bands evenly
    (enforced in banded_bucket_keys; 16/6 would silently discard four
    signature values and double the per-band false-collision rate).

    Plan: dedup.banded_bucket_keys — the SAME staging both stream forms
    and the equality test share — then per-(band, bucket) member state:
    a new arrival emits one pair per in-horizon member and joins the
    member list. Emitted pairs are CANDIDATES — exact-Jaccard
    verification joins token sets back in batch (the id-only pair
    discipline: state and shuffle carry 16-byte ids, never token sets);
    the same pair can surface from several bands, deduped downstream
    with the verification join exactly like the batch tier's distinct.

    State bound: members older than ``horizon_us`` of event time are
    trimmed on every update (the crawl-window semantics — a candidate
    against a year-old document is the BATCH tier's job), so each
    bucket's state is the bucket's arrival rate × horizon, and idle
    buckets clear fully via EventTimeTimeout one horizon after their
    newest member."""
    banded = _neardup_banded(docs, n_hashes, n_bands, shingle_k, watermark)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ids, tss = state.get
            members = list(zip(ids, tss))
        else:
            members = []
        batch: list[tuple[int, int]] = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            ids = pdf["doc_id"].astype("int64")
            tss = pdf["ts"].astype("int64") // 1000  # ns → µs, vectorized
            batch.extend(zip(ids.tolist(), tss.tolist()))
        wm_us = state.getCurrentWatermarkMs() * 1000
        out_a, out_b, members = _neardup_fold(
            members, batch, wm_us, horizon_us
        )
        if members:
            state.update(
                ([m[0] for m in members], [m[1] for m in members])
            )
            newest_ms = max(m[1] for m in members) // 1000
            state.setTimeoutTimestamp(
                max(newest_ms + horizon_us // 1000, state.getCurrentWatermarkMs() + 1)
            )
        if out_a:
            yield pd.DataFrame(
                {
                    "doc_a": out_a,
                    "doc_b": out_b,
                    "bucket": [int(bucket)] * len(out_a),
                }
            )

    return banded.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=_NEARDUP_OUT_SCHEMA,
        stateStructType=_NEARDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def near_dup_candidates_stream_tws(
    docs: DataFrame,
    n_hashes: int = 24,
    n_bands: int = 6,
    shingle_k: int = 3,
    horizon_us: int = 24 * 3600 * 1_000_000,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of
    :func:`near_dup_candidates_stream` — the third op carried on BOTH
    stateful APIs (watchdog, silence detector, now online LSH), pinned
    to emit the identical candidate pair set on the same drain. Both
    the signature staging (dedup.banded_bucket_keys) and the per-bucket
    fold (_neardup_fold, with the sorted-member late-arrival handling)
    are the SHARED implementations — only the state/timer plumbing
    differs (ValueState + explicit registerTimer/deleteTimer vs
    GroupState's EventTimeTimeout). Needs RocksDB + protobuf like the
    other TWS forms; the applyInPandasWithState form is the portable
    one."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    banded = _neardup_banded(docs, n_hashes, n_bands, shingle_k, watermark)

    class NearDupProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._members = handle.getValueState(
                "members", _NEARDUP_STATE_SCHEMA
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (bucket,) = key
            held = self._members.get()
            members = list(zip(held[0], held[1])) if held is not None else []
            batch: list[tuple[int, int]] = []
            for pdf in rows:
                if not len(pdf):
                    continue
                ids = pdf["doc_id"].astype("int64")
                tss = pdf["ts"].astype("int64") // 1000
                batch.extend(zip(ids.tolist(), tss.tolist()))
            wm_us = timerValues.getCurrentWatermarkInMs() * 1000
            out_a, out_b, members = _neardup_fold(
                members, batch, wm_us, horizon_us
            )
            if members:
                self._members.update(
                    ([m[0] for m in members], [m[1] for m in members])
                )
                for t in self._handle.listTimers():
                    self._handle.deleteTimer(t)
                newest_ms = max(m[1] for m in members) // 1000
                self._handle.registerTimer(
                    max(
                        newest_ms + horizon_us // 1000,
                        timerValues.getCurrentWatermarkInMs() + 1,
                    )
                )
            if out_a:
                yield pd.DataFrame(
                    {
                        "doc_a": out_a,
                        "doc_b": out_b,
                        "bucket": [int(bucket)] * len(out_a),
                    }
                )

        def handleExpiredTimer(
            self, key, timerValues, expiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            self._members.clear()
            yield from ()

        def close(self) -> None:
            pass

    return banded.groupBy("bucket").transformWithStateInPandas(
        statefulProcessor=NearDupProcessor(),
        outputStructType=_NEARDUP_OUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


# ---------------------------------------------------------------------------
# Online funnel progression (the streaming twin of operators/funnel.py)
# ---------------------------------------------------------------------------

_FUNNEL_OUT_SCHEMA = "user_id bigint, step_no bigint, step string, ts_us bigint"
_FUNNEL_STATE_SCHEMA = "stage bigint, t_prev bigint"


def _funnel_fold(
    stage: int,
    t_prev: int,
    steps: list,
    horizon_us,
    rows: list,
) -> tuple:
    """Pure per-user funnel step shared by BOTH stateful API forms:
    ``rows`` is [(ts_us, event_type)] ALREADY sorted by (ts, event_id);
    returns (stage', t_prev', emits) with one emit per stage advance.
    Greedy-earliest is exactly the batch operator's min(ts > t_prev)
    when rows arrive in event-time order: the first qualifying event of
    the awaited type IS the minimum. Strict > on ties and the per-step
    horizon mirror operators/funnel.py::funnel_counts verbatim."""
    emits = []
    for ts, etype in rows:
        if stage >= len(steps) or etype != steps[stage]:
            continue
        if stage > 0:
            if ts <= t_prev:
                continue
            if horizon_us is not None and ts > t_prev + horizon_us:
                continue
        stage += 1
        t_prev = ts
        emits.append((stage, steps[stage - 1], ts))
    return stage, t_prev, emits


def funnel_stage_stream(
    events: DataFrame,
    steps: list,
    step_horizon_s: int | None = None,
) -> DataFrame:
    """ONLINE ordered-funnel progression: emit ``(user_id, step_no,
    step, ts_us)`` the moment a user ADVANCES a funnel stage — the
    streaming form of :func:`operators.funnel.funnel_counts` (the batch
    report is the per-stage distinct-user count of these advance events,
    pinned in tests). The product question it answers in real time is
    "who just converted", which the daily batch funnel answers a day
    late.

    Ordering contract: advances are exact (identical to the batch
    greedy-earliest matching) when each user's events ARRIVE in
    event-time order across micro-batches — the guarantee a
    user-id-partition-keyed Kinesis stream provides per shard
    (sources.py decode path). Within a micro-batch, rows are sorted by
    (ts, event_id) before the fold, so intra-batch disorder is
    absorbed; a CROSS-batch straggler older than the user's matched
    frontier is ignored by the strict ts > t_prev guard rather than
    retroactively re-matching (re-matching would retract emitted rows —
    an update-mode semantics; this job is append-mode by design).

    State bound: two BIGINTs per user, forever (a completed funnel must
    STAY completed — clearing state would restart the funnel and
    re-emit on the user's next event). |users|·16 B is the floor for
    any per-user lifetime funnel; no timer, NoTimeout."""
    horizon_us = None if step_horizon_s is None else step_horizon_s * 1_000_000
    steps = list(steps)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        stage, t_prev = state.get if state.exists else (0, 0)
        frames = [p for p in pdfs if len(p)]
        if frames:
            batch = pd.concat(frames, ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"])
            rows = list(
                zip(
                    (batch["ts"].astype("int64") // 1000).tolist(),
                    batch["event_type"].tolist(),
                )
            )
            stage, t_prev, emits = _funnel_fold(
                stage, t_prev, steps, horizon_us, rows
            )
            state.update((stage, t_prev))
            if emits:
                yield pd.DataFrame(
                    {
                        "user_id": [int(user_id)] * len(emits),
                        "step_no": [e[0] for e in emits],
                        "step": [e[1] for e in emits],
                        "ts_us": [e[2] for e in emits],
                    }
                )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_FUNNEL_OUT_SCHEMA,
        stateStructType=_FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_stage_stream_tws(
    events: DataFrame,
    steps: list,
    step_horizon_s: int | None = None,
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of
    :func:`funnel_stage_stream` — the fourth op carried on BOTH stateful
    APIs (watchdog, silence detector, online LSH, now the funnel),
    pinned to emit the identical advance set on the same drain. The
    per-user fold is the SHARED :func:`_funnel_fold`; only the state
    plumbing differs (ValueState vs GroupState). ProcessingTime
    timeMode with no timers — the funnel keys no decisions off the
    watermark, so the twin stays drain-order agnostic like the GS
    form."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    horizon_us = None if step_horizon_s is None else step_horizon_s * 1_000_000
    steps_l = list(steps)

    class FunnelProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("funnel", _FUNNEL_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            held = self._state.get()
            stage, t_prev = held if held is not None else (0, 0)
            frames = [p for p in rows if len(p)]
            if frames:
                batch = pd.concat(frames, ignore_index=True)
                batch = batch.sort_values(["ts", "event_id"])
                rws = list(
                    zip(
                        (batch["ts"].astype("int64") // 1000).tolist(),
                        batch["event_type"].tolist(),
                    )
                )
                stage, t_prev, emits = _funnel_fold(
                    stage, t_prev, steps_l, horizon_us, rws
                )
                self._state.update((stage, t_prev))
                if emits:
                    yield pd.DataFrame(
                        {
                            "user_id": [int(user_id)] * len(emits),
                            "step_no": [e[0] for e in emits],
                            "step": [e[1] for e in emits],
                            "ts_us": [e[2] for e in emits],
                        }
                    )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=FunnelProcessor(),
        outputStructType=_FUNNEL_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters (Space-Saving sketch, sharded by key hash)
# ---------------------------------------------------------------------------

_HH_OUT_SCHEMA = (
    "shard int, seq bigint, key string, count_hi bigint, count_lo bigint"
)
_HH_STATE_SCHEMA = (
    "seq bigint, keys array<string>, counts array<long>, errs array<long>"
)


def _spacesaving_fold(
    keys: list, counts: list, errs: list, rows: list, capacity: int
) -> tuple:
    """Pure Space-Saving step (Metwally/Agrawal/El Abbadi 2005) shared
    by BOTH stateful API forms: fold ``rows`` (key strings, ALREADY in
    (ts, event_id) order) into the bounded counter table. A full table
    evicts the minimum-count entry — ties broken by key string, so the
    fold is a deterministic function of the arrival order — and the
    newcomer inherits its count as both count and error (the classic
    over-estimate bookkeeping: true count ∈ [count − err, count]).
    Returns (keys', counts', errs') with entries key-sorted (state
    order is part of the deterministic contract)."""
    d = {k: (c, e) for k, c, e in zip(keys, counts, errs)}
    for k in rows:
        if k in d:
            c, e = d[k]
            d[k] = (c + 1, e)
        elif len(d) < capacity:
            d[k] = (1, 0)
        else:
            mk = min(d, key=lambda x: (d[x][0], x))
            mc, _ = d.pop(mk)
            d[k] = (mc + 1, mc)
    items = sorted(d.items())
    return (
        [k for k, _ in items],
        [v[0] for _, v in items],
        [v[1] for _, v in items],
    )


def _hh_batch_keys(pdfs, key_col: str) -> list:
    """Concatenate a trigger's Arrow chunks and return the key strings
    in (ts, event_id) order — the same intra-batch disorder absorption
    as the funnel stream; across time-ordered batches the concatenated
    order equals the global (ts, event_id) order, making the drain
    chunking-invariant for in-order feeds."""
    frames = [p for p in pdfs if len(p)]
    if not frames:
        return []
    batch = pd.concat(frames, ignore_index=True)
    batch = batch.sort_values(["ts", "event_id"])
    return [str(k) for k in batch[key_col].tolist()]


def heavy_hitters_stream(
    events: DataFrame,
    key_col: str = "user_id",
    capacity: int = 64,
    shards: int = 4,
) -> DataFrame:
    """ONLINE heavy hitters: per hash-shard Space-Saving counter tables
    over ``key_col``, memory bounded by ``shards·capacity`` entries
    however many distinct keys the stream carries — the batch
    `heavy_hitters_claim`'s streaming form (freqItems is the same
    Misra-Gries family). After each trigger a shard emits its FULL
    sketch snapshot stamped with a shard-local ``seq`` (append mode
    cannot retract, so consumers read the max-seq snapshot per shard —
    stated, not implied). Guarantee (per shard, any drain): every key
    with true count > N_shard/capacity is present, and true count ∈
    [count_lo, count_hi] for every surviving entry.

    Sharding keys the state by hash(key) mod shards, so ALL occurrences
    of one key land in one shard — each shard's sketch sees its keys'
    exact arrival stream and the per-shard guarantee composes over the
    union. State: capacity-bounded parallel arrays per shard."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        seq, keys, counts, errs = (
            state.get if state.exists else (0, [], [], [])
        )
        rows = _hh_batch_keys(pdfs, key_col)
        if not rows:
            return
        keys, counts, errs = _spacesaving_fold(
            list(keys or []), list(counts or []), list(errs or []),
            rows, capacity,
        )
        seq += 1
        state.update((seq, keys, counts, errs))
        yield pd.DataFrame(
            {
                "shard": [int(shard)] * len(keys),
                "seq": [seq] * len(keys),
                "key": keys,
                "count_hi": counts,
                "count_lo": [c - e for c, e in zip(counts, errs)],
            }
        )

    sharded = events.withColumn(
        "_shard", F.pmod(F.hash(F.col(key_col)), F.lit(shards)).cast("int")
    )
    return sharded.groupBy("_shard").applyInPandasWithState(
        update,
        outputStructType=_HH_OUT_SCHEMA,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_stream_tws(
    events: DataFrame,
    key_col: str = "user_id",
    capacity: int = 64,
    shards: int = 4,
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of
    :func:`heavy_hitters_stream` — the sixth op carried on BOTH
    stateful APIs, pinned to emit identical snapshots on the same
    drain. Shared fold and batch-ordering helpers; only the state
    plumbing differs."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class HHProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("sketch", _HH_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (shard,) = key
            held = self._state.get()
            seq, keys, counts, errs = held if held is not None else (0, [], [], [])
            rws = _hh_batch_keys(rows, key_col)
            if not rws:
                return
            keys, counts, errs = _spacesaving_fold(
                list(keys or []), list(counts or []), list(errs or []),
                rws, capacity,
            )
            seq += 1
            self._state.update((seq, keys, counts, errs))
            yield pd.DataFrame(
                {
                    "shard": [int(shard)] * len(keys),
                    "seq": [seq] * len(keys),
                    "key": keys,
                    "count_hi": counts,
                    "count_lo": [c - e for c, e in zip(counts, errs)],
                }
            )

        def close(self) -> None:
            pass

    sharded = events.withColumn(
        "_shard", F.pmod(F.hash(F.col(key_col)), F.lit(shards)).cast("int")
    )
    return sharded.groupBy("_shard").transformWithStateInPandas(
        statefulProcessor=HHProcessor(),
        outputStructType=_HH_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


_RATELIMIT_OUT_SCHEMA = (
    StructType()
    .add("user_id", "long")
    .add("ts_us", "long")
    .add("event_id", "long")
    .add("admitted", "boolean")
    .add("tokens_us_after", "long")
)
_RATELIMIT_STATE_SCHEMA = (
    StructType().add("tokens_us", "long").add("last_us", "long")
)


def rate_limit_stream(
    events: DataFrame,
    refill_tokens: int = 1,
    per_seconds: int = 14400,
    capacity_tokens: int = 2,
    cost_tokens: int = 1,
) -> DataFrame:
    """ONLINE per-key token-bucket admission: emit ``(user_id, ts_us,
    event_id, admitted, tokens_us_after)`` for every arriving event —
    the seventh op carried on BOTH stateful APIs. The fold is
    ``operators.ratelimit.token_bucket_fold`` verbatim (all-integer
    token-µs arithmetic; see its module doc for the semantics and the
    full-bucket cold-start contract), so the online decisions equal the
    batch replay's when each key's events arrive in event-time order;
    intra-batch disorder is absorbed by the (ts, event_id) sort, and a
    cross-batch straggler older than last_us refills NEGATIVELY — the
    fold clamps nothing there by design, so feed in-order streams (the
    per-shard Kinesis guarantee) or front a reorder buffer.

    State: two BIGINTs per key, NoTimeout (a limiter must remember its
    bucket as long as the key lives; 16 B/key is the floor)."""
    from kinesis_stream_video_project_spark.operators.ratelimit import (
        token_bucket_fold,
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        tokens_us, last_us = state.get if state.exists else (0, -1)
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        batch = pd.concat(frames, ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        rows = list(
            zip(
                (batch["ts"].astype("int64") // 1000).tolist(),
                batch["event_id"].astype("int64").tolist(),
            )
        )
        tokens_us, last_us, emits = token_bucket_fold(
            tokens_us, last_us, rows, refill_tokens, per_seconds,
            capacity_tokens, cost_tokens,
        )
        state.update((int(tokens_us), int(last_us)))
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)] * len(emits),
                "ts_us": [e[0] for e in emits],
                "event_id": [e[1] for e in emits],
                "admitted": [e[2] for e in emits],
                "tokens_us_after": [e[3] for e in emits],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_RATELIMIT_OUT_SCHEMA,
        stateStructType=_RATELIMIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rate_limit_stream_tws(
    events: DataFrame,
    refill_tokens: int = 1,
    per_seconds: int = 14400,
    capacity_tokens: int = 2,
    cost_tokens: int = 1,
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of
    :func:`rate_limit_stream` — shared fold, only the state plumbing
    differs; decision-set equality is pytest-pinned on the same
    drain."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    from kinesis_stream_video_project_spark.operators.ratelimit import (
        token_bucket_fold,
    )

    class RateLimitProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "bucket", _RATELIMIT_STATE_SCHEMA
            )

        def handleInputRows(
            self, key, rows, timerValues
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            held = self._state.get()
            tokens_us, last_us = held if held is not None else (0, -1)
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            batch = pd.concat(frames, ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"])
            rws = list(
                zip(
                    (batch["ts"].astype("int64") // 1000).tolist(),
                    batch["event_id"].astype("int64").tolist(),
                )
            )
            tokens_us, last_us, emits = token_bucket_fold(
                tokens_us,
                last_us,
                rws,
                refill_tokens,
                per_seconds,
                capacity_tokens,
                cost_tokens,
            )
            self._state.update((int(tokens_us), int(last_us)))
            yield pd.DataFrame(
                {
                    "user_id": [int(user_id)] * len(emits),
                    "ts_us": [e[0] for e in emits],
                    "event_id": [e[1] for e in emits],
                    "admitted": [e[2] for e in emits],
                    "tokens_us_after": [e[3] for e in emits],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RateLimitProcessor(),
        outputStructType=_RATELIMIT_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online sessionization (the streaming twin of the gap-based session report)
# ---------------------------------------------------------------------------

_SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint"
)
_SESSION_STATE_SCHEMA = "start_us bigint, end_us bigint, n_events bigint"


def _session_fold(
    start_us,
    end_us,
    n_events: int,
    gap_us: int,
    rows: list,
) -> tuple:
    """Pure per-user sessionization step shared by BOTH stateful API
    forms: ``rows`` is a list of event-time µs ALREADY sorted ascending;
    returns ``(start', end', n', emits)`` with one emit per CLOSED
    session (a session closes when the next event's gap exceeds
    ``gap_us``). Matches the batch gaps-and-islands definition exactly
    for in-order feeds: island boundaries are precisely the > gap_us
    jumps. A cross-batch straggler no older than the open session's
    last event minus the gap is ABSORBED into the open session (n_events
    grows; start/end only extend forward), so bounded disorder within
    one session widens nothing; an older straggler would belong to an
    already-closed session and is counted into the OPEN one instead —
    the append-mode no-retraction contract (funnel discipline)."""
    emits = []
    for ts in rows:
        if start_us is None:
            start_us, end_us, n_events = ts, ts, 1
        elif ts - end_us > gap_us:
            emits.append((start_us, end_us, n_events))
            start_us, end_us, n_events = ts, ts, 1
        else:
            end_us = max(end_us, ts)
            n_events += 1
    return start_us, end_us, n_events, emits


def session_stream(
    events: DataFrame,
    gap_s: int = 1800,
    watermark: str = "10 seconds",
) -> DataFrame:
    """ONLINE gap-based sessionization: emit ``(user_id,
    session_start_us, session_end_us, n_events)`` for every CLOSED
    session — closed either by the user's next event arriving after the
    gap, or by the event-time TIMER when the watermark passes
    ``last_event + gap`` (the idle flush; without it the last session of
    a departed user never emits). The batch twin is the gaps-and-islands
    session report (plans/queries_windows.py::session_windows
    discipline); the streaming form answers "which sessions just ended"
    at watermark latency instead of at the nightly batch.

    Mechanics: state is ``(start_us, end_us, n_events)`` — 24 B per
    ACTIVE user only, because the timer flush clears state (unlike the
    funnel's lifetime state; an idle user costs nothing). Each update
    folds the sorted batch through the shared :func:`_session_fold`,
    emits closed sessions, re-arms an EventTimeTimeout at
    ``end + gap`` (clamped above the current watermark, the
    silence_alerts rule). Data beats timeout: an event inside the gap
    re-arms before the timer can fire."""
    gap_us = gap_s * 1_000_000

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n_events = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [int(user_id)],
                    "session_start_us": [start_us],
                    "session_end_us": [end_us],
                    "n_events": [n_events],
                }
            )
            return
        start_us, end_us, n_events = (
            state.get if state.exists else (None, None, 0)
        )
        frames = [p for p in pdfs if len(p)]
        if frames:
            batch = pd.concat(frames, ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"])
            rows = (batch["ts"].astype("int64") // 1000).tolist()
            start_us, end_us, n_events, emits = _session_fold(
                start_us, end_us, n_events, gap_us, rows
            )
            state.update((start_us, end_us, n_events))
            deadline_ms = (end_us + gap_us) // 1000
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1))
            if emits:
                yield pd.DataFrame(
                    {
                        "user_id": [int(user_id)] * len(emits),
                        "session_start_us": [e[0] for e in emits],
                        "session_end_us": [e[1] for e in emits],
                        "n_events": [e[2] for e in emits],
                    }
                )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def session_stream_tws(
    events: DataFrame,
    gap_s: int = 1800,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of
    :func:`session_stream` — the EIGHTH op carried on BOTH stateful APIs
    (watchdog, silence, online LSH, funnel, heavy hitters, rate limiter,
    seasonal scorer's stateless join aside). Same shared
    :func:`_session_fold`; the idle flush uses a real event-time timer
    (re-armed per arrival via listTimers/deleteTimer, fired by the
    watermark in ``handleExpiredTimer``), and the flush clears both the
    ValueState and the timer so departed users cost nothing in RocksDB.
    Needs the protobuf state-server runtime like every tws form;
    :func:`session_stream` remains the portable twin, equality pinned on
    the same drain in tests."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    gap_us = gap_s * 1_000_000

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState("session", _SESSION_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            held = self._sess.get()
            start_us, end_us, n_events = held if held is not None else (None, None, 0)
            frames = [p for p in rows if len(p)]
            if frames:
                batch = pd.concat(frames, ignore_index=True)
                batch = batch.sort_values(["ts", "event_id"])
                rws = (batch["ts"].astype("int64") // 1000).tolist()
                start_us, end_us, n_events, emits = _session_fold(
                    start_us, end_us, n_events, gap_us, rws
                )
                self._sess.update((start_us, end_us, n_events))
                for t in self._handle.listTimers():
                    self._handle.deleteTimer(t)
                self._handle.registerTimer((end_us + gap_us) // 1000)
                if emits:
                    yield pd.DataFrame(
                        {
                            "user_id": [int(user_id)] * len(emits),
                            "session_start_us": [e[0] for e in emits],
                            "session_end_us": [e[1] for e in emits],
                            "n_events": [e[2] for e in emits],
                        }
                    )

        def handleExpiredTimer(
            self, key, timerValues, expiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            held = self._sess.get()
            if held is not None:
                start_us, end_us, n_events = held
                self._sess.clear()
                yield pd.DataFrame(
                    {
                        "user_id": [int(user_id)],
                        "session_start_us": [start_us],
                        "session_end_us": [end_us],
                        "n_events": [n_events],
                    }
                )

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionProcessor(),
            outputStructType=_SESSION_OUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


# ---------------------------------------------------------------------------
# Online KMV distinct sketch (bottom-k minimum hash values, per key)
# ---------------------------------------------------------------------------

_KMV_OUT_SCHEMA = (
    "event_type string, seq bigint, n_hashes bigint, kth_rank bigint, "
    "kmv_est bigint"
)
_KMV_STATE_SCHEMA = "seq bigint, ranks array<long>"

_KMV_RANK_DOMAIN = 1 << 48


def _kmv_fold(held: list, new_ranks: list, k: int) -> tuple:
    """Pure per-key KMV step shared by BOTH stateful API forms: merge the
    batch's ranks into the held bottom-k set. Returns
    ``(merged, changed)``. The fold is a SET operation — union then
    truncate to the k smallest — so it is order-insensitive and
    chunking-invariant by construction (bottom-k of a union equals
    bottom-k of bottom-k's; the batch mergeability law pinned in
    tests/test_r11_queue.py), the strongest disorder story of the
    repo's nine dual-API ops: unlike the session/funnel folds it needs
    no in-order feed at all."""
    merged = sorted(set(held) | set(new_ranks))[:k]
    return merged, merged != list(held)


def _kmv_emit(key: str, seq: int, ranks: list, k: int) -> "pd.DataFrame":
    n = len(ranks)
    est = n if n < k else (k - 1) * _KMV_RANK_DOMAIN // ranks[-1]
    return pd.DataFrame(
        {
            "event_type": [key],
            "seq": [seq],
            "n_hashes": [n],
            "kth_rank": [ranks[-1] if n else None],
            "kmv_est": [est],
        }
    )


def kmv_stream(
    events: DataFrame, key_col: str = "event_type", k: int = 32
) -> DataFrame:
    """ONLINE distinct-count sketch: per ``key_col``, maintain the k
    smallest 48-bit md5 ranks of the values seen so far (the KMV
    sketch — Bar-Yossef et al. 2002; operators/kmv.py is the batch
    twin) and emit ``(key, seq, n_hashes, kth_rank, kmv_est)`` whenever
    a batch CHANGES the sketch. The max-seq row per key is the current
    cardinality estimate; the drained final row equals the batch
    ``kmv_distinct_estimates`` sketch fields exactly (pinned — the
    set-fold is order-insensitive, so the stream/batch equality needs
    no in-order feed, unlike the session twin).

    State is ≤ k BIGINT ranks + a seq per ACTIVE key — fixed memory
    regardless of value cardinality, the entire point of the sketch.
    The rank column is computed JVM-side before the shuffle
    (``operators/kmv.kmv_rank`` — callers pass the pre-ranked frame or
    raw events with a ``user_id``; this wrapper ranks ``user_id``).
    NoTimeout/ProcessingTime: nothing expires — a distinct count only
    grows, so there is no idle-flush semantics to key off the
    watermark."""
    from kinesis_stream_video_project_spark.operators.kmv import kmv_rank

    ranked = events.select(
        F.col(key_col), kmv_rank(F.col("user_id")).alias("rank")
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        seq, held = state.get if state.exists else (0, [])
        frames = [p for p in pdfs if len(p)]
        new_ranks = (
            pd.concat(frames, ignore_index=True)["rank"].tolist()
            if frames
            else []
        )
        merged, changed = _kmv_fold(list(held), new_ranks, k)
        if changed:
            seq += 1
            state.update((seq, merged))
            yield _kmv_emit(str(key_val), seq, merged, k)

    return ranked.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_KMV_OUT_SCHEMA,
        stateStructType=_KMV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def kmv_stream_tws(
    events: DataFrame, key_col: str = "event_type", k: int = 32
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of :func:`kmv_stream`
    — the NINTH op carried on BOTH stateful APIs. Same shared
    :func:`_kmv_fold`; ProcessingTime timeMode with no timers (the
    sketch never expires). GS ≡ TWS equality pinned on the same drain
    in tests."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    from kinesis_stream_video_project_spark.operators.kmv import kmv_rank

    ranked = events.select(
        F.col(key_col), kmv_rank(F.col("user_id")).alias("rank")
    )

    class KmvProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("kmv", _KMV_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (key_val,) = key
            held_row = self._state.get()
            seq, held = held_row if held_row is not None else (0, [])
            frames = [p for p in rows if len(p)]
            new_ranks = (
                pd.concat(frames, ignore_index=True)["rank"].tolist()
                if frames
                else []
            )
            merged, changed = _kmv_fold(list(held), new_ranks, k)
            if changed:
                seq += 1
                self._state.update((seq, merged))
                yield _kmv_emit(str(key_val), seq, merged, k)

        def close(self) -> None:
            pass

    return ranked.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=KmvProcessor(),
        outputStructType=_KMV_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online DDSketch quantiles (log-bucket counter state, per key)
# ---------------------------------------------------------------------------

_DD_OUT_SCHEMA = (
    "event_type string, seq bigint, q_permille bigint, n bigint, dd_est bigint"
)
_DD_STATE_SCHEMA = "seq bigint, buckets array<int>, counts array<long>"


def _dd_fold(buckets: list, counts: list, new_buckets: list) -> tuple:
    """Pure per-key DDSketch step shared by BOTH stateful API forms:
    add one count per arriving bucket index. A counter fold is
    commutative — chunking- and order-invariant by construction, like
    the KMV set fold (and unlike the session fold's in-order feed).
    Returns (buckets', counts', changed) with buckets sorted (state
    order is part of the deterministic contract)."""
    d = dict(zip(buckets, counts))
    for b in new_buckets:
        d[b] = d.get(b, 0) + 1
    items = sorted(d.items())
    return (
        [b for b, _ in items],
        [c for _, c in items],
        bool(new_buckets),
    )


def _dd_quantile_walk(buckets: list, counts: list, q_permille: int) -> tuple:
    """The γ=2 quantile walk of operators/ddsketch.py::dd_quantiles as a
    pure function over the sorted sketch state: returns (n, est)."""
    n = sum(counts)
    rank = (q_permille * n + 999) // 1000
    cum = 0
    for b, c in zip(buckets, counts):
        cum += c
        if cum >= rank:
            return n, (1 if b == 0 else 3 << (b - 1))
    return n, None


def dd_stream(
    events: DataFrame,
    key_col: str = "event_type",
    q_permille: tuple = (500, 900, 990),
) -> DataFrame:
    """ONLINE bounded-relative-error quantiles: per ``key_col``,
    maintain the γ=2 DDSketch bucket counters over the event value in
    scaled milli-units (operators/ddsketch.py is the batch twin) and
    emit ``(key, seq, q_permille, n, dd_est)`` rows per tracked
    quantile whenever a batch lands. The max-seq rows per key are the
    live quantile estimates; the drained final rows equal the batch
    ``dd_quantiles`` exactly (pinned — counter folds are
    order-insensitive, so stream/batch equality needs no in-order
    feed).

    State is the ~64-cell counter table + a seq per ACTIVE key — fixed
    memory regardless of value count or range, the DDSketch claim. The
    bucket index is computed JVM-side before the shuffle (bit-length
    of the scaled value), so the Python fold only increments counters.
    NoTimeout: quantiles never expire."""
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long
    from kinesis_stream_video_project_spark.operators.ddsketch import dd_bucket

    qs = list(q_permille)
    bucketed = events.select(
        F.col(key_col), dd_bucket(scaled_long(F.col("value"), 1000)).alias("bucket")
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        seq, buckets, counts = state.get if state.exists else (0, [], [])
        frames = [p for p in pdfs if len(p)]
        new_buckets = (
            pd.concat(frames, ignore_index=True)["bucket"].tolist()
            if frames
            else []
        )
        buckets, counts, changed = _dd_fold(
            list(buckets), list(counts), new_buckets
        )
        if changed:
            seq += 1
            state.update((seq, buckets, counts))
            walks = [_dd_quantile_walk(buckets, counts, q) for q in qs]
            yield pd.DataFrame(
                {
                    "event_type": [str(key_val)] * len(qs),
                    "seq": [seq] * len(qs),
                    "q_permille": qs,
                    "n": [w[0] for w in walks],
                    "dd_est": [w[1] for w in walks],
                }
            )

    return bucketed.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_DD_OUT_SCHEMA,
        stateStructType=_DD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dd_stream_tws(
    events: DataFrame,
    key_col: str = "event_type",
    q_permille: tuple = (500, 900, 990),
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of :func:`dd_stream`
    — the TENTH op carried on BOTH stateful APIs. Same shared
    :func:`_dd_fold` / :func:`_dd_quantile_walk`; no timers. GS ≡ TWS
    equality pinned on the same drain in tests."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    from kinesis_stream_video_project_spark.functions.numeric import scaled_long
    from kinesis_stream_video_project_spark.operators.ddsketch import dd_bucket

    qs = list(q_permille)
    bucketed = events.select(
        F.col(key_col), dd_bucket(scaled_long(F.col("value"), 1000)).alias("bucket")
    )

    class DdProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("dd", _DD_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (key_val,) = key
            held = self._state.get()
            seq, buckets, counts = held if held is not None else (0, [], [])
            frames = [p for p in rows if len(p)]
            new_buckets = (
                pd.concat(frames, ignore_index=True)["bucket"].tolist()
                if frames
                else []
            )
            buckets, counts, changed = _dd_fold(
                list(buckets), list(counts), new_buckets
            )
            if changed:
                seq += 1
                self._state.update((seq, buckets, counts))
                walks = [_dd_quantile_walk(buckets, counts, q) for q in qs]
                yield pd.DataFrame(
                    {
                        "event_type": [str(key_val)] * len(qs),
                        "seq": [seq] * len(qs),
                        "q_permille": qs,
                        "n": [w[0] for w in walks],
                        "dd_est": [w[1] for w in walks],
                    }
                )

        def close(self) -> None:
            pass

    return bucketed.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=DdProcessor(),
        outputStructType=_DD_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online CDC changelog compaction (latest-wins upsert state, per key)
# ---------------------------------------------------------------------------

_CDC_OUT_SCHEMA = (
    "key bigint, emit_seq bigint, op string, payload string"
)
_CDC_STATE_SCHEMA = "best_ord bigint, op string, payload string, emit_seq bigint"


def _cdc_fold(best_ord, op, payload, rows) -> tuple:
    """Pure per-key latest-wins step shared by BOTH stateful API forms:
    ``rows`` is (ord, op, payload) triples in ANY order (the ordering
    key ``seq*4 + op_rank`` is total per the batch contract), so the
    fold is a plain max — commutative and chunking-invariant like the
    KMV set fold. An arrival whose ord EQUALS the held best is DROPPED:
    online, an equal-ord row is indistinguishable from an at-least-once
    redelivery, so the stream tolerates replays idempotently where the
    batch audit (operators/cdc.py) refuses the ambiguity outright —
    the two contracts are stated, not implied. Returns
    ``(best_ord', op', payload', changed)``."""
    changed = False
    for o, p_op, p in rows:
        if best_ord is None or o > best_ord:
            best_ord, op, payload, changed = o, p_op, p, True
    return best_ord, op, payload, changed


def _cdc_ranked(events: DataFrame, key_col: str) -> DataFrame:
    return events.select(
        F.col(key_col).alias("key"),
        F.expr(
            "CASE WHEN seq BETWEEN 0 AND 1152921504606846976 THEN seq * 4 + "
            "CASE op WHEN 'D' THEN 3 WHEN 'U' THEN 2 WHEN 'I' THEN 1 "
            "ELSE raise_error(concat('cdc stream: unknown op ', op)) END "
            "ELSE raise_error('cdc stream: seq outside [0, 2^60]') END"
        ).alias("ord"),
        F.col("op"),
        F.col("payload"),
    )


def cdc_stream(events: DataFrame, key_col: str = "key") -> DataFrame:
    """ONLINE changelog compaction: per key, hold the latest-wins change
    (the streaming half of operators/cdc.py::cdc_apply — what a
    lakehouse MERGE does nightly, emitted at micro-batch latency) and
    emit ``(key, emit_seq, op, payload)`` whenever the winner changes;
    a 'D' emission is the tombstone. The max-emit_seq row per key is
    the current post-image; the drained final rows equal the batch
    winner table exactly (pinned — the max fold is order-insensitive).

    State is one (ord, op, payload) per key. The ordering key is
    computed JVM-side with the SAME in-plan refusals as the batch op;
    equal-ord redeliveries are ignored (idempotent replay tolerance —
    see _cdc_fold). NoTimeout: a changelog never expires."""

    ranked = _cdc_ranked(events, key_col)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        best_ord, op, payload, emit_seq = (
            state.get if state.exists else (None, None, None, 0)
        )
        frames = [p for p in pdfs if len(p)]
        rows = []
        if frames:
            b = pd.concat(frames, ignore_index=True)
            rows = list(zip(b["ord"].tolist(), b["op"].tolist(), b["payload"].tolist()))
        best_ord, op, payload, changed = _cdc_fold(best_ord, op, payload, rows)
        if changed:
            emit_seq += 1
            state.update((best_ord, op, payload, emit_seq))
            yield pd.DataFrame(
                {
                    "key": [int(key_val)],
                    "emit_seq": [emit_seq],
                    "op": [op],
                    "payload": [payload],
                }
            )

    return ranked.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_CDC_OUT_SCHEMA,
        stateStructType=_CDC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cdc_stream_tws(events: DataFrame, key_col: str = "key") -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of :func:`cdc_stream`
    — the ELEVENTH op carried on BOTH stateful APIs. Same shared
    :func:`_cdc_fold`; no timers. GS ≡ TWS equality pinned on the same
    drain in tests."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    ranked = _cdc_ranked(events, key_col)

    class CdcProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("cdc", _CDC_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (key_val,) = key
            held = self._state.get()
            best_ord, op, payload, emit_seq = (
                held if held is not None else (None, None, None, 0)
            )
            frames = [p for p in rows if len(p)]
            triples = []
            if frames:
                b = pd.concat(frames, ignore_index=True)
                triples = list(
                    zip(b["ord"].tolist(), b["op"].tolist(), b["payload"].tolist())
                )
            best_ord, op, payload, changed = _cdc_fold(
                best_ord, op, payload, triples
            )
            if changed:
                emit_seq += 1
                self._state.update((best_ord, op, payload, emit_seq))
                yield pd.DataFrame(
                    {
                        "key": [int(key_val)],
                        "emit_seq": [emit_seq],
                        "op": [op],
                        "payload": [payload],
                    }
                )

        def close(self) -> None:
            pass

    return ranked.groupBy("key").transformWithStateInPandas(
        statefulProcessor=CdcProcessor(),
        outputStructType=_CDC_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online OHLC bars (per-bar candlestick state)
# ---------------------------------------------------------------------------

_OHLC_OUT_SCHEMA = (
    "bar_start bigint, seq bigint, n_events bigint, open_milli bigint, "
    "high_milli bigint, low_milli bigint, close_milli bigint"
)
_OHLC_STATE_SCHEMA = (
    "seq bigint, n bigint, open_ord string, open bigint, high bigint, "
    "low bigint, close_ord string, close bigint"
)


def _ohlc_fold(state: tuple, rows: list) -> tuple:
    """Pure per-bar OHLC step shared by BOTH stateful API forms:
    ``state = (n, open_ord, open, high, low, close_ord, close)`` with
    the ordering keys the batch op's zero-padded ``(us, id)`` strings.
    min/max/argmin/argmax merges are commutative and idempotent-free of
    order — chunking/order-invariant like the KMV/DD/CDC folds (no
    in-order feed caveat). Returns ``(state', changed)``."""
    n, open_ord, open_v, high, low, close_ord, close_v = state
    changed = False
    for ordk, vm in rows:
        n += 1
        changed = True
        if open_ord is None or ordk < open_ord:
            open_ord, open_v = ordk, vm
        if close_ord is None or ordk > close_ord:
            close_ord, close_v = ordk, vm
        if high is None or vm > high:
            high = vm
        if low is None or vm < low:
            low = vm
    return (n, open_ord, open_v, high, low, close_ord, close_v), changed


def _ohlc_ranked(events: DataFrame, bar_seconds: int) -> DataFrame:
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long

    us = F.unix_micros(F.col("ts"))
    return events.select(
        (F.floor(us / (bar_seconds * 1_000_000)) * bar_seconds)
        .cast("long")
        .alias("bar_start"),
        F.concat(
            F.lpad(us.cast("string"), 20, "0"),
            F.lpad(F.col("event_id").cast("string"), 10, "0"),
        ).alias("ordk"),
        scaled_long(F.col("value"), 1000).alias("vm"),
    )


def _ohlc_emit(bar, seq, st) -> "pd.DataFrame":
    n, _oo, open_v, high, low, _co, close_v = st
    return pd.DataFrame(
        {
            "bar_start": [int(bar)],
            "seq": [seq],
            "n_events": [n],
            "open_milli": [open_v],
            "high_milli": [high],
            "low_milli": [low],
            "close_milli": [close_v],
        }
    )


def ohlc_stream(events: DataFrame, bar_seconds: int = 3600) -> DataFrame:
    """ONLINE OHLC bars: per time bucket, maintain candlestick state
    (operators/stats.py::ohlc_bars is the batch twin) and emit
    ``(bar_start, seq, n_events, open/high/low/close_milli)`` whenever
    a batch lands in the bar. The max-seq row per bar is the live
    candlestick; the drained final rows equal the batch bars exactly
    (pinned — the fold is commutative, no in-order feed needed).

    State is 7 scalars + the two ordering strings per ACTIVE bar.
    NoTimeout by design: bars stay open for late data forever here;
    the watermark-finalized variant is the tumbling-agg tier
    (stream_health_60s) — two different contracts, both shipped."""

    ranked = _ohlc_ranked(events, bar_seconds)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (bar,) = key
        if state.exists:
            seq, n, oo, ov, hi, lo, co, cv = state.get
        else:
            seq, n, oo, ov, hi, lo, co, cv = 0, 0, None, None, None, None, None, None
        frames = [p for p in pdfs if len(p)]
        rows = []
        if frames:
            b = pd.concat(frames, ignore_index=True)
            rows = list(zip(b["ordk"].tolist(), b["vm"].tolist()))
        st, changed = _ohlc_fold((n, oo, ov, hi, lo, co, cv), rows)
        if changed:
            seq += 1
            state.update((seq, st[0], st[1], st[2], st[3], st[4], st[5], st[6]))
            yield _ohlc_emit(bar, seq, st)

    return ranked.groupBy("bar_start").applyInPandasWithState(
        update,
        outputStructType=_OHLC_OUT_SCHEMA,
        stateStructType=_OHLC_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ohlc_stream_tws(events: DataFrame, bar_seconds: int = 3600) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of :func:`ohlc_stream`
    — the TWELFTH op carried on BOTH stateful APIs. Same shared
    :func:`_ohlc_fold`; no timers. GS ≡ TWS equality pinned on the same
    drain in tests."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    ranked = _ohlc_ranked(events, bar_seconds)

    class OhlcProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ohlc", _OHLC_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (bar,) = key
            held = self._state.get()
            if held is not None:
                seq, n, oo, ov, hi, lo, co, cv = held
            else:
                seq, n, oo, ov, hi, lo, co, cv = 0, 0, None, None, None, None, None, None
            frames = [p for p in rows if len(p)]
            triples = []
            if frames:
                b = pd.concat(frames, ignore_index=True)
                triples = list(zip(b["ordk"].tolist(), b["vm"].tolist()))
            st, changed = _ohlc_fold((n, oo, ov, hi, lo, co, cv), triples)
            if changed:
                seq += 1
                self._state.update(
                    (seq, st[0], st[1], st[2], st[3], st[4], st[5], st[6])
                )
                yield _ohlc_emit(bar, seq, st)

        def close(self) -> None:
            pass

    return ranked.groupBy("bar_start").transformWithStateInPandas(
        statefulProcessor=OhlcProcessor(),
        outputStructType=_OHLC_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online incremental view maintenance (live materialized rollup per key)
# ---------------------------------------------------------------------------

_IVM_OUT_SCHEMA = "key long, seq long, n_rows long, total long"
_IVM_STATE_SCHEMA = "seq long, n_rows long, total long"


def _ivm_stream_fold(n_rows: int, total: int, rows: list) -> tuple:
    """Pure fold shared by both stateful APIs and (in spirit) the batch
    merge (operators/ivm.py): ``rows`` is ``[(op, value)]``; inserts
    add (+1, +v), deletes (−1, −v). Pure SUMS — commutative and
    chunking-invariant by construction, so drained state equals the
    batch merge regardless of arrival order. Unknown ops raise (the
    batch refusal, same message family)."""
    for op, v in rows:
        if op == "I":
            n_rows += 1
            total += int(v)
        elif op == "D":
            n_rows -= 1
            total -= int(v)
        else:
            raise ValueError(f"ivm_stream: unknown op {op!r}")
    return n_rows, total


def ivm_stream(changes: DataFrame, key_col: str = "key") -> DataFrame:
    """ONLINE incremental view maintenance — the streaming half of
    ``operators/ivm.py`` (the THIRTEENTH op on both stateful APIs): a
    changelog stream of ``(key, value, op)`` maintains the live
    ``(n_rows, total)`` rollup per key and emits the updated view row
    (max seq = current) whenever a batch touches the key. A row with
    ``n_rows = 0`` is the view's DELETION TOMBSTONE — the batch merge
    omits the group, the stream must tell downstream consumers to;
    both contracts are stated and the equality pin filters accordingly.
    Unlike the batch form, transiently negative counts are NOT refused:
    a delete may arrive a micro-batch before its insert under
    at-least-once redelivery reordering, and the commutative sum makes
    the FINAL state correct regardless (the batch audit refuses the
    ambiguity; the stream tolerates it — the cdc_stream split, same
    reasoning).

    State: two BIGINTs + seq per ACTIVE key; NoTimeout (a maintained
    view never expires).

    Throughput shape (measured sf0.1, local[32], noop sink): a
    deliberately adversarial single availableNow batch touching ~10k
    keys drains 150k changes at ~14.3k ch/s — a KEY-CARDINALITY floor
    (one pandas group per touched key per micro-batch), not a fold
    cost; cdc_stream runs ~50k ch/s at ~5 keys/batch on the same
    machinery. Production changelogs touch FEW keys per trigger, where
    the per-key fold is two integer adds. If a use case ever needs
    >50k changed keys per micro-batch, the known spike is Arrow-level
    grouping / the partition-run discipline that rewrote
    rate_limit_decisions (PLANS Round-9g adjudication, promoted
    here)."""
    staged = changes.select(F.col(key_col).alias("key"), "value", "op")

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        seq, n_rows, total = state.get if state.exists else (0, 0, 0)
        frames = [p for p in pdfs if len(p)]
        if frames:
            b = pd.concat(frames, ignore_index=True)
            rows = list(zip(b["op"].tolist(), b["value"].tolist()))
        else:
            rows = []
        if rows:
            n_rows, total = _ivm_stream_fold(n_rows, total, rows)
            seq += 1
            state.update((seq, n_rows, total))
            yield pd.DataFrame(
                {
                    "key": [int(key_val)],
                    "seq": [seq],
                    "n_rows": [n_rows],
                    "total": [total],
                }
            )

    return staged.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_IVM_OUT_SCHEMA,
        stateStructType=_IVM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ivm_stream_tws(changes: DataFrame, key_col: str = "key") -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of :func:`ivm_stream`
    — same shared fold, ProcessingTime with no timers; GS ≡ TWS pinned
    on the same drain in tests."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    staged = changes.select(F.col(key_col).alias("key"), "value", "op")

    class IvmProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ivm", _IVM_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (key_val,) = key
            held = self._state.get()
            seq, n_rows, total = held if held is not None else (0, 0, 0)
            frames = [p for p in rows if len(p)]
            if frames:
                b = pd.concat(frames, ignore_index=True)
                triples = list(zip(b["op"].tolist(), b["value"].tolist()))
            else:
                triples = []
            if triples:
                n_rows, total = _ivm_stream_fold(n_rows, total, triples)
                seq += 1
                self._state.update((seq, n_rows, total))
                yield pd.DataFrame(
                    {
                        "key": [int(key_val)],
                        "seq": [seq],
                        "n_rows": [n_rows],
                        "total": [total],
                    }
                )

        def close(self) -> None:
            pass

    return staged.groupBy("key").transformWithStateInPandas(
        statefulProcessor=IvmProcessor(),
        outputStructType=_IVM_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online Bloom ingest novelty scoring (growing membership filter, per key)
# ---------------------------------------------------------------------------

_BLOOM_OUT_SCHEMA = (
    "ns string, doc_id bigint, seq bigint, n_grams bigint, n_prior_hits bigint"
)
_BLOOM_STATE_SCHEMA = "seq bigint, words array<long>"
_BLOOM_WORDS = 65536 // 32  # m = 2^16 bits in 32-bit words (bloom.py geometry)


def _bloom_stream_fold(words: list, docs: list) -> tuple:
    """Pure per-key Bloom ingest step shared by BOTH stateful API forms:
    ``docs`` is ``[(doc_id, n_grams, positions)]`` with ``positions``
    the flat k-per-gram bit-position list (staged JVM-side by
    ``operators/bloom.bloom_positions`` — the stateless scale-out
    stage); rows are processed in ascending ``doc_id`` order (the
    IN-BATCH ORDER CONTRACT — a growing filter is order-dependent by
    nature, so the fold fixes a total order instead of inheriting
    partition arrival order; feeding batches in doc_id order makes the
    result chunking-INVARIANT, pinned in tests).

    Per doc: count grams whose k bits are ALL already set (prior-
    ingest hits, the novelty signal), THEN insert the doc's own grams.
    Returns (words', emitted_rows). A doc's own grams never count
    against itself; duplicate grams WITHIN a doc are already distinct
    at staging."""
    from kinesis_stream_video_project_spark.operators.bloom import K_HASHES

    w = [int(x) for x in words] if words else [0] * _BLOOM_WORDS
    out = []
    for doc_id, n_grams, positions in sorted(docs):
        pos = [int(p) for p in positions]  # GroupState pickles PYTHON ints
        hits = 0
        for g in range(0, len(pos), K_HASHES):
            if all(
                w[p // 32] & (1 << (p % 32)) for p in pos[g : g + K_HASHES]
            ):
                hits += 1
        for p in pos:
            w[p // 32] |= 1 << (p % 32)
        out.append((doc_id, n_grams, hits))
    return w, out


def _bloom_stage(docs: DataFrame, ns_col: str, n: int) -> DataFrame:
    """Stateless JVM-side staging: per doc, the distinct n-grams'
    flattened k bit positions (``operators/bloom.bloom_positions`` —
    md5 staged OUTSIDE the probe lambda, its own projection) plus the
    gram count. This stage carries ALL the hashing cost and scales out;
    the stateful fold only flips bits."""
    from kinesis_stream_video_project_spark.functions.text import tokens
    from kinesis_stream_video_project_spark.operators.bloom import (
        K_HASHES,
        M_BITS,
    )

    toked = docs.select(
        F.col(ns_col).alias("ns"), "doc_id", tokens(F.col("text")).alias("_toks")
    ).filter(F.size("_toks") >= n)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("_toks", i, F.lit(n))),
        )
    )
    staged = toked.select("ns", "doc_id", grams.alias("_grams")).select(
        "ns",
        "doc_id",
        F.size("_grams").cast("long").alias("n_grams"),
        F.transform("_grams", F.md5).alias("_hashes"),
    )
    pos = F.flatten(
        F.transform(
            "_hashes",
            lambda h: F.array(
                *[
                    (
                        F.conv(F.substring(h, 1 + 5 * j, 5), 16, 10).cast(
                            "int"
                        )
                        % F.lit(M_BITS)
                    )
                    for j in range(K_HASHES)
                ]
            ),
        )
    )
    return staged.select("ns", "doc_id", "n_grams", pos.alias("positions"))


def bloom_stream(docs: DataFrame, ns_col: str = "source", n: int = 5) -> DataFrame:
    """ONLINE Bloom ingest novelty scoring — the FOURTEENTH op on both
    stateful APIs, and the streaming half of the registered
    ``bloom_ingest_scores`` batch tier: per namespace key, a GROWING
    m-bit Bloom filter of every n-gram ingested so far; each arriving
    doc emits ``(ns, doc_id, seq, n_grams, n_prior_hits)`` where
    ``n_prior_hits`` counts its grams already present — the
    at-ingest near-dup/contamination signal ("how much of this doc
    have I already crawled") at FIXED memory per namespace.

    No false negatives by the Bloom law: n_prior_hits >= the exact
    prior-gram overlap (pinned against a pure first-seen replay in
    tests); overcount is the documented FP trade (bloom.py geometry
    note). Docs shorter than ``n`` tokens emit no row (the batch
    contract).

    State: seq + 2 048 packed 32-bit words (16 KB) per namespace —
    constant regardless of corpus size, the entire point; namespaces
    are the sharding lever (per-source/per-lang filters shard the
    key space the way production shards by crawl segment).
    NoTimeout: a membership filter never expires."""
    staged = _bloom_stage(docs, ns_col, n)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (ns,) = key
        seq, words = state.get if state.exists else (0, [])
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        b = pd.concat(frames, ignore_index=True)
        rows = list(
            zip(
                b["doc_id"].tolist(),
                b["n_grams"].tolist(),
                [list(p) for p in b["positions"].tolist()],
            )
        )
        words, emitted = _bloom_stream_fold(list(words), rows)
        seq += 1
        state.update((seq, words))
        yield pd.DataFrame(
            {
                "ns": [str(ns)] * len(emitted),
                "doc_id": [int(d) for d, _, _ in emitted],
                "seq": [seq] * len(emitted),
                "n_grams": [int(g) for _, g, _ in emitted],
                "n_prior_hits": [int(h) for _, _, h in emitted],
            }
        )

    return staged.groupBy("ns").applyInPandasWithState(
        update,
        outputStructType=_BLOOM_OUT_SCHEMA,
        stateStructType=_BLOOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def bloom_stream_tws(
    docs: DataFrame, ns_col: str = "source", n: int = 5
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of
    :func:`bloom_stream` — same shared fold and in-batch doc_id order
    contract; ProcessingTime with no timers. GS ≡ TWS pinned on the
    same drain in tests."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    staged = _bloom_stage(docs, ns_col, n)

    class BloomProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("bloom", _BLOOM_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (ns,) = key
            held = self._state.get()
            seq, words = held if held is not None else (0, [])
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            b = pd.concat(frames, ignore_index=True)
            triples = list(
                zip(
                    b["doc_id"].tolist(),
                    b["n_grams"].tolist(),
                    [list(p) for p in b["positions"].tolist()],
                )
            )
            words, emitted = _bloom_stream_fold(list(words), triples)
            seq += 1
            self._state.update((seq, list(words)))
            yield pd.DataFrame(
                {
                    "ns": [str(ns)] * len(emitted),
                    "doc_id": [int(d) for d, _, _ in emitted],
                    "seq": [seq] * len(emitted),
                    "n_grams": [int(g) for _, g, _ in emitted],
                    "n_prior_hits": [int(h) for _, _, h in emitted],
                }
            )

        def close(self) -> None:
            pass

    return staged.groupBy("ns").transformWithStateInPandas(
        statefulProcessor=BloomProcessor(),
        outputStructType=_BLOOM_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online weighted priority sampling (bottom-k (priority, id) state, per key)
# ---------------------------------------------------------------------------

_WPS_OUT_SCHEMA = (
    "key string, seq bigint, n_sample bigint, sample_ids array<long>, "
    "kth_priority bigint"
)
_WPS_STATE_SCHEMA = "seq bigint, priorities array<long>, ids array<long>"


def _wps_fold(held: list, new_pairs: list, k: int) -> tuple:
    """Pure per-key priority-sampling step shared by BOTH stateful API
    forms: merge the batch's (priority, id) pairs into the held
    bottom-k set — the weighted sibling of :func:`_kmv_fold`, and the
    SAME set-fold disorder story: bottom-k of a union equals bottom-k
    of bottom-k's, so the drained state is order- and chunking-
    invariant AND equals the batch ``operators/sampling.py::
    priority_sample`` top-k exactly (pinned in tests — a streaming op
    whose final state certifies against an oracle-validated batch
    operator).

    Dedup is BY ID, keeping the minimum priority (ADVICE r10): an id
    re-arriving with the same weight is a redelivery, absorbed
    idempotently; an id re-arriving with a DIFFERENT weight collapses
    to its best (lowest) priority instead of occupying two sample
    slots, so ``sample_ids`` can never contain duplicates. Per-id min
    is a semilattice, so the fold stays mergeable and chunking-
    invariant: an evicted pair can never re-enter (eviction implies k
    strictly-smaller pairs that only ever get smaller), and a
    re-arrival below the bar is fresh input either way — pinned by the
    hypothesis chunking test. Returns ``(merged, changed)``."""
    best: dict[int, int] = {}
    for p, i in list(held) + list(new_pairs):
        if i not in best or p < best[i]:
            best[i] = p
    merged = sorted((p, i) for i, p in best.items())[:k]
    return merged, merged != list(held)


def wps_stream(
    events: DataFrame, key_col: str = "event_type", k: int = 16
) -> DataFrame:
    """ONLINE weighted priority sample — the FIFTEENTH op on both
    stateful APIs: per key, the k-element Duffield/Lund/Thorup priority
    sample of everything seen so far (weight = the event's scaled
    value), emitted as ``(key, seq, n_sample, sample_ids,
    kth_priority)`` whenever a batch changes the sample. The max-seq
    row per key IS the current sample; state is ≤ k (priority, id)
    BIGINT pairs + seq — fixed memory regardless of stream length, the
    reservoir property that makes weighted sampling a streaming
    primitive at all.

    Priorities are the batch operator's exact integers (48-bit md5 rank
    DIV weight), staged JVM-side before the shuffle; weights must be
    positive — rows with non-positive value are refused upstream by the
    same in-plan guard the batch form uses (shared staging)."""
    staged = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.expr(
            "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 12), 16, 10)"
            " AS BIGINT) DIV CAST(CASE WHEN CAST(value * 1000 AS BIGINT) > 0"
            " THEN CAST(value * 1000 AS BIGINT) ELSE"
            " raise_error('wps_stream: non-positive weight') END AS BIGINT)"
        ).alias("priority"),
        F.col("event_id").cast("long").alias("id"),
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        seq, prios, ids = state.get if state.exists else (0, [], [])
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        b = pd.concat(frames, ignore_index=True)
        pairs = list(zip((int(p) for p in b["priority"]), (int(i) for i in b["id"])))
        merged, changed = _wps_fold(list(zip(prios, ids)), pairs, k)
        if changed:
            seq += 1
            state.update(
                (seq, [p for p, _ in merged], [i for _, i in merged])
            )
            yield pd.DataFrame(
                {
                    "key": [str(key_val)],
                    "seq": [seq],
                    "n_sample": [len(merged)],
                    "sample_ids": [[i for _, i in merged]],
                    "kth_priority": [merged[-1][0]],
                }
            )

    return staged.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_WPS_OUT_SCHEMA,
        stateStructType=_WPS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def wps_stream_tws(
    events: DataFrame, key_col: str = "event_type", k: int = 16
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of :func:`wps_stream`
    — same shared set-fold; ProcessingTime with no timers (a sample
    never expires). GS ≡ TWS pinned on the same drain in tests."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    staged = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.expr(
            "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 12), 16, 10)"
            " AS BIGINT) DIV CAST(CASE WHEN CAST(value * 1000 AS BIGINT) > 0"
            " THEN CAST(value * 1000 AS BIGINT) ELSE"
            " raise_error('wps_stream: non-positive weight') END AS BIGINT)"
        ).alias("priority"),
        F.col("event_id").cast("long").alias("id"),
    )

    class WpsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("wps", _WPS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (key_val,) = key
            held = self._state.get()
            seq, prios, ids = held if held is not None else (0, [], [])
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            b = pd.concat(frames, ignore_index=True)
            pairs = list(
                zip((int(p) for p in b["priority"]), (int(i) for i in b["id"]))
            )
            merged, changed = _wps_fold(list(zip(prios, ids)), pairs, k)
            if changed:
                seq += 1
                self._state.update(
                    (seq, [p for p, _ in merged], [i for _, i in merged])
                )
                yield pd.DataFrame(
                    {
                        "key": [str(key_val)],
                        "seq": [seq],
                        "n_sample": [len(merged)],
                        "sample_ids": [[i for _, i in merged]],
                        "kth_priority": [merged[-1][0]],
                    }
                )

        def close(self) -> None:
            pass

    return staged.groupBy("key").transformWithStateInPandas(
        statefulProcessor=WpsProcessor(),
        outputStructType=_WPS_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online latest-value as-of enrichment (live point-in-time join per key)
# ---------------------------------------------------------------------------

_LVE_OUT_SCHEMA = (
    "user_id long, probe_event_id long, probe_ts_us long, "
    "ref_ts_us long, ref_vm long"
)
_LVE_STATE_SCHEMA = "ref_ts_us long, ref_vm long"


def _lve_fold(state: "tuple | None", rows: list) -> tuple:
    """Pure per-key latest-value-enrichment step shared by BOTH stateful
    API forms: walk ``rows`` — ``(ts_us, side, event_id, vm)`` tuples,
    side 0 = reference, 1 = probe — in (ts_us, side, event_id) order;
    a reference row advances the held (ref_ts_us, ref_vm), a probe row
    emits itself stamped with the held reference (NULLs while no
    reference has arrived — the left-outer as-of contract). The sort
    puts references BEFORE probes at equal ts (an exactly-simultaneous
    reference is visible — the ``asof_join`` >= tie rule) and breaks
    equal-(ts, side) ties by event_id, the highest winning the state
    (the batch twin's deterministic-carry rule; the fixture has no such
    ties — probed at 3 SFs — so the rule is stated, not load-bearing).

    ORDER CONTRACT (the bloom_stream discipline): batches must arrive
    in event-time order for the drained output to equal the batch
    ``operators/asof.py::asof_join`` twin exactly (pinned in tests); a
    reference arriving AFTER a probe already emitted does not
    retro-enrich — the live-enrichment trade, stated. Returns
    ``(new_state, emitted)``."""
    emitted = []
    for ts_us, side, eid, vm in sorted(rows):
        if side == 0:
            state = (int(ts_us), int(vm))
        elif state is None:
            emitted.append((int(eid), int(ts_us), None, None))
        else:
            emitted.append((int(eid), int(ts_us), state[0], state[1]))
    return state, emitted


def _lve_staged(
    events: DataFrame, ref_type: str, probe_type: str
) -> DataFrame:
    """Shared JVM staging: the two event types keyed by user, reference
    values scaled to milli-units via ``numeric.scaled_long`` (the same
    IEEE steps as every batch tier, so the twin-equality pin compares
    identical integers); NULL-value references are excluded — a reading
    with no value cannot vouch for anything (stated)."""
    from kinesis_stream_video_project_spark.functions.numeric import (
        scaled_long as _scaled,
    )

    def _scaled_milli(c):
        return _scaled(c, 1000)

    is_ref = (F.col("event_type") == ref_type) & F.col("value").isNotNull()
    is_probe = F.col("event_type") == probe_type
    return events.filter(is_ref | is_probe).select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.when(is_ref, F.lit(0)).otherwise(F.lit(1)).alias("side"),
        F.col("event_id").cast("long").alias("event_id"),
        F.when(is_ref, _scaled_milli(F.col("value"))).alias("vm"),
    )


def lve_stream(
    events: DataFrame,
    ref_type: str = "purchase",
    probe_type: str = "click",
) -> DataFrame:
    """ONLINE latest-value as-of enrichment — the SIXTEENTH op on both
    stateful APIs: per user, hold the latest reference reading (two
    BIGINTs — bounded state by construction, the kdb `aj`/Flink
    temporal-join shape) and stamp every probe event with it at
    micro-batch latency. The drained output equals the batch
    ``asof_join(probes, refs, direction="backward")`` exactly under the
    in-order feed contract (pinned — a streaming op certified against
    the oracle-validated as-of operator, the wps/priority_sample
    pattern)."""
    staged = _lve_staged(events, ref_type, probe_type)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        held = tuple(state.get) if state.exists else None
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        b = pd.concat(frames, ignore_index=True)
        rows = [
            (int(t), int(s), int(e), None if pd.isna(v) else int(v))
            for t, s, e, v in zip(
                b["ts_us"], b["side"], b["event_id"], b["vm"]
            )
        ]
        held, emitted = _lve_fold(held, rows)
        if held is not None:
            state.update(held)
        if emitted:
            yield pd.DataFrame(
                {
                    "user_id": [int(uid)] * len(emitted),
                    "probe_event_id": [e for e, _, _, _ in emitted],
                    "probe_ts_us": [t for _, t, _, _ in emitted],
                    "ref_ts_us": [r for _, _, r, _ in emitted],
                    "ref_vm": [v for _, _, _, v in emitted],
                }
            )

    return staged.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_LVE_OUT_SCHEMA,
        stateStructType=_LVE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def lve_stream_tws(
    events: DataFrame,
    ref_type: str = "purchase",
    probe_type: str = "click",
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of :func:`lve_stream`
    — same shared fold, no timers (a latest value never expires; the
    staleness bound is the batch twin's ``tolerance_us``, deliberately
    not replicated here — stated). GS ≡ TWS pinned on the same drain."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    staged = _lve_staged(events, ref_type, probe_type)

    class LveProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("lve", _LVE_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (uid,) = key
            got = self._state.get()
            held = tuple(got) if got is not None else None
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            b = pd.concat(frames, ignore_index=True)
            pairs = [
                (int(t), int(s), int(e), None if pd.isna(v) else int(v))
                for t, s, e, v in zip(
                    b["ts_us"], b["side"], b["event_id"], b["vm"]
                )
            ]
            held, emitted = _lve_fold(held, pairs)
            if held is not None:
                self._state.update(held)
            if emitted:
                yield pd.DataFrame(
                    {
                        "user_id": [int(uid)] * len(emitted),
                        "probe_event_id": [e for e, _, _, _ in emitted],
                        "probe_ts_us": [t for _, t, _, _ in emitted],
                        "ref_ts_us": [r for _, _, r, _ in emitted],
                        "ref_vm": [v for _, _, _, v in emitted],
                    }
                )

        def close(self) -> None:
            pass

    return staged.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=LveProcessor(),
        outputStructType=_LVE_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online Holt linear smoothing (live level+trend forecast per key)
# ---------------------------------------------------------------------------

_HOLT_OUT_SCHEMA = (
    "key string, step bigint, level_s bigint, trend_s bigint, "
    "forecast_next bigint"
)
_HOLT_STATE_SCHEMA = "n bigint, a bigint, b bigint"


def _holt_stream_fold(state: tuple, xs: list) -> tuple:
    """Pure per-key Holt step shared by BOTH stateful API forms: fold
    the batch's series-ordered scaled values into (n, a, b) — n values
    seen; for n == 1, a holds the awaited x₁ (b unused); for n >= 2,
    (a, b) are the live (level, trend). EXACTLY the
    ``operators/forecast.py::holt_fold`` recursion (α=β=1/2 truncating
    integer arithmetic), so the drained emissions equal the batch fold
    on the same series verbatim (pinned) — including the two-point
    init: nothing emits until the SECOND value arrives, at which point
    the deferred step-1 row and the step-2 row emit together (the
    batch form's <2-point skip, made causal).

    ORDER CONTRACT (the lve/bloom discipline): values must arrive in
    series order across batches; within a batch the caller sorts.
    Returns ``(new_state, emitted)`` with emitted rows
    ``(step, level_s, trend_s, forecast_next)``."""
    from kinesis_stream_video_project_spark.functions.numeric import tdiv

    n, a, b = state
    emitted = []
    for x in xs:
        x = int(x)
        n += 1
        if n == 1:
            a = x
        elif n == 2:
            b = x - a
            emitted.append((1, a, b, a + b))
            new_l = tdiv(x + a + b, 2)
            b = tdiv(new_l - a + b, 2)
            a = new_l
            emitted.append((2, a, b, a + b))
        else:
            new_l = tdiv(x + a + b, 2)
            b = tdiv(new_l - a + b, 2)
            a = new_l
            emitted.append((n, a, b, a + b))
    return (n, a, b), emitted


def _holt_staged(events: DataFrame) -> DataFrame:
    """Shared JVM staging: per event-type series of milli-scaled values
    in (ts, event_id) series order (NULL values excluded — stated)."""
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long

    return events.filter(F.col("value").isNotNull()).select(
        F.col("event_type").cast("string").alias("key"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("event_id").cast("long").alias("event_id"),
        scaled_long(F.col("value"), 1000).alias("xm"),
    )


def _holt_batch_rows(b: pd.DataFrame) -> list:
    return [
        int(x)
        for _, _, x in sorted(
            zip(b["ts_us"], b["event_id"], b["xm"]),
            key=lambda t: (int(t[0]), int(t[1])),
        )
    ]


def holt_stream(events: DataFrame) -> DataFrame:
    """ONLINE Holt linear smoothing — the SEVENTEENTH op on both
    stateful APIs: per event type, the live (level, trend, one-step
    forecast) of the scaled value series at micro-batch latency —
    "where is this metric HEADING", the watchdog family's leading
    indicator (the batch tier is the r14-queue `holt_daily_revenue`).
    State is three BIGINTs per key — bounded by construction. Drained
    emissions equal the batch ``forecast.holt_fold`` on the same
    series exactly (pinned — certified against the oracle-validated
    batch operator, the wps/lve pattern)."""
    staged = _holt_staged(events)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        held = tuple(state.get) if state.exists else (0, 0, 0)
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        b = pd.concat(frames, ignore_index=True)
        held, emitted = _holt_stream_fold(held, _holt_batch_rows(b))
        state.update(held)
        if emitted:
            yield pd.DataFrame(
                {
                    "key": [str(key_val)] * len(emitted),
                    "step": [s for s, _, _, _ in emitted],
                    "level_s": [l for _, l, _, _ in emitted],
                    "trend_s": [t for _, _, t, _ in emitted],
                    "forecast_next": [f for _, _, _, f in emitted],
                }
            )

    return staged.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_HOLT_OUT_SCHEMA,
        stateStructType=_HOLT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def holt_stream_tws(events: DataFrame) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of :func:`holt_stream`
    — same shared fold, no timers. GS ≡ TWS pinned on the same drain."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    staged = _holt_staged(events)

    class HoltProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("holt", _HOLT_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (key_val,) = key
            got = self._state.get()
            held = tuple(got) if got is not None else (0, 0, 0)
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            b = pd.concat(frames, ignore_index=True)
            held, emitted = _holt_stream_fold(held, _holt_batch_rows(b))
            self._state.update(held)
            if emitted:
                yield pd.DataFrame(
                    {
                        "key": [str(key_val)] * len(emitted),
                        "step": [s for s, _, _, _ in emitted],
                        "level_s": [l for _, l, _, _ in emitted],
                        "trend_s": [t for _, _, t, _ in emitted],
                        "forecast_next": [f for _, _, _, f in emitted],
                    }
                )

        def close(self) -> None:
            pass

    return staged.groupBy("key").transformWithStateInPandas(
        statefulProcessor=HoltProcessor(),
        outputStructType=_HOLT_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online Holt-Winters additive seasonal smoothing (live seasonal forecast)
# ---------------------------------------------------------------------------

_HW_OUT_SCHEMA = (
    "key string, step bigint, level_s bigint, trend_s bigint, "
    "season_s bigint, forecast_next bigint"
)
_HW_STATE_SCHEMA = (
    StructType()
    .add("n", LongType())
    .add("l", LongType())
    .add("b", LongType())
    .add("sv", ArrayType(LongType()))
    .add("warm", ArrayType(LongType()))
)
_HW_M = 7


def _hw_stream_fold(state: tuple, xs: list) -> tuple:
    """Pure per-key Holt-Winters step shared by BOTH stateful API forms
    — the seven-point generalization of the Holt recipe (hold the first
    m−1 values in a warmup buffer, emit nothing; the m-th arrival seeds
    l = tdiv(Σ, m) / b = 0 / s_i = x_i − l and emits the step-m row;
    every later arrival runs the ``operators/forecast.py::hw_fold``
    recursion). EXACTLY the batch fold's integer arithmetic, so drained
    emissions equal it verbatim (pinned).

    ORDER CONTRACT (the holt/lve discipline): values must arrive in
    series order across batches; within a batch the caller sorts.
    State: (n, l, b, sv[7], warm[<7]) — at most 10 BIGINTs, bounded.
    Returns ``(new_state, emitted)`` with rows
    ``(step, level_s, trend_s, season_s, forecast_next)``."""
    from kinesis_stream_video_project_spark.functions.numeric import tdiv

    n, lvl, trd, sv, warm = state
    sv, warm = list(sv), list(warm)
    emitted = []
    for x in xs:
        x = int(x)
        n += 1
        if n < _HW_M:
            warm.append(x)
        elif n == _HW_M:
            warm.append(x)
            lvl = tdiv(sum(warm), _HW_M)
            trd = 0
            sv = [v - lvl for v in warm]
            warm = []
            emitted.append((n, lvl, trd, sv[-1], lvl + trd + sv[0]))
        else:
            s_old = sv[0]
            new_l = tdiv(x - s_old + lvl + trd, 2)
            trd = tdiv(new_l - lvl + trd, 2)
            lvl = new_l
            s_new = tdiv(x - lvl + s_old, 2)
            sv = sv[1:] + [s_new]
            emitted.append((n, lvl, trd, s_new, lvl + trd + sv[0]))
    return (n, lvl, trd, sv, warm), emitted


def _hw_emit(key_val, emitted) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "key": [str(key_val)] * len(emitted),
            "step": [s for s, _, _, _, _ in emitted],
            "level_s": [l for _, l, _, _, _ in emitted],
            "trend_s": [t for _, _, t, _, _ in emitted],
            "season_s": [sn for _, _, _, sn, _ in emitted],
            "forecast_next": [f for _, _, _, _, f in emitted],
        }
    )


def hw_stream(events: DataFrame) -> DataFrame:
    """ONLINE additive Holt-Winters — the TWENTIETH op on both stateful
    APIs: per event type, the live (level, trend, seasonal, one-step
    seasonal forecast) of the scaled value series — the seasonal tier
    above ``holt_stream``, for metrics with a daily/weekly rhythm where
    a linear forecaster reads the cycle as trend. State is ≤ 10 BIGINTs
    per key — bounded by construction. The m-point init follows the
    Holt deferred-emission recipe: nothing emits until the 7th value
    arrives (pinned across a checkpoint restart). Drained emissions
    equal the batch ``forecast.hw_fold`` on the same series exactly
    (pinned — certified against the oracle-validated batch operator)."""
    staged = _holt_staged(events)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        if state.exists:
            t = tuple(state.get)
            held = (t[0], t[1], t[2], list(t[3] or []), list(t[4] or []))
        else:
            held = (0, 0, 0, [], [])
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        b = pd.concat(frames, ignore_index=True)
        held, emitted = _hw_stream_fold(held, _holt_batch_rows(b))
        state.update(held)
        if emitted:
            yield _hw_emit(key_val, emitted)

    return staged.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_HW_OUT_SCHEMA,
        stateStructType=_HW_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def hw_stream_tws(events: DataFrame) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of :func:`hw_stream`
    — same shared fold, no timers. GS ≡ TWS pinned on the same drain."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    staged = _holt_staged(events)

    class HwProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("hw", _HW_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (key_val,) = key
            got = self._state.get()
            if got is not None:
                held = (got[0], got[1], got[2], list(got[3] or []), list(got[4] or []))
            else:
                held = (0, 0, 0, [], [])
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            b = pd.concat(frames, ignore_index=True)
            held, emitted = _hw_stream_fold(held, _holt_batch_rows(b))
            self._state.update(held)
            if emitted:
                yield _hw_emit(key_val, emitted)

        def close(self) -> None:
            pass

    return staged.groupBy("key").transformWithStateInPandas(
        statefulProcessor=HwProcessor(),
        outputStructType=_HW_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online event-transition pairing (live Markov bigram feed per user)
# ---------------------------------------------------------------------------

_TRANS_OUT_SCHEMA = (
    "user_id bigint, prev_ty string, next_ty string, next_us bigint"
)
_TRANS_STATE_SCHEMA = StructType().add("last_ty", StringType())


def _trans_fold(last_ty, rows):
    """Pure per-user transition pairing shared by BOTH stateful API
    forms: walk (ts_us, event_id, type)-sorted rows carrying the last
    seen type across batches; every row after the first seen emits
    (prev_ty, next_ty, next_us) — EXACTLY the batch window-lag view
    (`queries_round15._user_transitions`), so drained emissions equal
    it verbatim (pinned). ORDER CONTRACT (the holt/lve discipline):
    rows arrive in series order across batches; within a batch the
    caller sorts. State = ONE string per key."""
    emitted = []
    for us, _eid, ty in rows:
        if last_ty is not None:
            emitted.append((last_ty, ty, int(us)))
        last_ty = ty
    return last_ty, emitted


def _trans_staged(events: DataFrame) -> DataFrame:
    return events.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.col("event_id").cast("long").alias("event_id"),
        F.col("event_type").cast("string").alias("ty"),
    )


def _trans_batch_rows(b: pd.DataFrame) -> list:
    return sorted(
        zip(b["ts_us"].tolist(), b["event_id"].tolist(), b["ty"].tolist()),
        key=lambda t: (int(t[0]), int(t[1])),
    )


def _trans_emit(user_id, emitted) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [int(user_id)] * len(emitted),
            "prev_ty": [p for p, _, _ in emitted],
            "next_ty": [n for _, n, _ in emitted],
            "next_us": [u for _, _, u in emitted],
        }
    )


def transitions_stream(events: DataFrame) -> DataFrame:
    """ONLINE event-transition pairing — the TWENTY-FIRST op on both
    stateful APIs: the streaming half of the r15 Markov family
    (`markov_transition_matrix` consumes exactly these rows). Per user,
    carry the last event type (ONE string of state — the smallest state
    in the shelf) and emit each consecutive (prev, next) bigram at
    micro-batch latency; a downstream stateless groupBy turns the feed
    into live transition counts. Drained emissions equal the batch
    window-lag transitions on the same rows exactly (pinned)."""
    staged = _trans_staged(events)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        last_ty = state.get[0] if state.exists else None
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        b = pd.concat(frames, ignore_index=True)
        last_ty, emitted = _trans_fold(last_ty, _trans_batch_rows(b))
        state.update((last_ty,))
        if emitted:
            yield _trans_emit(user_id, emitted)

    return staged.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_TRANS_OUT_SCHEMA,
        stateStructType=_TRANS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def transitions_stream_tws(events: DataFrame) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of
    :func:`transitions_stream` — same shared fold, no timers. GS ≡ TWS
    pinned on the same drain."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    staged = _trans_staged(events)

    class TransProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("trans", _TRANS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (user_id,) = key
            got = self._state.get()
            last_ty = got[0] if got is not None else None
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            b = pd.concat(frames, ignore_index=True)
            last_ty, emitted = _trans_fold(last_ty, _trans_batch_rows(b))
            self._state.update((last_ty,))
            if emitted:
                yield _trans_emit(user_id, emitted)

        def close(self) -> None:
            pass

    return staged.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=TransProcessor(),
        outputStructType=_TRANS_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online AMS F2 sketch (live repeat-rate / self-join-size estimate per key)
# ---------------------------------------------------------------------------

_AMS_OUT_SCHEMA = "key string, n_rows bigint, f2_est bigint"
_AMS_STATE_SCHEMA = (
    StructType().add("n", LongType()).add("regs", ArrayType(LongType()))
)
_AMS_R = 16


def _ams_stream_sign(r: int, key: str) -> int:
    """Python twin of the batch hash family in ``operators/ams.py``
    (``ams_block_hash`` + ``_word_shift``) — the SAME block-digest
    parity rule (one md5 per 32 estimators, digest ``r DIV 32``, sign r
    = parity of hex digit ``r MOD 32``; the batch side reads that digit
    through a 32-bit conv() word, this side indexes the hex string
    directly — same bit), so the streaming registers are bit-identical
    to the batch/DuckDB sketch."""
    import hashlib

    h = hashlib.md5(f"{r // 32}:{key}".encode("utf-8")).hexdigest()
    return 1 if int(h[r % 32], 16) % 2 == 0 else -1


def _ams_stream_fold(state: tuple, keys: list) -> tuple:
    """Pure register fold shared by BOTH stateful API forms: add each
    arrival's ±1 sign into all R registers. Signs SUM, so the fold is
    ORDER-FREE — the one stream op in the shelf with no ordering
    contract at all (late, reordered, or resharded delivery cannot
    change the drained estimate). Returns ``(new_state, (n, f2_est))``
    with f2_est = truncating mean of the squared registers (exactly the
    batch ``ams_f2_report`` emission)."""
    n, regs = state
    regs = list(regs)
    for k in keys:
        n += 1
        for r in range(_AMS_R):
            regs[r] += _ams_stream_sign(r, k)
    est = sum(x * x for x in regs) // _AMS_R
    return (n, regs), (n, est)


def _ams_staged(events: DataFrame) -> DataFrame:
    """Shared JVM staging: (namespace key = event_type, hashed key =
    user_id as string) — the per-type live estimate of Σ user_counts²,
    the self-join-size / repeat-concentration signal."""
    return events.select(
        F.col("event_type").cast("string").alias("key"),
        F.col("user_id").cast("string").alias("k"),
    )


def ams_stream(events: DataFrame) -> DataFrame:
    """ONLINE AMS F₂ sketch — the NINETEENTH op on both stateful APIs:
    per event type, the live tug-of-war estimate of the second frequency
    moment of the user-activity distribution ("how concentrated is this
    event type's traffic", the repeat-rate siren behind hot-key and
    self-join-size alarms). State is R+1 = 17 BIGINTs per key — bounded
    by construction, and the ONLY shelf op whose fold is fully
    commutative (no ordering contract, no reorder buffer mode needed).
    The drained final emission per key equals the batch
    ``operators/ams.py::ams_f2_report`` estimate on the same rows
    exactly (pinned — certified against the oracle-validated batch
    operator, the wps/lve/holt pattern)."""
    staged = _ams_staged(events)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        held = (
            tuple(state.get) if state.exists else (0, [0] * _AMS_R)
        )
        held = (held[0], list(held[1] or [0] * _AMS_R))
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        b = pd.concat(frames, ignore_index=True)
        held, (n, est) = _ams_stream_fold(held, b["k"].astype(str).tolist())
        state.update(held)
        yield pd.DataFrame(
            {"key": [str(key_val)], "n_rows": [n], "f2_est": [est]}
        )

    return staged.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_AMS_OUT_SCHEMA,
        stateStructType=_AMS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ams_stream_tws(events: DataFrame) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of :func:`ams_stream`
    — same shared fold, no timers. GS ≡ TWS pinned on the same drain."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    staged = _ams_staged(events)

    class AmsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ams", _AMS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (key_val,) = key
            got = self._state.get()
            held = (
                (got[0], list(got[1] or [0] * _AMS_R))
                if got is not None
                else (0, [0] * _AMS_R)
            )
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            b = pd.concat(frames, ignore_index=True)
            held, (n, est) = _ams_stream_fold(held, b["k"].astype(str).tolist())
            self._state.update(held)
            yield pd.DataFrame(
                {"key": [str(key_val)], "n_rows": [n], "f2_est": [est]}
            )

        def close(self) -> None:
            pass

    return staged.groupBy("key").transformWithStateInPandas(
        statefulProcessor=AmsProcessor(),
        outputStructType=_AMS_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online hourly-mix Shannon entropy (claims form) — both stateful APIs
# ---------------------------------------------------------------------------

_ENT_OUT_SCHEMA = (
    "key string, n_events bigint, n_hours bigint, sum_c2 bigint, "
    "h_le_max boolean, h_ge_renyi2 boolean, h_flat boolean"
)
_ENT_STATE_SCHEMA = StructType().add("counts", ArrayType(LongType()))


def _entropy_stream_fold(counts: list, hours: list) -> tuple:
    """Pure fold shared by BOTH stateful API forms: bump the 24 hour
    counters, then emit exactly the batch ``entropy_hourly_claims``
    row — exact integers (n, nonzero hours, Σc²) plus the three
    certification booleans from Python's libm log2 (the claims-pattern
    argument: margins ≥ 1e-3 dwarf any libm drift, so JVM/DuckDB/
    CPython agree on every boolean). Counters SUM, so the fold is
    fully COMMUTATIVE — the second shelf op (after online AMS) with no
    ordering contract at all.

    Domain contract (the km_survival in-plan refusal discipline): the
    state is a FIXED 24-counter array, so only integral hours 0..23
    are representable. The batch twin groups a NULL hour (NULL ts) as
    its own row; the online form instead DECLARES NULL out of domain —
    ``_entropy_staged`` drops NULL-ts rows before the shuffle, and
    this fold REFUSES anything else (NaN from a NULL that slipped past
    staging, or an out-of-range value which Python's negative indexing
    would otherwise silently wrap onto hour 23) rather than corrupt a
    counter."""
    import math

    counts = list(counts)
    for h in hours:
        if h != h or not 0 <= h <= 23:  # NaN fails both comparisons
            raise ValueError(
                f"entropy_stream: hour {h!r} outside the 0..23 domain "
                "(NULL ts rows are dropped at staging by contract)"
            )
        counts[int(h)] += 1
    live = [c for c in counts if c > 0]
    n = sum(live)
    k = len(live)
    sum_c2 = sum(c * c for c in live)
    h_val = math.log2(n) - sum(c * math.log2(c) for c in live) / n
    log2k = math.log2(k)
    renyi2 = 2 * math.log2(n) - math.log2(sum_c2)
    out = (
        n,
        k,
        sum_c2,
        h_val <= log2k + 1e-9,
        h_val >= renyi2 - 1e-9,
        h_val >= 0.96 * log2k,
    )
    return counts, out


def _entropy_staged(events: DataFrame) -> DataFrame:
    """Shared JVM staging: (key = event_type, h = hour-of-day) — the
    live uniformity/anomaly signal of each type's traffic shape (batch
    twin: queries_round17._entropy_hourly_claims, X-220). NULL-ts rows
    are dropped HERE, before the shuffle — the fold's fixed 24-counter
    state declares NULL-hour out of domain (stated contract; the batch
    twin instead emits a NULL-hour group row), and the fold itself
    refuses any hour that still arrives outside 0..23."""
    return events.filter(F.col("ts").isNotNull()).select(
        F.col("event_type").cast("string").alias("key"),
        F.hour("ts").cast("long").alias("h"),
    )


def _entropy_emit(key_val, out) -> pd.DataFrame:
    n, k, sum_c2, le_max, ge_renyi2, flat = out
    return pd.DataFrame(
        {
            "key": [str(key_val)],
            "n_events": [n],
            "n_hours": [k],
            "sum_c2": [sum_c2],
            "h_le_max": [le_max],
            "h_ge_renyi2": [ge_renyi2],
            "h_flat": [flat],
        }
    )


def entropy_stream(events: DataFrame) -> DataFrame:
    """ONLINE hourly-mix Shannon entropy — the TWENTY-SECOND op on both
    stateful APIs: per event type, the live entropy-certification row
    of the hour-of-day distribution (a traffic shape collapsing onto
    one hour — an outage, a replay storm, a bot burst — drives the
    flatness claim FALSE in the next micro-batch). State is a FIXED
    24-long counter array per key — bounded by construction; the fold
    is commutative (counters sum), so late/reordered/resharded
    delivery cannot change any drained emission. The drained final row
    per key equals the oracle-validated batch
    ``queries_round17._entropy_hourly_claims`` row on the same rows
    exactly (pinned — the wps/lve/holt/ams certification pattern)."""
    staged = _entropy_staged(events)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        held = list(state.get[0]) if state.exists else [0] * 24
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        b = pd.concat(frames, ignore_index=True)
        held, out = _entropy_stream_fold(held, b["h"].tolist())
        state.update((held,))
        yield _entropy_emit(key_val, out)

    return staged.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_ENT_OUT_SCHEMA,
        stateStructType=_ENT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def entropy_stream_tws(events: DataFrame) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of
    :func:`entropy_stream` — same shared fold, no timers. GS ≡ TWS
    pinned on the same drain."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    staged = _entropy_staged(events)

    class EntropyProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("ent", _ENT_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (key_val,) = key
            got = self._state.get()
            held = list(got[0]) if got is not None else [0] * 24
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            b = pd.concat(frames, ignore_index=True)
            held, out = _entropy_stream_fold(held, b["h"].tolist())
            self._state.update((held,))
            yield _entropy_emit(key_val, out)

        def close(self) -> None:
            pass

    return staged.groupBy("key").transformWithStateInPandas(
        statefulProcessor=EntropyProcessor(),
        outputStructType=_ENT_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online Welch t² (two-sample monitor) — both stateful APIs
# ---------------------------------------------------------------------------

_WELCH_OUT_SCHEMA = (
    "g_a string, g_b string, n_a bigint, n_b bigint, "
    "t2 double, df_welch double"
)
_WELCH_STATE_SCHEMA = (
    StructType()
    .add("na", LongType())
    .add("sa", LongType())
    .add("qa", LongType())
    .add("nb", LongType())
    .add("sb", LongType())
    .add("qb", LongType())
)

# Σy² envelope: the moments ride BIGINT state columns, and the fold
# REFUSES (raise, the km_survival discipline) before a sum could wrap —
# 2^62 leaves every downstream integer product of the emission exact.
_WELCH_Q_ENVELOPE = 1 << 62


def _welch_stream_fold(state: tuple, rows: list) -> tuple:
    """Pure fold shared by BOTH stateful API forms: add each arrival's
    exact cent value into its side's (n, Σy, Σy²) — six BIGINTs, the
    THIRD fully COMMUTATIVE fold in the shelf (after online AMS and
    entropy): integer sums, so late/reordered/resharded delivery cannot
    change any drained emission.

    ``rows`` is a list of (side, y_cents) with side ∈ {0, 1} assigned
    at staging (0 = the lexicographically smaller group name — the
    batch operator's g_a < g_b pair orientation). Returns
    ``(new_state, (n_a, n_b, t2, df_welch) | None)``: None until both
    sides have n ≥ 2 (the batch twin drops such pairs — variance
    undefined); t2/df_welch None on a zero-variance pair. The float
    tail replays ``operators/stats.py::welch_t2_pairs`` EXACTLY — the
    same IEEE double ops in the same order on exact integer moments
    (Python big-ints play the DECIMAL(38,0) role; int→double conversion
    is correctly rounded in CPython, the JVM, and DuckDB — the r5
    same-IEEE-fold discipline), r4 at emission."""
    import math

    na, sa, qa, nb, sb, qb = state
    for side, y in rows:
        y = int(y)
        if side == 0:
            na += 1
            sa += y
            qa += y * y
        else:
            nb += 1
            sb += y
            qb += y * y
    if max(qa, qb) > _WELCH_Q_ENVELOPE:
        raise ValueError(
            "welch_stream: sum of squared cents beyond the BIGINT state "
            "envelope (2^62) - rescale the metric before streaming it"
        )
    state = (na, sa, qa, nb, sb, qb)
    if na < 2 or nb < 2:
        return state, None

    def var_over_n(s: int, q: int, n: int) -> float:
        num = n * q - s * s  # exact (Python int = the DECIMAL role)
        # Round each exact integer to double BEFORE dividing — the batch
        # operator casts num and denom to double separately, then divides
        # doubles. Below 2^53 int/int and float/float agree, but the 2^62
        # state envelope admits moments where one big-int division differs
        # in the last ulp from the JVM/DuckDB cast-then-divide (ADVICE r13
        # item 1) — mirror the operand order exactly.
        return (float(num) / float(n * (n - 1))) / float(n)

    va = var_over_n(sa, qa, na)
    vb = var_over_n(sb, qb, nb)
    se2 = va + vb
    diff = float(sa) / float(na) - float(sb) / float(nb)
    if se2 > 0:
        t2 = (diff * diff) / se2
        df_w = (se2 * se2) / (
            (va * va) / float(na - 1) + (vb * vb) / float(nb - 1)
        )
        r4f = lambda x: math.floor(x * 10000.0 + 0.5) / 10000.0  # noqa: E731
        return state, (na, nb, r4f(t2), r4f(df_w))
    return state, (na, nb, None, None)


def _welch_staged(
    events: DataFrame, grp_a: str = "click", grp_b: str = "purchase"
) -> DataFrame:
    """Shared JVM staging: the two compared event types' values as exact
    cents (numeric.scaled_long — scale once, stay integer), tagged with
    the batch pair orientation (side 0 = lexicographically smaller
    name). key = 'a|b' so one test is one state row; NULL values are
    dropped (no cent value to accumulate — the batch twin's cast drops
    them the same way)."""
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long

    lo, hi = sorted((grp_a, grp_b))
    return events.filter(
        F.col("event_type").isin([lo, hi]) & F.col("value").isNotNull()
    ).select(
        F.lit(f"{lo}|{hi}").alias("key"),
        F.when(F.col("event_type") == lo, F.lit(0))
        .otherwise(F.lit(1))
        .cast("int")
        .alias("side"),
        scaled_long(F.col("value"), 100).alias("y"),
    )


def _welch_emit(key_val: str, out: tuple) -> pd.DataFrame:
    lo, hi = str(key_val).split("|", 1)
    n_a, n_b, t2, df_w = out
    return pd.DataFrame(
        {
            "g_a": [lo],
            "g_b": [hi],
            "n_a": [n_a],
            "n_b": [n_b],
            "t2": [t2],
            "df_welch": [df_w],
        }
    )


def welch_stream(
    events: DataFrame, grp_a: str = "click", grp_b: str = "purchase"
) -> DataFrame:
    """ONLINE Welch t² — the TWENTY-THIRD op on both stateful APIs and
    the first LIVE two-sample monitor in the shelf: per micro-batch,
    the unequal-variance test statistic between two event types' value
    distributions (the A/B guardrail form: a treatment's metric
    drifting from control drives t² up while the experiment is still
    running, instead of at the end-of-day batch). State is SIX BIGINTs
    (each side's exact n/Σ¢/Σ¢²) — bounded by construction; the fold is
    fully commutative (integer sums), so there is NO ordering contract.
    The drained final emission equals the oracle-validated batch
    ``operators/stats.py::welch_t2_pairs`` row on the same rows exactly
    (pinned — the ams/entropy certification pattern), including the
    n < 2 drop and the zero-variance NULL.

    Scale note (stated): one test = one state row, so one task owns the
    pair's arrivals — correct for the O(1)-state monitor this is; a
    deployment fanning one metric across thousands of experiments keys
    by experiment id and gets the usual per-key parallelism."""
    staged = _welch_staged(events, grp_a, grp_b)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        held = tuple(state.get) if state.exists else (0, 0, 0, 0, 0, 0)
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        b = pd.concat(frames, ignore_index=True)
        held, out = _welch_stream_fold(
            held, list(zip(b["side"].tolist(), b["y"].tolist()))
        )
        state.update(held)
        if out is not None:
            yield _welch_emit(key_val, out)

    return staged.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_WELCH_OUT_SCHEMA,
        stateStructType=_WELCH_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def welch_stream_tws(
    events: DataFrame, grp_a: str = "click", grp_b: str = "purchase"
) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of
    :func:`welch_stream` — same shared fold, no timers. GS ≡ TWS pinned
    on the same drain."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    staged = _welch_staged(events, grp_a, grp_b)

    class WelchProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("welch", _WELCH_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (key_val,) = key
            got = self._state.get()
            held = tuple(got) if got is not None else (0, 0, 0, 0, 0, 0)
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            b = pd.concat(frames, ignore_index=True)
            held, out = _welch_stream_fold(
                held, list(zip(b["side"].tolist(), b["y"].tolist()))
            )
            self._state.update(held)
            if out is not None:
                yield _welch_emit(key_val, out)

        def close(self) -> None:
            pass

    return staged.groupBy("key").transformWithStateInPandas(
        statefulProcessor=WelchProcessor(),
        outputStructType=_WELCH_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online SCD2 dimension maintenance — both stateful APIs
# ---------------------------------------------------------------------------

_SCD2DIM_OUT_SCHEMA = (
    "k string, p string, valid_from bigint, valid_to bigint, "
    "is_current boolean"
)
_SCD2DIM_STATE_SCHEMA = (
    StructType()
    .add("last_seq", LongType())
    .add("last_op", StringType())
    .add("last_p", StringType())
    .add("open_seq", LongType())
    .add("open_p", StringType())
)


def _scd2_stream_fold(state: tuple, rows: list) -> tuple:
    """Pure fold shared by BOTH stateful API forms: apply a key's
    seq-ASCENDING changelog slice to its Type-2 state, emitting version
    rows under EXACTLY the batch ``operators/scd.py::scd2_history``
    semantics — the same no-op collapse against the RAW previous change
    (a,a,a keeps the first; a,D,a keeps both a's), the same loud
    refusals (unknown op; duplicate (key, seq) — version order would be
    ambiguous), and the half-open [valid_from, valid_to) intervals.

    ORDER CONTRACT (stated, the X-181/X-190 family): the feed is
    seq-ordered per key — callers sort within the micro-batch, and a
    cross-batch regression (an arriving seq at or below the last seen)
    REFUSES loudly rather than silently rewriting closed history (the
    batch twin, seeing all rows at once, handles any file order; a live
    dimension cannot reopen what downstream already consumed).

    Emission contract (the OHLC/IVM dual-row reasoning): every
    surviving version emits on OPEN (valid_to NULL, is_current true)
    and again on CLOSE (valid_to = closing seq, is_current false) —
    append mode cannot retract, so the materialized dimension keeps,
    per (key, valid_from), the close row when both exist. State is five
    scalars per key: the raw-lag triple + the open version."""
    last_seq, last_op, last_p, open_seq, open_p = state
    out = []
    for op, seq, p in rows:
        if op not in ("I", "U", "D"):
            raise ValueError(
                f"scd2_stream: unknown op {op!r} - expected I/U/D"
            )
        seq = int(seq)
        if last_seq is not None and seq == last_seq:
            raise ValueError(
                f"scd2_stream: two changes at seq {seq} - version order "
                "is ambiguous"
            )
        if last_seq is not None and seq < last_seq:
            raise ValueError(
                f"scd2_stream: seq {seq} arrived after {last_seq} - the "
                "in-order feed contract is broken (the batch twin "
                "handles any order; a live dimension refuses to rewrite "
                "closed history)"
            )
        noop = (
            op in ("I", "U")
            and last_op in ("I", "U")
            and p == last_p  # None == None is the null-safe equal
        )
        if not noop:
            if open_seq is not None:
                out.append((open_p, open_seq, seq, False))
            if op == "D":
                open_seq, open_p = None, None
            else:
                open_seq, open_p = seq, p
                out.append((p, seq, None, True))
        last_seq, last_op, last_p = seq, op, p
    return (last_seq, last_op, last_p, open_seq, open_p), out


def _scd2_emit(key_val, out: list) -> pd.DataFrame:
    # valid_to is NULL on open rows: the nullable Int64 extension dtype
    # keeps the column integral through Arrow (a plain list with None
    # would land as object/float and corrupt the bigint output column).
    return pd.DataFrame(
        {
            "k": [str(key_val)] * len(out),
            "p": [p for p, *_ in out],
            "valid_from": pd.array(
                [vf for _, vf, *_ in out], dtype="Int64"
            ),
            "valid_to": pd.array(
                [vt for _, _, vt, _ in out], dtype="Int64"
            ),
            "is_current": [ic for *_, ic in out],
        }
    )


def _scd2_staged(changes: DataFrame) -> DataFrame:
    """Shared JVM staging: normalize the changelog to (k, op, seq, p)
    strings/longs. Op validation happens in the fold (the in-plan
    raise_error of the batch twin, moved Python-side with the state)."""
    return changes.select(
        F.col("k").cast("string").alias("k"),
        F.col("op").cast("string").alias("op"),
        F.col("seq").cast("long").alias("seq"),
        F.col("p").cast("string").alias("p"),
    )


def scd2_stream(changes: DataFrame) -> DataFrame:
    """ONLINE SCD2 dimension maintenance — the TWENTY-FOURTH op on both
    stateful APIs and the streaming half of the r12-green SCD2 family
    (`scd2_customer_history` / `scd2_snapshot_at` / the SCD2⋈CDC
    consistency claim): a live Type-2 versioned dimension maintained
    directly from the change stream, closing and opening validity
    intervals at micro-batch latency instead of a nightly history
    rebuild. State is FIVE scalars per key (the raw-lag triple + the
    open version) — bounded by construction. The drained emission set
    reconstructs to EXACTLY the batch ``scd2_history`` rows on the same
    changelog (pinned: closed rows ∪ never-closed opens), on one file
    and on three seq-ordered files; in-order feed contract and the
    open/close dual-emission contract stated in the fold docstring."""
    staged = _scd2_staged(changes)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        held = (
            tuple(state.get)
            if state.exists
            else (None, None, None, None, None)
        )
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        b = pd.concat(frames, ignore_index=True).sort_values("seq")
        rows = [
            (r.op, r.seq, None if pd.isna(r.p) else r.p)
            for r in b.itertuples()
        ]
        held, out = _scd2_stream_fold(held, rows)
        state.update(held)
        if out:
            yield _scd2_emit(key_val, out)

    return staged.groupBy("k").applyInPandasWithState(
        update,
        outputStructType=_SCD2DIM_OUT_SCHEMA,
        stateStructType=_SCD2DIM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def scd2_stream_tws(changes: DataFrame) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of :func:`scd2_stream`
    — same shared fold, no timers. GS ≡ TWS pinned on the same drain."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    staged = _scd2_staged(changes)

    class Scd2Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("scd2", _SCD2DIM_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (key_val,) = key
            got = self._state.get()
            held = tuple(got) if got is not None else (None, None, None, None, None)
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            b = pd.concat(frames, ignore_index=True).sort_values("seq")
            out_rows = [
                (r.op, r.seq, None if pd.isna(r.p) else r.p)
                for r in b.itertuples()
            ]
            held, out = _scd2_stream_fold(held, out_rows)
            self._state.update(held)
            if out:
                yield _scd2_emit(key_val, out)

        def close(self) -> None:
            pass

    return staged.groupBy("k").transformWithStateInPandas(
        statefulProcessor=Scd2Processor(),
        outputStructType=_SCD2DIM_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online chi-square contingency monitor — both stateful APIs
# ---------------------------------------------------------------------------

_CHI2_OUT_SCHEMA = (
    "key string, a string, b string, obs bigint, row_total bigint, "
    "col_total bigint, n bigint, contrib_milli bigint"
)
_CHI2_STATE_SCHEMA = (
    StructType()
    .add("a_vals", ArrayType(StringType()))
    .add("b_vals", ArrayType(StringType()))
    .add("counts", ArrayType(LongType()))
)
_CHI2_MAX_CELLS = 10_000
_CHI2_MAX_N = 100_000_000


def _chi2_stream_fold(state: tuple, pairs: list) -> tuple:
    """Pure fold shared by BOTH stateful API forms: bump the (a, b)
    observed-cell counters, then emit EXACTLY the batch
    ``operators/stats.py::chi_square_cells`` frame from them — the full
    marginal cross INCLUDING zero-observation cells, each cell's
    contrib_milli = (1000·(obs·n − rt·ct)²) div (rt·ct·n) in exact
    integer arithmetic (Python big-ints play the DECIMAL(38,0) role),
    and the SAME loud refusals (cells > max_cells: a high-cardinality
    pair is a modeling error; n > 1e8: the batch side's DECIMAL
    fourth-power envelope, kept for lockstep even though Python ints
    cannot overflow — stated). Counters SUM, so the fold is fully
    COMMUTATIVE — the FOURTH order-free op in the shelf (after online
    AMS, entropy, Welch).

    State is the observed-cell ledger as three parallel arrays — at
    most max_cells entries by the refusal, typically |A|·|B| ≪ that
    (the registered shape is a 6×7 event-type × day-of-week grid)."""
    a_vals, b_vals, counts = state
    ledger: dict = {
        (a_vals[i], b_vals[i]): counts[i] for i in range(len(counts))
    }
    for a, b in pairs:
        ledger[(a, b)] = ledger.get((a, b), 0) + 1
    rows_m: dict = {}
    cols_m: dict = {}
    for (a, b), c in ledger.items():
        rows_m[a] = rows_m.get(a, 0) + c
        cols_m[b] = cols_m.get(b, 0) + c
    n_cells = len(rows_m) * len(cols_m)
    if n_cells > _CHI2_MAX_CELLS:
        raise ValueError(
            f"chi2_stream: {n_cells} cells exceeds max_cells="
            f"{_CHI2_MAX_CELLS} - a high-cardinality pair is a modeling "
            "error"
        )
    n = sum(ledger.values())
    if n > _CHI2_MAX_N:
        raise ValueError(
            "chi2_stream: n > 1e8 would overflow the batch side's "
            "DECIMAL(38,0) fourth power - shard the test"
        )
    out = []
    key_str = lambda x: (x is not None, x if x is not None else "")  # noqa: E731
    for a in sorted(rows_m, key=key_str):
        for b in sorted(cols_m, key=key_str):
            obs = ledger.get((a, b), 0)
            rt, ct = rows_m[a], cols_m[b]
            d = obs * n - rt * ct
            contrib = (1000 * d * d) // (rt * ct * n)
            out.append((a, b, obs, rt, ct, n, contrib))
    keys = sorted(ledger, key=lambda kk: (key_str(kk[0]), key_str(kk[1])))
    new_state = (
        [k[0] for k in keys],
        [k[1] for k in keys],
        [ledger[k] for k in keys],
    )
    return new_state, out


def _chi2_staged(events: DataFrame) -> DataFrame:
    """Shared JVM staging: (key = the test's name, a = event_type,
    b = day-of-week) — the live independence monitor of "does this
    event type's traffic have its own weekly shape" (a batch twin of
    the chi_square_cells family on the same pair is one groupBy)."""
    return events.select(
        F.lit("event_type|dow").alias("key"),
        F.col("event_type").cast("string").alias("a"),
        F.dayofweek("ts").cast("string").alias("b"),
    )


def _chi2_emit(key_val, out: list) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "key": [str(key_val)] * len(out),
            "a": [r[0] for r in out],
            "b": [r[1] for r in out],
            "obs": [r[2] for r in out],
            "row_total": [r[3] for r in out],
            "col_total": [r[4] for r in out],
            "n": [r[5] for r in out],
            "contrib_milli": [r[6] for r in out],
        }
    )


def chi2_stream(events: DataFrame) -> DataFrame:
    """ONLINE chi-square contingency monitor — the TWENTY-FIFTH op on
    both stateful APIs: per micro-batch, the full per-cell independence
    frame between event type and day-of-week (the live form of the
    chi_square_cells audit: a type whose traffic develops its own
    weekly shape drives its cells' contrib_milli up while the shift is
    HAPPENING). State is the observed-cell counter ledger — bounded by
    the max_cells refusal, 6×7 at the staged pair; the fold is fully
    commutative (counters sum), the FOURTH order-free op. The drained
    max-n cell frame equals the oracle-validated batch
    ``chi_square_cells`` on the same rows exactly (pinned — zero cells
    from the marginal cross included)."""
    staged = _chi2_staged(events)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        held = (
            tuple(state.get) if state.exists else ([], [], [])
        )
        held = (list(held[0] or []), list(held[1] or []), list(held[2] or []))
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        b = pd.concat(frames, ignore_index=True)
        pairs = [
            (None if pd.isna(r.a) else r.a, None if pd.isna(r.b) else r.b)
            for r in b.itertuples()
        ]
        held, out = _chi2_stream_fold(held, pairs)
        state.update(held)
        yield _chi2_emit(key_val, out)

    return staged.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_CHI2_OUT_SCHEMA,
        stateStructType=_CHI2_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def chi2_stream_tws(events: DataFrame) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of :func:`chi2_stream`
    — same shared fold, no timers. GS ≡ TWS pinned on the same drain."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    staged = _chi2_staged(events)

    class Chi2Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("chi2", _CHI2_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (key_val,) = key
            got = self._state.get()
            held = (
                (list(got[0] or []), list(got[1] or []), list(got[2] or []))
                if got is not None
                else ([], [], [])
            )
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            b = pd.concat(frames, ignore_index=True)
            pairs = [
                (None if pd.isna(r.a) else r.a, None if pd.isna(r.b) else r.b)
                for r in b.itertuples()
            ]
            held, out = _chi2_stream_fold(held, pairs)
            self._state.update(held)
            yield _chi2_emit(key_val, out)

        def close(self) -> None:
            pass

    return staged.groupBy("key").transformWithStateInPandas(
        statefulProcessor=Chi2Processor(),
        outputStructType=_CHI2_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online Benford first-digit monitor — both stateful APIs
# ---------------------------------------------------------------------------

_BENFORDM_OUT_SCHEMA = (
    "key string, digit bigint, n_obs bigint, n_total bigint, "
    "obs_millionths bigint, expected_millionths bigint, "
    "dev_millionths bigint, conforms_15k boolean"
)
_BENFORDM_STATE_SCHEMA = StructType().add("counts", ArrayType(LongType()))

# Millionths of log10(1 + 1/d), d = 1..9 — fixed literals summing to
# exactly 10^6 (pinned in tests), not libm: the whole emission is exact
# integer arithmetic. The batch twin is the REGISTERED X-150
# `benford_totalprice` (operators/stats.py::benford_deviation), which
# carries the same constants at milli precision; the observed shares
# agree across the scales via the nested-division identity
# floor(floor(n·10^6/N)/1000) == floor(n·10^3/N) (pinned).
_BENFORDM_EXPECTED = (
    301030,
    176091,
    124939,
    96910,
    79181,
    66947,
    57992,
    51153,
    45757,
)


def _benford_stream_fold(counts: list, cents: list) -> tuple:
    """Pure fold shared by BOTH stateful API forms: bump the 9
    first-digit counters, then emit exactly the batch
    Benford audit frame (the X-150 benford_deviation shape at
    millionths precision) — per digit the observed count,
    observed share in millionths (integer division — Python ``//`` on
    positive ints is the same truncation as Spark ``div`` / DuckDB
    ``//``), the fixed Benford expectation, the absolute deviation, and
    the ±1.5pp conformance boolean. Counters SUM, so the fold is fully
    COMMUTATIVE — the FIFTH order-free op (after online AMS, entropy,
    Welch, chi²): late/reordered/resharded delivery cannot change any
    drained emission.

    Domain contract (the km_survival refusal discipline): only positive
    cent amounts have a first significant digit — staging drops
    NULL/non-positive values before the shuffle, and the fold REFUSES
    anything else (a NaN that slipped past staging, zero, a negative)
    rather than corrupt a counter."""
    counts = list(counts)
    for c in cents:
        if c != c or c <= 0:  # NaN fails the self-compare
            raise ValueError(
                f"benford_stream: cent amount {c!r} outside the positive "
                "domain (NULL/non-positive values are dropped at staging "
                "by contract)"
            )
        counts[int(str(int(c))[0]) - 1] += 1
    n = sum(counts)
    out = []
    for d in range(1, 10):
        obs = (counts[d - 1] * 1000000) // n
        exp = _BENFORDM_EXPECTED[d - 1]
        dev = abs(obs - exp)
        out.append((d, counts[d - 1], n, obs, exp, dev, dev <= 15000))
    return counts, out


def _benford_staged(events: DataFrame) -> DataFrame:
    """Shared JVM staging: (key = event_type, c = exact positive cents
    of the metric value) — the live first-digit conformance frame per
    type (batch twin: the REGISTERED X-150 ``benford_totalprice`` /
    operators/stats.py::benford_deviation, which audits order totals
    at milli precision; the stream form audits the metric column of
    whatever it is fed at millionths, keyed so each type carries its
    own audit). NULL and non-positive values are dropped HERE,
    before the shuffle — the fold refuses any that still arrive
    (stated contract on both sides)."""
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long

    return (
        events.filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").cast("string").alias("key"),
            scaled_long(F.col("value"), 100).alias("c"),
        )
        .filter(F.col("c") > 0)
    )


def _benford_emit(key_val, out) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "key": [str(key_val)] * 9,
            "digit": [r[0] for r in out],
            "n_obs": [r[1] for r in out],
            "n_total": [r[2] for r in out],
            "obs_millionths": [r[3] for r in out],
            "expected_millionths": [r[4] for r in out],
            "dev_millionths": [r[5] for r in out],
            "conforms_15k": [r[6] for r in out],
        }
    )


def benford_stream(events: DataFrame) -> DataFrame:
    """ONLINE Benford first-digit monitor — the TWENTY-SIXTH op on both
    stateful APIs: per event type, the live 9-row first-digit
    conformance frame of the metric value (a fraud pattern or a
    generator bug injecting uniform amounts drives the affected
    digits' conformance FALSE while it happens, not at the nightly
    audit). State is a FIXED 9-long counter array per key — bounded by
    construction; the fold is commutative (counters sum), so
    late/reordered/resharded delivery cannot change any drained
    emission. The drained final frame per key equals the
    oracle-validated batch X-150 ``benford_deviation`` arithmetic on
    the same rows exactly — counts equal, observed shares equal across
    the milli/millionths scales via the nested-division identity
    (pinned)."""
    staged = _benford_staged(events)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        held = list(state.get[0]) if state.exists else [0] * 9
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        b = pd.concat(frames, ignore_index=True)
        held, out = _benford_stream_fold(held, b["c"].tolist())
        state.update((held,))
        yield _benford_emit(key_val, out)

    return staged.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_BENFORDM_OUT_SCHEMA,
        stateStructType=_BENFORDM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def benford_stream_tws(events: DataFrame) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of
    :func:`benford_stream` — same shared fold, no timers. GS ≡ TWS
    pinned on the same drain."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    staged = _benford_staged(events)

    class BenfordProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("bfd", _BENFORDM_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (key_val,) = key
            got = self._state.get()
            held = list(got[0]) if got is not None else [0] * 9
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            b = pd.concat(frames, ignore_index=True)
            held, out = _benford_stream_fold(held, b["c"].tolist())
            self._state.update((held,))
            yield _benford_emit(key_val, out)

        def close(self) -> None:
            pass

    return staged.groupBy("key").transformWithStateInPandas(
        statefulProcessor=BenfordProcessor(),
        outputStructType=_BENFORDM_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# ---------------------------------------------------------------------------
# Online HHI concentration monitor — both stateful APIs
# ---------------------------------------------------------------------------

_HHIM_OUT_SCHEMA = (
    "key string, n_sellers bigint, total_cents bigint, "
    "hhi_millionths bigint, top_share_millionths bigint"
)
_HHIM_STATE_SCHEMA = (
    StructType()
    .add("sellers", ArrayType(LongType()))
    .add("cents", ArrayType(LongType()))
)

# A per-key seller ledger past this is a modeling error (the chi²
# max_cells discipline): the op monitors concentration among a bounded
# population (suppliers of a nation, users of a metric), not an
# unbounded id stream — key finer or pre-aggregate.
_HHIM_MAX_SELLERS = 10_000
# Per-seller Σcents rides a BIGINT state column; refuse before a sum
# could wrap (the Welch envelope discipline).
_HHIM_ENVELOPE = 1 << 62


def _hhi_stream_fold(state: tuple, rows: list) -> tuple:
    """Pure fold shared by BOTH stateful API forms: add each arrival's
    exact positive cents into its seller's ledger entry, then emit the
    batch ``hhi_supplier_concentration`` arithmetic EXACTLY — HHI =
    (Σ s²)·10^6 // (Σ s)² with Python big-ints in the DECIMAL(38,0)/
    HUGEINT role (same truncation as Spark ``div`` / DuckDB ``//`` on
    positives) — plus the live whale signal top_share = (max s)·10^6 //
    total. Ledger entries SUM, so the fold is fully COMMUTATIVE — the
    SIXTH order-free op (after online AMS, entropy, Welch, chi²,
    Benford).

    Refusals (the km_survival discipline): non-positive/NaN cents
    (staging drops them by contract), a seller ledger past
    ``_HHIM_MAX_SELLERS``, or any per-seller sum past the 2^62 BIGINT
    state envelope."""
    sellers, cents = state
    ledger: dict = dict(zip(sellers, cents))
    for s, c in rows:
        if c != c or c <= 0:  # NaN fails the self-compare
            raise ValueError(
                f"hhi_stream: cent amount {c!r} outside the positive "
                "domain (NULL/non-positive values are dropped at staging "
                "by contract)"
            )
        ledger[s] = ledger.get(s, 0) + int(c)
        if ledger[s] > _HHIM_ENVELOPE:
            raise ValueError(
                "hhi_stream: per-seller cents beyond the BIGINT state "
                "envelope (2^62) - rescale the metric before streaming it"
            )
    if len(ledger) > _HHIM_MAX_SELLERS:
        raise ValueError(
            f"hhi_stream: {len(ledger)} sellers exceeds max_sellers="
            f"{_HHIM_MAX_SELLERS} - an unbounded id stream is a modeling "
            "error; key finer or pre-aggregate"
        )
    total = sum(ledger.values())
    ss = sum(v * v for v in ledger.values())
    out = (
        len(ledger),
        total,
        (ss * 1000000) // (total * total),
        (max(ledger.values()) * 1000000) // total,
    )
    new_sellers = list(ledger.keys())
    return (new_sellers, [ledger[s] for s in new_sellers]), out


def _hhi_staged(events: DataFrame) -> DataFrame:
    """Shared JVM staging: (key = event_type, s = user_id, c = exact
    positive cents of the metric value) — per type, the live
    concentration of the metric across users (batch twin:
    queries_round18._hhi_supplier_concentration, X-239, which measures
    supplier revenue per nation; the stream form answers 'is one user
    becoming this metric' — the whale/abuse signal). NULL and
    non-positive values are dropped HERE, before the shuffle; the fold
    refuses any that still arrive (stated contract on both sides)."""
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long

    return (
        events.filter(
            F.col("value").isNotNull() & F.col("user_id").isNotNull()
        )
        .select(
            F.col("event_type").cast("string").alias("key"),
            F.col("user_id").cast("long").alias("s"),
            scaled_long(F.col("value"), 100).alias("c"),
        )
        .filter(F.col("c") > 0)
    )


def _hhi_emit(key_val, out) -> pd.DataFrame:
    n, total, hhi, top = out
    return pd.DataFrame(
        {
            "key": [str(key_val)],
            "n_sellers": [n],
            "total_cents": [total],
            "hhi_millionths": [hhi],
            "top_share_millionths": [top],
        }
    )


def hhi_stream(events: DataFrame) -> DataFrame:
    """ONLINE HHI concentration monitor — the TWENTY-SEVENTH op on both
    stateful APIs: per event type, the live Herfindahl-Hirschman index
    of the metric value across users (one user swallowing a metric —
    a whale, a runaway bot, a stuck retry loop — drives HHI and
    top_share up in the next micro-batch, long before a daily batch
    audit). State is the per-seller cents ledger as two parallel
    arrays, bounded by the max_sellers refusal; the fold is commutative
    (ledger entries sum), so late/reordered/resharded delivery cannot
    change any drained emission. The drained final row per key equals
    the oracle-validated batch ``hhi_supplier_concentration``
    arithmetic on the same rows exactly (pinned against the r18 batch
    twin)."""
    staged = _hhi_staged(events)

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (key_val,) = key
        if state.exists:
            got = state.get
            held = (list(got[0]), list(got[1]))
        else:
            held = ([], [])
        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        b = pd.concat(frames, ignore_index=True)
        held, out = _hhi_stream_fold(
            held, list(zip(b["s"].tolist(), b["c"].tolist()))
        )
        state.update(held)
        yield _hhi_emit(key_val, out)

    return staged.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=_HHIM_OUT_SCHEMA,
        stateStructType=_HHIM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def hhi_stream_tws(events: DataFrame) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` twin of :func:`hhi_stream`
    — same shared fold, no timers. GS ≡ TWS pinned on the same drain."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    staged = _hhi_staged(events)

    class HHIProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("hhi", _HHIM_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            (key_val,) = key
            got = self._state.get()
            held = (list(got[0]), list(got[1])) if got is not None else ([], [])
            frames = [p for p in rows if len(p)]
            if not frames:
                return
            b = pd.concat(frames, ignore_index=True)
            held, out = _hhi_stream_fold(
                held, list(zip(b["s"].tolist(), b["c"].tolist()))
            )
            self._state.update(held)
            yield _hhi_emit(key_val, out)

        def close(self) -> None:
            pass

    return staged.groupBy("key").transformWithStateInPandas(
        statefulProcessor=HHIProcessor(),
        outputStructType=_HHIM_OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
