"""Structured Streaming tests: real micro-batch execution of the streaming
jobs, cross-checked against their oracle-verified batch twins."""

from __future__ import annotations

import shutil
import time
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.streaming import jobs, sinks, sources


def _write_single_file(df, dest_dir: Path, name: str) -> None:
    """Write df as exactly one parquet file named <name> inside dest_dir."""
    staging = dest_dir / f"_stage_{name}"
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    part = next(staging.glob("part-*.parquet"))
    dest_dir.mkdir(parents=True, exist_ok=True)
    shutil.copy(part, dest_dir / name)
    shutil.rmtree(staging)


@pytest.fixture(scope="module", autouse=True)
def _few_state_partitions(spark):
    """Stateful streaming tests pay one RocksDB store open/commit per
    shuffle partition per micro-batch (~0.5 s each on this host), so the
    session default of 8 partitions made state commits dominate this
    module (~31 s/test, the default verify gate's single largest cost —
    r15 optimization round, VERDICT r14 item 2). Two partitions keep
    every assertion identical — all are content-based, none depend on
    partitioning — at a quarter of the per-micro-batch state cost
    (measured: 6-test stateful subset 53.0 s → 48.8 s; modest there, but
    the multi-micro-batch tests later in the module pay the per-batch
    store cost many times over)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    yield
    spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.fixture(scope="module")
def events_df(spark, sf_dir):
    return io.load_table(spark, sf_dir, "events")


def test_stream_health_matches_batch_twin(spark, events_df, tmp_path):
    src = tmp_path / "events_src"
    _write_single_file(events_df, src, "events-00.parquet")

    stream = sources.file_event_stream(spark, str(src))
    health = jobs.stream_health_60s(stream, watermark="10 minutes")
    q = (
        health.writeStream.format("memory")
        .queryName("health_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_health"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT user_id, unix_timestamp(window_start) AS ws, put_media_sum,"
        " n_events, n_errors FROM health_out"
    ).collect()
    assert len(got) > 0

    # Batch twin over the same data (same window operator). Append mode only
    # emits windows finalized by the watermark, so restrict the twin to
    # windows strictly older than (max_ts - watermark).
    batch = (
        events_df.groupBy(F.window("ts", "60 seconds").alias("w"), "user_id")
        .agg(
            F.sum("value").alias("put_media_sum"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.unix_timestamp("w.start").alias("ws"), "user_id", "put_media_sum", "n_events"
        )
    )
    expected = {(r.user_id, r.ws): (r.put_media_sum, r.n_events) for r in batch.collect()}
    for r in got:
        exp = expected[(r.user_id, r.ws)]
        assert abs(exp[0] - r.put_media_sum) < 1e-9
        assert exp[1] == r.n_events
    # Every emitted window is final → emitted set must be a prefix of the
    # batch twin up to the watermark cutoff.
    max_ts = events_df.agg(F.max(F.unix_timestamp("ts"))).collect()[0][0]
    finalized = {k for k in expected if k[1] + 60 <= max_ts - 600}
    emitted = {(r.user_id, r.ws) for r in got}
    assert finalized <= emitted


def test_streaming_dedup_drops_duplicates(spark, events_df, tmp_path):
    src = tmp_path / "dup_src"
    doubled = events_df.unionByName(events_df)  # every event twice
    _write_single_file(doubled, src, "events-00.parquet")

    stream = sources.file_event_stream(spark, str(src))
    deduped = jobs.streaming_dedup(stream, watermark="10 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_out = spark.sql("SELECT COUNT(*) FROM dedup_out").collect()[0][0]
    n_distinct = events_df.select("event_id").distinct().count()
    assert n_out == n_distinct


def test_watchdog_stream_matches_batch_twin(spark, sf_dir, tmp_path):
    """The applyInPandasWithState machine, fed in two micro-batches, must emit
    exactly the actions the batch twin computes on the full log — state
    carries across batches."""
    probes = io.probe_log(spark, sf_dir).select("device_id", "ts", "event_id", "ok")
    split_ts = probes.approxQuantile("event_id", [0.5], 0.01)[0]
    first = probes.filter(F.col("event_id") <= split_ts)
    second = probes.filter(F.col("event_id") > split_ts)

    src = tmp_path / "probe_src"
    _write_single_file(first, src, "probes-00.parquet")
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    _write_single_file(second, src, "probes-01.parquet")

    stream = (
        spark.readStream.schema(probes.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    actions = jobs.watchdog_actions(stream)
    store: list = []
    q = (
        actions.writeStream.foreachBatch(sinks.collecting_sink(store))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_wd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    from kinesis_stream_video_project_spark.plans.queries_streaming_twins import (
        watchdog_state_machine,
    )

    # event_id split is not exactly time-ordered per device, so replay the
    # same two-chunk order the stream saw: chunk order == event_id order here
    # because the fixture assigns event_id monotonically with ts.
    batch = watchdog_state_machine(spark, sf_dir).collect()
    got = sorted((r.device_id, r.action_ts_us, r.action) for r in store)
    want = sorted((r.device_id, r.action_ts_us, r.action) for r in batch)
    assert got == want


def test_alert_formatting(spark, sf_dir, tmp_path):
    from kinesis_stream_video_project_spark.plans.queries_streaming_twins import (
        watchdog_state_machine,
    )

    actions = watchdog_state_machine(spark, sf_dir)
    alerts = sinks.format_alerts(actions)
    rows = alerts.collect()
    if rows:
        r = rows[0]
        assert "@" in r.to
        assert r.alert_iso.endswith("Z")
        assert r.action in set(
            __import__(
                "kinesis_stream_video_project_spark.config", fromlist=["ESCALATION_LADDER"]
            ).ESCALATION_LADDER
        )
        assert str(r.device_id) in r.message


def test_stream_static_join_enriches_and_filters(spark, sf_dir, events_df, tmp_path):
    src = tmp_path / "enrich_src"
    _write_single_file(events_df, src, "events-00.parquet")

    catalog = io.stream_catalog(spark, sf_dir)
    stream = sources.file_event_stream(spark, str(src))
    enriched = jobs.enrich_with_catalog(stream, catalog)
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT event_id, stream_name, device_name FROM enriched_out"
    ).collect()

    # Batch twin: same broadcast join over the static frames.
    active = catalog.filter(F.col("status") == "ACTIVE")
    want = (
        events_df.join(active, events_df["user_id"] == active["stream_key"])
        .select("event_id", "stream_name", "device_name")
        .collect()
    )
    assert len(got) == len(want) > 0
    assert {(r.event_id, r.stream_name) for r in got} == {
        (r.event_id, r.stream_name) for r in want
    }
    # Only ACTIVE streams survive (check_wf.sh:13 semantics).
    statuses = {r.stream_name: r.status for r in catalog.collect()}
    assert all(statuses[r.stream_name] == "ACTIVE" for r in got)


def test_sliding_and_session_windows_run_incrementally(spark, events_df, tmp_path):
    src = tmp_path / "win_src"
    _write_single_file(events_df, src, "events-00.parquet")

    for name, job in (
        ("sliding_out", jobs.sliding_error_rate),
        ("session_out", jobs.session_activity),
    ):
        stream = sources.file_event_stream(spark, str(src))
        q = (
            job(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(f"SELECT COUNT(*) AS n FROM {name}").collect()[0].n
        assert rows > 0

    # Sliding-window invariant: every event lands in window/slide = 5 windows,
    # so summed n_events across windows = 5x the event count (up to watermark
    # truncation at the stream tail; assert on fully-covered events only).
    total = spark.sql("SELECT SUM(n_events) AS s FROM sliding_out").collect()[0].s
    assert total > events_df.count()  # strictly more than 1x => overlap happened


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_df, tmp_path):
    # Probes = error/ok observations; metrics = the same events' values.
    probes_batch = io.probe_log(spark, sf_dir)
    psrc, msrc = tmp_path / "ss_probes", tmp_path / "ss_metrics"
    _write_single_file(probes_batch, psrc, "probes-00.parquet")
    _write_single_file(events_df, msrc, "metrics-00.parquet")

    probes = sources.file_event_stream(spark, str(psrc))
    metrics = sources.file_event_stream(spark, str(msrc))
    joined = jobs.correlate_probe_metric(probes, metrics, max_lag="60 seconds")
    q = (
        joined.writeStream.format("memory")
        .queryName("ss_join_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ss"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT device_id, unix_timestamp(probe_ts) AS pt,"
        " unix_timestamp(metric_ts) AS mt, metric_value FROM ss_join_out"
    ).collect()
    assert len(got) > 0

    # Batch twin: identical interval-join condition on the static frames.
    p = probes_batch.select(
        F.col("device_id").alias("d"), F.col("ts").alias("probe_ts")
    )
    m = events_df.select(
        F.col("user_id").alias("u"), F.col("ts").alias("metric_ts"), "value"
    )
    want = (
        p.join(
            m,
            (F.col("d") == F.col("u"))
            & (F.col("metric_ts") >= F.col("probe_ts") - F.expr("INTERVAL 60 seconds"))
            & (F.col("metric_ts") <= F.col("probe_ts")),
        )
        .select(
            F.col("d"),
            F.unix_timestamp("probe_ts").alias("pt"),
            F.unix_timestamp("metric_ts").alias("mt"),
        )
        .collect()
    )
    # Streaming (single batch, all data before watermark advance) must emit
    # exactly the batch join result.
    assert {(r.device_id, r.pt, r.mt) for r in got} == {
        (r.d, r.pt, r.mt) for r in want
    }


def test_watchdog_tws_matches_batch_twin(spark, sf_dir, tmp_path):
    """The transformWithStateInPandas machine (Spark 4 arbitrary-state API)
    must emit exactly what the batch twin and the applyInPandasWithState form
    emit — all three share operators/watchdog.py::replay_device."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state-server protocol needs protobuf",
    )
    probes = io.probe_log(spark, sf_dir).select("device_id", "ts", "event_id", "ok")
    split_id = probes.approxQuantile("event_id", [0.5], 0.01)[0]
    first = probes.filter(F.col("event_id") <= split_id)
    second = probes.filter(F.col("event_id") > split_id)

    src = tmp_path / "probe_src_tws"
    _write_single_file(first, src, "probes-00.parquet")
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    _write_single_file(second, src, "probes-01.parquet")

    stream = (
        spark.readStream.schema(probes.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    actions = jobs.watchdog_actions_tws(stream)
    store: list = []
    q = (
        actions.writeStream.foreachBatch(sinks.collecting_sink(store))
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    from kinesis_stream_video_project_spark.plans.queries_streaming_twins import (
        watchdog_state_machine,
    )

    batch = watchdog_state_machine(spark, sf_dir).collect()
    got = sorted((r.device_id, r.action_ts_us, r.action) for r in store)
    want = sorted((r.device_id, r.action_ts_us, r.action) for r in batch)
    assert got == want


def test_scd2_stream_matches_batch_twin(spark, sf_dir, events_df, tmp_path):
    """Streaming SCD2 (closed intervals via per-user state) must equal the
    batch twin's is_current = false rows when the whole log is drained —
    across MULTIPLE micro-batches (maxFilesPerTrigger=1 over a by-time
    split, so every user's open interval rides state between batches; the
    by-time split is the per-key in-order delivery the lateness=0 contract
    documents)."""
    from kinesis_stream_video_project_spark.plans.queries_round4 import (
        scd2_user_status,
    )

    cols = events_df.select("user_id", "ts", "event_id", "event_type")
    cut = cols.approxQuantile("event_id", [0.5], 0.01)[0]
    src = tmp_path / "scd2_src"
    # event_id is monotone with ts in the fixture, so an event_id split IS a
    # time split: batch 2 is strictly later than batch 1 for every user.
    _write_single_file(cols.filter(F.col("event_id") <= cut), src, "events-00.parquet")
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    _write_single_file(cols.filter(F.col("event_id") > cut), src, "events-01.parquet")
    stream = (
        spark.readStream.schema(cols.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = jobs.scd2_status_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("scd2_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_scd2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.status, r.valid_from_us, r.valid_to_us)
        for r in spark.sql("SELECT * FROM scd2_out").collect()
    }
    want = {
        (r.user_id, r.status, r.valid_from_us, r.valid_to_us)
        for r in scd2_user_status(spark, sf_dir).filter("NOT is_current").collect()
    }
    assert got == want and len(got) > 0


def test_scd2_stream_reorders_late_events(spark, tmp_path):
    """allowed_lateness_us > 0: a genuinely LATE event (earlier ts arriving
    in a later micro-batch) must fold into its correct position. Three
    single-file micro-batches: (A@1s, B@3s), then late C@2s, then D@1000s
    which advances the frontier (max_ts - lateness) past the buffered tail.
    Correct intervals: A=[1s, 2s), C=[2s, 3s); B stays open at 3s and D is
    still inside the lateness horizon, so exactly two closed rows appear.
    The lateness=0 path would have folded A,B then dropped-or-misplaced C —
    the failure mode ADVICE r4 flagged; this pins the buffered fix."""
    import datetime as dt

    schema = "user_id long, ts timestamp, event_id long, event_type string"

    def ev(sec, eid, status):
        return (
            7,
            dt.datetime(2026, 1, 1, 0, 0, 0) + dt.timedelta(seconds=sec),
            eid,
            status,
        )

    src = tmp_path / "late_src"
    batches = [
        [ev(1, 1, "A"), ev(3, 3, "B")],
        [ev(2, 2, "C")],  # late: ts between the two already-seen events
        [ev(1000, 4, "D")],  # watermark-advancer
    ]
    for i, rows in enumerate(batches):
        _write_single_file(
            spark.createDataFrame(rows, schema), src, f"events-0{i}.parquet"
        )
        if i < len(batches) - 1:
            time.sleep(1.1)  # distinct mtimes → deterministic file order
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = jobs.scd2_status_stream(stream, allowed_lateness_us=10_000_000)
    q = (
        out.writeStream.format("memory")
        .queryName("scd2_late_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_scd2_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.status, r.valid_from_us, r.valid_to_us)
        for r in spark.sql("SELECT * FROM scd2_late_out").collect()
    }
    # Sessions (and this container) run in UTC, so the naive datetimes above
    # are UTC instants; make the expected epoch explicit about that.
    base_us = (
        int(dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc).timestamp())
        * 1_000_000
    )
    want = {
        (7, "A", base_us + 1_000_000, base_us + 2_000_000 - 1),
        (7, "C", base_us + 2_000_000, base_us + 3_000_000 - 1),
    }
    assert got == want


def test_scd2_stream_drops_beyond_lateness_events(spark, tmp_path):
    """The buffered mode's watermark contract: an event arriving LATER than
    the fold frontier (max seen ts minus allowed lateness) is DROPPED, not
    folded backwards — folding it would rewrite already-emitted closed
    intervals, which an append-mode stream cannot retract. Batch 1 drives
    the frontier far past 3s (E@1000s with 10s lateness → frontier 990s);
    batch 2's X@3s is then beyond-lateness and must leave no trace: the
    closed A interval stays exactly as batch 1 emitted it and no X
    interval ever appears."""
    import datetime as dt

    schema = "user_id long, ts timestamp, event_id long, event_type string"

    def ev(sec, eid, status):
        return (
            7,
            dt.datetime(2026, 1, 1) + dt.timedelta(seconds=sec),
            eid,
            status,
        )

    src = tmp_path / "drop_src"
    batches = [
        [ev(1, 1, "A"), ev(5, 2, "B"), ev(1000, 3, "E")],
        [ev(3, 4, "X")],  # beyond lateness: frontier is already 990s
    ]
    for i, rows in enumerate(batches):
        _write_single_file(
            spark.createDataFrame(rows, schema), src, f"events-0{i}.parquet"
        )
        if i < len(batches) - 1:
            time.sleep(1.1)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = jobs.scd2_status_stream(stream, allowed_lateness_us=10_000_000)
    q = (
        out.writeStream.format("memory")
        .queryName("scd2_drop_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_scd2_drop"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.status, r.valid_from_us, r.valid_to_us)
        for r in spark.sql("SELECT * FROM scd2_drop_out").collect()
    }
    base_us = (
        int(dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc).timestamp())
        * 1_000_000
    )
    # Batch 1 folds A@1s and B@5s (frontier 990s): A closes at B's start.
    # B stays open in state, E stays buffered at the tip (1000s > 990s),
    # and X@3s is dropped in batch 2 — exactly one closed row, unchanged.
    want = {(7, "A", base_us + 1_000_000, base_us + 5_000_000 - 1)}
    assert got == want


def test_upsert_partition_sink_keeps_latest_per_key(spark, sf_dir, tmp_path):
    """The foreachBatch upsert sink must converge to exactly one row per
    key — the LATEST by (ts, event_id) across ALL micro-batches — with the
    table laid out as {key}=value partition directories (the upsert unit).
    Replayed in two maxFilesPerTrigger=1 batches so the merge path (batch 2
    updating keys batch 1 already wrote) actually runs."""
    probes = io.probe_log(spark, sf_dir).select(
        "device_id", F.unix_micros("ts").alias("ts_us"), "event_id", "ok"
    )
    cut = probes.approxQuantile("event_id", [0.5], 0.01)[0]
    src = tmp_path / "upsert_src"
    _write_single_file(probes.filter(F.col("event_id") <= cut), src, "p0.parquet")
    time.sleep(1.1)
    _write_single_file(probes.filter(F.col("event_id") > cut), src, "p1.parquet")

    dest = tmp_path / "device_state"
    stream = (
        spark.readStream.schema(probes.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            sinks.upsert_partition_sink(
                str(dest), "device_id", ("ts_us", "event_id")
            )
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_upsert"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = spark.read.parquet(str(dest))
    want = (
        probes.groupBy("device_id")
        .agg(F.max(F.struct("ts_us", "event_id", "ok")).alias("w"))
        .select("device_id", "w.*")
    )
    assert got.count() == want.count() == probes.select("device_id").distinct().count()
    g = {(r.device_id, r.ts_us, r.event_id, r.ok) for r in got.collect()}
    x = {(r.device_id, r.ts_us, r.event_id, r.ok) for r in want.collect()}
    assert g == x
    # the table is physically partitioned by the upsert key
    assert any(p.name.startswith("device_id=") for p in dest.iterdir())


def test_checkpoint_restart_resumes_exactly_once(spark, sf_dir, tmp_path):
    """Stop the watchdog stream as soon as a micro-batch has committed
    (usually mid-drain, occasionally after it raced to completion — the
    assertion is timing-independent), restart from the SAME checkpoint,
    drain — the union of both runs' outputs must equal the batch twin
    exactly (no lost batch, no duplicated batch). This is
    the recovery contract a 100 TB deployment leans on: offsets commit to
    the checkpoint ahead of output, foreachBatch replays an uncommitted
    batch with the same batch_id, and per-key state rehydrates from the
    state store."""
    probes = io.probe_log(spark, sf_dir).select(
        "device_id", "ts", "event_id", "ok"
    )
    cut = probes.approxQuantile("event_id", [0.5], 0.01)[0]
    src = tmp_path / "ckpt_probe_src"
    _write_single_file(probes.filter(F.col("event_id") <= cut), src, "p0.parquet")
    time.sleep(1.1)
    _write_single_file(probes.filter(F.col("event_id") > cut), src, "p1.parquet")

    ckpt = str(tmp_path / "ckpt_restart")
    store: list = []

    def run(stop_after_first: bool) -> None:
        stream = (
            spark.readStream.schema(probes.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.watchdog_actions(stream)
            .writeStream.foreachBatch(sinks.collecting_sink(store))
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if stop_after_first:
            deadline = time.time() + 120
            while time.time() < deadline:
                if any(p["numInputRows"] > 0 for p in q.recentProgress):
                    break
                time.sleep(0.2)
            q.stop()  # hard stop mid-drain; second file not yet committed
            q.awaitTermination(60)
        else:
            q.awaitTermination(180)

    run(stop_after_first=True)
    n_first = len(store)
    run(stop_after_first=False)

    from kinesis_stream_video_project_spark.plans.queries_streaming_twins import (
        watchdog_state_machine,
    )

    batch = watchdog_state_machine(spark, sf_dir).collect()
    got = sorted((r.device_id, r.action_ts_us, r.action) for r in store)
    want = sorted((r.device_id, r.action_ts_us, r.action) for r in batch)
    assert got == want, (
        f"restart lost or duplicated output (first run emitted {n_first})"
    )


def test_ewma_stream_matches_batch_twin(spark, sf_dir, events_df, tmp_path):
    """Streaming EWMA must emit exactly the batch twin's rows when the log
    drains across MULTIPLE micro-batches (maxFilesPerTrigger=1 over a
    by-time split — the per-key in-order delivery the lateness=0 contract
    documents): the running average rides per-user state between batches
    and both sides round with the same portable 4-dp floor."""
    from kinesis_stream_video_project_spark.plans.queries_round5b import (
        ewma_metric,
    )

    cols = events_df.select("user_id", "ts", "event_id", "value")
    cut = cols.approxQuantile("event_id", [0.5], 0.01)[0]
    src = tmp_path / "ewma_src"
    _write_single_file(cols.filter(F.col("event_id") <= cut), src, "events-00.parquet")
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    _write_single_file(cols.filter(F.col("event_id") > cut), src, "events-01.parquet")
    stream = (
        spark.readStream.schema(cols.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        jobs.ewma_stream(stream)
        .writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ewma"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.event_id, r.ewma)
        for r in spark.sql("SELECT * FROM ewma_out").collect()
    }
    want = {
        (r.user_id, r.event_id, r.ewma)
        for r in ewma_metric(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_ewma_stream_buffered_reorders_late_events(spark, tmp_path):
    """allowed_lateness_us > 0: a late event (earlier ts in a later
    micro-batch) must fold — and emit — in correct order. Three single-file
    batches for one user: (A@1s v=1, B@3s v=3), late C@2s v=2, then
    D@1000s which advances the frontier past the buffered tail. Correct
    emission once D lands: A=1.0, C=0.5*1+0.5*2=1.5, B=0.5*1.5+0.5*3=2.25;
    D itself stays inside the lateness horizon (no row). The lateness=0
    path would have emitted A,B first and then folded C after B —
    corrupting every subsequent value, which is why buffered mode delays
    emission instead of retracting."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    def ev(eid, sec, val):
        return (int(eid), base + dt.timedelta(seconds=sec), 1, float(val))

    schema = "event_id long, ts timestamp, user_id long, value double"
    src = tmp_path / "ewma_late_src"
    batches = [
        [ev(10, 1, 1.0), ev(30, 3, 3.0)],
        [ev(20, 2, 2.0)],
        [ev(40, 1000, 9.0)],
    ]
    for i, rows in enumerate(batches):
        _write_single_file(
            spark.createDataFrame(rows, schema), src, f"events-0{i}.parquet"
        )
        time.sleep(1.1)
    stream = (
        spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        jobs.ewma_stream(stream, allowed_lateness_us=2_000_000)
        .writeStream.format("memory")
        .queryName("ewma_late_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ewma_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.ewma)
        for r in spark.sql("SELECT * FROM ewma_late_out").collect()
    }
    assert got == {(10, 1.0), (20, 1.5), (30, 2.25)}, got


def test_zscore_stream_matches_batch_twin(spark, sf_dir, events_df, tmp_path):
    """Streaming rolling-z-score must emit exactly the batch twin's flagged
    rows when the log drains across MULTIPLE micro-batches (same by-time
    split + in-order-delivery contract as the EWMA twin test): the
    trailing integer deque rides per-user state between batches."""
    from kinesis_stream_video_project_spark.plans.queries_round5d import (
        rolling_zscore_anomalies,
    )

    cols = events_df.select("user_id", "ts", "event_id", "value")
    cut = cols.approxQuantile("event_id", [0.5], 0.01)[0]
    src = tmp_path / "zscore_src"
    _write_single_file(cols.filter(F.col("event_id") <= cut), src, "events-00.parquet")
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    _write_single_file(cols.filter(F.col("event_id") > cut), src, "events-01.parquet")
    stream = (
        spark.readStream.schema(cols.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        jobs.zscore_stream(stream)
        .writeStream.format("memory")
        .queryName("zscore_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_zscore"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.event_id, r.value_micro)
        for r in spark.sql("SELECT * FROM zscore_out").collect()
    }
    want = {
        (r.user_id, r.event_id, r.value_micro)
        for r in rolling_zscore_anomalies(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_zscore_fold_matches_batch_operator_bruteforce():
    """The pure fold must agree with a direct definition: for each row,
    mean/variance over the trailing ≤20 values, flag |v − μ| > 3σ — checked
    in exact fractions (no float), over a deterministic value sequence with
    a planted spike."""
    vals = [100 + ((i * 37) % 11) for i in range(50)]
    vals[30] = 10**7  # planted spike
    rows = [(i, v) for i, v in enumerate(vals)]
    _, flagged = jobs._zscore_fold([], rows)
    want = []
    for i in range(len(vals)):
        w = vals[max(0, i - 19) : i + 1]
        n = len(w)
        if n < 10:
            continue
        s, q = sum(w), sum(x * x for x in w)
        # (n*v - s)^2 > 9*(n*q - s*s)  <=>  |v-mean| > 3*sigma_pop
        if (n * vals[i] - s) ** 2 > 9 * (n * q - s * s):
            want.append((i, vals[i]))
    assert flagged == want
    assert any(eid == 30 for eid, _ in flagged)


def test_zscore_stream_buffered_reorders_late_events(spark, tmp_path):
    """allowed_lateness_us > 0: a late event must fold in correct (ts,
    event_id) order before any flag decision. 12 calm events arrive, the
    SPIKE arrives one micro-batch late (earlier ts than the last calm
    event), then a far-future event advances the frontier: the spike must
    be flagged with the stats of its CORRECT trailing window — and the
    in-order tail event, whose window now contains the spike, must not
    produce a spurious flag set different from the batch order."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    def ev(eid, sec, val):
        return (int(eid), base + dt.timedelta(seconds=sec), 1, float(val))

    schema = "event_id long, ts timestamp, user_id long, value double"
    calm = [ev(i, i, 100 + (i % 2)) for i in range(15) if i != 12]
    late_spike = ev(12, 12, 5000.0)
    flusher = ev(99, 10_000, 100.0)
    src = tmp_path / "zscore_late_src"
    _write_single_file(spark.createDataFrame(calm, schema), src, "b0.parquet")
    time.sleep(1.1)
    _write_single_file(
        spark.createDataFrame([late_spike], schema), src, "b1.parquet"
    )
    time.sleep(1.1)
    _write_single_file(
        spark.createDataFrame([flusher], schema), src, "b2.parquet"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        jobs.zscore_stream(stream, allowed_lateness_us=5_000_000)
        .writeStream.format("memory")
        .queryName("zscore_late_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_zscore_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.value_micro)
        for r in spark.sql("SELECT * FROM zscore_late_out").collect()
    }
    # Batch-order reference over the full in-order sequence:
    ordered = sorted(calm + [late_spike], key=lambda t: (t[1], t[0]))
    _, want_flags = jobs._zscore_fold(
        [], [(eid, int(v * 1_000_000)) for eid, _ts, _u, v in ordered]
    )
    assert got == set(want_flags) and any(eid == 12 for eid, _ in got)


def test_cusum_stream_matches_batch_twin(spark, sf_dir, events_df, tmp_path):
    """Streaming CUSUM must emit exactly the batch twin's alarm rows when
    the log drains across multiple micro-batches: the calibration buffer
    and (ref, S+, S-) ride per-user state between batches."""
    from kinesis_stream_video_project_spark.plans.queries_round5e import (
        cusum_changepoints,
    )

    cols = events_df.select("user_id", "ts", "event_id", "value")
    cut = cols.approxQuantile("event_id", [0.5], 0.01)[0]
    src = tmp_path / "cusum_src"
    _write_single_file(cols.filter(F.col("event_id") <= cut), src, "events-00.parquet")
    time.sleep(1.1)
    _write_single_file(cols.filter(F.col("event_id") > cut), src, "events-01.parquet")
    stream = (
        spark.readStream.schema(cols.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        jobs.cusum_stream(stream)
        .writeStream.format("memory")
        .queryName("cusum_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cusum"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.event_id, r.direction)
        for r in spark.sql("SELECT * FROM cusum_out").collect()
    }
    want = {
        (r.user_id, r.event_id, r.direction)
        for r in cusum_changepoints(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_cusum_step_composes_to_batch_fold():
    """Chunked incremental _cusum_step calls (any chunking) must equal the
    one-shot batch cusum_fold — the state-decomposition law the streaming
    job rests on."""
    import pandas as pd

    from kinesis_stream_video_project_spark.plans.queries_round5e import (
        cusum_fold,
    )

    vals = [100 + ((i * 37) % 11) for i in range(25)] + [160] * 40
    rows = [(i, v) for i, v in enumerate(vals)]
    batch = cusum_fold(
        pd.DataFrame(
            {
                "user_id": [1] * len(vals),
                "ts": range(len(vals)),
                "event_id": [e for e, _ in rows],
                "vu": [v for _, v in rows],
            }
        )
    )
    want = list(zip(batch["event_id"], batch["direction"]))
    for split in (1, 7, 20, 33, 64):
        warmup, ref, sp, sm = [], None, 0, 0
        alarms: list = []
        for i in range(0, len(rows), split):
            warmup, ref, sp, sm, a = jobs._cusum_step(
                warmup, ref, sp, sm, rows[i : i + split]
            )
            alarms.extend(a)
        assert alarms == want, split
    assert any(d == "up" for _, d in want)


def test_cusum_stream_buffered_reorders_late_events(spark, tmp_path):
    """Buffered CUSUM: a late event inside the lateness horizon must fold
    in (ts, event_id) order BEFORE the alarm decision. 24 calm events
    arrive with one gap, the sustained-shift block arrives, then the
    missing calm event arrives LATE (its ts predates the shift); a
    far-future flusher advances the frontier. The emitted alarm set must
    equal the in-order batch fold — the lateness=0 path would have
    calibrated on a 20-value window that skips the late event and alarmed
    at a different position."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    def ev(eid, sec, val):
        return (int(eid), base + dt.timedelta(seconds=sec), 1, float(val))

    schema = "event_id long, ts timestamp, user_id long, value double"
    calm = [ev(i, i, 100 + (i % 3)) for i in range(24) if i != 18]
    shift = [ev(i, i, 160.0) for i in range(24, 40)]
    late = ev(18, 18, 100.0)
    flusher = ev(99, 10_000, 100.0)
    src = tmp_path / "cusum_late_src"
    _write_single_file(spark.createDataFrame(calm + shift, schema), src, "b0.parquet")
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame([late], schema), src, "b1.parquet")
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame([flusher], schema), src, "b2.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        jobs.cusum_stream(stream, allowed_lateness_us=60_000_000)
        .writeStream.format("memory")
        .queryName("cusum_late_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_cusum_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.direction)
        for r in spark.sql("SELECT * FROM cusum_late_out").collect()
    }
    ordered = sorted(calm + [late] + shift, key=lambda t: (t[1], t[0]))
    warmup, ref, sp, sm = [], None, 0, 0
    alarms: list = []
    warmup, ref, sp, sm, alarms = jobs._cusum_step(
        warmup, ref, sp, sm,
        [(eid, int(v * 1_000_000)) for eid, _ts, _u, v in ordered],
    )
    assert got == set(alarms) and len(got) > 0


def _drain_ams(spark, tmp_path, fn, rows, tag, nfiles, schema):
    src = tmp_path / f"ams_src_{tag}"
    step = -(-len(rows) // nfiles)
    for i in range(nfiles):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(rows[i * step : (i + 1) * step], schema),
            src,
            f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(f"ams_out_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_ams_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows_out = spark.sql(f"SELECT * FROM ams_out_{tag}").collect()
    final = {}
    for r in rows_out:
        if r.key not in final or r.n_rows > final[r.key][0]:
            final[r.key] = (r.n_rows, r.f2_est)
    return final


def test_ams_stream_final_matches_batch_sketch(spark, sf_dir, tmp_path):
    """Drained final emission per event type equals the oracle-validated
    batch ams_f2_report estimate on the same rows — on one file AND
    three ARBITRARILY-ORDERED files (the fold is commutative, the one
    shelf op with NO ordering contract), op nineteen certified against
    the batch operator."""
    from kinesis_stream_video_project_spark.operators.ams import ams_f2_report

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    base = [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"])
        for r in io.load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .limit(3000)
        .collect()
    ]
    df = spark.createDataFrame(base, schema)
    want = {}
    for t in [r["event_type"] for r in df.select("event_type").distinct().collect()]:
        row = ams_f2_report(
            df.filter(F.col("event_type") == t), "user_id"
        ).collect()[0]
        want[t] = (row["n_rows"], row["f2_est"])
    got1 = _drain_ams(spark, tmp_path, jobs.ams_stream, base, "gs1", 1, schema)
    shuffled = sorted(base, key=lambda r: (r[0] * 2654435761) % 104729)
    got3 = _drain_ams(
        spark, tmp_path, jobs.ams_stream, shuffled, "gs3", 3, schema
    )
    assert got1 == got3 == want and len(want) >= 4


def test_ams_stream_tws_matches_group_state_form(spark, sf_dir, tmp_path):
    """GS ≡ TWS on the same drain (the dual-API law, op nineteen)."""
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    base = [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"])
        for r in io.load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .limit(1200)
        .collect()
    ]
    gs = _drain_ams(spark, tmp_path, jobs.ams_stream, base, "eq_gs", 2, schema)
    tws = _drain_ams(
        spark, tmp_path, jobs.ams_stream_tws, base, "eq_tws", 2, schema
    )
    assert gs == tws and len(gs) >= 4


def test_ams_stream_checkpoint_restart_resumes(spark, tmp_path):
    """Restart against the SAME checkpoint resumes (n, registers): the
    post-restart estimate equals the batch sketch over BOTH batches'
    rows — register state survives the restart."""
    import datetime as dt

    from kinesis_stream_video_project_spark.operators.ams import ams_f2_report

    base_ts = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    b0 = [(i, base_ts, i % 3, "m") for i in range(10)]
    b1 = [(10 + i, base_ts, i % 2, "m") for i in range(10)]
    src = tmp_path / "ams_restart_src"
    ckpt = str(tmp_path / "ckpt_ams_restart")
    out = str(tmp_path / "ams_restart_out")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.ams_stream_tws(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.read.parquet(out).collect()
        return max(((r.n_rows, r.f2_est) for r in rows), default=None)

    _write_single_file(spark.createDataFrame(b0, schema), src, "b0.parquet")
    first = drain()
    assert first is not None and first[0] == 10
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(b1, schema), src, "b1.parquet")
    cumulative = drain()
    both = spark.createDataFrame(b0 + b1, schema)
    batch = ams_f2_report(both, "user_id").collect()[0]
    assert cumulative == (batch["n_rows"], batch["f2_est"]) == (20, batch["f2_est"])


def test_ams_stream_fold_commutes_hypothesis():
    """Hypothesis pin: ANY permutation and ANY chunking of any key
    sequence folds to the same registers and estimate — the
    commutativity law that exempts this op from the ordering
    contract."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        keys=st.lists(st.integers(min_value=0, max_value=9), max_size=30),
        seed=st.integers(min_value=0, max_value=2**31),
        chunk=st.integers(min_value=1, max_value=7),
    )
    def law(keys, seed, chunk):
        import random

        ks = [str(k) for k in keys]
        state_a = (0, [0] * jobs._AMS_R)
        for i in range(0, len(ks), chunk):
            state_a, last_a = jobs._ams_stream_fold(state_a, ks[i : i + chunk])
        perm = ks[:]
        random.Random(seed).shuffle(perm)
        state_b, _ = ((0, [0] * jobs._AMS_R), None)
        state_b, last_b = jobs._ams_stream_fold(state_b, perm)
        if ks:
            assert state_a == state_b and last_a == last_b

    law()


def test_cusum_stream_tws_matches_group_state_form(spark, events_df, tmp_path):
    """GS ≡ TWS on the same two-file drain (the dual-API law, op
    EIGHTEEN — online CUSUM): both stateful-API forms of the
    self-calibrating sequential test emit the identical alarm set."""
    cols = events_df.select("user_id", "ts", "event_id", "value")
    cut = cols.approxQuantile("event_id", [0.5], 0.01)[0]
    src = tmp_path / "cusum_tws_src"
    _write_single_file(cols.filter(F.col("event_id") <= cut), src, "e0.parquet")
    time.sleep(1.1)
    _write_single_file(cols.filter(F.col("event_id") > cut), src, "e1.parquet")
    got = {}
    for tag, fn in (("gs", jobs.cusum_stream), ("tws", jobs.cusum_stream_tws)):
        stream = (
            spark.readStream.schema(cols.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            fn(stream)
            .writeStream.format("memory")
            .queryName(f"cusum_eq_{tag}")
            .outputMode("append")
            .option(
                "checkpointLocation", str(tmp_path / f"ckpt_cusum_eq_{tag}")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got[tag] = {
            (r.user_id, r.event_id, r.direction)
            for r in spark.sql(f"SELECT * FROM cusum_eq_{tag}").collect()
        }
    assert got["gs"] == got["tws"] and len(got["gs"]) > 0


def test_cusum_stream_tws_checkpoint_restart_resumes(spark, tmp_path):
    """Restart against the SAME checkpoint resumes the calibration buffer
    and (ref, S+, S-): the first drain holds ONLY calibration values (no
    alarm possible), the shift block arrives after the restart, and the
    cumulative emissions equal the one-shot in-order fold — the alarm
    position depends on state restored across the restart."""
    import datetime as dt

    base = dt.datetime(2025, 5, 1, tzinfo=dt.timezone.utc)

    def ev(eid, sec, val):
        return (int(eid), base + dt.timedelta(seconds=sec), 1, float(val))

    schema = "event_id long, ts timestamp, user_id long, value double"
    calm = [ev(i, i, 100 + (i % 3)) for i in range(24)]
    shift = [ev(i, i, 160.0) for i in range(24, 40)]
    src = tmp_path / "cusum_restart_src"
    ckpt = str(tmp_path / "ckpt_cusum_restart")
    out = str(tmp_path / "cusum_restart_out")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.cusum_stream_tws(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r.user_id, r.event_id, r.direction)
            for r in spark.read.parquet(out).collect()
        }

    _write_single_file(spark.createDataFrame(calm, schema), src, "b0.parquet")
    assert drain() == set()  # calibration + 4 in-band values: no alarm yet
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(shift, schema), src, "b1.parquet")
    cumulative = drain()
    *_, want = jobs._cusum_step(
        [],
        None,
        0,
        0,
        [(eid, int(v * 1_000_000)) for eid, _ts, _u, v in calm + shift],
    )
    assert cumulative == {(1, eid, d) for eid, d in want} and len(cumulative) > 0


def test_silence_alerts_fires_for_stalled_key_only(spark, tmp_path):
    """Two streams: user 1 stops uploading at t=10s, user 2 keeps going
    through t=400s. With a 60 s silence bound and a 10 s watermark,
    draining in micro-batches must alert for user 1 exactly once
    (last_seen = 10 s, deadline 70 s — passed once user 2's progress
    advances the watermark to 190 s) and never for the still-active
    user 2, whose final deadline (460 s) stays ahead of the closing
    watermark (390 s). (A key that RESUMES in the same micro-batch its
    timer would fire in is simply refreshed — data beats timeout — which
    is the correct recovery-reset semantics.)"""
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    def ev(eid, user, sec):
        return (int(eid), base + dt.timedelta(seconds=sec), user, 1.0)

    schema = "event_id long, ts timestamp, user_id long, value double"
    b0 = [ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 0), ev(4, 2, 20)]
    b1 = [ev(5, 2, 200)]
    b2 = [ev(6, 2, 400)]
    src = tmp_path / "silence_src"
    for i, batch in enumerate([b0, b1, b2]):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(batch, schema), src, f"b{i}.parquet"
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        jobs.silence_alerts(stream, silence_us=60_000_000, watermark="10 seconds")
        .writeStream.format("memory")
        .queryName("silence_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_silence"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r.user_id, r.last_seen_us, r.silent_after_us)
        for r in spark.sql("SELECT * FROM silence_out").collect()
    ]
    base_us = int(base.timestamp()) * 1_000_000
    assert got == [(1, base_us + 10_000_000, base_us + 70_000_000)]


def test_silence_alerts_tws_matches_group_state_form(spark, tmp_path):
    """The Spark-4 timer form must produce the same alert as the
    GroupState form on the identical drain (stalled user 1 alerts once,
    active user 2 never) — two APIs, one semantics."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state-server protocol needs protobuf",
    )
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    def ev(eid, user, sec):
        return (int(eid), base + dt.timedelta(seconds=sec), user, 1.0)

    schema = "event_id long, ts timestamp, user_id long, value double"
    batches = [
        [ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 0), ev(4, 2, 20)],
        [ev(5, 2, 200)],
        [ev(6, 2, 400)],
    ]
    src = tmp_path / "silence_tws_src"
    for i, batch in enumerate(batches):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(batch, schema), src, f"b{i}.parquet"
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        jobs.silence_alerts_tws(
            stream, silence_us=60_000_000, watermark="10 seconds"
        )
        .writeStream.format("memory")
        .queryName("silence_tws_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_silence_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [
        (r.user_id, r.last_seen_us, r.silent_after_us)
        for r in spark.sql("SELECT * FROM silence_tws_out").collect()
    ]
    base_us = int(base.timestamp()) * 1_000_000
    assert got == [(1, base_us + 10_000_000, base_us + 70_000_000)]


def test_followup_stream_stream_join_matches_batch(spark, tmp_path, events_df):
    """Stream-stream interval self-join (the only unbounded×unbounded
    join class) drained over the real events fixture must emit exactly
    the batch twin's (trigger, response, lag) pair set — inner joins
    emit on arrival of both sides, so a bounded drain recovers every
    in-window pair; the watermark only bounds buffered state."""
    src = tmp_path / "followup_src"
    events_df.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(events_df.schema).parquet(str(src))
    q = (
        jobs.followup_join_stream(stream)
        .writeStream.format("memory")
        .queryName("followup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_followup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.trigger_event_id, r.response_event_id, r.lag_us)
        for r in spark.sql("SELECT * FROM followup_out").collect()
    }
    want = {
        (r.user_id, r.trigger_event_id, r.response_event_id, r.lag_us)
        for r in jobs.followup_pairs_batch(events_df).collect()
    }
    assert got == want and len(want) > 0


def test_followup_join_state_is_watermark_bounded(spark, tmp_path):
    """The physical plan must carry a StreamingSymmetricHashJoin with a
    state watermark derived from the interval predicate — if the range
    condition ever drifts off the watermarked ts columns (e.g. onto
    unix_micros ints), Spark silently keeps join state forever; this
    pins the eviction analysis instead of trusting the docstring."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        (1, base, 7, "error", 1.0, "{}"),
        (2, base + dt.timedelta(hours=1), 7, "purchase", 2.0, "{}"),
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    src = tmp_path / "followup_plan_src"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    out = jobs.followup_join_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("followup_plan_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_followup_plan"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert spark.sql("SELECT COUNT(*) AS n FROM followup_plan_out").first().n == 1
    # Inspect the executed plan: the symmetric hash join must carry
    # EXTRACTED state-cleanup value predicates on both buffered sides
    # (the INTERVAL arithmetic shape). A timestampadd() condition reads
    # identically but logs "Failed to extract state value watermark" and
    # keeps join state forever — this pin caught exactly that.
    jplan = q._jsq.explainInternal(False)
    assert "StreamingSymmetricHashJoin" in jplan, jplan
    assert "left value predicate: (t_ts" in jplan, jplan
    assert "right value predicate: (r_ts" in jplan, jplan


def test_seasonal_flags_stream_matches_batch_on_shared_baseline(
    spark, tmp_path, events_df
):
    """Train-batch / score-stream: with the SAME baseline table, the
    stateless stream-static scorer must flag exactly the rows the batch
    operator flags on the fixture events."""
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long
    from kinesis_stream_video_project_spark.operators import stats

    e = events_df.filter(F.col("value").isNotNull()).select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        scaled_long(F.col("value"), 1000000).alias("vu"),
    )
    baseline = stats.robust_center_spread(
        e.select("event_type", F.hour("ts").alias("season"), "vu"),
        ["event_type", "season"],
        "vu",
    ).select("event_type", "season", "med", "mad")
    batch_flags = {
        (r.event_id, r.season)
        for r in stats.seasonal_residual_flags(
            e,
            key_cols=["event_type"],
            season_col=F.hour("ts"),
            value_col="vu",
            id_cols=["event_id"],
        ).collect()
    }
    src = tmp_path / "seasonal_src"
    e.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(e.schema).parquet(str(src))
    q = (
        jobs.seasonal_flags_stream(stream, baseline)
        .writeStream.format("memory")
        .queryName("seasonal_flags_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_seasonal"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.event_id, r.season)
        for r in spark.sql("SELECT * FROM seasonal_flags_out").collect()
    }
    assert got == batch_flags and len(got) > 0


def _banded_static(df):
    """The shared signature staging (dedup.banded_bucket_keys) at the
    stream forms' defaults — the independent derivation the equality
    test compares the drained stream against."""
    from kinesis_stream_video_project_spark.operators.dedup import (
        banded_bucket_keys,
    )

    return banded_bucket_keys(df)


def test_banded_bucket_keys_agrees_with_batch_tier(spark, sf_dir):
    """The helper staging and the batch tier's fused staging must agree
    semantically: every pair the batch tier VERIFIES must be a helper
    candidate (same band keys → same buckets), pinning the two stagings
    to the shared signature primitives."""
    from kinesis_stream_video_project_spark.operators.dedup import (
        banded_bucket_keys,
        minhash_lsh_near_dups,
    )

    d = io.load_table(spark, sf_dir, "documents")
    b = banded_bucket_keys(d)
    candidates = {
        (r.doc_a, r.doc_b)
        for r in b.alias("l")
        .join(b.alias("r"), "bucket")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .distinct()
        .collect()
    }
    verified = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_near_dups(d).collect()
    }
    assert verified and verified <= candidates


def test_streaming_near_dup_candidates_match_batch_bucket_join(
    spark, tmp_path, sf_dir
):
    """Online LSH ≡ batch bucket self-join: draining the corpus (synthetic
    arrival times inside one horizon) must emit exactly the batch banded
    candidate pair set, and the set must be invariant to micro-batch
    chunking (1 file vs 3)."""
    docs = (
        io.load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .withColumn(
            "ts",
            F.to_timestamp(F.lit("2025-01-01 00:00:00"))
            + F.make_interval(secs=F.col("doc_id").cast("double")),
        )
    )
    want = {
        (r.doc_a, r.doc_b)
        for r in (
            _banded_static(docs.select("doc_id", "text"))
            .alias("l")
            .join(_banded_static(docs.select("doc_id", "text")).alias("r"), "bucket")
            .filter(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(
                F.col("l.doc_id").alias("doc_a"),
                F.col("r.doc_id").alias("doc_b"),
            )
            .distinct()
            .collect()
        )
    }
    n_docs = docs.count()
    got_by_split = []
    for nfiles in (1, 3):
        # Time-ordered file slices: arrival order must respect event time
        # or the advancing watermark drops genuinely-late rows — correct
        # streaming semantics, but not what this equality test probes.
        src = tmp_path / f"neardup_src_{nfiles}"
        step = -(-n_docs // nfiles)
        for i in range(nfiles):
            if i:
                time.sleep(1.1)
            _write_single_file(
                docs.filter(
                    (F.col("doc_id") >= i * step)
                    & (F.col("doc_id") < (i + 1) * step)
                ),
                src,
                f"b{i}.parquet",
            )
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.near_dup_candidates_stream(stream)
            .writeStream.format("memory")
            .queryName(f"neardup_out_{nfiles}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_nd_{nfiles}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got_by_split.append(
            {
                (r.doc_a, r.doc_b)
                for r in spark.sql(
                    f"SELECT DISTINCT doc_a, doc_b FROM neardup_out_{nfiles}"
                ).collect()
            }
        )
    assert got_by_split[0] == got_by_split[1] == want and len(want) > 0


def test_streaming_near_dup_horizon_evicts_old_members(spark, tmp_path):
    """Identical docs: B arrives within the horizon of A (pair), C
    arrives past it (no pair with A; pair with B only if within B's
    horizon — here also past, so C pairs with nobody)."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    text = "alpha beta gamma delta epsilon zeta eta theta"
    horizon_us = 3600 * 1_000_000  # 1 h
    rows = [
        (1, text, base),
        (2, text, base + dt.timedelta(minutes=30)),   # pairs with 1
        (3, text, base + dt.timedelta(hours=3)),      # both others evicted
        (4, "unrelated words entirely different content here now", base),
    ]
    schema = "doc_id long, text string, ts timestamp"
    files = [[rows[0], rows[3]], [rows[1]], [rows[2]]]
    src = tmp_path / "neardup_horizon_src"
    for i, batch in enumerate(files):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(batch, schema), src, f"b{i}.parquet"
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        jobs.near_dup_candidates_stream(stream, horizon_us=horizon_us)
        .writeStream.format("memory")
        .queryName("neardup_horizon_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_nd_h"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.doc_a, r.doc_b)
        for r in spark.sql(
            "SELECT DISTINCT doc_a, doc_b FROM neardup_horizon_out"
        ).collect()
    }
    assert got == {(1, 2)}


def test_near_dup_candidates_tws_matches_group_state_form(spark, tmp_path):
    """The Spark-4 transformWithState form must emit the identical
    candidate pair set as the GroupState form on the same drain — the
    third op on both stateful APIs (watchdog, silence, online LSH)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state-server protocol needs protobuf",
    )
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    text_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    text_b = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = [
        (1, text_a, base),
        (2, text_a, base + dt.timedelta(minutes=5)),
        (3, text_b, base + dt.timedelta(minutes=10)),
        (4, "unrelated totally different words here and now", base),
    ]
    schema = "doc_id long, text string, ts timestamp"
    files = [[rows[0], rows[3]], [rows[1]], [rows[2]]]
    src = tmp_path / "nd_tws_src"
    for i, batch in enumerate(files):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(batch, schema), src, f"b{i}.parquet"
        )

    got = {}
    for tag, job in (
        ("gs", jobs.near_dup_candidates_stream),
        ("tws", jobs.near_dup_candidates_stream_tws),
    ):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            job(stream)
            .writeStream.format("memory")
            .queryName(f"nd_{tag}_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_nd_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got[tag] = {
            (r.doc_a, r.doc_b)
            for r in spark.sql(
                f"SELECT DISTINCT doc_a, doc_b FROM nd_{tag}_out"
            ).collect()
        }
    assert got["gs"] == got["tws"]
    assert (1, 2) in got["gs"]  # identical texts must be candidates


def test_neardup_fold_trims_late_members_regardless_of_arrival_order():
    """Review finding (r6): a late-but-valid row appended after a newer
    member must still be trimmed once it falls outside a new doc's
    horizon — the fold keeps members ts-sorted (bisect insert), so the
    emitted pair set cannot depend on arrival order."""
    h = 1_000_000  # 1 s horizon in µs

    # batch 1: A at t=10s, then LATE B at t=9.0s (arrives after A)
    members: list = []
    _, _, members = jobs._neardup_fold(members, [(1, 10_000_000)], 0, h)
    _, _, members = jobs._neardup_fold(members, [(2, 9_000_000)], 0, h)
    assert [m[0] for m in members] == [2, 1]  # ts-sorted, not arrival-sorted

    # batch 2: C at t=10.5s → horizon floor 9.5s: B (9.0s) must be
    # trimmed and NOT pair with C; A (10s) must pair.
    out_a, out_b, members = jobs._neardup_fold(
        members, [(3, 10_500_000)], 0, h
    )
    assert set(zip(out_a, out_b)) == {(1, 3)}
    assert [m[0] for m in members] == [1, 3]


# ---------------------------------------------------------------------------
# Online funnel progression (both stateful APIs)
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ["view", "click", "purchase"]
_FUNNEL_H = 86400


def _funnel_replay(rows, steps, horizon_us):
    """Independent python derivation of the expected advance set:
    per-user (ts, event_id)-sorted greedy-earliest matching."""
    by_user: dict = {}
    for user_id, ts_us, event_id, etype in rows:
        by_user.setdefault(user_id, []).append((ts_us, event_id, etype))
    want = set()
    for user_id, evs in by_user.items():
        evs.sort(key=lambda r: (r[0], r[1]))
        stage, t_prev = 0, 0
        for ts, _eid, etype in evs:
            if stage >= len(steps) or etype != steps[stage]:
                continue
            if stage > 0 and (
                ts <= t_prev
                or (horizon_us is not None and ts > t_prev + horizon_us)
            ):
                continue
            stage += 1
            t_prev = ts
            want.add((user_id, stage, steps[stage - 1], ts))
    return want


def test_funnel_stream_matches_replay_and_batch_counts(
    spark, tmp_path, sf_dir
):
    """Draining the events fixture in event-time order must emit exactly
    the greedy-earliest advance set (independent python replay), with
    per-stage distinct-user counts equal to the batch operator's report,
    invariant to micro-batch chunking (1 file vs 3 time slices)."""
    from kinesis_stream_video_project_spark.operators import funnel

    ev = io.load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    collected = [
        (r.user_id, int(r.ts.timestamp() * 1_000_000), r.event_id, r.event_type)
        for r in ev.collect()
    ]
    want = _funnel_replay(collected, _FUNNEL_STEPS, _FUNNEL_H * 1_000_000)
    want_counts = {
        r.step_no: r.n_users
        for r in funnel.funnel_counts(
            io.load_table(spark, sf_dir, "events"),
            _FUNNEL_STEPS,
            step_horizon_s=_FUNNEL_H,
        ).collect()
    }

    got_by_split = []
    for nfiles in (1, 3):
        src = tmp_path / f"funnel_src_{nfiles}"
        ordered = ev.orderBy("ts", "event_id").collect()
        step = -(-len(ordered) // nfiles)
        for i in range(nfiles):
            if i:
                time.sleep(1.1)
            _write_single_file(
                spark.createDataFrame(
                    ordered[i * step : (i + 1) * step], ev.schema
                ),
                src,
                f"b{i}.parquet",
            )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.funnel_stage_stream(
                stream, _FUNNEL_STEPS, step_horizon_s=_FUNNEL_H
            )
            .writeStream.format("memory")
            .queryName(f"funnel_out_{nfiles}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_fn_{nfiles}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got_by_split.append(
            {
                (r.user_id, r.step_no, r.step, r.ts_us)
                for r in spark.sql(f"SELECT * FROM funnel_out_{nfiles}").collect()
            }
        )
    assert got_by_split[0] == got_by_split[1] == want and len(want) > 0
    for step_no, n in want_counts.items():
        assert (
            len({u for (u, s, _st, _t) in want if s == step_no}) == n
        ), step_no


def test_funnel_stream_ignores_cross_batch_stragglers(spark, tmp_path):
    """The documented append-mode divergence from batch: a cross-batch
    straggler OLDER than the user's matched frontier is ignored (strict
    ts > t_prev), not retroactively re-matched — the stream never
    retracts an emitted advance. Within a batch, disorder is absorbed
    by the (ts, event_id) sort."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    def at(s):
        return base + dt.timedelta(seconds=s)

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    # batch 1 (disordered within batch): click@200 arrives before view@100
    # -> sort absorbs it; user matches view@100, click@200.
    b1 = [(2, at(200), 1, "click"), (1, at(100), 1, "view")]
    # batch 2: straggler click@150 (valid for batch greedy matching,
    # which would prefer min ts > 100 = 150) + purchase@300.
    b2 = [(3, at(150), 1, "click"), (4, at(300), 1, "purchase")]
    src = tmp_path / "funnel_straggler_src"
    _write_single_file(spark.createDataFrame(b1, schema), src, "b0.parquet")
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(b2, schema), src, "b1.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        jobs.funnel_stage_stream(stream, _FUNNEL_STEPS)
        .writeStream.format("memory")
        .queryName("funnel_straggler_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_fn_straggler"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.step_no, r.ts_us // 1_000_000 - int(base.timestamp()))
        for r in spark.sql("SELECT * FROM funnel_straggler_out").collect()
    }
    # click matched at 200 (batch-1 frontier), straggler 150 ignored,
    # purchase advances from 200.
    assert got == {(1, 100), (2, 200), (3, 300)}


def test_funnel_tws_matches_group_state_form(spark, tmp_path):
    """The Spark-4 transformWithState form must emit the identical
    advance set as the GroupState form on the same drain — the fourth
    op on both stateful APIs."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state-server protocol needs protobuf",
    )
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    def at(s):
        return base + dt.timedelta(seconds=s)

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    files = [
        [
            (1, at(0), 1, "view"),
            (2, at(10), 1, "click"),
            (3, at(0), 2, "view"),
            (4, at(0), 2, "click"),  # tie with view -> strict > blocks
        ],
        [
            (5, at(20), 1, "purchase"),
            (6, at(5), 2, "click"),
            (7, at(999999), 2, "purchase"),  # past any horizon? no horizon set
        ],
    ]
    src = tmp_path / "funnel_tws_src"
    for i, batch in enumerate(files):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(batch, schema), src, f"b{i}.parquet"
        )
    got = {}
    for tag, job in (
        ("gs", jobs.funnel_stage_stream),
        ("tws", jobs.funnel_stage_stream_tws),
    ):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            job(stream, _FUNNEL_STEPS)
            .writeStream.format("memory")
            .queryName(f"funnel_{tag}_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_fn_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got[tag] = {
            (r.user_id, r.step_no, r.step, r.ts_us)
            for r in spark.sql(f"SELECT * FROM funnel_{tag}_out").collect()
        }
    assert got["gs"] == got["tws"]
    assert {(u, s) for (u, s, _st, _t) in got["gs"]} == {
        (1, 1),
        (1, 2),
        (1, 3),
        (2, 1),
        (2, 2),
        (2, 3),
    }


def test_funnel_fold_strictness_and_horizon():
    """Pure-fold pins: strict tie, horizon boundary inclusive, wrong
    order, completion idempotence."""
    steps = ["a", "b"]
    # tie: b at the same ts as a does not advance
    st, tp, em = jobs._funnel_fold(0, 0, steps, None, [(5, "a"), (5, "b")])
    assert (st, tp, em) == (1, 5, [(1, "a", 5)])
    # horizon inclusive at exactly t_prev + h
    st, tp, em = jobs._funnel_fold(1, 5, steps, 10, [(15, "b")])
    assert em == [(2, "b", 15)]
    # one past the horizon: no advance
    st, tp, em = jobs._funnel_fold(1, 5, steps, 10, [(16, "b")])
    assert em == []
    # completed funnel ignores further events
    st, tp, em = jobs._funnel_fold(2, 20, steps, None, [(30, "a"), (31, "b")])
    assert (st, em) == (2, [])


# ---------------------------------------------------------------------------
# Streaming heavy hitters (both stateful APIs)
# ---------------------------------------------------------------------------


def test_spacesaving_fold_guarantee_hypothesis():
    """Property (300 random streams): every key with true count >
    N/capacity survives, true count ∈ [count_lo, count_hi] for every
    surviving key, and the table never exceeds capacity."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        st.lists(st.sampled_from("abcdefgh"), max_size=60),
        st.integers(min_value=2, max_value=5),
    )
    def check(rows, capacity):
        keys, counts, errs = jobs._spacesaving_fold([], [], [], rows, capacity)
        assert len(keys) <= capacity
        true = {k: rows.count(k) for k in set(rows)}
        for k, c, e in zip(keys, counts, errs):
            assert c - e <= true[k] <= c
        thresh = len(rows) / capacity
        for k, n in true.items():
            if n > thresh:
                assert k in keys, (k, n, thresh, rows)

    check()


def _hh_replay(rows, capacity, shards):
    """Python replay of the sharded drain: rows = (shard, key_str) in
    global (ts, event_id) order."""
    state: dict = {}
    for shard, k in rows:
        ks, cs, es = state.get(shard, ([], [], []))
        state[shard] = jobs._spacesaving_fold(ks, cs, es, [k], capacity)
    out = set()
    for shard, (ks, cs, es) in state.items():
        for k, c, e in zip(ks, cs, es):
            out.add((shard, k, c, c - e))
    return out


def test_heavy_hitters_stream_matches_replay(spark, tmp_path, sf_dir):
    """Fixture drain in event-time order: the max-seq snapshot per shard
    equals the python replay, is invariant to micro-batch chunking
    (time-ordered slices), and satisfies the per-shard guarantee against
    exact batch counts."""
    ev = io.load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    capacity, shards = 16, 2
    ordered = ev.orderBy("ts", "event_id").collect()
    shard_of = {
        r[0]: r[1]
        for r in ev.select(
            "user_id",
            F.pmod(F.hash(F.col("user_id")), F.lit(shards)).cast("int"),
        )
        .distinct()
        .collect()
    }
    want = _hh_replay(
        [(shard_of[r.user_id], str(r.user_id)) for r in ordered],
        capacity,
        shards,
    )

    got_by_split = []
    for nfiles in (1, 3):
        src = tmp_path / f"hh_src_{nfiles}"
        step = -(-len(ordered) // nfiles)
        for i in range(nfiles):
            if i:
                time.sleep(1.1)
            _write_single_file(
                spark.createDataFrame(
                    ordered[i * step : (i + 1) * step], ev.schema
                ),
                src,
                f"b{i}.parquet",
            )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.heavy_hitters_stream(
                stream, capacity=capacity, shards=shards
            )
            .writeStream.format("memory")
            .queryName(f"hh_out_{nfiles}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_hh_{nfiles}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        snap = spark.sql(
            f"""SELECT shard, key, count_hi, count_lo FROM hh_out_{nfiles} o
                WHERE seq = (SELECT MAX(seq) FROM hh_out_{nfiles} i
                             WHERE i.shard = o.shard)"""
        ).collect()
        got_by_split.append(
            {(r.shard, r.key, r.count_hi, r.count_lo) for r in snap}
        )
    assert got_by_split[0] == got_by_split[1] == want and len(want) > 0

    # guarantee vs exact batch counts
    true = {
        str(r.user_id): r.n
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    shard_totals: dict = {}
    for u, n in true.items():
        s = shard_of[int(u)]
        shard_totals[s] = shard_totals.get(s, 0) + n
    surviving = {(s, k) for (s, k, _hi, _lo) in want}
    for u, n in true.items():
        s = shard_of[int(u)]
        if n > shard_totals[s] / capacity:
            assert (s, u) in surviving, (u, n)
    for s, k, hi, lo in want:
        assert lo <= true[k] <= hi, (k, lo, true[k], hi)


def test_heavy_hitters_tws_matches_group_state_form(spark, tmp_path):
    """GS ≡ TWS on the same drain — the sixth op on both stateful
    APIs."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state-server protocol needs protobuf",
    )
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    rows = [
        (i, base + dt.timedelta(seconds=i), uid, "view")
        for i, uid in enumerate([1, 2, 1, 3, 1, 2, 4, 5, 1, 6])
    ]
    files = [rows[:5], rows[5:]]
    src = tmp_path / "hh_tws_src"
    for i, batch in enumerate(files):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(batch, schema), src, f"b{i}.parquet"
        )
    got = {}
    for tag, job in (
        ("gs", jobs.heavy_hitters_stream),
        ("tws", jobs.heavy_hitters_stream_tws),
    ):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            job(stream, capacity=3, shards=2)
            .writeStream.format("memory")
            .queryName(f"hh_{tag}_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_hhx_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got[tag] = {
            (r.shard, r.seq, r.key, r.count_hi, r.count_lo)
            for r in spark.sql(f"SELECT * FROM hh_{tag}_out").collect()
        }
    assert got["gs"] == got["tws"] and len(got["gs"]) > 0


# ---------------------------------------------------------------------------
# Online sessionization (both stateful APIs)
# ---------------------------------------------------------------------------


def _session_events(spark, tmp_path, name):
    """Three micro-batches: user 1 has two sessions (0-40 s and 300 s),
    user 2 one long session; a dummy user 9 event far in the future
    advances the closing watermark so every real session FLUSHES."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    def ev(eid, user, sec):
        return (int(eid), base + dt.timedelta(seconds=sec), user, 1.0)

    schema = "event_id long, ts timestamp, user_id long, value double"
    b0 = [ev(1, 1, 0), ev(2, 1, 20), ev(3, 2, 5), ev(4, 1, 40)]
    b1 = [ev(5, 1, 300), ev(6, 2, 60), ev(7, 2, 115)]
    b2 = [ev(8, 9, 5000)]
    src = tmp_path / name
    for i, batch in enumerate([b0, b1, b2]):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(batch, schema), src, f"b{i}.parquet"
        )
    base_us = int(base.timestamp()) * 1_000_000
    return src, schema, base_us


def _drain_sessions(spark, tmp_path, fn, src, schema, qname):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        fn(stream, gap_s=60, watermark="10 seconds")
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{qname}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in spark.sql(f"SELECT * FROM {qname}").collect()
    )


def test_session_stream_closes_on_gap_and_flushes_idle(spark, tmp_path):
    """User 1: events at 0/20/40 s then 300 s with gap 60 s -> session
    [0, 40]x3 closes ON DATA (the 300 s event), session [300, 300]x1
    flushes on timer; user 2's [5, 115]x3 (gaps 55 s each, within 60)
    flushes on timer. The dummy user 9 session also flushes? No — its
    deadline (5060 s) is past the closing watermark (4990 s), so it
    correctly stays open: the idle-flush contract, not a bug."""
    src, schema, base_us = _session_events(spark, tmp_path, "sess_src")
    got = _drain_sessions(
        spark, tmp_path, jobs.session_stream, src, schema, "sess_out"
    )
    s = 1_000_000
    assert got == [
        (1, base_us + 0, base_us + 40 * s, 3),
        (1, base_us + 300 * s, base_us + 300 * s, 1),
        (2, base_us + 5 * s, base_us + 115 * s, 3),
    ]


def test_session_stream_matches_batch_islands(spark, tmp_path):
    """Cross-twin equality: the drained closed+flushed session set must
    equal the batch gaps-and-islands report over the same rows,
    restricted to sessions whose flush deadline the closing watermark
    passed (all real ones, by construction of the dummy closer)."""
    from pyspark.sql import Window

    src, schema, base_us = _session_events(spark, tmp_path, "sess_src2")
    got = _drain_sessions(
        spark, tmp_path, jobs.session_stream, src, schema, "sess_out2"
    )
    batch = spark.read.schema(schema).parquet(str(src))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 60 * 1_000_000
    islands = (
        batch.withColumn("_us", F.unix_micros("ts"))
        .withColumn("_prev", F.lag("_us").over(w))
        .withColumn(
            "_new",
            (F.col("_prev").isNull() | (F.col("_us") - F.col("_prev") > gap_us)).cast("long"),
        )
        .withColumn("_sid", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "_sid")
        .agg(
            F.min("_us").alias("session_start_us"),
            F.max("_us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    final_wm_us = (5000 - 10) * 1_000_000 + base_us
    want = sorted(
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in islands.filter(
            F.col("session_end_us") + gap_us < final_wm_us
        ).collect()
    )
    assert got == want and len(want) == 3


def test_session_stream_tws_matches_group_state_form(spark, tmp_path):
    """The Spark-4 timer form must emit the identical session set on the
    identical drain — two APIs, one semantics (shared _session_fold)."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithStateInPandas needs the protobuf runtime",
    )
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src, schema, base_us = _session_events(spark, tmp_path, "sess_src3")
        got_gs = _drain_sessions(
            spark, tmp_path, jobs.session_stream, src, schema, "sess_out3gs"
        )
        got_tws = _drain_sessions(
            spark, tmp_path, jobs.session_stream_tws, src, schema, "sess_out3tws"
        )
        assert got_tws == got_gs and len(got_gs) == 3
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


# ---------------------------------------------------------------------------
# Online KMV distinct sketch (both stateful APIs)
# ---------------------------------------------------------------------------


def test_kmv_stream_matches_batch_sketch(spark, tmp_path, sf_dir):
    """Drained max-seq snapshot per key equals the batch
    kmv_distinct_estimates sketch fields, invariant to micro-batch
    chunking (the KMV fold is a set operation — no in-order feed
    needed, unlike the session twin)."""
    from kinesis_stream_video_project_spark.operators import kmv as kmv_ops

    ev = io.load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    k = 8
    batch = {
        r["event_type"]: (r["n_hashes"], r["kth_rank"], r["kmv_est"])
        for r in kmv_ops.kmv_distinct_estimates(
            ev, "user_id", "event_type", k=k
        ).collect()
    }
    ordered = ev.orderBy("ts", "event_id").collect()
    got_by_split = []
    for nfiles in (1, 3):
        src = tmp_path / f"kmv_src_{nfiles}"
        step = -(-len(ordered) // nfiles)
        for i in range(nfiles):
            if i:
                time.sleep(1.1)
            _write_single_file(
                spark.createDataFrame(ordered[i * step : (i + 1) * step], ev.schema),
                src,
                f"b{i}.parquet",
            )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.kmv_stream(stream, k=k)
            .writeStream.format("memory")
            .queryName(f"kmv_out_{nfiles}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_kmv_{nfiles}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        snap = spark.sql(
            f"""SELECT event_type, n_hashes, kth_rank, kmv_est
                FROM kmv_out_{nfiles} o
                WHERE seq = (SELECT MAX(seq) FROM kmv_out_{nfiles} i
                             WHERE i.event_type = o.event_type)"""
        ).collect()
        got_by_split.append(
            {r.event_type: (r.n_hashes, r.kth_rank, r.kmv_est) for r in snap}
        )
    assert got_by_split[0] == got_by_split[1] == batch and len(batch) == 5


def test_kmv_stream_tws_matches_group_state_form(spark, tmp_path):
    """GS ≡ TWS on the same drain — the ninth op on both stateful APIs."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state-server protocol needs protobuf",
    )
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    rows = [
        (i, base + dt.timedelta(seconds=i), uid, ty)
        for i, (uid, ty) in enumerate(
            [(1, "view"), (2, "view"), (1, "click"), (3, "view"), (4, "view"),
             (5, "view"), (2, "click"), (6, "view"), (1, "view"), (7, "view")]
        )
    ]
    files = [rows[:5], rows[5:]]
    src = tmp_path / "kmv_tws_src"
    for i, batch in enumerate(files):
        if i:
            time.sleep(1.1)
        _write_single_file(spark.createDataFrame(batch, schema), src, f"b{i}.parquet")
    got = {}
    for tag, job in (("gs", jobs.kmv_stream), ("tws", jobs.kmv_stream_tws)):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            job(stream, k=3)
            .writeStream.format("memory")
            .queryName(f"kmv_{tag}_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_kmvx_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got[tag] = {
            (r.event_type, r.seq, r.n_hashes, r.kth_rank, r.kmv_est)
            for r in spark.sql(f"SELECT * FROM kmv_{tag}_out").collect()
        }
    assert got["gs"] == got["tws"] and len(got["gs"]) > 0


def test_kmv_fold_chunking_invariance():
    """Hypothesis pin: folding any chunking of any rank multiset reaches
    the same bottom-k state, and no-change batches report changed=False."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesis_stream_video_project_spark.streaming.jobs import _kmv_fold

    @settings(max_examples=100, deadline=None)
    @given(
        ranks=st.lists(st.integers(min_value=1, max_value=50), max_size=40),
        cuts=st.lists(st.integers(min_value=0, max_value=40), max_size=5),
        k=st.integers(min_value=2, max_value=6),
    )
    def run(ranks, cuts, k):
        held = []
        bounds = sorted(set(c for c in cuts if c <= len(ranks)))
        prev = 0
        for b in bounds + [len(ranks)]:
            held, _ = _kmv_fold(held, ranks[prev:b], k)
            prev = b
        assert held == sorted(set(ranks))[:k]
        again, changed = _kmv_fold(held, ranks, k)
        assert again == held and not changed

    run()


# ---------------------------------------------------------------------------
# Online DDSketch quantiles (both stateful APIs)
# ---------------------------------------------------------------------------


def test_dd_stream_matches_batch_sketch(spark, tmp_path, sf_dir):
    """Drained max-seq rows per key equal the batch dd_quantiles on the
    same scaled values, invariant to micro-batch chunking (counter
    folds are order-insensitive)."""
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long
    from kinesis_stream_video_project_spark.operators import ddsketch

    ev = io.load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    batch = {
        (r["event_type"], r["q_permille"]): (r["n"], r["dd_est"])
        for r in ddsketch.dd_quantiles(
            ev.select(
                "event_type", scaled_long(F.col("value"), 1000).alias("vm")
            ),
            "vm",
            "event_type",
        ).collect()
    }
    ordered = ev.orderBy("ts", "event_id").collect()
    got_by_split = []
    for nfiles in (1, 3):
        src = tmp_path / f"dd_src_{nfiles}"
        step = -(-len(ordered) // nfiles)
        for i in range(nfiles):
            if i:
                time.sleep(1.1)
            _write_single_file(
                spark.createDataFrame(ordered[i * step : (i + 1) * step], ev.schema),
                src,
                f"b{i}.parquet",
            )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.dd_stream(stream)
            .writeStream.format("memory")
            .queryName(f"dd_out_{nfiles}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_dd_{nfiles}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        snap = spark.sql(
            f"""SELECT event_type, q_permille, n, dd_est
                FROM dd_out_{nfiles} o
                WHERE seq = (SELECT MAX(seq) FROM dd_out_{nfiles} i
                             WHERE i.event_type = o.event_type)"""
        ).collect()
        got_by_split.append(
            {(r.event_type, r.q_permille): (r.n, r.dd_est) for r in snap}
        )
    assert got_by_split[0] == got_by_split[1] == batch and len(batch) == 15


def test_dd_stream_tws_matches_group_state_form(spark, tmp_path):
    """GS ≡ TWS on the same drain — the tenth op on both stateful APIs."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state-server protocol needs protobuf",
    )
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    schema = "event_id long, ts timestamp, event_type string, value double"
    vals = [0.5, 1.0, 2.0, 7.5, 40.0, 0.02, 3.0, 9.9, 120.0, 64.0]
    rows = [
        (i, base + dt.timedelta(seconds=i), "view" if i % 2 else "click", v)
        for i, v in enumerate(vals)
    ]
    files = [rows[:5], rows[5:]]
    src = tmp_path / "dd_tws_src"
    for i, batch in enumerate(files):
        if i:
            time.sleep(1.1)
        _write_single_file(spark.createDataFrame(batch, schema), src, f"b{i}.parquet")
    got = {}
    for tag, job in (("gs", jobs.dd_stream), ("tws", jobs.dd_stream_tws)):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            job(stream)
            .writeStream.format("memory")
            .queryName(f"dd_{tag}_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_ddx_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got[tag] = {
            (r.event_type, r.seq, r.q_permille, r.n, r.dd_est)
            for r in spark.sql(f"SELECT * FROM dd_{tag}_out").collect()
        }
    assert got["gs"] == got["tws"] and len(got["gs"]) > 0


def test_dd_fold_chunking_invariance():
    """Hypothesis pin: any chunking of any bucket multiset reaches the
    same counter state, and the walk matches a sorted-percentile oracle
    bucket-wise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesis_stream_video_project_spark.streaming.jobs import (
        _dd_fold,
        _dd_quantile_walk,
    )

    @settings(max_examples=100, deadline=None)
    @given(
        buckets=st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=40),
        cuts=st.lists(st.integers(min_value=0, max_value=40), max_size=5),
        q=st.sampled_from([500, 900, 990]),
    )
    def run(buckets, cuts, q):
        bs, cs = [], []
        bounds = sorted(set(c for c in cuts if c <= len(buckets)))
        prev = 0
        for b in bounds + [len(buckets)]:
            bs, cs, _ = _dd_fold(bs, cs, buckets[prev:b])
            prev = b
        import collections

        want = sorted(collections.Counter(buckets).items())
        assert list(zip(bs, cs)) == want
        n, est = _dd_quantile_walk(bs, cs, q)
        assert n == len(buckets)
        srt = sorted(buckets)
        true_bucket = srt[(q * n + 999) // 1000 - 1]
        assert est == (1 if true_bucket == 0 else 3 << (true_bucket - 1))

    run()


# ---------------------------------------------------------------------------
# Online CDC changelog compaction (both stateful APIs)
# ---------------------------------------------------------------------------


def test_cdc_stream_matches_batch_winner(spark, tmp_path, sf_dir):
    """Drained max-emit_seq post-image per key equals the batch
    latest-wins winner table, invariant to micro-batch chunking (max
    folds are order-insensitive)."""
    orders = io.load_table(spark, sf_dir, "orders")
    ch = orders.select(
        F.col("o_custkey").alias("key"),
        F.expr(
            "CASE o_orderstatus WHEN 'F' THEN 'U' WHEN 'O' THEN 'I' "
            "ELSE 'D' END"
        ).alias("op"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderpriority").alias("payload"),
    )
    want = {
        (r["key"], r["op"], r["payload"])
        for r in ch.withColumn("_ord", F.expr("seq * 4 + CASE op WHEN 'D' THEN 3 WHEN 'U' THEN 2 ELSE 1 END"))
        .groupBy("key")
        .agg(F.max_by(F.struct("op", "payload"), F.col("_ord")).alias("_w"))
        .select("key", "_w.op", "_w.payload")
        .collect()
    }
    ordered = ch.orderBy("seq").collect()
    got_by_split = []
    for nfiles in (1, 3):
        src = tmp_path / f"cdc_src_{nfiles}"
        step = -(-len(ordered) // nfiles)
        for i in range(nfiles):
            if i:
                time.sleep(1.1)
            _write_single_file(
                spark.createDataFrame(ordered[i * step : (i + 1) * step], ch.schema),
                src,
                f"b{i}.parquet",
            )
        stream = (
            spark.readStream.schema(ch.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.cdc_stream(stream)
            .writeStream.format("memory")
            .queryName(f"cdc_out_{nfiles}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_cdc_{nfiles}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        snap = spark.sql(
            f"""SELECT key, op, payload FROM cdc_out_{nfiles} o
                WHERE emit_seq = (SELECT MAX(emit_seq) FROM cdc_out_{nfiles} i
                                  WHERE i.key = o.key)"""
        ).collect()
        got_by_split.append({(r.key, r.op, r.payload) for r in snap})
    assert got_by_split[0] == got_by_split[1] == want and len(want) > 0


def test_cdc_stream_tws_matches_group_state_form(spark, tmp_path):
    """GS ≡ TWS on the same drain — the eleventh op on both stateful
    APIs; includes an equal-ord redelivery that must be dropped."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state-server protocol needs protobuf",
    )
    schema = "key long, op string, seq long, payload string"
    b0 = [(1, "I", 1, "a"), (2, "I", 1, "b"), (1, "U", 2, "a2")]
    b1 = [(1, "U", 2, "a2"), (2, "D", 3, None), (3, "I", 1, "c")]  # replay + delete
    src = tmp_path / "cdc_tws_src"
    for i, batch in enumerate([b0, b1]):
        if i:
            time.sleep(1.1)
        _write_single_file(spark.createDataFrame(batch, schema), src, f"b{i}.parquet")
    got = {}
    for tag, job in (("gs", jobs.cdc_stream), ("tws", jobs.cdc_stream_tws)):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            job(stream)
            .writeStream.format("memory")
            .queryName(f"cdc_{tag}_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_cdcx_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got[tag] = {
            (r.key, r.emit_seq, r.op, r.payload)
            for r in spark.sql(f"SELECT * FROM cdc_{tag}_out").collect()
        }
    assert got["gs"] == got["tws"] and len(got["gs"]) > 0
    # key 1: both b0 changes fold in ONE micro-batch (one emission,
    # post-image a2) and b1's equal-ord replay must NOT re-emit
    k1 = {t for t in got["gs"] if t[0] == 1}
    assert k1 == {(1, 1, "U", "a2")}
    # key 2: insert then delete -> two emissions, tombstone last
    k2 = sorted(t for t in got["gs"] if t[0] == 2)
    assert [(t[2], t[3]) for t in k2] == [("I", "b"), ("D", None)]


def test_cdc_fold_laws():
    """Hypothesis pins: chunking invariance for unique ords, and
    equal-ord redelivery never changes state."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesis_stream_video_project_spark.streaming.jobs import _cdc_fold

    @settings(max_examples=100, deadline=None)
    @given(
        ords=st.lists(
            st.integers(min_value=0, max_value=100), min_size=1, max_size=20, unique=True
        ),
        cuts=st.lists(st.integers(min_value=0, max_value=20), max_size=4),
    )
    def run(ords, cuts):
        rows = [(o, "U", f"p{o}") for o in ords]
        best, op, payload = None, None, None
        bounds = sorted(set(c for c in cuts if c <= len(rows)))
        prev = 0
        for b in bounds + [len(rows)]:
            best, op, payload, _ = _cdc_fold(best, op, payload, rows[prev:b])
            prev = b
        want = max(ords)
        assert (best, payload) == (want, f"p{want}")
        again = _cdc_fold(best, op, payload, [(want, "U", "DIFFERENT")])
        assert again == (best, op, payload, False)

    run()


def test_kmv_stream_checkpoint_restart_resumes(spark, tmp_path):
    """Stop-and-restart against the SAME checkpoint must resume the
    sketch state: run 1 drains file b0, run 2 (new query, same
    checkpoint) drains only b1, and the union of emissions equals a
    single fresh drain over both files — no re-emission, no state loss.
    The recovery contract every production streaming deploy leans on."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    rows = [
        (i, base + dt.timedelta(seconds=i), uid, "view")
        for i, uid in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
    ]
    src = tmp_path / "kmv_restart_src"
    ckpt = str(tmp_path / "ckpt_kmv_restart")
    out = str(tmp_path / "kmv_restart_out")

    def drain():
        # memory sinks cannot recover from a checkpoint; the restart
        # contract needs a real (file) sink
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.kmv_stream(stream, k=3)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r.event_type, r.seq, r.n_hashes, r.kth_rank, r.kmv_est)
            for r in spark.read.parquet(out).collect()
        }

    _write_single_file(spark.createDataFrame(rows[:5], schema), src, "b0.parquet")
    run1 = drain()
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(rows[5:], schema), src, "b1.parquet")
    cumulative = drain()
    run2 = cumulative - run1

    # fresh single drain over both files, separate checkpoint
    fresh_src = tmp_path / "kmv_restart_fresh"
    _write_single_file(spark.createDataFrame(rows[:5], schema), fresh_src, "b0.parquet")
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(rows[5:], schema), fresh_src, "b1.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(fresh_src))
    )
    q = (
        jobs.kmv_stream(stream, k=3)
        .writeStream.format("memory")
        .queryName("kmv_restart_fresh")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_kmv_fresh"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    fresh = {
        (r.event_type, r.seq, r.n_hashes, r.kth_rank, r.kmv_est)
        for r in spark.sql("SELECT * FROM kmv_restart_fresh").collect()
    }
    assert cumulative == fresh
    assert run1 and run2  # both runs actually emitted (state advanced)
    assert run1 < cumulative  # run 2 appended, never rewrote or re-emitted


# ---------------------------------------------------------------------------
# Watermark drop accounting (the O-20 contract made observable)
# ---------------------------------------------------------------------------


def test_watermark_finalizes_windows_and_excludes_late_rows(spark, tmp_path):
    """The O-20 drop contract made observable: under a tight watermark a
    straggler behind the finalized window is EXCLUDED from the appended
    aggregate and the progress feed shows the watermark advancing past
    the window end (the alarm signal a production deploy watches);
    under a generous watermark the same drain never finalizes the
    window inside the run, so no (wrong) early emission appears at all.
    Accounting findings (probed, kept as documentation): the late-row
    filter in batch N uses the watermark COMMITTED after batch N-1
    (one-batch lag — a straggler arriving in the very next batch after
    the mark-advancing event still lands; the test inserts a spacer
    batch so the straggler faces the high mark), and streaming
    AGGREGATIONS cut late rows without incrementing
    stateOperators.numRowsDroppedByWatermark — the observable
    aggregate-side signals are watermark progression plus the exclusion
    itself."""
    import datetime as dt
    import json

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double"
    )
    on_time = [
        (1, base, 1, "view", 1.0),
        (2, base + dt.timedelta(seconds=30), 1, "view", 1.0),
        # far-future event pushes the watermark way past the base window
        (3, base + dt.timedelta(hours=2), 2, "view", 1.0),
    ]
    # committed-watermark lag: the filter in batch N uses the watermark
    # committed after batch N-1, so the straggler needs a spacer batch
    # between the future event and itself to actually face the high mark
    spacer = [(5, base + dt.timedelta(hours=2, seconds=1), 2, "view", 1.0)]
    late = [(4, base + dt.timedelta(seconds=40), 1, "view", 7.0)]

    def drain(name, wm):
        src = tmp_path / f"wm_src_{name}"
        _write_single_file(spark.createDataFrame(on_time, schema), src, "b0.parquet")
        time.sleep(1.1)
        _write_single_file(spark.createDataFrame(spacer, schema), src, "b1.parquet")
        time.sleep(1.1)
        _write_single_file(spark.createDataFrame(late, schema), src, "b2.parquet")
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.stream_health_60s(stream, watermark=wm)
            .writeStream.format("memory")
            .queryName(f"wm_out_{name}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_wm_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        wms = []
        for p in q.recentProgress:
            d = p if isinstance(p, dict) else json.loads(p.json)
            w = d.get("eventTime", {}).get("watermark")
            if w:
                wms.append(w)
        rows = spark.sql(
            f"SELECT user_id, put_media_sum FROM wm_out_{name} "
            f"WHERE user_id = 1"
        ).collect()
        return wms, {r["user_id"]: r["put_media_sum"] for r in rows}

    wms_tight, sums_tight = drain("tight", "5 seconds")
    # the feed shows the watermark crossing the base window's end
    assert any(w > "2025-01-01T00:01:00" for w in wms_tight), wms_tight
    assert sums_tight.get(1) == 2.0  # late 7.0 never entered the window

    wms_loose, sums_loose = drain("loose", "6 hours")
    # loose watermark never crosses the window end inside this drain...
    assert all(w <= "2025-01-01T00:01:00" for w in wms_loose), wms_loose
    # ...so no premature (wrong) emission for user 1 — absence IS the check
    assert sums_loose.get(1) is None


# ---------------------------------------------------------------------------
# Online OHLC bars (both stateful APIs)
# ---------------------------------------------------------------------------


def test_ohlc_stream_matches_batch_bars(spark, tmp_path, sf_dir):
    """Drained max-seq candlesticks equal the batch ohlc_bars exactly,
    invariant to micro-batch chunking (min/max/arg-extreme merges are
    commutative)."""
    from kinesis_stream_video_project_spark.operators.stats import ohlc_bars

    ev = io.load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    batch = {
        r["bar_start"]: (
            r["n_events"], r["open_milli"], r["high_milli"],
            r["low_milli"], r["close_milli"],
        )
        for r in ohlc_bars(ev, "value", "ts").collect()
    }
    ordered = ev.orderBy("ts", "event_id").collect()
    got_by_split = []
    for nfiles in (1, 3):
        src = tmp_path / f"ohlc_src_{nfiles}"
        step = -(-len(ordered) // nfiles)
        for i in range(nfiles):
            if i:
                time.sleep(1.1)
            _write_single_file(
                spark.createDataFrame(ordered[i * step : (i + 1) * step], ev.schema),
                src,
                f"b{i}.parquet",
            )
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.ohlc_stream(stream)
            .writeStream.format("memory")
            .queryName(f"ohlc_out_{nfiles}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_ohlc_{nfiles}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        snap = spark.sql(
            f"""SELECT bar_start, n_events, open_milli, high_milli,
                       low_milli, close_milli
                FROM ohlc_out_{nfiles} o
                WHERE seq = (SELECT MAX(seq) FROM ohlc_out_{nfiles} i
                             WHERE i.bar_start = o.bar_start)"""
        ).collect()
        got_by_split.append(
            {
                r.bar_start: (
                    r.n_events, r.open_milli, r.high_milli,
                    r.low_milli, r.close_milli,
                )
                for r in snap
            }
        )
    assert got_by_split[0] == got_by_split[1] == batch and len(batch) > 10


def test_ohlc_stream_tws_matches_group_state_form(spark, tmp_path):
    """GS ≡ TWS on the same drain — the twelfth op on both stateful APIs."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState's state-server protocol needs protobuf",
    )
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    vals = [2.0, 5.0, 1.5, 4.0, 3.5, 9.0, 0.5, 2.2]
    rows = [
        (i, base + dt.timedelta(minutes=10 * i), 1, "view", v)
        for i, v in enumerate(vals)
    ]
    files = [rows[:4], rows[4:]]
    src = tmp_path / "ohlc_tws_src"
    for i, batch in enumerate(files):
        if i:
            time.sleep(1.1)
        _write_single_file(spark.createDataFrame(batch, schema), src, f"b{i}.parquet")
    got = {}
    for tag, job in (("gs", jobs.ohlc_stream), ("tws", jobs.ohlc_stream_tws)):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            job(stream)
            .writeStream.format("memory")
            .queryName(f"ohlc_{tag}_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_ohlcx_{tag}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got[tag] = {
            tuple(r) for r in spark.sql(f"SELECT * FROM ohlc_{tag}_out").collect()
        }
    assert got["gs"] == got["tws"] and len(got["gs"]) > 0


def test_ohlc_fold_chunking_invariance():
    """Hypothesis pin: any chunking of any (ordk, vm) multiset reaches
    the same candlestick state."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesis_stream_video_project_spark.streaming.jobs import _ohlc_fold

    @settings(max_examples=100, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=999),
                st.integers(min_value=-50, max_value=50),
            ),
            min_size=1,
            max_size=30,
        ),
        cuts=st.lists(st.integers(min_value=0, max_value=30), max_size=4),
    )
    def run(rows, cuts):
        keyed = [(f"{o:03d}{i:03d}", v) for i, (o, v) in enumerate(rows)]
        state = (0, None, None, None, None, None, None)
        bounds = sorted(set(c for c in cuts if c <= len(keyed)))
        prev = 0
        for b in bounds + [len(keyed)]:
            state, _ = _ohlc_fold(state, keyed[prev:b])
            prev = b
        srt = sorted(keyed)
        vals = [v for _, v in keyed]
        want = (
            len(keyed), srt[0][0], srt[0][1], max(vals), min(vals),
            srt[-1][0], srt[-1][1],
        )
        assert state == want

    run()


def test_followup_outer_join_emits_unmatched_after_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: the NULL-response row for an
    unmatched trigger emits only once the watermark PROVES no response
    can arrive (state-expiry emission — the mechanism the inner join
    never exercises). Crafted: user 1's error gets a purchase inside
    the 4 h window (matched pair emits), user 2's error gets none; a
    far-future spacer event advances the watermark past t + within so
    the unmatched verdict becomes provable and the NULL row emits."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    rows = [
        (1, base, 1, "error", 1.0, "{}"),
        (2, base + dt.timedelta(hours=1), 1, "purchase", 2.0, "{}"),
        (3, base, 2, "error", 1.0, "{}"),
    ]
    # NULL-side emission is watermark-driven, and the committed mark
    # lags one batch (the spacer-batch finding, PLANS Round-8n) — so the
    # spacers must arrive in SEPARATE micro-batches after the data:
    # spacer batch 1 advances the mark past t + within, spacer batch 2
    # runs the eviction that emits the NULL row. maxFilesPerTrigger=1
    # turns each appended file into its own batch. AND the spacers must
    # advance BOTH sides: Catalyst pushes the event_type filters BELOW
    # the EventTimeWatermark nodes, so each side's watermark tracks only
    # its own type's max event time and the global mark is their MIN —
    # a "view" spacer advances NEITHER (probed: the mark stayed at
    # t0 − 10 s forever and no NULL row ever emitted). Far-future
    # error + purchase pairs (unrelated users) advance both sides.
    spacers = [
        [
            (4, base + dt.timedelta(hours=9), 8, "purchase", 0.0, "{}"),
            (5, base + dt.timedelta(hours=9), 9, "error", 0.0, "{}"),
        ],
        [
            (6, base + dt.timedelta(hours=10), 8, "purchase", 0.0, "{}"),
            (7, base + dt.timedelta(hours=10), 9, "error", 0.0, "{}"),
        ],
    ]
    src = tmp_path / "fo_outer_src"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(str(src))
    for sp in spacers:
        spark.createDataFrame(sp, schema).coalesce(1).write.mode("append").parquet(str(src))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        jobs.followup_outer_join_stream(stream)
        .writeStream.format("memory")
        .queryName("fo_outer_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_fo_outer"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.trigger_event_id, r.response_event_id, r.lag_us)
        for r in spark.sql("SELECT * FROM fo_outer_out").collect()
    }
    # matched pair (arrival-driven) + user 2's provable no-response row;
    # the spacer errors (user 9) stay PENDING — their own 4 h windows
    # reach past the final watermark (the trailing-unprovable contract)
    assert got == {
        (1, 1, 2, 3_600_000_000),
        (2, 3, None, None),
    }


def test_followup_outer_join_max_policy_drains_with_one_silent_side(
    spark, tmp_path
):
    """The X-172 escape, EXERCISED (VERDICT r10 item 5): with spacers on
    ONLY ONE side (purchase — the trigger side goes silent after the
    data), the default min watermark policy freezes the global mark at
    the silent side's max and every pending no-response verdict stays
    frozen forever; switching spark.sql.streaming.multipleWatermarkPolicy
    to max lets the advancing side drive the mark and the NULL rows
    drain. Both halves run the same input: the min half is the negative
    control proving the policy (not the spacers) is what drained."""
    import datetime as dt

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    rows = [
        (1, base, 1, "error", 1.0, "{}"),
        (2, base + dt.timedelta(hours=1), 1, "purchase", 2.0, "{}"),
        (3, base, 2, "error", 1.0, "{}"),
    ]
    # purchase-ONLY spacers: the error side's own watermark stays at
    # base - 10 s (its filter sits below the EventTimeWatermark node, so
    # it never sees these), while the purchase side advances to +10 h.
    spacers = [
        [(4, base + dt.timedelta(hours=9), 8, "purchase", 0.0, "{}")],
        [(5, base + dt.timedelta(hours=10), 8, "purchase", 0.0, "{}")],
    ]

    def drain(policy: str, tag: str) -> set:
        src = tmp_path / f"fo_pol_{tag}_src"
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src))
        for sp in spacers:
            spark.createDataFrame(sp, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
        prev = spark.conf.get(
            "spark.sql.streaming.multipleWatermarkPolicy", "min"
        )
        spark.conf.set("spark.sql.streaming.multipleWatermarkPolicy", policy)
        try:
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(str(src))
            )
            q = (
                jobs.followup_outer_join_stream(stream)
                .writeStream.format("memory")
                .queryName(f"fo_pol_{tag}_out")
                .outputMode("append")
                .option(
                    "checkpointLocation", str(tmp_path / f"ckpt_fo_pol_{tag}")
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(180)
        finally:
            spark.conf.set(
                "spark.sql.streaming.multipleWatermarkPolicy", prev
            )
        return {
            (r.user_id, r.trigger_event_id, r.response_event_id, r.lag_us)
            for r in spark.sql(f"SELECT * FROM fo_pol_{tag}_out").collect()
        }

    # min policy (default): global mark = min(error side frozen at
    # base-10s, purchase side) -> user 2's no-response verdict is never
    # provable; only the arrival-driven matched pair emits.
    assert drain("min", "min") == {(1, 1, 2, 3_600_000_000)}
    # max policy: the purchase side drives the mark past t + within and
    # the NULL row drains (the documented trade: max can drop late rows
    # the min policy would keep).
    assert drain("max", "max") == {
        (1, 1, 2, 3_600_000_000),
        (2, 3, None, None),
    }


def test_followup_outer_join_trailing_triggers_stay_pending(
    spark, tmp_path, events_df
):
    """Fixture-scale drain == batch twin, EXCEPT the trailing
    unprovable window: an unmatched trigger with t + within beyond the
    final watermark cannot yet prove "no response" and must NOT emit
    (the unflushed-trailing-session contract applied to join state).
    Matched pairs emit regardless (arrival-driven)."""
    src = tmp_path / "fo_outer_fix_src"
    events_df.write.mode("overwrite").parquet(str(src))
    stream = spark.readStream.schema(events_df.schema).parquet(str(src))
    q = (
        jobs.followup_outer_join_stream(stream)
        .writeStream.format("memory")
        .queryName("fo_outer_fix_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_fo_outer_fix"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.trigger_event_id, r.response_event_id, r.lag_us)
        for r in spark.sql("SELECT * FROM fo_outer_fix_out").collect()
    }
    batch = jobs.followup_outer_batch(events_df).collect()
    want_matched = {
        (r.user_id, r.trigger_event_id, r.response_event_id, r.lag_us)
        for r in batch
        if r.response_event_id is not None
    }
    # watermark after a bounded drain: each side's EventTimeWatermark
    # node sits below the pushed-down type filter, so it tracks only its
    # own type's max event time; the global mark is the MIN of the two,
    # minus the 10 s delay
    wm_us = (
        min(
            events_df.filter(F.col("event_type") == t)
            .agg(F.max(F.unix_micros("ts")))
            .first()[0]
            for t in ("error", "purchase")
        )
        - 10_000_000
    )
    within_us = 4 * 3600 * 1_000_000
    trigger_us = {
        r.event_id: u
        for r, u in zip(
            events_df.filter(F.col("event_type") == "error")
            .select("event_id")
            .collect(),
            [
                x[0]
                for x in events_df.filter(F.col("event_type") == "error")
                .select(F.unix_micros("ts"))
                .collect()
            ],
        )
    }
    want_unmatched_provable = {
        (r.user_id, r.trigger_event_id, None, None)
        for r in batch
        if r.response_event_id is None
        and trigger_us[r.trigger_event_id] + within_us < wm_us
    }
    assert want_matched <= got
    assert want_unmatched_provable <= got
    # nothing beyond batch-truth emits, and every emitted unmatched row
    # is genuinely unmatched in the batch twin
    want_all = {
        (r.user_id, r.trigger_event_id, r.response_event_id, r.lag_us)
        for r in batch
    }
    assert got <= want_all
    assert len(want_matched) > 0 and len(want_unmatched_provable) > 0


def _ivm_changelog(spark, sf_dir):
    """The registered IVM query's changelog (account-deletion split over
    orders), as a (key, value, op, ord) frame ordered deterministically."""
    from kinesis_stream_video_project_spark.operators.sampling import (
        hash_bucket,
    )

    o = io.load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("key"),
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
        ).alias("value"),
    )
    b = hash_bucket(F.col("o_orderkey"))
    bc = hash_bucket(F.col("key"), 100)
    base = o.filter(b < 80)
    deletes = base.filter(bc < 5).withColumn("op", F.lit("D"))
    inserts = o.filter((b >= 80) & (bc >= 5)).withColumn("op", F.lit("I"))
    return base, deletes.unionByName(inserts).select(
        "key", "value", "op", F.col("o_orderkey").alias("ord")
    )


def test_ivm_stream_matches_batch_merge(spark, tmp_path, sf_dir):
    """Drained max-seq view rows (n_rows > 0) equal the batch
    counting-algebra merge exactly, invariant to micro-batch chunking
    (the fold is a pure sum); keys whose count reaches zero emit a
    TOMBSTONE row (n_rows = 0, total = 0) that the batch view omits —
    both contracts pinned."""
    from kinesis_stream_video_project_spark.operators import ivm

    base, changes = _ivm_changelog(spark, sf_dir)
    batch = {
        r["key"]: (r["n_rows"], r["total"])
        for r in ivm.merge_agg_deltas(
            ivm.agg_state(base, "key", "value"), changes, "key", "value"
        ).collect()
    }
    # the stream starts from the base view preloaded as 'I' changes —
    # a cold stream bootstraps its view by replaying the base snapshot,
    # which is exactly how a production changelog consumer starts
    bootstrap = base.select(
        "key", "value", F.lit("I").alias("op"),
        (F.col("o_orderkey") - 10_000_000_000).alias("ord"),
    )
    full = bootstrap.unionByName(
        changes.select("key", "value", "op", "ord")
    )
    ordered = full.orderBy("ord").collect()
    schema = "key long, value long, op string, ord long"
    got_by_split = []
    tombstones_by_split = []
    for nfiles in (1, 3):
        src = tmp_path / f"ivm_src_{nfiles}"
        step = -(-len(ordered) // nfiles)
        for i in range(nfiles):
            if i:
                time.sleep(1.1)
            _write_single_file(
                spark.createDataFrame(ordered[i * step : (i + 1) * step], schema),
                src,
                f"b{i}.parquet",
            )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.ivm_stream(stream)
            .writeStream.format("memory")
            .queryName(f"ivm_out_{nfiles}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_ivm_{nfiles}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        snap = spark.sql(
            f"""SELECT key, n_rows, total FROM ivm_out_{nfiles} o
                WHERE seq = (SELECT MAX(seq) FROM ivm_out_{nfiles} i
                             WHERE i.key = o.key)"""
        ).collect()
        got_by_split.append(
            {r.key: (r.n_rows, r.total) for r in snap if r.n_rows > 0}
        )
        tombstones_by_split.append(
            {r.key for r in snap if r.n_rows == 0 and r.total == 0}
        )
    assert got_by_split[0] == got_by_split[1] == batch and len(batch) > 0
    # every deleted-account key ends as a tombstone
    base_keys = {r["key"] for r in base.select("key").distinct().collect()}
    assert tombstones_by_split[0] == tombstones_by_split[1] == (
        base_keys - set(batch)
    )
    assert len(tombstones_by_split[0]) > 0


def test_ivm_stream_tws_matches_group_state_form(spark, tmp_path):
    """GS ≡ TWS on the same two-batch crafted drain, including a
    tombstone and an out-of-order delete-before-insert (which the
    commutative fold absorbs — stated stream contract)."""
    schema = "key long, value long, op string"
    b0 = [(1, 10, "I"), (1, 20, "I"), (2, 5, "I"), (3, 7, "D")]
    b1 = [(1, 10, "D"), (2, 5, "D"), (3, 7, "I"), (3, 7, "I")]
    src = tmp_path / "ivm_tws_src"
    _write_single_file(spark.createDataFrame(b0, schema), src, "b0.parquet")
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(b1, schema), src, "b1.parquet")
    outs = {}
    for name, fn in (("gs", jobs.ivm_stream), ("tws", jobs.ivm_stream_tws)):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            fn(stream)
            .writeStream.format("memory")
            .queryName(f"ivm_{name}_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ckpt_ivm_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        outs[name] = {
            (r.key, r.seq): (r.n_rows, r.total)
            for r in spark.sql(f"SELECT * FROM ivm_{name}_out").collect()
        }
    assert outs["gs"] == outs["tws"] and len(outs["gs"]) > 0
    # final states: key 1 -> (1, 20); key 2 -> tombstone (0, 0);
    # key 3 -> delete-before-insert nets (1, 7)
    finals = {}
    for (k, s), v in outs["gs"].items():
        if k not in finals or s > finals[k][0]:
            finals[k] = (s, v)
    assert finals[1][1] == (1, 20)
    assert finals[2][1] == (0, 0)
    assert finals[3][1] == (1, 7)


def test_ivm_stream_checkpoint_restart_resumes(spark, tmp_path):
    """Stop-and-restart against the SAME checkpoint must resume the
    maintained view: run 1 drains the insert batch, run 2 (new query,
    same checkpoint) drains only the delete batch and its emissions
    continue from the recovered (n_rows, total) — no re-emission, no
    state loss. The recovery contract a live materialized view leans on
    harder than any sketch: a lost count silently corrupts every later
    merge."""
    schema = "key long, value long, op string"
    src = tmp_path / "ivm_restart_src"
    ckpt = str(tmp_path / "ckpt_ivm_restart")
    out = str(tmp_path / "ivm_restart_out")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.ivm_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r.key, r.seq, r.n_rows, r.total)
            for r in spark.read.parquet(out).collect()
        }

    b0 = [(1, 10, "I"), (1, 20, "I"), (2, 5, "I")]
    b1 = [(1, 10, "D"), (2, 5, "D")]
    _write_single_file(spark.createDataFrame(b0, schema), src, "b0.parquet")
    run1 = drain()
    assert run1 == {(1, 1, 2, 30), (2, 1, 1, 5)}
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(b1, schema), src, "b1.parquet")
    cumulative = drain()
    run2 = cumulative - run1
    # resumed state: key 1 continues from (2, 30) -> (1, 20) at seq 2;
    # key 2 tombstones at seq 2 — a state loss would restart seq at 1
    # and count at -1/0 instead
    assert run2 == {(1, 2, 1, 20), (2, 2, 0, 0)}


# ---------------------------------------------------------------------------
# Online Bloom ingest novelty scoring (the FOURTEENTH dual-API op)
# ---------------------------------------------------------------------------


def _bloom_pure_replay(rows, n=5):
    """Pure-python reference: replay (source, doc_id, text) in doc_id
    order per namespace through (a) an exact prior-gram-set overlap and
    (b) the md5 Bloom fold itself — (a) lower-bounds the stream's
    n_prior_hits (the no-false-negative law), (b) must match it
    EXACTLY."""
    import hashlib

    M, K = 1 << 16, 3
    exact_seen, bits = {}, {}
    out = {}
    by_ns = {}
    for src, doc_id, text in rows:
        by_ns.setdefault(src, []).append((doc_id, text))
    for src, docs in by_ns.items():
        exact_seen[src], bits[src] = set(), set()
        for doc_id, text in sorted(docs):
            toks = text.split(" ")
            if len(toks) < n:
                continue
            grams = list(dict.fromkeys(
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            ))
            bloom_hits = exact_hits = 0
            gram_pos = []
            for g in grams:
                h = hashlib.md5(g.encode()).hexdigest()
                pos = [int(h[5 * j : 5 * j + 5], 16) % M for j in range(K)]
                gram_pos.append(pos)
                if all(p in bits[src] for p in pos):
                    bloom_hits += 1
                if g in exact_seen[src]:
                    exact_hits += 1
            for g, pos in zip(grams, gram_pos):
                exact_seen[src].add(g)
                bits[src].update(pos)
            out[(src, doc_id)] = (len(grams), bloom_hits, exact_hits)
    return out


def _drain_bloom(spark, tmp_path, fn, docs_rows, tag, nfiles):
    schema = "source string, doc_id long, text string"
    src = tmp_path / f"bloom_src_{tag}"
    step = -(-len(docs_rows) // nfiles)
    for i in range(nfiles):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(
                docs_rows[i * step : (i + 1) * step], schema
            ),
            src,
            f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(f"bloom_out_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_bloom_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        (r["ns"], r["doc_id"]): (r["n_grams"], r["n_prior_hits"])
        for r in spark.sql(f"SELECT * FROM bloom_out_{tag}").collect()
    }


def _bloom_fixture_rows(spark, sf_dir):
    """The full sf0.001 documents table (500 docs) — its dup clusters
    give genuine same-source prior-gram overlap (probed: 108 grams by
    source); doc_id order feeds originals before copies."""
    docs = io.load_table(spark, "/root/testdata/sf0.001", "documents")
    return sorted(
        (r["source"], r["doc_id"], r["text"]) for r in docs.collect()
    )


def test_bloom_stream_matches_pure_replay_and_fp_law(spark, tmp_path, sf_dir):
    rows = _bloom_fixture_rows(spark, sf_dir)
    want = _bloom_pure_replay(rows)
    got1 = _drain_bloom(spark, tmp_path, jobs.bloom_stream, rows, "gs1", 1)
    got3 = _drain_bloom(spark, tmp_path, jobs.bloom_stream, rows, "gs3", 3)
    # chunking invariance under the doc_id-ordered feed contract
    assert got1 == got3
    assert set(got1) == set(want)
    n_overlap = 0
    for k, (n_grams, prior) in got1.items():
        wg, wbloom, wexact = want[k]
        assert n_grams == wg, k
        assert prior == wbloom, k          # the fold, bit-for-bit
        assert prior >= wexact, k          # no false negatives
        n_overlap += wexact
    assert n_overlap > 0  # the fixture genuinely exercises prior hits


def test_bloom_stream_tws_matches_group_state_form(spark, tmp_path, sf_dir):
    rows = _bloom_fixture_rows(spark, sf_dir)
    gs = _drain_bloom(spark, tmp_path, jobs.bloom_stream, rows, "gs_eq", 2)
    tws = _drain_bloom(
        spark, tmp_path, jobs.bloom_stream_tws, rows, "tws_eq", 2
    )
    assert gs == tws and len(gs) > 0


# ---------------------------------------------------------------------------
# Online weighted priority sampling (the FIFTEENTH dual-API op)
# ---------------------------------------------------------------------------


def _drain_wps(spark, tmp_path, fn, events_rows, tag, nfiles, k=16):
    schema = "event_type string, event_id long, value double"
    src = tmp_path / f"wps_src_{tag}"
    step = -(-len(events_rows) // nfiles)
    for i in range(nfiles):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(
                events_rows[i * step : (i + 1) * step], schema
            ),
            src,
            f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        fn(stream, k=k)
        .writeStream.format("memory")
        .queryName(f"wps_out_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_wps_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        r["key"]: (r["n_sample"], tuple(r["sample_ids"]), r["kth_priority"])
        for r in spark.sql(
            f"""SELECT * FROM wps_out_{tag} o
                WHERE seq = (SELECT MAX(seq) FROM wps_out_{tag} i
                             WHERE i.key = o.key)"""
        ).collect()
    }


def _wps_rows(spark, sf_dir):
    return [
        (r["event_type"], r["event_id"], r["value"])
        for r in io.load_table(spark, sf_dir, "events")
        .filter(F.col("value") > 0)
        .limit(3000)
        .collect()
    ]


def test_wps_stream_matches_batch_sample(spark, tmp_path, sf_dir):
    """Drained max-seq state equals the BATCH priority_sample top-k per
    key exactly (the set fold is order-insensitive — bottom-k of a
    union is bottom-k of bottom-k's), invariant to micro-batch
    chunking."""
    from kinesis_stream_video_project_spark.operators.sampling import (
        priority_sample,
    )

    rows = _wps_rows(spark, sf_dir)
    df = spark.createDataFrame(
        rows, "event_type string, event_id long, value double"
    )
    batch = priority_sample(
        df,
        "event_id",
        (F.col("value") * 1000).cast("long"),
        16,
        group_col="event_type",
    )
    want = {}
    for r in batch.collect():
        want.setdefault(r["event_type"], []).append(
            (r["priority"], r["event_id"])
        )
    want = {
        key: (
            len(sorted(v)),
            tuple(i for _, i in sorted(v)),
            sorted(v)[-1][0],
        )
        for key, v in want.items()
    }
    got1 = _drain_wps(spark, tmp_path, jobs.wps_stream, rows, "gs1", 1)
    got3 = _drain_wps(spark, tmp_path, jobs.wps_stream, rows, "gs3", 3)
    assert got1 == got3 == want
    assert len(got1) > 1


def test_wps_stream_tws_matches_group_state_form(spark, tmp_path, sf_dir):
    rows = _wps_rows(spark, sf_dir)
    gs = _drain_wps(spark, tmp_path, jobs.wps_stream, rows, "gs_eq", 2)
    tws = _drain_wps(spark, tmp_path, jobs.wps_stream_tws, rows, "tws_eq", 2)
    assert gs == tws and len(gs) > 1


def test_bloom_stream_checkpoint_restart_resumes(spark, tmp_path):
    """Stop-and-restart against the SAME checkpoint must resume the
    GROWING filter's packed-word state: a doc re-ingested after restart
    scores its grams as PRIOR HITS (the filter remembered), and the
    union of emissions equals a fresh two-file drain — no state loss,
    no re-emission. The most state-critical of the dual-API ops: losing
    bits silently re-admits duplicates."""
    schema = "source string, doc_id long, text string"
    t1 = "alpha beta gamma delta epsilon zeta"
    # t2 shares exactly ONE of its two 5-gram windows with t1 (the
    # 'alpha..epsilon' head; the tail window differs at 'eta')
    t2 = "alpha beta gamma delta epsilon eta"
    rows1 = [("s", 1, t1)]
    rows2 = [("s", 2, t1), ("s", 3, t2)]  # doc 2 verbatim copy of doc 1
    src = tmp_path / "bloom_restart_src"
    ckpt = str(tmp_path / "ckpt_bloom_restart")
    out = str(tmp_path / "bloom_restart_out")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.bloom_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r.ns, r.doc_id, r.seq, r.n_grams, r.n_prior_hits)
            for r in spark.read.parquet(out).collect()
        }

    _write_single_file(spark.createDataFrame(rows1, schema), src, "b0.parquet")
    run1 = drain()
    assert run1 == {("s", 1, 1, 2, 0)}  # 6 tokens -> 2 distinct 5-grams, novel
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(rows2, schema), src, "b1.parquet")
    cumulative = drain()
    run2 = cumulative - run1
    # doc 2 is a verbatim copy of the PRE-RESTART doc 1: both its grams
    # must score as prior hits — the restarted filter remembered its bits
    assert ("s", 2, 2, 2, 2) in run2
    # doc 3 shares one 5-gram window with nothing prior ('eta' tail
    # changes both windows? no: 'alpha beta gamma delta epsilon' is
    # shared) -> exactly 1 of its 2 grams is a prior hit
    assert ("s", 3, 2, 2, 1) in run2


def test_wps_stream_checkpoint_restart_resumes(spark, tmp_path):
    """Stop-and-restart against the SAME checkpoint must resume the
    sample state: pre-restart members keep their slots, a post-restart
    batch can only displace them by priority, and the emission union
    equals a fresh two-file drain (the KMV restart contract, with
    weights)."""
    schema = "event_type string, event_id long, value double"
    rows = [("k", i, 1.0 + (i % 3)) for i in range(20)]
    src = tmp_path / "wps_restart_src"
    ckpt = str(tmp_path / "ckpt_wps_restart")
    out = str(tmp_path / "wps_restart_out")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.wps_stream(stream, k=4)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r.key, r.seq, r.n_sample, tuple(r.sample_ids), r.kth_priority)
            for r in spark.read.parquet(out).collect()
        }

    _write_single_file(spark.createDataFrame(rows[:10], schema), src, "b0.parquet")
    run1 = drain()
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(rows[10:], schema), src, "b1.parquet")
    cumulative = drain()

    # fresh single-session drain over both files, separate checkpoint
    fresh_src = tmp_path / "wps_restart_fresh"
    fresh_ckpt = str(tmp_path / "ckpt_wps_fresh")
    fresh_out = str(tmp_path / "wps_fresh_out")
    _write_single_file(spark.createDataFrame(rows[:10], schema), fresh_src, "b0.parquet")
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(rows[10:], schema), fresh_src, "b1.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(fresh_src))
    )
    q = (
        jobs.wps_stream(stream, k=4)
        .writeStream.format("parquet")
        .option("path", fresh_out)
        .outputMode("append")
        .option("checkpointLocation", fresh_ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    fresh = {
        (r.key, r.seq, r.n_sample, tuple(r.sample_ids), r.kth_priority)
        for r in spark.read.parquet(fresh_out).collect()
    }
    assert cumulative == fresh and len(cumulative) >= 1
    assert run1 <= cumulative  # restart re-emitted nothing


def test_wps_fold_chunking_invariance_hypothesis():
    """Hypothesis pin: folding any chunking of any (priority, id)
    multiset reaches the same bottom-k state (== the definitional
    per-id-MIN-priority bottom-k — an id re-arriving with a different
    weight collapses to its best priority instead of occupying two
    slots, ADVICE r10), sample_ids never hold duplicate ids, and
    no-change batches report changed=False — the KMV disorder law
    with weights."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesis_stream_video_project_spark.streaming.jobs import _wps_fold

    @settings(max_examples=100, deadline=None)
    @given(
        pairs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=30),
                st.integers(min_value=1, max_value=30),
            ),
            max_size=40,
        ),
        cuts=st.lists(st.integers(min_value=0, max_value=40), max_size=5),
        k=st.integers(min_value=2, max_value=6),
    )
    def run(pairs, cuts, k):
        held = []
        bounds = sorted(set(c for c in cuts if c <= len(pairs)))
        prev = 0
        for b in bounds + [len(pairs)]:
            held, _ = _wps_fold(held, pairs[prev:b], k)
            prev = b
        best = {}
        for p, i in pairs:
            best[i] = min(best.get(i, p), p)
        assert held == sorted((p, i) for i, p in best.items())[:k]
        assert len({i for _, i in held}) == len(held)
        again, changed = _wps_fold(held, pairs, k)
        assert again == held and not changed

    run()


def test_bloom_fold_properties_hypothesis():
    """Hypothesis pins for the growing-filter fold: (a) replaying the
    SAME ordered docs in any batch chunking yields identical emissions
    (the order contract makes chunking invisible); (b) a verbatim
    re-ingest of an earlier doc scores ALL its grams as prior hits (no
    false negatives — the Bloom law at the fold level); (c) word state
    is pure-python ints (the pickler contract)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesis_stream_video_project_spark.streaming.jobs import (
        _bloom_stream_fold,
    )

    pos = st.lists(
        st.integers(min_value=0, max_value=65535), min_size=3, max_size=9
    ).map(lambda xs: xs[: 3 * (len(xs) // 3)])

    @settings(max_examples=60, deadline=None)
    @given(
        docs=st.lists(
            st.tuples(st.integers(min_value=0, max_value=50), pos),
            min_size=1,
            max_size=12,
            unique_by=lambda d: d[0],
        ),
        cut=st.integers(min_value=0, max_value=12),
    )
    def run(docs, cut):
        docs = [(i, len(p) // 3, p) for i, p in docs]
        w1, out1 = _bloom_stream_fold([], sorted(docs))
        ordered = sorted(docs)
        c = min(cut, len(ordered))
        w2, outa = _bloom_stream_fold([], ordered[:c])
        w2, outb = _bloom_stream_fold(w2, ordered[c:])
        assert outa + outb == out1 and w2 == w1
        assert all(isinstance(x, int) and not hasattr(x, "dtype") for x in w1)
        # re-ingest the first doc: every gram must be a prior hit now
        first = ordered[0]
        _, out3 = _bloom_stream_fold(w1, [first])
        assert out3 == [(first[0], first[1], first[1])]

    run()


# ---------------------------------------------------------------------------
# Online latest-value as-of enrichment (16th dual-API op)
# ---------------------------------------------------------------------------

_LVE_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double"
)


def _lve_rows(spark, sf_dir):
    """Fixture purchases+clicks in EVENT-TIME order (the op's in-order
    feed contract — chunk boundaries must respect it)."""
    return [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"])
        for r in io.load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("purchase", "click"))
        .orderBy("ts", "event_id")
        .limit(3000)
        .collect()
    ]


def _drain_lve(spark, tmp_path, fn, rows, tag, nfiles):
    src = tmp_path / f"lve_src_{tag}"
    step = -(-len(rows) // nfiles)
    for i in range(nfiles):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(rows[i * step : (i + 1) * step], _LVE_SCHEMA),
            src,
            f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema(_LVE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(f"lve_out_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_lve_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        (r.user_id, r.probe_event_id, r.ref_ts_us, r.ref_vm)
        for r in spark.sql(f"SELECT * FROM lve_out_{tag}").collect()
    }


def _lve_batch_twin(spark, rows):
    """The oracle-validated batch as-of: latest purchase <= each click."""
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long
    from kinesis_stream_video_project_spark.operators.asof import asof_join

    df = spark.createDataFrame(rows, _LVE_SCHEMA)
    refs = df.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        "user_id",
        "ts",
        scaled_long(F.col("value"), 1000).alias("vm"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ref_ts"),
    )
    probes = df.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    return {
        (r.user_id, r.event_id, r.asof_ref_ts, r.asof_vm)
        for r in asof_join(
            probes, refs, "user_id", right_payload=["vm", "ref_ts"]
        ).collect()
    }


def test_lve_stream_matches_batch_asof(spark, tmp_path, sf_dir):
    """Drained enrichment equals the batch asof_join(backward) twin
    exactly — on one file AND on three event-time-ordered files (the
    in-order chunking contract): a streaming op certified against the
    oracle-validated as-of operator."""
    rows = _lve_rows(spark, sf_dir)
    want = _lve_batch_twin(spark, rows)
    got1 = _drain_lve(spark, tmp_path, jobs.lve_stream, rows, "gs1", 1)
    got3 = _drain_lve(spark, tmp_path, jobs.lve_stream, rows, "gs3", 3)
    assert got1 == got3 == want
    # non-degenerate both ways: enriched probes and no-ref-yet NULL rows
    assert any(v is not None for (_, _, _, v) in want)
    assert any(v is None for (_, _, _, v) in want)


def test_lve_stream_tws_matches_group_state_form(spark, tmp_path, sf_dir):
    """GS ≡ TWS on the same drain (the dual-API law, op sixteen)."""
    rows = _lve_rows(spark, sf_dir)[:1200]
    gs = _drain_lve(spark, tmp_path, jobs.lve_stream, rows, "eq_gs", 2)
    tws = _drain_lve(spark, tmp_path, jobs.lve_stream_tws, rows, "eq_tws", 2)
    assert gs == tws and len(gs) > 10


def test_lve_stream_checkpoint_restart_resumes(spark, tmp_path):
    """Stop-and-restart against the SAME checkpoint must resume the
    held latest value: a post-restart probe is enriched with the
    pre-restart reference, nothing re-emits, and the emission union
    equals a fresh two-file drain."""
    import datetime as dt

    base = dt.datetime(2025, 3, 1, tzinfo=dt.timezone.utc)

    def t(sec):
        return base + dt.timedelta(seconds=sec)

    b0 = [
        (1, t(0), 7, "purchase", 5.0),
        (2, t(10), 7, "click", None),
    ]
    b1 = [
        (3, t(20), 7, "click", None),
        (4, t(30), 7, "purchase", 9.0),
        (5, t(40), 7, "click", None),
    ]
    src = tmp_path / "lve_restart_src"
    ckpt = str(tmp_path / "ckpt_lve_restart")
    out = str(tmp_path / "lve_restart_out")

    def drain():
        stream = (
            spark.readStream.schema(_LVE_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.lve_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r.user_id, r.probe_event_id, r.ref_ts_us, r.ref_vm)
            for r in spark.read.parquet(out).collect()
        }

    base_us = int(base.timestamp()) * 1_000_000
    _write_single_file(spark.createDataFrame(b0, _LVE_SCHEMA), src, "b0.parquet")
    run1 = drain()
    assert run1 == {(7, 2, base_us, 5000)}
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(b1, _LVE_SCHEMA), src, "b1.parquet")
    cumulative = drain()
    # click 3 enriched from the RESTORED pre-restart state; click 5 from
    # the post-restart purchase
    assert cumulative == {
        (7, 2, base_us, 5000),
        (7, 3, base_us, 5000),
        (7, 5, base_us + 30_000_000, 9000),
    }

    fresh_src = tmp_path / "lve_restart_fresh"
    fresh_ckpt = str(tmp_path / "ckpt_lve_fresh")
    fresh_out = str(tmp_path / "lve_fresh_out")
    _write_single_file(spark.createDataFrame(b0, _LVE_SCHEMA), fresh_src, "b0.parquet")
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(b1, _LVE_SCHEMA), fresh_src, "b1.parquet")
    stream = (
        spark.readStream.schema(_LVE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(fresh_src))
    )
    q = (
        jobs.lve_stream(stream)
        .writeStream.format("parquet")
        .option("path", fresh_out)
        .outputMode("append")
        .option("checkpointLocation", fresh_ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    fresh = {
        (r.user_id, r.probe_event_id, r.ref_ts_us, r.ref_vm)
        for r in spark.read.parquet(fresh_out).collect()
    }
    assert cumulative == fresh
    assert run1 <= cumulative  # restart re-emitted nothing


def test_lve_fold_laws_hypothesis():
    """Hypothesis pins for the enrichment fold: (a) splitting any
    EVENT-TIME-SORTED row sequence at any cut points emits exactly the
    one-batch emissions with the same final state (the in-order
    chunking law); (b) every probe before the first reference gets
    NULLs; (c) a reference at the same ts as a probe IS visible (the
    asof >= tie rule)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesis_stream_video_project_spark.streaming.jobs import _lve_fold

    @settings(max_examples=100, deadline=None)
    @given(
        raw=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=50),  # ts
                st.integers(min_value=0, max_value=1),  # side
                st.integers(min_value=0, max_value=500),  # value seed
            ),
            max_size=40,
        ),
        cuts=st.lists(st.integers(min_value=0, max_value=40), max_size=4),
    )
    def run(raw, cuts):
        rows = sorted(
            (ts, side, eid, v if side == 0 else None)
            for eid, (ts, side, v) in enumerate(raw)
        )
        state_all, emitted_all = _lve_fold(None, rows)
        state = None
        emitted = []
        bounds = sorted(set(c for c in cuts if c <= len(rows)))
        prev = 0
        for b in bounds + [len(rows)]:
            state, e = _lve_fold(state, rows[prev:b])
            emitted.extend(e)
            prev = b
        assert state == state_all and emitted == emitted_all
        first_ref = min(
            (ts for ts, side, _, _ in rows if side == 0), default=None
        )
        for (eid, ts, ref_ts, vm), _ in zip(emitted_all, range(10**9)):
            if first_ref is None or ts < first_ref:
                assert ref_ts is None and vm is None
            else:
                assert ref_ts is not None and ref_ts <= ts

    run()


# ---------------------------------------------------------------------------
# Online Holt linear smoothing (17th dual-API op)
# ---------------------------------------------------------------------------


def _holt_rows(spark, sf_dir, limit=2400):
    """Fixture events with values, in series order per event type."""
    return [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"])
        for r in io.load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .orderBy("ts", "event_id")
        .limit(limit)
        .collect()
    ]


def _drain_holt(spark, tmp_path, fn, rows, tag, nfiles):
    src = tmp_path / f"holt_src_{tag}"
    step = -(-len(rows) // nfiles)
    for i in range(nfiles):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(rows[i * step : (i + 1) * step], _LVE_SCHEMA),
            src,
            f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema(_LVE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(f"holt_out_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_holt_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        (r.key, r.step, r.level_s, r.trend_s, r.forecast_next)
        for r in spark.sql(f"SELECT * FROM holt_out_{tag}").collect()
    }


def _holt_batch_twin(spark, rows):
    """The oracle-validated batch fold on the same per-type series."""
    from pyspark.sql import Window

    from kinesis_stream_video_project_spark.functions.numeric import scaled_long
    from kinesis_stream_video_project_spark.operators.forecast import holt_linear

    df = spark.createDataFrame(rows, _LVE_SCHEMA).filter(
        F.col("value").isNotNull()
    )
    series = df.select(
        F.col("event_type").alias("grp"),
        F.row_number()
        .over(
            Window.partitionBy("event_type").orderBy("ts", "event_id")
        )
        .cast("long")
        .alias("step"),
        scaled_long(F.col("value"), 1000).alias("xs"),
    )
    return {
        (r.grp, r.step, r.level_s, r.trend_s, r.forecast_next)
        for r in holt_linear(series).collect()
    }


def test_holt_stream_matches_batch_fold(spark, tmp_path, sf_dir):
    """Drained emissions equal the batch holt_linear fold on the same
    per-type series — on one file AND three series-ordered files (the
    in-order chunking contract), op seventeen certified against the
    oracle-validated batch operator."""
    rows = _holt_rows(spark, sf_dir)
    want = _holt_batch_twin(spark, rows)
    got1 = _drain_holt(spark, tmp_path, jobs.holt_stream, rows, "gs1", 1)
    got3 = _drain_holt(spark, tmp_path, jobs.holt_stream, rows, "gs3", 3)
    assert got1 == got3 == want and len(want) > 100


def test_holt_stream_tws_matches_group_state_form(spark, tmp_path, sf_dir):
    """GS ≡ TWS on the same drain (the dual-API law, op seventeen)."""
    rows = _holt_rows(spark, sf_dir, limit=1000)
    gs = _drain_holt(spark, tmp_path, jobs.holt_stream, rows, "eq_gs", 2)
    tws = _drain_holt(spark, tmp_path, jobs.holt_stream_tws, rows, "eq_tws", 2)
    assert gs == tws and len(gs) > 10


def test_holt_stream_checkpoint_restart_resumes(spark, tmp_path):
    """Restart against the SAME checkpoint resumes (n, level, trend):
    a post-restart value continues the recursion exactly (== a fresh
    two-file drain), nothing re-emits, and the deferred step-1 row
    emits only when the second value arrives — across the restart."""
    import datetime as dt

    base = dt.datetime(2025, 4, 1, tzinfo=dt.timezone.utc)

    def t(sec):
        return base + dt.timedelta(seconds=sec)

    b0 = [(1, t(0), 7, "m", 0.010)]  # x1 = 10 milli: nothing may emit yet
    b1 = [(2, t(10), 7, "m", 0.014), (3, t(20), 7, "m", 0.020)]
    src = tmp_path / "holt_restart_src"
    ckpt = str(tmp_path / "ckpt_holt_restart")
    out = str(tmp_path / "holt_restart_out")

    def drain():
        stream = (
            spark.readStream.schema(_LVE_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.holt_stream(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r.key, r.step, r.level_s, r.trend_s, r.forecast_next)
            for r in spark.read.parquet(out).collect()
        }

    _write_single_file(spark.createDataFrame(b0, _LVE_SCHEMA), src, "b0.parquet")
    run1 = drain()
    assert run1 == set()  # two-point init: nothing before x2
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(b1, _LVE_SCHEMA), src, "b1.parquet")
    cumulative = drain()
    # the handchecked series [10, 14, 20] (test_holt_fold_handchecked),
    # step-1 row emitted AFTER the restart from restored x1 state
    assert cumulative == {
        ("m", 1, 10, 4, 14),
        ("m", 2, 14, 4, 18),
        ("m", 3, 19, 4, 23),
    }


# ---------------------------------------------------------------------------
# Online event-transition pairing (21st dual-API op)
# ---------------------------------------------------------------------------

_TRANS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string"
)


def _drain_trans(spark, tmp_path, fn, rows, tag, nfiles):
    src = tmp_path / f"trans_src_{tag}"
    step = -(-len(rows) // nfiles)
    for i in range(nfiles):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(rows[i * step : (i + 1) * step], _TRANS_SCHEMA),
            src,
            f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema(_TRANS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(f"trans_out_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_trans_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        (r.user_id, r.prev_ty, r.next_ty, r.next_us)
        for r in spark.sql(f"SELECT * FROM trans_out_{tag}").collect()
    }


def _trans_rows(spark, sf_dir, limit=3000):
    return [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"])
        for r in io.load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .orderBy("ts", "event_id")
        .limit(limit)
        .collect()
    ]


def _trans_batch_twin(spark, rows):
    """The r15 window-lag view on the same rows — the oracle-validated
    batch derivation (queries_round15._user_transitions) the stream
    must reproduce."""
    df = spark.createDataFrame(rows, _TRANS_SCHEMA)
    ud = df.select(
        "user_id",
        F.col("event_type"),
        F.unix_micros("ts").alias("_us"),
        "event_id",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    out = (
        ud.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_ty"),
            F.col("event_type").alias("next_ty"),
            F.col("_us").alias("next_us"),
        )
        .filter(F.col("prev_ty").isNotNull())
    )
    return {
        (r.user_id, r.prev_ty, r.next_ty, r.next_us) for r in out.collect()
    }


def test_transitions_stream_matches_batch_lag(spark, tmp_path, sf_dir):
    """Drained emissions equal the batch window-lag transitions on the
    same rows — on one file AND three event-time-ordered files (the
    in-order chunking contract: a bigram spanning a file boundary pairs
    through restored state), op twenty-one certified against the
    oracle-validated r15 derivation."""
    rows = _trans_rows(spark, sf_dir)
    want = _trans_batch_twin(spark, rows)
    got1 = _drain_trans(spark, tmp_path, jobs.transitions_stream, rows, "gs1", 1)
    got3 = _drain_trans(spark, tmp_path, jobs.transitions_stream, rows, "gs3", 3)
    assert got1 == got3 == want and len(want) > 500


def test_transitions_stream_tws_matches_group_state_form(spark, tmp_path, sf_dir):
    """GS ≡ TWS on the same drain (the dual-API law, op twenty-one)."""
    rows = _trans_rows(spark, sf_dir, limit=1200)
    gs = _drain_trans(spark, tmp_path, jobs.transitions_stream, rows, "eq_gs", 2)
    tws = _drain_trans(
        spark, tmp_path, jobs.transitions_stream_tws, rows, "eq_tws", 2
    )
    assert gs == tws and len(gs) > 100


def test_transitions_stream_checkpoint_restart_pairs_across(spark, tmp_path):
    """A bigram spanning the restart boundary: batch 1 ends on 'click',
    batch 2 (after restart) opens with 'purchase' — the pair
    (click, purchase) emits from RESTORED last-type state, and nothing
    re-emits."""
    import datetime as dt

    base = dt.datetime(2025, 8, 1, tzinfo=dt.timezone.utc)

    def ev(eid, sec, ty):
        return (eid, base + dt.timedelta(seconds=sec), 5, ty)

    src = tmp_path / "trans_restart_src"
    ckpt = str(tmp_path / "ckpt_trans_restart")
    out = str(tmp_path / "trans_restart_out")

    def drain():
        stream = (
            spark.readStream.schema(_TRANS_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.transitions_stream_tws(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r.user_id, r.prev_ty, r.next_ty)
            for r in spark.read.parquet(out).collect()
        }

    _write_single_file(
        spark.createDataFrame([ev(1, 0, "view"), ev(2, 10, "click")], _TRANS_SCHEMA),
        src,
        "b0.parquet",
    )
    assert drain() == {(5, "view", "click")}
    time.sleep(1.1)
    _write_single_file(
        spark.createDataFrame([ev(3, 20, "purchase")], _TRANS_SCHEMA),
        src,
        "b1.parquet",
    )
    assert drain() == {(5, "view", "click"), (5, "click", "purchase")}


def test_transitions_fold_chunking_hypothesis():
    """Hypothesis pin: any in-order chunking of any type sequence emits
    exactly the one-shot pairing — state carries the boundary bigram."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        tys=st.lists(st.sampled_from(["a", "b", "c"]), max_size=25),
        chunk=st.integers(min_value=1, max_value=6),
    )
    def law(tys, chunk):
        rows = [(i * 10, i, t) for i, t in enumerate(tys)]
        _, want = jobs._trans_fold(None, rows)
        last, emitted = None, []
        for i in range(0, len(rows), chunk):
            last, e = jobs._trans_fold(last, rows[i : i + chunk])
            emitted.extend(e)
        assert emitted == want

    law()


# ---------------------------------------------------------------------------
# Online Holt-Winters additive seasonal (20th dual-API op)
# ---------------------------------------------------------------------------


def _drain_hw(spark, tmp_path, fn, rows, tag, nfiles):
    src = tmp_path / f"hw_src_{tag}"
    step = -(-len(rows) // nfiles)
    for i in range(nfiles):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(rows[i * step : (i + 1) * step], _LVE_SCHEMA),
            src,
            f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema(_LVE_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(f"hw_out_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_hw_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return {
        (r.key, r.step, r.level_s, r.trend_s, r.season_s, r.forecast_next)
        for r in spark.sql(f"SELECT * FROM hw_out_{tag}").collect()
    }


def _hw_batch_twin(spark, rows):
    """The oracle-validated batch fold on the same per-type series."""
    from pyspark.sql import Window

    from kinesis_stream_video_project_spark.functions.numeric import scaled_long
    from kinesis_stream_video_project_spark.operators.forecast import holt_winters

    df = spark.createDataFrame(rows, _LVE_SCHEMA).filter(
        F.col("value").isNotNull()
    )
    series = df.select(
        F.col("event_type").alias("grp"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
        .cast("long")
        .alias("step"),
        scaled_long(F.col("value"), 1000).alias("xs"),
    )
    return {
        (r.grp, r.step, r.level_s, r.trend_s, r.season_s, r.forecast_next)
        for r in holt_winters(series).collect()
    }


def test_hw_stream_matches_batch_fold(spark, tmp_path, sf_dir):
    """Drained emissions equal the batch holt_winters fold on the same
    per-type series — on one file AND three series-ordered files (the
    in-order chunking contract), op twenty certified against the
    oracle-validated batch operator."""
    rows = _holt_rows(spark, sf_dir)
    want = _hw_batch_twin(spark, rows)
    got1 = _drain_hw(spark, tmp_path, jobs.hw_stream, rows, "gs1", 1)
    got3 = _drain_hw(spark, tmp_path, jobs.hw_stream, rows, "gs3", 3)
    assert got1 == got3 == want and len(want) > 100


def test_hw_stream_tws_matches_group_state_form(spark, tmp_path, sf_dir):
    """GS ≡ TWS on the same drain (the dual-API law, op twenty)."""
    rows = _holt_rows(spark, sf_dir, limit=1000)
    gs = _drain_hw(spark, tmp_path, jobs.hw_stream, rows, "eq_gs", 2)
    tws = _drain_hw(spark, tmp_path, jobs.hw_stream_tws, rows, "eq_tws", 2)
    assert gs == tws and len(gs) > 10


def test_hw_stream_checkpoint_restart_defers_seed(spark, tmp_path):
    """The 7-point init across a restart: six values drain with ZERO
    emissions (the warmup buffer is pure state), the 7th and 8th arrive
    after the restart, and the cumulative output equals the batch fold
    on all eight — the seed row emits from RESTORED warmup values."""
    import datetime as dt

    base = dt.datetime(2025, 7, 1, tzinfo=dt.timezone.utc)
    vals = [0.100, 0.110, 0.120, 0.130, 0.140, 0.150, 0.160, 0.104]

    def ev(i):
        return (i + 1, base + dt.timedelta(seconds=10 * i), 7, "m", vals[i])

    src = tmp_path / "hw_restart_src"
    ckpt = str(tmp_path / "ckpt_hw_restart")
    out = str(tmp_path / "hw_restart_out")

    def drain():
        stream = (
            spark.readStream.schema(_LVE_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.hw_stream_tws(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r.key, r.step, r.level_s, r.trend_s, r.season_s, r.forecast_next)
            for r in spark.read.parquet(out).collect()
        }

    _write_single_file(
        spark.createDataFrame([ev(i) for i in range(6)], _LVE_SCHEMA),
        src,
        "b0.parquet",
    )
    assert drain() == set()  # 7-point init: nothing before x7
    time.sleep(1.1)
    _write_single_file(
        spark.createDataFrame([ev(6), ev(7)], _LVE_SCHEMA), src, "b1.parquet"
    )
    cumulative = drain()
    want = _hw_batch_twin(spark, [ev(i) for i in range(8)])
    assert cumulative == want and len(want) == 2


def test_hw_stream_fold_matches_batch_fold_hypothesis():
    """Hypothesis pin: folding any in-order chunking of any integer
    series emits exactly the batch hw_fold rows with the same final
    (level, trend, seasonal vector) — the m-point-init recipe holds for
    every chunk boundary, including ones splitting the warmup."""
    import pandas as pd

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesis_stream_video_project_spark.operators.forecast import hw_fold

    @settings(max_examples=30, deadline=None)
    @given(
        xs=st.lists(
            st.integers(min_value=-10**9, max_value=10**9),
            min_size=0,
            max_size=40,
        ),
        cuts=st.lists(st.integers(min_value=1, max_value=8), max_size=8),
    )
    def law(xs, cuts):
        state = (0, 0, 0, [], [])
        emitted = []
        i = 0
        for c in cuts + [len(xs)]:
            state, e = jobs._hw_stream_fold(state, xs[i : i + c])
            emitted.extend(e)
            i += c
            if i >= len(xs):
                break
        batch = hw_fold(
            pd.DataFrame(
                {
                    "grp": ["k"] * len(xs),
                    "step": range(1, len(xs) + 1),
                    "xs": xs,
                }
            )
        )
        want = [
            (r.step, r.level_s, r.trend_s, r.season_s, r.forecast_next)
            for r in batch.itertuples()
        ]
        assert emitted == want

    law()


def test_holt_stream_fold_matches_batch_fold_hypothesis():
    """Hypothesis pin: folding any in-order chunking of any integer
    series emits exactly the batch holt_fold rows with the same final
    (level, trend) — the causal form of the two-point-init batch
    fold."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kinesis_stream_video_project_spark.operators.forecast import holt_fold
    from kinesis_stream_video_project_spark.streaming.jobs import (
        _holt_stream_fold,
    )

    @settings(max_examples=100, deadline=None)
    @given(
        xs=st.lists(
            st.integers(min_value=-10**6, max_value=10**6), max_size=30
        ),
        cuts=st.lists(st.integers(min_value=0, max_value=30), max_size=4),
    )
    def run(xs, cuts):
        state = (0, 0, 0)
        emitted = []
        bounds = sorted(set(c for c in cuts if c <= len(xs)))
        prev = 0
        for b in bounds + [len(xs)]:
            state, e = _holt_stream_fold(state, xs[prev:b])
            emitted.extend(e)
            prev = b
        batch = holt_fold(
            pd.DataFrame(
                {
                    "grp": ["g"] * len(xs),
                    "step": list(range(1, len(xs) + 1)),
                    "xs": xs,
                }
            )
        )
        want = [
            (int(r.step), int(r.level_s), int(r.trend_s), int(r.forecast_next))
            for r in batch.itertuples()
        ]
        assert emitted == want
        if len(xs) >= 2:
            assert (state[1], state[2]) == (want[-1][1], want[-1][2])

    run()


# ---------------------------------------------------------------------------
# Online hourly-mix entropy (op twenty-two)
# ---------------------------------------------------------------------------


def _drain_entropy(spark, tmp_path, fn, rows, tag, nfiles, schema):
    src = tmp_path / f"ent_src_{tag}"
    step = -(-len(rows) // nfiles)
    for i in range(nfiles):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(rows[i * step : (i + 1) * step], schema),
            src,
            f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(f"ent_out_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_ent_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows_out = spark.sql(f"SELECT * FROM ent_out_{tag}").collect()
    final = {}
    for r in rows_out:
        if r.key not in final or r.n_events > final[r.key][0]:
            final[r.key] = (
                r.n_events, r.n_hours, r.sum_c2,
                r.h_le_max, r.h_ge_renyi2, r.h_flat,
            )
    return final


def test_entropy_stream_final_matches_batch_claims(spark, sf_dir, tmp_path):
    """Drained final emission per event type equals the oracle-validated
    batch entropy_hourly_claims row on the same rows — on one file AND
    three ARBITRARILY-ORDERED files (the fold is commutative: counters
    sum), op twenty-two certified against the X-220 batch twin."""
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round17 as r17

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    base = [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"])
        for r in io.load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .limit(3000)
        .collect()
    ]
    df = spark.createDataFrame(base, schema)
    with mock.patch.object(r17.io, "load_table", lambda *_a: df):
        want = {
            r["event_type"]: (
                r["n_events"], r["n_hours"], r["sum_c2"],
                r["h_le_max"], r["h_ge_renyi2"], r["h_flat"],
            )
            for r in r17._entropy_hourly_claims(spark, "unused").collect()
        }
    got1 = _drain_entropy(
        spark, tmp_path, jobs.entropy_stream, base, "gs1", 1, schema
    )
    shuffled = sorted(base, key=lambda r: (r[0] * 2654435761) % 104729)
    got3 = _drain_entropy(
        spark, tmp_path, jobs.entropy_stream, shuffled, "gs3", 3, schema
    )
    assert got1 == got3 == want and len(want) >= 4


def test_entropy_stream_tws_matches_group_state_form(spark, sf_dir, tmp_path):
    """GS ≡ TWS on the same drain (the dual-API law, op twenty-two)."""
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    base = [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"])
        for r in io.load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .limit(1200)
        .collect()
    ]
    gs = _drain_entropy(
        spark, tmp_path, jobs.entropy_stream, base, "eq_gs", 2, schema
    )
    tws = _drain_entropy(
        spark, tmp_path, jobs.entropy_stream_tws, base, "eq_tws", 2, schema
    )
    assert gs == tws and len(gs) >= 4


def test_entropy_stream_checkpoint_restart_resumes(spark, tmp_path):
    """Restart against the SAME checkpoint resumes the 24 counters: a
    flat first batch certifies flat; a second batch that slams one hour
    flips h_flat FALSE on the RESUMED counts (state survived — a fresh
    fold over batch 2 alone would see a 2-hour mix and stay flat)."""
    import datetime as dt

    base_d = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    b0 = [
        (i, base_d.replace(hour=i % 24), 1, "m") for i in range(24)
    ]
    b1 = [
        (100 + i, base_d.replace(hour=3), 1, "m") for i in range(200)
    ]
    src = tmp_path / "ent_restart_src"
    ckpt = str(tmp_path / "ckpt_ent_restart")
    out = str(tmp_path / "ent_restart_out")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.entropy_stream_tws(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.read.parquet(out).collect()
        return max(
            ((r.n_events, r.n_hours, r.sum_c2, r.h_flat) for r in rows),
            default=None,
        )

    _write_single_file(spark.createDataFrame(b0, schema), src, "b0.parquet")
    first = drain()
    assert first == (24, 24, 24, True)
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(b1, schema), src, "b1.parquet")
    cumulative = drain()
    # 24 uniform + 200 on hour 3: sum_c2 = 23*1 + 201^2
    assert cumulative == (224, 24, 23 + 201 * 201, False)


def test_entropy_stream_fold_refuses_out_of_domain_hours():
    """Domain guard (ADVICE r12 item 2): a NaN hour (a NULL ts that
    slipped past staging) or any value outside 0..23 must raise a CLEAR
    error, not crash on indexing — and a negative hour must NOT wrap
    onto counts[23] via Python's negative indexing. Valid folds on the
    boundary hours still work."""
    state, out = jobs._entropy_stream_fold([0] * 24, [0, 23])
    assert state[0] == 1 and state[23] == 1 and out[0] == 2

    for bad in (float("nan"), -1, 24, 23.5):
        with pytest.raises(ValueError, match="0..23 domain"):
            jobs._entropy_stream_fold([0] * 24, [bad])


def test_entropy_staged_drops_null_ts(spark):
    """The staging contract the fold guard relies on: NULL-ts rows are
    dropped before the shuffle (the batch twin groups them as a NULL-
    hour row; the online form's fixed 24-counter state declares them
    out of domain — stated in both docstrings)."""
    import datetime as dt

    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 5, 0, 0), 1, "click", 1.0, "{}"),
            (2, None, 1, "click", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = jobs._entropy_staged(ev).collect()
    assert [(r["key"], r["h"]) for r in got] == [("click", 5)]


def test_entropy_stream_fold_commutes_hypothesis():
    """Hypothesis pin: ANY permutation and ANY chunking of any hour
    sequence folds to the same counters and claims row — the
    commutativity law (counters sum) that exempts op twenty-two from
    the ordering contract."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        hours=st.lists(
            st.integers(min_value=0, max_value=23), min_size=1, max_size=40
        ),
        seed=st.integers(min_value=0, max_value=2**31),
        chunk=st.integers(min_value=1, max_value=7),
    )
    def law(hours, seed, chunk):
        import random

        state_a = [0] * 24
        state_a, out_a = jobs._entropy_stream_fold(state_a, hours)
        rng = random.Random(seed)
        perm = hours[:]
        rng.shuffle(perm)
        state_b = [0] * 24
        out_b = None
        for i in range(0, len(perm), chunk):
            state_b, out_b = jobs._entropy_stream_fold(
                state_b, perm[i : i + chunk]
            )
        assert state_a == state_b and out_a == out_b

    law()


# ---------------------------------------------------------------------------
# Online Welch t² (op twenty-three)
# ---------------------------------------------------------------------------

_WELCH_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double"
)


def _drain_welch(spark, tmp_path, fn, rows, tag, nfiles):
    src = tmp_path / f"welch_src_{tag}"
    step = -(-len(rows) // nfiles)
    for i in range(nfiles):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(rows[i * step : (i + 1) * step], _WELCH_SCHEMA),
            src,
            f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema(_WELCH_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(f"welch_out_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_welch_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows_out = spark.sql(f"SELECT * FROM welch_out_{tag}").collect()
    final = None
    for r in rows_out:
        if final is None or r.n_a + r.n_b > final[2] + final[3]:
            final = (r.g_a, r.g_b, r.n_a, r.n_b, r.t2, r.df_welch)
    return final


def _events_rows(spark, sf_dir, limit=3000):
    return [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"])
        for r in io.load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .limit(limit)
        .collect()
    ]


def test_welch_stream_final_matches_batch_operator(spark, sf_dir, tmp_path):
    """Drained final emission equals the oracle-validated batch
    welch_t2_pairs row on the SAME staged rows — on one file AND three
    arbitrarily-ordered files (the fold is commutative: integer sums),
    op twenty-three certified against the X-200 batch operator."""
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long
    from kinesis_stream_video_project_spark.operators.stats import welch_t2_pairs

    base = _events_rows(spark, sf_dir)
    df = spark.createDataFrame(base, _WELCH_SCHEMA)
    staged = df.filter(
        F.col("event_type").isin(["click", "purchase"])
        & F.col("value").isNotNull()
    ).select(
        F.col("event_type").alias("grp"),
        scaled_long(F.col("value"), 100).alias("y"),
    )
    want_row = welch_t2_pairs(staged, grp="grp", y="y").collect()[0]
    want = (
        want_row["g_a"], want_row["g_b"], want_row["n_a"], want_row["n_b"],
        want_row["t2"], want_row["df_welch"],
    )
    got1 = _drain_welch(spark, tmp_path, jobs.welch_stream, base, "gs1", 1)
    shuffled = sorted(base, key=lambda r: (r[0] * 2654435761) % 104729)
    got3 = _drain_welch(spark, tmp_path, jobs.welch_stream, shuffled, "gs3", 3)
    assert got1 == got3 == want
    assert want[2] >= 2 and want[3] >= 2 and want[4] is not None


def test_welch_stream_tws_matches_group_state_form(spark, sf_dir, tmp_path):
    """GS ≡ TWS on the same drain (the dual-API law, op twenty-three)."""
    base = _events_rows(spark, sf_dir, limit=1200)
    gs = _drain_welch(spark, tmp_path, jobs.welch_stream, base, "eq_gs", 2)
    tws = _drain_welch(spark, tmp_path, jobs.welch_stream_tws, base, "eq_tws", 2)
    assert gs == tws and gs is not None


def test_welch_stream_checkpoint_restart_resumes(spark, tmp_path):
    """Restart against the SAME checkpoint resumes the six sums: batch 2
    alone has n_a = n_b = 2 per side with different values than the
    cumulative fold — the emitted counts prove the state survived."""
    import datetime as dt

    t0 = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)
    b0 = [
        (1, t0, 1, "click", 1.0), (2, t0, 1, "click", 3.0),
        (3, t0, 1, "purchase", 10.0), (4, t0, 1, "purchase", 14.0),
    ]
    b1 = [
        (5, t0, 1, "click", 5.0), (6, t0, 1, "click", 7.0),
        (7, t0, 1, "purchase", 18.0), (8, t0, 1, "purchase", 22.0),
    ]
    src = tmp_path / "welch_restart_src"
    ckpt = str(tmp_path / "ckpt_welch_restart")
    out = str(tmp_path / "welch_restart_out")

    def drain():
        stream = (
            spark.readStream.schema(_WELCH_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.welch_stream_tws(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.read.parquet(out).collect()
        return max(
            ((r.n_a, r.n_b, r.t2) for r in rows), default=None
        )

    _write_single_file(spark.createDataFrame(b0, _WELCH_SCHEMA), src, "b0.parquet")
    first = drain()
    assert first is not None and (first[0], first[1]) == (2, 2)
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(b1, _WELCH_SCHEMA), src, "b1.parquet")
    cumulative = drain()
    assert cumulative is not None and (cumulative[0], cumulative[1]) == (4, 4)
    # cross-check the cumulative t2 against a pure-Python full fold
    rows = [(0, 100), (0, 300), (1, 1000), (1, 1400),
            (0, 500), (0, 700), (1, 1800), (1, 2200)]
    _, out_t = jobs._welch_stream_fold((0, 0, 0, 0, 0, 0), rows)
    assert cumulative == (out_t[0], out_t[1], out_t[2])


def test_welch_stream_fold_edges():
    """n < 2 on either side -> no emission; zero-variance pair -> counts
    with NULL t2/df; the Σ¢² BIGINT envelope refuses loudly."""
    st0 = (0, 0, 0, 0, 0, 0)
    st, out = jobs._welch_stream_fold(st0, [(0, 5), (1, 7)])
    assert out is None
    st, out = jobs._welch_stream_fold(st, [(0, 5), (1, 7)])
    assert out == (2, 2, None, None)  # both sides constant: se2 = 0
    st, out = jobs._welch_stream_fold(st, [(0, 9), (1, 11)])
    assert out[0] == 3 and out[1] == 3 and out[2] is not None
    with pytest.raises(ValueError, match="envelope"):
        jobs._welch_stream_fold((2, 0, 1 << 63, 2, 0, 0, ), [])


def test_welch_stream_fold_commutes_hypothesis():
    """Hypothesis pin: ANY permutation and ANY chunking of any arrival
    sequence folds to the same six sums and the same final emission —
    the commutativity law (integer sums) that makes op twenty-three the
    third order-free op in the shelf."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=1),
                st.integers(min_value=-10**6, max_value=10**6),
            ),
            min_size=1,
            max_size=40,
        ),
        seed=st.integers(min_value=0, max_value=2**31),
        chunk=st.integers(min_value=1, max_value=7),
    )
    def law(rows, seed, chunk):
        import random

        state_a, out_a = jobs._welch_stream_fold(
            (0, 0, 0, 0, 0, 0), rows
        )
        rng = random.Random(seed)
        perm = rows[:]
        rng.shuffle(perm)
        state_b = (0, 0, 0, 0, 0, 0)
        out_b = None
        for i in range(0, len(perm), chunk):
            state_b, ob = jobs._welch_stream_fold(
                state_b, perm[i : i + chunk]
            )
            out_b = ob if ob is not None else out_b
        assert state_a == state_b
        if out_a is not None:
            assert out_a == out_b

    law()


# ---------------------------------------------------------------------------
# Online SCD2 dimension maintenance (op twenty-four)
# ---------------------------------------------------------------------------

_SCD2_SCHEMA = "k long, op string, seq long, p string"


def _drain_scd2(spark, tmp_path, fn, rows, tag, nfiles):
    """Feed seq-ordered files, return the reconstructed history set:
    closed rows, plus open emissions whose (k, valid_from) never closed
    (the stated open/close dual-emission contract)."""
    src = tmp_path / f"scd2_src_{tag}"
    ordered = sorted(rows, key=lambda r: r[2])
    step = -(-len(ordered) // nfiles)
    for i in range(nfiles):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(
                ordered[i * step : (i + 1) * step], _SCD2_SCHEMA
            ),
            src,
            f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema(_SCD2_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(f"scd2_out_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_scd2_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emitted = spark.sql(f"SELECT * FROM scd2_out_{tag}").collect()
    closed = {
        (r.k, r.valid_from): (r.k, r.p, r.valid_from, r.valid_to, False)
        for r in emitted
        if r.valid_to is not None
    }
    opens = {
        (r.k, r.valid_from): (r.k, r.p, r.valid_from, None, True)
        for r in emitted
        if r.valid_to is None
    }
    return set(closed.values()) | {
        v for kk, v in opens.items() if kk not in closed
    }


def _orders_changelog(spark, sf_dir, limit=4000):
    """The registered scd2_customer_history derivation: orders as a
    changelog (F->U, O->I, else D; seq = o_orderkey, p = priority)."""
    return [
        (r["k"], r["op"], r["seq"], r["p"])
        for r in io.load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("k"),
            F.expr(
                "CASE o_orderstatus WHEN 'F' THEN 'U' WHEN 'O' THEN 'I' "
                "ELSE 'D' END"
            ).alias("op"),
            F.col("o_orderkey").alias("seq"),
            F.col("o_orderpriority").alias("p"),
        )
        .orderBy("seq")
        .limit(limit)
        .collect()
    ]


def test_scd2_stream_reconstructs_batch_history(spark, sf_dir, tmp_path):
    """Drained reconstruction (closed ∪ never-closed opens) equals the
    oracle-validated batch scd2_history on the SAME changelog — one
    file AND three seq-ordered files (the in-order feed contract), op
    twenty-four certified against the r12-green batch family."""
    from kinesis_stream_video_project_spark.operators.scd import scd2_history

    base = _orders_changelog(spark, sf_dir)
    df = spark.createDataFrame(base, _SCD2_SCHEMA)
    want = {
        (str(r["k"]), r["p"], r["valid_from"], r["valid_to"],
         bool(r["is_current"]))
        for r in scd2_history(df, key="k", payload="p").collect()
    }
    got1 = _drain_scd2(spark, tmp_path, jobs.scd2_stream, base, "gs1", 1)
    got3 = _drain_scd2(spark, tmp_path, jobs.scd2_stream, base, "gs3", 3)
    assert got1 == got3 == want
    n_open = sum(1 for r in want if r[4])
    n_closed = len(want) - n_open
    assert n_open >= 10 and n_closed >= 10  # both contracts exercised


def test_scd2_stream_tws_matches_group_state_form(spark, sf_dir, tmp_path):
    """GS ≡ TWS on the same drain (the dual-API law, op twenty-four)."""
    base = _orders_changelog(spark, sf_dir, limit=1500)
    gs = _drain_scd2(spark, tmp_path, jobs.scd2_stream, base, "eq_gs", 2)
    tws = _drain_scd2(spark, tmp_path, jobs.scd2_stream_tws, base, "eq_tws", 2)
    assert gs == tws and len(gs) >= 10


def test_scd2_stream_checkpoint_restart_closes_held_version(spark, tmp_path):
    """Restart against the SAME checkpoint: batch 1 opens a version;
    batch 2 (after restart) deletes it — the close row's valid_from
    comes from state restored across the restart."""
    src = tmp_path / "scd2_restart_src"
    ckpt = str(tmp_path / "ckpt_scd2_restart")
    out = str(tmp_path / "scd2_restart_out")

    def drain():
        stream = (
            spark.readStream.schema(_SCD2_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.scd2_stream_tws(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {
            (r.k, r.p, r.valid_from, r.valid_to, r.is_current)
            for r in spark.read.parquet(out).collect()
        }

    _write_single_file(
        spark.createDataFrame([(1, "I", 10, "HIGH")], _SCD2_SCHEMA),
        src, "b0.parquet",
    )
    first = drain()
    assert first == {("1", "HIGH", 10, None, True)}
    time.sleep(1.1)
    _write_single_file(
        spark.createDataFrame([(1, "D", 20, None)], _SCD2_SCHEMA),
        src, "b1.parquet",
    )
    cumulative = drain()
    assert ("1", "HIGH", 10, 20, False) in cumulative


def test_scd2_stream_fold_laws():
    """The batch twin's stated semantics, replayed on the fold: no-op
    collapse chains (a,a,a -> one version), a,D,a keeps both a's, D
    with no open version is harmless, duplicate seq refuses, an
    out-of-order arrival refuses (the in-order feed contract), unknown
    op refuses."""
    fold = jobs._scd2_stream_fold
    empty = (None, None, None, None, None)

    st, out = fold(empty, [("I", 1, "a"), ("U", 2, "a"), ("U", 3, "a")])
    assert out == [("a", 1, None, True)]  # a,a,a keeps only the first

    st, out = fold(empty, [("I", 1, "a"), ("D", 2, None), ("I", 3, "a")])
    assert out == [
        ("a", 1, None, True), ("a", 1, 2, False), ("a", 3, None, True)
    ]  # the delete makes the re-insert a real new version

    st, out = fold(empty, [("D", 5, None)])
    assert out == [] and st[0] == 5  # harmless, but raw-lag advances

    with pytest.raises(ValueError, match="ambiguous"):
        fold(empty, [("I", 1, "a"), ("U", 1, "b")])
    with pytest.raises(ValueError, match="in-order feed"):
        fold((5, "I", "a", 5, "a"), [("U", 3, "b")])
    with pytest.raises(ValueError, match="unknown op"):
        fold(empty, [("X", 1, "a")])


def test_scd2_stream_fold_chunking_hypothesis():
    """Any CHUNKING of a seq-ordered changelog emits exactly the
    one-shot fold's rows with the same final state (the in-order
    chunking law, the Holt X-192 pattern — SCD2's fold is order-
    DEPENDENT by nature, so the law is chunking-invariance under the
    stated contract, not commutativity)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        ops=st.lists(
            st.tuples(
                st.sampled_from(["I", "U", "D"]),
                st.sampled_from(["a", "b", None]),
            ),
            min_size=1,
            max_size=30,
        ),
        cuts=st.lists(st.integers(min_value=0, max_value=30), max_size=4),
    )
    def law(ops, cuts):
        rows = [
            (op, seq + 1, None if op == "D" else p)
            for seq, (op, p) in enumerate(ops)
        ]
        state_a, out_a = jobs._scd2_stream_fold(
            (None, None, None, None, None), rows
        )
        bounds = sorted(set(c for c in cuts if c <= len(rows)))
        state_b = (None, None, None, None, None)
        out_b = []
        prev = 0
        for bnd in bounds + [len(rows)]:
            state_b, e = jobs._scd2_stream_fold(state_b, rows[prev:bnd])
            out_b.extend(e)
            prev = bnd
        assert state_a == state_b and out_a == out_b

    law()


# ---------------------------------------------------------------------------
# Online chi-square contingency monitor (op twenty-five)
# ---------------------------------------------------------------------------

_CHI2_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _drain_chi2(spark, tmp_path, fn, rows, tag, nfiles):
    """Feed files, return the max-n cell frame as a set of tuples."""
    src = tmp_path / f"chi2_src_{tag}"
    step = -(-len(rows) // nfiles)
    for i in range(nfiles):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(rows[i * step : (i + 1) * step], _CHI2_SCHEMA),
            src,
            f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema(_CHI2_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(f"chi2_out_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_chi2_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emitted = spark.sql(f"SELECT * FROM chi2_out_{tag}").collect()
    n_max = max(r.n for r in emitted)
    return {
        (r.a, r.b, r.obs, r.row_total, r.col_total, r.n, r.contrib_milli)
        for r in emitted
        if r.n == n_max
    }


def test_chi2_stream_final_matches_batch_cells(spark, sf_dir, tmp_path):
    """Drained max-n cell frame equals the oracle-validated batch
    chi_square_cells on the SAME rows — one file AND three arbitrarily-
    ordered files (the fold is commutative: counters sum), zero cells
    from the marginal cross included. Op twenty-five certified against
    the batch operator."""
    from kinesis_stream_video_project_spark.operators.stats import (
        chi_square_cells,
    )

    base = [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"])
        for r in io.load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .limit(3000)
        .collect()
    ]
    df = spark.createDataFrame(base, _CHI2_SCHEMA).select(
        F.col("event_type").cast("string").alias("a"),
        F.dayofweek("ts").cast("string").alias("b"),
    )
    want = {
        (r["a"], r["b"], r["obs"], r["row_total"], r["col_total"], r["n"],
         r["contrib_milli"])
        for r in chi_square_cells(df, "a", "b").collect()
    }
    got1 = _drain_chi2(spark, tmp_path, jobs.chi2_stream, base, "gs1", 1)
    shuffled = sorted(base, key=lambda r: (r[0] * 2654435761) % 104729)
    got3 = _drain_chi2(spark, tmp_path, jobs.chi2_stream, shuffled, "gs3", 3)
    assert got1 == got3 == want
    assert any(r[2] == 0 for r in want) or len(want) >= 20


def test_chi2_stream_tws_matches_group_state_form(spark, sf_dir, tmp_path):
    """GS ≡ TWS on the same drain (the dual-API law, op twenty-five)."""
    base = [
        (r["event_id"], r["ts"], r["user_id"], r["event_type"])
        for r in io.load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type")
        .limit(1200)
        .collect()
    ]
    gs = _drain_chi2(spark, tmp_path, jobs.chi2_stream, base, "eq_gs", 2)
    tws = _drain_chi2(spark, tmp_path, jobs.chi2_stream_tws, base, "eq_tws", 2)
    assert gs == tws and len(gs) >= 20


def test_chi2_stream_fold_laws():
    """Hand-checked 2x2 + the batch twin's refusals + NULL categories
    as real cells (the batch groupBy keeps NULL groups)."""
    fold = jobs._chi2_stream_fold
    st, out = fold(([], [], []), [("x", "1"), ("x", "2"), ("y", "1"), ("y", "1")])
    # n=4; rows x:2 y:2; cols 1:3 2:1
    cells = {(a, b): (obs, rt, ct, n, cm) for a, b, obs, rt, ct, n, cm in out}
    assert cells[("x", "1")] == (1, 2, 3, 4, (1000 * (1 * 4 - 2 * 3) ** 2) // (2 * 3 * 4))
    assert cells[("y", "2")][0] == 0  # zero cell materialized
    assert len(out) == 4 and sum(c[0] for c in cells.values()) == 4

    st2, out2 = fold(st, [(None, "1")])  # NULL category is a real row
    assert any(a is None for a, *_ in out2)

    import pytest as _pt

    with _pt.raises(ValueError, match="max_cells"):
        fold(([], [], []), [(str(i), str(j)) for i in range(101) for j in range(101)])


def test_chi2_stream_fold_commutes_hypothesis():
    """Any permutation and chunking folds to the same ledger and the
    same final cell frame — the fourth order-free op's law."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        pairs=st.lists(
            st.tuples(
                st.sampled_from(["p", "q", "r"]),
                st.sampled_from(["1", "2"]),
            ),
            min_size=1,
            max_size=40,
        ),
        seed=st.integers(min_value=0, max_value=2**31),
        chunk=st.integers(min_value=1, max_value=7),
    )
    def law(pairs, seed, chunk):
        import random

        state_a, out_a = jobs._chi2_stream_fold(([], [], []), pairs)
        rng = random.Random(seed)
        perm = pairs[:]
        rng.shuffle(perm)
        state_b = ([], [], [])
        out_b = None
        for i in range(0, len(perm), chunk):
            state_b, out_b = jobs._chi2_stream_fold(
                state_b, perm[i : i + chunk]
            )
        assert state_a == state_b and out_a == out_b

    law()


# ---------------------------------------------------------------------------
# Online Benford first-digit monitor (op twenty-six)
# ---------------------------------------------------------------------------


def _drain_benford(spark, tmp_path, fn, rows, tag, nfiles, schema):
    src = tmp_path / f"bfd_src_{tag}"
    step = -(-len(rows) // nfiles)
    for i in range(nfiles):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(rows[i * step : (i + 1) * step], schema),
            src,
            f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(f"bfd_out_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_bfd_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows_out = spark.sql(f"SELECT * FROM bfd_out_{tag}").collect()
    # group by key, keep the frame with the max n_total (last emission)
    by_key = {}
    for r in rows_out:
        by_key.setdefault(r.key, {}).setdefault(r.n_total, {})[r.digit] = (
            r.n_obs, r.obs_millionths, r.expected_millionths,
            r.dev_millionths, r.conforms_15k,
        )
    return {
        k: frames[max(frames)] for k, frames in by_key.items()
    }


def test_benford_stream_literals_are_the_x150_constants_refined():
    """The fold's millionths literals sum to exactly 10^6 and ROUND to
    the registered X-150 operator's milli constants (BENFORD_MILLI is
    round-to-nearest of the same published values) — the two scales
    describe one distribution."""
    from kinesis_stream_video_project_spark.operators.stats import BENFORD_MILLI

    assert sum(jobs._BENFORDM_EXPECTED) == 10**6
    assert tuple(
        (v + 500) // 1000 for v in jobs._BENFORDM_EXPECTED
    ) == BENFORD_MILLI


def test_benford_stream_final_matches_x150_operator(spark, sf_dir, tmp_path):
    """Drained final frame per event type equals the REGISTERED X-150
    ``benford_deviation`` operator on the same rows — counts equal,
    and the millionths observed shares integer-divide down to the
    operator's milli shares exactly (the nested-division identity
    floor(floor(n·10^6/N)/1000) == floor(n·10^3/N)) — on one file AND
    three ARBITRARILY-ORDERED files (the fold is commutative: counters
    sum), op twenty-six certified against its batch twin."""
    from kinesis_stream_video_project_spark.operators.stats import (
        benford_deviation,
    )

    schema = "event_id long, event_type string, value double"
    base = [
        (r["event_id"], r["event_type"], r["value"])
        for r in io.load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .limit(3000)
        .collect()
    ]
    want = {}
    for key in sorted({t for _i, t, _v in base}):
        # the operator REFUSES values scaling below 1 cent; the stream
        # staging DROPS them (stated contract) — align the feed.
        vals = [
            v
            for _i, t, v in base
            if t == key and v is not None and int(v * 100 + 0.5) >= 1
        ]
        df = spark.createDataFrame([(float(v),) for v in vals], "v double")
        want[key] = {
            r["digit"]: (r["n_d"], r["observed_milli"])
            for r in benford_deviation(df, "v").collect()
        }
    got1 = _drain_benford(
        spark, tmp_path, jobs.benford_stream, base, "gs1", 1, schema
    )
    shuffled = sorted(base, key=lambda r: (r[0] * 2654435761) % 104729)
    got3 = _drain_benford(
        spark, tmp_path, jobs.benford_stream, shuffled, "gs3", 3, schema
    )
    assert got1 == got3 and len(want) >= 4
    for key, frame in got1.items():
        milli = {
            d: (row[0], row[1] // 1000) for d, row in frame.items()
        }  # (n_obs, obs_millionths // 1000)
        assert milli == want[key], key


def test_benford_stream_tws_matches_group_state_form(spark, sf_dir, tmp_path):
    """GS ≡ TWS on the same drain (the dual-API law, op twenty-six)."""
    schema = "event_id long, event_type string, value double"
    base = [
        (r["event_id"], r["event_type"], r["value"])
        for r in io.load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .limit(1200)
        .collect()
    ]
    gs = _drain_benford(
        spark, tmp_path, jobs.benford_stream, base, "eq_gs", 2, schema
    )
    tws = _drain_benford(
        spark, tmp_path, jobs.benford_stream_tws, base, "eq_tws", 2, schema
    )
    assert gs == tws and len(gs) >= 4


def test_benford_stream_checkpoint_restart_resumes(spark, tmp_path):
    """Restart against the SAME checkpoint resumes the 9 counters: a
    Benford-proportional first batch certifies every digit conforming;
    a second batch slamming digit 9 flips conformance FALSE on the
    RESUMED 2000-row mix (n_total proves the state survived — digit 1
    still counts its 301 batch-1 rows)."""
    schema = "event_id long, event_type string, value double"
    b0, i = [], 0
    for d, exp in zip(range(1, 10), jobs._BENFORDM_EXPECTED):
        for _ in range(round(exp / 1000)):
            b0.append((i, "m", float(d)))
            i += 1
    assert len(b0) == 1000
    b1 = [(10000 + j, "m", 9.0) for j in range(1000)]
    src = tmp_path / "bfd_restart_src"
    ckpt = str(tmp_path / "ckpt_bfd_restart")
    out = str(tmp_path / "bfd_restart_out")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.benford_stream_tws(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.read.parquet(out).collect()
        frames = {}
        for r in rows:
            frames.setdefault(r.n_total, {})[r.digit] = (
                r.n_obs, r.conforms_15k
            )
        return frames[max(frames)], max(frames)

    _write_single_file(spark.createDataFrame(b0, schema), src, "b0.parquet")
    first, n0 = drain()
    assert n0 == 1000 and all(c for _n, c in first.values())
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(b1, schema), src, "b1.parquet")
    cumulative, n1 = drain()
    assert n1 == 2000  # resumed, not restarted
    assert cumulative[1] == (301, False)  # batch-1 rows still counted
    assert cumulative[9] == (1046, False)


def test_benford_stream_fold_refuses_out_of_domain():
    """Domain guard: NaN (a NULL that slipped past staging), zero, or a
    negative cent amount must raise a CLEAR error, not index-corrupt a
    counter. Valid boundary digits still fold."""
    counts, out = jobs._benford_stream_fold([0] * 9, [100, 999999])
    assert counts == [1, 0, 0, 0, 0, 0, 0, 0, 1]
    assert out[0][1] == 1 and out[8][1] == 1

    for bad in (float("nan"), 0, -100):
        with pytest.raises(ValueError, match="positive domain"):
            jobs._benford_stream_fold([0] * 9, [bad])


def test_benford_staged_drops_null_and_nonpositive(spark):
    """The staging contract the fold guard relies on: NULL and
    non-positive values (including one that scales to 0 cents) are
    dropped before the shuffle."""
    ev = spark.createDataFrame(
        [
            (1, "click", 1.23),
            (2, "click", None),
            (3, "click", -5.0),
            (4, "click", 0.001),  # floor(0.1 + 0.5) = 0 cents
        ],
        "event_id long, event_type string, value double",
    )
    got = jobs._benford_staged(ev).collect()
    assert [(r["key"], r["c"]) for r in got] == [("click", 123)]


def test_benford_stream_fold_commutes_hypothesis():
    """Hypothesis pin: ANY permutation and ANY chunking of any positive
    cent sequence folds to the same counters and frame — the
    commutativity law (counters sum) that makes op twenty-six the
    FIFTH order-free op."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=1, max_value=10**12),
            min_size=1,
            max_size=60,
        ),
        st.randoms(),
    )
    def law(cents, rnd):
        base_counts, base_out = jobs._benford_stream_fold([0] * 9, cents)
        perm = list(cents)
        rnd.shuffle(perm)
        cuts = sorted(rnd.sample(range(len(perm)), rnd.randint(0, min(3, len(perm) - 1))) or [])
        state = [0] * 9
        prev = 0
        out = None
        for cut in cuts + [len(perm)]:
            chunk = perm[prev:cut]
            prev = cut
            if chunk:
                state, out = jobs._benford_stream_fold(state, chunk)
        assert state == base_counts and out == base_out

    law()


# ---------------------------------------------------------------------------
# Online HHI concentration monitor (op twenty-seven)
# ---------------------------------------------------------------------------


def _drain_hhi(spark, tmp_path, fn, rows, tag, nfiles, schema):
    src = tmp_path / f"hhi_src_{tag}"
    step = -(-len(rows) // nfiles)
    for i in range(nfiles):
        if i:
            time.sleep(1.1)
        _write_single_file(
            spark.createDataFrame(rows[i * step : (i + 1) * step], schema),
            src,
            f"b{i}.parquet",
        )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        fn(stream)
        .writeStream.format("memory")
        .queryName(f"hhi_out_{tag}")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / f"ckpt_hhi_{tag}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows_out = spark.sql(f"SELECT * FROM hhi_out_{tag}").collect()
    final = {}
    for r in rows_out:
        if r.key not in final or r.total_cents > final[r.key][1]:
            final[r.key] = (
                r.n_sellers, r.total_cents, r.hhi_millionths,
                r.top_share_millionths,
            )
    return final


def test_hhi_stream_final_matches_batch_arithmetic(spark, sf_dir, tmp_path):
    """Drained final row per event type equals the oracle-validated
    batch hhi_supplier_concentration arithmetic on the same rows — on
    one file AND three ARBITRARILY-ORDERED files (the fold is
    commutative: ledger entries sum), op twenty-seven certified against
    the X-239 batch twin."""
    import unittest.mock as mock

    from kinesis_stream_video_project_spark.plans import queries_round18 as r18

    schema = "event_id long, event_type string, user_id long, value double"
    base = [
        (r["event_id"], r["event_type"], r["user_id"], r["value"])
        for r in io.load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "user_id", "value")
        .limit(3000)
        .collect()
    ]
    want = {}
    for key in sorted({t for _i, t, _u, _v in base}):
        rows = [
            (u, float(v), 0.0)
            for _i, t, u, v in base
            if t == key and v is not None and u is not None
        ]
        li = spark.createDataFrame(
            rows, "l_suppkey long, l_extendedprice double, l_discount double"
        )
        supplier = spark.createDataFrame(
            [(u,) for u in sorted({r[0] for r in rows})], "s_suppkey long"
        ).withColumn("s_nationkey", F.lit(0).cast("int"))
        nation = spark.createDataFrame(
            [(0, "T", 0)], "n_nationkey int, n_name string, n_regionkey int"
        )
        tables = {"lineitem": li, "supplier": supplier, "nation": nation}
        with mock.patch.object(
            r18.io, "load_table", lambda _s, _d, name: tables[name]
        ):
            row = r18._hhi_supplier_concentration(spark, "unused").collect()[0]
        want[key] = (
            row["n_suppliers"], row["total_cents"], row["hhi_millionths"]
        )
    got1 = _drain_hhi(
        spark, tmp_path, jobs.hhi_stream, base, "gs1", 1, schema
    )
    shuffled = sorted(base, key=lambda r: (r[0] * 2654435761) % 104729)
    got3 = _drain_hhi(
        spark, tmp_path, jobs.hhi_stream, shuffled, "gs3", 3, schema
    )
    assert {k: v[:3] for k, v in got1.items()} == want
    assert got1 == got3 and len(want) >= 4


def test_hhi_stream_tws_matches_group_state_form(spark, sf_dir, tmp_path):
    """GS ≡ TWS on the same drain (the dual-API law, op twenty-seven)."""
    schema = "event_id long, event_type string, user_id long, value double"
    base = [
        (r["event_id"], r["event_type"], r["user_id"], r["value"])
        for r in io.load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", "user_id", "value")
        .limit(1200)
        .collect()
    ]
    gs = _drain_hhi(
        spark, tmp_path, jobs.hhi_stream, base, "eq_gs", 2, schema
    )
    tws = _drain_hhi(
        spark, tmp_path, jobs.hhi_stream_tws, base, "eq_tws", 2, schema
    )
    assert gs == tws and len(gs) >= 4


def test_hhi_stream_checkpoint_restart_resumes(spark, tmp_path):
    """Restart against the SAME checkpoint resumes the seller ledger:
    batch 1 = four equal sellers (HHI 250000); batch 2 = a whale
    matching their combined total — on the RESUMED ledger HHI jumps to
    (4·1 + 16)·1e6 // 64 = 312500 with top_share 500000 (a fresh fold
    over batch 2 alone would read a 10^6 monopoly)."""
    schema = "event_id long, event_type string, user_id long, value double"
    b0 = [(i, "m", i, 10.0) for i in range(1, 5)]
    b1 = [(100, "m", 99, 40.0)]
    src = tmp_path / "hhi_restart_src"
    ckpt = str(tmp_path / "ckpt_hhi_restart")
    out = str(tmp_path / "hhi_restart_out")

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            jobs.hhi_stream_tws(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.read.parquet(out).collect()
        return max(
            (
                (r.total_cents, r.n_sellers, r.hhi_millionths,
                 r.top_share_millionths)
                for r in rows
            ),
            default=None,
        )

    _write_single_file(spark.createDataFrame(b0, schema), src, "b0.parquet")
    first = drain()
    assert first == (4000, 4, 250000, 250000)
    time.sleep(1.1)
    _write_single_file(spark.createDataFrame(b1, schema), src, "b1.parquet")
    cumulative = drain()
    assert cumulative == (8000, 5, 312500, 500000)


def test_hhi_stream_fold_refusals():
    """Domain guards: non-positive/NaN cents, a seller ledger past
    max_sellers, and a per-seller sum past the 2^62 envelope all raise
    CLEAR errors."""
    for bad in (float("nan"), 0, -100):
        with pytest.raises(ValueError, match="positive domain"):
            jobs._hhi_stream_fold(([], []), [(1, bad)])
    with pytest.raises(ValueError, match="max_sellers"):
        jobs._hhi_stream_fold(
            ([], []), [(i, 1) for i in range(jobs._HHIM_MAX_SELLERS + 1)]
        )
    with pytest.raises(ValueError, match="envelope"):
        jobs._hhi_stream_fold(([1], [1 << 62]), [(1, 1)])


def test_hhi_staged_drops_null_and_nonpositive(spark):
    """The staging contract the fold guard relies on: NULL user, NULL
    value, non-positive value, and a value scaling to 0 cents are all
    dropped before the shuffle."""
    ev = spark.createDataFrame(
        [
            (1, "click", 7, 1.23),
            (2, "click", None, 5.0),
            (3, "click", 7, None),
            (4, "click", 7, -5.0),
            (5, "click", 7, 0.001),
        ],
        "event_id long, event_type string, user_id long, value double",
    )
    got = jobs._hhi_staged(ev).collect()
    assert [(r["key"], r["s"], r["c"]) for r in got] == [("click", 7, 123)]


def test_hhi_stream_fold_commutes_hypothesis():
    """Hypothesis pin: ANY permutation and ANY chunking of any
    (seller, cents) sequence folds to the same ledger and emission —
    the commutativity law (ledger entries sum) that makes op
    twenty-seven the SIXTH order-free op."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=8),
                st.integers(min_value=1, max_value=10**9),
            ),
            min_size=1,
            max_size=60,
        ),
        st.randoms(),
    )
    def law(rows, rnd):
        base_state, base_out = jobs._hhi_stream_fold(([], []), rows)
        base_ledger = dict(zip(*base_state))
        perm = list(rows)
        rnd.shuffle(perm)
        cuts = sorted(
            rnd.sample(
                range(len(perm)), rnd.randint(0, min(3, len(perm) - 1))
            )
            or []
        )
        state = ([], [])
        prev = 0
        out = None
        for cut in cuts + [len(perm)]:
            chunk = perm[prev:cut]
            prev = cut
            if chunk:
                state, out = jobs._hhi_stream_fold(state, chunk)
        assert dict(zip(*state)) == base_ledger and out == base_out

    law()
