"""Inline observe() metrics: counters ride the materializing job itself
(no second pass), batch and streaming."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io, observability
from kinesis_stream_video_project_spark.streaming import sources


def test_observed_batch_counters_match_direct_queries(spark, sf_dir):
    events = io.load_table(spark, sf_dir, "events")
    df, obs = observability.observed(events)
    df.write.format("noop").mode("overwrite").save()  # one job, no collect
    got = obs.get
    assert got["n_rows"] == events.count()
    assert got["n_errors"] == events.filter("event_type = 'error'").count()
    assert got["n_null_value"] == events.filter("value IS NULL").count()
    assert got["max_ts_us"] == events.agg(
        F.max(F.unix_micros("ts"))
    ).first()[0]


def test_observed_stream_emits_per_batch_metrics(spark, sf_dir, tmp_path):
    events = io.load_table(spark, sf_dir, "events")
    src = tmp_path / "obs_src"
    events.coalesce(1).write.mode("overwrite").parquet(str(src))
    stream = sources.file_event_stream(spark, str(src))
    q = (
        observability.observed_stream(stream)
        .writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_obs"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # availableNow drains everything; the last progress with rows carries
    # the observed counters for its micro-batch.
    metrics = None
    for p in q.recentProgress:
        om = (p.observedMetrics or {}).get(observability.EVENT_QUALITY)
        if om is not None and om["n_rows"]:
            metrics = om
    assert metrics is not None, [p.observedMetrics for p in q.recentProgress]
    assert metrics["n_rows"] == events.count()
    assert metrics["n_errors"] == events.filter("event_type = 'error'").count()
