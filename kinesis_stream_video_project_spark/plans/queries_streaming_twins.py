"""Batch twins of the streaming-only operators (SURVEY.md §5.2.3).

The streaming forms live in ``streaming/`` and are exercised by pytest with
real micro-batch execution; these twins run the SAME logic over the events
table as batch queries so the driver can check them (rows-only where the
state machine is not SQL-expressible; the oracle-checkable counting core is
covered by ``consecutive_failures``/``escalation_actions``)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators.watchdog import replay_device
from kinesis_stream_video_project_spark.plans.registry import register

_ACTIONS_SCHEMA = (
    StructType()
    .add("device_id", "long")
    .add("action_ts_us", "long")
    .add("action", "string")
)


@register("watchdog_state_machine", tags=("O-22", "ST1-ST4"))  # rows-only: stateful
def watchdog_state_machine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-22 batch form: replay the escalation state machine per device over
    the probe log via applyInPandas (grouped Arrow batches). The transition
    function is shared verbatim with the streaming applyInPandasWithState
    form (operators/watchdog.py) — one spec, two execution modes.

    Rows-only for the driver; pytest cross-checks the emitted actions against
    a pure-Python fold and against the oracle-checked ``escalation_actions``
    gaps-and-islands twin."""
    probes = io.probe_log(spark, sf_dir)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        actions, _ = replay_device(list(zip(ts_us, pdf["ok"].tolist())))
        dev = pdf["device_id"].iloc[0]
        return pd.DataFrame(
            {
                "device_id": [dev] * len(actions),
                "action_ts_us": [a[0] for a in actions],
                "action": [a[1] for a in actions],
            }
        )

    return (
        probes.select("device_id", "ts", "event_id", "ok")
        .groupBy("device_id")
        .applyInPandas(run, _ACTIONS_SCHEMA)
    )


@register(
    "streaming_dedup_twin",
    tags=("O-21",),
    oracle="""
SELECT user_id, event_type, COUNT(*) AS n_kept
FROM (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY event_id ORDER BY ts) AS rn
  FROM events
)
WHERE rn = 1
GROUP BY user_id, event_type
""",
)
def streaming_dedup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of dropDuplicatesWithinWatermark on event_id (O-21): keep
    one row per event id, then summarize. (event_id is already unique in the
    fixture, making the dedup a verified no-op — the streaming pytest feeds
    actual duplicates.)"""
    e = io.load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("event_id").orderBy("ts")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
