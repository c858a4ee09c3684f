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


@register(
    "watchdog_state_machine",
    tags=("O-22", "ST1-ST4"),
    oracle="""
WITH RECURSIVE probes AS (
  SELECT user_id AS device_id,
         epoch_us(ts) AS ts_us,
         (event_type <> 'error') AS ok,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
fold AS (
  SELECT device_id, CAST(0 AS BIGINT) AS rn,
         CAST(0 AS BIGINT) AS fail_cnt, CAST(0 AS BIGINT) AS esc,
         CAST(-1 AS BIGINT) AS last_us, CAST(NULL AS VARCHAR) AS action,
         CAST(NULL AS BIGINT) AS action_ts_us
  FROM (SELECT DISTINCT user_id AS device_id FROM events)
  UNION ALL
  SELECT p.device_id, p.rn,
         CASE
           WHEN f.last_us >= 0 AND p.ts_us < f.last_us + 300000000 THEN f.fail_cnt
           WHEN p.ok THEN 0
           WHEN f.fail_cnt + 1 >= 3 THEN 0
           ELSE f.fail_cnt + 1
         END AS fail_cnt,
         CASE
           WHEN f.last_us >= 0 AND p.ts_us < f.last_us + 300000000 THEN f.esc
           WHEN p.ok THEN 0
           WHEN f.fail_cnt + 1 >= 3 THEN f.esc + 1
           ELSE f.esc
         END AS esc,
         CASE
           WHEN f.last_us >= 0 AND p.ts_us < f.last_us + 300000000 THEN f.last_us
           WHEN NOT p.ok AND f.fail_cnt + 1 >= 3 THEN p.ts_us
           ELSE f.last_us
         END AS last_us,
         CASE
           WHEN f.last_us >= 0 AND p.ts_us < f.last_us + 300000000 THEN NULL
           WHEN NOT p.ok AND f.fail_cnt + 1 >= 3 THEN
             (['alert_email','restart_network_mgr','restart_gateway',
               'reconnect_wifi','usb_power_cycle','reboot'])[least(f.esc, 5) + 1]
           ELSE NULL
         END AS action,
         CASE
           WHEN f.last_us >= 0 AND p.ts_us < f.last_us + 300000000 THEN NULL
           WHEN NOT p.ok AND f.fail_cnt + 1 >= 3 THEN p.ts_us
           ELSE NULL
         END AS action_ts_us
  FROM fold f
  JOIN probes p ON p.device_id = f.device_id AND p.rn = f.rn + 1
)
SELECT device_id, action_ts_us, action
FROM fold WHERE action IS NOT NULL
""",
)
def watchdog_state_machine(
    spark: SparkSession, sf_dir: str, n_shards: int | None = None
) -> DataFrame:
    """O-22 batch form: replay the escalation state machine per device over
    the probe log via applyInPandas (grouped Arrow batches). The transition
    function is shared verbatim with the streaming applyInPandasWithState
    form (operators/watchdog.py) — one spec, two execution modes.

    Hash-checked since r4: the oracle is a THIRD independent implementation
    of the spec — a DuckDB recursive CTE stepping the per-device fold one
    probe-rank at a time, carrying (fail_cnt, escalation level, cooldown
    last-action timestamp) and emitting the same escalation-ladder action
    names; every transition is integer arithmetic on epoch-µs, so the
    engines agree exactly. pytest additionally cross-checks against the
    pure-Python fold and the oracle-checked ``escalation_actions``
    gaps-and-islands twin.

    Sharded grouping (r4 perf): grouping by ``device_id % 64`` instead of
    raw device_id cuts the Arrow/pandas invocation count from one per
    device (1500 at sf0.1 — per-call overhead dominated the 5.5 s bench
    row) to one per shard; the fold loops the shard's devices in-process
    on the ordered frame. Fold semantics are untouched — the state machine
    still replays strictly per device in (ts, event_id) order. At 100 TB
    the shard count is the parallelism knob, exactly like seq_pack_docs'
    md5 shards — ``n_shards`` defaults to 2×
    ``sparkContext.defaultParallelism`` so per-task memory (one shard's
    probe slice as a pandas frame) shrinks as the cluster grows, and a
    deployment whose probe log outgrows that can raise it explicitly."""
    if n_shards is None:
        n_shards = 2 * spark.sparkContext.defaultParallelism
    probes = io.probe_log(spark, sf_dir)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["device_id", "ts", "event_id"])
        ts_us = pdf["ts"].astype("int64").to_numpy() // 1000
        devs = pdf["device_id"].to_numpy()
        oks = pdf["ok"].to_numpy()
        out_dev: list[int] = []
        out_ts: list[int] = []
        out_act: list[str] = []
        start = 0
        n = len(pdf)
        for i in range(1, n + 1):
            if i == n or devs[i] != devs[start]:
                actions, _ = replay_device(
                    list(zip(ts_us[start:i].tolist(), oks[start:i].tolist()))
                )
                out_dev.extend([int(devs[start])] * len(actions))
                out_ts.extend(a[0] for a in actions)
                out_act.extend(a[1] for a in actions)
                start = i
        return pd.DataFrame(
            {"device_id": out_dev, "action_ts_us": out_ts, "action": out_act}
        )

    return (
        probes.select(
            "device_id",
            "ts",
            "event_id",
            "ok",
            (F.col("device_id") % n_shards).alias("_shard"),
        )
        .groupBy("_shard")
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
