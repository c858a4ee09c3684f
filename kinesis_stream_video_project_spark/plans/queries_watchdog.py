"""Reference-shaped queries: the watchdog domain re-expressed in Spark.

Each query is the batch, oracle-checkable twin of a behavior in
/root/reference (file:line cited per query). SURVEY.md §2A/§2B ids noted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.numeric import r4
from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.config import (
    ESCALATION_LADDER,
    MAX_FAILED_CNT,
    METRIC_WINDOW_SECONDS,
)
from kinesis_stream_video_project_spark.functions.timeutil import (
    epoch_micros,
    epoch_seconds,
    iso8601,
    truncate_double_to_long,
)
from kinesis_stream_video_project_spark.operators.asof import asof_join
from kinesis_stream_video_project_spark.operators.runs import consecutive_runs
from kinesis_stream_video_project_spark.plans.oracle_views import with_views
from kinesis_stream_video_project_spark.plans.registry import register


@register(
    "stream_health_60s",
    tags=("O-18", "O-08", "O-04", "F3"),
    oracle=with_views(
        f"""
SELECT CAST((epoch_us(ts) // {METRIC_WINDOW_SECONDS * 1_000_000}) * {METRIC_WINDOW_SECONDS} AS BIGINT)
         AS window_start,
       stream_name,
       (floor((SUM(value)) * 10000.0 + 0.5) / 10000.0)                     AS put_media_sum,
       COUNT(*)                                 AS n_events,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
       SUM(value) > 0                           AS healthy
FROM metric_datapoints
GROUP BY 1, 2
""",
        "metric_datapoints",
    ),
)
def stream_health_60s(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP — 60 s tumbling-window health aggregation per stream.

    Batch twin of the reference's one true aggregation: CloudWatch Sum of
    PutMedia.Success over a 60 s period per StreamName
    (putmedia_check.sh:15,26-34) plus the health predicate sum > 0
    (restart.sh:57). Uses the real ``F.window`` tumbling-window operator;
    the partial (map-side) aggregation Catalyst plans here is exactly the
    100 TB-scale strategy.
    """
    m = io.metric_datapoints(spark, sf_dir)
    return (
        m.groupBy(
            F.window("ts", f"{METRIC_WINDOW_SECONDS} seconds").alias("w"),
            "stream_name",
        )
        .agg(
            F.sum("value").alias("_sum"),
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        )
        .select(
            epoch_seconds(F.col("w.start")).alias("window_start"),
            "stream_name",
            r4("_sum").alias("put_media_sum"),
            "n_events",
            "n_errors",
            (F.col("_sum") > 0).alias("healthy"),
        )
    )


@register(
    "catalog_filter_project",
    tags=("S1", "F1", "P1", "O-04", "O-05"),
    oracle=with_views(
        "SELECT stream_name, device_name FROM stream_catalog WHERE status = 'ACTIVE'",
        "stream_catalog",
    ),
)
def catalog_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog scan + filter + project: the `list-streams | jq select/project`
    chain (putmedia_check.sh:6; check_wf.sh:3) — filter on an attribute,
    project the stream name. Unlike the reference (which filters client-side
    after fetching the full payload), the predicate is pushed into the scan."""
    return (
        io.stream_catalog(spark, sf_dir)
        .filter(F.col("status") == "ACTIVE")
        .select("stream_name", "device_name")
    )


@register(
    "point_lookup_status",
    tags=("S2", "F2", "O-04"),
    oracle=with_views(
        """
SELECT stream_name, status, status = 'ACTIVE' AS is_active
FROM stream_catalog WHERE stream_name = 'stream-1'
""",
        "stream_catalog",
    ),
)
def point_lookup_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup of one stream's status + the ACTIVE predicate
    (`describe-stream --query 'StreamInfo.Status'`, check_wf.sh:8,13)."""
    return (
        io.stream_catalog(spark, sf_dir)
        .filter(F.col("stream_name") == "stream-1")
        .select(
            "stream_name",
            "status",
            (F.col("status") == "ACTIVE").alias("is_active"),
        )
    )


@register(
    "watchdog_null_guard",
    tags=("F5", "C1", "O-04", "O-11"),
    oracle=with_views(
        """
SELECT c.stream_name,
       (floor((COALESCE(s._s, 0.0)) * 10000.0 + 0.5) / 10000.0) AS put_media_sum,
       CAST(trunc(COALESCE(s._s, 0.0)) AS BIGINT) > 0 AS is_connected
FROM stream_catalog c
LEFT JOIN (
    SELECT stream_name, SUM(value) AS _s
    FROM metric_datapoints WHERE event_type = 'purchase'
    GROUP BY stream_name
) s USING (stream_name)
""",
        "stream_catalog",
        "metric_datapoints",
    ),
)
def watchdog_null_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-sentinel handling: CloudWatch returns *no datapoint* (null) for an
    idle stream; the reference maps null→disconnected (restart.sh:52-63,
    putmedia_check2.sh:48-53). Left join catalog→metric sums, coalesce to 0,
    then the bash cast-truncate + `-gt 0` compare (restart.sh:56-57)."""
    cat = io.stream_catalog(spark, sf_dir)
    sums = (
        io.metric_datapoints(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .groupBy("stream_name")
        .agg(F.sum("value").alias("_s"))
    )
    joined = cat.join(sums, "stream_name", "left")
    guarded = F.coalesce(F.col("_s"), F.lit(0.0))
    return joined.select(
        "stream_name",
        r4(guarded).alias("put_media_sum"),
        (truncate_double_to_long(guarded) > 0).alias("is_connected"),
    )


@register(
    "iso8601_format",
    tags=("T1", "T3", "O-24"),
    oracle="""
SELECT event_id,
       strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS ts_iso,
       CAST(epoch_us(ts) // 1000000 AS BIGINT) AS ts_epoch
FROM events
""",
)
def iso8601_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch→ISO-8601 UTC formatting (`date -u +"%Y-%m-%dT%H:%M:%SZ"`,
    putmedia_check.sh:21-22) plus epoch extraction (T1, restart.sh:24)."""
    e = io.load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        iso8601(F.col("ts")).alias("ts_iso"),
        epoch_seconds(F.col("ts")).alias("ts_epoch"),
    )


@register(
    "cast_truncate",
    tags=("C1", "O-25"),
    oracle="""
SELECT c_custkey, c_acctbal,
       CAST(trunc(c_acctbal) AS BIGINT) AS acctbal_trunc
FROM customer
""",
)
def cast_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double→long truncation toward zero — the bash `${result%.*}` idiom
    (restart.sh:56). Exercised on signed values (acctbal can be negative)."""
    c = io.load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_acctbal",
        truncate_double_to_long(F.col("c_acctbal")).alias("acctbal_trunc"),
    )


# Shared WITH-prefix for the gaps-and-islands oracles: probe_log (derived
# view, mirrors io.probe_log) + run detection via the two-row_number trick —
# the same plan shape operators/runs.py::consecutive_runs builds in Spark.
_RUNS_WITH = """
WITH probe_log AS (
  SELECT user_id AS device_id, ts, event_id,
         event_type <> 'error' AS ok, value
  FROM events
),
numbered AS (
  SELECT device_id, ts, event_id, ok,
         row_number() OVER (PARTITION BY device_id ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY device_id, ok ORDER BY ts, event_id) AS rnf
  FROM probe_log
),
runs AS (
  SELECT device_id,
         COUNT(*) AS run_len,
         MIN(epoch_us(ts)) AS run_start_us,
         MAX(epoch_us(ts)) AS run_end_us
  FROM numbered WHERE NOT ok
  GROUP BY device_id, rn - rnf
)
"""


@register(
    "consecutive_failures",
    tags=("O-17", "ST1", "O-16"),
    oracle=_RUNS_WITH
    + f"""
SELECT device_id, run_len, run_start_us, run_end_us
FROM runs WHERE run_len >= {MAX_FAILED_CNT}
""",
)
def consecutive_failures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands batch twin of the consecutive-failure counter
    ``kvs_failed_cnt`` tripping at ``max_failed_cnt=3``
    (restart.sh:15-16,86-101): maximal runs of failed probes of length >= 3
    per device."""
    probes = io.probe_log(spark, sf_dir)
    return consecutive_runs(
        probes,
        key="device_id",
        order=["ts", "event_id"],
        flag=~F.col("ok"),
        min_len=MAX_FAILED_CNT,
    ).select("device_id", "run_len", "run_start_us", "run_end_us")


_ESCALATION_CASE = "CASE LEAST(run_len - {thr}, {top}) ".format(
    thr=MAX_FAILED_CNT, top=len(ESCALATION_LADDER) - 1
) + " ".join(
    f"WHEN {i} THEN '{a}'" for i, a in enumerate(ESCALATION_LADDER)
) + " END"


@register(
    "escalation_actions",
    tags=("ST3", "O-34", "K1"),
    oracle=_RUNS_WITH
    + f"""
SELECT device_id,
       strftime(make_timestamp(run_start_us), '%Y-%m-%dT%H:%M:%SZ') AS alert_iso,
       run_len,
       {_ESCALATION_CASE} AS action
FROM runs
WHERE run_len >= {MAX_FAILED_CNT}
""",
)
def escalation_actions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the escalation ladder (restart.sh:104-156): the deeper a
    failure run, the further remediation escalates (email → NetworkManager →
    gateway restart → Wi-Fi → USB power-cycle → reboot). Decisions are data
    (an actions table); executing them is sink territory (K3).

    This is the pure counter ladder (SQL-expressible, oracle-checked). The
    reference's loop_time=300 s cooldown suppression is inherently
    sequential — it lives in the state-machine form
    (``watchdog_state_machine`` + both streaming forms, rows-only for the
    driver, property-tested in test_watchdog_properties.py)."""
    runs = consecutive_failures(spark, sf_dir)
    ladder = F.array(*[F.lit(a) for a in ESCALATION_LADDER])
    step = F.least(
        F.col("run_len") - F.lit(MAX_FAILED_CNT), F.lit(len(ESCALATION_LADDER) - 1)
    )
    return runs.select(
        "device_id",
        iso8601(F.timestamp_micros(F.col("run_start_us"))).alias("alert_iso"),
        "run_len",
        F.element_at(ladder, (step + 1).cast("int")).alias("action"),
    )


@register(
    "asof_probe_metric",
    tags=("O-14",),
    oracle="""
SELECT l.event_id, l.user_id,
       epoch_us(l.ts) AS ts_us,
       r.value AS asof_value
FROM (SELECT * FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def asof_probe_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (O-14): for each failed probe, the most recent preceding
    metric observation on the same key — the reference's probe-to-metric-window
    correlation (putmedia_check.sh:18-22) generalized to a point-in-time join.
    Implemented as union + carry-forward (one shuffle; see operators/asof.py),
    checked against DuckDB's native ASOF JOIN."""
    e = io.load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    right = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value")
    )
    joined = asof_join(left, right, key="user_id", right_payload=["value"])
    return joined.select(
        "event_id",
        "user_id",
        epoch_micros(F.col("ts")).alias("ts_us"),
        F.col("asof_value"),
    )


@register(
    "asof_forward_metric",
    tags=("O-14",),
    oracle="""
SELECT l.event_id, l.user_id,
       epoch_us(l.ts) AS ts_us,
       r.value AS asof_value
FROM (SELECT * FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts <= r.ts
""",
)
def asof_forward_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (O-14, direction='forward'): for each failed
    probe, the EARLIEST subsequent metric observation on the same key — the
    "next reading after the incident" correlation (recovery analysis). Same
    one-shuffle union-and-carry plan as the backward form, walked in
    descending event time; checked against DuckDB's native forward ASOF
    (l.ts <= r.ts)."""
    e = io.load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    right = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value")
    )
    joined = asof_join(
        left, right, key="user_id", right_payload=["value"], direction="forward"
    )
    return joined.select(
        "event_id",
        "user_id",
        epoch_micros(F.col("ts")).alias("ts_us"),
        F.col("asof_value"),
    )


@register(
    "gap_filled_windows",
    tags=("O-18", "O-26", "F5"),
    oracle="""
WITH b AS (
    SELECT date_trunc('hour', MIN(ts)) AS t0, date_trunc('hour', MAX(ts)) AS t1
    FROM events
),
cal AS (SELECT UNNEST(generate_series(t0, t1, INTERVAL 1 HOUR)) AS ws FROM b),
streams AS (SELECT DISTINCT user_id FROM events WHERE user_id < 8),
obs AS (
    SELECT user_id, date_trunc('hour', ts) AS ws, SUM(value) AS s
    FROM events WHERE user_id < 8
    GROUP BY user_id, date_trunc('hour', ts)
)
SELECT st.user_id,
       CAST(epoch(c.ws) AS BIGINT) AS window_start_s,
       (floor((COALESCE(o.s, 0)) * 10000.0 + 0.5) / 10000.0) AS hour_sum,
       (COALESCE(o.s, 0) > 0) AS active
FROM streams st CROSS JOIN cal c
LEFT JOIN obs o ON o.user_id = st.user_id AND o.ws = c.ws
""",
)
def gap_filled_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-filling on the time axis (SURVEY §7 watch-list 4): an
    idle stream produces NO aggregate row, but the reference treats "no
    datapoint" as unhealthy (putmedia_check2.sh:48-53) — so absent windows
    must exist as rows. Generate the full hourly calendar (sequence +
    explode), cross join the (small) stream dim, left-join observed sums,
    coalesce null→0. At scale the calendar is dim-sized (hours x streams),
    broadcast against the fact-side aggregate."""
    all_metrics = io.metric_datapoints(spark, sf_dir).withColumn(
        "user_id", F.col("stream_name").substr(F.lit(8), F.lit(99)).cast("long")
    )
    e = all_metrics.filter(F.col("user_id") < 8)
    # Calendar spans the FULL observation period (all streams), matching the
    # oracle: an early/late event on any stream defines the monitoring range.
    bounds = all_metrics.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    cal = bounds.select(
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("ws")
    )
    streams = e.select("user_id").distinct()
    obs = (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("ws"))
        .agg(F.sum("value").alias("s"))
    )
    filled = (
        streams.crossJoin(cal)
        .join(obs, ["user_id", "ws"], "left")
        .select(
            "user_id",
            F.unix_timestamp("ws").alias("window_start_s"),
            r4(F.coalesce(F.col("s"), F.lit(0.0))).alias("hour_sum"),
            (F.coalesce(F.col("s"), F.lit(0.0)) > 0).alias("active"),
        )
    )
    return filled


@register(
    "asof_tolerance_metric",
    tags=("O-14",),
    oracle="""
SELECT l.event_id, l.user_id,
       epoch_us(l.ts) AS ts_us,
       CASE WHEN epoch_us(l.ts) - epoch_us(r.ts) <= 3600000000
            THEN r.value END AS asof_value
FROM (SELECT * FROM events WHERE event_type = 'error') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
""",
)
def asof_tolerance_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a STALENESS BOUND (O-14,
    ``tolerance_us`` — pandas merge_asof's tolerance): the preceding
    metric observation vouches for a probe only if it is at most one hour
    old; staler matches null out. This is the semantically-honest form of
    the reference's correlation — putmedia_check.sh:18-22 only ever looks
    60 s back, precisely because an old reading says nothing about now.
    Same one-shuffle union-and-carry plan (the matched right ts rides the
    carried struct; no extra join); the oracle replays the bound as a
    CASE over DuckDB's native ASOF match."""
    e = io.load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    right = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value")
    )
    joined = asof_join(
        left,
        right,
        key="user_id",
        right_payload=["value"],
        tolerance_us=3_600_000_000,
    )
    return joined.select(
        "event_id",
        "user_id",
        epoch_micros(F.col("ts")).alias("ts_us"),
        F.col("asof_value"),
    )


@register(
    "asof_nearest_metric",
    tags=("O-14",),
    oracle="""
WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
     r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
b AS (
  SELECT l.event_id, l.user_id, l.ts, r.ts AS bts, r.value AS bval
  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
),
f AS (
  SELECT l.event_id, r.ts AS fts, r.value AS fval
  FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
)
SELECT b.event_id, b.user_id, epoch_us(b.ts) AS ts_us,
       CASE WHEN f.fts IS NULL THEN b.bval
            WHEN b.bts IS NULL THEN f.fval
            WHEN epoch_us(b.ts) - epoch_us(b.bts)
                 <= epoch_us(f.fts) - epoch_us(b.ts) THEN b.bval
            ELSE f.fval END AS asof_value
FROM b JOIN f USING (event_id)
""",
)
def asof_nearest_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (O-14, direction='nearest' — the third
    and last pandas merge_asof direction): each failed probe takes
    whichever metric observation is CLOSER in event time, before or after,
    ties to the preceding one. Sensor correlation wants this when a probe
    can fire just before its cause's reading lands.

    Plan: both directional walks run over the SAME user_id exchange (two
    Window sorts, one shuffle — asof_join builds them from one unioned
    frame), then a per-row distance pick; the oracle replays the pick as a
    CASE over DuckDB's two native ASOF joins."""
    e = io.load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id"
    )
    right = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value")
    )
    joined = asof_join(
        left, right, key="user_id", right_payload=["value"], direction="nearest"
    )
    return joined.select(
        "event_id",
        "user_id",
        epoch_micros(F.col("ts")).alias("ts_us"),
        F.col("asof_value"),
    )
