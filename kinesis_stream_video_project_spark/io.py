"""Table IO: parquet loaders + the reference-domain derived views.

The fixture layout is ``{sf_dir}/{table}.parquet`` (TESTDATA.md). The scan is
a plain ``spark.read.parquet`` so Catalyst keeps predicate pushdown, column
pruning and (on partitioned prod layouts) partition pruning; never collect or
pre-materialize here.

Scale note: at 100 TB the ``events`` table would be written date-partitioned
(``.../events/date=YYYY-MM-DD/*.parquet``); the loaders take any directory
glob Spark accepts, so the same code serves both layouts.

Derived views (FIXTURES.md "reference-domain derived views") re-create the
reference's domain model from the fixtures:

* ``stream_catalog``  — models the KVS `list-streams` registry
  (StreamInfoList[], putmedia_check.sh:6) derived from ``supplier``.
* ``metric_datapoints`` — models CloudWatch PutMedia.Success datapoints
  (putmedia_check.sh:26-34) projected from ``events``.
* ``probe_log`` — models the watchdog probe observations
  (restart.sh:86-95) projected from ``events``.

Each has an exactly-equivalent DuckDB CTE in ``plans/oracle_views.py`` so any
query over them stays oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables small enough to broadcast in every realistic deployment (region/nation
# are fixed-size; supplier/part grow sub-linearly in the fixture generator).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table; normalizes the events ns-timestamp column.

    ``events.ts`` is parquet TIMESTAMP(NANOS); with
    ``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as a long of
    nanoseconds. We truncate to µs (integer division — same truncation DuckDB's
    parquet reader applies) and expose a proper ``TimestampType`` column, so
    downstream logic and the DuckDB oracle see identical instants.
    """
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) fixture generation read under nanosAsLong.
            # Integer division, NOT `/1000` + cast: ns epochs exceed 2^53, so
            # a double roundtrip corrupts the low microsecond digit.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # TIMESTAMP(MICROS, isAdjustedToUTC=false) fixture generation:
            # Spark reads NTZ; DuckDB reads the same wall-clock digits as its
            # naive TIMESTAMP. Sessions here run with timeZone=UTC, so the
            # NTZ→instant cast is the identity on those digits and both
            # engines agree on epoch_us.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def stream_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KVS stream registry twin (putmedia_check.sh:6; check_wf.sh:3).

    Derived deterministically from ``supplier``: one video stream per
    supplier, device = the supplier's nation, status from the account-balance
    sign. Mirrors plans/oracle_views.py::STREAM_CATALOG_SQL exactly.
    """
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        F.concat(F.lit("stream-"), F.col("s_suppkey").cast("string")).alias("stream_name"),
        F.concat(F.lit("device-"), F.col("s_nationkey").cast("string")).alias("device_name"),
        F.when(F.col("s_acctbal") < 0, F.lit("CREATING"))
        .otherwise(F.lit("ACTIVE"))
        .alias("status"),
        F.col("s_suppkey").alias("stream_key"),
    )


def metric_datapoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CloudWatch datapoint twin (putmedia_check.sh:26-34): one metric value
    per event, keyed by stream name derived from the user id."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.concat(F.lit("stream-"), F.col("user_id").cast("string")).alias("stream_name"),
        F.col("ts"),
        F.col("value"),
        F.col("event_type"),
    )


def probe_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watchdog probe-log twin (restart.sh:86-95): ok = not an error event."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("user_id").alias("device_id"),
        F.col("ts"),
        F.col("event_id"),
        (F.col("event_type") != F.lit("error")).alias("ok"),
        F.col("value"),
    )


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table + derived view as temp views for SQL use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    stream_catalog(spark, sf_dir).createOrReplaceTempView("stream_catalog")
    metric_datapoints(spark, sf_dir).createOrReplaceTempView("metric_datapoints")
    probe_log(spark, sf_dir).createOrReplaceTempView("probe_log")
