"""Streaming sources (O-03).

Production source: AWS Kinesis (the reference's domain — its KVS streams
feed CloudWatch metrics; BASELINE.json mandates "Structured Streaming +
Kinesis source"). The Kinesis DSv2 connector
(`spark-sql-kinesis` / `format("aws-kinesis")`) is not installed in this
container, so :func:`kinesis_stream` documents + validates the production
config and raises a clear error if the connector is absent; tests use the
file and rate sources, which exercise identical downstream plans (the source
exchange is the only difference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Schema of the events stream (matches the events fixture after ts
# normalization — io.load_table).
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", StringType()),  # placeholder; parquet variant overrides
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def file_event_stream(spark: SparkSession, directory: str, schema=None) -> DataFrame:
    """File-based micro-batch source over parquet event files.

    At scale this is the replayable landing zone (S3/HDFS) the Kinesis
    firehose writes into; `maxFilesPerTrigger` bounds batch size.
    """
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # Infer from existing files (requires at least one file present).
        static = spark.read.parquet(directory)
        reader = reader.schema(static.schema)
    return reader.parquet(directory)


def rate_probe_stream(
    spark: SparkSession, rows_per_second: int = 10, n_devices: int = 4
) -> DataFrame:
    """Synthetic probe stream from the built-in rate source: one health probe
    per tick per device, ~1 failure in 7 — the watchdog's input shape
    (restart.sh:86-95) for demos/tests without external infrastructure."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    return rate.select(
        (F.col("value") % n_devices).alias("device_id"),
        F.col("timestamp").alias("ts"),
        F.col("value").alias("event_id"),
        ((F.col("value") % 7) != 0).alias("ok"),
        (F.col("value") % 100).cast("double").alias("value"),
    )


KINESIS_DEFAULTS = {
    # Connector option names per the open-source spark-sql-kinesis-connector.
    "streamName": None,  # required: the Kinesis data stream
    "endpointUrl": "https://kinesis.{region}.amazonaws.com",
    "startingposition": "LATEST",
    "awsUseInstanceProfile": "true",
}


def kinesis_stream(
    spark: SparkSession, stream_name: str, region: str = "us-east-1"
) -> DataFrame:
    """Production Kinesis source (O-03). Requires the Kinesis DSv2 connector
    jar on the cluster (--packages spark-sql-kinesis-connector); raises a
    clear error locally where the connector is absent."""
    try:
        reader = (
            spark.readStream.format("aws-kinesis")
            .option("streamName", stream_name)
            .option("endpointUrl", f"https://kinesis.{region}.amazonaws.com")
            .option("startingposition", "LATEST")
        )
        raw = reader.load()
    except Exception as exc:  # pragma: no cover - connector not in container
        raise RuntimeError(
            "Kinesis connector not available in this environment; add the "
            "spark-sql-kinesis-connector package on the cluster. Use "
            "file_event_stream/rate_probe_stream locally."
        ) from exc
    # Kinesis delivers opaque bytes; decode JSON payloads into the event shape.
    return raw.select(
        F.from_json(
            F.col("data").cast("string"),
            "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
            "event_type STRING, value DOUBLE, props STRING",
        ).alias("e")
    ).select("e.*")
