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
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
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

# Record schema the open-source spark-sql-kinesis-connector delivers: the
# payload is opaque BYTES plus per-record Kinesis metadata (shard, sequence
# number, arrival time as a TIMESTAMP — matching the connector's types, so
# code written against fixture replays transfers to the real stream). The
# contract tests replay THIS shape from fixtures, so everything below the
# connector boundary is exercised without AWS.
KINESIS_RAW_SCHEMA = StructType(
    [
        StructField("data", BinaryType()),
        StructField("streamName", StringType()),
        StructField("partitionKey", StringType()),
        StructField("sequenceNumber", StringType()),
        StructField("approximateArrivalTimestamp", TimestampType()),
        StructField("shardId", StringType()),
    ]
)

_STARTING_POSITIONS = ("LATEST", "TRIM_HORIZON", "AT_TIMESTAMP")

# The JSON event payload shape inside `data` (what the fleet's publisher
# emits per probe; mirrors the events fixture columns).
KINESIS_EVENT_PAYLOAD_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


def kinesis_reader_options(
    stream_name: str,
    region: str = "us-east-1",
    starting_position: str = "LATEST",
    at_timestamp_ms: int | None = None,
) -> dict[str, str]:
    """Validated option map for the Kinesis DSv2 reader.

    Pure function — the testable half of the connector contract: Kinesis
    stream-name charset/length rules (the same rules `aws kinesisvideo
    list-streams` enforces on StreamName, check_wf.sh:3), region shape, and
    the shard-iterator type (`startingposition`), which must be one of
    LATEST / TRIM_HORIZON / AT_TIMESTAMP — AT_TIMESTAMP additionally
    requires the epoch-ms timestamp the iterator starts at.
    """
    import re

    if not stream_name or not re.fullmatch(r"[a-zA-Z0-9_.-]{1,128}", stream_name):
        raise ValueError(
            f"invalid Kinesis stream name {stream_name!r}: 1-128 chars of "
            "[a-zA-Z0-9_.-]"
        )
    if not re.fullmatch(r"[a-z]{2}(-[a-z]+)+-\d", region):
        raise ValueError(f"invalid AWS region {region!r}")
    pos = starting_position.upper()
    if pos not in _STARTING_POSITIONS:
        raise ValueError(
            f"startingposition must be one of {_STARTING_POSITIONS}, got "
            f"{starting_position!r}"
        )
    opts = {
        "streamName": stream_name,
        "endpointUrl": f"https://kinesis.{region}.amazonaws.com",
        "startingposition": pos,
        "awsUseInstanceProfile": "true",
    }
    if pos == "AT_TIMESTAMP":
        if at_timestamp_ms is None:
            raise ValueError("AT_TIMESTAMP requires at_timestamp_ms")
        opts["startingtimestamp"] = str(at_timestamp_ms)
    elif at_timestamp_ms is not None:
        raise ValueError("at_timestamp_ms only valid with AT_TIMESTAMP")
    return opts


def decode_kinesis_records(raw: DataFrame) -> DataFrame:
    """Decode connector-shaped records (KINESIS_RAW_SCHEMA) into event rows.

    Works identically on a real connector stream, a fixture-replay file
    stream, or a batch DataFrame — it is pure column logic. Malformed JSON
    payloads decode to all-null structs; they are kept (null event_id) so a
    downstream quality gate can count them rather than losing them silently.
    """
    return raw.select(
        F.from_json(F.col("data").cast("string"), KINESIS_EVENT_PAYLOAD_DDL).alias(
            "e"
        ),
        F.col("streamName").alias("_stream"),
        F.col("shardId").alias("_shard"),
        F.col("sequenceNumber").alias("_seq"),
    ).select("e.*", "_stream", "_shard", "_seq")


def _is_kinesis_error(exc: Exception, code: str) -> bool:
    """Match a Kinesis API error by its AWS error code, covering both real
    botocore exceptions (generated classes named after the code, with the
    code also in ``response["Error"]["Code"]``) and test fakes that raise
    plain exceptions carrying the code in their class name."""
    if code in type(exc).__name__:
        return True
    response = getattr(exc, "response", None)
    return bool(response) and response.get("Error", {}).get("Code") == code


def _get_records_with_retry(
    client,
    iterator: str,
    limit: int,
    max_throttle_retries: int,
    sleep,
):
    """``get_records`` with exponential backoff on
    ``ProvisionedThroughputExceededException`` — Kinesis throttles reads at
    5 tx/s/shard and the documented client contract is retry-with-backoff,
    not failure (the reference's scripts get this for free from the AWS CLI's
    built-in retry mode). Re-raises after ``max_throttle_retries``
    consecutive throttles so a misconfigured hot shard surfaces instead of
    spinning forever; any other error propagates immediately."""
    delay = 0.1
    for attempt in range(max_throttle_retries + 1):
        try:
            return client.get_records(ShardIterator=iterator, Limit=limit)
        except Exception as exc:
            if (
                not _is_kinesis_error(
                    exc, "ProvisionedThroughputExceededException"
                )
                or attempt == max_throttle_retries
            ):
                raise
            sleep(delay)
            delay = min(delay * 2, 2.0)
    raise AssertionError("unreachable")  # pragma: no cover


def kinesis_snapshot_df(
    spark: SparkSession,
    client,
    stream_name: str,
    starting_position: str = "TRIM_HORIZON",
    max_polls_per_shard: int = 10,
    max_throttle_retries: int = 5,
    sleep=None,
) -> DataFrame:
    """Drain a Kinesis stream's current contents through a boto3 client into
    a batch DataFrame of connector-shaped records (KINESIS_RAW_SCHEMA).

    This is the DEV/TEST stand-in for the DSv2 connector — the standard
    Kinesis → landing-zone → file-source relay, shrunk to one poll: records
    land in the exact schema ``decode_kinesis_records`` consumes, so the
    pipeline downstream of this call is byte-for-byte the production
    pipeline. It pages each shard with get_records until the shard is
    drained (NextShardIterator exhausted or an empty page at the tip).

    Deliberately driver-side and bounded (``max_polls_per_shard`` pages of
    up to 10k records per shard): per-shard parallel fan-out is the
    connector's job; this exists so a LOCAL endpoint (moto's Kinesis API,
    tests/test_kinesis_contract.py) can feed the real decode path live.
    Raises ValueError for an invalid starting position, mirroring
    kinesis_reader_options' validation.

    Production failure modes handled (the two the real consumer API
    documents beyond resharding):

    * **Read throttling** — get_records is retried with exponential
      backoff on ProvisionedThroughputExceededException
      (``max_throttle_retries`` consecutive throttles before giving up;
      ``sleep`` is injectable for tests).
    * **Iterator expiry** — a shard iterator is only valid for 5 minutes;
      on ExpiredIteratorException the drain re-acquires its position
      EXACTLY-ONCE-wise via AFTER_SEQUENCE_NUMBER of the last record it
      ingested from that shard (or the original starting position if
      none yet) and continues — the documented recovery, losing nothing
      and re-reading nothing. The re-acquire poll does not count against
      ``max_polls_per_shard``."""
    import time as _time

    if sleep is None:
        sleep = _time.sleep
    if starting_position.upper() not in ("LATEST", "TRIM_HORIZON"):
        raise ValueError(
            "kinesis_snapshot_df supports LATEST/TRIM_HORIZON starting "
            f"positions, got {starting_position!r}"
        )
    rows = []
    # list_shards pages at 100 shards — a long-lived resharded stream
    # accumulates closed parents well past one page, and ListShards'
    # NextToken contract forbids resending StreamName with the token.
    shards = []
    resp = client.list_shards(StreamName=stream_name)
    shards.extend(resp["Shards"])
    while resp.get("NextToken"):
        resp = client.list_shards(NextToken=resp["NextToken"])
        shards.extend(resp["Shards"])
    for sh in shards:
        it = client.get_shard_iterator(
            StreamName=stream_name,
            ShardId=sh["ShardId"],
            ShardIteratorType=starting_position.upper(),
        )["ShardIterator"]
        last_seq: str | None = None
        polls = 0
        expiries = 0
        while polls < max_polls_per_shard:
            try:
                resp = _get_records_with_retry(
                    client, it, 10000, max_throttle_retries, sleep
                )
            except Exception as exc:
                if not _is_kinesis_error(exc, "ExpiredIteratorException"):
                    raise
                # An iterator that expires on EVERY poll means the position
                # itself is gone (e.g. aged past the retention window) —
                # surface it instead of re-acquiring forever.
                expiries += 1
                if expiries > max_polls_per_shard:
                    raise
                # Re-acquire the shard position: just after the last record
                # ingested, or the original starting position if none yet.
                if last_seq is not None:
                    it = client.get_shard_iterator(
                        StreamName=stream_name,
                        ShardId=sh["ShardId"],
                        ShardIteratorType="AFTER_SEQUENCE_NUMBER",
                        StartingSequenceNumber=last_seq,
                    )["ShardIterator"]
                else:
                    it = client.get_shard_iterator(
                        StreamName=stream_name,
                        ShardId=sh["ShardId"],
                        ShardIteratorType=starting_position.upper(),
                    )["ShardIterator"]
                continue
            polls += 1
            for r in resp["Records"]:
                rows.append(
                    (
                        bytes(r["Data"]),
                        stream_name,
                        r["PartitionKey"],
                        r["SequenceNumber"],
                        r["ApproximateArrivalTimestamp"],
                        sh["ShardId"],
                    )
                )
                last_seq = r["SequenceNumber"]
            it = resp.get("NextShardIterator")
            if not it or not resp["Records"]:
                break
    return spark.createDataFrame(rows, KINESIS_RAW_SCHEMA)


def kinesis_connector_available(spark: SparkSession) -> bool:
    """True when a DSv2 provider registering short name ``aws-kinesis`` is
    on the session's classpath (jar in $SPARK_HOME/jars or --packages).
    Uses the same ServiceLoader registry Spark's own format() lookup reads,
    so it cannot drift from what ``format("aws-kinesis")`` would resolve.
    Lets the live-endpoint test (tests/test_kinesis_contract.py) skip with
    a precise reason instead of failing on load()."""
    try:
        jvm = spark._jvm
        registry = jvm.java.lang.Class.forName(
            "org.apache.spark.sql.sources.DataSourceRegister"
        )
        it = jvm.java.util.ServiceLoader.load(registry).iterator()
        while it.hasNext():
            if it.next().shortName() == "aws-kinesis":
                return True
        return False
    except Exception:  # pragma: no cover - defensive: absent JVM registry
        return False


def kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str = "us-east-1",
    starting_position: str = "LATEST",
) -> DataFrame:
    """Production Kinesis source (O-03). Requires the Kinesis DSv2 connector
    jar on the cluster (--packages spark-sql-kinesis-connector); raises a
    clear error locally where the connector is absent. Config validation and
    payload decoding are the pure halves (`kinesis_reader_options`,
    `decode_kinesis_records`) exercised by the contract tests."""
    opts = kinesis_reader_options(
        stream_name, region=region, starting_position=starting_position
    )
    try:
        reader = spark.readStream.format("aws-kinesis")
        for k, v in opts.items():
            reader = reader.option(k, v)
        raw = reader.load()
    except Exception as exc:  # pragma: no cover - connector not in container
        raise RuntimeError(
            "Kinesis connector not available in this environment; add the "
            "spark-sql-kinesis-connector package on the cluster. Use "
            "file_event_stream/rate_probe_stream locally."
        ) from exc
    return decode_kinesis_records(raw)
