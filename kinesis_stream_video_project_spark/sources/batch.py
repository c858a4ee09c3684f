"""Schema-explicit batch readers and scale-aware writers.

Design rules (all three exist because of the 100 TB mandate):

1. **Never infer schemas in production paths.** CSV/JSON inference triggers an
   extra full scan of the input; every reader here takes an explicit
   ``StructType`` (or reuses a canonical one from :data:`SCHEMAS`).
2. **Readers return lazy DataFrames** — filters and projections applied by the
   caller reach the file scan (``PushedFilters`` / ``ReadSchema`` in
   ``.explain``); nothing here collects.
3. **Writers control layout**, because layout is the dominant performance
   lever at scale: date-partitioned directories give partition pruning,
   bucketing gives shuffle-free joins/aggregations on the bucket key, and the
   compaction helper keeps file sizes near the
   ``spark.sql.files.maxPartitionBytes`` sweet spot (default 128 MiB) so a
   1000-executor scan neither drowns in tiny files nor starves on giant ones.

The reference's JSON "source" is a subprocess pipe of ``aws kinesisvideo
list-streams`` output into jq (putmedia_check.sh:6); :func:`read_json` with
:data:`SCHEMAS["stream_catalog_json"]` is its native twin — one scan, no
inference, pushdown-capable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Canonical schemas for the engine's external feeds. The stream-catalog JSON
# schema mirrors the KVS `list-streams` payload the reference consumes
# (putmedia_check.sh:6; check_wf.sh:3); the metric schema mirrors CloudWatch
# GetMetricStatistics datapoints (putmedia_check.sh:26-34).
SCHEMAS: dict[str, T.StructType] = {
    "stream_catalog_json": T.StructType(
        [
            T.StructField(
                "StreamInfoList",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("StreamName", T.StringType()),
                            T.StructField("DeviceName", T.StringType()),
                            T.StructField("Status", T.StringType()),
                            T.StructField("StreamARN", T.StringType()),
                            T.StructField("MediaType", T.StringType()),
                            T.StructField("CreationTime", T.TimestampType()),
                            T.StructField("DataRetentionInHours", T.IntegerType()),
                        ]
                    )
                ),
            )
        ]
    ),
    "metric_datapoints": T.StructType(
        [
            T.StructField("stream_name", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("unit", T.StringType()),
        ]
    ),
    "probe_log": T.StructType(
        [
            T.StructField("device_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("value", T.DoubleType()),
        ]
    ),
}


# ---------------------------------------------------------------------------
# Readers
# ---------------------------------------------------------------------------


def read_parquet(spark: SparkSession, path: str, *columns: str) -> DataFrame:
    """Parquet scan; optional column list applies pruning at declaration time."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    delimiter: str = ",",
    timestamp_format: str | None = None,
) -> DataFrame:
    """CSV reader with a mandatory explicit schema (no inference scan).

    ``mode=FAILFAST`` surfaces malformed rows immediately rather than
    silently nulling them — at 100 TB a silent PERMISSIVE null is a data-loss
    bug you find weeks later.
    """
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "FAILFAST")
    )
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    multiline: bool = False,
) -> DataFrame:
    """JSON-lines (or multiline-document) reader with explicit schema.

    The native twin of the reference's `aws ... | jq` pipeline
    (putmedia_check.sh:6): parsing happens once, JVM-side, with only the
    declared fields materialized.
    """
    return (
        spark.read.schema(schema)
        .option("multiLine", str(multiline).lower())
        .option("mode", "FAILFAST")
        .json(path)
    )


def read_orc(spark: SparkSession, path: str, *columns: str) -> DataFrame:
    """ORC scan (column pruning + predicate pushdown, like parquet).

    ORC is the interchange format for Hive-era warehouses; supporting it
    means a migration can read existing tables in place instead of
    rewriting 100 TB before the first query.
    """
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """ORC writer (zstd): the export path back into Hive-era consumers."""
    df.write.mode(mode).option("compression", "zstd").orc(path)


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    *,
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
    compression: str = "zstd",
) -> None:
    """Date/key-partitioned parquet layout — the 100 TB default for `events`.

    Partition columns become directory levels (``.../date=2026-08-13/``), so
    time-range predicates prune whole directories before any IO (the native
    form of the reference's ``[now-60s, now]`` windowing,
    putmedia_check.sh:18-22).

    Default codec is zstd: ~30% smaller than snappy on text-heavy columns at
    comparable scan speed — at 100 TB that difference is ~30 TB of storage
    and network per full scan. Pass ``compression="snappy"`` for
    CPU-bound-write workloads.
    """
    writer = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_by).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_by: list[str],
    num_buckets: int,
    *,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles once at write time so every later
    join/aggregation on the bucket key is shuffle-free.

    At 100 TB, bucketing ``lineitem`` and ``orders`` on the order key by the
    same bucket count turns their join into a zero-exchange sort-merge join —
    the single biggest shuffle eliminated from the star-schema workload.
    """
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table_name)


def compact(
    df: DataFrame,
    path: str,
    *,
    target_file_mb: int = 128,
    approx_row_bytes: int = 256,
    mode: str = "overwrite",
) -> None:
    """Rewrite a dataset into ~``target_file_mb`` files (small-file compaction).

    Uses a row-count estimate rather than sampling (no extra scan beyond the
    count Spark already parallelizes). At scale this is the maintenance job
    that keeps the events table scannable after high-frequency streaming
    ingestion produced thousands of tiny micro-batch files.
    """
    rows = df.count()
    target_rows_per_file = max(1, (target_file_mb * 1024 * 1024) // approx_row_bytes)
    nfiles = max(1, -(-rows // target_rows_per_file))  # ceil
    df.repartition(nfiles).write.mode(mode).parquet(path)
