"""SparkSession factory tuned for both local testing and cluster scale.

Scale posture (the 100 TB design notes, per SURVEY.md §4.3):

* AQE on: runtime coalescing of shuffle partitions, skew-join splitting and
  dynamic broadcast decisions replace hand-tuning per scale factor.
* ``spark.sql.shuffle.partitions`` defaults to the local core count; on a real
  cluster this is overridden (or left to AQE's coalescing with a high initial
  value) via ``SPARK_GRAFT_SHUFFLE_PARTITIONS``.
* Session timezone pinned to UTC — the reference formats all timestamps as
  ISO-8601 UTC (putmedia_check.sh:21-22) and the fixtures are UTC.
* ``spark.sql.legacy.parquet.nanosAsLong=true``: the events fixture carries
  TIMESTAMP(NANOS) which Spark's vectorized reader rejects; we read ns as
  long and convert to µs timestamps deterministically in the IO layer
  (io.py), matching DuckDB's own ns→µs truncation.
* Arrow enabled for the pandas-UDF paths (vectorized Python boundary).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "kinesis-stream-video-project-spark"


def _default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return max(1, int(cpus))
    return os.cpu_count() or 8


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local default is ``local[$SPARK_GRAFT_CPUS or all cores]``; on a cluster
    the caller passes ``master=None`` with spark-submit supplying the master.
    """
    cores = _default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cores))
        )

    # local[...] runs executors inside the driver JVM, whose default 1g heap
    # OOMs on array-heavy sf0.1 workloads; static conf, effective only if this
    # call creates the JVM (a pre-existing session keeps its heap).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        # Streaming state at scale: RocksDB keeps watchdog state off-heap and
        # incrementally checkpointed (SURVEY.md §4.3).
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
        # Update-heavy stateful ops (the window aggregates update ~1 state
        # row per input row) pay a RocksDB point-lookup per put just to
        # maintain the numRowsTotal metric; Spark's own tuning guide says to
        # disable tracking for update-heavy workloads. Measured on the r14
        # bench host: 60 s-window drain 3.11 s -> 2.34 s (min of 3, sf0.1,
        # 4 state partitions). Env-overridable for deployments that want the
        # state-row metric back.
        .config(
            "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
            os.environ.get("SPARK_GRAFT_ROCKSDB_TRACK_ROWS", "false"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # getOrCreate can return a pre-existing session with stale SQL confs; re-pin
    # the dynamic ones that correctness depends on.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
