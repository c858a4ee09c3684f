"""Output sinks (O-34, K1-K3).

The reference's sinks are an email alert (restart.sh:5-7,103) and direct OS
remediation commands (K3: systemctl/nmcli/usb/reboot, restart.sh:116-149).
In the engine, decisions are DATA (an actions/alerts stream); executing them
is the sink's job at the pipeline edge — foreachBatch gives exactly-once-ish
batch handoff (idempotent by batch_id) to whatever the effectful boundary is.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.config import ESCALATION_LADDER

# Alert recipients — the reference's `To` list (restart.sh:5-7).
DEFAULT_RECIPIENTS = ("gwsys_admin_user@example.com",)


def format_alerts(actions: DataFrame, recipients=DEFAULT_RECIPIENTS) -> DataFrame:
    """Render action rows into alert records (K1): recipient list + ISO-8601
    UTC timestamp + message — the reference's failure email as data."""
    return actions.select(
        F.lit(",".join(recipients)).alias("to"),
        F.col("device_id"),
        F.date_format(
            F.timestamp_micros(F.col("action_ts_us")), "yyyy-MM-dd'T'HH:mm:ss'Z'"
        ).alias("alert_iso"),
        F.col("action"),
        F.concat(
            F.lit("device "),
            F.col("device_id").cast("string"),
            F.lit(" unhealthy -> "),
            F.col("action"),
        ).alias("message"),
    )


def parquet_alert_sink(path: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch writer appending alert batches to a parquet audit table.

    Writes are idempotent per (batch_id) because foreachBatch replays a failed
    batch with the same id — production would MERGE on (batch_id, device_id,
    action_ts_us); parquet append + downstream dedup_first_event covers the
    same guarantee here."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        (
            format_alerts(batch_df)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(path)
        )

    return write


def upsert_partition_sink(
    path: str, key_col: str, order_cols: tuple[str, ...]
) -> Callable[[DataFrame, int], None]:
    """foreachBatch upsert into a key-partitioned parquet table: each batch
    keeps only its LATEST row per key (max over ``order_cols``), merges it
    with any existing row for that key, and rewrites ONLY the touched
    ``{key_col}=value`` partition directories (dynamic partition overwrite).
    This is the standard keep-latest-state materialization (device health
    registry, user-profile table) for engines without MERGE INTO: the
    partition is the upsert unit, untouched partitions' files are never
    rewritten, and replaying a failed batch converges to the same state —
    idempotent because last-write-wins per key is a projection of (key,
    max order), not an accumulation.

    Scale note: ``key_col`` here is the PARTITION key, so it must be
    low-cardinality (device, not event). A high-cardinality upsert key
    needs a bucketed layout + MERGE-capable table format instead; this
    sink deliberately models the partition-grain variant."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # max over a struct whose leading fields are the order columns =
        # argmax carrying the whole row (struct comparison is field-order
        # lexicographic), the shuffle-light way to keep latest-per-key.
        data_cols = [c for c in batch_df.columns if c != key_col]
        ordered = list(order_cols) + [c for c in data_cols if c not in order_cols]
        w = F.struct(*ordered)

        def latest_of(df: DataFrame) -> DataFrame:
            return (
                df.groupBy(key_col)
                .agg(F.max(w).alias("_w"))
                .select(key_col, F.col("_w.*"))
            )

        latest = latest_of(batch_df)
        try:
            existing = spark.read.parquet(path).join(
                F.broadcast(latest.select(key_col)), key_col, "semi"
            )
            merged = latest_of(
                latest.unionByName(existing.select(key_col, *ordered))
            )
        except Exception:  # first batch: nothing to merge yet
            merged = latest
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        try:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
            merged.write.mode("overwrite").partitionBy(key_col).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return write


def collecting_sink(store: list) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink that collects rows into a Python list — test/demo
    only (drivers-side; never use at scale)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        store.extend(batch_df.collect())

    return write


def validate_action(action: str) -> None:
    """Guard for effect executors (K3): only ladder actions are executable."""
    if action not in ESCALATION_LADDER:
        raise ValueError(f"unknown remediation action: {action}")
