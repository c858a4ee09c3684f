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
