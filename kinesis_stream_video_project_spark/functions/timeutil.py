"""Time/timestamp column helpers (reference ops T1-T3, SURVEY.md §2A).

All helpers return Column expressions built from JVM built-ins so they stay
inside whole-stage codegen; none cross into Python at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's ISO-8601 UTC format: date -u +"%Y-%m-%dT%H:%M:%SZ"
# (putmedia_check.sh:21-22; putmedia_check2.sh:30-31). Session TZ is pinned
# to UTC (session.py) so date_format emits UTC wall-clock.
ISO8601_FORMAT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def iso8601(ts: Column) -> Column:
    """Epoch/timestamp → ISO-8601 UTC string, second granularity (T3)."""
    return F.date_format(ts, ISO8601_FORMAT)


def epoch_seconds(ts: Column) -> Column:
    """Timestamp → epoch seconds as long (T1: `date +%s`, restart.sh:24)."""
    return F.unix_timestamp(ts)


def epoch_micros(ts: Column) -> Column:
    """Timestamp → epoch microseconds as long (lossless for Spark µs ts)."""
    return F.unix_micros(ts)


def window_start_epoch(ts: Column, seconds: int) -> Column:
    """Epoch second of the tumbling window containing ``ts``.

    Equivalent to ``F.window(ts, f"{seconds} seconds").start`` for
    epoch-aligned tumbling windows (putmedia_check.sh:15,32 semantics);
    floor division keeps it a cheap codegen'd long expression usable in
    joins and group-bys without the struct wrapper.
    """
    return (F.floor(F.unix_micros(ts) / F.lit(seconds * 1_000_000)) * seconds).cast(
        "long"
    )


def truncate_double_to_long(x: Column) -> Column:
    """Double → long truncating toward zero (C1: ``${result%.*}``,
    restart.sh:56 — bash strips the fractional text, i.e. trunc, not round)."""
    return x.cast("long")
