"""Batch sources & sinks (the engine's IO surface beyond the fixture loaders).

The reference's only "sources" are AWS CLI subprocesses returning JSON
(list-streams / describe-stream / get-metric-statistics — SURVEY.md §2A
S1-S3); its only "sinks" are stdout and side-effect shell commands (K1-K3).
This package re-expresses that IO surface as proper Spark connectors:

* :mod:`batch` — schema-explicit parquet/CSV/JSON readers and
  partitioned/bucketed/compacted writers (the 100 TB layout tools).

The streaming sources (production Kinesis config + rate/file test twins) live
in :mod:`kinesis_stream_video_project_spark.streaming.sources`; re-exported
here so ``sources`` is the one-stop IO namespace.
"""

from kinesis_stream_video_project_spark.sources import batch  # noqa: F401
from kinesis_stream_video_project_spark.streaming.sources import (  # noqa: F401
    file_event_stream,
    kinesis_stream,
    rate_probe_stream,
)
