"""Inline pipeline observability via ``DataFrame.observe`` (zero extra
pass): quality counters ride the SAME job that materializes the data, so a
100 TB run pays nothing beyond the scan it was already doing — versus the
naive ``df.filter(...).count()`` audits that each re-execute the plan.

The reference emits its health signals as side effects (mailx in
restart.sh:103, CloudWatch counters consumed by putmedia_check.sh:26-34);
here the signals are observed metrics on the main dataflow:

* batch: ``observed(df)`` returns (df', Observation); run any action on
  df', then ``Observation.get`` yields the counters.
* streaming: the same ``df.observe`` surfaces per-micro-batch in
  ``StreamingQueryProgress.observedMetrics`` — the hook a monitoring agent
  polls instead of re-querying state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

#: metric name used for the standard event-quality counter set
EVENT_QUALITY = "event_quality"


def _event_quality_exprs():
    """Counters every ingest of the events shape should watch: volume,
    null payloads, error share, and the watermark-relevant max event time.
    All algebraic (sum/count/max) — observe() requires aggregates that can
    merge across partitions without a shuffle."""
    return [
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null_value"),
        F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
        F.max(F.unix_micros("ts")).alias("max_ts_us"),
    ]


def observed(df: DataFrame) -> tuple[DataFrame, Observation]:
    """Batch form: attach the event-quality counters to ``df``. The
    returned Observation resolves after the first action on the returned
    frame (one job, counters collected on the executors as the rows
    stream by)."""
    obs = Observation(EVENT_QUALITY)
    return df.observe(obs, *_event_quality_exprs()), obs


def observed_stream(df: DataFrame) -> DataFrame:
    """Streaming form: same counters, named observation (streaming cannot
    use Observation handles — metrics arrive per micro-batch in
    ``query.lastProgress["observedMetrics"]["event_quality"]``)."""
    return df.observe(EVENT_QUALITY, *_event_quality_exprs())
