"""Driver contract for the spark-graft builder (PySpark target).

Exports the engine's declared query surface from
``kinesis_stream_video_project_spark.plans.registry``:

* ``entry(spark)`` — flagship 60 s tumbling-window stream-health query
  (the reference's core computation, putmedia_check.sh:26-34 + restart.sh:57)
  on sf0.001.
* ``queries()`` — every implemented operator (SURVEY.md §2B + LLM set).
* ``oracle_sql()`` — DuckDB twins for the SQL-expressible subset.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kinesis_stream_video_project_spark.plans import registry as _registry

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _registry.queries()["stream_health_60s"](spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Confs the engine depends on (UTC + ns-parquet handling), in case
            # the driver's session was built without them.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return fn(spark, sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: _wrap(fn) for name, fn in _registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB SQL twin for each SQL-expressible query."""
    return _registry.oracle_sql()
