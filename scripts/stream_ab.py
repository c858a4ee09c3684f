"""Interleaved A/B of the RocksDB trackTotalNumberOfRows flag on the
driver-visible stream_health_streaming path (VERDICT r14 item 3).

One invocation = one cold JVM = exactly what bench.py's stable child
pays for this row: one untimed drain (absorbs store creation + state
codegen), then one timed drain. Prints a single JSON line
{"track": ..., "sec": ...}. The caller alternates the env var between
runs so host drift hits both arms equally.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kinesis_stream_video_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench

    spark = get_spark(app_name="stream-ab")
    spark.sparkContext.setLogLevel("ERROR")
    bench.bench_streaming(spark, sf_dir)
    sec = bench.bench_streaming(spark, sf_dir)
    print(
        json.dumps(
            {
                "track": os.environ.get("SPARK_GRAFT_ROCKSDB_TRACK_ROWS", "false"),
                "sec": sec,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
