"""Decompose a rotation row's bench span into construction vs execution
(VERDICT r14 item 5): for each named query, time

* fn      — the Python fn(spark, sf_dir) call (plan construction; any
            eager work — collects, checkpoints — lands here),
* analyze — first touch of df.schema (Catalyst analysis of the tree),
* first   — first noop-sink execution (optimization + codegen + run),
* warm    — min-of-2 re-execution of the analyzed plan.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/cons_profile.py name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from kinesis_stream_video_project_spark.plans import registry  # noqa: E402
from kinesis_stream_video_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="cons-profile")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_queries()
    for name in names:
        spark.sparkContext.setJobDescription(f"cons-profile: {name}")
        t0 = time.perf_counter()
        df = specs[name].fn(spark, sf_dir)
        t_fn = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = df.schema
        t_an = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t_first = time.perf_counter() - t0
        warm = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            warm = min(warm, time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "name": name,
                    "fn": round(t_fn, 3),
                    "analyze": round(t_an, 3),
                    "first_exec": round(t_first, 3),
                    "warm": round(warm, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
