"""Re-time the repeated-subtree-guard allowlist (VERDICT r12 item 5).

The allowlist in tests/test_plan_properties.py is only as honest as its
measurements: every entry's rationale must carry a DATED warm figure at
sf0.1, refreshed whenever the owning module changes. This script times
each allowlisted query the way bench.py times rotation-head warm rows
(construct once, one untimed execution to absorb codegen, then min-of-2
warm re-executions of the analyzed plan) and prints one line per entry.

Usage (quiet host, after any bench child has exited):

    python scripts/time_allowlist.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from kinesis_stream_video_project_spark.plans import registry  # noqa: E402
from kinesis_stream_video_project_spark.session import get_spark  # noqa: E402


def _load_allowlist() -> list[str]:
    """Single source of truth (ADVICE r13 item 2): import the guard's
    own ``_EXPENSIVE_REPEAT_ALLOWLIST`` from tests/test_plan_properties.py
    so this sweep always times exactly the entries the guard exempts —
    a hard-coded copy here would silently drift when an entry is added
    or removed."""
    import importlib.util

    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..",
        "tests",
        "test_plan_properties.py",
    )
    spec = importlib.util.spec_from_file_location("_plan_props", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return sorted(mod._EXPENSIVE_REPEAT_ALLOWLIST)


ALLOWLIST = _load_allowlist()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="allowlist-retime")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_queries()
    for name in ALLOWLIST:
        df = specs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # absorb codegen
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name} warm={best:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
