"""Registry-wide driver-style RENDERED-value sweep (the verify-skill
pre-ship gate): for every oracle-paired query, run the Spark plan and
the DuckDB oracle at $SPARK_GRAFT_SF_DIR, sort columns by name + rows by
all columns, and compare per-cell str(a) == str(b) — the comparison the
round driver actually hashes (numeric compare masked 6 DECIMAL bugs in
r1). Prints one line per failure and a final tally; exit 1 on any
mismatch. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python scripts/rendered_sweep.py [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

from kinesis_stream_video_project_spark.plans import registry  # noqa: E402
from kinesis_stream_video_project_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def rendered(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])
    spark = get_spark(app_name="rendered-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    specs = registry.all_queries()
    n_ok = n_bad = 0
    t_start = time.perf_counter()
    for name, spec in specs.items():
        if only and name not in only:
            continue
        if not spec.oracle:
            continue
        try:
            got = rendered(spec.fn(spark, sf_dir).toPandas())
            want = rendered(con.sql(spec.oracle).df())
            assert list(got.columns) == list(want.columns), (
                f"columns {list(got.columns)} != {list(want.columns)}"
            )
            assert len(got) == len(want), f"rows {len(got)} != {len(want)}"
            assert got.equals(want), "rendered values differ"
            n_ok += 1
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            print(f"FAIL {name}: {str(e)[:300]}")
    dt = time.perf_counter() - t_start
    print(f"sweep {sf_dir}: {n_ok} ok, {n_bad} failed in {dt:.1f} s")
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
