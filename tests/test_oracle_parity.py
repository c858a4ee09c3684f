"""Driver-shaped differential test: every oracle-paired query must match
DuckDB on row count, columns, and order-insensitive values."""

from __future__ import annotations

import pytest

from kinesis_stream_video_project_spark.plans import registry
from tests.oracle_utils import compare, duckdb_conn

SPECS = registry.all_queries()
ORACLE_NAMES = [n for n, s in SPECS.items() if s.oracle]
ROWS_ONLY_NAMES = [n for n, s in SPECS.items() if not s.oracle]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_match(spark, sf_dir, con, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    want = con.sql(spec.oracle).df()
    compare(sdf, want, name=name)


@pytest.mark.parametrize("name", ROWS_ONLY_NAMES)
def test_rows_only_runs(spark, sf_dir, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, sf_dir)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0
