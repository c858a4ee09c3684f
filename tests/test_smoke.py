"""Driver smoke twin: entry() runs, returns rows, stable schema."""

from __future__ import annotations


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {
        "window_start",
        "stream_name",
        "put_media_sum",
        "n_events",
        "n_errors",
        "healthy",
    } == cols


def test_queries_and_oracles_consistent():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
