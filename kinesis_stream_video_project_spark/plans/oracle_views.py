"""DuckDB CTE twins of the engine's derived views (io.py).

The driver pre-registers the raw tables (region nation customer supplier part
orders lineitem events documents embeddings) as DuckDB views; these fragments
re-derive the reference-domain views on top, byte-for-byte equivalent to the
Spark definitions in io.py. Compose with :func:`with_views`.

Precision note: DuckDB's parquet reader truncates the events TIMESTAMP(NANOS)
column to µs exactly like io.load_table does on the Spark side, so ``ts`` is
directly comparable.
"""

from __future__ import annotations

STREAM_CATALOG_SQL = """
SELECT 'stream-' || CAST(s_suppkey AS VARCHAR)  AS stream_name,
       'device-' || CAST(s_nationkey AS VARCHAR) AS device_name,
       CASE WHEN s_acctbal < 0 THEN 'CREATING' ELSE 'ACTIVE' END AS status,
       s_suppkey AS stream_key
FROM supplier
"""

METRIC_DATAPOINTS_SQL = """
SELECT 'stream-' || CAST(user_id AS VARCHAR) AS stream_name,
       ts, value, event_type
FROM events
"""

PROBE_LOG_SQL = """
SELECT user_id AS device_id, ts, event_id,
       event_type <> 'error' AS ok, value
FROM events
"""

_VIEWS = {
    "stream_catalog": STREAM_CATALOG_SQL,
    "metric_datapoints": METRIC_DATAPOINTS_SQL,
    "probe_log": PROBE_LOG_SQL,
}


def with_views(sql: str, *views: str) -> str:
    """Prefix ``sql`` with a WITH clause defining the named derived views."""
    if not views:
        return sql
    ctes = ",\n".join(f"{v} AS ({_VIEWS[v]})" for v in views)
    return f"WITH {ctes}\n{sql}"
