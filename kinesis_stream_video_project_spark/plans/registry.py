"""Query registry — the engine's declared surface.

Every operator the engine claims (SURVEY.md §2B plus the LLM-pipeline set) is
registered here as a named query: a ``(spark, sf_dir) -> DataFrame`` callable
plus, when SQL-expressible, the equivalent DuckDB oracle SQL. The driver
contract (``__spark_entry__.py``) exports exactly this registry.

Design rules enforced by convention here (SURVEY.md §5.2):

* alias every computed column identically in the Spark plan and oracle SQL —
  the driver sorts columns by name before hashing;
* every float produced by arithmetic is rounded to 4 decimals on BOTH sides
  (summation order differs between engines at ~1e-12 relative error);
* any ``limit`` is preceded by a total order;
* timestamps in result sets are emitted as epoch seconds/µs integers or
  ISO-8601 strings, never raw timestamp columns whose printable precision
  could differ between engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None => driver does a rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    *,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle
    }


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (side effect: registration)."""
    global _LOADED
    if _LOADED:
        return
    # Imports deferred to avoid circulars (query modules import `register`).
    from kinesis_stream_video_project_spark.plans import (  # noqa: F401
        queries_watchdog,
        queries_relational,
        queries_relational2,
        queries_relational3,
        queries_relational4,
        queries_windows,
        queries_events,
        queries_llm,
        queries_streaming_twins,
    )

    _LOADED = True
