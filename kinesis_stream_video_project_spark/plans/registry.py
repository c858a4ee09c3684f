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


# The driver verifies a PREFIX of exactly 50 queries() entries (r1/r2
# evidence). Export order is therefore a verification budget, rotated every
# round. Cross-round state entering r9: 210 registered, every query has a
# green HASH row, latest-green distribution r8=50, r7=50, r6=50, r5=49,
# r4=11 (VERDICT r8). The r9 window is budgeted 11+10+29 per VERDICT r8
# items 1-3:
# (a) the 11-query r4-latest staleness cohort at the HEAD — the one r7
#     target missed in r8 (every one has an r5+-green operator-family
#     sibling, but a 4-round-stale row is the weakest link); after
#     CORRECTNESS_r9 nothing is older than r5;
# (b) the 10 NEW round-9 registrations (queries_round9b.py): the
#     r9-queue remainder (bloom_ingest_scores, sq8_topk,
#     neighbor_jaccard, clustering_coefficient, rfm_segments) plus the
#     first five r10-queue promotions (cms_user_counts,
#     good_turing_counts, join_size_profile, session_pattern_matches,
#     classification_report) — a query registered in round N must be in
#     round N's window; the r10 window then has room for the heavy
#     multimodal/PQ tier + the 27-query r11 module;
# (c) 29 refresh slots: the HEAD of the 49-query r5-latest cohort in its
#     r5 verification order (oldest evidence first). The 20 deferred
#     entries lead the r10 refresh block (budget note: r10 = 8 r10-queue
#     remainder + r11 module + these 20; if that exceeds 50, the
#     composed/claim forms of the r11 module defer to r12 per PLANS
#     Round-8n).
# Queries not listed keep registration order after these.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- (a) the r4-latest staleness cohort (11) ---
    "ann_recall_eval",
    "array_funcs",
    "chunk_documents",
    "cube_agg",
    "datetime_funcs",
    "distinct_ops",
    "exists_correlated",
    "filtered_cosine_topk",
    "ivf_kmeans_topk",
    "math_funcs",
    "string_funcs",
    # --- (b) new round-9 registrations (10) ---
    "bloom_ingest_scores",
    "sq8_topk",
    "neighbor_jaccard",
    "clustering_coefficient",
    "rfm_segments",
    "cms_user_counts",
    "good_turing_counts",
    "join_size_profile",
    "session_pattern_matches",
    "classification_report",
    # --- (c) r5-latest refresh cohort head (29 of 49, r5 order) ---
    "point_lookup_status",
    "iso8601_format",
    "cast_truncate",
    "computed_projection",
    "sort_ranked",
    "rollup_agg",
    "join_full_outer",
    "semi_join_customers",
    "scalar_subquery",
    "in_subquery",
    "pivot_priority_counts",
    "stats_agg",
    "string_funcs2",
    "datetime_funcs2",
    "grouping_sets_agg",
    "near_dup_jaccard",
    "embedding_near_dup",
    "conversion_funnel",
    "near_dup_shingle_jaccard",
    "dup_clusters",
    "curation_pipeline_v2",
    "lsh_tier_consistency",
    "near_dup_split_leakage",
    "minhash_lsh_near_dup",
    "quality_percentile_gate",
    "bigram_next_token",
    "surprisal_score_salted",
    "unpivot_priority_metrics",
    "scd2_point_in_time",
)


def all_queries() -> dict[str, QuerySpec]:
    _load_all()
    prioritized = {
        name: _REGISTRY[name] for name in DRIVER_PRIORITY if name in _REGISTRY
    }
    rest = {
        name: spec for name, spec in _REGISTRY.items() if name not in prioritized
    }
    return {**prioritized, **rest}


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
        queries_llm2,
        queries_round3,
        queries_round4,
        queries_round5,
        queries_round5b,
        queries_round5c,
        queries_round5d,
        queries_round5e,
        queries_round6,
        queries_round7,
        queries_round8,
        queries_round8b,
        queries_round9,
        queries_round9b,
        queries_streaming_twins,
    )

    _LOADED = True
