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
# round. Cross-round state entering r10: 220 registered, every query has a
# green HASH row, latest-green distribution r9=50, r8=50, r7=50, r6=50,
# r5=20 (VERDICT r9). The r10 window is budgeted 9+21+20 per VERDICT r9
# item 1 / the PLANS r9-close handoff:
# (a) the 9-query queries_round10b module (NEW registrations —
#     dhash_near_dups with its stated-empty-below-sf0.1 contract);
# (b) 21 of the 27-query queries_round11 module (NEW registrations —
#     FIRST_WAVE; the six composed/claim + family-covered stats forms
#     defer to the r11 window, see queries_round11.DEFERRED_TO_R11);
# (c) the 20 remaining r5-latest refreshes in their r5 verification
#     order (oldest evidence first — after CORRECTNESS_r10 nothing is
#     staler than r6).
# This tuple is VALIDATED, not just documented: build_driver_priority()
# below recomputes it from the CORRECTNESS_r*.json artifacts (new
# registrations first, then max-staleness refreshes), and
# test_registry_hygiene pins equality — the standing "nothing staler
# than 4 rounds" SLO (VERDICT r9 item 9) is therefore enforced by the
# builder instead of re-derived by hand each round.
# Queries not listed keep registration order after these.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- (a) queries_round10b: new r10 registrations (9) ---
    "zorder_locality_audit",
    "range_partition_bounds",
    "truncated_rerank_topk",
    "pq_adc_topk",
    "frame_diff_energy",
    "scene_cuts",
    "dhash_near_dups",
    "hits_bipartite",
    "closed_sessions",
    # --- (b) queries_round11 FIRST_WAVE: new r10 registrations (21) ---
    "kmv_distinct_nations",
    "dd_price_quantiles",
    "peak_transit_suppliers",
    "attribution_channels",
    "readability_scores",
    "props_charclass_profile",
    "bpe_trained_merges",
    "bpe_compression_report",
    "chi2_priority_status",
    "ks_purchase_click",
    "benford_totalprice",
    "gini_supplier_revenue",
    "topk_quantity_ties",
    "acf_daily_orders",
    "priority_impurity_by_nation",
    "cdc_customer_segments",
    "anonymity_nation_segment",
    "allpairs_jaccard_800",
    "fd_nation_segment_name",
    "kmv_setops_urgent_low",
    "gopher_rules",
    # --- (c) the r5-latest refresh cohort tail (20 of 20, r5 order) ---
    "nucleus_budget_filter",
    "hll_merge_rollup",
    "linear_interpolate_value",
    "quality_weighted_sample",
    "asof_tolerance_metric",
    "asof_nearest_metric",
    "ewma_metric",
    "skyline_parts",
    "weighted_median_price",
    "interarrival_gap_percentiles",
    "mode_order_priority",
    "triangle_count_copurchase",
    "copurchase_lift_pairs",
    "containment_near_dup",
    "rolling_zscore_anomalies",
    "corr_acctbal_price_by_nation",
    "trend_slope_per_type",
    "cusum_changepoints",
    "rrf_fused_topk",
    "phrase_search_docs",
)


def build_driver_priority(
    repo_root: str = ".", window: int = 50
) -> tuple[str, ...] | None:
    """Recompute the driver window from the CORRECTNESS_r*.json history:
    every registered query with NO driver row yet (this round's new
    registrations, in export/registration order) first, then refresh
    slots filled oldest-latest-green first (ties broken by position in
    that round's artifact — its verification order). Returns ``None``
    when no artifacts are present (fresh clone); otherwise a tuple of
    exactly ``window`` names. The committed ``DRIVER_PRIORITY`` must
    equal this (test_registry_hygiene) — that IS the standing staleness
    SLO: a query can never silently age past the max the refresh budget
    allows, because the builder always spends leftover slots on the
    stalest rows."""
    import glob
    import json
    import os
    import re

    latest: dict[str, tuple[int, int]] = {}
    paths = sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")))
    if not paths:
        return None
    for path in paths:
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            data = json.load(f)
        for pos, name in enumerate(data):
            latest[name] = (rnd, pos)
    names = list(all_queries())
    new = [n for n in names if n not in latest]
    if len(new) > window:
        raise ValueError(
            f"{len(new)} unverified registrations exceed the {window}-slot "
            "window — split the registration across rounds"
        )
    refresh = sorted(
        (n for n in names if n in latest), key=lambda n: latest[n]
    )
    return tuple((new + refresh)[:window])


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

    # r10-window registrations: the round10b module (all 9) and the r11
    # module's FIRST_WAVE (21 of 27; DEFERRED_TO_R11 waits for the r11
    # window together with queries_round12).
    from kinesis_stream_video_project_spark.plans import (
        queries_round10b,
        queries_round11,
    )

    queries_round10b.register_all()
    queries_round11.register_all()

    _LOADED = True
