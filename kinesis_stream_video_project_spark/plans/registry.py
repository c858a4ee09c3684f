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
# round. Cross-round state entering r11: 250 registered, every query has a
# green HASH row, latest-green distribution r10=50, r9=50, r8=50, r7=50,
# r6=50 (VERDICT r10). The r11 window is budgeted 20+30 per VERDICT r10
# item 1:
# (a) the full r12 queue (7 — burn_rate_alerts, the reference's
#     3-strikes watchdog generalized to SRE burn-rate alerts, leads) +
#     the full r13 queue (7 — semdedup_docs_keep closes the last
#     LLM-pipeline family without a driver row) + the six r11
#     deferrals (20 NEW registrations total);
# (b) the 30 stalest refreshes — the r6-latest cohort in its r6
#     verification order (after CORRECTNESS_r11 nothing is staler
#     than r7).
# This tuple is VALIDATED, not just documented: build_driver_priority()
# below recomputes it from the CORRECTNESS_r*.json artifacts (new
# registrations first, then max-staleness refreshes), and
# test_registry_hygiene pins equality — the standing "nothing staler
# than 4 rounds" SLO (VERDICT r9 item 9) is therefore enforced by the
# builder instead of re-derived by hand each round.
# Queries not listed keep registration order after these.
#
# The artifact-round pin the committed window was derived from: the
# hygiene test recomputes the window from artifacts r1..r{BUILT_FROM}
# so the driver landing CORRECTNESS_r{BUILT_FROM+1}.json at the round
# boundary does not flip the equality red (ADVICE r10 item 4); a
# second assertion caps the lag at one round, which is what forces the
# per-round rotation. Rotation is now a FIVE-place rule, one commit:
# register_all wiring + DRIVER_PRIORITY + DRIVER_PRIORITY_BUILT_FROM +
# bench rotation + QUERIES.md regeneration.
DRIVER_PRIORITY_BUILT_FROM: int = 10

DRIVER_PRIORITY: tuple[str, ...] = (
    # --- (a) 20 NEW registrations: r12 queue (7) + r13 queue (7) +
    #         r11 deferrals (6), in registration order ---
    "burn_rate_alerts",
    "ivm_orders_by_custkey",
    "allpairs_jaccard_ppjoin",
    "heaps_law_curve",
    "rare_shingle_neighbors",
    "stratified_allocation",
    "followup_outer_pairs",
    "priority_sample_docs",
    "compaction_bins",
    "fastss_typo_pairs",
    "nation_urgent_ztest",
    "hrw_rebalance_audit",
    "semdedup_keep_report",
    "semdedup_docs_keep",
    "mwu_purchase_click",
    "bag_set_ops",
    "curation_pipeline_v5",
    "twa_user_values",
    "ohlc_hourly_values",
    "ndcg_tier_claims",
    # --- (b) the 30 stalest refreshes (r6-latest cohort, r6 order) ---
    "lpa_communities",
    "kcore_parts",
    "robust_value_stats",
    "winsorized_value_stats",
    "table_drift_report",
    "silent_periods",
    "weighted_pagerank_topk",
    "curation_pipeline_v3",
    "pagerank_copurchase_topk",
    "approx_distinct",
    "approx_percentiles_value",
    "bpe_regex_tokens",
    "brand_volume_suppliers",
    "cosine_topk",
    "curation_pipeline",
    "dedup_survivors",
    "deterministic_sample_docs",
    "doc_fingerprint",
    "dormant_rich_customers",
    "event_transitions",
    "exact_dedup_docs",
    "frame_sample",
    "fuzzy_pairs_levenshtein",
    "grouped_pandas_stats",
    "important_part_shares",
    "lang_id_ngram",
    "lang_stats",
    "large_volume_customers",
    "min_cost_supplier",
    "multimodal_features",
)


def build_driver_priority(
    repo_root: str = ".",
    window: int = 50,
    max_round: int | None = None,
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
    stalest rows.

    ``max_round`` pins which artifacts the derivation may see (ADVICE
    r10 item 4): the committed window for round N+1 is built from
    artifacts r1..rN, but the driver lands CORRECTNESS_r{N+1}.json at
    the round boundary BEFORE the next rotation commit — without the
    pin, that artifact would flip the equality test red at the judged
    head every round by design. The hygiene test passes
    ``DRIVER_PRIORITY_BUILT_FROM`` so the designed handshake stays
    green, and separately asserts the pin never lags the newest
    artifact by more than one round (the staleness SLO's rotation
    forcing-function)."""
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
        if max_round is not None and rnd > max_round:
            continue
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
    # module's FIRST_WAVE (21 of 27).
    from kinesis_stream_video_project_spark.plans import (
        queries_round10b,
        queries_round11,
    )

    queries_round10b.register_all()
    queries_round11.register_all()

    # r11-window registrations (VERDICT r10 item 1): the full r12 + r13
    # queues plus the six r11 deferrals — 20 new names. Registration
    # order IS the builder's new-block window order, so the r12 queue is
    # passed explicitly to lead with burn_rate_alerts (the reference's
    # 3-strikes watchdog in modern SRE form) and ivm_orders_by_custkey.
    from kinesis_stream_video_project_spark.plans import (
        queries_round12,
        queries_round13,
    )

    queries_round12.register_all(
        (
            "burn_rate_alerts",
            "ivm_orders_by_custkey",
            "allpairs_jaccard_ppjoin",
            "heaps_law_curve",
            "rare_shingle_neighbors",
            "stratified_allocation",
            "followup_outer_pairs",
        )
    )
    queries_round13.register_all()
    queries_round11.register_all(
        tuple(
            n
            for n in queries_round11.QUERIES
            if n in queries_round11.DEFERRED_TO_R11
        )
    )

    _LOADED = True
