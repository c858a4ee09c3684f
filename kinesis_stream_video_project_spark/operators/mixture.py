"""Training-mixture assembly: fill a global token budget from
prioritized sources (r7 registration queue).

The pipeline step after per-source weighting (queries_round3.py::
domain_mixture_weights): given a priority order over sources and a total
token budget, take whole documents source-by-source (doc_id order within
a source) until the budget is exhausted — the deterministic waterfall
every "mix N tokens of code, then books, then web" recipe reduces to.

Scale design — the two-phase global-threshold pattern (the skyline
discipline): a naive implementation is ONE global cumulative window over
every document (single-partition — the anti-pattern
test_plan_properties guards elsewhere). Instead: per-source token totals
(|sources| rows) take a tiny running-sum window to find each source's
remaining budget; every source whose whole total fits is taken WITHOUT
any doc-level work; only the single BOUNDARY source runs a per-doc
cumulative window, and that window is partitioned on the source. Doc
selection is by integer comparisons on exact token counts, so the
result is hash-exact in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def budget_fill(
    docs_with_tokens: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Per-source take summary ``(source, n_docs_taken, tokens_taken)``
    for the prioritized waterfall fill of ``budget_tokens``. Priority =
    ascending ``source_col`` order (callers wanting a custom order
    project a sortable priority key into it); within a source, docs are
    taken in ascending ``id_col`` order; a document is taken iff it fits
    the remaining budget ENTIRELY (whole-doc granularity — truncation is
    the chunker's job, not the mixer's). Sources past the budget emit
    (source, 0, 0) so the report always covers the input source set —
    exactly ONE row per source: a zero-token source (every doc empty)
    reports via the whole-source branch as (source, n_docs, 0), taken.

    Note the fill is "first gap stops the source": within a source docs
    are taken while the running total fits — a later small doc does NOT
    leapfrog an earlier too-big one (deterministic and what a curriculum
    spec means by "in order"; a best-fit packing variant is
    operators/packing.py's problem). Equally deliberate: the waterfall
    allocates by FULL source totals, so budget left unused at the
    boundary source (because its next doc overflowed) is FORFEITED, not
    rolled into later sources — rolling would make every later source's
    take depend on one boundary doc's size, exactly the butterfly
    coupling a reproducible mixture recipe exists to avoid."""
    per_doc = docs_with_tokens.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("_id"),
        F.col(tokens_col).cast("long").alias("_tok"),
    )
    totals = per_doc.groupBy("source").agg(
        F.sum("_tok").alias("_src_tokens"), F.count(F.lit(1)).alias("_src_docs")
    )
    w_src = Window.orderBy("source").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # |sources| rows — the single-partition window is over the tiny
    # aggregate, never the corpus (the two-phase discipline).
    ledger = totals.select(
        "source",
        "_src_tokens",
        "_src_docs",
        (F.sum("_src_tokens").over(w_src) - F.col("_src_tokens")).alias(
            "_before"
        ),
    ).select(
        "source",
        "_src_tokens",
        "_src_docs",
        F.greatest(
            F.lit(0), F.least(F.lit(budget_tokens) - F.col("_before"), F.col("_src_tokens"))
        ).alias("_remaining"),
    )
    whole = ledger.filter(F.col("_remaining") >= F.col("_src_tokens")).select(
        "source",
        F.col("_src_docs").alias("n_docs_taken"),
        F.col("_src_tokens").alias("tokens_taken"),
    )
    # Branches must be DISJOINT (review finding, r6): a zero-token source
    # has _remaining == 0 == _src_tokens and satisfies both the whole-
    # source predicate (>=) and a bare `_remaining <= 0` — emitting two
    # contradictory rows. The canonical row for a zero-token source is
    # the WHOLE branch's (source, n_docs, 0): all of its (zero-token)
    # docs fit any budget, so the report says they were taken.
    empty = ledger.filter(
        (F.col("_remaining") <= 0) & (F.col("_src_tokens") > 0)
    ).select(
        "source",
        F.lit(0).cast("long").alias("n_docs_taken"),
        F.lit(0).cast("long").alias("tokens_taken"),
    )
    # The boundary source(s): partial budget — per-doc cumulative window,
    # partitioned on the source (at most one such source for a linear
    # waterfall, but the plan handles the general filter uniformly).
    boundary = ledger.filter(
        (F.col("_remaining") > 0) & (F.col("_remaining") < F.col("_src_tokens"))
    ).select("source", "_remaining")
    w_doc = (
        Window.partitionBy("source")
        .orderBy("_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    partial = (
        per_doc.join(F.broadcast(boundary), "source")
        .select(
            "source",
            "_tok",
            "_remaining",
            F.sum("_tok").over(w_doc).alias("_cum"),
        )
        .filter(F.col("_cum") <= F.col("_remaining"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs_taken"),
            F.sum("_tok").alias("tokens_taken"),
        )
    )
    # A boundary source whose FIRST doc already overflows yields no
    # partial row — restore it as (source, 0, 0) via the anti-join.
    boundary_empty = (
        boundary.join(partial.select("source"), "source", "left_anti")
        .select(
            "source",
            F.lit(0).cast("long").alias("n_docs_taken"),
            F.lit(0).cast("long").alias("tokens_taken"),
        )
    )
    return whole.unionAll(partial).unionAll(empty).unionAll(boundary_empty)
