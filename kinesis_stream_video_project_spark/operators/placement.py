"""Rendezvous (highest-random-weight) hashing — deterministic shard
placement and the rebalance audit (Thaler/Ravishankar, IEEE ToN 1998;
the assignment law under Riak/Ceph-style placement and the reason
consistent schemes move only 1/(n+1) of keys when a node joins).

Every key's owner is ``argmax over nodes of hash(key, node)`` — a pure
row-local function of (key, node set): no ring state, no lookup table,
no shuffle. When the node set changes, a key moves ONLY if its argmax
changed, and because adding a node cannot change the relative order of
the existing nodes' hashes, keys move ONLY INTO added nodes (and only
OUT of removed ones) — the minimal-disruption law, which the audit
measures on real keys (and the tests pin as an invariant, not a
probability).

Portable-hash rule: the per-(key, node) weight is the 48-bit integer of
``md5(key || ':' || node)`` — DuckDB derives bit-identical values, so
assignments and the whole audit sit under the driver hash gate. Ties
would need md5(k:a) == md5(k:b) on 48 bits across a handful of nodes —
vanishingly unlikely but still DETERMINISTIC either way: the CASE scan
picks the first node in list order.

Scale: assignment is a narrow projection (|nodes| md5 evaluations per
row, no join, no shuffle — the md5s are plain scalar codegen); the
audit's only shuffle is one |shards|-cardinality aggregate pair over
the assignment columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _weight(key: Column, node: str) -> Column:
    # NULL keys are refused loudly (ADVICE r10): concat_ws SKIPS nulls,
    # so a NULL key would hash ":node" on the Spark side while the
    # DuckDB oracle's `CAST(k AS VARCHAR) || ':node'` NULL-propagates
    # and falls to the CASE ELSE node — a silent cross-engine placement
    # divergence. Placement of a NULL key is meaningless anyway; the
    # in-plan raise keeps the projection narrow and codegen-friendly.
    guarded = F.when(
        key.isNull(),
        F.raise_error(F.lit("rendezvous_assign: NULL key")).cast("string"),
    ).otherwise(key.cast("string"))
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", guarded, F.lit(node))), 1, 12
        ),
        16,
        10,
    ).cast("bigint")


def rendezvous_assign(key: Column, nodes: Sequence[str]) -> Column:
    """The HRW owner of ``key`` among ``nodes``: argmax of the portable
    48-bit md5 weight, first-in-list on (impossible-in-practice) ties."""
    if not nodes:
        raise ValueError("rendezvous_assign: nodes must be non-empty")
    if len(set(nodes)) != len(nodes):
        raise ValueError(f"rendezvous_assign: duplicate nodes in {nodes}")
    weights = [_weight(key, n) for n in nodes]
    top = F.greatest(*weights) if len(weights) > 1 else weights[0]
    out = None
    for n, w in zip(nodes, weights):
        out = (
            F.when(w == top, F.lit(n))
            if out is None
            else out.when(w == top, F.lit(n))
        )
    return out


def rendezvous_rebalance_audit(
    df: DataFrame,
    key: str,
    nodes_before: Sequence[str],
    nodes_after: Sequence[str],
) -> DataFrame:
    """Per-shard movement ledger for a node-set change: one row per
    shard in EITHER set — ``(shard, n_before, n_after, n_moved_in,
    n_moved_out)`` (zeros where a shard is absent from one side).
    Sanity laws the tests pin: Σ n_moved_in == Σ n_moved_out; pure
    ADDITIONS receive all inflow and cause zero outflow from ordering
    stability; removed shards' n_after == 0.

    The decision input at 100 TB: "what fraction of the key space does
    adding these shards actually move" is this query at sample or full
    scale — the audit is the measurement, the 1/(n+1) law the
    expectation it is checked against."""
    assigned = df.select(
        rendezvous_assign(F.col(key), nodes_before).alias("_a"),
        rendezvous_assign(F.col(key), nodes_after).alias("_b"),
    )
    moved = F.col("_a") != F.col("_b")
    before = assigned.groupBy(F.col("_a").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_before"),
        F.sum(moved.cast("long")).cast("long").alias("n_moved_out"),
    )
    after = assigned.groupBy(F.col("_b").alias("shard")).agg(
        F.count(F.lit(1)).cast("long").alias("n_after"),
        F.sum(moved.cast("long")).cast("long").alias("n_moved_in"),
    )
    return (
        before.join(after, "shard", "full_outer")
        .select(
            "shard",
            F.coalesce("n_before", F.lit(0)).cast("long").alias("n_before"),
            F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
            F.coalesce("n_moved_in", F.lit(0)).cast("long").alias("n_moved_in"),
            F.coalesce("n_moved_out", F.lit(0))
            .cast("long")
            .alias("n_moved_out"),
        )
    )
