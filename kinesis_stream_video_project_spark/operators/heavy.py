"""Batch certificate for the online Space-Saving heavy hitters.

The online operator (streaming/jobs.py::heavy_hitters_stream and its
transformWithState twin) keeps a capacity-bounded counter table per
hash shard — Metwally/Agrawal/El Abbadi's Space-Saving (ICDT 2005).
Its sketch CONTENTS depend on arrival order, so the sketch itself
cannot be hash-checked against a SQL oracle; what CAN be checked are
the algorithm's order-independent guarantees. This module replays the
same fold (``streaming.jobs._spacesaving_fold`` — one shared
implementation, the ``_funnel_fold`` discipline) over the batch events
table in (ts, event_id) order and emits a per-shard CERTIFICATE row
whose every column is a deterministic consequence of the guarantees:

* ``n_entries``      = min(capacity, distinct keys) — the table fills,
                       then evicts; it never shrinks.
* ``total_count``    = the shard's stream length N (each arrival
                       increments exactly one counter by one — the
                       Space-Saving sum invariant).
* ``n_guaranteed``   = keys with true count > N div capacity (every
                       such key MUST survive in the sketch).
* ``n_guaranteed_present`` — how many of them actually are present;
                       equals n_guaranteed iff the guarantee holds.
* ``n_bound_violations`` — sketch entries whose true count falls
                       outside [count − err, count]; 0 iff the
                       over-estimate bookkeeping holds.

A DuckDB oracle derives the same row from exact counts alone
(n_guaranteed_present := n_guaranteed, violations := 0), so a hash
match certifies the guarantees on real data — the claim-query pattern
(HLL-within-2%, IVF-recall-floor) applied to a streaming sketch.
"""

from __future__ import annotations

import collections

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CERT_SCHEMA = (
    "shard long, n_entries long, total_count long, n_guaranteed long, "
    "n_guaranteed_present long, n_bound_violations long"
)


def heavy_hitters_certificate(
    events: DataFrame,
    key_col: str = "user_id",
    capacity: int = 16,
    shards: int = 4,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """One certificate row per shard (``shard`` = key mod shards — the
    SQL-portable sharding; the streaming form uses Spark's murmur hash,
    which no oracle can replay, but the guarantee being certified is
    hash-function-independent). See module docstring for the columns.

    Scale: this replay is the VERIFICATION harness, not the production
    path — applyInPandas materializes one shard's events per task, so
    its memory is O(N/shards) where the streaming form's state is
    O(capacity) per shard with events arriving incrementally. Run it on
    a bounded slice (a day, a sample) when certifying a production
    stream; the certificate's guarantees are slice-local anyway.

    The shard count is the parallelism knob AND part of the statement
    being certified: raising ``shards`` shrinks each task's slice
    (N/shards memory) but RE-PARTITIONS the certificate — each shard
    certifies its own sub-stream, with its own N, threshold N div
    capacity, and guaranteed set, so certificates at different shard
    counts are not comparable row-for-row (a key can be guaranteed in
    a 4-shard run and below threshold in a 64-shard run). Per-shard
    error also tightens as shards grow (err ≤ N_shard/capacity), so a
    64-shard certificate makes a STRONGER per-shard claim about a
    correspondingly narrower slice. Pick shards for the memory budget,
    then read the certificate at that granularity; key-mod sharding
    inherits the key distribution, so a single hot KEY still lands in
    one shard — skew across shards is bounded by key skew, not fixed
    by shard count."""

    def cert(pdf: pd.DataFrame) -> pd.DataFrame:
        from kinesis_stream_video_project_spark.streaming.jobs import (
            _spacesaving_fold,
        )

        shard = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values([ts_col, id_col])
        rows = [str(k) for k in pdf[key_col].tolist()]
        keys, counts, errs = _spacesaving_fold([], [], [], rows, capacity)
        true = collections.Counter(rows)
        n = len(rows)
        thr = n // capacity
        guaranteed = [k for k, c in true.items() if c > thr]
        present = set(keys)
        viol = sum(
            1
            for k, c, e in zip(keys, counts, errs)
            if not (c - e <= true[k] <= c)
        )
        return pd.DataFrame(
            [
                [
                    shard,
                    len(keys),
                    sum(counts),
                    len(guaranteed),
                    sum(1 for k in guaranteed if k in present),
                    viol,
                ]
            ],
            columns=[
                "shard",
                "n_entries",
                "total_count",
                "n_guaranteed",
                "n_guaranteed_present",
                "n_bound_violations",
            ],
        )

    sharded = events.withColumn(
        "_shard", (F.col(key_col) % F.lit(shards)).cast("long")
    ).select("_shard", key_col, ts_col, id_col)
    return sharded.groupBy("_shard").applyInPandas(cert, _CERT_SCHEMA)
