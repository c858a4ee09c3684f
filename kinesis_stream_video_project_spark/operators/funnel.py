"""Ordered multi-step funnel analysis over the events stream (r8
registration queue).

The classic product-analytics question — how many users progressed
view → click → purchase IN ORDER — that the reference's CloudWatch
dashboards answer with per-metric counts but cannot sequence (its
scripts count stream-health events independently; ordering across
event types is exactly what a query engine adds). Public semantics
follow the standard "unordered events, ordered funnel" definition
(e.g. the windowFunnel aggregate documented by ClickHouse, and every
product-analytics SaaS): a user is AT step i if there exist events
e_1 … e_i of the step types with strictly increasing timestamps.

Strictness: each later step must be STRICTLY after the previous
matched step (ties do not advance the funnel — two step types sharing
one timestamp are simultaneous, not sequenced; stated, not implied).
Earliest-match semantics: step i matches at the MINIMUM timestamp
> t_{i-1}, which maximizes reachability (any valid chain implies the
greedy earliest chain is valid), so "n_users at step i" is exact, not
an artifact of match choice.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_horizon_s: int | None = None,
) -> DataFrame:
    """Count users reaching each funnel stage in order. Output one row
    per stage: ``(step_no, step, n_users)`` with step_no 1-based and
    n_users weakly decreasing (each stage requires the previous).

    ``step_horizon_s`` bounds each step's CONVERSION WINDOW: step i must
    land in ``(t_{i-1}, t_{i-1} + horizon]`` — per-STEP, not whole-chain
    (the windowFunnel convention is whole-chain; per-step composes the
    same greedy argument and keeps each stage a single aggregate).
    Timestamp arithmetic is exact integer microseconds, so the bound is
    hash-stable across engines. None = unbounded (pure ordering).
    Greedy-earliest stays exact under a horizon: matching step i as
    early as possible maximizes every later step's window.

    Scale shape: stage i is ONE user-keyed aggregate of the step-i
    event slice joined against the (≤|users|-row) stage-(i-1) frontier
    — min(ts > t_prev) per user. Every shuffle keys on ``user_col``
    (the events scan is filtered to one step type BEFORE its exchange,
    so each pass moves only that step's slice, and AQE sizes the
    frontier join; after the first exchange the frontiers are already
    co-partitioned). The per-stage results are ≤|users|-row frames
    whose counts union into a |steps|-row report — no unpartitioned
    window anywhere. Greedy-earliest is one aggregate per stage;
    a backtracking definition would need per-user event sorting
    (applyInPandas) for the same user set.

    Plan-shape caveat for LONG funnels: each frontier is a lazy chain,
    so stage i's branch re-derives stages 1..i-1 in the plan — O(k²)
    scans/joins for k steps (cheap at the registered k=3; the stage-1
    exchange is reused, but the per-stage joins replay). Past ~6 steps,
    localCheckpoint each frontier (the repo's iterative-operator rule:
    sssp_bounded/pagerank_int materialize per round) to keep the plan
    linear in k."""
    if not steps:
        raise ValueError("funnel_counts: steps must be non-empty")
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )
    out = [
        frontier.agg(
            F.lit(1).cast("long").alias("step_no"),
            F.lit(steps[0]).alias("step"),
            F.count(F.lit(1)).alias("n_users"),
        )
    ]
    for i, step in enumerate(steps[1:], start=2):
        staged = (
            events.filter(F.col(type_col) == step)
            .join(frontier, user_col)
            .filter(F.col(ts_col) > F.col("_t"))
        )
        if step_horizon_s is not None:
            staged = staged.filter(
                F.col(ts_col)
                <= F.col("_t") + F.expr(f"INTERVAL {step_horizon_s} SECONDS")
            )
        frontier = staged.groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        out.append(
            frontier.agg(
                F.lit(i).cast("long").alias("step_no"),
                F.lit(step).alias("step"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def session_paths(
    events: DataFrame,
    gap_s: int = 86400,
    path_len: int = 3,
    k: int = 20,
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-``k`` most frequent length-``path_len`` event-type paths
    within gap-based sessions (r8/r9 registration queue) — the
    path-mining complement of the funnel: the funnel counts a path YOU
    name, this surfaces the paths the data contains (the "behavior
    flow" view of every product-analytics suite). Output
    ``(path, n_paths, rnk)`` with ``path`` = '>'-joined types.

    Sessionization is gaps-and-islands (new session when the gap to the
    previous event exceeds ``gap_s``), deterministic on the
    (ts, event_id) total order; paths are sliding windows of
    consecutive events WITHIN a session (lead() chains — a path never
    crosses a session boundary). Gap comparison runs on exact integer
    microseconds. Top-k is the (count desc, path) total order — the
    bpe_merge_topk rule.

    Scale: two window passes partitioned by user / (user, session) —
    never global — over the one events scan, then a tiny |distinct
    paths|-row count aggregate (≤ |event types|^path_len);
    TakeOrderedAndProject for the cut."""
    us = F.unix_micros(F.col(ts_col))
    w_user = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    brk = (
        F.when(
            F.lag(us).over(w_user).isNull()
            | (us - F.lag(us).over(w_user) > F.lit(gap_s * 1_000_000)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_brk")
    )
    sess = events.select(
        user_col, ts_col, id_col, type_col, brk
    ).withColumn("_sess", F.sum("_brk").over(w_user))
    w_sess = Window.partitionBy(user_col, "_sess").orderBy(ts_col, id_col)
    hops = [F.col(type_col)] + [
        F.lead(type_col, i).over(w_sess) for i in range(1, path_len)
    ]
    paths = (
        sess.select(F.concat_ws(">", *hops).alias("path"), hops[-1].alias("_last"))
        .filter(F.col("_last").isNotNull())
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )
    top = paths.orderBy(F.col("n_paths").desc(), F.col("path")).limit(k)
    w_rank = Window.orderBy(F.col("n_paths").desc(), F.col("path"))
    return top.withColumn("rnk", F.row_number().over(w_rank).cast("long"))


def funnel_user_stages(
    events: DataFrame,
    steps: Sequence[str],
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    step_horizon_s: int | None = None,
) -> DataFrame:
    """Per-user funnel ADVANCE events: one row ``(user_id, step_no,
    step, ts_us)`` per stage each user reaches, at the greedy-earliest
    matched timestamp — the BATCH REPLAY of the online funnel
    (streaming/jobs.py::funnel_stage_stream and its
    transformWithState twin): with events arriving in event-time
    order, the stream's per-user fold emits exactly these rows
    (``_funnel_fold`` greedy-earliest ≡ the min(ts > t_prev) frontier
    chain — the property pinned by
    tests/test_r8_queue.py::test_funnel_fold_matches_exists_chain).
    ``funnel_counts`` is the per-stage DISTINCT-user count of this
    frame; this form keeps WHO advanced and WHEN, which the count
    report discards.

    Same strictness/horizon semantics as :func:`funnel_counts`
    (strict ts > t_prev; per-step ``(t_prev, t_prev + horizon]``
    window; exact integer-microsecond arithmetic — ts_us is
    unix_micros of the matched event).

    Scale: identical to funnel_counts — stage i is ONE user-keyed
    aggregate of the step-i slice joined to the ≤|users|-row previous
    frontier; the union of per-stage frontiers is |advances| rows.
    Same O(k²) lazy-plan caveat for long funnels."""
    if not steps:
        raise ValueError("funnel_user_stages: steps must be non-empty")
    frontier = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("_t"))
    )

    def emit(fr: DataFrame, i: int, step: str) -> DataFrame:
        return fr.select(
            F.col(user_col),
            F.lit(i).cast("long").alias("step_no"),
            F.lit(step).alias("step"),
            F.unix_micros(F.col("_t")).alias("ts_us"),
        )

    out = [emit(frontier, 1, steps[0])]
    for i, step in enumerate(steps[1:], start=2):
        staged = (
            events.filter(F.col(type_col) == step)
            .join(frontier, user_col)
            .filter(F.col(ts_col) > F.col("_t"))
        )
        if step_horizon_s is not None:
            staged = staged.filter(
                F.col(ts_col)
                <= F.col("_t") + F.expr(f"INTERVAL {step_horizon_s} SECONDS")
            )
        frontier = staged.groupBy(user_col).agg(F.min(ts_col).alias("_t"))
        out.append(emit(frontier, i, step))
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res


def session_pattern_matches(
    events: DataFrame,
    gap_s: int = 86400,
    pattern: str = "v[evsc]*c[evsc]*p",
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Regex event-pattern matching within gap sessions — the
    MATCH_RECOGNIZE-lite / CEP tier next to the funnel and path miner:
    the funnel counts ONE named step sequence with greedy matching,
    this evaluates an arbitrary REGULAR EXPRESSION over each session's
    full ordered type sequence (e.g. the default
    ``v[evsc]*c[evsc]*p`` = view, later click, later purchase with no
    intervening purchase — the "clean conversion path" pattern).

    Each session is rendered as a string of event-type INITIALS (the
    fixture's five types e/v/s/c/p are initial-distinct; a deployment
    with colliding types maps to an explicit alphabet first) in the
    (ts, event_id) total order, then counted with non-overlapping
    left-to-right regex semantics — identical in Spark (regexp_count)
    and DuckDB (len(regexp_extract_all)) for patterns over a literal
    alphabet. Output one row per MATCHING session:
    ``(user_id, session_start_us, n_events, n_matches)``.

    Scale: the sessionization is the session_paths discipline (two
    per-user window passes, never global); the sequence string lives
    per (user, session) row and is bounded by session length; the
    regex runs once per session row, JVM-side."""
    us = F.unix_micros(F.col(ts_col))
    w_user = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    brk = (
        F.when(
            F.lag(us).over(w_user).isNull()
            | (us - F.lag(us).over(w_user) > F.lit(gap_s * 1_000_000)),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("_brk")
    )
    w_proj = Window.partitionBy(user_col).orderBy("_us", "_eid")
    sess = events.select(
        user_col,
        us.alias("_us"),
        F.col(id_col).alias("_eid"),
        F.substring(F.col(type_col), 1, 1).alias("_ini"),
        brk,
    ).withColumn("_sess", F.sum("_brk").over(w_proj))
    per_session = sess.groupBy(user_col, "_sess").agg(
        F.min("_us").alias("session_start_us"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_us", "_eid", "_ini"))
                ),
                lambda x: x["_ini"],
            ),
            "",
        ).alias("_seq"),
    )
    return (
        per_session.withColumn(
            "n_matches", F.regexp_count(F.col("_seq"), F.lit(pattern)).cast("long")
        )
        .filter(F.col("n_matches") > 0)
        .select(user_col, "session_start_us", "n_events", "n_matches")
    )


def closed_sessions(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch replay of the ONLINE sessionizer's shared fold
    (streaming/jobs.py::_session_fold — the funnel_user_stages
    precedent: the same pure function the two streaming stateful APIs
    run, driven over the batch table in (ts, event_id) order per user,
    with end-of-input flushing the final open session). Because batch
    EOF closes everything, the output is EXACTLY the gaps-and-islands
    session report — ``(user_id, session_start_us, session_end_us,
    n_events)`` — so a plain SQL oracle hash-checks the fold itself,
    which the streaming drain (watermark-horizon sessions stay open)
    cannot do alone.

    Scale + the r10 rewrite: the first form was groupBy(user).
    applyInPandas — ONE Arrow group per key, the same ~10k-tiny-groups
    pandas overhead the rate_limit_decisions audit measured (the fold
    itself is microseconds per user). This form is the partition-run
    discipline (operators/ratelimit.py): shuffle ONCE on the key,
    sortWithinPartitions((user, ts, id)) gives contiguous per-user
    runs, and mapInPandas walks each partition's ordered Arrow batches
    slicing runs into the SAME shared fold — ~|partitions| Python
    invocations instead of ~|keys|; a run straddling an Arrow-batch
    boundary continues from carried state and every carried open
    session flushes at end-of-partition (batch EOF closes everything).
    State is the fold's 24 B per key."""
    import pandas as pd

    from kinesis_stream_video_project_spark.streaming.jobs import _session_fold

    gap_us = gap_s * 1_000_000

    def replay(batches):
        carry: dict[int, tuple] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            import numpy as np

            uids = pdf[user_col].to_numpy()
            ts = pdf["_ts_us"].to_numpy()
            cuts = (
                [0]
                + (np.flatnonzero(uids[1:] != uids[:-1]) + 1).tolist()
                + [len(uids)]
            )
            out_uid: list[int] = []
            out = []
            for a, b in zip(cuts[:-1], cuts[1:]):
                uid = int(uids[a])
                start, end, n = carry.pop(uid, (None, None, 0))
                start, end, n, emits = _session_fold(
                    start, end, n, gap_us, ts[a:b].tolist()
                )
                carry[uid] = (start, end, n)
                out_uid.extend([uid] * len(emits))
                out.extend(emits)
            yield pd.DataFrame(
                {
                    "user_id": out_uid,
                    "session_start_us": [e[0] for e in out],
                    "session_end_us": [e[1] for e in out],
                    "n_events": [e[2] for e in out],
                }
            )
        # batch EOF: flush every open session (the online form keys
        # this off the watermark; the batch replay closes at input end)
        flushed = [
            (uid, s, e, n) for uid, (s, e, n) in carry.items() if s is not None
        ]
        if flushed:
            yield pd.DataFrame(
                {
                    "user_id": [f[0] for f in flushed],
                    "session_start_us": [f[1] for f in flushed],
                    "session_end_us": [f[2] for f in flushed],
                    "n_events": [f[3] for f in flushed],
                }
            )

    staged = (
        events.select(
            F.col(user_col),
            F.unix_micros(F.col(ts_col)).alias("_ts_us"),
            F.col(id_col),
        )
        .repartition(F.col(user_col))
        .sortWithinPartitions(user_col, "_ts_us", id_col)
    )
    return staged.mapInPandas(
        replay,
        "user_id bigint, session_start_us bigint, session_end_us bigint, "
        "n_events bigint",
    )


def attribution_last_touch(
    events: DataFrame,
    conversion_type: str,
    channel_types: Sequence[str],
    horizon_s: int,
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Last-touch conversion attribution: every ``conversion_type`` event
    is credited to the user's most recent ``channel_types`` event
    STRICTLY before it (RANGE frame on epoch-µs — same-timestamp events
    are simultaneous, not sequenced; the funnel strictness rule) and
    within ``horizon_s``; conversions with no such touch credit the
    literal channel ``'none'``.

    Returns one row per channel (incl. ``'none'``):
    ``(channel, n_conversions, sum_value_milli)`` — the conversion
    value is summed as scaled-integer milli-units (the repo's exact-
    arithmetic discipline; double SUM is partition-order dependent).

    Determinism with timestamp ties AMONG touches: the winning touch
    time is ``MAX(us)`` over the frame (unique), and if several channel
    events share that winning µs the credited channel is
    ``min_by(channel, event_id)`` — pinned in tests with a crafted tie.

    Scale shape: one per-user window over epoch-µs (RANGE frame — no
    per-row self-join), one (user, us) touch-dedup aggregate, one join
    back on (user, att_us) where the touch side has already collapsed
    to at most one row per (user, us), then a |channels|-row aggregate.
    Everything shuffles on user_id; no global window.
    """
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long

    if conversion_type in channel_types:
        raise ValueError(
            "attribution_last_touch: conversion_type cannot also be a channel"
        )
    us = F.unix_micros(F.col(ts_col))
    is_channel = F.col(type_col).isin(list(channel_types))
    ev = events.select(
        F.col(user_col).alias("_u"),
        us.alias("_us"),
        F.col(type_col).alias("_ty"),
        F.col(id_col).alias("_id"),
        F.col(value_col).alias("_v"),
        is_channel.alias("_is_ch"),
    )
    touches = (
        ev.filter("_is_ch")
        .groupBy("_u", "_us")
        .agg(F.min_by("_ty", "_id").alias("channel"))
        .select(
            F.col("_u").alias("_tu"),
            F.col("_us").alias("_tus"),
            "channel",
        )
    )
    w = (
        Window.partitionBy("_u")
        .orderBy("_us")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    conv = (
        ev.withColumn("_att_us", F.max(F.when(F.col("_is_ch"), F.col("_us"))).over(w))
        .filter(F.col("_ty") == conversion_type)
        .withColumn(
            "_att_us",
            F.when(
                F.col("_us") - F.col("_att_us") <= horizon_s * 1_000_000,
                F.col("_att_us"),
            ),
        )
    )
    credited = conv.join(
        touches,
        (F.col("_u") == F.col("_tu")) & (F.col("_att_us") == F.col("_tus")),
        "left",
    ).select(
        F.coalesce(F.col("channel"), F.lit("none")).alias("channel"),
        scaled_long(F.col("_v"), 1000).alias("_vm"),
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.sum("_vm").cast("long").alias("sum_value_milli"),
    )
