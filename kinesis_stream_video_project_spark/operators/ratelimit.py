"""Per-key token-bucket rate limiting — admission decisions over an
event stream.

The classic ingestion-control stateful operator (the token bucket of
every API gateway and stream processor; the reference throttles its
restart loop with fixed cooldowns — `restart.sh`'s sleep/cooldown
constants are the degenerate 1-token bucket): each key holds a bucket
of ``capacity`` tokens refilling at ``refill_tokens`` tokens every
``per_seconds`` seconds (a ratio, so sub-1/s rates — the realistic
regime for hours-scale event gaps — stay exact integers); an
event is ADMITTED if the bucket holds ``cost`` tokens (which it then
spends) and REJECTED otherwise — rejected events do NOT spend tokens.

Exactness: the fold is ALL-INTEGER in token-microseconds — the bucket
level is ``tokens_us`` (tokens scaled by 10^6), refill is
``(Δus · refill_tokens) div per_seconds`` (truncating integer division,
identical in Spark and DuckDB), the cap is
``capacity · 10^6`` and the spend ``cost · 10^6`` — so the decision
sequence is a deterministic function of the (ts, event_id)-ordered
event sequence with no float anywhere (the CUSUM all-integer-recursion
rule), replayable by a recursive-CTE SQL oracle and shared verbatim by
BOTH streaming stateful APIs (the `_funnel_fold` discipline: one pure
fold, three carriers).

State per key: two BIGINTs (tokens_us, last_us) — 16 B forever, the
same bound as the funnel. A first-seen key starts with a FULL bucket
at its first event (stated; an empty-start would reject every cold
key for capacity/rate seconds).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def token_bucket_fold(
    tokens_us: int,
    last_us: int,
    rows: list,
    refill_tokens: int,
    per_seconds: int,
    capacity_tokens: int,
    cost_tokens: int = 1,
) -> tuple[int, int, list]:
    """Pure fold shared by the batch replay and both stream forms.

    ``rows`` is ``[(ts_us, event_id)]`` ALREADY sorted by (ts_us,
    event_id); ``last_us < 0`` marks a fresh key (bucket starts full at
    the first event). Returns ``(tokens_us', last_us', emits)`` with
    one emit ``(ts_us, event_id, admitted, tokens_us_after)`` per row.
    A same-timestamp burst refills zero and drains the bucket one cost
    at a time — the intra-timestamp order is the (ts, event_id) total
    order, stated not implied."""
    cap_us = capacity_tokens * SCALE
    cost_us = cost_tokens * SCALE
    emits = []
    for ts_us, event_id in rows:
        if last_us < 0:
            tokens_us = cap_us
        else:
            gained = ((ts_us - last_us) * refill_tokens) // per_seconds
            tokens_us = min(cap_us, tokens_us + gained)
        last_us = ts_us
        admitted = tokens_us >= cost_us
        if admitted:
            tokens_us -= cost_us
        emits.append((ts_us, event_id, admitted, tokens_us))
    return tokens_us, last_us, emits


_OUT_SCHEMA = (
    "user_id long, ts_us long, event_id long, admitted boolean, "
    "tokens_us_after long"
)


def rate_limit_decisions(
    events: DataFrame,
    refill_tokens: int = 1,
    per_seconds: int = 14400,
    capacity_tokens: int = 2,
    cost_tokens: int = 1,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch replay: every event's admission decision and post-decision
    bucket level, per key in (ts, event_id) order — the offline form of
    the online limiter (what-would-the-gateway-have-done over a
    historical table; capacity planning runs exactly this query with
    candidate (rate, capacity) pairs).

    Scale: ONE applyInPandas pass per key group — the watchdog replay
    shape; state is two ints however long the history, and the fold is
    the same function the streams run, so batch ≡ stream by
    construction (and pinned in tests)."""

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_ts_us", id_col])
        uid = int(pdf[user_col].iloc[0])
        rows = list(
            zip(pdf["_ts_us"].astype("int64"), pdf[id_col].astype("int64"))
        )
        _t, _l, emits = token_bucket_fold(
            0, -1, rows, refill_tokens, per_seconds, capacity_tokens,
            cost_tokens,
        )
        return pd.DataFrame(
            {
                "user_id": [uid] * len(emits),
                "ts_us": [e[0] for e in emits],
                "event_id": [e[1] for e in emits],
                "admitted": [e[2] for e in emits],
                "tokens_us_after": [e[3] for e in emits],
            }
        )

    staged = events.select(
        F.col(user_col),
        F.unix_micros(F.col(ts_col)).alias("_ts_us"),
        F.col(id_col),
    )
    return staged.groupBy(user_col).applyInPandas(replay, _OUT_SCHEMA)
