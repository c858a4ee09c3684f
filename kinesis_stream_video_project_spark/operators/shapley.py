"""Exact Shapley-value attribution over observed coalitions (Shapley
1953; the marketing-attribution form of Zhao et al. 2018, "Shapley
Value Methods for Attribution Modeling in Online Advertising") — the
game-theoretic tier above the rule-based `attribution_channels`
(first/last/linear weight the OBSERVED path; Shapley weights each
channel by its marginal contribution across every coalition it could
have joined).

The repo's twist: everything stays EXACT until emission. The
characteristic function v(S) = #converted journeys whose touched-channel
set ⊆ S is an integer; the Shapley weight |S|!·(n−1−|S|)!/n! rides as an
integer numerator over the common denominator n!, so each channel's
value is the exact rational (phi_num, n!) and the driver hashes integers
plus one r4-rounded double — no float accumulates anywhere.

Scale contract (stated): the corpus-sized work is exactly two
aggregates — the per-user first-conversion and the per-user channel-mask
bit_or, both one shuffle on user_id. Everything after operates on the
mask HISTOGRAM (≤ 2^n rows, model-sized): the coalition lattice is
2^n × n rows built by crossJoin from a broadcast histogram, never
touching the corpus again. n is refused loudly above 12 (4096
coalitions) — beyond that the lattice itself stops being model-sized
and a sampling estimator (not this operator) is the right tool.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.numeric import r4


def shapley_attribution(masks: DataFrame, channels: list[str]) -> DataFrame:
    """Exact Shapley attribution from converted-journey channel masks.

    ``masks``: one row per CONVERTED journey, column ``mask`` (long) —
    bit i set iff ``channels[i]`` was touched before conversion (bit
    order IS the channel order, stated at the call site). v(S) counts
    journeys with mask ⊆ S, so v(full) = all conversions and v(∅) =
    conversions touched by no channel (unattributable; emitted, not
    hidden).

    Returns one row per channel: ``(channel, phi_num, phi_den, phi,
    n_conv, v_empty)`` with phi = phi_num / n! r4-rounded and the exact
    law Σ phi_num = n! · (v(full) − v(∅)) (pinned in tests).
    """
    n = len(channels)
    if not (1 <= n <= 12):
        raise ValueError(f"shapley_attribution supports 1..12 channels, got {n}")
    spark = masks.sparkSession
    full = (1 << n) - 1

    # In-plan refusal (ADVICE r11): a mask with bits at/above position n
    # is a subset of NO coalition — without this guard such journeys
    # silently vanish from n_conv and every phi instead of failing
    # loudly (the km_survival event-flag discipline).
    hist = (
        masks.select(F.col("mask").cast("long").alias("_m"))
        .select(
            F.when((F.col("_m") < 0) | (F.col("_m") > full), F.expr(
                f"raise_error('shapley_attribution: mask outside [0, 2^{n})')"
            ).cast("long")).otherwise(F.col("_m")).alias("_m")
        )
        .groupBy("_m")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # Coalition lattice: v(S) = Σ_{m ⊆ S} c(m), built from the broadcast
    # histogram — 2^n × |hist| pairs, model-sized by the n ≤ 12 refusal.
    coalitions = spark.range(full + 1).select(F.col("id").alias("_s"))
    v = (
        coalitions.join(
            F.broadcast(hist),
            hist["_m"].bitwiseAND(coalitions["_s"]) == hist["_m"],
            "left",
        )
        .groupBy("_s")
        .agg(F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("_v"))
    )

    # Integer Shapley weights over the common denominator n!: a coalition
    # of size pc contributes pc!·(n−1−pc)! to the channel joining it.
    den = math.factorial(n)
    w_cases = " ".join(
        f"WHEN {pc} THEN {math.factorial(pc) * math.factorial(n - 1 - pc)}"
        for pc in range(n)
    )
    chan_idx = F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("_i")
    without = (
        v.select("_s", "_v", chan_idx)
        .filter(F.expr("(shiftright(_s, _i) & 1) = 0"))
        .select(
            "_i",
            "_s",
            F.col("_v").alias("_v_without"),
            F.expr("_s + shiftleft(1L, _i)").alias("_s_with"),
            F.expr(f"CASE bit_count(_s) {w_cases} END").cast("long").alias("_w"),
        )
    )
    v_with = v.select(F.col("_s").alias("_s_with"), F.col("_v").alias("_v_with"))
    phi = (
        without.join(F.broadcast(v_with), "_s_with")
        .groupBy("_i")
        .agg(
            F.sum(F.col("_w") * (F.col("_v_with") - F.col("_v_without")))
            .cast("long")
            .alias("phi_num")
        )
    )

    totals = v.agg(
        F.max(F.when(F.col("_s") == full, F.col("_v"))).alias("_n_conv"),
        F.max(F.when(F.col("_s") == 0, F.col("_v"))).alias("_v_empty"),
    )
    name_cases = " ".join(
        f"WHEN {i} THEN '{ch}'" for i, ch in enumerate(channels)
    )
    return (
        phi.crossJoin(F.broadcast(totals))
        .select(
            F.expr(f"CASE _i {name_cases} END").alias("channel"),
            "phi_num",
            F.lit(den).cast("long").alias("phi_den"),
            r4(F.col("phi_num").cast("double") / F.lit(float(den))).alias("phi"),
            F.col("_n_conv").cast("long").alias("n_conv"),
            F.col("_v_empty").cast("long").alias("v_empty"),
        )
    )


def shapley_oracle_sql(mask_cte: str, channels: list[str]) -> str:
    """DuckDB replay of :func:`shapley_attribution` — ``mask_cte`` must
    be a complete ``WITH``-able SELECT producing one ``mask`` row per
    converted journey (same bit order). Generated, not hand-kept: the
    weight table and channel names come from the same Python constants
    as the Spark side."""
    n = len(channels)
    full = (1 << n) - 1
    den = math.factorial(n)
    w_cases = " ".join(
        f"WHEN {pc} THEN {math.factorial(pc) * math.factorial(n - 1 - pc)}"
        for pc in range(n)
    )
    name_cases = " ".join(
        f"WHEN {i} THEN '{ch}'" for i, ch in enumerate(channels)
    )
    return f"""
WITH journeys AS ({mask_cte}),
hist AS (SELECT mask AS m, COUNT(*) AS c FROM journeys GROUP BY 1),
v AS (
  SELECT s.s, CAST(COALESCE(SUM(h.c), 0) AS BIGINT) AS v
  FROM generate_series(0, {full}) AS s(s)
  LEFT JOIN hist h ON (h.m & s.s) = h.m
  GROUP BY 1
),
marg AS (
  SELECT i.i,
         CAST(CASE bit_count(CAST(v.s AS BIGINT)) {w_cases} END AS BIGINT)
           AS w,
         v.v AS v_without, vw.v AS v_with
  FROM v CROSS JOIN generate_series(0, {n - 1}) AS i(i)
  JOIN v vw ON vw.s = v.s + (1 << i.i)
  WHERE ((v.s >> i.i) & 1) = 0
),
phi AS (
  SELECT i, CAST(SUM(w * (v_with - v_without)) AS BIGINT) AS phi_num
  FROM marg GROUP BY 1
),
totals AS (
  SELECT MAX(CASE WHEN s = {full} THEN v END) AS n_conv,
         MAX(CASE WHEN s = 0 THEN v END) AS v_empty
  FROM v
)
SELECT CASE i {name_cases} END AS channel,
       phi_num,
       CAST({den} AS BIGINT) AS phi_den,
       (floor((CAST(phi_num AS DOUBLE) / {den}.0) * 10000.0 + 0.5)
        / 10000.0) AS phi,
       CAST(t.n_conv AS BIGINT) AS n_conv,
       CAST(t.v_empty AS BIGINT) AS v_empty
FROM phi, totals t
"""
