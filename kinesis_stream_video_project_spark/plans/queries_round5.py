"""Round-5 additions: curation budget gates and weighted sampling, bigram
LM counts, skew-proof twins, melt-over-aggregate, point-in-time SCD2
enrichment, linear interpolation, and a mergeable HLL rollup.

Cross-engine strategy per query (same discipline as rounds 2-4): ratios are
exactly-rounded IEEE double divisions of small integers (bit-identical in
Spark and DuckDB); budgets and counts stay in integer arithmetic
(``cum*10 <= total*6`` instead of a 0.6 float multiply); the bigram LM
emits rational (num, den) pairs instead of probabilities; the salted
surprisal twin hashes against the SAME oracle as its unsalted sibling
because salting is plan-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.functions.numeric import r4
from kinesis_stream_video_project_spark.functions.text import tokens
from kinesis_stream_video_project_spark.operators import sampling
from kinesis_stream_video_project_spark.operators.skew import salted_join
from kinesis_stream_video_project_spark.plans.queries_round4 import (
    SURPRISAL_ORACLE,
    scd2_user_status,
)
from kinesis_stream_video_project_spark.plans.registry import register


@register(
    "quality_percentile_gate",
    tags=("NS-curation", "O-16", "O-31"),
    oracle="""
WITH m AS (
  SELECT doc_id, source,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS diversity
  FROM documents
),
ranked AS (
  SELECT source, diversity,
         percent_rank() OVER (PARTITION BY source ORDER BY diversity) AS pr
  FROM m
)
SELECT source,
       CAST(COUNT(*) FILTER (WHERE pr >= 0.5) AS BIGINT) AS n_kept,
       (floor((MIN(diversity) FILTER (WHERE pr >= 0.5)) * 10000.0 + 0.5) / 10000.0) AS min_kept_diversity
FROM ranked
GROUP BY source
""",
)
def quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain percentile quality gate (the standard curation move:
    keep each source's top half by a quality metric, so no single domain
    is wiped out by a global threshold). Metric = lexical diversity
    (distinct/total tokens — an exactly-rounded double division, so both
    engines rank identically; percent_rank is tie-aware and therefore
    deterministic without a tiebreak column).

    Plan: one shuffle on source, one Window (percent_rank), one partial
    aggregate. The window partitions by source — bounded state per
    partition at any corpus size; a GLOBAL percentile gate would need the
    unpartitioned-window shape test_plan_properties forbids."""
    d = io.load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    m = d.select(
        "doc_id",
        "source",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "diversity"
        ),
    )
    w = Window.partitionBy("source").orderBy("diversity")
    ranked = m.select(
        "source", "diversity", F.percent_rank().over(w).alias("pr")
    )
    kept = F.col("pr") >= 0.5
    return ranked.groupBy("source").agg(
        F.count(F.when(kept, 1)).alias("n_kept"),
        r4(F.min(F.when(kept, F.col("diversity")))).alias("min_kept_diversity"),
    )


@register(
    "bigram_next_token",
    tags=("NS-curation", "O-31"),
    oracle="""
WITH t AS (
  SELECT string_split(text, ' ') AS toks FROM documents
),
b AS (
  SELECT unnest(list_zip(toks[1:len(toks)-1], toks[2:len(toks)])) AS bg
  FROM t WHERE len(toks) >= 2
),
counts AS (
  SELECT bg[1] AS cur, bg[2] AS nxt, CAST(COUNT(*) AS BIGINT) AS num
  FROM b GROUP BY 1, 2
),
totals AS (
  SELECT cur, CAST(SUM(num) AS BIGINT) AS den FROM counts GROUP BY cur
),
ranked AS (
  SELECT c.cur, c.nxt, c.num, t.den,
         row_number() OVER (PARTITION BY c.cur ORDER BY c.num DESC, c.nxt) AS rn
  FROM counts c JOIN totals t USING (cur)
)
SELECT cur, nxt, num, den FROM ranked WHERE rn = 1 AND den >= 50
""",
)
def bigram_next_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model argmax: for every leading token with >= 50
    bigram occurrences, the most probable next token as a RATIONAL
    (num, den) pair — the n-gram-LM statistics a data pipeline feeds into
    contamination scoring and boilerplate detection, kept in integers so
    both engines agree exactly (a probability double would hash-drift).

    Plan: bigrams are built INSIDE each row (slice + arrays_zip + explode
    — no per-doc window, no position join), then one count aggregate, one
    per-cur total, and a row_number argmax partitioned by cur. Zipf skew:
    the heavy aggregates both have map-side partial combine; the argmax
    window's per-partition row count is bounded by the distinct
    continuation vocabulary of one token, not the corpus."""
    d = io.load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    pairs = (
        d.filter(n >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1)
                )
            ).alias("bg")
        )
        .select(F.col("bg")["0"].alias("cur"), F.col("bg")["1"].alias("nxt"))
    )
    counts = pairs.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("num"))
    totals = counts.groupBy("cur").agg(F.sum("num").alias("den"))
    w = Window.partitionBy("cur").orderBy(F.col("num").desc(), F.col("nxt"))
    return (
        counts.join(totals, "cur")
        .withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("den") >= 50))
        .select("cur", "nxt", "num", "den")
    )


@register(
    "surprisal_score_salted",
    tags=("NS-curation", "O-31", "NS-skew"),
    oracle=SURPRISAL_ORACLE,
)
def surprisal_score_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof twin of ``surprisal_score``: the token -> document-
    frequency join is Zipf-skewed on exactly the hottest keys (stopwords),
    and tests/test_skew.py::test_token_join_skew_lever proves AQE's skew
    rule CANNOT split it (aggregate-above-shuffle child). This registers
    the documented lever as a driver-checked query: the join runs through
    operators/skew.py::salted_join (8 salts — the dfreq side is replicated
    8x, the token side's hot keys spread over 8 reducers), and the result
    hashes against the IDENTICAL oracle as the unsalted form because the
    per-doc sum is salt-invariant (integer terms, order-insensitive).

    This is the 100x-scale execution plan for the whole token-join family
    (rare_token_ratio, tfidf's idf join): same semantics, no hot reducer."""
    d = io.load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode_outer(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok").isNotNull())
    dfreq = (
        d.select(
            F.explode_outer(F.array_distinct(tokens(F.col("text")))).alias("tok")
        )
        .filter(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    joined = salted_join(toks, dfreq, "tok", "tok", n_salts=8).select(
        "doc_id", "df"
    )
    scored = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.expr("CAST(1000000000000 DIV df AS DECIMAL(38,0))")).alias("_s"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        r4(
            F.col("_s").cast("double") / F.col("n_tokens") / F.lit(1000000000000.0)
        ).alias("surprisal"),
    )


@register(
    "unpivot_priority_metrics",
    tags=("O-08", "O-27"),
    oracle="""
WITH agg AS (
  SELECT o_orderpriority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         CAST(COUNT(*) AS DOUBLE) AS n_orders
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, metric,
       (floor((value) * 10000.0 + 0.5) / 10000.0) AS value
FROM (
  SELECT o_orderpriority, 'sum_price' AS metric, sum_price AS value FROM agg
  UNION ALL
  SELECT o_orderpriority, 'n_orders', n_orders FROM agg
  UNION ALL
  SELECT o_orderpriority, 'avg_price', sum_price / n_orders FROM agg
)
""",
)
def unpivot_priority_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt over an AGGREGATE via the ``stack`` table generator: per-priority
    order metrics into (priority, metric, value) rows. Complements
    unpivot_part_metrics (queries_round3.py — ``.unpivot``/Expand over a raw
    scan): stack is the SQL-expression form of the same reshaping, and here
    the melt runs above a groupBy so derived metrics (avg = sum/count) melt
    alongside stored ones. Oracle is the engine-portable UNION ALL form.

    Exactness: the DECIMAL(18,2) sum is order-insensitive, cast to DOUBLE
    once; n_orders rides as a double so the long format has ONE value
    column type; avg divides the two doubles (exactly-rounded on both
    engines). Plan: one partial-combine aggregate on a 5-value key, then a
    width-3 Generate — no extra shuffle for the melt."""
    o = io.load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.count(F.lit(1)).cast("double").alias("n_orders"),
    )
    melted = agg.select(
        "o_orderpriority",
        F.expr(
            "stack(3, 'sum_price', sum_price, 'n_orders', n_orders,"
            " 'avg_price', sum_price / n_orders) AS (metric, value)"
        ),
    )
    return melted.select("o_orderpriority", "metric", r4(F.col("value")).alias("value"))


@register(
    "scd2_point_in_time",
    tags=("O-13", "O-16", "O-24"),
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type AS status, epoch_us(ts) AS ts_us, event_id,
         lag(event_type) OVER w AS prev_status
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, status, ts_us, event_id
  FROM ordered
  WHERE prev_status IS NULL OR status <> prev_status
),
intervals AS (
  SELECT user_id, status,
         ts_us AS valid_from_us,
         COALESCE(lead(ts_us) OVER w2 - 1, 9223372036854775807) AS valid_to_us
  FROM changes
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
probes AS (
  SELECT user_id, event_type, epoch_us(ts) - 3600000000 AS look_us FROM events
)
SELECT i.status AS past_status, p.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM probes p
JOIN intervals i
  ON p.user_id = i.user_id
 AND p.look_us BETWEEN i.valid_from_us AND i.valid_to_us
GROUP BY 1, 2
""",
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of instant) enrichment against the SCD2 dimension:
    for every event, look up the user's status AS OF one hour earlier by
    interval containment, and tabulate the (status-an-hour-ago, event-now)
    transition matrix. This is the query shape SCD2 tables exist for —
    'what did we believe about this entity when X happened' — and the
    interval-containment join (O-13) composed with the O-16 dimension
    build. Events whose lookback instant precedes the user's first
    interval have no as-of truth and drop out (inner join).

    Plan: the dimension reuses scd2_user_status (one user_id exchange, two
    windows); the containment join is an EQUI-join on user_id with the
    BETWEEN as a join filter — per-user interval lists are bounded by that
    user's status-change count, so the per-key fan-out stays small at any
    corpus size (this is NOT a theta-only join; the equi key carries the
    shuffle)."""
    iv = scd2_user_status(spark, sf_dir).select(
        "user_id",
        F.col("status").alias("past_status"),
        "valid_from_us",
        F.coalesce(
            F.col("valid_to_us"), F.lit(9223372036854775807)
        ).alias("valid_to_us"),
    )
    e = io.load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        (F.unix_micros("ts") - F.lit(3600000000)).alias("look_us"),
    )
    return (
        e.join(
            iv,
            (e["user_id"] == iv["user_id"])
            & F.col("look_us").between(
                F.col("valid_from_us"), F.col("valid_to_us")
            ),
        )
        .groupBy("past_status", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "linear_interpolate_value",
    tags=("O-16", "O-24", "NS-quality"),
    oracle="""
WITH base AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
         CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
  FROM events
),
nb AS (
  SELECT event_id, user_id, ts_us, v,
         last_value(v IGNORE NULLS) OVER wp AS prev_v,
         last_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS) OVER wp AS prev_t,
         first_value(v IGNORE NULLS) OVER wn AS next_v,
         first_value(CASE WHEN v IS NOT NULL THEN ts_us END IGNORE NULLS) OVER wn AS next_t
  FROM base
  WINDOW wp AS (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id, (v IS NULL) AS was_missing,
       (floor((CASE
          WHEN v IS NOT NULL THEN v
          WHEN prev_v IS NOT NULL AND next_v IS NOT NULL AND next_t <> prev_t
            THEN prev_v + (next_v - prev_v)
                 * (CAST(ts_us - prev_t AS DOUBLE) / CAST(next_t - prev_t AS DOUBLE))
          ELSE NULL END) * 10000.0 + 0.5) / 10000.0) AS filled
FROM nb
""",
)
def linear_interpolate_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key linear interpolation of a gappy metric series — the
    time-series repair step between forward-fill (fill_forward_last_purchase
    carries the LAST value) and model imputation: a missing reading is
    reconstructed proportionally between its nearest non-null neighbors in
    event time. Missingness is synthesized deterministically (error events
    carry no reading); series edges (no neighbor on one side) stay null
    rather than extrapolating.

    Exactness: the interpolation is a fixed dag of IEEE double ops
    (sub/div/mul/add) over epoch-µs integers and stored doubles — each op
    is exactly rounded, so both engines produce bit-identical results,
    then r4 once at the end. Plan: ONE shuffle on user_id; both
    neighbor-scan frames (backward last_value, forward first_value — both
    IGNORE NULLS) and the projection reuse the same partitioning, the
    standard bounded-state window shape at any key cardinality."""
    e = io.load_table(spark, sf_dir, "events")
    base = e.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(F.col("event_type") != "error", F.col("value")).alias("v"),
    )
    order = [F.col("ts_us"), F.col("event_id")]
    wp = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_if_v = F.when(F.col("v").isNotNull(), F.col("ts_us"))
    nb = base.select(
        "event_id",
        "user_id",
        "ts_us",
        "v",
        F.last("v", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(t_if_v, ignorenulls=True).over(wp).alias("prev_t"),
        F.first("v", ignorenulls=True).over(wn).alias("next_v"),
        F.first(t_if_v, ignorenulls=True).over(wn).alias("next_t"),
    )
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (
        (F.col("ts_us") - F.col("prev_t")).cast("double")
        / (F.col("next_t") - F.col("prev_t")).cast("double")
    )
    filled = F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
        F.when(
            F.col("prev_v").isNotNull()
            & F.col("next_v").isNotNull()
            & (F.col("next_t") != F.col("prev_t")),
            interp,
        )
    )
    return nb.select(
        "event_id",
        "user_id",
        F.col("v").isNull().alias("was_missing"),
        r4(filled).alias("filled"),
    )


@register(
    "hll_merge_rollup",
    tags=("O-09", "O-33"),
    oracle="""
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_groups,
       TRUE AS groups_within_5pct,
       TRUE AS merged_within_5pct
""" + "FROM events",
)
def hll_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup (the property that makes sketches matter at
    100 TB): per-event-type Datasketches HLL sketches of the user set,
    UNIONED into a global cardinality estimate WITHOUT re-scanning the
    fact table — the two-level rollup a warehouse serves per-segment and
    global uniques from one sketch store. approx_count_distinct can't do
    this (its HLL++ partials aren't exposed); ``hll_sketch_agg`` /
    ``hll_union_agg`` are the composable form.

    Sketch estimates are engine-specific, so (approx_distinct's pattern)
    the tolerance claim IS the hashed output: every per-group estimate and
    the merged estimate must land within 5% of the exact counts (measured
    <=2% at sf0.001-0.1; Datasketches HLL is deterministic for fixed
    data). The exact global count rides along as a broadcast 1-row join.

    Plan: one partial-combine sketch aggregate on event_type, a 5-row
    sketch union, and the exact-distinct aggregate — the exact side exists
    only to ground the claim; production keeps just the sketch path."""
    e = io.load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("ex"),
    )
    g = per.select(
        "sk",
        "ex",
        F.hll_sketch_estimate("sk").alias("est"),
    )
    summary = g.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min(
            F.abs(F.col("est") - F.col("ex"))
            <= F.lit(0.05) * F.col("ex")
        ).alias("groups_within_5pct"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("_merged"),
    )
    exact = e.agg(F.countDistinct("user_id").alias("exact_users"))
    return summary.crossJoin(F.broadcast(exact)).select(
        "exact_users",
        "n_groups",
        "groups_within_5pct",
        (
            F.abs(F.col("_merged") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("merged_within_5pct"),
    )


@register(
    "nucleus_budget_filter",
    tags=("NS-curation", "O-16"),
    oracle="""
WITH m AS (
  SELECT doc_id, source, n_chars,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS diversity
  FROM documents
),
c AS (
  SELECT source, n_chars,
         SUM(n_chars) OVER (PARTITION BY source ORDER BY diversity DESC, doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(n_chars) OVER (PARTITION BY source) AS total
  FROM m
)
SELECT source,
       CAST(COUNT(*) FILTER (WHERE cum * 10 <= total * 6) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(n_chars) FILTER (WHERE cum * 10 <= total * 6), 0) AS BIGINT) AS chars_kept,
       CAST(MAX(total) AS BIGINT) AS total_chars
FROM c
GROUP BY source
""",
)
def nucleus_budget_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget curation (nucleus-style): each source contributes its
    best documents (by lexical diversity) until 60% of that source's
    character budget is spent — how a mixture is downsampled to a target
    token budget without letting one domain starve the others. The 60%
    cut is INTEGER arithmetic (``cum*10 <= total*6``) — no float multiply
    to drift between engines; ordering is (diversity DESC, doc_id), a
    total order, so the running sum is deterministic.

    Plan: ONE shuffle on source serves both window frames (running sum
    and partition total — same partition key) and the final aggregate;
    per-source window state is bounded by the source's row count, the
    same partitioned-window scale shape as quality_percentile_gate."""
    d = io.load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    m = d.select(
        "doc_id",
        "source",
        "n_chars",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "diversity"
        ),
    )
    w_cum = (
        Window.partitionBy("source")
        .orderBy(F.col("diversity").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("source")
    c = m.select(
        "source",
        "n_chars",
        F.sum("n_chars").over(w_cum).alias("cum"),
        F.sum("n_chars").over(w_tot).alias("total"),
    )
    kept = F.col("cum") * 10 <= F.col("total") * 6
    return c.groupBy("source").agg(
        F.count(F.when(kept, 1)).alias("n_kept"),
        F.coalesce(F.sum(F.when(kept, F.col("n_chars"))), F.lit(0))
        .cast("long")
        .alias("chars_kept"),
        F.max("total").cast("long").alias("total_chars"),
    )


@register(
    "quality_weighted_sample",
    tags=("NS-sampling", "NS-curation", "O-04"),
    oracle="""
WITH m AS (
  SELECT doc_id, source,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS w
  FROM documents
),
k AS (
  SELECT source, w,
         ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT % 10000)
            < w * 10000.0) AS kept
  FROM m
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE kept) AS BIGINT) AS n_kept,
       (floor((SUM(w)) * 10000.0 + 0.5) / 10000.0) AS expected_kept
FROM k
GROUP BY source
""",
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-PROPORTIONAL deterministic sampling (the soft alternative to
    quality_percentile_gate's hard cut): each document is kept with
    probability equal to its lexical-diversity score via
    operators/sampling.py::weighted_sample — hash-bucket arithmetic both
    engines compute bit-identically, so even the per-row keep decisions
    hash-match (no tolerance claim needed; expected_kept = sum of weights
    rides along to show the realized rate tracks the expectation).

    This is how a mixture keeps SOME low-quality text (diversity of
    distribution) instead of amputating the tail: the standard soft-
    filtering move in large-corpus curation. Plan: scan → per-row integer
    hash compare → one partial-combine aggregate; no shuffle beyond the
    5-row-per-source agg, no rand(), reproducible on re-ingestion."""
    d = io.load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    m = d.select(
        "doc_id",
        "source",
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias(
            "w"
        ),
    )
    kept = sampling.weighted_sample(m, "doc_id", F.col("w"))
    n_kept = (
        kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    )
    totals = m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        r4(F.sum("w")).alias("expected_kept"),
    )
    return totals.join(n_kept, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        "expected_kept",
    )
