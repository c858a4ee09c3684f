"""Round-15 queue module — PRE-WIRED, NOT YET REGISTERED (the
queries_round11/12/13/14 discipline: built, oracle-validated at 3 SFs,
lockstep-tested every round, registered when a driver window has
slots). Wiring is the five-place rule: :func:`register_all` from
``registry._load_all`` + DRIVER_PRIORITY splice +
DRIVER_PRIORITY_BUILT_FROM bump + bench rotation + QUERIES.md
regeneration, one commit.

Queries built in round 11 (continuation session):

* ``shapley_channel_attribution`` — exact Shapley-value attribution of
  conversions to the four non-purchase event channels, the
  game-theoretic tier above the rule-based ``attribution_channels``
  (first/last/linear): each channel is credited its exact average
  marginal contribution across all coalitions, as the rational
  (phi_num, 4!) plus one r4 double (`operators/shapley.py`).
* ``ams_f2_partkey`` — AMS tug-of-war sketch estimate of lineitem's
  part-key second frequency moment next to the exact F₂ (the
  measured-error discipline), completing the sketch shelf: F₀ (HLL/KMV),
  point frequency (CMS), top-k (Space-Saving), now F₂
  (`operators/ams.py`).
* ``perm_test_weekly_revenue`` — md5-deterministic two-sample
  permutation test of URGENT-vs-LOW mean weekly revenue; the test
  statistic rides as the exact integer |sum_A·n_B − sum_B·n_A|
  (`operators/bootstrap.py::permutation_test_means`).
* ``welch_t2_weekly_revenue`` — pairwise Welch t² + Welch–Satterthwaite
  df over the same weekly ledger (exact decimal moments, one fixed IEEE
  expression; `operators/stats.py::welch_t2_pairs`).
* ``itemitem_cosine_recs`` — item-item collaborative filtering: top-5
  cosine²-ranked neighbor parts for the 20 most-ordered parts, from
  basket co-occurrence (the per-item recommendation surface above the
  global ``copurchase_lift_pairs``).
* ``hw_daily_revenue`` — additive Holt-Winters (level + trend +
  period-7 seasonal), the seasonal tier above the r14 Holt smoother;
  all-integer recursion with the seasonal vector riding a rotating
  7-list through the recursive-CTE oracle
  (`operators/forecast.py::holt_winters`).
* ``hw_backtest_skill`` — one-step MAE of Holt-Winters vs the
  seasonal-naive baseline (the MASE discipline); measured ≈1.1 on the
  non-seasonal fixture, stated, with the beats-naive regime pinned on a
  truly seasonal series in tests.
* ``km_user_tenure_by_segment`` — Kaplan-Meier product-limit survival
  curves of user tenure under right censoring (12 h inactivity rule,
  chosen by measurement), a new analysis family
  (`operators/survival.py`).
* ``hilbert_locality_audit`` — three-way Hilbert/Z-order/row-major
  read-amplification audit; measured finding: Hilbert ties Morton
  exactly at power-of-two block granularity (aligned-quadrant
  equivalence), so the audit's decision value is refusing the encode
  cost (`operators/layout.py::curve_locality_audit`).
* ``markov_transition_matrix`` — Laplace-smoothed first-order Markov
  P(next | prev) over per-user event sequences as exact rationals, the
  probability tier above the r6-green event_transitions counts.
* ``markov_backtest_accuracy`` — temporal-holdout (80/20) top-1
  accuracy of the Markov predictor NEXT TO the majority-class baseline
  (the hw_backtest_skill discipline applied to a sequence model).
* ``logrank_tenure_by_segment`` — log-rank χ² of each segment's tenure
  survival vs the rest (Mantel 1966), the hypothesis-test companion of
  the KM curves; fixed-order float accumulation over exact integer
  hypergeometric terms (`operators/survival.py::logrank_vs_rest`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators.shapley import (
    shapley_attribution,
    shapley_oracle_sql,
)

_CHANNELS = ["click", "view", "signup", "error"]
_BIT_CASE = (
    "CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 "
    "WHEN 'signup' THEN 4 WHEN 'error' THEN 8 END"
)


def _conversion_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One channel-mask row per CONVERTED user: bits for the distinct
    non-purchase event types seen STRICTLY before the user's first
    purchase (ties at the purchase instant excluded — stated); users who
    purchased with no prior touches keep mask 0 (the unattributable
    cohort, surfaced as v_empty)."""
    events = io.load_table(spark, sf_dir, "events")
    first_purchase = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("_pts"))
    )
    touch_masks = (
        events.filter(F.col("event_type") != "purchase")
        .join(first_purchase, "user_id")
        .filter(F.col("ts") < F.col("_pts"))
        .groupBy("user_id")
        .agg(F.bit_or(F.expr(_BIT_CASE)).alias("_m"))
    )
    return first_purchase.join(touch_masks, "user_id", "left").select(
        F.coalesce(F.col("_m"), F.lit(0)).cast("long").alias("mask")
    )


def _shapley_channel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley conversion attribution (X-197): the two corpus-sized
    stages are the first-purchase and mask aggregates (one user_id
    shuffle each); the coalition lattice is 16×4 rows from a broadcast
    histogram. Bit order = _CHANNELS order, stated once here and
    generated into BOTH engines from the same constants."""
    return shapley_attribution(_conversion_masks(spark, sf_dir), _CHANNELS)


_MASK_CTE = f"""
SELECT CAST(COALESCE(t.m, 0) AS BIGINT) AS mask
FROM (SELECT user_id, MIN(ts) AS pts FROM events
      WHERE event_type = 'purchase' GROUP BY 1) p
LEFT JOIN (
  SELECT e.user_id, bit_or({_BIT_CASE.replace("event_type", "e.event_type")}) AS m
  FROM events e
  JOIN (SELECT user_id, MIN(ts) AS pts FROM events
        WHERE event_type = 'purchase' GROUP BY 1) fp
    ON fp.user_id = e.user_id
  WHERE e.event_type <> 'purchase' AND e.ts < fp.pts
  GROUP BY 1
) t ON t.user_id = p.user_id
"""


def _ams_f2_partkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS F₂ sketch vs exact (X-198): 16 tug-of-war registers over
    lineitem.l_partkey — the sketch pass is one aggregate whose shuffle
    moves 16 integers; the exact companion is the one groupBy. Measured
    est/exact at the fixtures (block-digest family, r12): 1.21
    (sf0.001), 0.61 (sf0.01), 0.89 (sf0.1) — inside the √(2/16) ≈ 35%
    relative-sd regime, carried as a hashed column."""
    from kinesis_stream_video_project_spark.operators.ams import ams_f2_report

    return ams_f2_report(io.load_table(spark, sf_dir, "lineitem"), "l_partkey")


def _weekly_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weekly revenue-cents ledger shared with the r14 Theil–Sen and
    bootstrap tiers: (grp=priority, x=epoch-week, y=exact cents)."""
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long

    orders = io.load_table(spark, sf_dir, "orders")
    return orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') DIV 7"
        ).alias("x"),
    ).agg(F.sum(scaled_long(F.col("o_totalprice"), 100)).alias("y"))


_WEEKLY_CTE = """
SELECT o_orderpriority AS grp,
       CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 7
            AS BIGINT) AS x,
       SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
FROM orders GROUP BY 1, 2
"""


def _perm_test_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation test (X-199): does 1-URGENT's mean weekly revenue
    differ from 5-LOW's beyond label exchange? B=200 md5-deterministic
    relabelings of the pooled weekly ledger."""
    from kinesis_stream_video_project_spark.operators.bootstrap import (
        permutation_test_means,
    )

    return permutation_test_means(
        _weekly_ledger(spark, sf_dir), "1-URGENT", "5-LOW"
    )


def _welch_t2_weekly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch t² + Welch–Satterthwaite df (X-200) for all 10 priority
    pairs over the weekly ledger — the parametric two-sample tier next
    to the permutation/MWU/KS/χ² shelf."""
    from kinesis_stream_video_project_spark.operators.stats import welch_t2_pairs

    return welch_t2_pairs(_weekly_ledger(spark, sf_dir))


def _itemitem_cosine_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (X-201): for each of the 20
    most-ordered parts, the top-5 neighbor parts by basket-cosine²
    co(i,j)²/(n_i·n_j), co >= 2. Candidate pairs come only from
    within-basket co-occurrence (baskets are order-bounded, ≤ 7 items,
    so the pair stage is |orders|·21 rows max — never all-pairs);
    ranking is a double computed from exact integers by one fixed
    expression, ties broken on the neighbor key."""
    from pyspark.sql import Window

    # The distinct basket projection has three consumers but is itself
    # corpus-sized (~|lineitem| rows): a localCheckpoint stage was
    # MEASURED SLOWER (3.1 → 3.7 s warm sf0.1) than recomputing the
    # cheap scan+dedup — the round-8 multi-consumer rule's boundary
    # (stage the SMALLEST projection only when it is small).
    li = (
        io.load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("_o"), F.col("l_partkey").alias("_p"))
        .distinct()
    )
    n_per_part = li.groupBy("_p").agg(F.count(F.lit(1)).alias("_n"))
    seeds = (
        n_per_part.orderBy(F.col("_n").desc(), F.col("_p"))
        .limit(20)
        .select(F.col("_p").alias("_seed"), F.col("_n").alias("_n_seed"))
    )
    a = li.select(F.col("_o"), F.col("_p").alias("_pa"))
    b = li.select(F.col("_o"), F.col("_p").alias("_pb"))
    # Only pairs whose LEFT part is one of the 20 seeds ever survive the
    # downstream seeds join, and the seed set is independent of the pair
    # counts — so the broadcast seed filter goes BELOW the self-join and
    # the co-occurrence aggregate counts ~seeds/|parts| of the basket
    # pairs instead of all of them (r14 optimization round: 3.84 s ->
    # 1.53 s warm min-of-5 interleaved at sf0.1, identical output; the
    # guide's pre-filter-the-big-side-before-the-shuffle rule).
    a_seed = a.join(
        F.broadcast(seeds.select(F.col("_seed").alias("_pa"))), "_pa"
    )
    co = (
        a_seed.join(b, "_o")
        .filter(F.col("_pa") != F.col("_pb"))
        .groupBy("_pa", "_pb")
        .agg(F.count(F.lit(1)).alias("_co"))
        .filter(F.col("_co") >= 2)
    )
    scored = (
        co.join(F.broadcast(seeds), co["_pa"] == seeds["_seed"])
        .join(
            n_per_part.select(
                F.col("_p").alias("_pb2"), F.col("_n").alias("_n_nbr")
            ),
            F.col("_pb") == F.col("_pb2"),
        )
        .select(
            F.col("_seed").alias("seed_part"),
            F.col("_pb").alias("nbr_part"),
            F.col("_co").alias("co_orders"),
            F.col("_n_seed").alias("n_seed"),
            F.col("_n_nbr").alias("n_nbr"),
            (
                (F.col("_co") * F.col("_co")).cast("double")
                / (F.col("_n_seed") * F.col("_n_nbr")).cast("double")
            ).alias("_cos2"),
        )
    )
    w = Window.partitionBy("seed_part").orderBy(
        F.col("_cos2").desc(), F.col("nbr_part")
    )
    from kinesis_stream_video_project_spark.functions.numeric import r4

    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "seed_part",
            "nbr_part",
            "co_orders",
            "n_seed",
            "n_nbr",
            r4(F.col("_cos2")).alias("cos2"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


_ITEMITEM_ORACLE = """
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
n_per AS (SELECT p, COUNT(*) AS n FROM li GROUP BY 1),
seeds AS (
  SELECT p AS seed, n AS n_seed FROM n_per ORDER BY n DESC, p LIMIT 20
),
co AS (
  SELECT a.p AS pa, b.p AS pb, COUNT(*) AS co
  FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
scored AS (
  SELECT s.seed AS seed_part, co.pb AS nbr_part,
         co.co AS co_orders, s.n_seed, np.n AS n_nbr,
         (CAST(co.co * co.co AS DOUBLE)
          / CAST(s.n_seed * np.n AS DOUBLE)) AS cos2
  FROM co JOIN seeds s ON co.pa = s.seed
  JOIN n_per np ON np.p = co.pb
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY seed_part ORDER BY cos2 DESC, nbr_part) AS rank
  FROM scored
)
SELECT seed_part, nbr_part,
       CAST(co_orders AS BIGINT) AS co_orders,
       CAST(n_seed AS BIGINT) AS n_seed,
       CAST(n_nbr AS BIGINT) AS n_nbr,
       (floor(cos2 * 10000.0 + 0.5) / 10000.0) AS cos2,
       CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 5
"""


def _daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily revenue-cents series shared with holt_daily_revenue:
    (grp=priority, step=dense 1-based day order, xs=exact cents)."""
    from pyspark.sql import Window

    from kinesis_stream_video_project_spark.functions.numeric import scaled_long

    orders = io.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_orderdate").alias("_day"),
    ).agg(F.sum(scaled_long(F.col("o_totalprice"), 100)).alias("xs"))
    return daily.select(
        "grp",
        F.row_number()
        .over(Window.partitionBy("grp").orderBy("_day"))
        .cast("long")
        .alias("step"),
        "xs",
    )


_DAILY_SERIES_CTE = """
daily AS (
  SELECT o_orderpriority AS grp, o_orderdate AS day,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS xs
  FROM orders GROUP BY 1, 2
),
series AS (
  SELECT grp,
         CAST(row_number() OVER (PARTITION BY grp ORDER BY day) AS BIGINT)
           AS step,
         CAST(xs AS BIGINT) AS xs
  FROM daily
)
"""


def _hw_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (X-202): level + trend + period-7 seasonal
    over the daily revenue series per priority — the seasonal tier above
    the r14 Holt smoother, same all-integer discipline. Period runs over
    the series index (stated in hw_fold)."""
    from kinesis_stream_video_project_spark.operators.forecast import holt_winters

    return holt_winters(_daily_series(spark, sf_dir))


def _hw_backtest_skill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast skill (X-203): one-step MAE of Holt-Winters vs the
    seasonal-naive baseline x̂_{t+1} = x_{t+1−7} on the same series —
    the MASE discipline (Hyndman & Koehler 2006): a seasonal forecaster
    that cannot beat seasonal-naive is decoration. skill = Σ|e_hw| /
    Σ|e_naive| as one double from exact integer sums, r4 at emission.

    Measured on the fixture: skill ≈ 1.09–1.12 at every SF — the
    synthetic daily series has NO true weekly cycle, so seasonal-naive
    is already at the noise floor and HW's smoothing lag costs ~10%.
    Stated, not hidden (on a genuinely seasonal series the fold beats
    naive — pinned in tests/test_r15_queue.py); the metric existing is
    what makes that an observation instead of a hope.

    Exhaustive fixture probe (r12, VERDICT r11 item 4): NO fixture
    series has exploitable seasonality at ANY period — hourly event
    counts per type give m=24 skill 1.03–1.13 and m=7 skill 1.01–1.08
    at sf0.1; daily order count / lineitem quantity / event count give
    m=7 skill 1.06–1.13; the generator's day-of-week histogram is flat
    (21.2k–21.9k orders per weekday) and its hour-of-day histogram is
    flat (4.2k–4.4k events per hour). A <1.0 skill regime on driver
    data is therefore impossible by construction, and this row
    honestly shows the naive baseline winning — the beats-naive regime
    stays pinned on the synthetic seasonal series in the test suite."""
    from kinesis_stream_video_project_spark.functions.numeric import r4
    from kinesis_stream_video_project_spark.operators.forecast import holt_winters

    series = _daily_series(spark, sf_dir)
    fc = holt_winters(series).select(
        "grp", (F.col("step") + 1).alias("step"), "forecast_next"
    )
    naive = series.select(
        "grp", (F.col("step") + 7).alias("step"), F.col("xs").alias("_xn")
    )
    evals = (
        series.join(fc, ["grp", "step"])
        .join(naive, ["grp", "step"])
        .select(
            "grp",
            F.abs(F.col("xs") - F.col("forecast_next")).alias("_ehw"),
            F.abs(F.col("xs") - F.col("_xn")).alias("_env"),
        )
    )
    return evals.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_evals"),
        F.expr("SUM(_ehw) DIV COUNT(*)").cast("long").alias("mae_hw"),
        F.expr("SUM(_env) DIV COUNT(*)").cast("long").alias("mae_naive"),
        F.when(
            F.sum("_env") > 0,
            r4(F.sum("_ehw").cast("double") / F.sum("_env").cast("double")),
        ).alias("skill"),
    )


def _hw_oracle() -> str:
    from kinesis_stream_video_project_spark.operators.forecast import (
        HW_ORACLE_WALK,
    )

    return (
        "WITH RECURSIVE "
        + _DAILY_SERIES_CTE.strip()
        + ",\n"
        + HW_ORACLE_WALK.strip()
        + "\nSELECT grp, step, level_s, trend_s, season_s, forecast_next FROM hw"
    )


def _hw_backtest_oracle() -> str:
    from kinesis_stream_video_project_spark.operators.forecast import (
        HW_ORACLE_WALK,
    )

    return (
        "WITH RECURSIVE "
        + _DAILY_SERIES_CTE.strip()
        + ",\n"
        + HW_ORACLE_WALK.strip()
        + """,
evals AS (
  SELECT h.grp,
         ABS(s.xs - h.forecast_next) AS e_hw,
         ABS(s.xs - p.xs) AS e_nv
  FROM hw h
  JOIN series s ON s.grp = h.grp AND s.step = h.step + 1
  JOIN series p ON p.grp = h.grp AND p.step = h.step - 6
)
SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_evals,
       CAST(SUM(e_hw) // COUNT(*) AS BIGINT) AS mae_hw,
       CAST(SUM(e_nv) // COUNT(*) AS BIGINT) AS mae_naive,
       CASE WHEN SUM(e_nv) > 0 THEN
         (floor((CAST(SUM(e_hw) AS DOUBLE) / CAST(SUM(e_nv) AS DOUBLE))
                * 10000.0 + 0.5) / 10000.0)
       END AS skill
FROM evals GROUP BY 1
"""
    )


def _tenure_subjects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared survival-subject frame: per user, (segment, tenure hours,
    event = inactive > 12 h at observation end). Probed: ~60/40
    churned/censored at every SF (a 30-day rule censors EVERYONE on
    this ~30-day fixture — measured); the horizon is max(last activity)
    computed in-query — no magic clock literal."""
    ev = io.load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.unix_micros("ts")).alias("_f"),
        F.max(F.unix_micros("ts")).alias("_l"),
    )
    horizon = per_user.agg(F.max("_l").alias("_mx"))
    subj = per_user.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        F.expr("(_l - _f) DIV 3600000000").alias("duration"),
        F.when(F.col("_mx") - F.col("_l") > 43_200_000_000, 1)
        .otherwise(0)
        .alias("event"),
    )
    cust = io.load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    return subj.join(cust, "user_id")


def _km_user_tenure_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier tenure curves per market segment (X-204) over the
    shared :func:`_tenure_subjects` frame."""
    from kinesis_stream_video_project_spark.operators.survival import km_survival

    return km_survival(
        _tenure_subjects(spark, sf_dir), grp="c_mktsegment"
    ).withColumnRenamed("grp", "c_mktsegment")


def _logrank_tenure_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test (X-211): each segment's tenure survival against the
    rest of the cohort — the hypothesis-test companion of the KM curves
    (curves without a test invite eyeballing). chi2 ~ χ²(1) under H₀."""
    from kinesis_stream_video_project_spark.operators.survival import (
        logrank_vs_rest,
    )

    return logrank_vs_rest(
        _tenure_subjects(spark, sf_dir), grp="c_mktsegment"
    ).withColumnRenamed("grp", "c_mktsegment")


_TENURE_SUBJECTS_CTE = """
per_user AS (
  SELECT user_id, MIN(epoch_us(ts)) AS f, MAX(epoch_us(ts)) AS l
  FROM events GROUP BY 1
),
horizon AS (SELECT MAX(l) AS mx FROM per_user),
subjects AS (
  SELECT c.c_mktsegment AS grp,
         (p.l - p.f) // 3600000000 AS dur,
         CASE WHEN h.mx - p.l > 43200000000 THEN 1 ELSE 0 END AS ev
  FROM per_user p
  JOIN customer c ON c.c_custkey = p.user_id
  CROSS JOIN horizon h
),
"""


def _km_oracle() -> str:
    from kinesis_stream_video_project_spark.operators.survival import (
        KM_ORACLE_WALK,
    )

    return (
        "WITH RECURSIVE "
        + _TENURE_SUBJECTS_CTE.strip()
        + "\n"
        + KM_ORACLE_WALK.strip()
        + """
SELECT grp AS c_mktsegment, t, n_risk, n_events, n_censored, survival
FROM km
"""
    )


def _logrank_oracle() -> str:
    from kinesis_stream_video_project_spark.operators.survival import (
        LOGRANK_ORACLE_WALK,
    )

    return (
        "WITH RECURSIVE "
        + _TENURE_SUBJECTS_CTE.strip()
        + "\n"
        + LOGRANK_ORACLE_WALK.strip()
        + """
SELECT grp AS c_mktsegment, n_deaths, sum_oe, sum_v, chi2 FROM lr
"""
    )


def _hilbert_locality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way layout audit (X-205): Hilbert vs Z-order vs row-major
    read amplification on the SAME (order-day, custkey) rectangle as the
    registered zorder_locality_audit — directly comparable rows. The
    MEASURED finding (probed at bucket_bits ∈ {8,10,12,14}, sf0.1):
    Hilbert ties Z-order EXACTLY (same blocks, same rows read — at
    power-of-two block granularity both curves assign each aligned
    quadrant one contiguous key range, so their block partitions
    coincide; they differ only in inter-block visit order), while
    row-major reads 3.4× more. The audit's decision value is precisely
    that: on this workload the Hilbert encode cost buys nothing over
    Morton — measure, don't assume the textbook ranking."""
    from kinesis_stream_video_project_spark.operators import layout
    from kinesis_stream_video_project_spark.plans.queries_round10b import (
        _orders_xy,
    )

    return layout.curve_locality_audit(
        _orders_xy(spark, sf_dir), "x", "y", 1460, 1825, 10, 5,
        bits=14, bucket_bits=8,
    )


def _hilbert_oracle() -> str:
    from kinesis_stream_video_project_spark.operators.layout import (
        hilbert_sql_ctes,
    )
    from kinesis_stream_video_project_spark.plans.queries_round10b import (
        _zorder_interleave_sql,
    )

    z = _zorder_interleave_sql("x", "y", 14)
    shift = 2 * 14 - 8
    k_levels = 4  # prefix property: 8-bit blocks need only 4 walk levels
    blocks = []
    for layout_name, bcol in (("zorder", "zb"), ("hilbert", "hb"), ("rowmajor", "rb")):
        blocks.append(
            f"""
  SELECT '{layout_name}' AS layout,
         SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS n_rect_rows,
         COUNT(DISTINCT {bcol}) AS n_blocks_touched,
         COUNT(*) AS n_rows_read
  FROM keyed WHERE {bcol} IN (SELECT {bcol} FROM keyed WHERE hit)
"""
        )
    union = " UNION ALL ".join(blocks)
    return f"""
WITH base AS (
  SELECT CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS x,
         CAST(o_custkey AS BIGINT) AS y
  FROM orders
),
ymax AS (SELECT MAX(y) AS my FROM base),
h0 AS (SELECT x, y, x AS hx, y AS hy, CAST(0 AS BIGINT) AS hd FROM base),
{hilbert_sql_ctes("h0", 14, levels=k_levels)},
keyed AS (
  SELECT (x BETWEEN 1460 AND 1825
          AND y BETWEEN (SELECT my FROM ymax) // 10
                    AND (SELECT my FROM ymax) // 5) AS hit,
         ({z}) >> {shift} AS zb,
         ((x << 14) + y) >> {shift} AS rb,
         hd >> {shift} AS hb
  FROM h{k_levels}
)
SELECT layout, CAST(n_rect_rows AS BIGINT) AS n_rect_rows,
       CAST(n_blocks_touched AS BIGINT) AS n_blocks_touched,
       CAST(n_rows_read AS BIGINT) AS n_rows_read,
       CAST((n_rows_read * 1000) // n_rect_rows AS BIGINT) AS read_amp_permille
FROM ({union})
"""


def _user_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive event-type transitions in (ts, event_id)
    order: (prev_ty, next_ty, next_us) — the Markov view of the
    registered event_transitions counts, with the next-event timestamp
    carried for temporal splitting."""
    from pyspark.sql import Window

    ev = io.load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("_ty"),
        F.unix_micros("ts").alias("_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    return (
        ev.select(
            F.lag("_ty").over(w).alias("prev_ty"),
            F.col("_ty").alias("next_ty"),
            F.col("_us").alias("next_us"),
        )
        .filter(F.col("prev_ty").isNotNull())
    )


_TRANSITIONS_CTE = """
trans AS (
  SELECT lag(event_type) OVER w AS prev_ty,
         event_type AS next_ty,
         epoch_us(ts) AS next_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
tr AS (SELECT * FROM trans WHERE prev_ty IS NOT NULL)
"""


def _markov_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-smoothed first-order Markov transition matrix (X-206)
    over per-user event sequences: P(next | prev) = (c + 1) /
    (row_total + V) as the exact rational (p_num, p_den) plus one r4
    double — the probability tier above the r6-green event_transitions
    counts. V = 5 observed event types (in-query, not a literal)."""
    from kinesis_stream_video_project_spark.functions.numeric import r4
    from pyspark.sql import Window

    tr = _user_transitions(spark, sf_dir)
    cells = tr.groupBy("prev_ty", "next_ty").agg(
        F.count(F.lit(1)).alias("c")
    )
    v = tr.agg(F.countDistinct("next_ty").alias("_v"))
    w_row = Window.partitionBy("prev_ty")
    return (
        cells.withColumn("_rt", F.sum("c").over(w_row))
        .crossJoin(F.broadcast(v))
        .select(
            "prev_ty",
            "next_ty",
            F.col("c").cast("long").alias("c"),
            (F.col("c") + 1).cast("long").alias("p_num"),
            (F.col("_rt") + F.col("_v")).cast("long").alias("p_den"),
            r4(
                (F.col("c") + 1).cast("double")
                / (F.col("_rt") + F.col("_v")).cast("double")
            ).alias("p"),
        )
    )


def _markov_backtest_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-holdout evaluation of the Markov predictor (X-207):
    train the transition matrix on the first 80% of the time span,
    predict argmax P(next | prev) (ties → type asc) on the held-out
    20%, and emit top-1 accuracy NEXT TO the majority-class baseline
    (always predict the globally most frequent next type) — the
    hw_backtest_skill discipline: a predictor without a measured
    baseline is decoration. All counts integer; the two accuracies are
    one r4 double each."""
    from kinesis_stream_video_project_spark.functions.numeric import r4
    from pyspark.sql import Window

    tr = _user_transitions(spark, sf_dir)
    span = tr.agg(
        (
            F.min("next_us")
            + F.expr("(MAX(next_us) - MIN(next_us)) * 4 DIV 5")
        ).alias("_cut")
    )
    tagged = tr.crossJoin(F.broadcast(span)).select(
        "prev_ty", "next_ty", (F.col("next_us") < F.col("_cut")).alias("_is_train")
    )
    train = tagged.filter("_is_train")
    cells = train.groupBy("prev_ty", "next_ty").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_pred = Window.partitionBy("prev_ty").orderBy(
        F.col("c").desc(), F.col("next_ty")
    )
    pred = (
        cells.withColumn("_rn", F.row_number().over(w_pred))
        .filter(F.col("_rn") == 1)
        .select("prev_ty", F.col("next_ty").alias("_pred"))
    )
    majority = (
        train.groupBy("next_ty")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("next_ty"))
        .limit(1)
        .select(F.col("next_ty").alias("_maj"))
    )
    test = tagged.filter(~F.col("_is_train"))
    scored = test.join(F.broadcast(pred), "prev_ty", "left").crossJoin(
        F.broadcast(majority)
    )
    return scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.coalesce(
            F.sum(F.when(F.col("next_ty") == F.col("_pred"), 1)), F.lit(0)
        )
        .cast("long")
        .alias("n_correct"),
        F.coalesce(
            F.sum(F.when(F.col("next_ty") == F.col("_maj"), 1)), F.lit(0)
        )
        .cast("long")
        .alias("n_majority"),
    ).select(
        "n_test",
        "n_correct",
        "n_majority",
        r4(F.col("n_correct").cast("double") / F.col("n_test")).alias(
            "accuracy"
        ),
        r4(F.col("n_majority").cast("double") / F.col("n_test")).alias(
            "majority_accuracy"
        ),
    )


_MARKOV_MATRIX_ORACLE = (
    "WITH "
    + _TRANSITIONS_CTE.strip()
    + """,
cells AS (SELECT prev_ty, next_ty, COUNT(*) AS c FROM tr GROUP BY 1, 2),
v AS (SELECT COUNT(DISTINCT next_ty) AS v FROM tr),
rows_t AS (SELECT prev_ty, SUM(c) AS rt FROM cells GROUP BY 1)
SELECT c.prev_ty, c.next_ty, CAST(c.c AS BIGINT) AS c,
       CAST(c.c + 1 AS BIGINT) AS p_num,
       CAST(r.rt + v.v AS BIGINT) AS p_den,
       (floor((CAST(c.c + 1 AS DOUBLE) / CAST(r.rt + v.v AS DOUBLE))
              * 10000.0 + 0.5) / 10000.0) AS p
FROM cells c JOIN rows_t r ON r.prev_ty = c.prev_ty CROSS JOIN v
"""
)

_MARKOV_BACKTEST_ORACLE = (
    "WITH "
    + _TRANSITIONS_CTE.strip()
    + """,
span AS (SELECT MIN(next_us) + (MAX(next_us) - MIN(next_us)) * 4 // 5 AS cut
         FROM tr),
tagged AS (SELECT prev_ty, next_ty, next_us < (SELECT cut FROM span)
             AS is_train FROM tr),
cells AS (SELECT prev_ty, next_ty, COUNT(*) AS c FROM tagged
          WHERE is_train GROUP BY 1, 2),
pred AS (
  SELECT prev_ty, next_ty AS pred FROM (
    SELECT prev_ty, next_ty, row_number() OVER (
      PARTITION BY prev_ty ORDER BY c DESC, next_ty) AS rn
    FROM cells
  ) WHERE rn = 1
),
majority AS (
  SELECT next_ty AS maj FROM tagged WHERE is_train
  GROUP BY 1 ORDER BY COUNT(*) DESC, next_ty LIMIT 1
),
scored AS (
  SELECT t.next_ty, p.pred, m.maj
  FROM tagged t LEFT JOIN pred p ON p.prev_ty = t.prev_ty
  CROSS JOIN majority m
  WHERE NOT t.is_train
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(COALESCE(SUM(CASE WHEN next_ty = pred THEN 1 END), 0) AS BIGINT)
         AS n_correct,
       CAST(COALESCE(SUM(CASE WHEN next_ty = maj THEN 1 END), 0) AS BIGINT)
         AS n_majority,
       (floor((CAST(COALESCE(SUM(CASE WHEN next_ty = pred THEN 1 END), 0)
                    AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / 10000.0)
         AS accuracy,
       (floor((CAST(COALESCE(SUM(CASE WHEN next_ty = maj THEN 1 END), 0)
                    AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5) / 10000.0)
         AS majority_accuracy
FROM scored
"""
)


def _ams_oracle() -> str:
    from kinesis_stream_video_project_spark.operators.ams import ams_oracle_sql

    return ams_oracle_sql("lineitem", "l_partkey")


def _perm_oracle() -> str:
    from kinesis_stream_video_project_spark.operators.bootstrap import (
        permutation_oracle_sql,
    )

    return permutation_oracle_sql(_WEEKLY_CTE, "1-URGENT", "5-LOW")


def _welch_oracle() -> str:
    from kinesis_stream_video_project_spark.operators.stats import (
        welch_oracle_sql,
    )

    return welch_oracle_sql(_WEEKLY_CTE)


QUERIES = {
    "shapley_channel_attribution": _shapley_channel_attribution,
    "ams_f2_partkey": _ams_f2_partkey,
    "perm_test_weekly_revenue": _perm_test_weekly_revenue,
    "welch_t2_weekly_revenue": _welch_t2_weekly_revenue,
    "itemitem_cosine_recs": _itemitem_cosine_recs,
    "hw_daily_revenue": _hw_daily_revenue,
    "hw_backtest_skill": _hw_backtest_skill,
    "km_user_tenure_by_segment": _km_user_tenure_by_segment,
    "hilbert_locality_audit": _hilbert_locality_audit,
    "markov_transition_matrix": _markov_transition_matrix,
    "markov_backtest_accuracy": _markov_backtest_accuracy,
    "logrank_tenure_by_segment": _logrank_tenure_by_segment,
}

ORACLES = {
    "logrank_tenure_by_segment": _logrank_oracle(),
    "hilbert_locality_audit": _hilbert_oracle(),
    "markov_transition_matrix": _MARKOV_MATRIX_ORACLE,
    "markov_backtest_accuracy": _MARKOV_BACKTEST_ORACLE,
    "hw_daily_revenue": _hw_oracle(),
    "hw_backtest_skill": _hw_backtest_oracle(),
    "km_user_tenure_by_segment": _km_oracle(),
    "shapley_channel_attribution": shapley_oracle_sql(_MASK_CTE, _CHANNELS),
    "ams_f2_partkey": _ams_oracle(),
    "perm_test_weekly_revenue": _perm_oracle(),
    "welch_t2_weekly_revenue": _welch_oracle(),
    "itemitem_cosine_recs": _ITEMITEM_ORACLE,
}

assert set(QUERIES) == set(ORACLES)

TAGS = {name: ("round15",) for name in QUERIES}


def register_all(names: "tuple[str, ...] | None" = None) -> None:
    """Wire the given wave into the live registry — called from
    ``registry._load_all`` when a window has slots, never before."""
    from kinesis_stream_video_project_spark.plans.registry import register

    for name in names if names is not None else tuple(QUERIES):
        register(name, oracle=ORACLES[name], tags=TAGS[name])(QUERIES[name])
