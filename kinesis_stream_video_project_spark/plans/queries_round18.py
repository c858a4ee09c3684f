"""Round-18 queue module — PRE-WIRED, NOT YET REGISTERED (the
queries_round11..17 discipline: built, oracle-validated at 3 SFs,
lockstep-tested every round, registered when a driver window has
slots — the r15 window's ~20-slot new block is the target).

Queries built in round 14 (the queue drained to zero this round, so
r18-family production resumed per VERDICT r12 item 3's arithmetic):

* ``gini_revenue_concentration`` — per-nation Gini coefficient of
  customer revenue (Gini 1912). The GROUPED extension of the
  registered X-151 ``gini_supplier_revenue`` (operators/stats.py::
  gini_concentration, a single global coefficient over one entity
  ledger via an audit-tier unpartitioned window): this form partitions
  by nation — the window scales with groups — counts zero-revenue
  customers (X-151 only sees revenue-bearing entities), and emits
  millionths instead of permille. The grouped//1000 ≡ global-permille
  nested-division identity is pinned in pytest. ALL-INTEGER: exact
  cents, the rank-weighted sum rides as DECIMAL(38,0)/HUGEINT.
* ``mann_kendall_weekly_trend`` — Mann-Kendall trend test (Mann 1945,
  Kendall 1975) on weekly revenue per order priority: the
  significance companion of the r12-green ``theilsen_weekly_trend``
  slope (a slope without a test invites eyeballing — the X-211
  logrank-next-to-KM reasoning). S and the tie-corrected variance are
  exact integers; the z² > 1.96² significance decision is an integer
  cross-multiplication ((|S|-1)²·18·10^4 > 38416·var18) — no sqrt, no
  division.
* ``pettitt_changepoint`` — Pettitt (1979) rank-based changepoint on
  daily revenue per priority. U_t is computed via the O(n log n) rank
  identity (U_t = Σ_{i≤t} (cnt_gt(x_i) − cnt_lt(x_i)), from the
  antisymmetry of sign over the first block) instead of the O(n²)
  double sum — two rank windows + one running sum, all exact
  integers; the p ≤ 0.05 decision is the fixed integer convention
  6K² ≥ (3688879·(n³+n²)) DIV 10^6 (3688879 = ⌊ln(40)·10^6⌋, stated —
  both engines evaluate the same integers, so the convention hashes).

* ``assoc_rules_lift`` — market-basket 2-itemset association RULES
  (Agrawal et al. 1993) with support/confidence/lift as exact
  millionths. The rules extension of the registered
  ``copurchase_lift_pairs`` (r5d), which emits the top-20 pairs BY
  SUPPORT with lift as an integer rational: this form adds exactly
  what that query's docstring deferred — a min-support floor (2,
  probed non-empty at all 3 SFs: 2324/3445/3573 qualifying pairs),
  both directed confidences, and a LIFT-ranked top-20 — plus the
  single-pass basket-array plan (1 lineitem scan vs 2).
* ``max_drawdown_daily`` — worst peak-to-trough decline of the daily
  revenue level (Magdon-Ismail et al. 2004), all-integer.
* ``hhi_supplier_concentration`` — Herfindahl-Hirschman index of
  supplier revenue per nation in exact millionths (the antitrust
  measure; the squared-shares sibling of X-151's Gini on the same
  supplier-revenue ledger — different statistic, no HHI existed).
* ``fano_burstiness_hourly`` — Fano factor of hourly event counts per
  type over the FULL hour spine (overdispersion vs Poisson). MEASURED:
  the fixture is Poisson-like (F ∈ [0.90, 1.06]) and the boolean is
  live (click/view > 1 > purchase/signup at sf0.01).

THREE entries were built (or scoped) and DROPPED as duplicates — the
duplication audit now greps the FULL registry (operators/ included)
before an entry survives, after this round caught two late:

* positional phrase search — ``phrase_search_docs`` (r5e) already
  covers phrase search over the documents corpus (caught at scoping).
* ``benford_first_digit_audit`` — built, 3-SF-validated, then found to
  duplicate the REGISTERED ``benford_totalprice`` (X-150,
  operators/stats.py::benford_deviation — same table, same per-digit
  frame, milli instead of millionths). Dropped; the ONLINE Benford
  monitor (X-241) keeps its finer millionths contract and is pinned
  against the X-150 operator via the nested-division identity.
* ``acf_daily_revenue`` — built, 3-SF-validated, then found to
  duplicate the REGISTERED ``acf_daily_orders`` (X-153,
  operators/stats.py::acf_exact — same lags, gap-filled counts where
  this one read revenue). Dropped; a grouped acf_exact extension is
  the right future form if a window ever wants it.

Scale notes (the 100 TB grade): every query aggregates the corpus to a
model/ledger-sized frame FIRST (customers-per-nation, 9 digits, weeks
per priority, days per priority, suppliers-per-nation, |types|×|hours|
grids) and only then runs windows or pair joins on that ledger; the MK
pair join is |weeks|² per group with |weeks| bounded by the calendar
(SF-independent), and the basket pair join is bounded by basket size —
never corpus-shaped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.functions.numeric import scaled_long


# ---------------------------------------------------------------------------
# Gini concentration (X-232)
# ---------------------------------------------------------------------------


def _gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Gini of customer revenue (X-232): customers sorted by
    (exact revenue-cents, custkey) ascending within nation, G =
    (2·Σ i·x_i − (n+1)·Σx) / (n·Σx) emitted as exact millionths via
    DECIMAL(38,0) integer division (the rank-weighted sum Σ i·x_i
    reaches ~10^16 at sf0.1 and the ·10^6 scaling would overflow
    BIGINT — DECIMAL(38,0) plays DuckDB's HUGEINT role, the welch_t2
    discipline). Customers with no orders count as zero-revenue rows
    (stated: concentration over the whole customer base, not just
    active buyers). One orders aggregate, one broadcast join to the
    customer/nation dims, one nation-partitioned rank window over the
    |customers| ledger."""
    rev = (
        io.load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("_ck"))
        .agg(F.sum(scaled_long(F.col("o_totalprice"), 100)).alias("_rev"))
    )
    cust = io.load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("_ck"), F.col("c_nationkey").alias("_nk")
    )
    nation = io.load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_nk"), F.col("n_name").alias("nation")
    )
    x = (
        cust.join(rev, "_ck", "left")
        .join(F.broadcast(nation), "_nk")
        .select(
            "nation",
            "_ck",
            F.coalesce(F.col("_rev"), F.lit(0)).cast("long").alias("_x"),
        )
    )
    w = Window.partitionBy("nation").orderBy("_x", "_ck")
    ranked = x.withColumn("_i", F.row_number().over(w).cast("long"))
    agg = ranked.groupBy("nation").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("_x").cast("long").alias("total_cents"),
        F.sum(F.col("_i").cast("decimal(38,0)") * F.col("_x")).alias("_w"),
    )
    return (
        agg.withColumn(
            "_num",
            F.lit(2).cast("decimal(38,0)") * F.col("_w")
            - (F.col("n_customers") + 1).cast("decimal(38,0)")
            * F.col("total_cents"),
        )
        .withColumn(
            "_den",
            F.col("n_customers").cast("decimal(38,0)") * F.col("total_cents"),
        )
        .selectExpr(
            "nation",
            "n_customers",
            "total_cents",
            "CAST(CASE WHEN total_cents = 0 THEN 0 "
            "ELSE (_num * 1000000) div _den END AS BIGINT) AS gini_millionths",
        )
    )


_GINI_ORACLE = """
WITH rev AS (
  SELECT o_custkey AS ck,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS r
  FROM orders GROUP BY 1
),
x AS (
  SELECT n.n_name AS nation, c.c_custkey AS ck, COALESCE(rev.r, 0) AS x
  FROM customer c
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  LEFT JOIN rev ON rev.ck = c.c_custkey
),
ranked AS (
  SELECT nation, x,
         row_number() OVER (PARTITION BY nation ORDER BY x, ck) AS i
  FROM x
),
agg AS (
  SELECT nation, COUNT(*) AS n, SUM(CAST(x AS HUGEINT)) AS s,
         SUM(CAST(i AS HUGEINT) * x) AS w
  FROM ranked GROUP BY 1
)
SELECT nation,
       CAST(n AS BIGINT) AS n_customers,
       CAST(s AS BIGINT) AS total_cents,
       CAST(CASE WHEN s = 0 THEN 0
                 ELSE ((2 * w - (n + 1) * s) * 1000000) // (n * s)
            END AS BIGINT) AS gini_millionths
FROM agg
"""


# ---------------------------------------------------------------------------
# Mann-Kendall trend test (X-234)
# ---------------------------------------------------------------------------


def _mann_kendall_weekly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test (X-234) on weekly revenue-cents per
    order priority — the same weekly series as the r12-green
    ``theilsen_weekly_trend`` (epoch-week x, exact cents y). S =
    Σ_{i<j} sign(y_j − y_i) over time-ordered pairs; var(S)·18 =
    n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) over tie groups (Kendall's tie
    correction) — all exact BIGINTs. The 95% two-sided significance
    decision (|z| > 1.96 with continuity correction) is the integer
    cross-multiplication (|S|−1)²·180000 > 38416·var18, S ≠ 0 — no
    sqrt, no division, so the boolean hashes with no claims machinery.
    The pair join runs on the |weeks|-per-group ledger (calendar-
    bounded, SF-independent) after the corpus aggregates away."""
    weekly = (
        io.load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_orderpriority").alias("grp"),
            F.expr(
                "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') DIV 7"
            ).alias("_x"),
        )
        .agg(F.sum(scaled_long(F.col("o_totalprice"), 100)).alias("_y"))
    )
    # Ledger-sized (|weeks|·|priorities| ≈ 1700 rows at ANY SF) and
    # consumed by FOUR derivations (both pair-join sides, n, ties) —
    # without staging each re-derives the corpus aggregate (plan audit
    # measured 4 orders scans). localCheckpoint once per the r8
    # multi-consumer rule (3+ consumers on different keys, ledger-sized
    # staging): 1 corpus scan total.
    weekly = weekly.localCheckpoint(eager=False)
    pairs = (
        weekly.alias("a")
        .join(
            weekly.alias("b"),
            (F.col("a.grp") == F.col("b.grp"))
            & (F.col("a._x") < F.col("b._x")),
        )
        .select(
            F.col("a.grp").alias("grp"),
            F.when(F.col("b._y") > F.col("a._y"), 1)
            .when(F.col("b._y") < F.col("a._y"), -1)
            .otherwise(0)
            .cast("long")
            .alias("_sgn"),
        )
    )
    s = pairs.groupBy("grp").agg(F.sum("_sgn").cast("long").alias("s_stat"))
    n = weekly.groupBy("grp").agg(F.count(F.lit(1)).cast("long").alias("n_weeks"))
    ties = (
        weekly.groupBy("grp", "_y")
        .agg(F.count(F.lit(1)).cast("long").alias("_t"))
        .filter(F.col("_t") > 1)
        .groupBy("grp")
        .agg(
            F.sum(
                F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    out = (
        n.join(s, "grp")
        .join(ties, "grp", "left")
        .na.fill({"tie_term": 0})
        .withColumn(
            "var18",
            (
                F.col("n_weeks")
                * (F.col("n_weeks") - 1)
                * (2 * F.col("n_weeks") + 5)
                - F.col("tie_term")
            ).cast("long"),
        )
    )
    abs_s = F.abs(F.col("s_stat"))
    return out.select(
        "grp",
        "n_weeks",
        "s_stat",
        "tie_term",
        "var18",
        F.when(F.col("s_stat") > 0, F.lit("increasing"))
        .when(F.col("s_stat") < 0, F.lit("decreasing"))
        .otherwise(F.lit("no trend"))
        .alias("trend"),
        (
            (F.col("s_stat") != 0)
            & (
                (abs_s - 1) * (abs_s - 1) * F.lit(180000)
                > F.lit(38416) * F.col("var18")
            )
        ).alias("significant_95"),
    )


_MK_ORACLE = """
WITH weekly AS (
  SELECT o_orderpriority AS grp,
         CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 7
              AS BIGINT) AS x,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
  FROM orders GROUP BY 1, 2
),
s AS (
  SELECT a.grp,
         CAST(SUM(CASE WHEN b.y > a.y THEN 1
                       WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM weekly a JOIN weekly b ON a.grp = b.grp AND a.x < b.x
  GROUP BY 1
),
n AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_weeks FROM weekly GROUP BY 1),
ties AS (
  SELECT grp, CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT grp, y, CAST(COUNT(*) AS BIGINT) AS t
        FROM weekly GROUP BY 1, 2 HAVING COUNT(*) > 1)
  GROUP BY 1
),
calc AS (
  SELECT n.grp, n.n_weeks, s.s_stat,
         CAST(COALESCE(ties.tie_term, 0) AS BIGINT) AS tie_term,
         CAST(n.n_weeks * (n.n_weeks - 1) * (2 * n.n_weeks + 5)
              - COALESCE(ties.tie_term, 0) AS BIGINT) AS var18
  FROM n JOIN s ON s.grp = n.grp LEFT JOIN ties ON ties.grp = n.grp
)
SELECT grp, n_weeks, s_stat, tie_term, var18,
       CASE WHEN s_stat > 0 THEN 'increasing'
            WHEN s_stat < 0 THEN 'decreasing'
            ELSE 'no trend' END AS trend,
       (s_stat <> 0 AND
        (ABS(s_stat) - 1) * (ABS(s_stat) - 1) * 180000
          > 38416 * var18) AS significant_95
FROM calc
"""


# ---------------------------------------------------------------------------
# Pettitt changepoint (X-235)
# ---------------------------------------------------------------------------


def _pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pettitt (1979) rank-based changepoint (X-235) on the daily
    revenue series per priority (the r14 Holt family's
    ``_daily_series``). U_t = Σ_{i≤t} Σ_{j>t} sign(x_j − x_i) via the
    rank identity: within-block pairs cancel by antisymmetry, so
    U_t = Σ_{i≤t} (cnt_gt(x_i) − cnt_lt(x_i)) = running sum of
    (rank_desc − rank_asc) — two rank windows + one running sum
    instead of the O(n²) double loop, all exact integers. K = max|U_t|
    over t < n, changepoint = the first step attaining it. The
    p ≤ 0.05 decision (p ≈ 2·exp(−6K²/(n³+n²))) is the FIXED integer
    convention 6K² ≥ (3688879·(n³+n²)) DIV 10^6 with 3688879 =
    ⌊ln(40)·10^6⌋ — a stated rational constant, not a libm call, so
    both engines compute identical integers."""
    from kinesis_stream_video_project_spark.plans.queries_round15 import (
        _daily_series,
    )

    series = _daily_series(spark, sf_dir)
    g = Window.partitionBy("grp")
    # rank() over the VALUE alone (no step tiebreak) gives min-rank =
    # cnt_lt + 1 ascending and cnt_gt + 1 descending, so ties fold into
    # the counts exactly as sign() would score them.
    ranked = series.select(
        "grp",
        "step",
        (
            F.rank().over(g.orderBy(F.desc("xs"))).cast("long")
            - F.rank().over(g.orderBy("xs")).cast("long")
        ).alias("_e"),
        F.count(F.lit(1)).over(g).cast("long").alias("_n"),
    )
    u = ranked.withColumn(
        "_u",
        F.sum("_e").over(
            g.orderBy("step").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).filter(F.col("step") < F.col("_n"))
    pick = Window.partitionBy("grp").orderBy(
        F.abs(F.col("_u")).desc(), F.col("step")
    )
    best = (
        u.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select(
            "grp",
            F.col("_n").alias("n_days"),
            F.abs(F.col("_u")).cast("long").alias("k_stat"),
            F.col("step").cast("long").alias("cp_step"),
            F.col("_u").cast("long").alias("u_at_cp"),
        )
    )
    return best.withColumn(
        "significant_95",
        F.lit(6) * F.col("k_stat") * F.col("k_stat")
        >= F.expr(
            "(3688879 * (n_days * n_days * n_days + n_days * n_days)) "
            "div 1000000"
        ),
    )


def _pettitt_oracle() -> str:
    from kinesis_stream_video_project_spark.plans.queries_round15 import (
        _DAILY_SERIES_CTE,
    )

    return (
        "WITH "
        + _DAILY_SERIES_CTE.strip().lstrip(",")
        + """,
ranked AS (
  SELECT grp, step,
         CAST(rank() OVER (PARTITION BY grp ORDER BY xs DESC) AS BIGINT)
           - CAST(rank() OVER (PARTITION BY grp ORDER BY xs) AS BIGINT)
           AS e,
         CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM series
),
u AS (
  SELECT grp, step, n,
         CAST(SUM(e) OVER (PARTITION BY grp ORDER BY step
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS ut
  FROM ranked
),
best AS (
  SELECT grp, n AS n_days, ABS(ut) AS k_stat, step AS cp_step,
         ut AS u_at_cp,
         row_number() OVER (PARTITION BY grp
                            ORDER BY ABS(ut) DESC, step) AS rn
  FROM u WHERE step < n
)
SELECT grp, n_days, CAST(k_stat AS BIGINT) AS k_stat,
       CAST(cp_step AS BIGINT) AS cp_step,
       CAST(u_at_cp AS BIGINT) AS u_at_cp,
       (6 * k_stat * k_stat >=
        (3688879 * (n_days * n_days * n_days + n_days * n_days))
          // 1000000) AS significant_95
FROM best WHERE rn = 1
"""
    )


QUERIES = {
    "gini_revenue_concentration": _gini_revenue_concentration,
    "mann_kendall_weekly_trend": _mann_kendall_weekly_trend,
    "pettitt_changepoint": _pettitt_changepoint,
}

ORACLES = {
    "gini_revenue_concentration": _GINI_ORACLE,
    "mann_kendall_weekly_trend": _MK_ORACLE,
    "pettitt_changepoint": _pettitt_oracle(),
}

assert set(QUERIES) == set(ORACLES)

TAGS = {name: ("round18",) for name in QUERIES}


def register_all(names: "tuple[str, ...] | None" = None) -> None:
    """Wire the given wave into the live registry — called from
    ``registry._load_all`` when a window has slots, never before."""
    from kinesis_stream_video_project_spark.plans.registry import register

    for name in names if names is not None else tuple(QUERIES):
        register(name, oracle=ORACLES[name], tags=TAGS[name])(QUERIES[name])


# ---------------------------------------------------------------------------
# Association rules with lift (X-236)
# ---------------------------------------------------------------------------


def _assoc_rules_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (X-236; Agrawal et al. 1993) over
    order baskets: 2-itemsets of distinct parts co-purchased in one
    order, with support / both confidences / lift as exact millionths
    (integer cross-multiplication throughout — lift = c_ab·n·10^6 DIV
    (c_a·c_b) peaks at ~7.5e11, comfortably BIGINT). Min pair support 2
    (probed non-empty at all 3 SFs: 2324/3445/3573 qualifying pairs);
    top-20 by (lift DESC, part_a, part_b) — a total order before the
    limit, per the registry discipline.

    Scale: the pair generation is the within-basket self-join — bounded
    by basket size (≤ 13 lines per order on this fixture), never
    corpus×corpus; item counts and the 1-row basket total are
    model-sized broadcasts back onto the qualifying pairs."""
    # ONE corpus pass: baskets as sorted distinct-part arrays (bounded
    # by basket size, ≤ 13 on this fixture), staged once — THREE
    # consumers (pair counts, item counts, the basket total) on
    # different keys, the r8 multi-consumer localCheckpoint rule; the
    # plan audit measured 5 lineitem scans in the self-join form this
    # replaces. A production deployment writes the basket table once
    # (the ivfadc written-index reasoning). Pairs come from a nested
    # transform over the array (a<b by construction on the sorted
    # array) — the array is its OWN projected column per the
    # multi-reference-lambda rule, and the explode is explode_outer +
    # isNotNull per the r4 inferred-filter rule.
    baskets = (
        io.load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("_k"))
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("_arr"))
        .localCheckpoint(eager=False)
    )
    nb = baskets.agg(F.count(F.lit(1)).cast("long").alias("n_baskets"))
    items = (
        baskets.select(F.explode("_arr").alias("_p"))
        .groupBy("_p")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("_arr"),
            lambda x, i: F.transform(
                F.slice(F.col("_arr"), i + 2, 1000000),
                lambda y: F.struct(
                    x.alias("part_a"), y.alias("part_b")
                ),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode_outer(pair_arr).alias("_pr"))
        .filter(F.col("_pr").isNotNull())
        .groupBy(
            F.col("_pr.part_a").alias("part_a"),
            F.col("_pr.part_b").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    enriched = (
        pairs.join(
            F.broadcast(items.select(F.col("_p").alias("part_a"),
                                     F.col("_c").alias("c_a"))),
            "part_a",
        )
        .join(
            F.broadcast(items.select(F.col("_p").alias("part_b"),
                                     F.col("_c").alias("c_b"))),
            "part_b",
        )
        .crossJoin(F.broadcast(nb))
    )
    out = enriched.selectExpr(
        "part_a",
        "part_b",
        "n_baskets",
        "c_a",
        "c_b",
        "c_ab",
        "CAST((c_ab * 1000000) div n_baskets AS BIGINT) AS support_millionths",
        "CAST((c_ab * 1000000) div c_a AS BIGINT) AS conf_ab_millionths",
        "CAST((c_ab * 1000000) div c_b AS BIGINT) AS conf_ba_millionths",
        "CAST((c_ab * n_baskets * 1000000) div (c_a * c_b) AS BIGINT)"
        " AS lift_millionths",
    )
    return out.orderBy(
        F.desc("lift_millionths"), "part_a", "part_b"
    ).limit(20)


_ASSOC_ORACLE = """
WITH b AS (SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
nb AS (SELECT CAST(COUNT(DISTINCT k) AS BIGINT) AS n_baskets FROM b),
items AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1),
pairs AS (
  SELECT a.p AS part_a, b2.p AS part_b, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM b a JOIN b b2 ON a.k = b2.k AND a.p < b2.p
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT part_a, part_b, nb.n_baskets, ia.c AS c_a, ib.c AS c_b, c_ab,
       CAST((c_ab * 1000000) // nb.n_baskets AS BIGINT)
         AS support_millionths,
       CAST((c_ab * 1000000) // ia.c AS BIGINT) AS conf_ab_millionths,
       CAST((c_ab * 1000000) // ib.c AS BIGINT) AS conf_ba_millionths,
       CAST((c_ab * nb.n_baskets * 1000000) // (ia.c * ib.c) AS BIGINT)
         AS lift_millionths
FROM pairs
JOIN items ia ON ia.p = part_a
JOIN items ib ON ib.p = part_b
CROSS JOIN nb
ORDER BY lift_millionths DESC, part_a, part_b
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Maximum drawdown (X-238)
# ---------------------------------------------------------------------------


def _max_drawdown_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown (X-238) of the daily revenue level per priority
    — the worst peak-to-trough decline (the finance risk classic,
    Magdon-Ismail et al. 2004, applied to the revenue level series the
    forecast shelf already maintains). running_peak_t = max(x_1..x_t),
    drawdown_t = running_peak_t − x_t, K = max over t, first step wins
    ties. All exact integer cents: one grp-partitioned running-max
    window + one pick window over the same ledger partitioning (no
    extra exchange)."""
    from kinesis_stream_video_project_spark.plans.queries_round15 import (
        _daily_series,
    )

    series = _daily_series(spark, sf_dir)
    g = Window.partitionBy("grp")
    w = g.orderBy("step").rowsBetween(Window.unboundedPreceding, 0)
    dd = series.select(
        "grp",
        "step",
        "xs",
        F.max("xs").over(w).cast("long").alias("_peak"),
        F.count(F.lit(1)).over(g).cast("long").alias("n_days"),
    ).withColumn("_dd", (F.col("_peak") - F.col("xs")).cast("long"))
    pick = Window.partitionBy("grp").orderBy(F.desc("_dd"), "step")
    return (
        dd.withColumn("_rn", F.row_number().over(pick))
        .filter(F.col("_rn") == 1)
        .select(
            "grp",
            "n_days",
            F.col("_peak").alias("peak_cents"),
            F.col("xs").alias("trough_cents"),
            F.col("_dd").alias("max_drawdown_cents"),
            F.col("step").cast("long").alias("dd_step"),
        )
    )


def _drawdown_oracle() -> str:
    from kinesis_stream_video_project_spark.plans.queries_round15 import (
        _DAILY_SERIES_CTE,
    )

    return (
        "WITH "
        + _DAILY_SERIES_CTE.strip().lstrip(",")
        + """,
dd AS (
  SELECT grp, step, xs,
         CAST(MAX(xs) OVER (PARTITION BY grp ORDER BY step
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS peak,
         CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n_days
  FROM series
),
pick AS (
  SELECT grp, n_days, peak, xs, peak - xs AS ddv, step,
         row_number() OVER (PARTITION BY grp
                            ORDER BY peak - xs DESC, step) AS rn
  FROM dd
)
SELECT grp, n_days, peak AS peak_cents, xs AS trough_cents,
       CAST(ddv AS BIGINT) AS max_drawdown_cents,
       CAST(step AS BIGINT) AS dd_step
FROM pick WHERE rn = 1
"""
    )


QUERIES["assoc_rules_lift"] = _assoc_rules_lift
ORACLES["assoc_rules_lift"] = _ASSOC_ORACLE
TAGS["assoc_rules_lift"] = ("round18",)
QUERIES["max_drawdown_daily"] = _max_drawdown_daily
ORACLES["max_drawdown_daily"] = _drawdown_oracle()
TAGS["max_drawdown_daily"] = ("round18",)
assert set(QUERIES) == set(ORACLES)


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration index (X-239)
# ---------------------------------------------------------------------------


def _hhi_supplier_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index (X-239; Herfindahl 1950, Hirschman
    1945 — the antitrust market-concentration standard) of supplier
    revenue per supplier nation: HHI = Σ share² emitted as exact
    millionths via (Σ rev²)·10^6 DIV (Σ rev)² on DECIMAL(38,0)/HUGEINT
    (rev² reaches ~10^18 per supplier and the squared total ~10^26 —
    both far past BIGINT, both comfortably inside 38 digits). 10^6 =
    monopoly, 10^6/n = perfectly even. The companion of the X-232 Gini
    (inequality of the tail vs weight of the head). One corpus
    aggregate to the |suppliers| ledger, one broadcast dim join, one
    nation re-aggregate — no window at all."""
    rev = (
        io.load_table(spark, sf_dir, "lineitem")
        .select(
            F.col("l_suppkey").alias("_sk"),
            scaled_long(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                100,
            ).alias("_cents"),
        )
        .groupBy("_sk")
        .agg(F.sum("_cents").alias("_rev"))
    )
    supp = io.load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("_sk"), F.col("s_nationkey").alias("_nk")
    )
    nation = io.load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("_nk"), F.col("n_name").alias("nation")
    )
    agg = (
        rev.join(F.broadcast(supp), "_sk")
        .join(F.broadcast(nation), "_nk")
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            F.sum("_rev").cast("long").alias("total_cents"),
            F.sum(
                F.col("_rev").cast("decimal(38,0)") * F.col("_rev")
            ).alias("_ss"),
        )
    )
    return agg.withColumn(
        "_tot", F.col("total_cents").cast("decimal(38,0)")
    ).selectExpr(
        "nation",
        "n_suppliers",
        "total_cents",
        "CAST(CASE WHEN total_cents = 0 THEN 0 "
        "ELSE (_ss * 1000000) div (_tot * _tot) END AS BIGINT)"
        " AS hhi_millionths",
    )


_HHI_ORACLE = """
WITH rev AS (
  SELECT l_suppkey AS sk,
         SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                  AS BIGINT)) AS r
  FROM lineitem GROUP BY 1
),
agg AS (
  SELECT n.n_name AS nation,
         CAST(COUNT(*) AS BIGINT) AS n_suppliers,
         CAST(SUM(rev.r) AS BIGINT) AS total_cents,
         SUM(CAST(rev.r AS HUGEINT) * rev.r) AS ss
  FROM rev
  JOIN supplier s ON s.s_suppkey = rev.sk
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY 1
)
SELECT nation, n_suppliers, total_cents,
       CAST(CASE WHEN total_cents = 0 THEN 0
                 ELSE (ss * 1000000)
                      // (CAST(total_cents AS HUGEINT) * total_cents)
            END AS BIGINT) AS hhi_millionths
FROM agg
"""


# ---------------------------------------------------------------------------
# Fano-factor burstiness (X-240)
# ---------------------------------------------------------------------------


def _fano_burstiness_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (X-240; Fano 1947) of hourly event counts per type —
    the overdispersion diagnostic for arrival processes (F = 1 under
    Poisson; F > 1 = bursty, F < 1 = regular). Counts live on the FULL
    observed hour spine (global min..max hour, zero hours included via
    the calendar gap-fill pattern — dropping empty hours would bias F
    down), and F = Var/Mean emits as exact millionths:
    ((n·Σc² − S²)·10^6) DIV (n·S), population variance, all BIGINT
    (hourly counts are small; no wide decimals needed). MEASURED
    (3 SFs): this generator is Poisson-like — F ∈ [0.90, 1.06] — and
    the `overdispersed` boolean is LIVE on the fixture (click/view
    sit just above 1, purchase/signup just below at sf0.01). Scale:
    one (type, hour) corpus aggregate, a 1-row clock aggregate, a
    |types|×|hours| broadcast grid, one per-type re-aggregate."""
    ev = io.load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.col("event_type"),
        F.date_trunc("hour", F.col("ts")).alias("_h"),
    ).agg(F.count(F.lit(1)).cast("long").alias("_c"))
    # ONE corpus scan: the clock (min/max observed hour — identical to
    # the event-level extremes since date_trunc is monotone) and the
    # type spine both re-derive from the ledger-sized counts frame,
    # which is staged once (3 consumers on different keys — the r8
    # multi-consumer rule; plan audit measured 3 events scans before).
    c = c.localCheckpoint(eager=False)
    clock = c.agg(
        F.min("_h").alias("_h0"), F.max("_h").alias("_h1")
    )
    spine = clock.select(
        F.explode(
            F.sequence(
                F.col("_h0"), F.col("_h1"), F.expr("INTERVAL 1 HOUR")
            )
        ).alias("_h")
    )
    types = c.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(spine))
        .join(c, ["event_type", "_h"], "left")
        .na.fill({"_c": 0})
    )
    agg = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("_c").cast("long").alias("n_events"),
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("_ss"),
    )
    return agg.selectExpr(
        "event_type",
        "n_hours",
        "n_events",
        "CAST(CASE WHEN n_events = 0 THEN NULL "
        "ELSE ((n_hours * _ss - n_events * n_events) * 1000000) "
        "div (n_hours * n_events) END AS BIGINT) AS fano_millionths",
    ).withColumn(
        "overdispersed", F.col("fano_millionths") > F.lit(1000000)
    )


_FANO_ORACLE = """
WITH clock AS (
  SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
  FROM events
),
spine AS (
  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM clock
),
c AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM events),
grid AS (
  SELECT t.event_type, s.h, COALESCE(c.c, 0) AS c
  FROM types t CROSS JOIN spine s
  LEFT JOIN c ON c.event_type = t.event_type AND c.h = s.h
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(SUM(c * c) AS BIGINT) AS ss
  FROM grid GROUP BY 1
)
SELECT event_type, n_hours, n_events,
       CAST(CASE WHEN n_events = 0 THEN NULL
                 ELSE ((n_hours * ss - n_events * n_events) * 1000000)
                      // (n_hours * n_events)
            END AS BIGINT) AS fano_millionths,
       (CASE WHEN n_events = 0 THEN NULL
             ELSE ((n_hours * ss - n_events * n_events) * 1000000)
                  // (n_hours * n_events)
        END > 1000000) AS overdispersed
FROM agg
"""


QUERIES["hhi_supplier_concentration"] = _hhi_supplier_concentration
ORACLES["hhi_supplier_concentration"] = _HHI_ORACLE
TAGS["hhi_supplier_concentration"] = ("round18",)
QUERIES["fano_burstiness_hourly"] = _fano_burstiness_hourly
ORACLES["fano_burstiness_hourly"] = _FANO_ORACLE
TAGS["fano_burstiness_hourly"] = ("round18",)
assert set(QUERIES) == set(ORACLES)
