"""Exact-arithmetic statistics operators — rolling z-score anomaly flags,
Pearson correlation, and OLS slope over integer-scaled columns.

The built-in `corr`/`stddev`/`avg` aggregates accumulate running doubles,
so their low bits depend on partitioning and engine — they can never
hash-match a different engine. These operators instead take columns that
the caller has ALREADY scaled to integers (cents, micro-units), accumulate
moment sums as DECIMAL(38,0) (exact and order-independent), and either

* stay in cross-multiplied integer inequalities (z-score: no mean, no
  sqrt, no float σ ever materializes), or
* evaluate the closed form once on the final exact decimals in double —
  identical IEEE operations on identical inputs in every engine.

This is the same scaled-integer determinism discipline as
``surprisal_score`` (queries_round4.py) and ``pagerank_int``
(operators/graph.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.numeric import r4


def rolling_zscore_flags(
    df: DataFrame,
    key_col: str,
    order_cols: Sequence[str],
    value_col: str,
    window_rows: int = 20,
    min_rows: int = 10,
    z: int = 3,
) -> DataFrame:
    """Rows whose integer ``value_col`` deviates more than ``z`` population
    standard deviations from the mean of the trailing ``window_rows``
    observations (inclusive) of the same ``key_col``.

    The z-test is evaluated as the cross-multiplied integer inequality

        (n·v − S)² > z²·(n·Q − S²)

    over the trailing frame's exact sums S = Σv, Q = Σv² (DECIMAL(38,0) —
    (n·v − S)² peaks past BIGINT), which is algebraically |v − S/n| >
    z·σ_pop with both sides multiplied by n². No division, sqrt, or float
    appears, so results are bit-identical across engines and partitionings.

    Null contract: callers must pre-filter null ``value_col`` rows (the
    registered query and the streaming twin both do); defensively, ``n``
    counts non-null values (``F.count(value_col)``), so a null row that
    slips through contributes to neither n, S, nor Q instead of inflating
    n against an unchanged S/Q (a wrong-n z-test AND a silent batch/stream
    divergence — the streaming twin drops nulls).

    Scale: ONE exchange (the key window partition); trailing-frame state
    is ``window_rows`` per row. Returns the input columns (the flagged
    rows only)."""
    win = (
        Window.partitionBy(key_col)
        .orderBy(*order_cols)
        .rowsBetween(-(window_rows - 1), Window.currentRow)
    )
    dec = F.col(value_col).cast("decimal(38,0)")
    n, s, q = F.col("_n"), F.col("_s"), F.col("_q")
    dev = n * F.col(value_col) - s
    return (
        df.withColumn("_n", F.count(F.col(value_col)).over(win))
        .withColumn("_s", F.sum(dec).over(win))
        .withColumn("_q", F.sum(dec * F.col(value_col)).over(win))
        .filter((n >= min_rows) & (dev * dev > (z * z) * (n * q - s * s)))
        .drop("_n", "_s", "_q")
    )


def _moments(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group exact moment sums of two integer columns: n, Σx, Σy,
    Σx², Σy², Σxy as DECIMAL(38,0) — one partial-combine aggregate."""
    xd = F.col(x_col).cast("decimal(38,0)")
    yd = F.col(y_col).cast("decimal(38,0)")
    return df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * F.col(x_col)).alias("sxx"),
        F.sum(yd * F.col(y_col)).alias("syy"),
        F.sum(xd * F.col(y_col)).alias("sxy"),
    )


def _covariance_terms() -> tuple[Column, Column, Column]:
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return num, dx, dy


def pearson_corr_exact(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group Pearson correlation of two INTEGER columns, deterministic
    cross-engine: exact decimal moment sums, then one double evaluation of
    (n·Σxy − ΣxΣy) / √((n·Σx² − Σx²ᵗ)(n·Σy² − Σy²ᵗ)) — unrounded; callers
    apply their own presentation rounding (`r4`). Output: (group, n_pairs,
    corr); corr is null for degenerate groups (zero variance)."""
    s = _moments(df, group_col, x_col, y_col)
    num, dx, dy = _covariance_terms()
    return s.select(
        F.col(group_col),
        F.col("n").alias("n_pairs"),
        F.when(
            (dx > 0) & (dy > 0),
            num.cast("double") / F.sqrt(dx.cast("double") * dy.cast("double")),
        ).alias("corr"),
    )


def ols_slope_exact(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group OLS slope dy/dx of two INTEGER columns (same exact-moments
    discipline as :func:`pearson_corr_exact`): (n·Σxy − ΣxΣy)/(n·Σx² −
    (Σx)²) evaluated in double on exact decimals, unrounded. Output:
    (group, n, slope); null slope for constant x."""
    s = _moments(df, group_col, x_col, y_col)
    num, dx, _ = _covariance_terms()
    return s.select(
        F.col(group_col),
        F.col("n"),
        F.when(dx > 0, num.cast("double") / dx.cast("double")).alias("slope"),
    )


def welch_t2_pairs(df: DataFrame, grp: str = "grp", y: str = "y") -> DataFrame:
    """Pairwise Welch unequal-variance test statistic (Welch 1947) for
    every unordered group pair — the parametric sibling of
    ``mann_whitney_u``/``ks_two_sample`` in the two-sample shelf. Emits
    t² (not t: no square root, so the emitted double derives from exact
    integer moments through one fixed IEEE expression) and the
    Welch–Satterthwaite effective df.

    Determinism: per-group moments ride as exact DECIMAL(38,0) sums
    (the ``pearson_corr_exact`` discipline); every float op after is the
    same double expression in the same order on both engines, r4 at
    emission. Groups with n < 2 are dropped (variance undefined);
    zero-variance pairs emit NULL t². One partial-combine aggregate to
    |groups| rows, then a broadcast-sized pair join — no corpus-sized
    shuffle beyond the groupBy."""
    yl = F.col(y).cast("long")
    yd = yl.cast("decimal(38,0)")
    m = (
        df.select(F.col(grp).cast("string").alias("_g"), yl.alias("_y"))
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col("_y").cast("decimal(38,0)")).alias("_sy"),
            F.sum(F.col("_y").cast("decimal(38,0)") * F.col("_y")).alias(
                "_syy"
            ),
        )
        .filter(F.col("_n") >= 2)
    )
    del yd
    a = m.select(
        F.col("_g").alias("g_a"),
        F.col("_n").alias("_na"),
        F.col("_sy").alias("_sya"),
        F.col("_syy").alias("_syya"),
    )
    b = m.select(
        F.col("_g").alias("g_b"),
        F.col("_n").alias("_nb"),
        F.col("_sy").alias("_syb"),
        F.col("_syy").alias("_syyb"),
    )
    j = a.join(F.broadcast(b), F.col("g_a") < F.col("g_b"))

    def mean(s, n):
        return F.col(s).cast("double") / F.col(n).cast("double")

    def var_over_n(s, sq, n):
        num = F.col(n) * F.col(sq) - F.col(s) * F.col(s)
        return (
            num.cast("double")
            / (F.col(n) * (F.col(n) - 1)).cast("double")
        ) / F.col(n).cast("double")

    va = var_over_n("_sya", "_syya", "_na")
    vb = var_over_n("_syb", "_syyb", "_nb")
    se2 = va + vb
    diff = mean("_sya", "_na") - mean("_syb", "_nb")
    t2 = F.when(se2 > 0, (diff * diff) / se2)
    df_w = F.when(
        se2 > 0,
        (se2 * se2)
        / (
            (va * va) / (F.col("_na") - 1).cast("double")
            + (vb * vb) / (F.col("_nb") - 1).cast("double")
        ),
    )
    return j.select(
        "g_a",
        "g_b",
        F.col("_na").cast("long").alias("n_a"),
        F.col("_nb").cast("long").alias("n_b"),
        r4(t2).alias("t2"),
        r4(df_w).alias("df_welch"),
    )


def welch_oracle_sql(series_cte: str) -> str:
    """DuckDB replay of :func:`welch_t2_pairs` — ``series_cte`` must
    produce (grp, y); HUGEINT is the DECIMAL(38,0) twin, then the same
    double expression in the same order."""
    return f"""
WITH series AS ({series_cte}),
m AS (
  SELECT CAST(grp AS VARCHAR) AS g,
         COUNT(*) AS n,
         SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(y AS HUGEINT) * CAST(y AS BIGINT)) AS syy
  FROM series GROUP BY 1
  HAVING COUNT(*) >= 2
),
j AS (
  SELECT a.g AS g_a, b.g AS g_b,
         a.n AS na, a.sy AS sya, a.syy AS syya,
         b.n AS nb, b.sy AS syb, b.syy AS syyb
  FROM m a JOIN m b ON a.g < b.g
),
calc AS (
  SELECT g_a, g_b, na, nb,
         (CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)
          - CAST(syb AS DOUBLE) / CAST(nb AS DOUBLE)) AS diff,
         ((CAST(na * syya - sya * sya AS DOUBLE)
           / CAST(na * (na - 1) AS DOUBLE)) / CAST(na AS DOUBLE)) AS va,
         ((CAST(nb * syyb - syb * syb AS DOUBLE)
           / CAST(nb * (nb - 1) AS DOUBLE)) / CAST(nb AS DOUBLE)) AS vb
  FROM j
)
SELECT g_a, g_b,
       CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CASE WHEN va + vb > 0 THEN
         (floor(((diff * diff) / (va + vb)) * 10000.0 + 0.5) / 10000.0)
       END AS t2,
       CASE WHEN va + vb > 0 THEN
         (floor((((va + vb) * (va + vb))
                 / ((va * va) / CAST(na - 1 AS DOUBLE)
                    + (vb * vb) / CAST(nb - 1 AS DOUBLE)))
                * 10000.0 + 0.5) / 10000.0)
       END AS df_welch
FROM calc
"""


def _group_cols(group_col: "str | Sequence[str]") -> list[str]:
    """Normalize the group spec — every quantile/robust operator accepts a
    single column name or a composite key (e.g. (event_type, hour) for
    seasonal baselines) and partitions every window/aggregate on the full
    tuple."""
    return [group_col] if isinstance(group_col, str) else list(group_col)


def exact_quantiles(
    df: DataFrame,
    group_col: "str | Sequence[str]",
    value_col: str,
    fractions: Sequence[tuple[int, int, str]],
) -> DataFrame:
    """Exact (num/den)-quantiles of an INTEGER column per group — SEVERAL
    fractions from ONE pass: the smallest value whose cumulative count
    reaches num/den of the total (the weighted_median_price move:
    pre-aggregate to distinct (group, value) counts so the cumulative
    window walks distinct values, then one integer ``den·cw ≥ num·tw``
    threshold pick per requested fraction — conditional aggregates over
    the same cnt/cw/tw table, so winsorize's two bounds cost the same two
    exchanges as one). Null values are excluded up front: Spark windows
    order nulls FIRST, so an unfiltered null row would inflate tw and
    shift every quantile downward (same defense as rolling_zscore_flags).
    ``fractions`` is [(num, den, out_col), ...]; returns (group, *outs).
    ``group_col`` may be a composite key (list of names)."""
    for num, den, _name in fractions:
        if not (0 < num <= den):
            raise ValueError(
                f"quantile {num}/{den} must satisfy 0 < num <= den"
            )
    gcols = _group_cols(group_col)
    cnt = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*gcols, value_col)
        .agg(F.count(F.lit(1)).alias("w"))
    )
    w_cum = (
        Window.partitionBy(*gcols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*gcols)
    c = cnt.select(
        *gcols,
        value_col,
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("w").over(w_tot).alias("tw"),
    )
    return c.groupBy(*gcols).agg(
        *[
            F.min(
                F.when(
                    F.lit(den) * F.col("cw") >= F.lit(num) * F.col("tw"),
                    F.col(value_col),
                )
            ).alias(name)
            for num, den, name in fractions
        ]
    )


def exact_quantile(
    df: DataFrame,
    group_col: "str | Sequence[str]",
    value_col: str,
    num: int = 1,
    den: int = 2,
    out_col: str = "q",
) -> DataFrame:
    """Single-fraction convenience over :func:`exact_quantiles`."""
    return exact_quantiles(df, group_col, value_col, [(num, den, out_col)])


def _lower_median(
    df: DataFrame, group_col: "str | Sequence[str]", value_col: str
) -> DataFrame:
    """Exact lower median per group — :func:`exact_quantile` at 1/2."""
    return exact_quantile(df, group_col, value_col, 1, 2, out_col="med")


def winsorize(
    df: DataFrame,
    group_col: "str | Sequence[str]",
    value_col: str,
    lo: tuple[int, int] = (5, 100),
    hi: tuple[int, int] = (95, 100),
    out_col: str | None = None,
) -> DataFrame:
    """Per-group winsorization: clip an INTEGER column to its exact
    [lo, hi] quantiles (defaults: 5th/95th percentile) — the standard
    heavy-tail taming before moment statistics (a mean/σ over winsorized
    values resists the outliers that motivate robust_center_spread, while
    keeping moment arithmetic).

    Exact: both bounds come from ONE :func:`exact_quantiles` pass
    (integer thresholds, no interpolation, nulls excluded), joined back
    broadcast (|groups| rows) and applied with greatest/least —
    deterministic in any engine. Adds ``out_col`` (default
    ``<value_col>_wins``) next to the input columns; null values pass
    through as null — explicitly guarded, because Spark's greatest/least
    SKIP nulls (greatest(NULL, lo) = lo would silently turn a missing
    value into the lower bound)."""
    out_col = out_col or f"{value_col}_wins"
    bounds = exact_quantiles(
        df,
        group_col,
        value_col,
        [(lo[0], lo[1], "_qlo"), (hi[0], hi[1], "_qhi")],
    )
    return (
        df.join(F.broadcast(bounds), _group_cols(group_col))
        .withColumn(
            out_col,
            F.when(
                F.col(value_col).isNotNull(),
                F.least(
                    F.greatest(F.col(value_col), F.col("_qlo")), F.col("_qhi")
                ),
            ),
        )
        .drop("_qlo", "_qhi")
    )


def robust_center_spread(
    df: DataFrame, group_col: "str | Sequence[str]", value_col: str
) -> DataFrame:
    """Exact robust center/spread per group: lower median and MAD (median
    absolute deviation, same lower-median rule over |v − median|) of an
    INTEGER column — the outlier-resistant alternative to mean/σ whose
    breakdown point is 50% (one corrupt sensor can drag a mean/σ profile
    arbitrarily; it moves a median/MAD profile not at all).

    All-integer: two chained exact-median passes (distinct-value
    cumulative walks, integer thresholds), a broadcast-size join of the
    per-group medians back onto the rows in between. Four exchanges
    total, every window partitioned by the group. Output: (group, med,
    mad, n_rows) — hash-exact in any engine.

    Registered as `robust_value_stats` (r6); also accepts a composite
    group key (e.g. (event_type, hour) seasonal baselines — see
    seasonal_residual_flags)."""
    gcols = _group_cols(group_col)
    med = _lower_median(df, gcols, value_col)
    dev = df.join(F.broadcast(med), gcols).select(
        *gcols,
        F.abs(F.col(value_col) - F.col("med")).alias("_adev"),
    )
    mad = (
        _lower_median(dev, gcols, "_adev")
        .withColumnRenamed("med", "mad")
    )
    n = df.groupBy(*gcols).agg(F.count(F.lit(1)).alias("n_rows"))
    return (
        med.join(mad, gcols)
        .join(n, gcols)
        .select(*gcols, "med", "mad", "n_rows")
    )


def residual_outlier(value_col: str, mad_mult: int):
    """The seasonal-residual flag predicate — |v − med| > mult·MAD over
    joined-in baseline columns. ONE definition shared by the batch
    operator below and the streaming scorer
    (streaming/jobs.py::seasonal_flags_stream): the batch==stream
    flag-set equality pinned in tests holds only while both forms apply
    the identical comparison."""
    return F.abs(F.col(value_col) - F.col("med")) > F.lit(mad_mult) * F.col(
        "mad"
    )


def seasonal_residual_flags(
    df: DataFrame,
    key_cols: Sequence[str],
    season_col,
    value_col: str,
    id_cols: Sequence[str],
    mad_mult: int = 4,
) -> DataFrame:
    """Seasonal robust anomaly detection (r7 registration queue): learn a
    per-(key, season-bucket) baseline — lower median and MAD of the
    INTEGER metric — and flag rows whose deviation exceeds
    ``mad_mult``·MAD. The season bucket (e.g. ``hour(ts)``) makes this
    the calendar-aware twin of rolling_zscore_flags: a nightly batch job
    spiking at 03:00 is NORMAL at 03:00 and anomalous at 14:00, which a
    single per-key threshold can't express; median/MAD (not mean/σ)
    keeps the learned baseline itself immune to the outliers it hunts
    (the robust_center_spread breakdown argument).

    All-integer: the baseline is two chained exact-median walks on the
    composite (key, season) group, the flag an integer comparison —
    hash-exact in any engine. Rows in groups with MAD = 0 flag on ANY
    deviation (a constant-metric season treats every departure as
    anomalous — the degenerate case is documented behavior, not an
    accident).

    Scale: the walks partition on (key, season) — finer than per-key, so
    MORE parallel; the baseline table is |keys × seasons| rows,
    broadcast back. One final scan emits flagged rows only.

    ``season_col``: a Column expression (e.g. ``F.hour("ts")``); it is
    materialized as ``season`` in the output. ``id_cols``: row identity
    columns carried through to the flagged output."""
    base = df.select(
        *id_cols, *key_cols, season_col.alias("season"), value_col
    )
    grp = [*key_cols, "season"]
    bounds = robust_center_spread(
        base.select(*grp, value_col), grp, value_col
    ).select(*grp, "med", "mad")
    return (
        base.join(F.broadcast(bounds), grp)
        .filter(residual_outlier(value_col, mad_mult))
        .select(
            *id_cols,
            *grp,
            F.col(value_col),
            "med",
            "mad",
        )
    )


def rank_normalize(
    df: DataFrame,
    value_col: str,
    group_col: "str | Sequence[str]",
    id_col: str = "doc_id",
) -> DataFrame:
    """Within-group percentile-rank normalization in permille (r8/r9
    registration queue): ``pct_permille = (rank − 1)·1000 div (n − 1)``
    with ``rank`` = SQL rank() over value within the group (ties share
    a rank, so the output is value-determined — id-independent) — the
    cross-source score-harmonization step of mixture curation: raw
    quality scores are not comparable across sources with different
    score distributions, within-source percentile ranks are (the
    classic quantile-normalization move). Singleton groups emit 0 (the
    n = 1 branch is explicit, not a division error). All-integer.

    Scale: ONE window pass partitioned by the group (count + rank over
    the same partition ordering — one exchange, no global window)."""
    groups = _group_cols(group_col)
    w = Window.partitionBy(*groups)
    w_rank = w.orderBy(F.col(value_col))
    staged = df.select(
        *groups,
        id_col,
        value_col,
        F.rank().over(w_rank).alias("_rank"),
        F.count(F.lit(1)).over(w).alias("_n"),
    )
    return staged.select(
        *groups,
        id_col,
        value_col,
        F.expr(
            "CASE WHEN _n = 1 THEN CAST(0 AS BIGINT) "
            "ELSE ((_rank - 1) * 1000) DIV (_n - 1) END"
        ).alias("pct_permille"),
    )


def rfm_segments(orders: DataFrame, n_tiles: int = 4) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary — the
    classic marketing-analytics quartile coding): per customer, the
    ``n_tiles``-quantile bucket of (a) last order date, (b) order
    count, (c) lifetime spend, plus ``segment_code = 100·r + 10·f + m``
    — 64 possible segments at quartiles, '444' the most recent,
    frequent, highest-spending cohort. Buckets are ascending (1 =
    oldest / fewest / least — consumers flip if they want "4 = best"
    on recency; stated, not implied).

    Determinism: each tile coding runs over a TOTAL order ((metric,
    custkey) — ties broken by key), and ntile's bucket-split rule
    (earlier buckets larger by at most one) is the SQL standard both
    engines implement, so the coding is hash-exact. Monetary sums in
    DECIMAL(18,2) (exact; the r2 DECIMAL lesson).

    Scale (the r9 plan-guard rewrite): the first form used three
    unpartitioned ntile windows over the per-customer aggregate —
    ledger-sized, but still ``Window…Sort…Exchange SinglePartition``
    three times, a single-task sort per metric at a billion customers
    (the repo's own plan guard rejected it). Each ntile is now
    :func:`~kinesis_stream_video_project_spark.operators.ranking.exact_ntile`
    — a range-repartitioned PARALLEL rank (one range exchange + a
    broadcast partition-offset table per metric) with ntile's
    bucket-split rule applied closed-form; bit-identical output (the
    oracle stays plain ntile SQL)."""
    from kinesis_stream_video_project_spark.operators.ranking import (
        exact_ntile,
    )

    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("_r"),
        F.count(F.lit(1)).alias("_f"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_m"),
    )
    coded = per_cust
    for metric, out in (("_r", "r_q"), ("_f", "f_q"), ("_m", "m_q")):
        coded = exact_ntile(coded, [metric, "o_custkey"], n_tiles, out)
    return coded.select(
        F.col("o_custkey").alias("custkey"),
        "r_q",
        "f_q",
        "m_q",
        (F.col("r_q") * 100 + F.col("f_q") * 10 + F.col("m_q"))
        .cast("long")
        .alias("segment_code"),
    )


def classification_report(
    df: DataFrame, actual: str = "actual", predicted: str = "predicted"
) -> DataFrame:
    """Per-class confusion report over (actual, predicted) label pairs —
    the evaluation primitive for every in-repo classifier tier (lang-ID,
    quality gates, anomaly flags): ``(label, tp, fp, fn, support,
    precision_permille, recall_permille, f1_permille)``.

    All-integer: precision = 1000·tp div (tp+fp), recall = 1000·tp div
    (tp+fn), and F1's harmonic mean clears its denominator to
    2000·tp div (2·tp + fp + fn) — exact truncating arithmetic, no
    float, hash-identical anywhere. Classes with zero predicted AND
    zero actual rows don't exist in the input and emit no row; a class
    never predicted has precision 0/0 → emitted as 0 (stated, the
    degenerate-denominator convention).

    Scale: ONE corpus aggregate to the |classes|² confusion ledger;
    every derivation after that runs on the ledger (marginals via two
    tiny re-aggregations, never a second corpus scan — the PMI
    marginals discipline)."""
    ledger = df.groupBy(
        F.col(actual).alias("_a"), F.col(predicted).alias("_p")
    ).agg(F.count(F.lit(1)).alias("_n"))
    tp = ledger.filter(F.col("_a") == F.col("_p")).select(
        F.col("_a").alias("label"), F.col("_n").alias("tp")
    )
    pred_tot = ledger.groupBy(F.col("_p").alias("label")).agg(
        F.sum("_n").alias("_pred_n")
    )
    act_tot = ledger.groupBy(F.col("_a").alias("label")).agg(
        F.sum("_n").alias("support")
    )
    return (
        act_tot.join(pred_tot, "label", "full")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce(F.col("tp"), F.lit(0)).cast("long").alias("tp"),
            (F.coalesce(F.col("_pred_n"), F.lit(0)) - F.coalesce(F.col("tp"), F.lit(0)))
            .cast("long")
            .alias("fp"),
            (F.coalesce(F.col("support"), F.lit(0)) - F.coalesce(F.col("tp"), F.lit(0)))
            .cast("long")
            .alias("fn"),
            F.coalesce(F.col("support"), F.lit(0)).cast("long").alias("support"),
        )
        .select(
            "label",
            "tp",
            "fp",
            "fn",
            "support",
            F.expr(
                "CASE WHEN tp + fp = 0 THEN 0 ELSE (1000 * tp) DIV (tp + fp) END"
            ).alias("precision_permille"),
            F.expr(
                "CASE WHEN tp + fn = 0 THEN 0 ELSE (1000 * tp) DIV (tp + fn) END"
            ).alias("recall_permille"),
            F.expr(
                "CASE WHEN 2 * tp + fp + fn = 0 THEN 0 "
                "ELSE (2000 * tp) DIV (2 * tp + fp + fn) END"
            ).alias("f1_permille"),
        )
    )


def chi_square_cells(
    df: DataFrame,
    col_a: str,
    col_b: str,
    max_cells: int = 10_000,
) -> DataFrame:
    """Chi-square independence test between two categorical columns,
    per-cell: ``(col_a, col_b, obs, row_total, col_total, n,
    contrib_milli)`` with ``contrib_milli = (1000·(obs·n − rt·ct)²)
    div (rt·ct·n)`` — Pearson's (O−E)²/E with the expected count's
    denominator cleared so every step is exact integer arithmetic
    (squares taken as DECIMAL(38,0): (obs·n − rt·ct)² ≤ n⁴, within
    DECIMAL(38,0) for n up to ~10⁸ and refused loudly above — the
    PageRank bound discipline). Sum ``contrib_milli`` for the statistic
    (the per-cell floor makes the sum a ≤|cells|-milli UNDERestimate of
    χ²·1000 — stated; the cells are the auditable artifact, exactly the
    CMS/KMV accounting discipline). Zero-observation cells are REAL
    cells of the test (their contribution is 1000·rt·ct div n) and are
    materialized by crossing the marginals, so the frame has exactly
    |A|·|B| rows — refused above ``max_cells`` (a chi-square over a
    high-cardinality pair is a modeling error, not a scale problem).

    Scale: ONE corpus aggregate to the observed ledger; marginals are
    two re-aggregations of the ledger (the PMI discipline); the
    marginal cross join is |A|·|B| ≤ max_cells rows, broadcast."""
    ledger = df.groupBy(
        F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
    ).agg(F.count(F.lit(1)).alias("obs"))
    rows = ledger.groupBy("_a").agg(F.sum("obs").alias("row_total"))
    cols = ledger.groupBy("_b").agg(F.sum("obs").alias("col_total"))
    tot = ledger.agg(
        F.sum("obs").alias("n"), F.count(F.lit(1)).alias("_n_obs_cells")
    )
    cells = (
        rows.crossJoin(F.broadcast(cols))
        .crossJoin(F.broadcast(tot))
        .join(ledger, ["_a", "_b"], "left")
        .select(
            F.col("_a").alias(col_a),
            F.col("_b").alias(col_b),
            F.coalesce(F.col("obs"), F.lit(0)).cast("long").alias("obs"),
            F.col("row_total").cast("long").alias("row_total"),
            F.col("col_total").cast("long").alias("col_total"),
            F.col("n").cast("long").alias("n"),
        )
    )
    guarded = cells.withColumn(
        "_ok",
        F.expr(
            f"CASE WHEN n <= 100000000 THEN true ELSE "
            f"raise_error('chi_square_cells: n > 1e8 would overflow the "
            f"DECIMAL(38,0) fourth power - shard the test') END"
        ),
    )
    contrib = (
        "CAST((1000 * CAST(obs * n - row_total * col_total AS DECIMAL(38,0)) "
        "* CAST(obs * n - row_total * col_total AS DECIMAL(38,0))) "
        "DIV (CAST(row_total AS DECIMAL(38,0)) * col_total * n) AS BIGINT)"
    )
    out = guarded.filter("_ok").drop("_ok").withColumn(
        "contrib_milli", F.expr(contrib)
    )
    # max_cells refusal: evaluated in-plan so the operator stays lazy —
    # a 1-row claim joined in would hide the cells; instead count via
    # the broadcast totals already present.
    marg_counts = rows.crossJoin(F.broadcast(cols)).agg(
        F.count(F.lit(1)).alias("_cells")
    )
    ok = marg_counts.select(
        F.expr(
            f"CASE WHEN _cells <= {max_cells} THEN true ELSE "
            f"raise_error(concat('chi_square_cells: ', CAST(_cells AS STRING), "
            f"' cells exceeds max_cells={max_cells} - a high-cardinality "
            f"pair is a modeling error')) END"
        ).alias("_gate")
    )
    return out.crossJoin(F.broadcast(ok)).filter("_gate").drop("_gate")


def ks_two_sample(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_1,
    group_2,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic, exact: one row
    ``(n1, n2, d_scaled, ks_permille)`` where ``d_scaled =
    max over the pooled value ledger of |cum1·n2 − cum2·n1|`` — the KS
    D statistic scaled by ``n1·n2`` so it stays INTEGER (the empirical
    CDFs only jump at pooled distinct values, so the ledger walk
    evaluates the supremum exactly), and ``ks_permille = (1000·
    d_scaled) div (n1·n2)``. No float anywhere: the classic test
    statistic made hash-checkable.

    Scale: the pooled distinct-value ledger (one aggregate), one
    cumulative window ORDERED BY VALUE — per the exact_group_percentiles
    precedent this is the audit tier: the window is unpartitioned over
    the distinct-VALUE ledger (bounded by value cardinality, not row
    count); for unbounded-cardinality columns pre-bucket into the
    DDSketch grid first (operators/ddsketch.py) and accept its bound.
    Bounds: cum·n ≤ n1·n2 ≤ BIGINT for samples to ~3·10⁹ rows each."""
    v = df.filter(F.col(group_col).isin([group_1, group_2])).select(
        F.col(value_col).alias("v"),
        F.when(F.col(group_col) == group_1, F.lit(1))
        .otherwise(F.lit(0))
        .alias("_g1"),
    )
    ledger = v.groupBy("v").agg(
        F.sum("_g1").alias("_c1"),
        (F.count(F.lit(1)) - F.sum("_g1")).alias("_c2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cums = ledger.select(
        F.sum("_c1").over(w).alias("cum1"),
        F.sum("_c2").over(w).alias("cum2"),
    )
    totals = ledger.agg(
        F.sum("_c1").cast("long").alias("n1"),
        F.sum("_c2").cast("long").alias("n2"),
    )
    return (
        cums.crossJoin(F.broadcast(totals))
        .select(
            "n1",
            "n2",
            F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")).alias(
                "_d"
            ),
        )
        .groupBy("n1", "n2")
        .agg(F.max("_d").cast("long").alias("d_scaled"))
        .withColumn(
            "ks_permille", F.expr("(1000 * d_scaled) DIV (n1 * n2)").cast("long")
        )
    )


def mann_whitney_u(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_1,
    group_2,
) -> DataFrame:
    """Two-sample Mann–Whitney U (Wilcoxon rank-sum), exact: one row
    ``(n1, n2, u1_x2, u2_x2, auc_permille)``.

    Tie handling without floats: a tie-group of ``c`` values preceded by
    ``m`` pooled values has average rank ``m + (c+1)/2``, so DOUBLED
    ranks ``2m + c + 1`` stay integer; with ``R1_x2 = Σ c1·(2m+c+1)``
    the doubled statistic is ``u1_x2 = R1_x2 − n1·(n1+1)`` (both sides
    of ``U1 = R1 − n1(n1+1)/2`` doubled). The identity
    ``u1_x2 + u2_x2 = 2·n1·n2`` is asserted in tests, and
    ``auc_permille = (1000·u1_x2) div (2·n1·n2)`` is the probability-
    of-superiority effect size (AUC), the permille form.

    Scale: identical shape to :func:`ks_two_sample` — one pooled
    distinct-value ledger, one cumulative walk over value cardinality
    (the audit-tier unpartitioned window; pre-bucket unbounded columns
    through the DDSketch grid). DECIMAL(38,0) rank-sum accumulation,
    overflow-safe far past any BIGINT sample."""
    v = df.filter(F.col(group_col).isin([group_1, group_2])).select(
        F.col(value_col).alias("v"),
        F.when(F.col(group_col) == group_1, F.lit(1))
        .otherwise(F.lit(0))
        .alias("_g1"),
    )
    ledger = v.groupBy("v").agg(
        F.sum("_g1").alias("_c1"),
        (F.count(F.lit(1)) - F.sum("_g1")).alias("_c2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    walked = ledger.select(
        "_c1",
        "_c2",
        F.coalesce(F.sum(F.col("_c1") + F.col("_c2")).over(w), F.lit(0)).alias(
            "_m"
        ),
    )
    sums = walked.agg(
        F.sum("_c1").cast("long").alias("n1"),
        F.sum("_c2").cast("long").alias("n2"),
        F.sum(
            (
                F.col("_c1")
                * (2 * F.col("_m") + F.col("_c1") + F.col("_c2") + 1)
            ).cast("decimal(38,0)")
        ).alias("_r1x2"),
    )
    return sums.select(
        "n1",
        "n2",
        F.expr("CAST(_r1x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1) AS BIGINT)").alias(
            "u1_x2"
        ),
        F.expr(
            "CAST(2 * CAST(n1 AS DECIMAL(38,0)) * n2 - "
            "(_r1x2 - CAST(n1 AS DECIMAL(38,0)) * (n1 + 1)) AS BIGINT)"
        ).alias("u2_x2"),
    ).withColumn(
        "auc_permille",
        F.expr("(1000 * u1_x2) DIV (2 * n1 * n2)").cast("long"),
    )


# Benford first-digit milli-probabilities log10(1 + 1/d), d = 1..9,
# rounded to milli — the published table (Newcomb 1881; Benford 1938).
BENFORD_MILLI = (301, 176, 125, 97, 79, 67, 58, 51, 46)


def benford_deviation(
    df: DataFrame, value_col: str, scale: int = 100
) -> DataFrame:
    """Benford's-law first-significant-digit audit of a positive value
    column: ``(digit, n_d, observed_milli, expected_milli,
    deviation_milli)`` for d = 1..9 — the classic fabricated-data /
    unit-mixing detector for financial columns (Newcomb 1881, Benford
    1938; Nigrini's forensic-accounting methodology).

    The first significant digit is extracted WITHOUT logs: the value is
    scaled to an integer (``scaled_long``, default cents) and the digit
    is the first character of its decimal rendering — exact and
    hash-identical. Values scaling to < 1 are refused loudly (they have
    no first significant digit at this scale; pick a finer scale).
    ``expected_milli`` are the published constants (module literal),
    ``observed_milli = (1000·n_d) div n``. All nine digits emit a row
    even at zero observations (the chi-square zero-cell discipline).

    Scale: one row-local digit projection + one 9-cell aggregate."""
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long

    s = scaled_long(F.col(value_col), scale)
    guarded = F.when(s >= 1, s).otherwise(
        F.expr(
            f"raise_error(concat('benford_deviation: value ', "
            f"CAST({value_col} AS STRING), ' scales below 1 at scale "
            f"{scale} - no first significant digit; use a finer scale'))"
        )
    )
    digits = df.select(
        F.substring(guarded.cast("string"), 1, 1).cast("int").alias("digit")
    )
    observed = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_d"))
    spark = df.sparkSession
    expected = spark.createDataFrame(
        [(d + 1, BENFORD_MILLI[d]) for d in range(9)],
        "digit int, expected_milli long",
    )
    tot = observed.agg(F.sum("n_d").alias("_n"))
    return (
        expected.join(F.broadcast(observed), "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce(F.col("n_d"), F.lit(0)).cast("long").alias("n_d"),
            F.expr("(1000 * coalesce(n_d, 0)) DIV _n").cast("long").alias(
                "observed_milli"
            ),
            "expected_milli",
        )
        .withColumn(
            "deviation_milli",
            (F.col("observed_milli") - F.col("expected_milli")).cast("long"),
        )
    )


def gini_concentration(
    df: DataFrame, value_col: str, entity_col: str
) -> DataFrame:
    """Gini coefficient of a value's concentration across entities
    (revenue-per-supplier inequality — the curation-mixture view of
    "is one source eating the budget"): one row
    ``(n_entities, total, gini_permille)`` with the exact rank formula
    ``G = (2·Σ i·x_i − (n+1)·Σx) / (n·Σx)`` over the ascending-sorted
    per-entity totals (x as scaled integers; Σ as DECIMAL(38,0)).
    Swapping tied values never changes ``Σ i·x_i`` (equal x), so the
    (value, entity) rank tie-break only pins determinism, not the
    result. G = 0 is perfect equality; values cluster toward 1 as one
    entity dominates.

    Scale: one per-entity aggregate (the corpus shuffle), then the
    walk runs over the |entities|-row ledger — the audit-tier
    unpartitioned window, same adjudication as the KS/U walks."""
    per_entity = df.groupBy(entity_col).agg(
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("_x")
    )
    scaled = per_entity.select(
        (F.col("_x") * 100).cast("decimal(38,0)").alias("_xc"),
        F.col(entity_col).alias("_e"),
    )
    w = Window.orderBy("_xc", "_e")
    ranked = scaled.select(
        "_xc", F.row_number().over(w).cast("long").alias("_i")
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_entities"),
        F.sum("_xc").cast("decimal(38,0)").alias("_s0"),
        F.sum(F.expr("CAST(_i AS DECIMAL(38,0)) * _xc")).alias("_s1"),
    )
    return agg.select(
        "n_entities",
        F.expr("CAST(_s0 AS BIGINT)").alias("total"),
        F.expr(
            "CAST((1000 * (2 * _s1 - (n_entities + 1) * _s0)) "
            "DIV (n_entities * _s0) AS BIGINT)"
        ).alias("gini_permille"),
    )


def acf_exact(
    df: DataFrame,
    day_col: str,
    value_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """Sample autocorrelation function at lags 1..``max_lag`` over a
    DAILY series, exact: ``(lag, n_days, acf_permille)``.

    Input is one row per day (``day_col`` DATE, ``value_col`` integer);
    missing days are the CALLER's contract (fill with zeros or
    interpolate first — gap_filled_windows is the repo's tool), because
    silently skipping gaps changes what "lag 1" means. The mean-centred
    ratio is cleared of its rational mean by multiplying numerator and
    denominator by n²:

    ``num·n² = n²·Σ x_t·x_{t+k} − n·S·(Σhead + Σtail) + (n−k)·S²``
    ``den·n² = n²·Σ x² − n·S²``          (S = Σx)

    — every term integer (DECIMAL(38,0) sums), so
    ``acf_permille = (1000·num) div den`` hash-checks; negative
    autocorrelations truncate toward zero identically in both engines
    (Spark DIV ≡ DuckDB // on BIGINT-by-positive — the tdiv contract).

    Scale: the lag join is the series against itself shifted — the
    series is the per-day LEDGER (calendar-bounded, not row-bounded),
    the audit-tier adjudication; the corpus-size work is whatever
    aggregate produced the daily series upstream."""
    if max_lag < 1:
        raise ValueError(f"acf_exact: max_lag must be >= 1, got {max_lag}")
    base = df.select(
        F.datediff(F.col(day_col), F.lit("1970-01-01")).alias("_t"),
        F.col(value_col).cast("long").alias("_x"),
    )
    tot = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.col("_x").cast("decimal(38,0)")).alias("_s"),
        F.sum(
            (F.col("_x").cast("decimal(38,0)") * F.col("_x")).cast(
                "decimal(38,0)"
            )
        ).alias("_sxx"),
    )
    lags = df.sparkSession.range(1, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    shifted = base.select(
        F.col("_t").alias("_t2"), F.col("_x").alias("_y")
    )
    pairs = (
        base.crossJoin(F.broadcast(lags))
        .join(
            shifted,
            F.col("_t2") == F.col("_t") + F.col("lag"),
            "inner",
        )
        .groupBy("lag")
        .agg(
            F.sum(
                (F.col("_x").cast("decimal(38,0)") * F.col("_y")).cast(
                    "decimal(38,0)"
                )
            ).alias("_sxy"),
            F.sum(F.col("_x").cast("decimal(38,0)")).alias("_sh"),
            F.sum(F.col("_y").cast("decimal(38,0)")).alias("_st"),
            F.count(F.lit(1)).cast("long").alias("_npairs"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .select(
            "lag",
            "n_days",
            F.expr(
                "CAST((1000 * (CAST(n_days AS DECIMAL(38,0)) * n_days * _sxy "
                "- n_days * _s * (_sh + _st) + _npairs * _s * _s)) "
                "DIV (CAST(n_days AS DECIMAL(38,0)) * n_days * _sxx "
                "- n_days * _s * _s) AS BIGINT)"
            ).alias("acf_permille"),
        )
        .orderBy("lag")
    )


def gini_impurity(
    df: DataFrame, label_col: str, group_col: str
) -> DataFrame:
    """Gini impurity of a categorical column per group — the log-free
    diversity measure (CART's split criterion; 1 − Σp² — contrast
    Shannon entropy, which the repo's no-libm oracle discipline cannot
    hash-check): ``(group, n, n_labels, impurity_permille)`` with
    ``impurity_permille = (1000·(n² − Σc²)) div n²`` — exact integer,
    0 for a pure group, approaching 1000·(1−1/L) for a uniform one.

    Scale: one corpus aggregate to the (group, label) ledger, then two
    ledger re-aggregations (the PMI marginals discipline)."""
    ledger = df.groupBy(
        F.col(group_col).alias("_g"), F.col(label_col).alias("_l")
    ).agg(F.count(F.lit(1)).alias("_c"))
    agg = ledger.groupBy("_g").agg(
        F.sum("_c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_labels"),
        F.sum(
            (F.col("_c").cast("decimal(38,0)") * F.col("_c")).cast(
                "decimal(38,0)"
            )
        ).alias("_sc2"),
    )
    return agg.select(
        F.col("_g").alias(group_col),
        "n",
        "n_labels",
        F.expr(
            "CAST((1000 * (CAST(n AS DECIMAL(38,0)) * n - _sc2)) "
            "DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("impurity_permille"),
    )


def time_weighted_avg(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    group_col: str,
    id_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average of an irregularly-sampled step series per
    group — the sampling-bias-free mean (a value holding for an hour
    must weigh 60× one holding for a minute; plain AVG weighs them
    equally; cf. the time_weight aggregate TimescaleDB/kdb expose):
    ``(group, n_events, span_us, twa_milli)``.

    Semantics (stated): the series is last-observation-carried-forward
    between events; integration runs from each event to the NEXT one,
    so the final event's value carries no weight (there is nothing to
    carry it to — callers wanting an as-of-now reading append a probe
    row). Groups with a single event have an empty integral and are
    REPORTED with span 0 and NULL twa (dropping them would hide
    exactly the sparse keys a monitoring consumer must see).

    Exact: values scale to milli integers once, ``Σ vm·dt_us``
    accumulates as DECIMAL(38,0) (a year of µs times milli-values is
    ~2^76-safe there), and ``twa_milli = Σ div span_us`` — integer end
    to end.

    Scale: one per-group window (lead) keyed on the group column, one
    aggregate. Ties on ts order by ``id_col`` (zero-width intervals
    contribute zero weight either way — the tie-break only pins the
    plan, not the value)."""
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long

    us = F.unix_micros(F.col(ts_col))
    staged = df.select(
        F.col(group_col),
        scaled_long(F.col(value_col), 1000).alias("_vm"),
        us.alias("_us"),
        F.col(id_col),
    )
    w = Window.partitionBy(group_col).orderBy("_us", id_col)
    staged = staged.withColumn("_next_us", F.lead("_us").over(w))
    return (
        staged.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.when(
                    F.col("_next_us").isNotNull(),
                    (
                        F.col("_vm").cast("decimal(38,0)")
                        * (F.col("_next_us") - F.col("_us"))
                    ).cast("decimal(38,0)"),
                )
            ).alias("_num"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("_next_us").isNotNull(),
                        F.col("_next_us") - F.col("_us"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("span_us"),
        )
        .withColumn(
            "twa_milli",
            F.expr(
                "CASE WHEN span_us > 0 THEN CAST(_num DIV span_us AS BIGINT) END"
            ),
        )
        .drop("_num")
    )


def ohlc_bars(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    bar_seconds: int = 3600,
    id_col: str = "event_id",
) -> DataFrame:
    """OHLC (open/high/low/close) bars over a value stream — the
    canonical downsampling summary (candlesticks): one row per bar
    ``(bar_start, n_events, open_milli, high_milli, low_milli,
    close_milli)`` with values as scaled milli integers.

    Determinism: open/close are ``min_by``/``max_by`` on the
    ``(epoch_us, id_col)`` pair encoded as a ZERO-PADDED string key
    (``lpad(us, 20) || lpad(id, 10)`` — lexicographic order equals
    numeric order for non-negative padded integers, and string
    ordering keys are portable where DuckDB's arg_min rejects struct
    keys and an integer encoding us·2^20+id would overflow BIGINT).
    Two quotes in the same microsecond resolve by id — contract, not
    accident.

    Scale: ONE hash aggregate keyed on the bar bucket (map-side
    combined) — no window at all."""
    from kinesis_stream_video_project_spark.functions.numeric import scaled_long

    us = F.unix_micros(F.col(ts_col))
    bar = (F.floor(us / (bar_seconds * 1_000_000)) * bar_seconds).cast("long")
    staged = df.select(
        bar.alias("bar_start"),
        scaled_long(F.col(value_col), 1000).alias("_vm"),
        us.alias("_us"),
        F.col(id_col).alias("_id"),
    )
    ordk = F.concat(
        F.lpad(F.col("_us").cast("string"), 20, "0"),
        F.lpad(F.col("_id").cast("string"), 10, "0"),
    )
    return staged.withColumn("_ord", ordk).groupBy("bar_start").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min_by("_vm", F.col("_ord")).cast("long").alias("open_milli"),
        F.max("_vm").cast("long").alias("high_milli"),
        F.min("_vm").cast("long").alias("low_milli"),
        F.max_by("_vm", F.col("_ord")).cast("long").alias("close_milli"),
    )


def proportion_ztest_vs_global(
    df: DataFrame,
    group_col: str,
    success: Column,
    trial: Column,
    z2: int = 4,
) -> DataFrame:
    """Per-group two-sided proportion test against the GLOBAL rate —
    the experiment-readout / segment-anomaly primitive ("does this
    nation's conversion rate differ significantly from the corpus
    rate?"), made hash-checkable by clearing every denominator: the
    classic one-sample z-test z² = (p̂−p₀)² / (p₀(1−p₀)/n) with
    p̂ = x/n, p₀ = X/N becomes the ALL-INTEGER comparison

        (x·N − n·X)² · N  >  z² · X · (N−X) · n · N    (÷ both by N³n²)

    …which after cancelling one N is evaluated here as
    ``(x·N − n·X)² > z² · X · (N−X) · n`` in DECIMAL(38,0) — no
    division, no sqrt, no float anywhere (z² = 4 is the two-sided 95%
    bound z = 1.96 rounded up — stated, conservative).

    Emits ``(group, successes, trials, rate_permille, global_permille,
    significant)``; permilles are truncating-integer observability
    columns, the decision uses the exact comparison.

    Exactness bound, refused loudly in-plan (the hits_bipartite
    discipline): the squared term must stay inside DECIMAL(38,0), so
    the plan raises when x·N could reach 10^19 — at corpus sizes past
    that (N·n > 10^19), run the test per-partition-of-time or sampled;
    silent wraparound would flip decisions.

    Scale: one group-keyed aggregate + a broadcast 1-row global join —
    the |groups|-row ledger discipline; nothing scales with rows after
    the first map-side-combined aggregate."""
    per = df.groupBy(F.col(group_col).alias("group")).agg(
        F.sum(success.cast("long")).cast("long").alias("successes"),
        F.sum(trial.cast("long")).cast("long").alias("trials"),
    )
    glob = per.agg(
        F.sum("successes").cast("long").alias("_X"),
        F.sum("trials").cast("long").alias("_N"),
    )
    d = "CAST({} AS DECIMAL(38,0))"
    x, n, X, N = (d.format(c) for c in ("successes", "trials", "_X", "_N"))
    guard = F.expr(
        f"CASE WHEN {x} * {N} >= CAST(1e19 AS DECIMAL(38,0)) OR "
        f"{n} * {X} >= CAST(1e19 AS DECIMAL(38,0)) THEN "
        "raise_error('proportion_ztest_vs_global: x*N exceeds the "
        "DECIMAL(38,0) exactness bound - test per time-partition') "
        "ELSE 0 END"
    )
    diff = f"({x} * {N} - {n} * {X})"
    rhs = f"(CAST({z2} AS DECIMAL(38,0)) * {X} * ({N} - {X}) * {n})"
    return (
        per.join(F.broadcast(glob))
        .withColumn("_g", guard)
        .select(
            "group",
            "successes",
            "trials",
            F.expr("CAST((successes * 1000) DIV trials AS BIGINT)").alias(
                "rate_permille"
            ),
            F.expr("CAST((_X * 1000) DIV _N AS BIGINT)").alias(
                "global_permille"
            ),
            (
                F.expr(f"{diff} * {diff}") + F.col("_g")
                > F.expr(rhs)
            ).alias("significant"),
        )
    )
