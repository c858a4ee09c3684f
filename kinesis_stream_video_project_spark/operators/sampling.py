"""Dataset sampling & splitting — the curation ops a training-data pipeline
runs before anything else at 100 TB.

The core primitive is **content-hash bucketing** (md5 of a stable key →
bucket in [0,100)): unlike `df.sample()`, the assignment is a pure function
of the row's key, so it is

* reproducible across runs, engines, Spark versions and partitionings
  (md5 is identical everywhere; `rand()`-based sampling is not);
* stable under re-ingestion — a document keeps its split when the corpus is
  rebuilt, which is what keeps eval sets uncontaminated over time;
* embarrassingly parallel — a narrow projection, no shuffle, no state.

`pmod`-style arithmetic on the first 8 hex chars gives 2^32 buckets folded
to 100; the skew between buckets is O(2^-32), irrelevant at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5 of the key's string
    form. Portable: DuckDB's ``md5`` produces the identical hex, so
    bucket-based queries stay oracle-checkable."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("bigint")
        % n_buckets
    )


def deterministic_sample(
    df: DataFrame, key: str, percent: int, n_buckets: int = 100
) -> DataFrame:
    """Keep rows whose hash bucket < percent — a stable `percent`% sample."""
    return df.filter(hash_bucket(F.col(key), n_buckets) < percent)


def train_test_split(
    df: DataFrame,
    key: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign each row a split label (train/val/test) by hash bucket.

    Returned as a column rather than three DataFrames so one pass writes a
    partitioned layout (`partitionBy("split")`) instead of scanning thrice.
    """
    b = hash_bucket(F.col(key))
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame, strata_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum sampling via ``sampleBy`` (e.g. downweight a dominant
    language). Seeded => deterministic within Spark, but engine-specific —
    verified by property tests (per-stratum rates), not the SQL oracle.
    Prefer :func:`stratified_sample_hashed` in pipelines: same rates, but
    reproducible across engines and corpus rebuilds."""
    return df.sampleBy(strata_col, fractions=fractions, seed=seed)


def stratified_sample_hashed(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key: str,
    n_buckets: int = 100,
) -> DataFrame:
    """Per-stratum sampling by content-hash bucket: keep a row when its
    key's bucket falls below ``fraction * n_buckets`` for its stratum.

    Same reproducibility contract as :func:`deterministic_sample` (pure
    function of the key — stable across engines, runs and re-ingestion),
    which ``sampleBy``'s seeded Bernoulli draw cannot give. Strata missing
    from ``fractions`` are dropped, matching ``sampleBy``.
    """
    b = hash_bucket(F.col(key), n_buckets)
    threshold = None
    for stratum, frac in fractions.items():
        cut = int(round(frac * n_buckets))
        cond = F.col(strata_col) == stratum
        threshold = (
            F.when(cond, cut) if threshold is None else threshold.when(cond, cut)
        )
    threshold = threshold.otherwise(0) if threshold is not None else F.lit(0)
    return df.filter(b < threshold)


def weighted_sample(
    df: DataFrame, key: str, weight: Column, n_buckets: int = 10000
) -> DataFrame:
    """Per-ROW weighted Bernoulli sampling, deterministically: keep a row
    iff ``hash_bucket(key, n_buckets) < weight * n_buckets`` for a weight
    column in [0, 1]. The per-row generalization of
    :func:`stratified_sample_hashed` (whose rates are per-stratum
    constants): quality-proportional downsampling — a 0.9-quality doc is
    kept with ~90% probability, a 0.2 doc with ~20% — while staying a pure
    function of (key, weight): reproducible across engines, runs,
    partitionings and corpus rebuilds, and oracle-checkable (DuckDB
    computes the identical md5 bucket and the identical IEEE product).
    10k buckets give 4 digits of rate resolution; no shuffle, no rand()."""
    return df.filter(
        hash_bucket(F.col(key), n_buckets) < weight * float(n_buckets)
    )


def stratified_allocation(
    df: DataFrame,
    strata_col: str,
    budget: int,
    key: str,
) -> DataFrame:
    """EXACT-count stratified sample allocation by Hamilton's
    largest-remainder method — the missing piece between the rate-based
    samplers above (whose per-stratum yields are binomial-approximate)
    and the mixture tier's token budgets: split a row budget of exactly
    ``budget`` across strata proportionally, with the apportionment
    rounding done the way electoral apportionment does it. Per stratum:
    quota = budget·n_s / N; every stratum gets floor(quota); the
    ``budget − Σ floors`` leftover seats go to the largest remainders
    (budget·n_s mod N, ties by stratum ascending). Σ alloc == budget
    EXACTLY whenever budget ≤ N (asserted by the gate test, not
    re-derived per run), which no independent per-stratum rounding can
    promise.

    The sample itself is the allocation applied to the content-hash
    order (rank by (md5-bucket of ``key``, key) within stratum ≤ alloc)
    — deterministic across engines, runs, and partitionings like every
    sampler in this module. Output one row per stratum:
    ``(stratum, n_rows, alloc, n_sampled)`` with n_sampled == alloc
    for budget ≤ N (strata smaller than their allocation cannot occur:
    alloc ≤ ceil(quota) ≤ n_s whenever budget ≤ N).

    Scale: the allocation table is |strata| rows computed from one
    per-stratum count aggregate (windows run over that tiny frame, not
    rows); the sampling rank is a window PER STRATUM over the data —
    the one row-scale window, keyed on the stratum like every
    per-group top-k in the repo."""
    if budget < 0:
        raise ValueError(f"stratified_allocation: budget must be >= 0, got {budget}")
    from pyspark.sql import Window

    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    total = counts.agg(F.sum("n_rows").cast("long").alias("_n"))
    base = (
        counts.crossJoin(F.broadcast(total))
        .withColumn("_floor", F.expr(f"CAST(({budget} * n_rows) DIV _n AS BIGINT)"))
        .withColumn("_rem", F.expr(f"CAST(({budget} * n_rows) % _n AS BIGINT)"))
    )
    w_total = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_rem = Window.orderBy(F.col("_rem").desc(), F.col("stratum").asc())
    alloc = (
        base.withColumn("_leftover", F.lit(budget) - F.sum("_floor").over(w_total))
        .withColumn("_pos", F.row_number().over(w_rem))
        .withColumn(
            "alloc",
            (
                F.col("_floor")
                + F.when(F.col("_pos") <= F.col("_leftover"), 1).otherwise(0)
            ).cast("long"),
        )
        .select("stratum", "n_rows", "alloc")
    )
    w_sample = Window.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(key), 1_000_000).asc(), F.col(key).asc()
    )
    sampled = (
        df.withColumn("_rk", F.row_number().over(w_sample))
        .join(
            alloc.select(
                F.col("stratum").alias(strata_col), F.col("alloc").alias("_a")
            ),
            strata_col,
        )
        .filter(F.col("_rk") <= F.col("_a"))
        .groupBy(F.col(strata_col).alias("stratum"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_sampled"))
    )
    return (
        alloc.join(sampled, "stratum", "left")
        .select(
            "stratum",
            "n_rows",
            "alloc",
            F.coalesce("n_sampled", F.lit(0)).cast("long").alias("n_sampled"),
        )
    )


def priority_sample(
    df: DataFrame,
    key: str,
    weight: Column,
    k: int,
    group_col: "str | None" = None,
) -> DataFrame:
    """Weighted-without-replacement top-k PRIORITY SAMPLE
    (Duffield/Lund/Thorup, JACM 2007: draw u ~ U(0,1] per item, keep
    the k largest priorities w/u) — the weight-aware upgrade of
    :func:`deterministic_sample`: a doc with twice the weight is ~twice
    as likely to make the sample, and the sample is STILL a pure
    function of (key, weight), so it is reproducible across engines,
    runs and corpus rebuilds, unlike any rand()-based draw.

    The uniform is the md5-derived 48-bit rank of the key (the repo's
    portable-hash rule), and the comparison keeps all-integer exactness
    by ranking on the INVERTED priority ``u48 DIV w`` ascending (w/u
    descending ⇔ u/w ascending; integer division only coarsens ties,
    which the (priority, key) total order then breaks
    deterministically). Weights must be positive integers — refused
    loudly otherwise (in-plan ``raise_error``; a zero weight would
    silently win every sample under DIV).

    Returns ``(key, weight, priority)`` rows of the sample, plus the
    group column when given.

    Scale: global form compiles to TakeOrderedAndProject — a MERGEABLE
    per-partition top-k, no corpus shuffle at any size (the 100 TB
    reason priority sampling exists: DLT §1 — k bounded, one pass,
    union-mergeable across shards). Grouped form is one window keyed on
    the group — the per-group top-k discipline."""
    if k <= 0:
        raise ValueError(f"priority_sample: k must be positive, got {k}")
    w = weight.cast("long")
    # NULL is guarded explicitly: `w <= 0` is NULL (not true) for a NULL
    # weight, so without the isNull arm a NULL-weight row would bypass
    # the raise, get a NULL priority, and under ASC NULLS FIRST silently
    # win every sample slot (ADVICE r10).
    guarded = F.when(
        w.isNull() | (w <= 0),
        F.raise_error(
            F.concat(
                F.lit("priority_sample: non-positive or NULL weight for key "),
                F.coalesce(F.col(key).cast("string"), F.lit("NULL")),
            )
        ).cast("long"),
    ).otherwise(w)
    u48 = F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 12), 16, 10
    ).cast("bigint")
    staged = df.select(
        *([group_col] if group_col else []),
        F.col(key),
        guarded.alias("weight"),
        u48.alias("_u48"),
    ).select(
        *([group_col] if group_col else []),
        key,
        "weight",
        F.expr("_u48 DIV weight").cast("long").alias("priority"),
    )
    if group_col is None:
        return staged.orderBy("priority", key).limit(k)
    from pyspark.sql import Window

    w_grp = Window.partitionBy(group_col).orderBy("priority", key)
    return (
        staged.withColumn("_rk", F.row_number().over(w_grp))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
