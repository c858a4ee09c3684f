"""AMS "tug-of-war" sketch: fixed-memory estimation of the second
frequency moment F₂ = Σₖ cₖ² (Alon, Matias & Szegedy, STOC 1996 — the
paper that founded the streaming-sketch field). The self-join size /
repeat-rate estimator that completes the sketch shelf next to HLL/KMV
(F₀), Count-Min (point frequencies), and Space-Saving (top-k).

Each estimator r keeps ONE integer Xᵣ = Σ_rows sign(key, r): every
arrival adds ±1, the sign a pure function of (r, key) via portable md5
parity — one md5 BLOCK DIGEST per 32 estimators, estimator r reading
the parity of hex digit r MOD 32 (one hash evaluation per row at the
default R = 16; the per-estimator-md5 form measured 6× slower at sf0.1
for no extra independence — md5's digits are the randomness either
way). DuckDB derives bit-identical registers, so the sketch itself is
driver-hash-checkable.
E[Xᵣ²] = F₂ exactly; Var[Xᵣ²] ≤ 2·F₂², so the mean of R independent
estimators has relative sd ≤ √(2/R) (R = 16 ⇒ ~35%).

100 TB story: the sketch pass is ONE aggregate with R sum expressions —
map-side partial combine reduces every partition to R integers, the
shuffle moves R values total. The exact-F₂ companion (carried next to
the estimate, the CMS measured-error discipline) needs the one groupBy
shuffle on the key; at true scale you keep only the sketch and drop the
exact pass — here both are emitted so the error is measured, not
assumed. Registers ride as DECIMAL(38,0): |Xᵣ| is bounded by n_rows, so
Xᵣ² needs headroom beyond BIGINT once n_rows passes ~3·10⁹.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.numeric import r4


def ams_block_hash(key: Column, block: int) -> Column:
    """One md5 hex digest serving 32 estimators (block = r DIV 32):
    estimator r's sign is the parity of hex digit ``r MOD 32``. One
    hash evaluation per row covers the default R = 16 — the r12 replan
    that took the registered sketch from 6.0 to ~1 s warm at sf0.1 (16
    per-row md5 calls collapsed into one; the digits of one md5 are as
    independent as sixteen md5s for the √(2/R) bound, which is already
    a randomness-of-md5 argument). Identical in DuckDB:
    ``md5(block || ':' || CAST(k AS VARCHAR))``."""
    return F.md5(F.concat(F.lit(f"{block}:"), key.cast("string")))


def ams_sign_from_hash(h: Column, r: int) -> Column:
    """Estimator ``r``'s ±1 sign from its block digest: parity of hex
    digit ``r MOD 32`` (DuckDB:
    ``CASE WHEN ('0x' || substr(h, (r % 32) + 1, 1))::BIGINT % 2 = 0
    THEN 1 ELSE -1 END``)."""
    parity = (
        F.conv(F.substring(h, (r % 32) + 1, 1), 16, 10).cast("bigint") % 2
    )
    return F.when(parity == 0, F.lit(1)).otherwise(F.lit(-1))


def ams_f2_report(df: DataFrame, key: str, n_estimators: int = 16) -> DataFrame:
    """One-row F₂ report: ``(n_rows, n_keys, f2_exact, f2_est,
    est_over_exact)`` — the AMS mean-of-R estimate next to the exact
    moment, ratio r4-rounded. ``f2_est`` is the truncating integer mean
    of the R squared registers (sums positive, so Spark DIV and DuckDB
    // agree)."""
    if not (1 <= n_estimators <= 64):
        raise ValueError(
            f"n_estimators must be in 1..64, got {n_estimators}"
        )
    k = F.col(key)
    n_blocks = (n_estimators + 31) // 32
    # Block digests projected into their OWN columns before the
    # aggregate (the _hs multi-reference rule): each digest feeds up to
    # 32 sign expressions, and without the projection every sum term
    # would re-evaluate the md5 per row.
    hashed = df.select(
        *[ams_block_hash(k, b).alias(f"_h{b}") for b in range(n_blocks)]
    )
    sketch = hashed.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(
                ams_sign_from_hash(F.col(f"_h{r // 32}"), r).cast(
                    "decimal(38,0)"
                )
            ).alias(f"_x{r}")
            for r in range(n_estimators)
        ],
    )
    sq_sum = None
    for r in range(n_estimators):
        term = F.col(f"_x{r}") * F.col(f"_x{r}")
        sq_sum = term if sq_sum is None else sq_sum + term
    est = sketch.select(
        F.col("_n").cast("long").alias("n_rows"),
        # floor == truncation here (squares are non-negative), matching
        # DuckDB's truncating // — a decimal CAST would HALF_UP-round.
        F.floor(sq_sum / F.lit(n_estimators)).cast("long").alias("f2_est"),
    )
    exact = (
        df.groupBy(k.alias("_k"))
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_keys"),
            F.sum(F.col("_c") * F.col("_c")).cast("long").alias("f2_exact"),
        )
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "n_rows",
        "n_keys",
        "f2_exact",
        "f2_est",
        r4(F.col("f2_est").cast("double") / F.col("f2_exact")).alias(
            "est_over_exact"
        ),
    )


def ams_oracle_sql(table: str, key: str, n_estimators: int = 16) -> str:
    """DuckDB replay of :func:`ams_f2_report` — generated from the same
    constants as the Spark side (hash family, R, truncating mean)."""
    n_blocks = (n_estimators + 31) // 32
    digests = ",\n         ".join(
        f"md5('{b}:' || CAST({key} AS VARCHAR)) AS h{b}"
        for b in range(n_blocks)
    )
    signs = ",\n         ".join(
        f"SUM(CASE WHEN ('0x' || substr(h{r // 32}, {(r % 32) + 1}, 1))::BIGINT % 2 = 0 THEN 1 ELSE -1 END) AS x{r}"
        for r in range(n_estimators)
    )
    sq = " + ".join(f"x{r} * x{r}" for r in range(n_estimators))
    return f"""
WITH hashed AS (
  SELECT {digests}
  FROM {table}
),
sketch AS (
  SELECT COUNT(*) AS n,
         {signs}
  FROM hashed
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(c * c) AS BIGINT) AS f2_exact
  FROM (SELECT {key}, COUNT(*) AS c FROM {table} GROUP BY 1)
)
SELECT CAST(n AS BIGINT) AS n_rows,
       n_keys,
       f2_exact,
       CAST(({sq}) // {n_estimators} AS BIGINT) AS f2_est,
       (floor((CAST(({sq}) // {n_estimators} AS DOUBLE) / f2_exact)
              * 10000.0 + 0.5) / 10000.0) AS est_over_exact
FROM sketch, exact
"""


def _ams_side_sketch(
    df: DataFrame, key: str, n_estimators: int, prefix: str
) -> DataFrame:
    """One side's 1-row sketch frame: row count, F₂-exact companion
    inputs, and the R tug-of-war registers (same block-digest family as
    :func:`ams_f2_report`, so two sides sketched independently are
    inner-product-compatible)."""
    k = F.col(key)
    n_blocks = (n_estimators + 31) // 32
    hashed = df.select(
        *[ams_block_hash(k, b).alias(f"_h{b}") for b in range(n_blocks)]
    )
    return hashed.agg(
        F.count(F.lit(1)).cast("long").alias(f"n_{prefix}"),
        *[
            F.sum(
                ams_sign_from_hash(F.col(f"_h{r // 32}"), r).cast("long")
            ).alias(f"_{prefix}{r}")
            for r in range(n_estimators)
        ],
    )


def ams_join_size(
    dfa: DataFrame,
    key_a: str,
    dfb: DataFrame,
    key_b: str,
    n_estimators: int = 16,
) -> DataFrame:
    """AMS inner-product JOIN-SIZE estimate — the 1996 paper's headline
    application beyond F₂: with both relations sketched under the SAME
    sign family, E[Xᵣᴬ·Xᵣᴮ] = Σₖ fₐ(k)·f_b(k) = |A ⋈ₖ B|, so the mean
    of the R register products estimates the equi-join cardinality
    without touching the join. The query-optimizer primitive: two
    single-pass sketches (each shuffles R integers) replace the join
    whose size is being asked about.

    Emits ONE row: ``(n_a, n_b, f2_a, f2_b, join_size, est_num, est,
    ratio, within_3sd)`` — the exact join size (the measured-error
    companion, one counts-join at oracle scale), the raw register
    inner product ``est_num`` (exact integer, hash-checkable), its
    truncating mean ``est``, the r4 ratio, and the Chebyshev claim
    ``within_3sd``: (est_num − R·J)² ≤ 9·(2·F₂(A)·F₂(B)·R), the
    paper's own variance bound Var[est] ≤ 2·F₂(A)·F₂(B)/R at 3σ —
    evaluated in EXACT integer arithmetic, no float anywhere. Measured
    |err|/σ on the fixtures: 1.63 / 0.26 / 0.06 at sf0.001/0.01/0.1
    (the estimator is honestly NOISY when J ≪ √(F₂F₂) — stated; at 3σ
    the claim held at every SF).

    Overflow envelope, ENFORCED IN-PLAN: the claim's right side is
    288·F₂(A)·F₂(B); a raise_error branch refuses F₂ > 10⁸ (the BIGINT
    boundary — at that scale lift the claim to DECIMAL; DuckDB errors
    natively on BIGINT overflow, Spark would wrap silently without the
    guard). The |d| > 1.7·10⁹ case short-circuits to FALSE before
    squaring on BOTH engines for the same reason.

    Scale: two independent single-pass aggregates (R integers each),
    one broadcast-cross of three 1-row frames; the exact companion is
    the only key-shuffle and exists to measure the error."""
    if not (1 <= n_estimators <= 64):
        raise ValueError(
            f"n_estimators must be in 1..64, got {n_estimators}"
        )
    R = n_estimators
    sk_a = _ams_side_sketch(dfa, key_a, R, "a")
    sk_b = _ams_side_sketch(dfb, key_b, R, "b")
    ca = dfa.groupBy(F.col(key_a).alias("_k")).agg(
        F.count(F.lit(1)).alias("_ca")
    )
    cb = dfb.groupBy(F.col(key_b).alias("_k")).agg(
        F.count(F.lit(1)).alias("_cb")
    )
    exact = (
        ca.join(cb, "_k")
        .agg(
            F.coalesce(F.sum(F.col("_ca") * F.col("_cb")), F.lit(0))
            .cast("long")
            .alias("join_size")
        )
        .crossJoin(
            F.broadcast(
                ca.agg(
                    F.sum(F.col("_ca") * F.col("_ca"))
                    .cast("long")
                    .alias("f2_a")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                cb.agg(
                    F.sum(F.col("_cb") * F.col("_cb"))
                    .cast("long")
                    .alias("f2_b")
                )
            )
        )
    )
    prod = " + ".join(f"_a{r} * _b{r}" for r in range(R))
    claim = (
        f"CASE WHEN f2_a > 100000000 OR f2_b > 100000000 THEN "
        f"raise_error('ams_join_size: F2 beyond the BIGINT claim "
        f"envelope (1e8) - lift the Chebyshev claim to DECIMAL') "
        f"WHEN abs(est_num - {R}L * join_size) > 1700000000 THEN false "
        f"ELSE (est_num - {R}L * join_size) * (est_num - {R}L * join_size) "
        f"<= {18 * R}L * f2_a * f2_b END"
    )
    return (
        sk_a.crossJoin(F.broadcast(sk_b))
        .crossJoin(F.broadcast(exact))
        .select(
            "n_a",
            "n_b",
            "f2_a",
            "f2_b",
            "join_size",
            F.expr(prod).cast("long").alias("est_num"),
            *[],
        )
        .select(
            "n_a",
            "n_b",
            "f2_a",
            "f2_b",
            "join_size",
            "est_num",
            F.expr(f"est_num DIV {R}").cast("long").alias("est"),
            # NULL ratio on an empty true join (disjoint key domains) —
            # a double x/0 would be ±Infinity/NaN with engine-specific
            # rendering; the claim column still reports estimator error.
            F.when(
                F.col("join_size") > 0,
                r4(
                    F.expr(f"CAST(est_num DIV {R} AS DOUBLE)")
                    / F.col("join_size").cast("double")
                ),
            ).alias("ratio"),
            F.expr(claim).alias("within_3sd"),
        )
    )


def ams_join_size_oracle_sql(
    table_a: str,
    key_a: str,
    table_b: str,
    key_b: str,
    n_estimators: int = 16,
) -> str:
    """DuckDB replay of :func:`ams_join_size` — same block-digest
    family, same exact-integer Chebyshev claim (DuckDB's native BIGINT
    overflow error plays the role of the Spark-side raise_error
    envelope guard)."""
    R = n_estimators
    n_blocks = (R + 31) // 32

    def side(table: str, key: str, p: str) -> str:
        digests = ", ".join(
            f"md5('{b}:' || CAST({key} AS VARCHAR)) AS h{b}"
            for b in range(n_blocks)
        )
        signs = ",\n         ".join(
            f"SUM(CASE WHEN ('0x' || substr(h{r // 32}, {(r % 32) + 1}, 1))::BIGINT % 2 = 0 THEN 1 ELSE -1 END) AS {p}{r}"
            for r in range(R)
        )
        return (
            f"hashed_{p} AS (SELECT {digests} FROM {table}),\n"
            f"sk_{p} AS (SELECT COUNT(*) AS n_{p},\n         {signs}\n"
            f"  FROM hashed_{p})"
        )

    prod = " + ".join(f"a{r} * b{r}" for r in range(R))
    return f"""
WITH {side(table_a, key_a, 'a')},
{side(table_b, key_b, 'b')},
ca AS (SELECT {key_a} AS k, COUNT(*) AS c FROM {table_a} GROUP BY 1),
cb AS (SELECT {key_b} AS k, COUNT(*) AS c FROM {table_b} GROUP BY 1),
exact AS (
  SELECT COALESCE((SELECT CAST(SUM(ca.c * cb.c) AS BIGINT)
                   FROM ca JOIN cb USING (k)), 0) AS join_size,
         (SELECT CAST(SUM(c * c) AS BIGINT) FROM ca) AS f2_a,
         (SELECT CAST(SUM(c * c) AS BIGINT) FROM cb) AS f2_b
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       f2_a, f2_b, join_size,
       CAST({prod} AS BIGINT) AS est_num,
       CAST(({prod}) // {R} AS BIGINT) AS est,
       (CASE WHEN join_size > 0 THEN
          (floor((CAST(({prod}) // {R} AS DOUBLE) / join_size)
                 * 10000.0 + 0.5) / 10000.0) END) AS ratio,
       (CASE WHEN abs(CAST({prod} AS BIGINT) - {R} * join_size) > 1700000000
             THEN false
             ELSE (CAST({prod} AS BIGINT) - {R} * join_size)
                  * (CAST({prod} AS BIGINT) - {R} * join_size)
                  <= {18 * R} * f2_a * f2_b END) AS within_3sd
FROM sk_a, sk_b, exact
"""
