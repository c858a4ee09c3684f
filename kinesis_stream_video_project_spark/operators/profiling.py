"""Column profiling and snapshot drift detection — the ingestion-quality
audits a training pipeline runs on every new data drop (is this shard
shaped like the last one, or did an upstream schema/null-rate/cardinality
regression slip in).

Two designs exist in the repo for per-column profiles; each is right at a
different column count:

* ``table_profile`` (plans/queries_relational3.py): ONE multi-aggregate
  over named columns + ``stack`` unpivot — a single scan, but every extra
  ``countDistinct`` column multiplies the aggregate's Expand fan-out
  (Spark plans n distinct aggregates as an n-way row expansion).
* :func:`column_profile` (here): MELT first — explode each row into
  (col_name, rendered value) pairs, then one groupBy(col_name) with a
  SINGLE distinct aggregate. The Generate multiplies rows by |cols| just
  like Expand would, but the distinct machinery stays one-dimensional
  regardless of column count, and the shuffle is keyed on (col_name,
  value) — the postings discipline. Preferred for wide tables.

Registration note: operator + pytest in round 5; registry entries queued
for the round-6 driver window (plans/registry.py header).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column ``(col_name, n_rows, n_non_null, n_distinct)`` in one
    melt + one aggregate. Values are profiled on their rendered string
    (cast) — null stays null through the cast, so the non-null count is
    exact; distinct-on-rendered equals distinct-on-value for the fixture
    types (integers, strings, timestamps; doubles render uniquely per
    distinct double)."""
    if cols is None:
        cols = df.columns
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("m")
    ).select("m.col_name", "m.val")
    return melted.groupBy("col_name").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_non_null"),
        F.countDistinct("val").alias("n_distinct"),
    )


def profile_drift(
    a: DataFrame,
    b: DataFrame,
    cols: list[str] | None = None,
    null_rate_pp_threshold: int = 5,
) -> DataFrame:
    """Snapshot drift report: join the two snapshots' profiles per column
    and flag null-rate shifts — all-integer (the null-rate comparison is
    cross-multiplied: |nn_a·nr_b − nn_b·nr_a| · 100 > pp · nr_a·nr_b ⟺
    the null-rate difference exceeds ``pp`` percentage points), so the
    report is hash-exact in any engine.

    Output per column: the six profile counts from both sides,
    ``null_rate_shifted`` (boolean, never null — a column present on only
    one side is SCHEMA drift, reported by its one-sided counts, not a
    null-rate shift, so the flag coalesces to false there; a nullable
    boolean would also render asymmetrically across engines, 'None' vs
    'nan', and break the driver's rendered-value hash), and
    ``distinct_ratio_num/den`` — the
    cardinality ratio n_distinct_a·n_rows_b vs n_distinct_b·n_rows_a as
    an exact rational pair for the consumer to threshold. Columns present
    in only one snapshot (schema drift) surface via the full-outer join
    with nulls on the missing side — the loudest possible signal, which
    is why the default column set is the UNION of both schemas (an
    intersection default would silently hide exactly the added/dropped
    column the report exists to catch); each side profiles only the
    columns it has."""
    if cols is None:
        cols = list(a.columns) + [c for c in b.columns if c not in set(a.columns)]
    pa = column_profile(a, [c for c in cols if c in a.columns]).select(
        "col_name",
        F.col("n_rows").alias("n_rows_a"),
        F.col("n_non_null").alias("n_non_null_a"),
        F.col("n_distinct").alias("n_distinct_a"),
    )
    pb = column_profile(b, [c for c in cols if c in b.columns]).select(
        "col_name",
        F.col("n_rows").alias("n_rows_b"),
        F.col("n_non_null").alias("n_non_null_b"),
        F.col("n_distinct").alias("n_distinct_b"),
    )
    j = pa.join(pb, "col_name", "full_outer")
    lhs = F.abs(
        F.col("n_non_null_a") * F.col("n_rows_b")
        - F.col("n_non_null_b") * F.col("n_rows_a")
    ) * F.lit(100)
    rhs = (
        F.lit(null_rate_pp_threshold) * F.col("n_rows_a") * F.col("n_rows_b")
    )
    return j.select(
        "col_name",
        "n_rows_a",
        "n_non_null_a",
        "n_distinct_a",
        "n_rows_b",
        "n_non_null_b",
        "n_distinct_b",
        F.coalesce(lhs > rhs, F.lit(False)).alias("null_rate_shifted"),
        (F.col("n_distinct_a") * F.col("n_rows_b")).alias("distinct_ratio_num"),
        (F.col("n_distinct_b") * F.col("n_rows_a")).alias("distinct_ratio_den"),
    )


def join_size_profile(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_key: str | None = None,
    right_key: str | None = None,
) -> DataFrame:
    """Exact join-cardinality and skew profile WITHOUT materializing the
    join — the planning statistic a 100 TB shuffle needs BEFORE running:
    ``|A ⋈ B| = Σ_k cA(k)·cB(k)`` over per-key counts, so the profile
    costs two key-count aggregates plus a join of the (tiny relative to
    the data) distinct-key frames, never the cross-product rows. This is
    what decides broadcast vs shuffle vs salt: ``join_rows`` sizes the
    output, ``max_key_rows`` (the largest single key's contribution) is
    the straggler-task bound a hash join would hit, and
    ``max_key_share_permille`` says whether AQE skew-split or manual
    salting is warranted (the CBO's ndv/multiplicity estimate, computed
    exactly — the audit twin of the sampled estimate a planner uses).

    One output row::

        n_left, n_right, n_common_keys, join_rows,
        max_key, max_key_rows, max_key_share_permille

    ``max_key`` ties break to the SMALLEST key with the max contribution
    (a min over the ledger-sized per-key frame — deterministic without
    max_by, whose tie order is engine-defined). All-integer; the row
    product sums as DECIMAL(38,0) (overflow-proof profile) and casts
    back to BIGINT — a join_rows near 2^63 is a join you must not run
    anyway.
    """
    lk = left_key or key
    rk = right_key or key
    la = left.groupBy(F.col(lk).alias("k")).agg(F.count(F.lit(1)).alias("cl"))
    ra = right.groupBy(F.col(rk).alias("k")).agg(F.count(F.lit(1)).alias("cr"))
    per_key = la.join(ra, "k").select(
        "k", (F.col("cl") * F.col("cr")).alias("rows_k")
    )
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_common_keys"),
        F.sum(F.col("rows_k").cast("decimal(38,0)"))
        .cast("long")
        .alias("join_rows"),
        F.max("rows_k").alias("max_key_rows"),
    )
    top = (
        per_key.join(
            F.broadcast(stats.select("max_key_rows")),
            per_key["rows_k"] == F.col("max_key_rows"),
        )
        .agg(F.min("k").alias("max_key"))
    )
    n_l = left.agg(F.count(F.lit(1)).alias("n_left"))
    n_r = right.agg(F.count(F.lit(1)).alias("n_right"))
    return (
        stats.crossJoin(F.broadcast(top))
        .crossJoin(F.broadcast(n_l))
        .crossJoin(F.broadcast(n_r))
        .select(
            "n_left",
            "n_right",
            "n_common_keys",
            "join_rows",
            "max_key",
            "max_key_rows",
            F.expr("(max_key_rows * 1000) DIV join_rows").alias(
                "max_key_share_permille"
            ),
        )
    )


def char_class_profile(
    df: DataFrame, text_col: str, group_col: str
) -> DataFrame:
    """Character-class composition of a free-text/payload column per
    group: ``(group, n_rows, n_chars, digit_permille, alpha_permille,
    ws_permille, other_permille)`` — the schema-free payload audit that
    catches encoding regressions (mojibake → ``other`` spike), payload
    shape drift (a JSON field going numeric → ``digit`` shift), and
    truncation (``n_chars`` collapse) without parsing the payload at
    all. The charset-anomaly gate of LLM ingest pipelines, run at the
    profile tier (cf. the C4/Gopher quality-heuristic families).

    Exact integer: per-class counts derive from
    ``length(x) - length(regexp_replace(x, class, ''))`` (global
    replace in both engines), are summed as BIGINT, and the permilles
    are ``(1000·class_total) div char_total`` — hash-checkable.
    ``other_permille`` is derived by subtraction from 1000's
    complement of nothing — it has its own class regex ``[^0-9a-zA-Z ]``
    so the four permilles may undershoot 1000 by at most 3 from the
    independent floors (stated; a derived remainder would instead hide
    a class-regex bug).

    Scale: stateless row-local counts then one map-side-combined hash
    aggregate on the group key — no window, no join.
    """
    x = F.col(text_col)

    def cnt(pattern: str) -> Column:
        return (
            F.length(x) - F.length(F.regexp_replace(x, pattern, ""))
        ).cast("bigint")

    staged = df.select(
        F.col(group_col),
        F.length(x).cast("bigint").alias("_n"),
        cnt("[0-9]").alias("_digit"),
        cnt("[a-zA-Z]").alias("_alpha"),
        cnt(" ").alias("_ws"),
        cnt("[^0-9a-zA-Z ]").alias("_other"),
    )
    agg = staged.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("_n").cast("long").alias("n_chars"),
        F.sum("_digit").alias("_d"),
        F.sum("_alpha").alias("_a"),
        F.sum("_ws").alias("_w"),
        F.sum("_other").alias("_o"),
    )
    return agg.select(
        group_col,
        "n_rows",
        "n_chars",
        F.expr("(1000 * _d) DIV n_chars").cast("long").alias("digit_permille"),
        F.expr("(1000 * _a) DIV n_chars").cast("long").alias("alpha_permille"),
        F.expr("(1000 * _w) DIV n_chars").cast("long").alias("ws_permille"),
        F.expr("(1000 * _o) DIV n_chars").cast("long").alias("other_permille"),
    )


def anonymity_report(
    df: DataFrame,
    qi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """k-anonymity / l-diversity audit over a quasi-identifier
    combination (Sweeney 2002; Machanavajjhala et al. 2007) — the
    privacy-tier companion of the PII scrub: per QI equivalence class,
    ``(qi..., class_size, l_distinct, below_k)`` where ``class_size``
    is the k-anonymity denominator (a class below ``k`` re-identifies
    its members within that factor), ``l_distinct`` counts distinct
    sensitive values (l-diversity — a large class with ONE sensitive
    value still leaks it), and ``below_k`` flags the at-risk classes.

    A release gate reads two numbers off this frame: rows in below-k
    classes (suppress or generalize them) and classes with
    ``l_distinct = 1`` (homogeneous — leak regardless of size). Both
    are derivable by plain aggregation over this output, so the
    per-class frame is the registered artifact (the CMS/KMV
    carry-the-evidence discipline).

    Scale: ONE corpus aggregate keyed on the QI columns (count +
    count_distinct in the same pass — Spark plans the distinct via
    expand, still one shuffle family on the QI key); output is bounded
    by QI-class cardinality, which a sane QI choice keeps small."""
    if not qi_cols:
        raise ValueError("anonymity_report: need at least one QI column")
    if k < 2:
        raise ValueError(f"anonymity_report: k must be >= 2, got {k}")
    agg = df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("class_size"),
        F.count_distinct(F.col(sensitive_col)).cast("long").alias("l_distinct"),
    )
    return agg.withColumn("below_k", F.col("class_size") < k)


def fd_violations(
    df: DataFrame, lhs_cols: list[str], rhs_col: str
) -> DataFrame:
    """Functional-dependency audit: does ``lhs_cols → rhs_col`` hold?
    Per LHS value: ``(lhs..., n_rows, n_distinct_rhs, violating)`` —
    the constraint-violation report of data-repair pipelines (an FD
    holds iff every LHS group is RHS-pure; the violating groups are
    the repair worklist, and Σ over them bounds the minimal repair
    size). The schema-level sibling of the anonymity report: same
    one-aggregate shape, opposite reading (purity wanted here,
    diversity wanted there).

    Scale: ONE corpus aggregate keyed on the LHS columns; output
    bounded by LHS cardinality."""
    if not lhs_cols:
        raise ValueError("fd_violations: need at least one LHS column")
    agg = df.groupBy(*lhs_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count_distinct(F.col(rhs_col)).cast("long").alias("n_distinct_rhs"),
    )
    return agg.withColumn("violating", F.col("n_distinct_rhs") > 1)
