"""Physical data-layout planning primitives — the operators a 100 TB
deployment runs to DECIDE how to lay data out, not to answer a business
question.

Two tiers:

* ``zorder_key`` / ``zorder_locality_audit`` — Morton (Z-order) curve
  interleaving (Morton 1966; the data-skipping layout of
  Delta/Iceberg/ClickHouse `ORDER BY` tuning). A multi-dimensional
  range query over a z-laid-out table touches O(perimeter) blocks
  instead of O(rows); the audit MEASURES read amplification for a
  rectangle under both a z-order and a row-major (x-then-y) layout,
  because which one wins depends on the key distribution: probed on
  the orders fixture, row-major wins at sf<=0.01 (the custkey range is
  a few hundred — x bits dominate) and z-order wins 3.4x at sf0.1
  (8 192 vs 27 860 rows read for a 2 359-row rectangle). Measure,
  don't guess — the audit is the decision input.

* ``range_partition_bounds`` — exact equi-depth cut points for a range
  shuffle (what Spark's RangePartitioner estimates by sampling). The
  production path at 100 TB IS the sample estimate; this exact form is
  the audit twin that scores a proposed split: it walks the DISTINCT-
  VALUE ledger (the exact_group_percentiles cumulative-walk
  discipline — the only window runs over |distinct values| rows, never
  the corpus), assigns every tie-group the tile its first row falls
  in (a range shuffle cannot split a value across partitions — ties
  make real splits skewed, and the audit shows exactly how skewed),
  and reports per-tile upper bounds and exact row counts.

All-integer arithmetic throughout; both operators refuse loudly
(in-plan ``raise_error``, the pagerank_int discipline) rather than
silently truncate when a key exceeds the bit budget.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int) -> Column:
    """Interleave the low ``bits`` of two non-negative integers into a
    ``2*bits``-wide Morton key: x occupies even bit positions, y odd.
    Pure shift/mask arithmetic — hash-identical in any engine."""
    terms: list[Column] = []
    for i in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zorder_locality_audit(
    df: DataFrame,
    x: str,
    y: str,
    x_lo: int,
    x_hi: int,
    y_lo_div: int,
    y_hi_div: int,
    bits: int = 14,
    bucket_bits: int = 8,
) -> DataFrame:
    """Read-amplification audit of a rectangle query under two layouts.

    ``df`` carries non-negative integer columns ``x`` and ``y`` (each
    must fit in ``bits`` bits — in-plan raise_error otherwise). The
    rectangle is ``x in [x_lo, x_hi]`` times the relative y band
    ``[max_y div y_lo_div, max_y div y_hi_div]`` (relative because the
    fixture's key ranges scale with SF while the audit must stay one
    deterministic query).

    A "block" is the top ``bucket_bits`` of the sort key — the file /
    row-group a clustered table would split into. For each layout
    (``zorder`` = Morton key, ``rowmajor`` = ``x << bits | y``) the
    audit emits::

        layout, n_rect_rows, n_blocks_touched, n_rows_read,
        read_amp_permille = n_rows_read * 1000 div n_rect_rows

    Scale: the keyed projection is narrow and shuffle-free; touched
    block sets are <= 2^bucket_bits rows and broadcast back for the
    read-amplification count; the only full-data operations are two
    narrow aggregates. At a real deployment the audit runs on a sample
    or one partition-month — the arithmetic is the same.
    """
    lim = 1 << bits
    xc, yc = F.col("_x"), F.col("_y")
    ymax_f = df.agg(F.max(F.col(y).cast("long")).alias("_ymax"))
    base = (
        df.select(F.col(x).cast("long").alias("_x"), F.col(y).cast("long").alias("_y"))
        .crossJoin(F.broadcast(ymax_f))
        .withColumn(
            "_x",
            F.expr(
                f"CASE WHEN _x >= 0 AND _x < {lim} THEN _x ELSE "
                f"raise_error(concat('zorder_locality_audit: x=', CAST(_x AS STRING), "
                f"' outside [0, {lim}) — raise bits')) END"
            ),
        )
        .withColumn(
            "_y",
            F.expr(
                f"CASE WHEN _y >= 0 AND _y < {lim} THEN _y ELSE "
                f"raise_error(concat('zorder_locality_audit: y=', CAST(_y AS STRING), "
                f"' outside [0, {lim}) — raise bits')) END"
            ),
        )
    )
    shift = 2 * bits - bucket_bits
    keyed = base.select(
        (
            xc.between(F.lit(x_lo), F.lit(x_hi))
            & yc.between(
                F.expr(f"_ymax DIV {y_lo_div}"), F.expr(f"_ymax DIV {y_hi_div}")
            )
        ).alias("hit"),
        F.shiftright(zorder_key(xc, yc, bits), shift).alias("zb"),
        F.shiftright(F.shiftleft(xc, bits) + yc, shift).alias("rb"),
    )
    # four consumers below (per layout: the touched-block distinct and
    # the probe join) would each re-derive the 2*bits-term Morton
    # interleave over the full table — stage the 17 B/row (hit, zb, rb)
    # projection ONCE (the multi-consumer staging rule: 3+ consumers
    # with different aggregate shapes, so ReuseExchange cannot pair
    # them; measured 3.0 -> 0.6 s warm at sf0.1)
    keyed = keyed.localCheckpoint(eager=True)
    out = []
    for layout, bcol in (("zorder", "zb"), ("rowmajor", "rb")):
        touched = keyed.filter("hit").select(bcol).distinct()
        stats = keyed.join(F.broadcast(touched), bcol, "inner").agg(
            F.sum(F.col("hit").cast("long")).alias("n_rect_rows"),
            F.count(F.lit(1)).alias("n_rows_read"),
            F.countDistinct(bcol).alias("n_blocks_touched"),
        )
        out.append(
            stats.select(
                F.lit(layout).alias("layout"),
                "n_rect_rows",
                "n_blocks_touched",
                "n_rows_read",
                F.expr("(n_rows_read * 1000) DIV n_rect_rows").alias(
                    "read_amp_permille"
                ),
            )
        )
    return out[0].unionByName(out[1])


def hilbert_stages(
    df: DataFrame,
    x: str,
    y: str,
    bits: int,
    out: str,
    levels: int | None = None,
) -> DataFrame:
    """Append the Hilbert-curve index of non-negative ``(x, y)`` (each
    < 2^bits) as column ``out`` — the canonical xy2d bit walk (Hilbert
    1891; the iterative form of Butz 1971), unrolled into ``bits``
    projection stages. Each stage materializes (rx, ry) then the
    rotated/reflected coordinates as REAL columns: the state variables
    are referenced multiple times per level, so CollapseProject keeps
    the stages separate (the dedup.py ``_hs`` pattern) instead of
    inlining an exponentially-nested expression. The n-reflection
    variant keeps coordinates in [0, 2^bits) throughout — no negative
    intermediates, so BIGINT bitwise ops agree across engines.

    Per level (s = 2^i, top bit first): d += s²·((3·rx) XOR ry); if
    ry = 0 reflect (when rx = 1) by n−1−· and swap x/y.

    ``levels`` (default ``bits``) truncates the walk to the first k
    levels — the PREFIX PROPERTY: level i contributes 4^i·{0..3} and
    all later levels together contribute < 4^(bits−k), so the partial
    index's top 2k bits equal the full index's. Block assignment at
    ``bucket_bits`` granularity needs only ⌈bucket_bits/2⌉ levels —
    a 3.5× walk reduction for the audit's 8-bit blocks (measured)."""
    n = 1 << bits
    if levels is None:
        levels = bits
    if not (1 <= levels <= bits):
        raise ValueError(f"levels must be in 1..{bits}, got {levels}")
    # The walk stages its state in reserved columns; an input frame that
    # already carries one would produce ambiguous-column analysis errors
    # mid-walk — refuse clearly at entry instead (ADVICE r11).
    reserved = {"_hx", "_hy", "_hd", "_rx", "_ry"}
    clash = reserved.intersection(df.columns)
    if clash:
        raise ValueError(
            f"hilbert_stages: input columns {sorted(clash)} collide with "
            f"reserved walk-state names {sorted(reserved)} — rename them first"
        )
    cur = (
        df.withColumn("_hx", F.col(x).cast("long"))
        .withColumn("_hy", F.col(y).cast("long"))
        .withColumn("_hd", F.lit(0).cast("long"))
    )
    keep = [c for c in df.columns]
    for i in reversed(range(bits - levels, bits)):
        s = 1 << i
        cur = cur.select(
            "*",
            F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .alias("_rx"),
            F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .alias("_ry"),
        )
        cur = cur.select(
            *keep,
            (
                F.col("_hd")
                + F.lit(s)
                * F.lit(s)
                * (F.lit(3) * F.col("_rx")).bitwiseXOR(F.col("_ry")).cast(
                    "long"
                )
            ).alias("_hd"),
            F.when(
                F.col("_ry") == 0,
                F.when(
                    F.col("_rx") == 1, F.lit(n - 1) - F.col("_hy")
                ).otherwise(F.col("_hy")),
            )
            .otherwise(F.col("_hx"))
            .alias("_hx"),
            F.when(
                F.col("_ry") == 0,
                F.when(
                    F.col("_rx") == 1, F.lit(n - 1) - F.col("_hx")
                ).otherwise(F.col("_hx")),
            )
            .otherwise(F.col("_hy"))
            .alias("_hy"),
        )
    return cur.select(*keep, F.col("_hd").alias(out))


def hilbert_sql_ctes(src: str, bits: int, levels: int | None = None) -> str:
    """DuckDB replay of :func:`hilbert_stages` — a generated chain of
    per-level CTEs over ``src`` (which must expose hx, hy, hd plus any
    carried columns as ``* ``). Returns CTE text ending in ``h<levels>``;
    that level's hd is the (possibly prefix-truncated) Hilbert index.
    Generated from the same constants as the Spark side."""
    n = 1 << bits
    if levels is None:
        levels = bits
    parts = []
    prev = src
    for lvl, i in enumerate(reversed(range(bits - levels, bits))):
        s = 1 << i
        name = f"h{lvl + 1}"
        parts.append(
            f"""{name} AS (
  SELECT * EXCLUDE (hx, hy, hd),
         hd + {s}::BIGINT * {s} * CAST(xor(3 * (CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END),
                  (CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)) AS BIGINT) AS hd,
         CASE WHEN (hy & {s}) = 0 THEN
           CASE WHEN (hx & {s}) > 0 THEN {n - 1} - hy ELSE hy END
         ELSE hx END AS hx,
         CASE WHEN (hy & {s}) = 0 THEN
           CASE WHEN (hx & {s}) > 0 THEN {n - 1} - hx ELSE hx END
         ELSE hy END AS hy
  FROM {prev}
)"""
        )
        prev = name
    return ",\n".join(parts)


def curve_locality_audit(
    df: DataFrame,
    x: str,
    y: str,
    x_lo: int,
    x_hi: int,
    y_lo_div: int,
    y_hi_div: int,
    bits: int = 14,
    bucket_bits: int = 8,
) -> DataFrame:
    """Three-way read-amplification audit: the :func:`zorder_locality_audit`
    rectangle measurement extended with the Hilbert layout — the curve
    whose theoretical locality beats Morton (no quadrant-boundary jumps;
    Moon et al., IEEE TKDE 2001). Emits the same four measured columns
    per layout ∈ {zorder, hilbert, rowmajor}; which curve wins on REAL
    keys is the audit's output, not an assumption."""
    lim = 1 << bits
    ymax_f = df.agg(F.max(F.col(y).cast("long")).alias("_ymax"))
    base = (
        df.select(
            F.col(x).cast("long").alias("_x"), F.col(y).cast("long").alias("_y")
        )
        .crossJoin(F.broadcast(ymax_f))
        .withColumn(
            "_x",
            F.expr(
                f"CASE WHEN _x >= 0 AND _x < {lim} THEN _x ELSE "
                f"raise_error(concat('curve_locality_audit: x=', CAST(_x AS STRING), "
                f"' outside [0, {lim}) — raise bits')) END"
            ),
        )
        .withColumn(
            "_y",
            F.expr(
                f"CASE WHEN _y >= 0 AND _y < {lim} THEN _y ELSE "
                f"raise_error(concat('curve_locality_audit: y=', CAST(_y AS STRING), "
                f"' outside [0, {lim}) — raise bits')) END"
            ),
        )
    )
    shift = 2 * bits - bucket_bits
    xc, yc = F.col("_x"), F.col("_y")
    pre = base.select(
        (
            xc.between(F.lit(x_lo), F.lit(x_hi))
            & yc.between(
                F.expr(f"_ymax DIV {y_lo_div}"), F.expr(f"_ymax DIV {y_hi_div}")
            )
        ).alias("hit"),
        F.shiftright(zorder_key(xc, yc, bits), shift).alias("zb"),
        F.shiftright(F.shiftleft(xc, bits) + yc, shift).alias("rb"),
        "_x",
        "_y",
    )
    # Prefix property: the hb block id needs only ⌈bucket_bits/2⌉ walk
    # levels (4 of 14 here) — the partial index's top bits equal the
    # full index's (pinned in tests; measured 3.5× less walk work).
    k_levels = -(-bucket_bits // 2)
    keyed = hilbert_stages(pre, "_x", "_y", bits, "_hd", levels=k_levels).select(
        "hit", "zb", "rb", F.shiftright(F.col("_hd"), shift).alias("hb")
    )
    # Six consumers (per layout: touched-block distinct + probe join) —
    # stage the (hit, zb, rb, hb) projection ONCE (the zorder audit's
    # measured multi-consumer rule, now amortizing the 14-level Hilbert
    # walk as well).
    keyed = keyed.localCheckpoint(eager=True)
    out = None
    for layout, bcol in (("zorder", "zb"), ("hilbert", "hb"), ("rowmajor", "rb")):
        touched = keyed.filter("hit").select(bcol).distinct()
        stats = keyed.join(F.broadcast(touched), bcol, "inner").agg(
            F.sum(F.col("hit").cast("long")).alias("n_rect_rows"),
            F.count(F.lit(1)).alias("n_rows_read"),
            F.countDistinct(bcol).alias("n_blocks_touched"),
        )
        row = stats.select(
            F.lit(layout).alias("layout"),
            "n_rect_rows",
            "n_blocks_touched",
            "n_rows_read",
            F.expr("(n_rows_read * 1000) DIV n_rect_rows").alias(
                "read_amp_permille"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out


def range_partition_bounds(
    df: DataFrame, value: str, n_parts: int
) -> DataFrame:
    """Exact equi-depth range-shuffle plan over integer ``value``.

    Ledger walk: distinct-value counts, cumulative sum over value order
    (a window over the |distinct|-row ledger only), tie-group tile =
    ``(rows_before * n_parts) div N`` — every row of one value lands in
    one tile, exactly like a real range partitioner. Output one row per
    NON-EMPTY tile: ``(part, upper_value, n_rows)``; a tie-group larger
    than a tile target leaves later tiles empty (absent) and shows up
    as skew in ``n_rows`` — which is the audit's point.
    """
    if n_parts < 1:
        raise ValueError(f"range_partition_bounds: n_parts must be >= 1, got {n_parts}")
    ledger = df.groupBy(F.col(value).cast("long").alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    total = ledger.agg(F.sum("cnt").alias("n_total"))
    assigned = (
        ledger.withColumn("cum_before", F.coalesce(F.sum("cnt").over(w), F.lit(0)))
        .crossJoin(F.broadcast(total))
        .withColumn("part", F.expr(f"(cum_before * {n_parts}) DIV n_total"))
    )
    return assigned.groupBy("part").agg(
        F.max("v").alias("upper_value"),
        F.sum("cnt").cast("long").alias("n_rows"),
    )


def compaction_plan(
    files: DataFrame,
    partition_col: str,
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Sequential-fill small-file compaction plan — the third layout
    decision operator: given a manifest of (partition, file, size),
    assign each file to an output bin so every bin's total is the first
    to reach ``target_bytes`` (the small-files problem at 100 TB: a
    table ingested by streaming writers accumulates thousands of KB
    files per partition, and every scan pays per-file open cost; Delta
    OPTIMIZE / Iceberg rewriteDataFiles run exactly this plan shape).

    Bin rule: files are packed in (file id) order within their
    partition — sequential fill PRESERVES the existing sort/cluster
    order, which bin-packing heuristics like first-fit-decreasing
    destroy (they interleave ingest order and wreck data-skipping
    min/max ranges) — and a file opens a new bin when the bin's running
    total has already reached the target:
    ``bin = (cumsum_before) DIV target_bytes`` over the partition-local
    prefix sums. A single file larger than the target gets its own bin
    (stated; splitting a file is the writer's job, not the planner's).

    Returns one row per output bin:
    ``(partition, bin, n_files, bin_bytes, first_file, last_file)``.

    All-integer; refuses target_bytes <= 0 loudly. Scale: ONE window
    keyed on the partition column (never global) over the MANIFEST —
    at 100 TB the manifest is ~1e6 rows of metadata, not data; the
    plan never touches file contents."""
    if target_bytes <= 0:
        raise ValueError(
            f"compaction_plan: target_bytes must be positive, got {target_bytes}"
        )
    w = (
        Window.partitionBy("partition")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = files.select(
        F.col(partition_col).alias("partition"),
        F.col(file_col).alias("file_id"),
        F.col(size_col).cast("long").alias("bytes"),
    ).withColumn(
        "bin", F.coalesce(F.sum("bytes").over(w), F.lit(0)).cast("long")
    )
    staged = staged.withColumn(
        "bin", F.expr(f"bin DIV CAST({target_bytes} AS BIGINT)").cast("long")
    )
    return staged.groupBy("partition", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("bytes").cast("long").alias("bin_bytes"),
        F.min("file_id").alias("first_file"),
        F.max("file_id").alias("last_file"),
    )
