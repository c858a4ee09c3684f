"""Round-14 queue module — PRE-WIRED, NOT YET REGISTERED (the
queries_round11/12/13 discipline: built, oracle-validated at 3 SFs,
lockstep-tested every round, registered when a driver window has
slots). Wiring is the five-place rule: :func:`register_all` from
``registry._load_all`` + DRIVER_PRIORITY splice +
DRIVER_PRIORITY_BUILT_FROM bump + bench rotation + QUERIES.md
regeneration, one commit.

Queries built in round 11:

* ``scd2_customer_history`` — Kimball Type-2 slowly-changing-dimension
  build (validity intervals + no-op-update collapse) over the same
  orders-derived changelog the registered ``cdc_customer_segments``
  applies: where cdc_apply answers "what is current", scd2 answers
  "what was true when" (`operators/scd.py`).
* ``holt_daily_revenue`` — Holt linear (double-exponential) smoothing
  of daily revenue per order priority, the trend-aware forecast tier
  above EWMA; all-integer recursion (α=β=1/2, truncating division) so
  the Arrow fold and the recursive-CTE oracle agree bit-for-bit
  (`operators/forecast.py` — the CUSUM determinism discipline).
* ``ri_coverage_audit`` — referential-integrity + reverse-coverage
  audit of every FK relation in the fixture schema (7 hard TPC-H FKs
  + 2 soft event/embedding links): per relation, child rows, orphan
  child rows, and unreferenced parent keys — the data-quality ledger
  next to the FD/anonymity audits (X-161/X-157). Orphans are zero on
  the generated fixture BY DESIGN (that is the audit passing); the
  reverse-coverage column is non-degenerate on the events->customer
  link (probed: 1350 never-active customers at sf0.01 — unlike real
  TPC-H, this generator gives every customer an order, so Q22's
  customers-without-orders shape lives on the soft link instead).
* ``ivfadc_topk`` — FAISS-composition IVF-ADC: coarse k-means cells
  prune WHERE to scan (nprobe=4), product quantization on RESIDUALS
  (x − coarse centroid) shrinks what is scanned, asymmetric-distance
  LUT scores it (Jégou/Douze/Schmid TPAMI 2011 §IV.C — IVFADC, the
  composition the ladder's IVF and PQ tiers exist to reach)
  (`operators/similarity.py::ivfadc_topk`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.functions.numeric import scaled_long
from kinesis_stream_video_project_spark.operators.forecast import (
    HOLT_ORACLE_WALK,
    holt_linear,
)
from kinesis_stream_video_project_spark.operators.scd import scd2_history


def _scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history of the cdc_customer_segments changelog (X-186):
    key=custkey, seq=orderkey, F→U / O→I / P→D, payload=priority —
    deterministic, all three op branches and the no-op collapse
    engaged at every SF."""
    orders = io.load_table(spark, sf_dir, "orders")
    changes = orders.select(
        F.col("o_custkey").alias("c_custkey"),
        F.expr(
            "CASE o_orderstatus WHEN 'F' THEN 'U' WHEN 'O' THEN 'I' "
            "ELSE 'D' END"
        ).alias("op"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderpriority").alias("c_mktsegment"),
    )
    return scd2_history(changes, "c_custkey", "c_mktsegment")


def _holt_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear smoothing of daily revenue-cents per order priority
    (X-187). Revenue is summed in EXACT per-row cents (scaled_long per
    row, BIGINT sum) — never a float sum — so the series itself is
    engine-portable before the fold even starts."""
    orders = io.load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.col("o_orderpriority").alias("grp"),
            F.col("o_orderdate").alias("_day"),
        )
        .agg(F.sum(scaled_long(F.col("o_totalprice"), 100)).alias("xs"))
    )
    series = daily.select(
        "grp",
        F.row_number()
        .over(Window.partitionBy("grp").orderBy("_day"))
        .cast("long")
        .alias("step"),
        "xs",
    )
    return holt_linear(series)


_RI_RELATIONS: tuple[tuple[str, str, str, str, str], ...] = (
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("events->customer", "events", "user_id", "customer", "c_custkey"),
    ("embeddings->documents", "embeddings", "vec_id", "documents", "doc_id"),
)


def _ri_coverage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity + reverse-coverage ledger (X-188): per FK
    relation, (n_child, n_orphans, n_unref_parents). One pre-aggregate
    per child side (fk → count, so the join moves |distinct fk| rows,
    not |child| rows), one full-outer key join, one 1-row aggregate —
    per relation; the 9 single-row plans union. NULL FKs count as
    orphans (they violate the reference either way)."""
    out = None
    for name, child_t, fk, parent_t, pk in _RI_RELATIONS:
        child = (
            io.load_table(spark, sf_dir, child_t)
            .groupBy(F.col(fk).alias("_fk"))
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        parent = io.load_table(spark, sf_dir, parent_t).select(
            F.col(pk).alias("_pk")
        )
        joined = child.join(parent, child["_fk"] == parent["_pk"], "full_outer")
        row = joined.agg(
            F.lit(name).alias("relation"),
            F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_child"),
            F.coalesce(
                F.sum(F.when(F.col("_pk").isNull(), F.col("_n"))), F.lit(0)
            )
            .cast("long")
            .alias("n_orphans"),
            F.count(F.when(F.col("_n").isNull(), F.lit(1)))
            .cast("long")
            .alias("n_unref_parents"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def _scd2_cdc_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-operator law as a driver-hashed claim (X-191, the
    ann_tier_claims discipline applied across operator FAMILIES): over
    the SAME changelog, scd2_history's open versions must agree with
    cdc_apply's merged state — every key whose last effective change is
    an upsert carries the identical payload in both, and every key
    whose last effective change is a delete is absent from the merge.
    Emits the counts plus the boolean; a divergence between the two
    operators flips all_consistent and fails the driver hash."""
    from kinesis_stream_video_project_spark.plans.queries_round11 import (
        _cdc_customer_segments,
    )

    hist = _scd2_customer_history(spark, sf_dir)
    merged = _cdc_customer_segments(spark, sf_dir)
    changed = (
        io.load_table(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    open_v = hist.filter("is_current").select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("open_p")
    )
    m = merged.select(
        F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("m_p")
    )
    j = changed.join(open_v, "k", "left").join(m, "k", "left")
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_changed_keys"),
        F.count("open_p").cast("long").alias("n_open"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("open_p").isNotNull()
                    & (F.col("open_p") == F.col("m_p")),
                    1,
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_open_match"),
        F.coalesce(
            F.sum(F.when(F.col("open_p").isNull() & F.col("m_p").isNull(), 1)),
            F.lit(0),
        )
        .cast("long")
        .alias("n_closed_absent"),
        F.coalesce(
            F.sum(
                F.when(F.col("open_p").isNull() & F.col("m_p").isNotNull(), 1)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_closed_still_present"),
    )
    return agg.select(
        "*",
        (
            (F.col("n_open") == F.col("n_open_match"))
            & (F.col("n_closed_still_present") == 0)
        ).alias("all_consistent"),
    )


def _theilsen_weekly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust slope of weekly revenue-cents per order
    priority (X-193) — the outlier-immune trend next to the OLS
    `trend_slope_per_type` tier. x = epoch-week index (real gaps kept,
    not a dense rank), y = exact per-row-cents weekly sum."""
    from kinesis_stream_video_project_spark.operators.forecast import (
        theilsen_slope,
    )

    orders = io.load_table(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') DIV 7"
        ).alias("x"),
    ).agg(F.sum(scaled_long(F.col("o_totalprice"), 100)).alias("y"))
    return theilsen_slope(weekly)


_THEILSEN_ORACLE = """
WITH weekly AS (
  SELECT o_orderpriority AS g,
         CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 7
              AS BIGINT) AS x,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
  FROM orders GROUP BY 1, 2
),
pairs AS (
  SELECT a.g, CAST(b.y - a.y AS BIGINT) AS num,
         CAST(b.x - a.x AS BIGINT) AS den
  FROM weekly a JOIN weekly b ON a.g = b.g AND a.x < b.x
),
ranked AS (
  SELECT g, num, den,
         row_number() OVER (
           PARTITION BY g
           ORDER BY CAST(num AS DOUBLE) / den, num, den) AS rn,
         COUNT(*) OVER (PARTITION BY g) AS n_pairs
  FROM pairs
)
SELECT g AS grp,
       (floor((CAST(num AS DOUBLE) / den) * 10000.0 + 0.5) / 10000.0)
         AS slope,
       num, den, CAST(n_pairs AS BIGINT) AS n_pairs
FROM ranked WHERE rn = (n_pairs + 1) // 2
"""


def _scd2_snapshot_at(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bitemporal READ side of the Type-2 build (X-195): "what was
    each customer's segment AT clock c" — versions live at c under the
    half-open [valid_from, valid_to) rule, aggregated per segment.
    c = max(orderkey) DIV 2, computed in-query on both engines (a
    mid-history clock at every SF, no magic literal)."""
    hist = _scd2_customer_history(spark, sf_dir)
    clock = (
        io.load_table(spark, sf_dir, "orders")
        .agg((F.max("o_orderkey") / 2).cast("long").alias("_c"))
    )
    live = hist.crossJoin(F.broadcast(clock)).filter(
        (F.col("valid_from") <= F.col("_c"))
        & (F.col("valid_to").isNull() | (F.col("_c") < F.col("valid_to")))
    )
    return (
        live.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_live"))
    )


def _holt_backtest_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast evaluation tier (X-196): one-step-ahead backtest of the
    Holt smoother on its own series — MAE of forecast_next(t) vs the
    actual x(t+1), all-integer (sum of |err| DIV n). The discipline:
    a forecaster without a measured error is a hope, not an operator."""
    orders = io.load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_orderdate").alias("_day"),
    ).agg(F.sum(scaled_long(F.col("o_totalprice"), 100)).alias("xs"))
    series = daily.select(
        "grp",
        F.row_number()
        .over(Window.partitionBy("grp").orderBy("_day"))
        .cast("long")
        .alias("step"),
        "xs",
    )
    fc = holt_linear(series).select(
        "grp", (F.col("step") + 1).alias("step"), "forecast_next"
    )
    evals = fc.join(series, ["grp", "step"]).select(
        "grp", F.abs(F.col("xs") - F.col("forecast_next")).alias("_err")
    )
    return evals.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_evals"),
        F.expr("SUM(_err) DIV COUNT(*)").cast("long").alias("mae_cents"),
    )


_HOLT_BACKTEST_ORACLE = (
    """
WITH RECURSIVE daily AS (
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
),
"""
    + HOLT_ORACLE_WALK
    + """
SELECT h.grp, CAST(COUNT(*) AS BIGINT) AS n_evals,
       CAST(SUM(ABS(s.xs - h.forecast_next)) // COUNT(*) AS BIGINT)
         AS mae_cents
FROM holt h JOIN series s ON s.grp = h.grp AND s.step = h.step + 1
GROUP BY 1
"""
)


def _bootstrap_weekly_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-bootstrap 90% CI of mean weekly revenue-cents per
    order priority (X-194): B=200 deterministic md5 resamples over the
    same weekly ledger the Theil–Sen tier trends — a bootstrap that
    hash-checks across engines because the resampling is a pure
    function of (group, replicate, draw)."""
    from kinesis_stream_video_project_spark.operators.bootstrap import (
        bootstrap_mean_ci,
    )

    orders = io.load_table(spark, sf_dir, "orders")
    weekly = orders.groupBy(
        F.col("o_orderpriority").alias("grp"),
        F.expr(
            "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') DIV 7"
        ).alias("x"),
    ).agg(F.sum(scaled_long(F.col("o_totalprice"), 100)).alias("y"))
    return bootstrap_mean_ci(weekly)


_BOOTSTRAP_ORACLE = """
WITH series AS (
  SELECT o_orderpriority AS g,
         CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') // 7
              AS BIGINT) AS x,
         SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS y
  FROM orders GROUP BY 1, 2
),
ranked AS (
  SELECT g, y, row_number() OVER (PARTITION BY g ORDER BY y) AS r
  FROM series
),
sizes AS (SELECT g, COUNT(*) AS n, SUM(y) AS tot FROM series GROUP BY 1),
grid AS (
  SELECT s.g, b.b,
         (('0x' || substr(md5(CAST(s.g AS VARCHAR) || ':'
                              || CAST(b.b AS VARCHAR) || ':'
                              || CAST(i.i AS VARCHAR)), 1, 12))::BIGINT
          % s.n) + 1 AS draw
  FROM sizes s,
       generate_series(1, 200) AS b(b),
       generate_series(1, 4096) AS i(i)
  WHERE i.i <= s.n
),
rep AS (
  SELECT grid.g, grid.b, SUM(ranked.y) AS bsum
  FROM grid JOIN ranked ON ranked.g = grid.g AND ranked.r = grid.draw
  GROUP BY 1, 2
),
sel AS (
  SELECT g, bsum,
         row_number() OVER (PARTITION BY g ORDER BY bsum, b) AS brn
  FROM rep
),
picked AS (
  SELECT g,
         arg_min(bsum, brn) AS losum,
         arg_max(bsum, brn) AS hisum
  FROM sel WHERE brn IN (11, 190) GROUP BY 1
)
SELECT s.g AS grp,
       CAST(s.n AS BIGINT) AS n,
       CAST(200 AS BIGINT) AS n_boot,
       (floor((CAST(s.tot AS DOUBLE) / s.n) * 10000.0 + 0.5) / 10000.0)
         AS mean_y,
       (floor((CAST(p.losum AS DOUBLE) / s.n) * 10000.0 + 0.5) / 10000.0)
         AS ci_lo,
       (floor((CAST(p.hisum AS DOUBLE) / s.n) * 10000.0 + 0.5) / 10000.0)
         AS ci_hi
FROM sizes s JOIN picked p ON p.g = s.g
"""


def _ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-ADC composed ANN (X-189): coarse k=8 k-means cells, nprobe=4,
    PQ 8×256 on residuals — the FAISS IVFADC composition at the ladder's
    top. Same query set as the other ANN tiers."""
    from kinesis_stream_video_project_spark.operators import similarity as sim

    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return sim.ivfadc_topk(q, e, k=10, n_cells=8, nprobe=4, n_centroids=256)


_SCD2_ORACLE = """
WITH ch AS (
  SELECT o_custkey AS k,
         CASE o_orderstatus WHEN 'F' THEN 'U' WHEN 'O' THEN 'I'
              ELSE 'D' END AS op,
         o_orderkey AS seq,
         o_orderpriority AS p
  FROM orders
),
lagged AS (
  SELECT k, op, seq, p,
         lag(op) OVER w AS prev_op,
         lag(p) OVER w AS prev_p
  FROM ch WINDOW w AS (PARTITION BY k ORDER BY seq)
),
eff AS (
  SELECT k, op, seq, p FROM lagged
  WHERE NOT (op IN ('I','U') AND prev_op IN ('I','U')
             AND p IS NOT DISTINCT FROM prev_p)
),
closed AS (
  SELECT k, op, seq, p,
         lead(seq) OVER (PARTITION BY k ORDER BY seq) AS close_seq
  FROM eff
)
SELECT k AS c_custkey, p AS c_mktsegment,
       CAST(seq AS BIGINT) AS valid_from,
       CAST(close_seq AS BIGINT) AS valid_to,
       close_seq IS NULL AS is_current
FROM closed WHERE op <> 'D'
"""

_SCD2_SNAPSHOT_ORACLE = (
    _SCD2_ORACLE.replace(
        """SELECT k AS c_custkey, p AS c_mktsegment,
       CAST(seq AS BIGINT) AS valid_from,
       CAST(close_seq AS BIGINT) AS valid_to,
       close_seq IS NULL AS is_current
FROM closed WHERE op <> 'D'""",
        """SELECT p AS segment, CAST(COUNT(*) AS BIGINT) AS n_live
FROM closed, (SELECT MAX(o_orderkey) // 2 AS c FROM orders) clk
WHERE op <> 'D' AND seq <= clk.c
  AND (close_seq IS NULL OR clk.c < close_seq)
GROUP BY 1""",
    )
)



_HOLT_ORACLE = (
    """
WITH RECURSIVE daily AS (
  SELECT o_orderpriority AS grp, o_orderdate AS day,
         SUM("""
    + "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"
    + """) AS xs
  FROM orders GROUP BY 1, 2
),
series AS (
  SELECT grp,
         CAST(row_number() OVER (PARTITION BY grp ORDER BY day) AS BIGINT)
           AS step,
         CAST(xs AS BIGINT) AS xs
  FROM daily
),
"""
    + HOLT_ORACLE_WALK
    + """
SELECT grp, step, level_s, trend_s, forecast_next FROM holt
"""
)


def _ri_oracle() -> str:
    parts = []
    for name, child_t, fk, parent_t, pk in _RI_RELATIONS:
        parts.append(
            f"""
SELECT '{name}' AS relation,
       CAST(COALESCE(SUM(c._n), 0) AS BIGINT) AS n_child,
       CAST(COALESCE(SUM(CASE WHEN p._pk IS NULL THEN c._n END), 0)
            AS BIGINT) AS n_orphans,
       CAST(COUNT(CASE WHEN c._n IS NULL THEN 1 END) AS BIGINT)
         AS n_unref_parents
FROM (SELECT {fk} AS _fk, COUNT(*) AS _n FROM {child_t} GROUP BY 1) c
FULL OUTER JOIN (SELECT {pk} AS _pk FROM {parent_t}) p ON c._fk = p._pk
"""
        )
    return " UNION ALL ".join(parts)


def _ivfadc_oracle() -> str:
    """DuckDB replay of the ENTIRE IVFADC pipeline: the kmeans_assign
    Lloyd loop (modulo-8 init, 2 iterations, argmax-cosine assignment
    with the smaller-cell tiebreak), residuals vs the final coarse
    centroids, the 8×256 PQ Lloyd on residuals (modulo init, 1
    iteration, argmin-L2 with the (d2, cell) tiebreak — the registered
    pq_adc_topk shape), the raw-query LUT, and nprobe=4 cosine-ranked
    probing. Every float op is the same double arithmetic in the same
    left-to-right order as the Spark side."""
    from kinesis_stream_video_project_spark.plans.queries_llm import _dd_cosine

    def coarse_centroids(src: str) -> str:
        return f"""
  SELECT cell, list(mean_c ORDER BY dim) AS centroid
  FROM (
    SELECT cell, dim, AVG(c) AS mean_c
    FROM (
      SELECT cell, UNNEST(generate_series(1, len(embedding))) AS dim,
             UNNEST(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS c
      FROM {src}
    )
    GROUP BY cell, dim
  )
  GROUP BY cell
"""

    def coarse_assign(cents: str) -> str:
        return f"""
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_dd_cosine('e.embedding', 'c.centroid')} DESC, c.cell
           ) AS rn
    FROM embeddings e CROSS JOIN {cents} c
  ) WHERE rn = 1
"""

    def pq_centroids(src: str) -> str:
        return f"""
  SELECT s, cell, list(mean_c ORDER BY dim) AS centroid
  FROM (
    SELECT s, cell, d.d AS dim, AVG(sv[d.d]) AS mean_c
    FROM {src}, UNNEST(generate_series(1, 8)) AS d(d)
    GROUP BY s, cell, d.d
  ) GROUP BY s, cell
"""

    def pq_assign(cents: str) -> str:
        return f"""
  SELECT vec_id, s, sv, cell FROM (
    SELECT a.vec_id, a.s, a.sv, c.cell,
           row_number() OVER (
             PARTITION BY a.vec_id, a.s
             ORDER BY list_sum(list_transform(generate_series(1, 8),
                        i -> (a.sv[i] - c.centroid[i])
                           * (a.sv[i] - c.centroid[i]))) ASC,
                      c.cell ASC) AS rn
    FROM sub a JOIN {cents} c ON c.s = a.s
  ) WHERE rn = 1
"""

    qdot = (
        "list_sum(list_transform(generate_series(1, 64), "
        "i -> CAST(q.embedding[i] AS DOUBLE) * c.centroid[i]))"
    )
    return f"""
WITH
a0 AS (SELECT vec_id, embedding, vec_id % 8 AS cell FROM embeddings),
c1 AS ({coarse_centroids('a0')}),
a1 AS ({coarse_assign('c1')}),
c2 AS ({coarse_centroids('a1')}),
a2 AS ({coarse_assign('c2')}),
c3 AS ({coarse_centroids('a2')}),
resid AS (
  SELECT a.vec_id, a.cell,
         list_transform(generate_series(1, 64),
             i -> CAST(a.embedding[i] AS DOUBLE) - c.centroid[i]) AS rv
  FROM a2 a JOIN c3 c USING (cell)
),
sub AS (
  SELECT vec_id, s.s AS s, list_slice(rv, s.s*8 + 1, s.s*8 + 8) AS sv
  FROM resid, UNNEST(generate_series(0, 7)) AS s(s)
),
p0 AS (SELECT vec_id, s, sv, CAST(vec_id % 256 AS INT) AS cell FROM sub),
pc1 AS ({pq_centroids('p0')}),
p1 AS ({pq_assign('pc1')}),
pc2 AS ({pq_centroids('p1')}),
codes AS (
  SELECT vec_id, s, cell AS code FROM ({pq_assign('pc2')})
),
qsub AS (
  SELECT vec_id AS query_id, s.s AS s,
         list_transform(list_slice(embedding, s.s*8 + 1, s.s*8 + 8),
                        x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings, UNNEST(generate_series(0, 7)) AS s(s)
  WHERE vec_id < 5
),
lut AS (
  SELECT q.query_id, q.s, c.cell AS code,
         list_sum(list_transform(generate_series(1, 8),
                  i -> q.qv[i] * c.centroid[i])) AS pdot
  FROM qsub q JOIN pc2 c ON c.s = q.s
),
qprobe AS (
  SELECT query_id, cell, qc FROM (
    SELECT q.vec_id AS query_id, c.cell,
           {qdot} AS qc,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY {_dd_cosine('q.embedding', 'c.centroid')} DESC, c.cell
           ) AS cr
    FROM (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
    CROSS JOIN c3 c
  ) WHERE cr <= 4
),
sc AS (
  SELECT p.query_id, k.vec_id,
         (floor((any_value(p.qc) + SUM(l.pdot)) * 10000.0 + 0.5)
          / 10000.0) AS score_q
  FROM codes k
  JOIN resid m ON m.vec_id = k.vec_id
  JOIN qprobe p ON p.cell = m.cell
  JOIN lut l ON l.query_id = p.query_id AND l.s = k.s AND l.code = k.code
  WHERE k.vec_id <> p.query_id
  GROUP BY 1, 2
)
SELECT query_id, vec_id, score_q,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY score_q DESC, vec_id
       ) AS BIGINT) AS rank
FROM sc
QUALIFY rank <= 10
"""


_SCD2_CDC_ORACLE = """
WITH ch AS (
  SELECT o_custkey AS k,
         CASE o_orderstatus WHEN 'F' THEN 'U' WHEN 'O' THEN 'I'
              ELSE 'D' END AS op,
         o_orderkey AS seq,
         o_orderpriority AS p
  FROM orders
),
lagged AS (
  SELECT k, op, seq, p,
         lag(op) OVER w AS prev_op,
         lag(p) OVER w AS prev_p
  FROM ch WINDOW w AS (PARTITION BY k ORDER BY seq)
),
eff AS (
  SELECT k, op, seq, p FROM lagged
  WHERE NOT (op IN ('I','U') AND prev_op IN ('I','U')
             AND p IS NOT DISTINCT FROM prev_p)
),
closed AS (
  SELECT k, op, seq, p,
         lead(seq) OVER (PARTITION BY k ORDER BY seq) AS close_seq
  FROM eff
),
open_v AS (
  SELECT k, p AS open_p FROM closed WHERE op <> 'D' AND close_seq IS NULL
),
r2 AS (SELECT k, op, p AS newp,
              seq * 4 + CASE op WHEN 'D' THEN 3 WHEN 'U' THEN 2 ELSE 1 END
                AS ord
       FROM ch),
w2 AS (SELECT k, arg_max(op, ord) AS op, arg_max(newp, ord) AS newp
       FROM r2 GROUP BY 1),
m2 AS (SELECT c.c_custkey AS sk, c.c_mktsegment AS old, w2.k, w2.op, w2.newp
       FROM customer c FULL OUTER JOIN w2 ON c.c_custkey = w2.k),
merged AS (
  SELECT COALESCE(sk, k) AS k,
         CASE WHEN op IS NULL THEN old ELSE newp END AS m_p
  FROM m2 WHERE op IS NULL OR op != 'D'
),
chk AS (SELECT DISTINCT o_custkey AS k FROM orders),
j AS (
  SELECT chk.k, o.open_p, g.m_p
  FROM chk LEFT JOIN open_v o ON o.k = chk.k
           LEFT JOIN merged g ON g.k = chk.k
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_changed_keys,
       CAST(COUNT(open_p) AS BIGINT) AS n_open,
       CAST(COALESCE(SUM(CASE WHEN open_p IS NOT NULL AND open_p = m_p
                              THEN 1 END), 0) AS BIGINT) AS n_open_match,
       CAST(COALESCE(SUM(CASE WHEN open_p IS NULL AND m_p IS NULL
                              THEN 1 END), 0) AS BIGINT) AS n_closed_absent,
       CAST(COALESCE(SUM(CASE WHEN open_p IS NULL AND m_p IS NOT NULL
                              THEN 1 END), 0) AS BIGINT)
         AS n_closed_still_present,
       (COUNT(open_p) = COALESCE(SUM(CASE WHEN open_p IS NOT NULL
                                          AND open_p = m_p THEN 1 END), 0)
        AND COALESCE(SUM(CASE WHEN open_p IS NULL AND m_p IS NOT NULL
                              THEN 1 END), 0) = 0) AS all_consistent
FROM j
"""


QUERIES = {
    "scd2_customer_history": _scd2_customer_history,
    "holt_daily_revenue": _holt_daily_revenue,
    "ri_coverage_audit": _ri_coverage_audit,
    "scd2_cdc_consistency": _scd2_cdc_consistency,
    "scd2_snapshot_at": _scd2_snapshot_at,
    "holt_backtest_mae": _holt_backtest_mae,
    "theilsen_weekly_trend": _theilsen_weekly_trend,
    "bootstrap_weekly_ci": _bootstrap_weekly_ci,
    "ivfadc_topk": _ivfadc_topk,
}

ORACLES = {
    "scd2_customer_history": _SCD2_ORACLE,
    "holt_daily_revenue": _HOLT_ORACLE,
    "ri_coverage_audit": _ri_oracle(),
    "scd2_cdc_consistency": _SCD2_CDC_ORACLE,
    "scd2_snapshot_at": _SCD2_SNAPSHOT_ORACLE,
    "holt_backtest_mae": _HOLT_BACKTEST_ORACLE,
    "theilsen_weekly_trend": _THEILSEN_ORACLE,
    "bootstrap_weekly_ci": _BOOTSTRAP_ORACLE,
    "ivfadc_topk": _ivfadc_oracle(),
}

assert set(QUERIES) == set(ORACLES)

TAGS = {name: ("round14",) for name in QUERIES}


def register_all(names: "tuple[str, ...] | None" = None) -> None:
    """Wire the given wave into the live registry — called from
    ``registry._load_all`` when a window has slots, never before."""
    from kinesis_stream_video_project_spark.plans.registry import register

    for name in names if names is not None else tuple(QUERIES):
        register(name, oracle=ORACLES[name], tags=TAGS[name])(QUERIES[name])
