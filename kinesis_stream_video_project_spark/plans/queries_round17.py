"""Round-17 queue module — PRE-WIRED, NOT YET REGISTERED (the
queries_round11..16 discipline: built, oracle-validated at 3 SFs,
lockstep-tested every round, registered when a driver window has
slots — earliest r14, after the r13 window drains the r15/r16
remainder to zero).

THE THEME: closing VERDICT r11 "What's missing" item 4 — the
log/entropy-family statistics the engine had only integer surrogates
for. The claims pattern (HLL-within-2% / recall-floor precedent) makes
TRUE log-domain statistics driver-hash-checkable: each engine computes
the float entropy/KL/log-PMI with its own libm from the SAME exact
integer counts, then evaluates threshold/bracket claims whose margins
(measured ≥ 1e-3, stated per query) exceed cross-engine libm drift
(~1e-12 after sums) by nine orders of magnitude. The rendered values
are exact integers + booleans — no float crosses the hash boundary.

* ``entropy_hourly_claims`` (X-220) — TRUE Shannon entropy (bits) of
  each event type's hour-of-day distribution, certified by three
  claims: H ≤ log₂(k) (the max-entropy bound), H ≥ Rényi-2 entropy
  −log₂(Σp²) (the Rényi monotonicity theorem, computed from the exact
  Σc² integer), and H ≥ 0.96·log₂(k) (the measured flatness of the
  fixture's hour histogram: ratio 0.9724/0.9967/0.9997 at
  sf0.001/0.01/0.1).
* ``kl_source_unigrams`` (X-221) — per-source KL divergence (bits) of
  the source's unigram distribution from the corpus distribution, the
  domain-shift / contamination signal of data-mixing pipelines.
  Claims: KL > 1e-6 (Gibbs, strict on this fixture — measured min
  8.6e-4), KL ≤ 0.05 (measured max 0.0303 at sf0.001, shrinking with
  SF), and H(p) ≤ H(p,q) (cross-entropy decomposition).
* ``pmi_log_bracket_claims`` (X-222) — the TRUE log₂ PMI of the
  registered top-20 collocations, certified against the r8-green
  integer surrogate with PROVEN floor-error brackets:
  pmi_scaled ≤ scale·2^pmi_log < pmi_scaled + N div c_cur + 2 (the
  two-stage truncating division's exact error envelope), plus the
  sign-vs-rational-comparison claim. The float tier and the integer
  tier certify each other row by row.
* ``ams_join_size_events_orders`` (X-223) — AMS inner-product
  join-size estimate (the 1996 paper's headline application):
  events.user_id ⋈ orders.o_custkey cardinality estimated from two
  independent 16-register sketches, with the exact join size as the
  measured-error companion and the paper's own variance bound as an
  all-integer 3σ Chebyshev claim (|err|/σ measured 1.63/0.26/0.06 —
  the estimator is honestly NOISY when J ≪ √(F₂F₂), stated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.functions.text import tokens

_EPS = 1e-9


def _entropy_hourly_claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Shannon entropy of the hour-of-day mix per event type
    (X-220). H = log₂(n) − Σc·log₂(c)/n from the exact (type, hour)
    counts; the emitted row is (event_type, n_events, n_hours, sum_c2)
    — all exact integers — plus the three certification booleans.

    Scale: one (type, hour) count aggregate (≤ |types|·24 rows), one
    per-type re-aggregate. The float entropy never leaves the plan."""
    ev = io.load_table(spark, sf_dir, "events")
    c = ev.groupBy(
        F.col("event_type"), F.hour("ts").alias("_h")
    ).agg(F.count(F.lit(1)).alias("_c"))
    per = c.groupBy("event_type").agg(
        F.sum("_c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum(F.col("_c") * F.col("_c")).cast("long").alias("sum_c2"),
        F.sum(F.col("_c").cast("double") * F.log2(F.col("_c"))).alias(
            "_clogc"
        ),
    )
    h = F.log2(F.col("n_events")) - F.col("_clogc") / F.col("n_events")
    # Rényi-2 = −log₂(Σp²) = 2·log₂(n) − log₂(Σc²)
    renyi2 = 2 * F.log2(F.col("n_events")) - F.log2(F.col("sum_c2"))
    log2k = F.log2(F.col("n_hours"))
    return per.select(
        "event_type",
        "n_events",
        "n_hours",
        "sum_c2",
        (h <= log2k + F.lit(_EPS)).alias("h_le_max"),
        (h >= renyi2 - F.lit(_EPS)).alias("h_ge_renyi2"),
        (h >= F.lit(0.96) * log2k).alias("h_flat"),
    )


_ENTROPY_ORACLE = """
WITH c AS (
  SELECT event_type, hour(ts) AS h, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
per AS (
  SELECT event_type,
         CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         CAST(SUM(c * c) AS BIGINT) AS sum_c2,
         SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS clogc
  FROM c GROUP BY 1
)
SELECT event_type, n_events, n_hours, sum_c2,
       (log2(CAST(n_events AS DOUBLE)) - clogc / n_events
        <= log2(CAST(n_hours AS DOUBLE)) + 1e-9) AS h_le_max,
       (log2(CAST(n_events AS DOUBLE)) - clogc / n_events
        >= 2 * log2(CAST(n_events AS DOUBLE))
           - log2(CAST(sum_c2 AS DOUBLE)) - 1e-9) AS h_ge_renyi2,
       (log2(CAST(n_events AS DOUBLE)) - clogc / n_events
        >= 0.96 * log2(CAST(n_hours AS DOUBLE))) AS h_flat
FROM per
"""


def _kl_source_unigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence from the corpus unigram distribution
    (X-221): the data-mixing domain-shift signal — a source whose token
    mix drifts from the corpus lights up here long before perplexity
    does. KL(p‖q) = Σ (c/n)·log₂((c·N)/(n·g)) over the source's terms
    (p ≪ q by construction: every source term is a corpus term).

    Emits (source, n_tokens, vocab) exact + the Gibbs/band/cross-
    entropy booleans. Scale: one (source, tok) aggregate; the global
    term counts RE-AGGREGATE that table (tok-keyed — vocabulary-sized,
    never a second corpus pass); the per-source fold is
    vocabulary-sized too."""
    docs = io.load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode_outer(tokens(F.col("text"))).alias("tok")
    ).filter(F.col("tok").isNotNull())
    sc = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("_c"))
    gc = sc.groupBy("tok").agg(F.sum("_c").alias("_g"))
    st = sc.groupBy("source").agg(F.sum("_c").alias("_n"))
    gt = gc.agg(F.sum("_g").alias("_ng"))
    j = (
        sc.join(gc, "tok")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(gt))
    )
    p = F.col("_c").cast("double") / F.col("_n").cast("double")
    # log2((c·N)/(n·g)) via exact BIGINT products then ONE double
    # division — both engines produce the identical double input to
    # their libm log2 (products ≤ N² ≈ 6e12 at sf0.1, inside BIGINT).
    lr = F.log2(
        (F.col("_c") * F.col("_ng")).cast("double")
        / (F.col("_n") * F.col("_g")).cast("double")
    )
    agg = j.groupBy("source").agg(
        F.max("_n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("vocab"),
        F.sum(p * lr).alias("_kl"),
        F.sum(p * F.log2(F.col("_c").cast("double"))).alias("_plogc"),
        F.sum(p * F.log2(F.col("_g").cast("double"))).alias("_plogg"),
        F.max("_ng").cast("long").alias("_ng"),
    )
    hp = F.log2(F.col("n_tokens")) - F.col("_plogc")
    hpq = F.log2(F.col("_ng")) - F.col("_plogg")
    return agg.select(
        "source",
        "n_tokens",
        "vocab",
        (F.col("_kl") > F.lit(1e-6)).alias("kl_pos"),
        (F.col("_kl") <= F.lit(0.05)).alias("kl_band"),
        (hp <= hpq + F.lit(_EPS)).alias("gibbs_holds"),
    )


_KL_ORACLE = """
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS tok FROM documents
),
sc AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
gc AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS g FROM sc GROUP BY 1),
st AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM sc GROUP BY 1),
gt AS (SELECT CAST(SUM(g) AS BIGINT) AS ng FROM gc),
agg AS (
  SELECT s.source,
         MAX(st.n) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         SUM((s.c::DOUBLE / st.n)
             * log2((s.c * gt.ng)::DOUBLE / (st.n * g.g)::DOUBLE)) AS kl,
         SUM((s.c::DOUBLE / st.n) * log2(s.c::DOUBLE)) AS plogc,
         SUM((s.c::DOUBLE / st.n) * log2(g.g::DOUBLE)) AS plogg,
         MAX(gt.ng) AS ng
  FROM sc s JOIN gc g USING (tok) JOIN st ON st.source = s.source
  CROSS JOIN gt
  GROUP BY 1
)
SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens, vocab,
       (kl > 1e-6) AS kl_pos,
       (kl <= 0.05) AS kl_band,
       (log2(n_tokens::DOUBLE) - plogc
        <= log2(ng::DOUBLE) - plogg + 1e-9) AS gibbs_holds
FROM agg
"""


def _pmi_log_bracket_claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True log₂ PMI of the registered top-20 collocations, certified
    against the integer surrogate (X-222). The surrogate pmi_scaled =
    ((c_ab·scale div c_prev)·N) div c_cur truncates twice; the exact
    error envelope is pmi_scaled ≤ scale·ratio < pmi_scaled +
    N div c_cur + 2, so the claim brackets the float log between
    log₂(pmi_scaled/scale) and log₂((pmi_scaled + N div c_cur + 2)/
    scale). Emits the SAME (prev, cur, n_pairs, pmi_scaled, rnk) rows
    as the r8-green pmi_collocations_topk plus the two booleans — the
    two tiers certify each other.

    Scale: identical to the registered query (one pair-count
    aggregate, marginal re-aggregates, broadcast 1-row N, top-k via
    sort+limit)."""
    from pyspark.sql import Window

    from kinesis_stream_video_project_spark.operators.lm import doc_bigrams

    scale = 10**6
    docs = io.load_table(spark, sf_dir, "documents")
    counts = (
        doc_bigrams(docs)
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    prev_m = counts.groupBy("prev").agg(F.sum("n_pairs").alias("c_prev"))
    cur_m = counts.groupBy("cur").agg(F.sum("n_pairs").alias("c_cur"))
    total = counts.agg(F.sum("n_pairs").alias("n_total"))
    scored = (
        counts.filter(F.col("n_pairs") >= 5)
        .join(prev_m, "prev")
        .join(cur_m, "cur")
        .crossJoin(F.broadcast(total))
        .select(
            "prev",
            "cur",
            "n_pairs",
            "c_prev",
            "c_cur",
            "n_total",
            F.expr(
                f"(((n_pairs * {scale}) DIV c_prev) * n_total) DIV c_cur"
            )
            .cast("long")
            .alias("pmi_scaled"),
        )
    )
    top = scored.orderBy(
        F.col("pmi_scaled").desc(), F.col("prev"), F.col("cur")
    ).limit(20)
    w = Window.orderBy(F.col("pmi_scaled").desc(), F.col("prev"), F.col("cur"))
    ranked = top.withColumn("rnk", F.row_number().over(w).cast("long"))
    pmi_log = F.log2(
        (F.col("n_pairs") * F.col("n_total")).cast("double")
        / (F.col("c_prev") * F.col("c_cur")).cast("double")
    )
    ub = (
        F.col("pmi_scaled")
        + F.expr("n_total DIV c_cur").cast("long")
        + F.lit(2)
    )
    return ranked.select(
        "prev",
        "cur",
        "n_pairs",
        "pmi_scaled",
        "rnk",
        (
            (pmi_log >= F.log2(F.col("pmi_scaled").cast("double") / scale) - F.lit(_EPS))
            & (pmi_log <= F.log2(ub.cast("double") / scale) + F.lit(_EPS))
        ).alias("in_bracket"),
        (
            (pmi_log > 0)
            == (F.col("n_pairs") * F.col("n_total") > F.col("c_prev") * F.col("c_cur"))
        ).alias("sign_ok"),
    )


_PMI_BRACKET_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bgs AS (
  SELECT t[i] AS prev, t[i + 1] AS cur
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
),
c AS (SELECT prev, cur, COUNT(*) AS n_pairs FROM bgs GROUP BY 1, 2),
pm AS (SELECT prev, CAST(SUM(n_pairs) AS BIGINT) AS c_prev FROM c GROUP BY 1),
cm AS (SELECT cur, CAST(SUM(n_pairs) AS BIGINT) AS c_cur FROM c GROUP BY 1),
tot AS (SELECT CAST(SUM(n_pairs) AS BIGINT) AS n_total FROM c),
sc AS (
  SELECT c.prev, c.cur, c.n_pairs, pm.c_prev, cm.c_cur, tot.n_total,
         CAST((((c.n_pairs * 1000000) // pm.c_prev) * tot.n_total)
              // cm.c_cur AS BIGINT) AS pmi_scaled
  FROM c JOIN pm USING (prev) JOIN cm USING (cur) CROSS JOIN tot
  WHERE c.n_pairs >= 5
),
ranked AS (
  SELECT prev, cur, CAST(n_pairs AS BIGINT) AS n_pairs, pmi_scaled,
         c_prev, c_cur, n_total,
         CAST(row_number() OVER (ORDER BY pmi_scaled DESC, prev, cur)
              AS BIGINT) AS rnk
  FROM sc QUALIFY rnk <= 20
)
SELECT prev, cur, n_pairs, pmi_scaled, rnk,
       (log2((n_pairs * n_total)::DOUBLE / (c_prev * c_cur)::DOUBLE)
          >= log2(pmi_scaled::DOUBLE / 1000000.0) - 1e-9
        AND
        log2((n_pairs * n_total)::DOUBLE / (c_prev * c_cur)::DOUBLE)
          <= log2((pmi_scaled + (n_total // c_cur) + 2)::DOUBLE / 1000000.0)
             + 1e-9) AS in_bracket,
       ((log2((n_pairs * n_total)::DOUBLE / (c_prev * c_cur)::DOUBLE) > 0)
        = (n_pairs * n_total > c_prev * c_cur)) AS sign_ok
FROM ranked
"""


def _ams_join_size_events_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """AMS join-size estimate for events.user_id ⋈ orders.o_custkey
    (X-223): the optimizer's "how big would this join be" question
    answered from two single-pass 16-register sketches, with the exact
    answer and the paper's 3σ Chebyshev claim alongside
    (operators/ams.py::ams_join_size)."""
    from kinesis_stream_video_project_spark.operators.ams import (
        ams_join_size,
    )

    ev = io.load_table(spark, sf_dir, "events")
    od = io.load_table(spark, sf_dir, "orders")
    return ams_join_size(ev, "user_id", od, "o_custkey")


def _ams_join_oracle() -> str:
    from kinesis_stream_video_project_spark.operators.ams import (
        ams_join_size_oracle_sql,
    )

    return ams_join_size_oracle_sql("events", "user_id", "orders", "o_custkey")


QUERIES = {
    "entropy_hourly_claims": _entropy_hourly_claims,
    "kl_source_unigrams": _kl_source_unigrams,
    "pmi_log_bracket_claims": _pmi_log_bracket_claims,
    "ams_join_size_events_orders": _ams_join_size_events_orders,
}

ORACLES = {
    "entropy_hourly_claims": _ENTROPY_ORACLE,
    "kl_source_unigrams": _KL_ORACLE,
    "pmi_log_bracket_claims": _PMI_BRACKET_ORACLE,
    "ams_join_size_events_orders": _ams_join_oracle(),
}

assert set(QUERIES) == set(ORACLES)

TAGS = {name: ("round17",) for name in QUERIES}


def register_all(names: "tuple[str, ...] | None" = None) -> None:
    """Wire the given wave into the live registry — called from
    ``registry._load_all`` when a window has slots, never before."""
    from kinesis_stream_video_project_spark.plans.registry import register

    for name in names if names is not None else tuple(QUERIES):
        register(name, oracle=ORACLES[name], tags=TAGS[name])(QUERIES[name])
