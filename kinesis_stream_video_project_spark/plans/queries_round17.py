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
* ``holt_conformal_coverage`` (X-227) — split-conformal prediction
  intervals for the r14 Holt forecaster with an exact finite-sample
  coverage audit: integer residuals, rank-statistic quantile, count
  coverage — all-integer, no claims machinery needed.
* ``surprisal_bits_claims`` (X-226) — TRUE per-doc bigram
  cross-entropy in bits certified against the integer surprisal
  surrogate: nonnegativity, Jensen (AM-GM direction) vs the
  surrogate's own term sum, strict-Jensen gap, and a measured band.
  The X-103 caveat closed the way X-222 closed X-154's.
* ``markov_removal_attribution`` (X-225) — Anderl et al. 2014
  removal-effect attribution: each channel's credit is the drop in
  absorbing-chain conversion probability when its node is removed —
  the counterfactual tier completing the attribution triad (rule-based
  → Shapley → Markov). All-integer fixed point in millionths (the r5
  all-integer-recursion rule): order-free, hash-exact, no claims
  needed; 60 iterations verified stationary.
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


# ---------------------------------------------------------------------------
# Markov removal-effect attribution (X-225)
# ---------------------------------------------------------------------------

_MRA_SCALE = 10**6
_MRA_ITERS = 60
_MRA_SCHEMA = (
    "channel string, p_full_start bigint, p_removed_start bigint, "
    "removal_millionths bigint, share_millionths bigint"
)


def mra_fold(pdf: "pd.DataFrame") -> "pd.DataFrame":
    """Pure removal-effect computation (module-level so tests can drive
    it): expects the model-sized transition-count frame (src, dst, n).
    For the full chain and for each channel-removed variant, run the
    ALL-INTEGER absorbing-chain fixed point

        p(s) ← (Σ_dst n(s,dst) · val(dst)) DIV rowtotal(s)

    with val(CONV) = 10⁶, val(NULL) = 0, val(channel) = p(channel),
    edges into the removed channel contributing 0 (row totals stay the
    count totals — removed mass is LOST, the Anderl et al. node-removal
    convention). Integer iteration from p ≡ 0 is monotone nondecreasing
    and integer-valued, so it reaches its exact stationary point in
    finitely many steps; both engines run exactly 60, so the emitted
    integers are hash-identical even mid-convergence. Removal effect =
    p_full(START) − p_removed(START); shares normalize by the effect
    sum (millionths)."""
    import pandas as pd

    counts: dict = {}
    rt: dict = {}
    for r in pdf.itertuples():
        counts[(r.src, r.dst)] = int(r.n)
        rt[r.src] = rt.get(r.src, 0) + int(r.n)
    channels = sorted(
        {s for s, _ in counts if s != "START"}
        | {d for _, d in counts if d not in ("CONV", "NULL")}
    )

    def p_start(removed: "str | None") -> int:
        states = ["START"] + [c for c in channels if c != removed]
        p = {s: 0 for s in states}
        for _ in range(_MRA_ITERS):
            nxt = {}
            for s in states:
                acc = 0
                for d in ["CONV"] + channels:
                    n = counts.get((s, d), 0)
                    if n == 0 or d == removed:
                        continue
                    acc += n * (_MRA_SCALE if d == "CONV" else p[d])
                nxt[s] = acc // rt[s] if rt.get(s) else 0
            p = nxt
        return p["START"]

    full = p_start(None)
    removal = {c: full - p_start(c) for c in channels}
    total = sum(removal.values())
    return pd.DataFrame(
        {
            "channel": channels,
            "p_full_start": [full] * len(channels),
            "p_removed_start": [full - removal[c] for c in channels],
            "removal_millionths": [removal[c] for c in channels],
            "share_millionths": [
                (removal[c] * _MRA_SCALE) // total if total > 0 else 0
                for c in channels
            ],
        }
    )


def _mra_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey transition counts for the removal-effect chain: per
    user, events in (ts, event_id) order TRUNCATED at the first
    purchase (post-conversion activity is out of the journey — stated);
    the purchase itself absorbs as CONV, a journey with no purchase
    falls off the end into NULL, and START precedes the first state.
    One corpus window pass, one model-sized count aggregate."""
    from pyspark.sql import Window

    ev = io.load_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("_ty"),
        F.unix_micros("ts").alias("_us"),
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("_us", "event_id")
    wall = Window.partitionBy("user_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rn = ev.select(
        "user_id",
        "_ty",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wall).alias("_nrows"),
    )
    rn = rn.withColumn(
        "_first_p",
        F.min(F.when(F.col("_ty") == "purchase", F.col("_rn"))).over(wall),
    )
    kept = rn.filter(
        F.col("_first_p").isNull() | (F.col("_rn") <= F.col("_first_p"))
    ).select(
        "user_id",
        "_rn",
        "_nrows",
        "_first_p",
        F.when(F.col("_rn") == F.col("_first_p"), F.lit("CONV"))
        .otherwise(F.col("_ty"))
        .alias("_st"),
    )
    wk = Window.partitionBy("user_id").orderBy("_rn")
    edges = kept.select(
        F.coalesce(F.lag("_st").over(wk), F.lit("START")).alias("src"),
        F.col("_st").alias("dst"),
        "_rn",
        "_nrows",
        "_first_p",
    )
    # a non-converting journey's LAST kept row also emits (state, NULL)
    tail = kept.filter(
        F.col("_first_p").isNull() & (F.col("_rn") == F.col("_nrows"))
    ).select(F.col("_st").alias("src"), F.lit("NULL").alias("dst"))
    return (
        edges.select("src", "dst")
        .unionByName(tail)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _markov_removal_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect attribution (X-225, Anderl et al. 2014 —
    "Mapping the customer journey"): each channel's credit is the drop
    in chain conversion probability when the channel's node is removed
    — the counterfactual tier of the attribution triad next to the
    rule-based `attribution_channels` and the game-theoretic
    `shapley_channel_attribution`. All-integer absorbing-chain fixed
    point (millionths), so every emitted value is hash-exact with no
    claims needed.

    Scale: one corpus window pass → a model-sized (src, dst, n) count
    table (≤ (V+1)·(V+2) rows) → the V+1 fixed-point iterations run in
    ONE Arrow group (the mmr_fold pattern)."""
    counts = _mra_transition_counts(spark, sf_dir)
    return (
        counts.withColumn("_one", F.lit(1))
        .groupBy("_one")
        .applyInPandas(lambda pdf: mra_fold(pdf), _MRA_SCHEMA)
        .select(
            "channel",
            "p_full_start",
            "p_removed_start",
            "removal_millionths",
            "share_millionths",
        )
    )


def _mra_oracle() -> str:
    """Recursive-CTE replay: the same journey truncation, the same
    all-integer fixed point iterated exactly 60 times over a
    (variant, state) grid — absorbing rows carry themselves forward so
    the recursive term references the walk exactly once."""
    K = _MRA_ITERS
    S = _MRA_SCALE
    return f"""
WITH RECURSIVE
ev AS (
  SELECT user_id, event_type AS ty,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS nrows
  FROM events
),
fp AS (
  SELECT *, MIN(CASE WHEN ty = 'purchase' THEN rn END)
              OVER (PARTITION BY user_id) AS first_p
  FROM ev
),
kept AS (
  SELECT user_id, rn, nrows, first_p,
         CASE WHEN rn = first_p THEN 'CONV' ELSE ty END AS st
  FROM fp WHERE first_p IS NULL OR rn <= first_p
),
edges AS (
  SELECT COALESCE(lag(st) OVER (PARTITION BY user_id ORDER BY rn),
                  'START') AS src,
         st AS dst
  FROM kept
  UNION ALL
  SELECT st AS src, 'NULL' AS dst
  FROM kept WHERE first_p IS NULL AND rn = nrows
),
counts AS (SELECT src, dst, COUNT(*) AS n FROM edges GROUP BY 1, 2),
rt AS (SELECT src, SUM(n) AS total FROM counts GROUP BY 1),
channels AS (
  SELECT DISTINCT src AS ch FROM counts WHERE src <> 'START'
  UNION
  SELECT DISTINCT dst FROM counts WHERE dst NOT IN ('CONV', 'NULL')
),
variants AS (
  SELECT '__full__' AS removed UNION ALL SELECT ch FROM channels
),
grid AS (
  -- DISTINCT is load-bearing: under WITH RECURSIVE DuckDB inlines the
  -- non-recursive CTEs into the recursive term, and the channels
  -- UNION's dedup is lost in that inlining — without DISTINCT each
  -- channel state doubles and the walk sums double-count (measured:
  -- p blew past the 10^6 ceiling).
  SELECT DISTINCT v.removed, s.st
  FROM variants v,
       (SELECT 'START' AS st UNION ALL SELECT ch FROM channels
        UNION ALL SELECT 'CONV' UNION ALL SELECT 'NULL') s
  WHERE s.st <> v.removed
),
walk AS (
  SELECT 0 AS k, removed, st,
         CAST(CASE WHEN st = 'CONV' THEN {S} ELSE 0 END AS BIGINT) AS p
  FROM grid
  UNION ALL
  SELECT w.k + 1, w.removed, w.st,
         CAST(CASE WHEN w.st IN ('CONV', 'NULL') THEN w.p
              ELSE COALESCE((SELECT SUM(c.n * w2.p) // MAX(rt.total)
                             FROM counts c
                             JOIN walk w2 ON w2.removed = w.removed
                                         AND w2.st = c.dst
                                         AND w2.k = w.k
                             JOIN rt ON rt.src = w.st
                             WHERE c.src = w.st
                               AND c.dst <> w.removed), 0) END AS BIGINT)
           AS p
  FROM walk w WHERE w.k < {K}
),
finals AS (
  SELECT removed, p FROM walk WHERE k = {K} AND st = 'START'
),
full_p AS (SELECT p AS pf FROM finals WHERE removed = '__full__'),
rem AS (
  SELECT f.removed AS channel, fp2.pf AS p_full_start,
         f.p AS p_removed_start,
         fp2.pf - f.p AS removal
  FROM finals f CROSS JOIN full_p fp2
  WHERE f.removed <> '__full__'
),
tot AS (SELECT SUM(removal) AS t FROM rem)
SELECT channel,
       CAST(p_full_start AS BIGINT) AS p_full_start,
       CAST(p_removed_start AS BIGINT) AS p_removed_start,
       CAST(removal AS BIGINT) AS removal_millionths,
       CAST(CASE WHEN tot.t > 0 THEN (removal * {S}) // tot.t
                 ELSE 0 END AS BIGINT) AS share_millionths
FROM rem CROSS JOIN tot
"""


QUERIES["markov_removal_attribution"] = _markov_removal_attribution
ORACLES["markov_removal_attribution"] = _mra_oracle()
TAGS["markov_removal_attribution"] = ("round17",)
assert set(QUERIES) == set(ORACLES)


# ---------------------------------------------------------------------------
# True bigram cross-entropy (bits) claims (X-226)
# ---------------------------------------------------------------------------


def _surprisal_bits_claims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE per-document bigram cross-entropy in bits, certified
    against the r8-green integer surprisal surrogate (X-226 — the
    X-103 caveat closed the same way X-222 closed X-154's): H(doc) =
    mean log₂(c_prev/c_bigram) over the doc's adjacent pairs, the
    actual bits-per-bigram of the self-corpus bigram model.

    Claims per doc: H ≥ 0 (every ratio ≥ 1 since c_bigram ≤ c_prev);
    Jensen — H ≤ log₂(mean ratio), the AM-GM direction, against the
    surrogate's own integer term sum; strict-Jensen gap > 1e-4
    (measured min 5.3e-4 at sf0.1, 5.0e-3/5.7e-3 at sf0.01/0.001 —
    the fixture's ratio spread keeps the inequality strict); and the
    measured band 4.5 ≤ H ≤ 6.0 bits (measured [4.68, 5.56] across
    SFs). Emits (doc_id, n_bigrams) exact + 4 booleans; docs with < 2
    tokens produce no row (the bigram_surprisal contract).

    Scale: the registered surrogate's shape exactly — one bigram-count
    aggregate, a prev marginal derived from it, joined back onto the
    exploded pairs, one per-doc aggregate."""
    from kinesis_stream_video_project_spark.operators.lm import doc_bigrams

    scale = 10**6
    docs = io.load_table(spark, sf_dir, "documents")
    bgs = doc_bigrams(docs)
    bc = bgs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c_bg"))
    pc = bc.groupBy("prev").agg(F.sum("c_bg").alias("c_prev"))
    # prev marginal joined onto the vocab²-bounded count table first, so
    # the corpus-sized pair stream crosses one join instead of two (the
    # bigram_surprisal r14 reorder; identical output, oracle-swept).
    joined = bgs.join(bc.join(pc, "prev"), ["prev", "cur"])
    per = joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(
            F.log2(
                F.col("c_prev").cast("double") / F.col("c_bg").cast("double")
            )
        ).alias("_lsum"),
        F.sum(F.expr(f"(c_prev * {scale}) DIV c_bg").cast("long")).alias(
            "_ssum"
        ),
    )
    h = F.col("_lsum") / F.col("n_bigrams")
    log_sur = F.log2(
        F.col("_ssum").cast("double")
        / F.col("n_bigrams").cast("double")
        / F.lit(float(scale))
    )
    return per.select(
        "doc_id",
        "n_bigrams",
        (h >= F.lit(0.0) - F.lit(_EPS)).alias("h_nonneg"),
        (h <= log_sur + F.lit(_EPS)).alias("jensen_holds"),
        (log_sur - h > F.lit(1e-4)).alias("jensen_strict"),
        ((h >= F.lit(4.5)) & (h <= F.lit(6.0))).alias("h_band"),
    )


_SURPRISAL_BITS_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
bgs AS (
  SELECT doc_id, t[i] AS prev, t[i + 1] AS cur
  FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS u(i)
),
bc AS (SELECT prev, cur, COUNT(*) AS c_bg FROM bgs GROUP BY 1, 2),
pc AS (SELECT prev, CAST(SUM(c_bg) AS BIGINT) AS c_prev FROM bc GROUP BY 1),
per AS (
  SELECT b.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         SUM(log2(pc.c_prev::DOUBLE / bc.c_bg::DOUBLE)) AS lsum,
         CAST(SUM((pc.c_prev * 1000000) // bc.c_bg) AS BIGINT) AS ssum
  FROM bgs b JOIN bc ON bc.prev = b.prev AND bc.cur = b.cur
  JOIN pc ON pc.prev = b.prev
  GROUP BY 1
)
SELECT doc_id, n_bigrams,
       (lsum / n_bigrams >= -1e-9) AS h_nonneg,
       (lsum / n_bigrams
        <= log2(ssum::DOUBLE / n_bigrams::DOUBLE / 1000000.0) + 1e-9)
         AS jensen_holds,
       (log2(ssum::DOUBLE / n_bigrams::DOUBLE / 1000000.0)
        - lsum / n_bigrams > 1e-4) AS jensen_strict,
       (lsum / n_bigrams >= 4.5 AND lsum / n_bigrams <= 6.0) AS h_band
FROM per
"""


QUERIES["surprisal_bits_claims"] = _surprisal_bits_claims
ORACLES["surprisal_bits_claims"] = _SURPRISAL_BITS_ORACLE
TAGS["surprisal_bits_claims"] = ("round17",)
assert set(QUERIES) == set(ORACLES)


# ---------------------------------------------------------------------------
# Split-conformal coverage audit for the Holt forecaster (X-227)
# ---------------------------------------------------------------------------


def _holt_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction-interval coverage audit for the r14
    Holt forecaster (X-227; Vovk et al. 2005, the split/inductive form
    of Papadopoulos et al. 2002): per priority's daily revenue series,
    calibrate on the first 70% of one-step absolute residuals, take the
    exact order statistic q = |r|_(k) with k = min(⌈(n_cal+1)·0.9⌉,
    n_cal) (α = 0.1), and audit the EMPIRICAL coverage of x̂ ± q on the
    held-out 30%. Everything is exact integers — residuals are cents,
    the quantile is a rank, coverage is a count — so the whole audit
    hashes with no claims machinery; the one boolean (|coverage −
    900‰| ≤ 80) states the finite-sample conformal guarantee holds on
    this fixture (measured 835–940‰ across the 3 SFs, nominal 900).

    Scale: the Holt fold's one shard exchange + one grp-partitioned
    rank window over the CALIBRATION residuals (ledger-sized: one row
    per day) + one counts aggregate. Nothing corpus-shaped anywhere."""
    from pyspark.sql import Window

    from kinesis_stream_video_project_spark.operators.forecast import (
        holt_linear,
    )
    from kinesis_stream_video_project_spark.plans.queries_round15 import (
        _daily_series,
    )

    series = _daily_series(spark, sf_dir)
    fc = holt_linear(series).select(
        "grp", (F.col("step") + 1).alias("step"), "forecast_next"
    )
    resid = series.join(fc, ["grp", "step"]).select(
        "grp",
        "step",
        F.abs(F.col("xs") - F.col("forecast_next")).alias("_r"),
    )
    nper = series.groupBy("grp").agg(F.max("step").alias("_n"))
    # Ledger-sized (one row per (grp, day)) with a PYTHON stage (the
    # holt_fold Arrow group) upstream and TWO consumers (cal, test)
    # downstream — the r8 rule: staging with a Python stage
    # localCheckpoints the smallest projection once. Without it each
    # consumer re-ran the fold (the plan guard measured the
    # FlatMapGroupsInPandas subtree 3x in one plan).
    resid = (
        resid.join(F.broadcast(nper), "grp")
        .withColumn("_cend", F.expr("(_n * 7) DIV 10"))
        .localCheckpoint(eager=False)
    )
    cal = resid.filter(F.col("step") <= F.col("_cend"))
    test = resid.filter(F.col("step") > F.col("_cend"))
    ncal = cal.groupBy("grp").agg(F.count(F.lit(1)).alias("n_cal"))
    # k = min(ceil((n_cal+1)*(1-alpha)), n_cal), alpha = 1/10, exact:
    # ceil(9(n_cal+1)/10) = (9*(n_cal+1) + 9) DIV 10
    kf = ncal.select(
        "grp",
        "n_cal",
        F.expr("least((9 * (n_cal + 1) + 9) DIV 10, n_cal)")
        .cast("long")
        .alias("k"),
    )
    w = Window.partitionBy("grp").orderBy("_r", "step")
    q = (
        cal.withColumn("_rn", F.row_number().over(w))
        .join(F.broadcast(kf), "grp")
        .filter(F.col("_rn") == F.col("k"))
        .select("grp", "n_cal", "k", F.col("_r").alias("q_cents"))
    )
    cov = (
        test.join(F.broadcast(q), "grp")
        .groupBy("grp", "n_cal", "k", "q_cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("_r") <= F.col("q_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
        )
    )
    return cov.select(
        "grp",
        "n_cal",
        "n_test",
        "k",
        "q_cents",
        "n_covered",
        F.expr("(n_covered * 1000) DIV n_test").cast("long").alias(
            "coverage_permille"
        ),
        (
            F.abs(F.expr("(n_covered * 1000) DIV n_test") - F.lit(900))
            <= F.lit(80)
        ).alias("near_nominal"),
    )


def _holt_conformal_oracle() -> str:
    from kinesis_stream_video_project_spark.operators.forecast import (
        HOLT_ORACLE_WALK,
    )
    from kinesis_stream_video_project_spark.plans.queries_round15 import (
        _DAILY_SERIES_CTE,
    )

    return (
        "WITH RECURSIVE "
        + _DAILY_SERIES_CTE.strip().lstrip(",")
        + ",\n"
        + HOLT_ORACLE_WALK.strip()
        + """,
resid AS (
  SELECT h.grp, s.step, ABS(s.xs - h.forecast_next) AS r
  FROM holt h JOIN series s ON s.grp = h.grp AND s.step = h.step + 1
),
nper AS (SELECT grp, MAX(step) AS n FROM series GROUP BY 1),
marked AS (
  SELECT r.*, (nper.n * 7) // 10 AS cend
  FROM resid r JOIN nper ON nper.grp = r.grp
),
cal AS (
  SELECT grp, r,
         row_number() OVER (PARTITION BY grp ORDER BY r, step) AS rn,
         COUNT(*) OVER (PARTITION BY grp) AS n_cal
  FROM marked WHERE step <= cend
),
kq AS (
  SELECT grp, CAST(n_cal AS BIGINT) AS n_cal,
         CAST(LEAST((9 * (n_cal + 1) + 9) // 10, n_cal) AS BIGINT) AS k,
         CAST(r AS BIGINT) AS q_cents
  FROM cal WHERE rn = LEAST((9 * (n_cal + 1) + 9) // 10, n_cal)
),
cov AS (
  SELECT m.grp, kq.n_cal, kq.k, kq.q_cents,
         CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CASE WHEN m.r <= kq.q_cents THEN 1 ELSE 0 END)
              AS BIGINT) AS n_covered
  FROM marked m JOIN kq ON kq.grp = m.grp
  WHERE m.step > m.cend
  GROUP BY 1, 2, 3, 4
)
SELECT grp, n_cal, n_test, k, q_cents, n_covered,
       CAST((n_covered * 1000) // n_test AS BIGINT) AS coverage_permille,
       (abs((n_covered * 1000) // n_test - 900) <= 80) AS near_nominal
FROM cov
"""
    )


QUERIES["holt_conformal_coverage"] = _holt_conformal_coverage
ORACLES["holt_conformal_coverage"] = _holt_conformal_oracle()
TAGS["holt_conformal_coverage"] = ("round17",)
assert set(QUERIES) == set(ORACLES)
