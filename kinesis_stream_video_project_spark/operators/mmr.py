"""Maximal Marginal Relevance diversity re-ranking (Carbonell &
Goldstein, SIGIR 1998) — the retrieval tier that trades raw relevance
for coverage: greedily pick the document maximizing
``rel(d) − λ·max_{s∈S} sim(d, s)``, so near-duplicates of an already-
selected result are penalized out. The LLM-pipeline use is
deduplicated context assembly: top-k-by-cosine hands a RAG prompt five
copies of the same paragraph; MMR hands it five different ones.

Determinism: relevance and pairwise similarities are the engine's
r4-ROUNDED cosines (the cosine_topk ranking discipline — 4-dp doubles
rendered identically by both engines), so the greedy arithmetic
``rel − 0.5·pen`` runs on bit-identical inputs through the same two
IEEE ops and every argmax comparison agrees; ties break on vec_id.

Scale contract (stated): MMR is quadratic in the CANDIDATE set, never
the corpus — the relevance tier (exact cosine here; IVF/PQ at scale)
cuts the corpus to n_candidates (50), the pairwise matrix is
n_candidates² rows, and the greedy fold runs in ONE Arrow group (a
model-sized problem by construction: 2 550 rows through one task).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.numeric import r4
from kinesis_stream_video_project_spark.functions.vectors import dot, l2_norm

_MMR_SCHEMA = "step bigint, vec_id bigint, mmr_score double"


def mmr_fold(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pure greedy MMR selection (module-level so tests can drive it):
    expects the union frame (i, j, v, kind) — kind 'r' rows carry
    relevance (j null), kind 's' rows the full sim matrix — plus
    constant columns k_select and lam already validated upstream."""
    rel = {
        int(r.i): float(r.v) for r in pdf[pdf["kind"] == "r"].itertuples()
    }
    sims: dict[tuple[int, int], float] = {
        (int(r.i), int(r.j)): float(r.v)
        for r in pdf[pdf["kind"] == "s"].itertuples()
    }
    k_select = int(pdf["k_select"].iloc[0])
    lam = float(pdf["lam"].iloc[0])
    selected: list[tuple[int, int, float]] = []
    chosen: list[int] = []
    for step in range(1, k_select + 1):
        best = None
        for d, r_d in rel.items():
            if d in chosen:
                continue
            pen = max((sims[(d, s)] for s in chosen), default=0.0)
            score = r_d - lam * pen
            # argmax with vec_id tiebreak (smaller id wins equal scores)
            if best is None or score > best[1] or (
                score == best[1] and d < best[0]
            ):
                best = (d, score)
        if best is None:
            break
        chosen.append(best[0])
        selected.append((step, best[0], best[1]))
    return pd.DataFrame(
        {
            "step": [s for s, _, _ in selected],
            "vec_id": [d for _, d, _ in selected],
            "mmr_score": [v for _, _, v in selected],
        }
    )


def mmr_topk(
    query: DataFrame,
    corpus: DataFrame,
    n_candidates: int = 50,
    k_select: int = 10,
    lam: float = 0.5,
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Diversity-selected top-``k_select`` for ONE query vector.

    ``query``: a 1-row frame with column ``vec`` (validated: the greedy
    state is a single selection chain, so multi-query batching belongs
    one level up, one chain each). Relevance tier = exact r4 cosine
    top-``n_candidates``; selection = greedy MMR at ``lam``. Returns
    ``(step, vec_id, mmr_score)``."""
    if not (1 <= k_select <= n_candidates):
        raise ValueError(
            f"k_select must be in 1..n_candidates, got {k_select}/{n_candidates}"
        )
    q = F.broadcast(
        query.select(
            F.col(vec).alias("_qvec"), l2_norm(F.col(vec)).alias("_qnorm")
        )
    )
    c = corpus.select(
        F.col(corpus_id).alias("_i"),
        F.col(vec).alias("_cvec"),
        l2_norm(F.col(vec)).alias("_cnorm"),
    )
    rel = (
        c.crossJoin(q)
        .select(
            "_i",
            "_cvec",
            "_cnorm",
            r4(
                dot(F.col("_qvec"), F.col("_cvec"))
                / (F.col("_qnorm") * F.col("_cnorm"))
            ).alias("_rel"),
        )
        # Zero-norm guard (ADVICE r11): a zero-norm embedding makes the
        # cosine NULL/NaN, and a NaN reaching mmr_fold poisons max() and
        # every argmax comparison (NaN > x is always False) — drop such
        # rows HERE, mirrored by the oracle's isnan filter, so both
        # engines select from the same candidate set.
        .filter(F.col("_rel").isNotNull() & ~F.isnan(F.col("_rel")))
        .orderBy(F.col("_rel").desc(), F.col("_i"))
        .limit(n_candidates)
    )
    # Candidate embeddings travel with the relevance rows (50 vectors),
    # so the pairwise matrix is a broadcast self-join — corpus touched
    # exactly once, by the relevance tier.
    a = rel.select("_i", "_cvec", "_cnorm", "_rel")
    b = rel.select(
        F.col("_i").alias("_j"),
        F.col("_cvec").alias("_jvec"),
        F.col("_cnorm").alias("_jnorm"),
    )
    sims = (
        a.join(F.broadcast(b), F.col("_i") != F.col("_j"))
        .select(
            "_i",
            "_j",
            r4(
                dot(F.col("_cvec"), F.col("_jvec"))
                / (F.col("_cnorm") * F.col("_jnorm"))
            ).alias("_v"),
        )
        # Same NaN guard as the relevance tier: with zero-norm rows
        # already excluded from `rel` this is vacuous, but a caller-side
        # candidate frame must never smuggle NaN into the greedy fold.
        .filter(F.col("_v").isNotNull() & ~F.isnan(F.col("_v")))
    )
    union = sims.select(
        F.col("_i").alias("i"),
        F.col("_j").alias("j"),
        F.col("_v").alias("v"),
        F.lit("s").alias("kind"),
    ).unionByName(
        rel.select(
            F.col("_i").alias("i"),
            F.lit(None).cast("long").alias("j"),
            F.col("_rel").alias("v"),
            F.lit("r").alias("kind"),
        )
    )
    folded = (
        union.select(
            "*",
            F.lit(k_select).alias("k_select"),
            F.lit(float(lam)).alias("lam"),
            F.lit(1).alias("_one"),
        )
        .groupBy("_one")
        .applyInPandas(
            lambda pdf: mmr_fold(pdf), _MMR_SCHEMA
        )
    )
    return folded.select("step", "vec_id", r4(F.col("mmr_score")).alias("mmr_score"))


def mmr_oracle_sql(
    rel_cte: str,
    n_candidates: int = 50,
    k_select: int = 10,
    lam: float = 0.5,
) -> str:
    """DuckDB replay of :func:`mmr_topk` — ``rel_cte`` must produce
    (i, embedding, rel) for the top-``n_candidates`` candidates with the
    SAME r4 cosine relevance. The greedy selection unrolls into
    ``k_select`` generated CTE steps (argmax per step via ORDER BY
    score DESC, i LIMIT 1 — the vec_id tiebreak)."""
    from kinesis_stream_video_project_spark.plans.queries_llm import _dd_cosine

    # Every CTE is MATERIALIZED: each selection step references the
    # previous prefix ~3×, so default inlining re-expands the chain
    # ~3^k times — at k=10 that is ~59 000 inlined parquet scans
    # ("Too many open files", measured before this keyword landed).
    # NULL/NaN relevance and similarity rows are filtered on BOTH sides
    # (zero-norm guard, ADVICE r11) so the engines agree on the
    # candidate set even for degenerate embeddings.
    parts = [
        "cand AS MATERIALIZED (SELECT * FROM ("
        f"{rel_cte}"
        ") WHERE rel IS NOT NULL AND NOT isnan(rel))",
        f"""sims AS MATERIALIZED (
  SELECT * FROM (
    SELECT a.i AS i, b.i AS j,
           (floor(({_dd_cosine('a.embedding', 'b.embedding')}) * 10000.0 + 0.5)
            / 10000.0) AS v
    FROM cand a JOIN cand b ON a.i <> b.i
  ) WHERE v IS NOT NULL AND NOT isnan(v)
)""",
        "s1 AS MATERIALIZED (SELECT i, CAST(rel AS DOUBLE) AS score FROM cand "
        "ORDER BY rel DESC, i LIMIT 1)",
        "sel1 AS MATERIALIZED (SELECT i FROM s1)",
    ]
    for k in range(2, k_select + 1):
        parts.append(
            f"""s{k} AS MATERIALIZED (
  SELECT r.i,
         r.rel - {lam} * (SELECT MAX(p.v) FROM sims p
                          WHERE p.i = r.i
                            AND p.j IN (SELECT i FROM sel{k - 1})) AS score
  FROM cand r WHERE r.i NOT IN (SELECT i FROM sel{k - 1})
  ORDER BY score DESC, r.i LIMIT 1
)"""
        )
        parts.append(
            f"sel{k} AS MATERIALIZED "
            f"(SELECT i FROM sel{k - 1} UNION ALL SELECT i FROM s{k})"
        )
    union = " UNION ALL ".join(
        f"SELECT {k} AS step, i, score FROM s{k}" for k in range(1, k_select + 1)
    )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT CAST(step AS BIGINT) AS step, CAST(i AS BIGINT) AS vec_id,
       (floor(score * 10000.0 + 0.5) / 10000.0) AS mmr_score
FROM ({union})
"""
    )
