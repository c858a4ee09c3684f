"""Distributed linear algebra over embedding columns (r8 registration
queue).

``embedding_gram`` computes the uncentered Gram / second-moment matrix
G = Σ_r x_r x_rᵀ of an ``array<float>`` column — the input statistic of
PCA, whitening, and low-rank compression of an embedding corpus (the
classic one-pass distributed formulation: per-partition partial
accumulators of a d×d matrix, merged by key — d² floats per task
however many rows, the textbook map-side-combine shape). At 100 TB the
corpus never moves: each task folds its rows into one 64×64 integer
grid and the shuffle carries |partitions|·d(d+1)/2 tiny rows.

Numeric strategy (hash-exactness across engines): each per-row term is
``floor(x_i·x_j·scale + 0.5)`` computed in float64 — float32
components are widened EXACTLY, the product/scale/round sequence is
the same three IEEE ops in the same order in numpy and SQL (the
``scaled_long`` discipline of functions/numeric.py) — and everything
after is integer summation, order-independent under any partitioning.
The merge aggregates as DECIMAL(38,0) and refuses (raise_error) a
result outside BIGINT instead of wrapping; per-partition partials
refuse at 2^62 python-side with scale advice (the pagerank_int
refuse-loudly rule at both altitudes).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRAM_PARTIALS_SCHEMA = "i int, j int, partial long"
_CHUNK = 256  # rows per dense outer-product slab (d=64 → 8.4 MB/slab)


def embedding_gram(
    embeddings: DataFrame,
    dims: int = 64,
    scale: int = 10**9,
    vec: str = "embedding",
) -> DataFrame:
    """Upper-triangle scaled Gram matrix: one row per ``(i, j)`` with
    ``1 <= i <= j <= dims`` (1-based), ``gram_scaled =
    Σ_r floor(x_ri·x_rj·scale + 0.5)`` as BIGINT — d(d+1)/2 = 2080 rows
    at d=64. Null vectors and wrong-length vectors are REFUSED (raise),
    not skipped: a silent drop would change the statistic of record.

    Scale shape: ``select(vec)`` prunes the scan to the one column;
    mapInPandas folds Arrow batches into ONE d×d int64 accumulator per
    partition in ``_CHUNK``-row slabs (constant memory), emitting 2080
    partial rows per partition; a (i, j) hash aggregate merges
    |partitions| partials per cell. No shuffle touches a vector."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        G = np.zeros((dims, dims), dtype=np.int64)
        seen = False
        for pdf in batches:
            if not len(pdf):
                continue
            col = pdf[vec]
            if col.isna().any():
                raise ValueError(
                    "embedding_gram: null embedding vector - filter or "
                    "repair upstream; silently skipping would change the "
                    "corpus statistic"
                )
            X = np.array(
                [np.asarray(v, dtype=np.float64) for v in col], dtype=np.float64
            )
            if X.ndim != 2 or X.shape[1] != dims:
                raise ValueError(
                    f"embedding_gram: expected {dims}-dim vectors, got "
                    f"shape {X.shape}"
                )
            for lo in range(0, X.shape[0], _CHUNK):
                S = X[lo : lo + _CHUNK]
                P = S[:, :, None] * S[:, None, :]
                G += np.floor(P * scale + 0.5).astype(np.int64).sum(axis=0)
                # Per-SLAB bound check (not per batch): one Arrow batch
                # can hold many slabs of extreme-magnitude vectors, and
                # an int64 wrap inside the batch would corrupt the
                # partial silently before a batch-tail check ran. The
                # 2^62 ceiling leaves one slab's worth of headroom
                # (_CHUNK * scale * max|x_i*x_j| must stay under 2^62).
                if np.abs(G).max() >= 2**62:
                    raise ValueError(
                        "embedding_gram: partition partial approaching "
                        f"BIGINT - lower scale below {scale} (bound: "
                        "rows * scale * max|x_i*x_j| must stay under "
                        "2^62 per partition)"
                    )
            seen = True
        if seen:
            iu = np.triu_indices(dims)
            yield pd.DataFrame(
                {
                    "i": (iu[0] + 1).astype(np.int32),
                    "j": (iu[1] + 1).astype(np.int32),
                    "partial": G[iu],
                }
            )

    merged = (
        embeddings.select(vec)
        .mapInPandas(partials, _GRAM_PARTIALS_SCHEMA)
        .groupBy("i", "j")
        .agg(F.sum(F.col("partial").cast("decimal(38,0)")).alias("_s"))
    )
    bound = 2**63 - 1
    guard = (
        f"CASE WHEN abs(_s) <= {bound} THEN CAST(_s AS BIGINT) "
        f"ELSE raise_error(concat('embedding_gram: cell (', i, ',', j, ') "
        f"sum ', CAST(_s AS STRING), ' exceeds BIGINT - lower scale')) END"
    )
    return merged.select("i", "j", F.expr(guard).alias("gram_scaled"))


def gram_top_component(
    gram_rows: list,
    dims: int = 64,
    scale: int = 10**9,
    max_iters: int = 20000,
    tol: float = 1e-13,
) -> tuple[float, np.ndarray]:
    """Driver-side power iteration on a COLLECTED upper-triangle Gram
    (the d×d matrix is ~33 KB at d=64 — the whole point of the
    distributed fold is that the eigen step is trivial once the corpus
    is reduced): returns (top eigenvalue, unit eigenvector) of G/scale.
    Deterministic all-ones start (no RNG — resume-safe and test-
    stable); a start vector orthogonal to the top component cannot stay
    so under float rounding for a generic corpus Gram. Not a
    hash-gated query — eigenvectors are float-iteration artifacts; the
    hash gate stops at the integer Gram."""
    G = np.zeros((dims, dims), dtype=np.float64)
    for i, j, g in gram_rows:
        G[i - 1, j - 1] = g
        G[j - 1, i - 1] = g
    G /= float(scale)
    v = np.ones(dims) / np.sqrt(dims)
    for _ in range(max_iters):
        w = G @ v
        n = np.linalg.norm(w)
        if n == 0.0:
            return 0.0, v
        w /= n
        # sign-insensitive step delta: convergence rate is (λ2/λ1)^k,
        # so a fixed iteration count silently under-converges exactly
        # when the corpus's eigen-gap is small — iterate to tolerance.
        if min(np.linalg.norm(w - v), np.linalg.norm(w + v)) < tol:
            v = w
            break
        v = w
    return float(v @ G @ v), v
