"""Similarity search over embedding columns (O-30).

Two tiers:

* ``cosine_topk`` — exact brute force: broadcast the (small) query set
  against the corpus, cosine via JVM higher-order fns, per-query top-k via
  window rank. Corpus-linear, query-broadcast: the right baseline when the
  query set fits in a broadcast (the common batch-retrieval shape).
* ``ivf_topk`` — IVF-style coarse quantization: corpus pre-bucketed by
  centroid (here the fixture's cluster label stands in for a k-means
  assignment); queries probe only the ``nprobe`` nearest centroids, so the
  scan touches corpus/|cells|·nprobe rows. This is the 100 TB path: cells are
  Parquet partitions and the probe becomes partition pruning.

Ranking determinism: rank on (rounded cosine desc, vec_id asc) so Spark and
the DuckDB oracle agree even when float summation differs at 1e-12.
"""

from __future__ import annotations

# Module-level so pandas_udf can resolve the stringified (PEP 563)
# ``pd.Series`` type hints of the Arrow UDFs against module globals.
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_stream_video_project_spark.functions.numeric import r4, scaled_long
from kinesis_stream_video_project_spark.functions.vectors import cosine, dot, l2_norm


def _seq_cosine(a: Column, b: Column, nondeterministic: bool = False) -> Column:
    """Vectorized cosine of two fixed-dims array columns via an Arrow
    pandas UDF — the r15 replacement for the per-pair interpreted
    ``dot/(l2·l2)`` higher-order-function folds (guide §4.2): the JVM
    keeps the join/shuffle shape, whole batches cross the boundary as
    Arrow, and numpy does the math.

    Bit-exactness contract (the kmeans_assign/pq_train_codes discipline,
    re-verified against the DuckDB replay at all three SFs): accumulation
    is DIM-SEQUENTIAL float64 (acc = acc + x·y, one dim at a time) — the
    exact left-to-right IEEE order of the zip_with/aggregate fold — and
    the quotient is dot / (norm_a · norm_b) with both norms sqrt'd from
    the same sequential squared-sums, so every double is bit-identical
    to the fold it replaces (float inputs widen exactly either way;
    IEEE multiplication is commutative, so the norm-product order is
    immaterial). Inputs must be non-ragged (the engine-wide fixed-dims
    embedding contract); a zero-norm side yields NaN here where the old
    fold's ANSI ``floor`` on NaN errored — the fixture has neither.

    ``nondeterministic=True`` marks the UDF non-deterministic for call
    sites whose result feeds a FILTER (the near-dup thresholds): the
    optimizer otherwise pushes the filter below the projection and
    evaluates the UDF twice per row (guide §4.4). The function is in
    fact deterministic — the flag only blocks the duplicating rewrite."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos_udf(x: pd.Series, y: pd.Series) -> pd.Series:
        import numpy as np

        if len(x) == 0:
            return pd.Series([], dtype="float64")
        xa = np.array(list(x), dtype=np.float64)
        ya = np.array(list(y), dtype=np.float64)
        accd = np.zeros(len(xa))
        accx = np.zeros(len(xa))
        accy = np.zeros(len(xa))
        for i in range(xa.shape[1]):
            accd = accd + xa[:, i] * ya[:, i]
            accx = accx + xa[:, i] * xa[:, i]
            accy = accy + ya[:, i] * ya[:, i]
        return pd.Series(accd / (np.sqrt(accx) * np.sqrt(accy)))

    if nondeterministic:
        cos_udf = cos_udf.asNondeterministic()
    return cos_udf(a, b)


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (self excluded upstream).

    r15 shape — the broadcast-model numpy recipe (the kmeans_assign
    ``9646e74`` pattern, guide §4.2/§2.3): the query set is MODEL-sized by
    this operator's contract ("the query set fits in a broadcast"), so it
    collects to the driver once at construction (one tiny pushed-filter
    job — the same eager-model trade kmeans_assign/pq_train_codes already
    make) and ships to workers as a broadcast variable; each Arrow batch
    of the corpus then scores ALL queries in numpy and emits only its
    per-(query, batch) top-k candidate rows. The corpus crosses the
    Python boundary ONCE (not once per query as a pair-join would ship
    it), and the exchange feeding the global window carries ≤ k·|Q| skinny
    rows per batch instead of |batch|·|Q| — the map-side top-k the JVM
    plan previously got from WindowGroupLimit, now fused into the same
    vectorized pass (§2.3 aggregate-before-you-shuffle).

    Bit-exactness contract (the _seq_cosine discipline): dim-sequential
    float64 accumulation (the zip_with/aggregate fold order), cosine =
    dot / (qnorm · cnorm) from per-side sequential squared-sums, and the
    4-dp rounding is applied IN PYTHON as floor(cos·10000.0 + 0.5)/10000.0
    — the literally identical IEEE op sequence of functions.numeric.r4, so
    the emitted double equals the JVM/DuckDB r4 bit-for-bit. Batch-local
    pruning is safe because the final (rounded cos desc, corpus_id asc)
    order restricted to one batch IS the batch's pruning order, so every
    global top-k row survives its batch's top-k (NaN cos — zero-norm rows,
    absent from the fixture — keys as +inf to match Spark's NaN-largest
    desc ordering). Duplicate corpus ids are emitted per ROW, exactly as
    the old pair join did."""
    import numpy as np

    sc = corpus.sparkSession.sparkContext
    q_rows = queries.select(query_id, vec).collect()
    order = sorted(range(len(q_rows)), key=lambda i: q_rows[i][0])
    qids = [q_rows[i][0] for i in order]
    qmat = (
        np.array([list(q_rows[i][1]) for i in order], dtype=np.float64)
        if q_rows
        else np.zeros((0, 0))
    )
    # query norms: the same dim-sequential squared-sum the hoisted
    # per-row l2_norm projection computed (once per query either way)
    qn = np.zeros(len(qids))
    for i in range(qmat.shape[1]):
        qn = qn + qmat[:, i] * qmat[:, i]
    qn = np.sqrt(qn)
    bc = sc.broadcast((qids, qmat, qn))
    pair_schema = T.StructType(
        [
            T.StructField(query_id, queries.schema[query_id].dataType),
            T.StructField(corpus_id, corpus.schema[corpus_id].dataType),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        qids_l, qmat_l, qn_l = bc.value
        nq = len(qids_l)
        for pdf in batches:
            n = len(pdf)
            if n == 0 or nq == 0:
                continue
            v = np.array(list(pdf[vec]), dtype=np.float64)
            accd = np.zeros((n, nq))
            accv = np.zeros(n)
            for i in range(qmat_l.shape[1]):
                accd = accd + v[:, i : i + 1] * qmat_l[None, :, i]
                accv = accv + v[:, i] * v[:, i]
            cos = accd / (qn_l[None, :] * np.sqrt(accv)[:, None])
            # r4, verbatim: floor(x*10000.0 + 0.5)/10000.0 in float64
            cos_r = np.floor(cos * 10000.0 + 0.5) / 10000.0
            cid = pdf[corpus_id].to_numpy()
            outs = []
            for j in range(nq):
                m = cid != qids_l[j]
                ids = cid[m]
                c = cos_r[m, j]
                if len(ids) == 0:
                    continue
                if len(ids) > k:
                    key = np.where(np.isnan(c), np.inf, c)
                    sel = np.lexsort((ids, -key))[:k]
                    ids = ids[sel]
                    c = c[sel]
                outs.append(
                    pd.DataFrame(
                        {
                            query_id: np.full(len(ids), qids_l[j]),
                            corpus_id: ids,
                            "cos_sim": c,
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    pairs = corpus.select(corpus_id, vec).mapInPandas(gen, pair_schema)
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def centroids_by_label(corpus: DataFrame, vec: str = "embedding", label: str = "label") -> DataFrame:
    """Per-cell centroid = component-wise mean of member vectors.

    Computed via posexplode + group-by (scales to any dimension; one shuffle
    keyed by (label, dim) then a tiny shuffle by label to reassemble)."""
    exploded = corpus.select(
        F.col(label), F.posexplode(vec).alias("dim", "component")
    )
    per_dim = exploded.groupBy(label, "dim").agg(
        F.avg(F.col("component").cast("double")).alias("mean_c")
    )
    return (
        per_dim.groupBy(label)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("mean_c")))
            ).alias("_pairs")
        )
        .select(
            label,
            F.transform(F.col("_pairs"), lambda p: p.getField("mean_c")).alias(
                "centroid"
            ),
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
    label: str = "label",
) -> DataFrame:
    """IVF-bucketed approximate top-k: probe the nprobe closest cells only.

    The member-scoring cosine hoists both norms into per-row projections
    (the pre-r15 cosine_topk move): each (query, member) pair pays one dot
    fold instead of three. The tiny query×cells centroid ranking keeps the
    plain cosine — its pair count is |queries|·|cells|, not worth a
    projection.

    Measured non-change (r15 optimization round): replacing the per-pair
    fold with the Arrow pandas-UDF cosine (:func:`_seq_cosine`) was an
    interleaved A/B REGRESSION at sf0.1 — warm min-of-5 0.628 → 0.748 s
    (every round slower) — because the probed pair count here
    (|corpus|·|Q|·nprobe/cells ≈ 2 000) is too small to amortize the
    per-stage Python-runner constant, and the broadcast-model mapInPandas
    form that cosine_topk ships cannot apply lazily: the probe set depends
    on a corpus-sized centroid pass, and collecting it at construction
    would move that pass OUT of the stable bench row's timed span (the
    dup_clusters eager-construction caveat in bench.py). Kept the JVM
    fold; the learned-cell tier (kmeans_assign) and the production index
    path (ivfadc) already score via broadcast-model numpy."""
    cents = centroids_by_label(corpus, vec=vec, label=label)
    q = queries.select(
        F.col(query_id),
        F.col(vec).alias("_qvec"),
        l2_norm(F.col(vec)).alias("_qnorm"),
    )
    # Rank cells per query by centroid cosine; keep nprobe cells.
    cell_scores = q.crossJoin(F.broadcast(cents)).select(
        query_id,
        "_qvec",
        "_qnorm",
        label,
        cosine(F.col("_qvec"), F.col("centroid")).alias("_cell_cos"),
    )
    w_cell = Window.partitionBy(query_id).orderBy(
        F.col("_cell_cos").desc(), F.col(label).asc()
    )
    probed = (
        cell_scores.withColumn("_cr", F.row_number().over(w_cell))
        .filter(F.col("_cr") <= nprobe)
        .select(query_id, "_qvec", "_qnorm", label)
    )
    members = corpus.select(
        F.col(label),
        F.col(corpus_id),
        F.col(vec).alias("_mvec"),
        l2_norm(F.col(vec)).alias("_mnorm"),
    )
    # Search only within probed cells (join on the cell key = partition prune).
    scored = probed.join(members, on=label).filter(
        F.col(corpus_id) != F.col(query_id)
    ).select(
        query_id,
        corpus_id,
        r4(
            dot(F.col("_qvec"), F.col("_mvec"))
            / (F.col("_qnorm") * F.col("_mnorm"))
        ).alias("cos_sim"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, corpus_id, "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def kmeans_assign(
    corpus: DataFrame,
    n_cells: int = 10,
    n_iters: int = 2,
    corpus_id: str = "vec_id",
    vec: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """Deterministic k-means cell assignment — the learned replacement for
    :func:`centroids_by_label`'s label proxy.

    * init: cell = vec_id % n_cells (deterministic, no RNG — reproducible
      across runs/engines, which sampled init is not);
    * each Lloyd iteration: recompute centroids via posexplode + (cell, dim)
      aggregation, then assign every vector to its max-cosine centroid
      (deterministic tiebreak on cell id) via the broadcast-model pattern
      (the pq_train_codes assign): the K×dim centroid table is MODEL-sized,
      so it collects to the driver and ships as a broadcast variable, and
      each Arrow batch computes all K cosines with numpy and argmaxes
      locally — ZERO shuffle per assign and vectorized native math instead
      of K interpreted higher-order-function folds per row (guide §4.2).
      The r14-and-earlier form expanded corpus×K rows through a broadcast
      crossJoin and reduced them back with a max_by aggregate — correct,
      but it paid one corpus-sized exchange (carrying the full vector
      payload) per iteration AND evaluated the cosine folds interpreted;
      measured 5.38 → 1.70 s min-of-5 interleaved for the 40-cell
      2-iteration sf0.1 build, identical assignments.

    Bit-exactness contract (the pq_train_codes discipline): the numpy
    accumulation runs SEQUENTIALLY over dims (acc += x*y, one dim at a
    time, float64 elementwise) — the exact left-to-right IEEE order of the
    zip_with/aggregate fold and of the DuckDB oracle's replay; the cosine
    is acc_dot / (norm_v * norm_c) with both norms sqrt'd from the same
    sequential squared-sum; ties break to the LOWEST cell (cells sorted
    ascending; np.argmax returns the first maximum) — the max_by
    struct(cos, -cell) total order. Zero-norm vectors (the fixture has
    none) DIVERGE from the pre-r14 form: the old max_by path raised
    DIVIDE_BY_ZERO under the session's ANSI config, while the numpy path
    silently lands such rows on the first cell (NaN cosine, argmax 0) —
    callers needing the loud failure must pre-validate norms (r15 ADVICE
    correction; the r14 docstring wrongly claimed parity here).

    Caller contract: one row per ``corpus_id``. The pre-r14 groupBy
    aggregate collapsed duplicate ids to one output row; the mapInPandas
    form emits one row PER INPUT ROW, so duplicate ids would flow into
    downstream joins multiplied. Every in-repo caller feeds unique ids
    (fixture vec_id / doc_id keys).

    Cost per iteration: one model-sized collect + broadcast, one
    corpus-linear numpy assignment (no shuffle), one (cell, dim)-keyed
    aggregation whose input is corpus×dim rows with map-side partial
    means — the standard distributed Lloyd step at any scale.
    Construction is eager (one tiny collect per assign), like
    pq_train_codes.

    Returns (corpus_id, cell); with ``keep_vec=True`` returns
    (corpus_id, vec, cell) so callers that immediately join the
    assignment back onto the vectors (semdedup/IVF-ADC index builds)
    skip that corpus-sized join — the vector column rides the same Arrow
    batches either way."""
    import numpy as np

    sc = corpus.sparkSession.sparkContext
    out_schema = T.StructType(
        [
            T.StructField(corpus_id, corpus.schema[corpus_id].dataType),
            T.StructField(vec, corpus.schema[vec].dataType),
            T.StructField("cell", T.LongType()),
        ]
    )
    assigned = corpus.select(
        F.col(corpus_id), F.col(vec), (F.col(corpus_id) % n_cells).alias("cell")
    )
    # Measured non-change (r14 optimization round): an id-keyed
    # repartition at init — to spread the single-split fixture scan's
    # per-row assignment folds across cores — was a wash in an
    # interleaved A/B (min-of-4 7.18 s vs 7.05 s for the 40-cell
    # 2-iteration build at sf0.1; tiny-task overhead eats the
    # parallelism gain), and at real scale the input arrives already
    # split, making the extra exchange pure cost. Left out; oracle
    # parity with it was green 12/12, so the option stays open.
    prev_bc = None
    for _ in range(n_iters):
        # Break the lineage at each Lloyd round (r14 optimization round;
        # the r5 iterative-loop rule, finally applied here): the round
        # body references `assigned` TWICE (centroid aggregate + the
        # reassignment input), so the unrolled lazy plan re-computed
        # every earlier round — and the base projection — 2x per level
        # (measured GEOMETRIC cost growth at sf0.1: n_iters 0/1/2 =
        # 0.8/8.8/25.8 s for the semdedup 40-cell build). One eager
        # localCheckpoint per round makes the cost additive
        # (0/1/2 = 0.7/5.6/15.5 -> additive post-change) and at any scale
        # turns O(2^iters) corpus passes into O(iters). localCheckpoint
        # preserves partition layout AND intra-partition row order, so
        # the double mean aggregates see the same operand grouping as
        # the unrolled plan — outputs are bit-identical (re-verified
        # against the DuckDB replay at all three SFs).
        assigned = assigned.localCheckpoint(eager=True)
        # The eager checkpoint just materialized the previous round's
        # mapInPandas, so that round's broadcast has no consumer left —
        # release it (r15 ADVICE: one leaked broadcast per iteration per
        # build otherwise accumulates on driver and executors in a
        # long-lived session). The FINAL round's broadcast must outlive
        # the returned lazy frame and is left alive.
        if prev_bc is not None:
            prev_bc.unpersist(blocking=False)
            prev_bc = None
        cents = (
            assigned.select(F.col("cell"), F.posexplode(vec).alias("dim", "c"))
            .groupBy("cell", "dim")
            .agg(F.avg(F.col("c").cast("double")).alias("mean_c"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("mean_c")))
                ).alias("_pairs")
            )
            .select(
                F.col("cell").alias("_ccell"),
                F.transform(F.col("_pairs"), lambda p: p.getField("mean_c")).alias(
                    "centroid"
                ),
            )
        )
        # Nearest centroid via the broadcast-model numpy argmax (docstring
        # contract above): collect the model-sized centroid table, ship it
        # as a broadcast variable, score each Arrow batch against all K
        # centroids with dim-sequential float64 accumulation, first-argmax
        # tiebreak. No shuffle, no corpus×K row expansion.
        rows = sorted((r["_ccell"], list(r["centroid"])) for r in cents.collect())
        if not rows:
            # Empty corpus: no centroids to score against — mat would be
            # 0-d and every mapInPandas task would IndexError (r15 ADVICE
            # fix). The checkpointed init assignment of an empty corpus
            # is already the correct (empty) result.
            break
        cells_np = np.array([c for c, _ in rows], dtype=np.int64)
        mat = np.array([m for _, m in rows], dtype=np.float64)
        bc = sc.broadcast((cells_np, mat))
        prev_bc = bc

        def gen(batches):
            import numpy as np

            cells_l, mat_l = bc.value
            d = mat_l.shape[1]
            # centroid norms: same sequential squared-sum as l2_norm's fold
            accm = np.zeros(mat_l.shape[0])
            for i in range(d):
                accm = accm + mat_l[:, i] * mat_l[:, i]
            nm = np.sqrt(accm)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                v = np.array(list(pdf[vec]), dtype=np.float64)
                accd = np.zeros((v.shape[0], mat_l.shape[0]))
                accv = np.zeros(v.shape[0])
                for i in range(d):
                    accd = accd + v[:, i : i + 1] * mat_l[None, :, i]
                    accv = accv + v[:, i] * v[:, i]
                cos = accd / (np.sqrt(accv)[:, None] * nm[None, :])
                pdf = pdf.copy()
                pdf["cell"] = cells_l[np.argmax(cos, axis=1)]
                yield pdf

        assigned = assigned.drop("cell").mapInPandas(gen, out_schema)
    if keep_vec:
        return assigned.select(corpus_id, vec, "cell")
    return assigned.select(corpus_id, "cell")


def ivf_topk_kmeans(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    n_cells: int = 10,
    n_iters: int = 2,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """IVF top-k over LEARNED k-means cells: same probe shape as
    :func:`ivf_topk`, but the cells come from :func:`kmeans_assign` instead
    of the fixture label — directional clusters instead of an arbitrary
    proxy, which is what lifts recall@k at a fixed nprobe. At 100 TB the
    assignment is a one-off index build written out as the partition
    column."""
    # keep_vec: the assignment frame already carries the vector through the
    # Arrow batches, so the former corpus ⋈ cells join-back (one corpus-
    # sized exchange) is pure cost (r14 optimization round).
    indexed = kmeans_assign(
        corpus,
        n_cells=n_cells,
        n_iters=n_iters,
        corpus_id=corpus_id,
        vec=vec,
        keep_vec=True,
    )
    return ivf_topk(
        queries,
        indexed,
        k=k,
        nprobe=nprobe,
        query_id=query_id,
        corpus_id=corpus_id,
        vec=vec,
        label="cell",
    )


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.9,
    block: str = "label",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within coarse blocks (O-29
    embedding tier): the self-join is bounded per block, mirroring the
    LSH/IVF bucketing strategy at scale.

    r15: the per-pair interpreted dot fold (plus the per-row interpreted
    norm folds it hoisted) is the Arrow pandas-UDF cosine
    (:func:`_seq_cosine`, guide §4.2) — per-pair norms re-derived in
    numpy are the same doubles (``sqrt(sum(x²))`` is the same double
    whether computed per row or per pair), and the final
    ``dot / (norm_a * norm_b)`` stays the oracle's exact association.
    The UDF is marked non-deterministic so the threshold filter is not
    pushed below it and evaluated twice (§4.4)."""
    a = corpus.select(
        F.col(block),
        F.col(corpus_id).alias("vec_a"),
        F.col(vec).alias("emb_a"),
    )
    b = corpus.select(
        F.col(block),
        F.col(corpus_id).alias("vec_b"),
        F.col(vec).alias("emb_b"),
    )
    return (
        a.join(b, block)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            r4(
                _seq_cosine(
                    F.col("emb_a"), F.col("emb_b"), nondeterministic=True
                )
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def hyperplane_signs(planes: int, dims: int) -> list[list[int]]:
    """Deterministic ±1 hyperplane components for embedding SimHash:
    sign(p, i) from the low bit of md5(f"{p}:{i}") — reproducible in any
    engine/language, no RNG state anywhere. Returned as plain Python
    lists so both the Spark plan and the DuckDB oracle embed the SAME
    literal arrays (identical by construction beats re-deriving md5 in
    two SQL dialects)."""
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"{p}:{i}".encode()).digest()[-1] & 1
            else -1
            for i in range(dims)
        ]
        for p in range(planes)
    ]


def simhash_embedding_buckets(
    corpus: DataFrame,
    tables: int = 4,
    planes: int = 8,
    dims: int = 64,
    scale: int = 10**6,
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Random-hyperplane SimHash over an embedding column — the LSH
    bucketing tier for embedding near-dup at 100 TB (r7 registration
    queue), in the standard AND-OR construction: ``tables`` independent
    signatures of ``planes`` bits each (plane t·planes+p belongs to
    table t). Two vectors at angle θ share one table's bucket with
    probability (1 − θ/π)^planes and become candidates if ANY table
    collides — 1 − (1 − (1−θ/π)^planes)^tables ≈ 0.75 at cosine 0.9
    with the 4×8 default, against ~2^-8 per table for unrelated
    vectors. Output one (id, table, bucket) row per table: the
    candidate join keys on (table, bucket).

    Exactness (what makes bucket ids hash-checkable cross-engine): each
    float component is scaled ONCE to an integer (floor(e·scale + 0.5),
    the engine-wide portable scaling; floor BEFORE the long cast keeps
    negative components exact), and a plane's bit is sign(Σ ±e_scaled)
    over INTEGER addition — no float summation order anywhere, so
    every bucket id is bit-stable in any engine and partitioning. Ties
    (Σ = 0) take bit 0 by definition.

    Scale: one projection per row (tables × planes × dims integer
    mul-adds riding whole-stage codegen), output rows = tables × corpus
    with 24 B payloads — the shuffle the candidate join pays carries
    ids, never embeddings."""
    signs = hyperplane_signs(tables * planes, dims)
    # scaled_long IS the engine-wide portable scaling contract — reusing
    # it (not an inline floor copy) keeps the SimHash tier in lockstep
    # with every other scaled-integer operator and its Python replay.
    scaled = F.transform(
        F.col(vec), lambda x: scaled_long(x.cast("double"), scale)
    )
    # Input guard (refuse loudly, IN-PLAN): a dims mismatch null-pads
    # every zip_with — and a NULL component (or a null vector) nulls the
    # plane sums directly — so EVERY affected vector lands in bucket 0
    # of every table and the candidate join degenerates toward the
    # O(n²) cross product this tier exists to prevent, with no error.
    # The raise_error branch costs one per-row size+null check and
    # fails at the first violating row; a driver-side probe would add a
    # full corpus scan job per call. coalesce in the message: size(NULL)
    # is null and concat would otherwise null the whole diagnostic.
    well_formed = (F.size(F.col(vec)) == dims) & ~F.exists(
        F.col(vec), lambda x: x.isNull()
    )
    guarded = F.when(well_formed, scaled).otherwise(
        F.raise_error(
            F.concat(
                F.lit("simhash_embedding_buckets: embedding length "),
                F.coalesce(F.size(F.col(vec)).cast("string"), F.lit("NULL")),
                F.lit(
                    f" != dims={dims} or the vector contains null "
                    "components; either silently collapses the signature "
                    "to bucket 0 (null-padded/propagated sums), so it is "
                    "refused instead."
                ),
            )
        )
    )
    projected = corpus.select(F.col(corpus_id), guarded.alias("_sc"))
    buckets = []
    for t in range(tables):
        bucket = None
        for p in range(planes):
            sgn = signs[t * planes + p]
            sgn_arr = F.array(*[F.lit(v) for v in sgn])
            proj = F.aggregate(
                F.zip_with(F.col("_sc"), sgn_arr, lambda e, sv: e * sv),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            bit = F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        buckets.append(
            F.struct(F.lit(t).alias("table"), bucket.cast("long").alias("bucket"))
        )
    return projected.select(
        F.col(corpus_id), F.explode(F.array(*buckets)).alias("_tb")
    ).select(
        corpus_id,
        F.col("_tb.table").alias("table"),
        F.col("_tb.bucket").alias("bucket"),
    )


def _pair_cosine_verify(
    pairs: DataFrame,
    corpus: DataFrame,
    threshold: float,
    corpus_id: str,
    vec: str,
) -> DataFrame:
    """Exact-cosine verification of an (vec_a, vec_b) candidate pair set
    — the verify expression of the CANDIDATE-PAIR tiers (hoisted norms,
    dot/(na·nb), r4, >= threshold), used wherever pairs arrive id-only
    (the LSH tiers). :func:`embedding_near_dups` deliberately does NOT
    delegate here: its block self-join carries the embeddings through
    ONE join, so routing it through an id-pair + two re-joins would
    triple its join count for no semantic gain — instead it inlines the
    textually identical expression, and the tier-agreement test
    (test_simhash_embedding.py: same cos_sim on every shared pair) is
    the drift guard.

    Measured non-change (r15): the Arrow pandas-UDF cosine here was an
    interleaved A/B regression (simhash_bucket_pairs warm min-of-5
    0.888 → 1.028 s) — LSH delivers only ~1k verified-candidate pairs at
    sf0.1, far too few to amortize the Python-runner constant. The JVM
    fold stays; embedding_near_dups (~200k block pairs) is the tier
    where the Arrow form measurably wins."""
    a = corpus.select(
        F.col(corpus_id).alias("vec_a"),
        F.col(vec).alias("emb_a"),
        l2_norm(F.col(vec)).alias("_norm_a"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("vec_b"),
        F.col(vec).alias("emb_b"),
        l2_norm(F.col(vec)).alias("_norm_b"),
    )
    cos = dot(F.col("emb_a"), F.col("emb_b")) / (
        F.col("_norm_a") * F.col("_norm_b")
    )
    return (
        pairs.join(a, "vec_a")
        .join(c, "vec_b")
        .select("vec_a", "vec_b", r4(cos).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def simhash_embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.9,
    tables: int = 4,
    planes: int = 8,
    dims: int = 64,
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """SimHash-bucketed embedding near-dup pairs: candidates = same
    bucket in ANY table ((table, bucket)-keyed self-join, id-only
    through the shuffle — the LSH pair discipline), deduped, then
    exact-cosine verification at ``threshold`` — the same hoisted-norm
    verify expression as embedding_near_dups, so the tiers agree on
    every shared pair. The containment claim "every reported pair is a
    true ≥ threshold pair" is exact; recall follows the AND-OR
    collision curve (tables/planes are the levers)."""
    # The explicit repartition on the join keys makes BOTH self-join
    # sides hang off ONE identical Exchange, so ReuseExchange computes
    # the signature projection (tables·planes·dims integer mul-adds per
    # row) ONCE — without it Spark broadcasts one side and re-runs the
    # whole staging for it (observed in the r7 plan audit). AQE still
    # owns the join strategy downstream of the materialized shuffle.
    b = simhash_embedding_buckets(
        corpus, tables, planes, dims, corpus_id=corpus_id, vec=vec
    ).repartition("table", "bucket")
    pairs = (
        b.alias("x")
        .join(b.alias("y"), ["table", "bucket"])
        .filter(F.col(f"x.{corpus_id}") < F.col(f"y.{corpus_id}"))
        .select(
            F.col(f"x.{corpus_id}").alias("vec_a"),
            F.col(f"y.{corpus_id}").alias("vec_b"),
        )
        .distinct()
    )
    return _pair_cosine_verify(pairs, corpus, threshold, corpus_id, vec)


def sq8_bounds(corpus: DataFrame, vec: str = "embedding") -> DataFrame:
    """Per-dimension [min, max] of the corpus, assembled into ONE row of
    two aligned arrays ``(mins, maxs)`` — the codebook of scalar (SQ8)
    quantization. posexplode → 64-row (dim, mn, mx) aggregate →
    array_sort reassembly (the centroids_by_label pattern)."""
    per_dim = (
        corpus.select(F.posexplode(vec).alias("dim", "c"))
        .groupBy("dim")
        .agg(
            F.min(F.col("c").cast("double")).alias("mn"),
            F.max(F.col("c").cast("double")).alias("mx"),
        )
    )
    return per_dim.agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "mn", "mx"))
        ).alias("_b")
    ).select(
        F.transform("_b", lambda s: s.getField("mn")).alias("mins"),
        F.transform("_b", lambda s: s.getField("mx")).alias("maxs"),
    )


def _sq8_quantize(vec: Column, mins: Column, maxs: Column) -> Column:
    """Element-wise int8 code: floor((x−mn)/(mx−mn)·254 + 0.5) − 127
    ∈ [−127, 127]; a degenerate dimension (mx == mn) codes to 0. The
    float part is three IEEE double ops in fixed order on exact
    f32-widened inputs — the embedding_gram determinism argument — then
    scaled_long's floor(v+0.5) boundary convention."""
    z = F.arrays_zip(vec.alias("_x"), mins.alias("_mn"), maxs.alias("_mx"))
    return F.transform(
        z,
        lambda s: F.when(
            s.getField("_mx") == s.getField("_mn"), F.lit(0).cast("long")
        ).otherwise(
            F.floor(
                (s.getField("_x").cast("double") - s.getField("_mn"))
                / (s.getField("_mx") - s.getField("_mn"))
                * F.lit(254.0)
                + F.lit(0.5)
            ).cast("long")
            - F.lit(127)
        ),
    )


def sq8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Top-k by INT8 scalar-quantized dot product — the
    memory-compression ANN tier (SQ8: 4× smaller vectors than f32, the
    entry-level trick of every vector store's storage hierarchy, cf.
    the scalar-quantization baseline in the FAISS/PQ literature
    [Jégou et al., TPAMI 2011]). Corpus and queries quantize against
    the CORPUS per-dim [min, max] codebook; scores are pure BIGINT
    dot products of the int8 codes (≤ 64·127² ≈ 10^6 — exact in any
    engine), rank = (score desc, id). The recall this trades is
    measured in pytest against the exact cosine tier (the
    ann_recall_eval discipline).

    Scale: the codebook is ONE broadcast row (2×d doubles); corpus
    codes compute in-scan (no shuffle); the broadcast query set scans
    the corpus once; TakeOrdered-style window top-k per query.
    At 100 TB the int8 codes are the STORED column — the f32 originals
    stay cold — which is the entire point of the tier."""
    b = F.broadcast(sq8_bounds(corpus, vec))
    q = F.broadcast(
        queries.crossJoin(b).select(
            F.col(query_id),
            _sq8_quantize(F.col(vec), F.col("mins"), F.col("maxs")).alias(
                "_qq"
            ),
        )
    )
    c = corpus.crossJoin(b).select(
        F.col(corpus_id),
        _sq8_quantize(F.col(vec), F.col("mins"), F.col("maxs")).alias("_cq"),
    )

    # Measured non-change (r15 optimization round): an Arrow pandas-UDF
    # int64 dot for this fold was an interleaved A/B regression (warm
    # min-of-5 0.608 -> 0.704 s; sq8_rerank_topk 0.627 -> 0.814) — the
    # fixture's |corpus|·|Q| pair count is too small to amortize the
    # Python-runner constant, and an eager broadcast-model form would
    # need the corpus-derived codebook collected at construction. Kept
    # the integer fold (exact in any order; ≤ 64·127² per summand).
    score = F.aggregate(
        F.zip_with(F.col("_qq"), F.col("_cq"), lambda a, b2: a * b2),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = c.join(q, c[corpus_id] != q[query_id]).select(
        query_id, corpus_id, score.alias("score_q")
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score_q").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            corpus_id,
            "score_q",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def sq8_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Two-stage retrieval: SQ8 int8 shortlist → EXACT cosine rerank —
    the coarse-to-fine pattern every production vector store runs (scan
    the cheap quantized codes for a ``shortlist``, pay full-precision
    distance only on shortlist·|queries| pairs). Output
    ``(query_id, vec_id, cos_sim, rank)`` with the cosine_topk ranking
    discipline (r4-rounded cosine desc, id tiebreak).

    Quality composition: stage-2 ordering among surviving candidates is
    EXACT, so rerank@k recall equals the shortlist's recall@k ceiling —
    the pinned claim is rerank-recall ≥ sq8-topk-recall at the same k
    (reranking can only fix quantized ordering mistakes, never add
    misses).

    Scale: stage 1 is :func:`sq8_topk`'s int8 scan (the stored-code
    tier); stage 2 joins the ≤ shortlist·|queries| id pairs back to the
    f32 vectors (the cold column, touched for 50 rows per query instead
    of the corpus) and windows per query."""
    short = sq8_topk(
        queries, corpus, k=shortlist, query_id=query_id,
        corpus_id=corpus_id, vec=vec,
    ).select(query_id, corpus_id)
    q = F.broadcast(
        queries.select(
            F.col(query_id),
            F.col(vec).alias("_qvec"),
            l2_norm(F.col(vec)).alias("_qnorm"),
        )
    )
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec).alias("_cvec"),
        l2_norm(F.col(vec)).alias("_cnorm"),
    )
    cos = dot(F.col("_qvec"), F.col("_cvec")) / (
        F.col("_qnorm") * F.col("_cnorm")
    )
    scored = (
        short.join(c, corpus_id)
        .join(q, query_id)
        .select(query_id, corpus_id, r4(cos).alias("cos_sim"))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id, corpus_id, "cos_sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def pq_train_codes(
    corpus: DataFrame,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    n_iters: int = 1,
    dims: int = 64,
    corpus_id: str = "vec_id",
    vec: str = "embedding",
    carry: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization training + encoding (Jégou/Douze/Schmid,
    TPAMI 2011): split each vector into ``n_subspaces`` contiguous
    sub-vectors, run deterministic Lloyd k-means per subspace
    (init cell = vec_id % n_centroids — the kmeans_assign rule: no
    RNG, reproducible anywhere; squared-L2 assignment with a
    (distance, cell) tiebreak), and encode every vector as its
    per-subspace nearest-centroid ids. Returns ``(codebooks, codes)``:
    codebooks = (s, cell, centroid array), codes = (corpus_id, s,
    code).

    ``carry`` names extra corpus columns to ride along unchanged onto
    the ``codes`` frame (corpus_id, *carry, s, code) — they travel the
    same projections/Arrow batches the ids already travel, so a caller
    that would otherwise join an attribute back onto the codes by
    corpus_id (one corpus-sized join per consumer; the r14 carry-item
    for ivfadc_build_index's coded table) gets it for the cost of the
    extra column's bytes. Purely additive: the training math never
    reads the carried columns. Carried names must not collide with the
    internal ``s``/``_sv``/``cell``/``code`` columns (refused loudly).

    Memory story: at 8×16 the code is 8 nibbles = 4 BYTES per vector
    against 256 bytes of f32 — the 64× compression tier below SQ8's
    4×; the codebook is n_subspaces·n_centroids·(dims/n_subspaces)
    doubles (4 KB here) and always broadcasts.

    Scale: subspace slicing is row-local; each Lloyd iteration is one
    (s, cell, dim)-keyed mean aggregate (map-side combine over
    corpus×dims rows) plus one corpus-linear, ZERO-shuffle assignment:
    the codebook (model-sized) collects to the driver and broadcasts to
    workers, and each Arrow batch argmins with numpy — the standard
    broadcast-model Lloyd step. Construction is therefore EAGER (one
    tiny collect per assign), like the other iterative operators."""
    reserved = {"s", "_sv", "cell", "code", corpus_id}
    bad = [c for c in carry if c in reserved]
    if bad:
        raise ValueError(
            f"pq_train_codes: carry column(s) {bad} collide with the "
            "operator's internal column names — rename before carrying"
        )
    sub_d = dims // n_subspaces
    subs = corpus.select(
        F.col(corpus_id),
        *[F.col(c) for c in carry],
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col(vec), s * sub_d + 1, sub_d)
                    for s in range(n_subspaces)
                ]
            )
        ).alias("s", "_sv"),
    ).select(
        corpus_id,
        *carry,
        "s",
        F.transform("_sv", lambda x: x.cast("double")).alias("_sv"),
    )
    def centroids_of(a: DataFrame) -> DataFrame:
        per_dim = (
            a.select("s", "cell", F.posexplode("_sv").alias("dim", "c"))
            .groupBy("s", "cell", "dim")
            .agg(F.avg("c").alias("mean_c"))
        )
        return (
            per_dim.groupBy("s", "cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "mean_c"))
                ).alias("_p")
            )
            .select(
                "s",
                "cell",
                F.transform("_p", lambda p: p.getField("mean_c")).alias(
                    "centroid"
                ),
            )
        )

    def assign(a: DataFrame, cents: DataFrame) -> DataFrame:
        # Assignment is the broadcast-model pattern, not a join: the
        # codebook is MODEL-sized (n_subspaces·n_centroids·sub_d
        # doubles — 128 KB at the registered 8×256×8), so it collects
        # to the driver and ships to workers as a broadcast variable;
        # each Arrow batch then computes all cell distances with numpy
        # and argmins locally. The r10 form expanded corpus×8×
        # n_centroids scored rows through a broadcast join + min_by
        # aggregate — a 256× row expansion plus a corpus×8 shuffle PER
        # ASSIGN that was ~90% of the registered query's 5.5 s warm
        # (VERDICT r10 item 2); this projection form has ZERO shuffle
        # per assign and is corpus-linear at any scale.
        #
        # Bit-exactness contract (the float-Lloyd determinism precedent
        # from ivf_kmeans_topk): d2 accumulates SEQUENTIALLY over dims
        # (acc += diff*diff, one dim at a time, float64 elementwise) —
        # the exact left-to-right IEEE order of the r10 unrolled JVM
        # expression and of the DuckDB oracle — and ties break to the
        # LOWEST cell (cells sorted ascending; np.argmin returns the
        # first minimum), the min_by struct(d2, cell) total order.
        import numpy as np

        by_s: dict[int, list[tuple[int, list[float]]]] = {}
        for row in cents.collect():
            by_s.setdefault(row["s"], []).append(
                (row["cell"], row["centroid"])
            )
        books = {
            s: (
                np.array([c for c, _ in sorted(v)], dtype=np.int32),
                np.array([m for _, m in sorted(v)], dtype=np.float64),
            )
            for s, v in by_s.items()
        }
        sc = a.sparkSession.sparkContext
        bc = sc.broadcast(books)
        made_bcs.append(bc)
        stripped = a.drop("cell")
        out_schema = T.StructType(
            list(stripped.schema.fields)
            + [T.StructField("cell", T.IntegerType())]
        )

        def gen(batches):
            import numpy as np

            local = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                cell_out = np.empty(len(pdf), dtype=np.int32)
                for s, idx in pdf.groupby("s").indices.items():
                    cells, mat = local[int(s)]
                    sv = np.array(list(pdf["_sv"].iloc[idx]), dtype=np.float64)
                    acc = np.zeros((sv.shape[0], mat.shape[0]))
                    for i in range(mat.shape[1]):
                        diff = sv[:, i : i + 1] - mat[None, :, i]
                        acc += diff * diff
                    cell_out[idx] = cells[np.argmin(acc, axis=1)]
                pdf = pdf.copy()
                pdf["cell"] = cell_out
                yield pdf

        return stripped.mapInPandas(gen, out_schema).select(
            corpus_id, *carry, "s", "_sv", "cell"
        )

    # the loop below re-reads subs once per assign (3x at n_iters=1),
    # re-deriving the explode+cast pipeline from the parquet scan each
    # time — stage it once (the iterative-loop staging rule; corpus × 8
    # rows of 8-double arrays, tiny at any corpus the codebook fits)
    subs = subs.localCheckpoint(eager=True)
    made_bcs: list = []
    assigned = subs.withColumn(
        "cell", (F.col(corpus_id) % n_centroids).cast("int")
    )
    cents = centroids_of(assigned)
    for _ in range(n_iters):
        assigned = assign(subs, cents)
        cents = centroids_of(assigned)
    # The returned codebook is MODEL-sized (n_subspaces·n_centroids rows)
    # but its lazy lineage hangs off the last training assign — without a
    # checkpoint every downstream execution of the codebook (the ADC LUT
    # join, the index write) re-runs a corpus-sized mapInPandas + explode
    # aggregate to re-derive a 4 KB table (r15; §5 don't-recompute). The
    # eager checkpoint materializes it ONCE, and the final encode below
    # then collects from the pinned rows (same deterministic values).
    cents = cents.localCheckpoint(eager=True)
    codes = assign(subs, cents).select(
        corpus_id, *carry, "s", F.col("cell").alias("code")
    )
    # Every assign frame hangs off the CHECKPOINTED subs plus its own
    # broadcast codebook, and each training round's frame was fully
    # consumed by the next round's cents.collect() — so once the final
    # assign's collect has run, only the LAST broadcast has a live
    # consumer (the returned lazy codes frame). Release the others (r15
    # ADVICE: the per-assign broadcasts otherwise accumulate across
    # builds in a long-lived session).
    for old_bc in made_bcs[:-1]:
        old_bc.unpersist(blocking=False)
    return cents, codes


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_subspaces: int = 8,
    n_centroids: int = 16,
    dims: int = 64,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance top-k (the ADC of Jégou et al.): the
    query stays FULL PRECISION; each corpus vector is its 4-byte PQ
    code; score(q, v) = Σ_s dot(q_s, codebook[s][code_s(v)]) via a
    per-query LOOKUP TABLE of |queries|·n_subspaces·n_centroids
    precomputed partial dots — scoring a vector is 8 table lookups +
    adds, never a d-dim dot. Output (query_id, vec_id, score_q, rank),
    r4-rounded score, (score desc, id) rank; recall vs the exact tier
    is measured in pytest (the ann_tier_claims discipline).

    Scale: the LUT is tiny and broadcasts; the scoring join keys codes
    (4 B payloads) against it — the corpus's f32 column is never read
    at query time. This completes the engine's quantization ladder:
    IVF (prune WHERE you scan) → SQ8 (shrink every stored dim) → PQ
    (shrink to sub-vector codes + LUT scoring)."""
    cents, codes = pq_train_codes(
        corpus,
        n_subspaces=n_subspaces,
        n_centroids=n_centroids,
        dims=dims,
        corpus_id=corpus_id,
        vec=vec,
    )
    sub_d = dims // n_subspaces
    qsubs = queries.select(
        F.col(query_id),
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col(vec), s * sub_d + 1, sub_d)
                    for s in range(n_subspaces)
                ]
            )
        ).alias("s", "_qv"),
    ).select(
        query_id,
        "s",
        F.transform("_qv", lambda x: x.cast("double")).alias("_qv"),
    )
    lut = F.broadcast(
        qsubs.join(cents, "s").select(
            query_id,
            "s",
            F.col("cell").alias("code"),
            F.aggregate(
                F.zip_with(
                    F.col("_qv"), F.col("centroid"), lambda a, b: a * b
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("_pdot"),
        )
    )
    scored = (
        codes.join(lut, ["s", "code"])
        .filter(F.col(corpus_id) != F.col(query_id))
        .groupBy(query_id, corpus_id)
        .agg(r4(F.sum("_pdot")).alias("score_q"))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score_q").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            corpus_id,
            "score_q",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivfadc_build_index(
    corpus: DataFrame,
    n_cells: int = 8,
    n_subspaces: int = 8,
    n_centroids: int = 256,
    n_iters: int = 2,
    dims: int = 64,
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The one-off IVF-ADC index build (the stage :func:`ivfadc_topk`'s
    docstring always described as "written out as a table in
    production" — now an actual API, VERDICT r12 item 4): coarse
    k-means cells, residuals against the coarse centroids, PQ codebooks
    trained ON the residuals, and the per-vector codes.

    Returns ``(coarse, pq_cents, coded)``:

    * ``coarse`` — (cell, _coarse array<double>): the coarse centroids;
      model-sized, broadcasts at query time.
    * ``pq_cents`` — (s, cell, centroid array<double>): the residual
      codebooks; model-sized (128 KB at 8×256×8), broadcasts into the
      query LUT.
    * ``coded`` — (corpus_id, s, code, cell): the corpus's entire
      query-time footprint — n_subspaces rows of (code, cell) per
      vector, never the f32 column.

    Persist with :func:`ivfadc_write_index` / reload with
    :func:`ivfadc_read_index`; query with :func:`ivfadc_query_index`
    (``ivfadc_query_index(q, ivfadc_build_index(c)) ≡ ivfadc_topk(q,
    c)`` — pinned bit-exact in tests, including through a parquet
    round-trip)."""
    # keep_vec: the assignment frame carries the vector already, so the
    # former corpus ⋈ assigned join-back (one corpus-sized exchange) is
    # pure cost (r14 optimization round). The index build stays
    # multi-consumer (residual PQ, membership, centroid recompute) with
    # collects downstream — stage it once (the multi-consumer staging
    # rule).
    indexed = kmeans_assign(
        corpus,
        n_cells=n_cells,
        n_iters=n_iters,
        corpus_id=corpus_id,
        vec=vec,
        keep_vec=True,
    ).localCheckpoint(eager=True)
    coarse = (
        indexed.select("cell", F.posexplode(vec).alias("dim", "c"))
        .groupBy("cell", "dim")
        .agg(F.avg(F.col("c").cast("double")).alias("mean_c"))
        .groupBy("cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean_c"))
            ).alias("_p")
        )
        .select(
            "cell",
            F.transform("_p", lambda p: p.getField("mean_c")).alias(
                "_coarse"
            ),
        )
    )
    resid = indexed.join(F.broadcast(coarse), "cell").select(
        corpus_id,
        F.col("cell").alias("_ivf_cell"),
        F.zip_with(
            F.col(vec), F.col("_coarse"), lambda a, b: a.cast("double") - b
        ).alias("_rv"),
    )
    # carry the coarse cell (renamed: "cell" is PQ-internal) through the
    # PQ training projections onto the codes frame, so the coded table
    # needs NO join-back at all — neither onto the checkpointed
    # assignment frame (the r14 form: one broadcast join re-paid per
    # consumer) nor onto resid (r15, the VERDICT r14 carry item). Column
    # order and name pinned to the r14 output (corpus_id, s, code, cell)
    # so the written index is schema-identical.
    pq_cents, codes = pq_train_codes(
        resid,
        n_subspaces=n_subspaces,
        n_centroids=n_centroids,
        dims=dims,
        corpus_id=corpus_id,
        vec="_rv",
        carry=("_ivf_cell",),
    )
    coded = codes.select(
        corpus_id, "s", "code", F.col("_ivf_cell").alias("cell")
    )
    return coarse, pq_cents, coded


def ivfadc_write_index(
    index: tuple[DataFrame, DataFrame, DataFrame], path: str
) -> None:
    """Persist an :func:`ivfadc_build_index` result as three parquet
    tables under ``path`` — the production index shape. ``coded`` is
    written ``partitionBy("cell")``: at query time only the probed
    cells' files exist to be read, so nprobe/n_cells of the index is
    scanned per query batch via ordinary partition pruning — the
    on-disk twin of the in-plan cell-probe join (at 100 TB this is the
    difference between scanning the full code table and 4/8 of it)."""
    coarse, pq_cents, coded = index
    coarse.write.mode("overwrite").parquet(f"{path}/coarse")
    pq_cents.write.mode("overwrite").parquet(f"{path}/pq_cents")
    coded.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/codes"
    )


def ivfadc_read_index(
    spark, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Reload a persisted IVF-ADC index. The partition column ``cell``
    comes back through partition-type inference as INT — cast to the
    build-side LONG so the reloaded index is schema-identical to the
    freshly-built one (the round-trip equality pin depends on it)."""
    coarse = spark.read.parquet(f"{path}/coarse")
    pq_cents = spark.read.parquet(f"{path}/pq_cents")
    coded = spark.read.parquet(f"{path}/codes").withColumn(
        "cell", F.col("cell").cast("long")
    )
    return coarse, pq_cents, coded


def ivfadc_query_index(
    queries: DataFrame,
    index: tuple[DataFrame, DataFrame, DataFrame],
    k: int = 10,
    nprobe: int = 4,
    n_subspaces: int = 8,
    dims: int = 64,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Query-time half of IVF-ADC against a built (or reloaded) index:
    rank cells by cosine(q, coarse centroid) with the smaller-cell
    tiebreak, probe ``nprobe`` of them, score candidates via the
    asymmetric LUT (q·c_cell + Σ_s LUT[s][code_s]), emit r4-rounded
    (score desc, id)-ranked top-k. All query-time state broadcasts
    (coarse centroids + the |Q|·n_subspaces·n_centroids LUT); the scan
    side moves (cell, code) rows only."""
    coarse, pq_cents, coded = index
    sub_d = dims // n_subspaces
    qsubs = queries.select(
        F.col(query_id),
        F.posexplode(
            F.array(
                *[
                    F.slice(F.col(vec), s * sub_d + 1, sub_d)
                    for s in range(n_subspaces)
                ]
            )
        ).alias("s", "_qv"),
    ).select(
        query_id,
        "s",
        F.transform("_qv", lambda x: x.cast("double")).alias("_qv"),
    )
    lut = F.broadcast(
        qsubs.join(pq_cents, "s").select(
            query_id,
            "s",
            F.col("cell").alias("code"),
            F.aggregate(
                F.zip_with(
                    F.col("_qv"), F.col("centroid"), lambda a, b: a * b
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("_pdot"),
        )
    )
    w_probe = Window.partitionBy(query_id).orderBy(
        F.col("_pcos").desc(), F.col("cell").asc()
    )
    probed = F.broadcast(
        queries.crossJoin(F.broadcast(coarse))
        .select(
            query_id,
            "cell",
            cosine(F.col(vec), F.col("_coarse")).alias("_pcos"),
            dot(F.col(vec), F.col("_coarse")).alias("_qc"),
        )
        .withColumn("_cr", F.row_number().over(w_probe))
        .filter(F.col("_cr") <= nprobe)
        .select(query_id, "cell", "_qc")
    )
    scored = (
        coded.join(probed, "cell")
        .join(lut, [query_id, "s", "code"])
        .filter(F.col(corpus_id) != F.col(query_id))
        .groupBy(query_id, corpus_id)
        .agg(r4(F.first("_qc") + F.sum("_pdot")).alias("score_q"))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("score_q").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id,
            corpus_id,
            "score_q",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def ivfadc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 4,
    n_subspaces: int = 8,
    n_centroids: int = 256,
    n_iters: int = 2,
    dims: int = 64,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """IVF-ADC — the FAISS IVFADC composition (Jégou/Douze/Schmid TPAMI
    2011 §IV.C) and the top of the quantization ladder: the coarse
    k-means quantizer prunes WHERE to scan (:func:`kmeans_assign` cells,
    nprobe probed per query), product quantization on the RESIDUALS
    (x − coarse centroid) shrinks what is scanned to sub-vector codes,
    and the asymmetric-distance LUT scores it. Residual PQ is the whole
    point of the composition: residuals have far less variance than raw
    vectors, so the same code budget quantizes them with less error —
    the reason FAISS defaults to encode-residuals for IVF+PQ indexes.

    Inner-product metric throughout (the pq_adc_topk contract):
    score(q, x̃) = q·c_cell(x) + Σ_s q_s·codebook[s][code_s(x)] — the
    LUT is the RAW query against the residual codebooks (for IP the
    identity q·x̃ = q·c + q·r̃ makes the LUT cell-independent; L2 would
    need a per-probed-cell LUT). Probing ranks cells by cosine(q, c)
    with the smaller-cell tiebreak — the same probe rule as
    :func:`ivf_topk_kmeans`. Output (query_id, vec_id, score_q, rank),
    r4-rounded score, (score desc, id) rank; candidates restricted to
    probed cells, self excluded; recall vs the exact tier measured in
    pytest (the ann_tier_claims discipline).

    Composition of :func:`ivfadc_build_index` (the one-off stage — in
    production written out via :func:`ivfadc_write_index` and reloaded
    per query batch, bit-exactness through the parquet round-trip
    pinned in tests) and :func:`ivfadc_query_index` (all query-time
    state broadcast-sized; the scan moves (cell, 4-byte codes) — never
    the f32 column). Eager at construction (the pq_train_codes
    collects)."""
    index = ivfadc_build_index(
        corpus,
        n_cells=n_cells,
        n_subspaces=n_subspaces,
        n_centroids=n_centroids,
        n_iters=n_iters,
        dims=dims,
        corpus_id=corpus_id,
        vec=vec,
    )
    return ivfadc_query_index(
        queries,
        index,
        k=k,
        nprobe=nprobe,
        n_subspaces=n_subspaces,
        dims=dims,
        query_id=query_id,
        corpus_id=corpus_id,
        vec=vec,
    )


def truncated_rerank_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dims: int = 32,
    k: int = 10,
    shortlist: int = 50,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Prefix-dimension (Matryoshka-style) two-stage retrieval: shortlist
    by cosine over the FIRST ``dims`` components only, then exact
    full-dimension rerank — the adaptive-retrieval recipe of Kusupati et
    al., "Matryoshka Representation Learning" (NeurIPS 2022), where the
    cheap pass reads a prefix of the stored vector instead of a separate
    quantized copy (d'/d of the flops AND of the bytes scanned, with no
    codebook to train or ship — the zero-infrastructure tier of the
    quantization ladder next to IVF / SQ8 / PQ).

    Honest-measurement note (probed, see tests): the fixture embeddings
    are NOT MRL-trained — their variance is spread evenly across
    dimensions, so prefix truncation is the weakest coarse tier here
    (raw truncated recall@10 ~0.2-0.3 at dims=32 vs PQ's 0.24-0.56).
    MRL-trained embeddings front-load information and make the prefix
    tier competitive; on generic embeddings the two-stage form below is
    what rescues it (shortlist-50 rerank recall ~0.6-0.72). The pinned
    claims are the measured floors, not the paper's.

    Stage 1 slices both sides to ``dims`` and runs the
    :func:`cosine_topk` discipline (r4-rounded truncated cosine,
    ``corpus_id`` tiebreak); stage 2 joins the ≤ shortlist·|queries| id
    pairs back to the full vectors and reranks exactly — identical
    mechanics to :func:`sq8_rerank_topk`, so the same dominance claim
    (rerank can only fix stage-1 ordering mistakes) holds.
    """
    if not 1 <= shortlist:
        raise ValueError(f"truncated_rerank_topk: shortlist must be >= 1, got {shortlist}")
    tq = queries.select(
        F.col(query_id), F.slice(F.col(vec), 1, dims).alias(vec)
    )
    tc = corpus.select(
        F.col(corpus_id), F.slice(F.col(vec), 1, dims).alias(vec)
    )
    short = cosine_topk(
        tq, tc, k=shortlist, query_id=query_id, corpus_id=corpus_id, vec=vec
    ).select(query_id, corpus_id)
    q = F.broadcast(
        queries.select(
            F.col(query_id),
            F.col(vec).alias("_qvec"),
            l2_norm(F.col(vec)).alias("_qnorm"),
        )
    )
    c = corpus.select(
        F.col(corpus_id),
        F.col(vec).alias("_cvec"),
        l2_norm(F.col(vec)).alias("_cnorm"),
    )
    cos = dot(F.col("_qvec"), F.col("_cvec")) / (
        F.col("_qnorm") * F.col("_cnorm")
    )
    scored = (
        short.join(c, corpus_id)
        .join(q, query_id)
        .select(query_id, corpus_id, r4(cos).alias("cos_sim"))
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cos_sim").desc(), F.col(corpus_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id, corpus_id, "cos_sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )


# Binary-relevance DCG discounts 1000/log2(i+1), i = 1..10, rounded to
# milli — literal constants so the score is exact integer arithmetic in
# any engine (the Benford-constants discipline; no libm in the plan).
NDCG_DISC_MILLI = (1000, 631, 500, 431, 387, 356, 333, 315, 301, 289)


def ndcg_binary(
    candidate: DataFrame,
    truth: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    item_id: str = "vec_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Binary-relevance nDCG@k of a ``candidate`` ranking against a
    ``truth`` relevant set, per query (Järvelin & Kekäläinen, TOIS
    2002): ``(query_id, n_relevant, dcg_milli, idcg_milli,
    ndcg_milli)``.

    The rank-weighted companion of the ANN family's recall metrics
    (ann_recall_eval measures only set overlap — nDCG also scores
    WHERE the hits landed): ``rel_i = 1`` iff the candidate item at
    rank i is anywhere in the truth set, ``dcg = Σ rel_i·disc_i`` with
    the literal milli discounts above, ``idcg`` = the best possible
    prefix sum for ``min(|truth_q|, k)`` hits, and ``ndcg_milli =
    (1000·dcg) div idcg``. Integer end to end — no logs in the plan.

    Scale: one (query, item) semi-join marks hits, one query-keyed
    aggregate, one broadcast join of the ≤k-row prefix-sum lookup.
    Candidate ranks beyond k (or ≤ 0) are refused loudly — a caller
    passing an untruncated ranking would silently dilute nothing (rel
    beyond k scores 0) but signals a contract mismatch."""
    if not 1 <= k <= len(NDCG_DISC_MILLI):
        raise ValueError(
            f"ndcg_binary: k must be in [1, {len(NDCG_DISC_MILLI)}] "
            f"(literal discount table), got {k}"
        )
    disc = list(NDCG_DISC_MILLI[:k])
    prefix = []
    run = 0
    for d in disc:
        run += d
        prefix.append(run)
    spark = candidate.sparkSession
    disc_df = spark.createDataFrame(
        [(i + 1, disc[i]) for i in range(k)], "rank long, _disc long"
    )
    prefix_df = spark.createDataFrame(
        [(i + 1, prefix[i]) for i in range(k)], "_nrel long, _idcg long"
    )
    guarded = candidate.select(
        F.col(query_id),
        F.col(item_id),
        F.when(
            (F.col(rank_col) >= 1) & (F.col(rank_col) <= k),
            F.col(rank_col),
        )
        .otherwise(
            F.expr(
                f"raise_error(concat('ndcg_binary: candidate rank ', "
                f"CAST({rank_col} AS STRING), ' outside [1, {k}] - pass "
                f"the truncated ranking'))"
            )
        )
        .cast("long")
        .alias("rank"),
    )
    hits = guarded.join(
        truth.select(
            F.col(query_id).alias("_tq"), F.col(item_id).alias("_ti")
        ),
        (F.col(query_id) == F.col("_tq")) & (F.col(item_id) == F.col("_ti")),
        "left",
    ).select(
        query_id,
        "rank",
        F.when(F.col("_ti").isNotNull(), F.lit(1)).otherwise(F.lit(0)).alias("_rel"),
    )
    scored = (
        hits.join(F.broadcast(disc_df), "rank")
        .groupBy(query_id)
        .agg(
            F.sum("_rel").cast("long").alias("n_relevant_hit"),
            F.sum(F.col("_rel") * F.col("_disc")).cast("long").alias("dcg_milli"),
        )
    )
    truth_sizes = truth.groupBy(query_id).agg(
        F.least(F.count(F.lit(1)), F.lit(k)).cast("long").alias("_nrel")
    )
    return (
        scored.join(truth_sizes, query_id)
        .join(F.broadcast(prefix_df), "_nrel")
        .select(
            query_id,
            F.col("_nrel").alias("n_relevant"),
            "dcg_milli",
            F.col("_idcg").alias("idcg_milli"),
            F.expr("(1000 * dcg_milli) DIV _idcg").cast("long").alias("ndcg_milli"),
        )
    )
