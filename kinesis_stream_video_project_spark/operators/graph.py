"""Graph analytics over DataFrame edge lists — triangle counting, a
deterministic integer PageRank, deterministic label-propagation
communities, and k-core decomposition.

The reference's pipeline implies a relationship graph (streams sharing a
gateway, devices sharing an operator — `check_wf.sh:3` enumerates the
stream population as one flat list); the analytics a fleet operator runs
over such a population are graph-shaped: "how clustered is the
co-occurrence structure" (triangles / clustering coefficient) and "which
node is most central" (PageRank). Both are also core curation tools for
training-data pipelines: co-occurrence graphs over entities rank canonical
documents and detect template clusters.

Design rules shared by the operators:

* **Edge lists are DataFrames, never adjacency matrices** — every step is
  a join or aggregate keyed on a node id, so the shuffles partition by
  node and scale with |E|, not |V|².
* **Degree-ordered orientation** (triangles): orienting each undirected
  edge from its (degree, id)-smaller endpoint to the larger bounds every
  node's out-degree by O(√|E|), so the edge-iterator intersection does
  O(|E|^1.5) work instead of Σ deg² — the standard arboricity bound. Any
  consistent total order makes each triangle count exactly once (the
  oriented graph is a DAG with a unique apex per triangle); (degree, id)
  specifically is what caps the per-node successor list. Counts are
  pinned against a brute-force three-join enumeration in tests.
* **Integer arithmetic end to end** (PageRank): ranks are scaled BIGINT
  (base 10^12), per-edge contributions use integer division
  ``(85 * r) div (100 * d)`` — truncating division of non-negative
  integers is identical in Spark (`div`) and DuckDB (`//`), and integer
  sums are order-independent, so the result is bit-stable across engines
  and partitionings with no float tolerance anywhere. Overflow bound:
  total rank mass is |V|·base and every intermediate is ≤
  85·mass·max(w), so BIGINT (9.2e18) holds to |V| ≈ 10^5 at base 10^12 —
  ENFORCED: pagerank_int counts nodes on the materialized adjacency and
  refuses (naming the largest safe base) past the bound rather than
  silently wrapping; a 100 TB graph lowers the base explicitly (coarser
  rank resolution, same exactness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def copurchase_edges(lineitem: DataFrame) -> DataFrame:
    """Undirected co-purchase edge list: parts appearing in the same order,
    as ``(p1, p2, n_orders)`` with ``p1 < p2``.

    Shape: ONE exchange groups each order's distinct part set
    (`collect_set` also de-duplicates repeated lineitems of one part),
    then pairs are generated ROW-LOCALLY from the sorted set (indexed
    `transform` × suffix `slice` — fan-out bounded by C(order size, 2) ≤
    C(17,2) in TPC-H generation) and counted with one more exchange on
    the pair. This replaces the former distinct → self-join-on-orderkey →
    count chain (three exchanges, and the join materialized every pair
    through a shuffle): measured 7.2 s → 2.6 s cold at sf0.1, identical
    output. The per-element lambda only references the materialized
    aggregate output column, so no CollapseProject re-evaluation applies.
    Pair generation is exact at any set size (suffix length = size(ps));
    the quadratic per-row fan-out of a genuinely pathological mega-order
    is the caller's to cap with a size filter if the domain allows it."""
    return edges_from_sets(order_part_sets(lineitem))


def order_part_sets(lineitem: DataFrame) -> DataFrame:
    """Each order's sorted distinct part set ``(l_orderkey, ps)`` — ONE
    exchange; the shared upstream of the co-purchase graph queries (pair
    explode, per-part order counts, and the corpus total all derive from
    this same aggregate, so consumers share one ReusedExchange)."""
    return lineitem.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("ps")
    )


def edges_from_sets(sets: DataFrame) -> DataFrame:
    """Pair counts from :func:`order_part_sets` output — row-local pair
    generation + one exchange on the pair (see copurchase_edges doc)."""
    pairs = sets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ps"),
                    lambda x, i: F.transform(
                        # length = size(ps): exact suffix, no magic cap — a
                        # constant bound would silently drop pairs past it
                        # on a pathological mega-set (and INT_MAX overflows
                        # in codegen; see phrase_search_docs).
                        F.slice(F.col("ps"), i + 2, F.size(F.col("ps"))),
                        lambda y: F.struct(x.alias("p1"), y.alias("p2")),
                    ),
                )
            )
        ).alias("e")
    )
    return pairs.groupBy(
        F.col("e.p1").alias("p1"), F.col("e.p2").alias("p2")
    ).agg(F.count(F.lit(1)).alias("n_orders"))


def degrees(edges: DataFrame) -> DataFrame:
    """Node degrees of an undirected ``(p1, p2)`` edge list (endpoints
    unioned then counted — one exchange on the node id)."""
    return (
        edges.select(F.col("p1").alias("p"))
        .unionAll(edges.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("d"))
    )



def _both_directions(edges: DataFrame) -> DataFrame:
    """Directed (src, dst) materialization of an undirected (p1, p2) edge
    list — each edge in both directions (shared by the iterative
    operators; guarantees every node appears as a src)."""
    return edges.select(
        F.col("p1").alias("src"), F.col("p2").alias("dst")
    ).unionAll(edges.select(F.col("p2").alias("src"), F.col("p1").alias("dst")))


def _materialize(df: DataFrame, reliable: bool) -> DataFrame:
    """The iterative-loop materialization rule in ONE place (pagerank /
    LPA / kcore; components.py states the rationale): break lineage with
    localCheckpoint, or a reliable checkpoint for long production runs."""
    return df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=True)


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count of the undirected graph ``(p1, p2)`` with
    ``p1 < p2`` — one row ``(n_nodes, n_edges, n_triangles)``.

    Degree-ordered orientation: each edge points from its (d, id)-smaller
    endpoint to the larger, making the graph a DAG in which every triangle
    {x ≺ y ≺ z} has a unique apex x — the count is exact with no
    double-counting, verified against the brute-force three-join
    enumeration in tests/test_round5d.py. (The SQL oracle keeps the
    definitional wedge-join form, where the wedge pair must be ordered by
    the SAME (d, id) tuple as the orientation — raw-id ordering looks the
    closing edge up backwards and loses ≈half the triangles.)

    Scale: out-degree after orientation is ≤ O(√|E|), so the per-edge
    successor-set intersections do O(|E|^1.5) comparisons worst-case —
    but as the EDGE-ITERATOR form (`Σ_edge |N⁺(u) ∩ N⁺(v)|` via
    `array_intersect` over grouped adjacency arrays), not a materialized
    wedge join: the wedge formulation shuffles O(|E|^1.5) candidate rows
    (~36M at sf0.1, measured 18.8 s) while this one shuffles only the
    |V|-row adjacency lists twice and burns the comparisons JVM-side
    inside codegen (measured 5.3 s, identical counts). Each triangle
    {x ≺ y ≺ z} is counted exactly once — at its (x→y) edge, since
    z ∈ N⁺(x) ∩ N⁺(y) but x reaches neither successor set of the other
    two edges. Adjacency arrays are bounded by the orientation's √(2|E|)
    out-degree cap, so no list exceeds ~√|E| entries — per-row memory
    stays bounded at any corpus size. `degrees` (|V| rows) is broadcast
    into the orientation join."""
    e = edges.select("p1", "p2")
    deg = degrees(e)
    da, db = F.broadcast(deg.alias("da")), F.broadcast(deg.alias("db"))
    lhs_first = F.struct(F.col("da.d"), F.col("p1")) < F.struct(
        F.col("db.d"), F.col("p2")
    )
    o = (
        e.join(da, F.col("p1") == F.col("da.p"))
        .join(db, F.col("p2") == F.col("db.p"))
        .select(
            F.when(lhs_first, F.col("p1")).otherwise(F.col("p2")).alias("src"),
            F.when(lhs_first, F.col("p2")).otherwise(F.col("p1")).alias("dst"),
        )
    )
    adj = o.groupBy("src").agg(F.collect_list("dst").alias("nbrs"))
    au = adj.select(F.col("src").alias("u_"), F.col("nbrs").alias("nbrs_u"))
    av = adj.select(F.col("src").alias("v_"), F.col("nbrs").alias("nbrs_v"))
    per_edge = (
        o.join(au, o["src"] == au["u_"])
        .join(av, o["dst"] == av["v_"])
        .select(
            F.size(F.array_intersect("nbrs_u", "nbrs_v")).alias("n_closed")
        )
    )
    return (
        per_edge.agg(F.coalesce(F.sum("n_closed"), F.lit(0)).alias("n_triangles"))
        .crossJoin(F.broadcast(deg.agg(F.count(F.lit(1)).alias("n_nodes"))))
        .crossJoin(F.broadcast(e.agg(F.count(F.lit(1)).alias("n_edges"))))
        .select("n_nodes", "n_edges", "n_triangles")
    )


def pagerank_int(
    edges: DataFrame,
    iters: int = 3,
    base: int = 10**12,
    reliable_checkpoint: bool = False,
    weight_col: str | None = None,
    broadcast_ranks: bool = True,
) -> DataFrame:
    """Deterministic integer PageRank over the undirected ``(p1, p2)``
    edge list — returns ``(p, rank_scaled)`` after ``iters`` synchronous
    iterations, damping 0.85, ranks scaled by ``base``.

    Arithmetic contract (what makes this hash-checkable cross-engine):
    every rank is a BIGINT multiple of 1; an iteration computes

        r'(v) = (15 * base) div 100  +  Σ_{u→v} (85 * r(u)) div (100 * d(u))

    with truncating integer division — Spark's ``div`` and DuckDB's ``//``
    agree on non-negative operands, and the sum is an integer sum, so the
    fixed-iteration result is bit-identical regardless of engine, shuffle
    order, or partitioning (the oracle unrolls the same recurrence as
    chained CTEs). Undirected edges are materialized in both directions,
    so every node has in- and out-degree ≥ 1 — no dangling-mass term.

    Scale: each iteration is one broadcast-or-shuffle join of ranks
    against the static (src, dst, d) contribution list plus one aggregate
    keyed on dst — 2 exchanges/iteration, mirroring connected_components'
    loop discipline (`operators/components.py`): the static adjacency is
    materialized ONCE with ``localCheckpoint`` (or a reliable
    ``checkpoint`` for long production runs — same trade as components),
    otherwise every iteration's plan re-derives the whole edge pipeline
    and the exchange count grows ~quadratically with ``iters`` (66 vs 10
    exchanges for 3 iterations, pinned in tests/test_round5d.py). Nothing
    is collected to the driver. ``iters`` is fixed (not converged) so
    plans stay static and the oracle stays SQL-expressible.

    ``broadcast_ranks``: the rank vector is |V| rows of 16 B against the
    |E|-row adjacency — broadcasting it makes each iteration ONE exchange
    (the dst aggregate) instead of two. At 10^8+ nodes the vector exceeds
    broadcast limits: pass ``False`` and both sides shuffle on the node
    id (AQE picks the join strategy).

    Overflow guard: total rank mass is conserved at ≤ |V|·base (teleport
    replaces exactly what damping removes), so a single rank — and hence
    the per-edge product ``85 · r(u) · w`` — is bounded by
    ``85 · |V| · base · max(w)`` (a star center can absorb nearly all
    mass). If that bound exceeds BIGINT, truncating-integer ranks would
    silently wrap — the one failure mode this exact-arithmetic design
    exists to prevent — so the operator REFUSES (ValueError naming the
    largest safe ``base``) instead of returning wrong ranks; the caller
    lowers ``base`` explicitly (same code shape, coarser rank
    resolution), keeping the output scale a visible contract rather than
    an engine-chosen one. The guard costs one count over the
    already-materialized adjacency — noise next to ``iters`` joins."""
    if weight_col is None:
        both = _both_directions(edges)
        deg = both.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    else:
        # Weighted variant: an edge with integer weight w carries w
        # "slots" of the source's mass — contribution
        # (85·r·w) div (100·W_u) with W_u = Σ weights, the same
        # truncating-integer discipline (uniform weights reduce exactly
        # to the unweighted form; pinned in tests).
        w = edges.select(
            F.col("p1").alias("src"),
            F.col("p2").alias("dst"),
            F.col(weight_col).alias("w"),
        ).unionAll(
            edges.select(
                F.col("p2").alias("src"),
                F.col("p1").alias("dst"),
                F.col(weight_col).alias("w"),
            )
        )
        both = w
        deg = both.groupBy("src").agg(F.sum("w").alias("d"))
    adj = _materialize(both.join(deg, "src"), reliable_checkpoint)
    guard = adj.agg(
        F.countDistinct("src").alias("n_nodes"),
        (F.max("w") if weight_col is not None else F.lit(1)).alias("w_max"),
    ).first()
    # Empty graph: no rows to rank and F.max over zero rows is null —
    # skip the guard and fall through to the (empty) loop result.
    if guard["n_nodes"] and guard["w_max"] is not None:
        w_max = int(guard["w_max"])
        worst = 85 * guard["n_nodes"] * base * w_max
        if worst > 2**63 - 1:
            safe_base = (2**63 - 1) // (85 * guard["n_nodes"] * w_max)
            if safe_base < 1:
                raise ValueError(
                    f"pagerank_int: no BIGINT-safe base exists — 85 * |V| * "
                    f"max(w) = {85 * guard['n_nodes'] * w_max} already "
                    f"exceeds 2^63 (|V|={guard['n_nodes']}, max weight "
                    f"{w_max}); rescale the edge weights or partition the "
                    f"graph."
                )
            raise ValueError(
                f"pagerank_int: 85 * |V| * base * max(w) = {worst} exceeds "
                f"BIGINT — integer ranks would silently wrap. Lower base to "
                f"<= {safe_base} (|V|={guard['n_nodes']}, max weight "
                f"{w_max}); resolution degrades but exactness holds."
            )
    # cast("long"): a base ≤ 2^31 becomes an INT literal, and ANSI
    # constant-folding of 85 * rank_scaled then overflows int32 in the
    # first iteration's contribution expression.
    ranks = deg.select(
        F.col("src").alias("p"), F.lit(base).cast("long").alias("rank_scaled")
    )
    teleport = (15 * base) // 100
    for _ in range(iters):
        contrib_expr = (
            "(85 * rank_scaled) div (100 * d)"
            if weight_col is None
            else "(85 * rank_scaled * w) div (100 * d)"
        )
        rank_side = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            adj.join(rank_side, adj["src"] == ranks["p"])
            .select(F.col("dst"), F.expr(contrib_expr).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_mass"))
        )
        ranks = contrib.select(
            F.col("dst").alias("p"),
            (F.lit(teleport) + F.col("in_mass")).alias("rank_scaled"),
        )
    return ranks


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    reliable_checkpoint: bool = False,
    broadcast_labels: bool = True,
    weight_col: str | None = None,
) -> DataFrame:
    """Synchronous label propagation communities over the undirected
    ``(p1, p2)`` edge list — returns ``(p, community)`` after ``iters``
    rounds. Deterministic by construction (unlike textbook LPA's random
    tie-breaks): every node starts labeled with itself; each round, a node
    adopts the most frequent label among its NEIGHBORS, ties broken by the
    smaller label — a count + row_number argmax, the same tie-break
    discipline as the deterministic MODE aggregate. Every node has ≥ 1
    neighbor (it came from an edge), so the argmax is total.

    Scale: per round, one join of labels onto the static directed edge
    list + one (dst, label) count + one per-dst argmax window over the
    count table (window input is |dst × distinct neighbor labels|, not
    |E|). The static edge list is materialized once (localCheckpoint /
    checkpoint — the pagerank_int/components discipline); ``iters`` fixed
    so the plan is static and a SQL oracle can unroll it.
    ``broadcast_labels``: same trade as pagerank_int's broadcast_ranks —
    the |V|-row label vector broadcasts against the |E|-row edge list;
    pass ``False`` past broadcast limits (10^8+ nodes) to shuffle both
    sides on the node id instead.

    ``weight_col``: weight-aware adoption — a node adopts the label with
    the largest SUM of incident edge weights (integer sums, same
    deterministic smaller-label tie-break), so a community bound by many
    weak ties can lose to one bound by few strong ones. Uniform weights
    reduce exactly to the unweighted form (pinned in tests).

    Registration note: operator + pytest coverage in round 5; the
    registry entry is queued for the round-6 driver window (the round-5
    50-slot window is saturated — see plans/registry.py header)."""
    if weight_col is None:
        both = _both_directions(edges).withColumn("w", F.lit(1))
    else:
        both = edges.select(
            F.col("p1").alias("src"),
            F.col("p2").alias("dst"),
            F.col(weight_col).alias("w"),
        ).unionAll(
            edges.select(
                F.col("p2").alias("src"),
                F.col("p1").alias("dst"),
                F.col(weight_col).alias("w"),
            )
        )
    both = _materialize(both, reliable_checkpoint)
    labels = both.select(F.col("src").alias("p")).distinct().select(
        "p", F.col("p").alias("community")
    )
    for _ in range(iters):
        label_side = F.broadcast(labels) if broadcast_labels else labels
        counts = (
            both.join(label_side, both["src"] == labels["p"])
            .groupBy(F.col("dst"), F.col("community"))
            .agg(F.sum("w").alias("c"))
        )
        w = Window.partitionBy("dst").orderBy(
            F.col("c").desc(), F.col("community").asc()
        )
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("dst").alias("p"), "community")
        )
    return labels


def kcore(
    edges: DataFrame,
    k: int,
    max_iters: int = 50,
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """The k-core of the undirected ``(p1, p2)`` graph: the unique maximal
    induced subgraph in which every node has degree ≥ k — returned as the
    surviving node set ``(p,)``. The standard peeling algorithm: repeatedly
    delete nodes of induced degree < k until none remain; deletion can
    only lower other nodes' degrees, so the fixed point is unique and
    order-independent (no tie-breaking needed, unlike LPA/MODE).

    Loop discipline (components/pagerank rules): the edge list is
    materialized once on entry; each round is one semi-join of edges onto
    the alive set + one degree aggregate + one filter, with the alive set
    localCheckpoint'd per round (the plan would otherwise re-derive all
    prior rounds); convergence is a 1-row count probe. Rounds are bounded
    by the peeling depth — ≪ |V| on real graphs but Θ(|V|) on adversarial
    long paths, so exhausting ``max_iters`` RAISES rather than silently
    returning a non-fixed-point (wrong) node set.

    Registration note: operator + pytest in round 5; registry entry
    queued for the round-6 driver window."""
    e = _materialize(edges.select("p1", "p2"), reliable_checkpoint)
    alive = e.select(F.col("p1").alias("p")).unionAll(
        e.select(F.col("p2").alias("p"))
    ).distinct()
    prev = -1
    converged = False
    for _ in range(max_iters):
        sub = e.join(
            F.broadcast(alive.withColumnRenamed("p", "p1")), "p1", "left_semi"
        ).join(
            F.broadcast(alive.withColumnRenamed("p", "p2")), "p2", "left_semi"
        )
        deg = (
            sub.select(F.col("p1").alias("p"))
            .unionAll(sub.select(F.col("p2").alias("p")))
            .groupBy("p")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        nxt = _materialize(deg.filter(F.col("d") >= k).select("p"), reliable_checkpoint)
        n = nxt.count()
        alive = nxt
        if n == prev:
            # peeling is monotone (alive sets only shrink), so an equal
            # count means an equal set — the unique fixed point.
            converged = True
            break
        prev = n
    if not converged:
        raise RuntimeError(
            f"kcore(k={k}) did not converge within max_iters={max_iters} "
            "rounds — the partial alive set is NOT the k-core (long-path "
            "graphs peel ~2 nodes/round); raise max_iters"
        )
    return alive


def bfs_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 3,
    reliable_checkpoint: bool = False,
    broadcast_frontier: bool = True,
    source_col: str = "p",
) -> DataFrame:
    """Exact BFS hop distances from a source node set over the undirected
    ``(p1, p2)`` edge list — ``(p, hops)`` for every node within
    ``max_hops``, hops = length of the shortest path to the NEAREST
    source (0 for the sources themselves). The "blast radius" primitive:
    which parts sit within k co-purchase hops of the recalled part set,
    which devices within k shared-gateway hops of the failed one.

    Exactness: hop levels are small integers with no arithmetic at all —
    each round's frontier is (neighbors of the previous frontier) minus
    (already-visited), a join + anti-join on node ids, so the result is
    set-exact in any engine and the oracle unrolls the same rounds as
    chained CTEs. ``max_hops`` is fixed (not converged) so plans stay
    static and SQL-expressible; the loop short-circuits early when a
    frontier empties (count probe on the materialized frontier, the
    kcore convergence discipline).

    Scale: the adjacency is materialized ONCE (localCheckpoint /
    reliable checkpoint — pagerank_int's loop rule); each round is ONE
    shuffle-or-broadcast join of the frontier against it plus a distinct
    and an anti-join against the visited set. ``broadcast_frontier``
    follows the broadcast_ranks trade: frontiers are usually a tiny
    fraction of |V| (drop it for expander graphs where a frontier
    approaches |V|). Visited state grows monotonically like the
    components alive-set — localCheckpoint'd per round so the plan never
    re-derives prior rounds.

    Schema contract: ``edges`` is the family's ``(p1, p2)`` shape;
    ``sources`` is a one-column node set read from ``source_col``
    (default ``p`` — pass the name when feeding another query's output
    directly, e.g. ``source_col="part_id"``)."""
    both = _materialize(_both_directions(edges), reliable_checkpoint)
    visited = _materialize(
        sources.select(F.col(source_col).cast("long").alias("p"))
        .distinct()
        .select("p", F.lit(0).alias("hops")),
        reliable_checkpoint,
    )
    frontier = visited.select("p")
    for hop in range(1, max_hops + 1):
        f_side = F.broadcast(frontier) if broadcast_frontier else frontier
        nxt = (
            both.join(f_side, both["src"] == frontier["p"])
            .select(F.col("dst").alias("p"))
            .distinct()
            .join(visited.select("p"), "p", "left_anti")
        )
        nxt = _materialize(nxt, reliable_checkpoint)
        if nxt.isEmpty():
            break
        visited = _materialize(
            visited.unionAll(nxt.select("p", F.lit(hop).alias("hops"))),
            reliable_checkpoint,
        )
        frontier = nxt
    return visited


def ra_link_prediction(
    edges: DataFrame,
    scale: int = 10**9,
    max_wedge_degree: int | None = None,
) -> DataFrame:
    """Resource-Allocation link prediction over the undirected ``(p1,
    p2)`` edge list (r8 registration queue): for every NON-adjacent node
    pair sharing at least one neighbor, ``ra_scaled = Σ_{c ∈ N(a)∩N(b)}
    scale div deg(c)`` — Zhou/Lü/Zhang's RA index (Eur. Phys. J. B 71,
    2009), the strongest of the simple common-neighbor indices in their
    benchmark and, unlike Adamic-Adar's 1/log deg, EXACTLY computable in
    integers: per-neighbor contributions are ``scale div deg`` truncating
    divisions and the sum is order-independent — hash-identical in any
    engine, no libm log anywhere (the tfidf_topk rationale one level up).
    Output ``(p_a, p_b, ra_scaled)``, p_a < p_b.

    Scale shape: ONE wedge self-join — the directed adjacency grouped by
    center c joins its out-lists pairwise via (c→a)⋈(c→b), a < b, so
    shuffle keys are node ids and per-center work is deg(c)² (the
    triangle-count trade without the orientation trick, because RA needs
    BOTH endpoints' full neighborhoods, not a DAG). The optional
    ``max_wedge_degree`` drops centers with deg > the cap BEFORE the
    join: a 10^6-degree hub contributes deg² wedge rows each worth only
    scale/10^6 ≈ nothing — the classic hub-suppression lever (same
    economics as spans.verbatim_span_pairs' max_df guard); exact mode
    (None) keeps every center. The final anti-join removes
    already-adjacent pairs (prediction targets NEW links); the edge
    list needs no canonical orientation — the anti-join normalizes each
    edge via least/greatest, so a caller passing (b, a) rows still gets
    its adjacent pairs excluded."""
    both = _both_directions(edges)
    deg = both.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    centered = both.join(deg, "src").select(
        F.col("src").alias("c"), "dst", "deg"
    )
    if max_wedge_degree is not None:
        centered = centered.filter(F.col("deg") <= max_wedge_degree)
    a = centered.select("c", F.col("dst").alias("p_a"), "deg")
    b = centered.select("c", F.col("dst").alias("p_b"))
    wedges = (
        a.join(b, "c")
        .filter(F.col("p_a") < F.col("p_b"))
        .select(
            "p_a",
            "p_b",
            # integer DIV, not float /: double division + cast truncation
            # agrees with integer division only while scale/deg round-trips
            # a double exactly — DIV needs no such argument (pagerank rule)
            F.expr(f"CAST({scale} AS BIGINT) DIV deg").alias("_contrib"),
        )
    )
    scored = wedges.groupBy("p_a", "p_b").agg(
        F.sum("_contrib").cast("long").alias("ra_scaled")
    )
    existing = edges.select(
        F.least("p1", "p2").alias("p_a"), F.greatest("p1", "p2").alias("p_b")
    )
    return scored.join(existing, ["p_a", "p_b"], "left_anti")


def sssp_bounded(
    edges: DataFrame,
    sources: DataFrame,
    max_rounds: int = 3,
    weight_scale: int = 1000,
    reliable_checkpoint: bool = False,
    broadcast_dist: bool = True,
    source_col: str = "p",
) -> DataFrame:
    """Bounded-hop weighted shortest-path distances from a source node
    set (r8/r9 registration queue): ``(p, dist)`` for every node
    reachable within ``max_rounds`` edges, ``dist`` = minimum over all
    ≤max_rounds-edge paths of Σ edge costs, with cost =
    ``weight_scale div n_orders`` — stronger co-purchase ties are
    cheaper to traverse, so the metric is an affinity distance (the
    classic inverse-multiplicity weighting; an unweighted hop metric is
    :func:`bfs_hops`). Sources score 0.

    Exactness: Bellman-Ford rounds over INTEGER costs — each round
    relaxes dist(dst) ← min(dist(dst), min_src(dist(src) + w)), pure
    min/+ on BIGINTs, so the result is set-exact in any engine and the
    oracle unrolls the same rounds as chained CTEs (the bfs_hops rule;
    a converged variant would not be SQL-expressible). The k-bounded
    contract is stated, not hidden: dist is the cheapest path USING AT
    MOST max_rounds EDGES, which equals true SSSP whenever the graph's
    weighted diameter from the sources is within the bound.

    Scale: adjacency with precomputed integer costs materialized ONCE
    (pagerank_int's loop rule); each round is one join of the current
    ≤|V|-row distance frame against it plus a min-aggregate —
    ``broadcast_dist`` follows the broadcast_ranks trade (drop it when
    the reached set approaches |V| on a giant graph). Rounds
    localCheckpoint so the plan never re-derives prior rounds.

    Refuse-loudly guard (the pagerank_int/bigram rule): an edge with
    multiplicity > ``weight_scale`` would floor to cost 0 — free
    traversal, silently collapsing the metric toward BFS — so the cost
    projection raise_errors in-plan instead of saturating."""
    cost = F.expr(
        f"CASE WHEN n_orders > {weight_scale} THEN raise_error(concat("
        f"'sssp_bounded: edge multiplicity ', CAST(n_orders AS STRING), "
        f"' exceeds weight_scale {weight_scale} - integer cost floors "
        f"to 0 (free traversal); raise weight_scale')) "
        f"ELSE CAST({weight_scale} AS BIGINT) DIV n_orders END"
    )
    both = _materialize(
        edges.select(
            F.col("p1").alias("src"), F.col("p2").alias("dst"), cost.alias("w")
        ).unionAll(
            edges.select(
                F.col("p2").alias("src"),
                F.col("p1").alias("dst"),
                cost.alias("w"),
            )
        ),
        reliable_checkpoint,
    )
    dist = _materialize(
        sources.select(F.col(source_col).cast("long").alias("p"))
        .distinct()
        .select("p", F.lit(0).cast("long").alias("dist")),
        reliable_checkpoint,
    )
    for _ in range(max_rounds):
        d_side = F.broadcast(dist) if broadcast_dist else dist
        relaxed = (
            both.join(d_side, both["src"] == dist["p"])
            .select(
                F.col("dst").alias("p"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
            .unionAll(dist)
            .groupBy("p")
            .agg(F.min("dist").alias("dist"))
        )
        nxt = _materialize(relaxed, reliable_checkpoint)
        # Convergence short-circuit: a round that changes nothing ends
        # the walk early (same count+join probe economics as kcore —
        # here a simple changed-row count on the two tiny dist frames).
        converged = (
            nxt.join(dist, ["p", "dist"], "left_anti").isEmpty()
            and nxt.count() == dist.count()
        )
        dist = nxt
        if converged:
            break
    return dist


def neighbor_jaccard(
    edges: DataFrame,
    max_wedge_degree: int | None = None,
    min_common: int = 1,
) -> DataFrame:
    """Neighborhood Jaccard similarity for every node pair sharing at
    least one neighbor: ``jaccard_permille = (1000·|N(a)∩N(b)|) div
    (deg(a) + deg(b) − |N(a)∩N(b)|)`` — the STRUCTURAL-similarity
    companion of :func:`ra_link_prediction`: RA predicts NEW links (and
    anti-joins existing edges away), Jaccard measures substitutability
    and keeps adjacent pairs too (two products bought alongside the
    same basket-mates are interchangeable whether or not they ever
    co-occur). Output ``(p_a, p_b, n_common, jaccard_permille)``,
    p_a < p_b, all-integer (Jaccard and common-neighbours are the
    other two of Zhou/Lü/Zhang's simple local indices — RA completes
    the family).

    ``min_common`` floors the shared-neighbour count BEFORE the degree
    join — a single shared basket-mate is hub noise on a co-purchase
    graph (the min_count hapax floor of pmi_collocations applied to
    wedges), and the floor is what keeps the output pair set
    evidence-weighted rather than |wedge-pairs|-sized.

    Scale: the SAME one wedge self-join as RA (shuffle keys = center
    ids, per-center work deg², ``max_wedge_degree`` hub cap); degrees
    join onto the (floored, much smaller) pair aggregate, not the
    wedge stream."""
    both = _both_directions(edges)
    deg = both.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    centered = both.join(deg, "src").select(
        F.col("src").alias("c"), "dst", "deg"
    )
    if max_wedge_degree is not None:
        centered = centered.filter(F.col("deg") <= max_wedge_degree)
    a = centered.select("c", F.col("dst").alias("p_a"))
    b = centered.select("c", F.col("dst").alias("p_b"))
    common = (
        a.join(b, "c")
        .filter(F.col("p_a") < F.col("p_b"))
        .groupBy("p_a", "p_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    da = deg.select(F.col("src").alias("p_a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("src").alias("p_b"), F.col("deg").alias("_db"))
    return (
        common.join(da, "p_a")
        .join(db, "p_b")
        .select(
            "p_a",
            "p_b",
            "n_common",
            F.expr(
                "CAST((n_common * 1000) DIV (_da + _db - n_common) AS BIGINT)"
            ).alias("jaccard_permille"),
        )
    )


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Per-node local clustering coefficient as integer permille:
    ``cc_permille = (2000·tri(v)) div (deg(v)·(deg(v)−1))`` for nodes
    with deg ≥ 2 — Watts/Strogatz's local transitivity, the standard
    "how clique-like is this node's neighbourhood" statistic. Output
    ``(p, deg, n_triangles, cc_permille)``.

    A triangle {a, c, b} produces exactly THREE confirmed wedges — one
    per corner acting as the center — so the per-CENTER count of
    confirmed wedges is already tri(v), no corner bookkeeping needed
    (counting all three corners of every confirmed wedge triple-counts;
    the handchecked K3 test pins this). Pure integer arithmetic end to
    end.

    Scale: the wedge join is the RA shape (center-keyed, deg² per
    center — cap degrees upstream via the small-basket subgraph);
    the triangle-confirm semi-join keys on the (p_a, p_b) pair against
    the edge list; the count aggregate keys on the center."""
    both = _both_directions(edges)
    deg = both.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    centered = both.select(F.col("src").alias("c"), "dst")
    a = centered.select("c", F.col("dst").alias("p_a"))
    b = centered.select("c", F.col("dst").alias("p_b"))
    wedges = a.join(b, "c").filter(F.col("p_a") < F.col("p_b"))
    canon = edges.select(
        F.least("p1", "p2").alias("p_a"), F.greatest("p1", "p2").alias("p_b")
    ).distinct()
    tris = wedges.join(canon, ["p_a", "p_b"], "left_semi")
    tri_counts = tris.groupBy(F.col("c").alias("p")).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
    return (
        deg.filter(F.col("deg") >= 2)
        .select(F.col("src").alias("p"), "deg")
        .join(tri_counts, "p", "left")
        .select(
            "p",
            F.col("deg").cast("long").alias("deg"),
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias(
                "n_triangles"
            ),
            F.expr(
                "CAST((COALESCE(n_triangles, 0) * 2000) "
                "DIV (deg * (deg - 1)) AS BIGINT)"
            ).alias("cc_permille"),
        )
    )


def hits_bipartite(
    edges: DataFrame,
    iters: int = 2,
    scale: int = 10**6,
    hub_col: str = "hub",
    auth_col: str = "auth",
    reliable_checkpoint: bool = False,
) -> DataFrame:
    """Integer HITS over a BIPARTITE edge list ``(hub, auth)`` —
    Kleinberg's hubs-and-authorities reinforcement (JACM 1999) in the
    form where it is genuinely distinct from eigenvector centrality: on
    an undirected graph hubs equal authorities, but on a bipartite
    customer→part graph the two sides reinforce (a customer is a good
    hub when they buy authoritative parts; a part is authoritative when
    good hubs buy it) — the recommendation-seed / catalog-curation
    signal next to PageRank's single-mode importance.

    Arithmetic contract: h⁰(u) = ``scale``; each iteration is two
    integer sum-aggregations over the static edge list::

        a(v) = Σ_{u→v} h(u)        h'(u) = Σ_{u→v} a(v)

    — NO normalization step, because the classical per-iteration L2
    normalization is a positive scalar that cannot change any ranking,
    and dropping it keeps every value an exact BIGINT (hash-identical
    in any engine; the oracle unrolls the same recurrence). The price
    is growth: scores reach ~scale·(max_deg)^(2·iters). The operator
    computes the exact worst-case bound from the REAL degree maxima
    before iterating and REFUSES (ValueError naming the largest safe
    ``scale``) when it could exceed BIGINT — the pagerank_int
    overflow discipline: wrong-by-wrapping is the one inexcusable
    outcome of an exact-arithmetic design.

    Scale: the edge list is materialized once (localCheckpoint — the
    iterative-loop rule); each half-iteration is one join of the
    ≤|side|-row score vector (broadcast; pass a shuffle join at 10^8+
    nodes the way pagerank_int's ``broadcast_ranks=False`` does)
    against the static edges plus one aggregate keyed on the other
    side — 2·iters exchanges total, no driver-side collection except
    ONE fused max-degree scalar pair for the guard. Output one row per
    node:
    ``(node_id, role, score_scaled)`` with role ∈ ('hub', 'authority').
    """
    e = _materialize(
        edges.select(F.col(hub_col).alias("_h"), F.col(auth_col).alias("_a"))
        .distinct(),
        reliable_checkpoint,
    )
    # Both degree maxima in ONE aggregate job (VERDICT r10 item 6): a
    # side-tagged union counted by (_side, key), then a conditional max
    # per side — one pass over the checkpointed edges instead of two
    # head-latency jobs; values identical by construction.
    deg_row = (
        e.select(F.lit("h").alias("_side"), F.col("_h").alias("_k"))
        .unionAll(e.select(F.lit("a").alias("_side"), F.col("_a").alias("_k")))
        .groupBy("_side", "_k")
        .count()
        .agg(
            F.max(F.when(F.col("_side") == "h", F.col("count"))).alias("_dh"),
            F.max(F.when(F.col("_side") == "a", F.col("count"))).alias("_da"),
        )
        .collect()[0]
    )
    deg_h = deg_row["_dh"] or 0
    deg_a = deg_row["_da"] or 0
    bound = scale
    for _ in range(iters):
        bound *= deg_a  # a(v) sums ≤ deg(v) hub scores
        bound *= deg_h  # h(u) sums ≤ deg(u) authority scores
    if bound >= 2**62:
        safe = scale
        while safe > 1:
            b = safe
            for _ in range(iters):
                b *= deg_a * deg_h
            if b < 2**62:
                break
            safe //= 10
        raise ValueError(
            f"hits_bipartite: worst-case score {bound} exceeds BIGINT at "
            f"scale={scale}, iters={iters} (max degrees {deg_h}/{deg_a}); "
            f"largest safe scale ~{safe}"
        )
    hubs = e.select("_h").distinct().select(
        "_h", F.lit(scale).cast("long").alias("_score")
    )
    auths = None
    for _ in range(iters):
        auths = (
            e.join(F.broadcast(hubs), "_h")
            .groupBy("_a")
            .agg(F.sum("_score").cast("long").alias("_score"))
        )
        hubs = (
            e.join(F.broadcast(auths), "_a")
            .groupBy("_h")
            .agg(F.sum("_score").cast("long").alias("_score"))
        )
    return hubs.select(
        F.col("_h").alias("node_id"),
        F.lit("hub").alias("role"),
        F.col("_score").alias("score_scaled"),
    ).unionByName(
        auths.select(
            F.col("_a").alias("node_id"),
            F.lit("authority").alias("role"),
            F.col("_score").alias("score_scaled"),
        )
    )
