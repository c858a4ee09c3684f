"""Bloom-filter eval-set decontamination with false-positive accounting.

The exact decontamination tier (`decontaminate_ngram_overlap`) joins
training 5-grams against the broadcast eval 5-gram SET — exact, but the
broadcast payload is the eval grams themselves. The production-scale
alternative every large pipeline reaches for is a Bloom filter (Bloom,
CACM 1970): k hash positions per gram into an m-bit array, membership =
all k bits set — the broadcast shrinks to m/8 bytes regardless of eval
size, at the price of false positives. A 100 TB decontamination pass
cares because the filter rides in every executor's memory for the whole
scan.

This module implements the bitmap SEMANTICS with portable arithmetic so
the whole tier is driver-hash-checkable: positions are md5-substring
integers (the `hash_bucket` family — DuckDB computes the identical
values), the "bit array" is the distinct-position set of the eval
grams, and membership is an all-k-positions-present join. A physical
long[] bitset is an executor-side representation change with identical
semantics — what the oracle certifies here is the decision function,
including its false positives: the output carries per-doc
``n_bloom_hits`` AND exact ``n_true_hits``, so the FP overcount is
measured on real data rather than assumed from the (1−e^{−kn/m})^k
formula.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.text import tokens

#: Filter geometry: m = 2^16 bits, k = 3 positions per gram. Sized so the
#: fixture SFs exercise BOTH regimes: at sf0.001 the eval set loads ~4% of
#: the bits (FP ≈ 1e-4 — bloom_hits == true_hits almost everywhere) while
#: sf0.1 loads a realistic double-digit fraction and produces measurable
#: per-doc false positives. Production picks m from the eval-gram count
#: and an FP budget; the semantics below are m-agnostic.
M_BITS = 1 << 16
K_HASHES = 3


def bloom_positions(gram: Column) -> list[Column]:
    """The k bit positions of one gram: disjoint 5-hex-digit (20-bit)
    slices of md5(gram), each mod m — the portable-hash rule
    (operators/sampling.py::hash_bucket); DuckDB derives bit-identical
    integers via ('0x' || substr(md5(g), ...))::BIGINT % m."""
    h = F.md5(gram)
    return [
        (
            F.conv(F.substring(h, 1 + 5 * j, 5), 16, 10).cast("long")
            % F.lit(M_BITS)
        ).alias(f"_p{j}")
        for j in range(K_HASHES)
    ]


def _doc_grams(docs: DataFrame, n: int = 5) -> DataFrame:
    """Distinct (doc_id, gram) pairs of whitespace n-grams. Tokens
    materialize in their own projection before the slice transform (the
    multi-reference lambda rule, operators/dedup.py::shingles_of)."""
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
    grams = F.array_distinct(
        F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("_toks") - (n - 1), F.lit(1)),
            ),
            lambda i: F.concat_ws(
                " ", F.slice("_toks", i, F.lit(n))
            ),
        )
    )
    return (
        toked.select("doc_id", F.explode_outer(grams).alias("g"))
        .filter(F.col("g").isNotNull())
        .filter(F.size(F.split(F.col("g"), " ")) == n)
    )


def bloom_decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
) -> DataFrame:
    """Per-training-doc contamination counts through the Bloom tier:
    ``(doc_id, n_grams, n_bloom_hits, n_true_hits, n_false_positives)``
    where a gram bloom-hits when ALL k of its bit positions were set by
    some eval gram, true-hits when the gram itself is in the eval set,
    and n_false_positives = bloom − true (≥ 0 by construction — the
    Bloom no-false-negative law, which a hash row certifies on real
    data). Docs shorter than ``n`` tokens carry no gram and emit no row
    (stated contract, the bigram <2-token rule).

    Scale: the eval side reduces to ≤ k·|eval grams| DISTINCT bit
    positions (the m-bit array's set bits) and the distinct eval gram
    set — both tiny vs a 100 TB train corpus and marked broadcast; the
    train side explodes to distinct (doc_id, gram) pairs ONCE, feeds
    both membership joins locally (zero corpus shuffle), and aggregates
    on the already-colocated doc_id. At production scale the position
    set compiles into a physical m/8-byte bitset held per executor;
    identical decision function."""
    ev = _doc_grams(eval_docs, n)
    eval_grams = F.broadcast(ev.select("g").distinct())
    eval_bits = F.broadcast(
        ev.select(F.explode(F.array(*bloom_positions(F.col("g")))).alias("p"))
        .distinct()
    )
    tg = _doc_grams(train, n)
    # One row per (doc, gram) carrying its k positions as COLUMNS, each
    # probed by its own broadcast left join; a gram bloom-hits iff all k
    # probes matched. The previous form exploded to (doc, gram, position)
    # rows and re-aggregated by (doc_id, g) to count matches — a full
    # |grams|-row exchange that exists only to undo the explode. The
    # column form needs NO intermediate shuffle: the sole exchange left
    # is the final doc_id aggregate with map-side partials (plan: 2
    # Exchange -> 1; r14 optimization round, guide §2.4 — measured
    # 2.59 -> 2.39 s min-of-4 interleaved at sf0.1 where gram
    # construction dominates, identical output; at corpus scale it
    # removes the only gram-stream-sized shuffle of the audit).
    probed = tg.select("doc_id", "g", *bloom_positions(F.col("g")))
    for j in range(K_HASHES):
        probed = probed.join(
            F.broadcast(
                eval_bits.select(F.col("p").alias(f"_p{j}")).withColumn(
                    f"_h{j}", F.lit(1)
                )
            ),
            f"_p{j}",
            "left",
        )
    hit = F.col("_h0").isNotNull()
    for j in range(1, K_HASHES):
        hit = hit & F.col(f"_h{j}").isNotNull()
    withb = probed.select("doc_id", "g", hit.cast("int").alias("_bloom"))
    truth = withb.join(
        eval_grams.withColumn("_true", F.lit(1)), "g", "left"
    )
    return truth.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("_bloom").cast("long").alias("n_bloom_hits"),
        F.sum(F.coalesce(F.col("_true"), F.lit(0))).cast("long").alias("n_true_hits"),
        (F.sum("_bloom") - F.sum(F.coalesce(F.col("_true"), F.lit(0))))
        .cast("long")
        .alias("n_false_positives"),
    )


_POW32 = [1 << i for i in range(32)]


def bloom_bitmap(eval_docs: DataFrame, n: int = 5) -> DataFrame:
    """The PHYSICAL Bloom filter: one row holding a DENSE
    ``array<long>`` of m/32 32-bit words (word w = bits [32w, 32w+32);
    position p lives in word p div 32) — the m-proportional broadcast
    payload the module docstring promises. 32-bit words, not 64:
    dynamic bit tests below run through a power-of-two lookup +
    bitwiseAND, and staying under 2^31 keeps every word a positive
    long in BOTH engines (bit 63 of a packed 64-bit word would need
    sign-aware arithmetic).

    Dense array, not map<int,long> (the first representation): Spark's
    ``element_at`` on an unsorted MapData is a LINEAR SCAN of all
    entries, so at sf0.1 (~2k populated words) every gram's 3 probes
    walked ~6k map entries; array ``element_at`` is O(1). The dense
    array is built by LEFT-JOINING a range(m/32) scaffold to the word
    table and collecting (w, bits) structs in sorted order — NOT by a
    2048-wide transform probing the sparse map per index, which was
    measured at 3.9 s on ONE row (2048 × O(2048) interpreted map
    scans, single task). Whole rewrite measured 8.4 → 1.9 s warm at
    sf0.1 (now at par with the audit join form, which a stream
    amortizes further by building the bitmap once) with bit-identical
    decisions (the equals-join-form pin)."""
    ev = _doc_grams(eval_docs, n)
    pows = F.array(*[F.lit(p) for p in _POW32])
    pos = ev.select(
        F.explode(F.array(*bloom_positions(F.col("g")))).alias("p")
    ).distinct()
    words = pos.groupBy((F.col("p") / 32).cast("int").alias("w")).agg(
        F.bit_or(
            F.element_at(pows, (F.col("p") % 32).cast("int") + 1)
        ).alias("bits")
    )
    scaffold = eval_docs.sparkSession.range(M_BITS // 32).select(
        F.col("id").cast("int").alias("w")
    )
    full = scaffold.join(F.broadcast(words), "w", "left").select(
        "w", F.coalesce("bits", F.lit(0)).alias("bits")
    )
    return full.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("w", "bits"))),
            lambda x: x["bits"],
        ).alias("_bm")
    )


def bloom_scores_rowlocal(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
) -> DataFrame:
    """Per-doc Bloom contamination counts computed ROW-LOCALLY against
    the broadcast bitmap: ``(doc_id, n_grams, n_bloom_hits)`` — the
    INGEST-TIME form of :func:`bloom_decontaminate`. No explode, no
    join per gram: each row derives its distinct grams in an array,
    tests all k bit positions per gram via O(1) element_at +
    bitwiseAND on the one-row dense word array, and emits its counts — so the operator is
    STATELESS and works identically on a batch frame or a streaming
    frame (stream-static cross join against the 1-row bitmap; this is
    what "decontaminate at ingest" means at 100 TB — an 8 KB filter
    riding every executor, zero shuffle on the document stream).
    n_true_hits needs the exact eval gram set and is deliberately NOT
    here — not carrying the exact set is the point of the Bloom tier;
    the batch audit form measures the FP gap offline.

    Bloom-hit decisions are bit-identical to bloom_decontaminate's
    position-set join (pinned): same md5 positions, and bitmap-bit-set
    ⟺ position-in-set by construction. Docs under ``n`` tokens emit
    no row (same contract)."""
    pows = F.array(*[F.lit(p) for p in _POW32])

    def bit_set(p):
        # dense array<long>: word p div 32 sits at 1-based position +1;
        # O(1) element_at (see bloom_bitmap's representation note)
        word = F.element_at(F.col("_bm"), (p / 32).cast("int") + 1)
        bit = F.element_at(pows, (p % 32).cast("int") + 1)
        return word.bitwiseAND(bit) != 0

    def hash_hits(h):
        # h is the PRE-COMPUTED md5 hex of one gram (see _hashes below —
        # lambda bodies run interpreted with no common-subexpression
        # elimination, so md5 must be evaluated once per gram OUTSIDE
        # the probe lambda, not once per probe inside it)
        checks = [
            bit_set(
                F.conv(F.substring(h, 1 + 5 * j, 5), 16, 10).cast("long")
                % F.lit(M_BITS)
            )
            for j in range(K_HASHES)
        ]
        out = checks[0]
        for c in checks[1:]:
            out = out & c
        return out

    toked = docs.select(
        "doc_id", tokens(F.col("text")).alias("_toks")
    ).filter(F.size("_toks") >= n)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("_toks") - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice("_toks", i, F.lit(n))),
        )
    )
    staged = (
        toked.select("doc_id", grams.alias("_grams"))
        .select(
            "doc_id",
            "_grams",
            F.transform("_grams", F.md5).alias("_hashes"),
        )
        .crossJoin(F.broadcast(bloom_bitmap(eval_docs, n)))
    )
    return staged.select(
        "doc_id",
        F.size("_grams").cast("long").alias("n_grams"),
        F.size(F.filter("_hashes", hash_hits)).cast("long").alias(
            "n_bloom_hits"
        ),
    )
