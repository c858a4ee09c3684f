"""Corpus language-model scoring operators (r7 registration queue).

`bigram_surprisal` upgrades the unigram quality gate
(plans/queries_round4.py::surprisal_score) to a conditional model: a
document is surprising when its ADJACENT token pairs are corpus-rare,
not merely its tokens — catching shuffled/boilerplate text whose
unigram profile looks normal (the standard perplexity-filter signal in
training-data curation, Wenzek et al.'s CCNet pipeline being the public
reference).

Numeric strategy (the surprisal_score discipline, one level up): the
per-pair term is the RATIONAL inverse conditional probability
1/P̂(cur|prev) = C(prev·)/C(prev,cur), carried as the scaled integer
``(C(prev·) * scale) div C(prev,cur)`` — floor division identical in
both engines — and summed as DECIMAL(38,0) (order-insensitive, unlike
float log-sums, and overflow-proof where a BIGINT sum would wrap in
Spark but promote to HUGEINT in DuckDB). No log anywhere, so the oracle
is exact: log-space scoring ranks identically for gating thresholds
computed on the same scale. Self-corpus scoring means every observed
bigram has C ≥ 1 — the unigram-backoff branch of a held-out scorer
never triggers, so it is deliberately absent rather than dead code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark.functions.numeric import r4
from kinesis_stream_video_project_spark.functions.text import tokens

_SCALE = 10**9


def doc_bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, prev, cur) for every adjacent token pair — the zip-with-
    shifted-self form (phrase_search_docs rationale: constant 2 array
    references per ROW; shingles_of's per-element lambda re-tokenizes
    per reference under CollapseProject). The padded tail pair carries a
    null `cur` and is filtered after the explode."""
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
    shifted = F.slice(F.col("_toks"), 2, 1000000)  # 10^6 cap: see phrase_search
    pairs = F.zip_with(
        F.col("_toks"),
        shifted,
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )
    return (
        toked.select("doc_id", F.explode_outer(pairs).alias("bg"))
        .select("doc_id", F.col("bg.prev").alias("prev"), F.col("bg.cur").alias("cur"))
        .filter(F.col("cur").isNotNull())
    )


def bigram_surprisal(docs: DataFrame, scale: int = _SCALE) -> DataFrame:
    """Per-document bigram surprisal: mean scaled inverse conditional
    probability of its adjacent token pairs under the self-corpus bigram
    model. Output (doc_id, n_bigrams, surprisal) with surprisal =
    r4(Σ terms / n / scale) — a document of corpus-unique continuations
    scores ≈ C(prev·)-sized, formulaic text scores ≈ 1.

    Output contract: documents with FEWER THAN TWO tokens produce no
    bigrams and therefore NO OUTPUT ROW (pinned in tests — a 0-token or
    1-token doc is absent, not scored 0). A gating consumer must LEFT
    join docs to these scores and decide the policy for the missing rows
    explicitly (too-short docs usually fail a length gate long before a
    perplexity gate; silently inheriting a join-direction-dependent fate
    is the bug this note exists to prevent).

    Scale shape: one (prev, cur) bigram-count aggregate and one prev
    marginal DERIVED from it (sum over cur — no second pass over the
    corpus), joined back onto the exploded pairs (two shuffles on the
    bigram/prev keys), then one per-doc aggregate. The bigram join has
    the same Zipf-hot-prev skew as the token joins — at stopword-skew
    scale wrap it with operators/skew.salted_join (the
    surprisal_score_salted lever, unchanged)."""
    bgs = doc_bigrams(docs)
    bg_counts = bgs.groupBy("prev", "cur").agg(
        F.count(F.lit(1)).alias("c_bigram")
    )
    prev_counts = bg_counts.groupBy("prev").agg(
        F.sum("c_bigram").alias("c_prev")
    )
    # Overflow envelope, ENFORCED IN-PLAN (the pagerank_int refuse-loudly
    # discipline, pushed to the right altitude): the per-term product
    # c_prev·scale is a BIGINT multiply, so the hottest prev bounds the
    # safe scale — at a 100 TB corpus a stopword prev reaches ~10^11 and
    # the default 10^9 scale must drop to ~10^7, resolution a
    # mean-of-terms consumer cannot observe. The guard is a per-row
    # raise_error branch rather than a driver-side max() probe: a probe
    # would re-run the whole tokenize+count pipeline as an extra job per
    # call, while the branch costs one comparison inside the term
    # expression and fails at first violation.
    safe_max = (2**63 - 1) // scale
    # The error reports the bound from THIS row's count; the binding
    # corpus-wide bound is 2^63 div max(c_prev), which a per-row branch
    # cannot see (and which row fails first is partition-order
    # nondeterministic) — so the message says "at most", and callers
    # should derive the final scale from their hottest prev count.
    term = (
        f"CASE WHEN c_prev <= {safe_max} "
        f"THEN CAST((c_prev * {scale}) DIV c_bigram AS DECIMAL(38,0)) "
        f"ELSE CAST(raise_error(concat('bigram_surprisal: prev count ', "
        f"c_prev, ' * scale {scale} exceeds BIGINT - the per-term product "
        f"would wrap (Spark) or error (DuckDB); scale must be at most ', "
        f"CAST({2**63 - 1} DIV c_prev AS STRING), ' for this prev alone - "
        f"size it from the corpus'' hottest prev count')) "
        f"AS DECIMAL(38,0)) END"
    )
    # Join the prev marginal onto the MODEL TABLE, not the pair stream
    # (r14 optimization round, guide §2.3/§3): bg_counts is
    # vocab²-bounded while bgs is corpus-sized, so enriching the counts
    # first costs a model-side join and the pair stream crosses ONE join
    # instead of two (measured 1.24 -> 1.06 s min-of-4 interleaved at
    # sf0.1, identical output; at stopword-skew scale it halves the
    # pair-stream shuffle passes).
    model = bg_counts.join(prev_counts, "prev")
    scored = (
        bgs.join(model, ["prev", "cur"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.expr(term)).alias("_s"),
        )
    )
    return scored.select(
        "doc_id",
        "n_bigrams",
        r4(
            F.col("_s").cast("double") / F.col("n_bigrams") / F.lit(float(scale))
        ).alias("surprisal"),
    )


def pmi_collocations(
    docs: DataFrame,
    k: int = 20,
    min_count: int = 5,
    scale: int = 10**6,
) -> DataFrame:
    """Top-``k`` collocations by scaled pointwise mutual information over
    adjacent token pairs (r8 registration queue): PMI = log
    P(a,b)/(P(a)P(b)) is THE classic collocation statistic (Church &
    Hanks 1990), and in training-data pipelines it drives phrase-vocab
    induction and term-association features next to the raw BPE-merge
    counts. Output ``(prev, cur, n_pairs, pmi_scaled, rnk)``.

    Numeric strategy: the log is dropped (monotone — ranking by the
    rational core ranks by PMI) and the core c_ab·N/(c_prev·c_cur) is
    carried as TWO staged truncating integer divisions,
    ``t1 = (c_ab·scale) div c_prev`` then ``(t1·N) div c_cur`` — each
    stage identical in both engines, so the emitted integer is
    hash-exact with no float or libm anywhere. Marginals are the bigram
    row/column sums (one corpus pass: both derive from the (prev, cur)
    aggregate). ``min_count`` floors c_ab — bare-PMI famously promotes
    hapax pairs (c_ab = 1 rows top the ranking), the standard filter in
    every collocation reference.

    Overflow envelope, ENFORCED IN-PLAN (the bigram_surprisal branch,
    same altitude): t1 ≤ scale (c_ab ≤ c_prev), so the binding product
    is t1·N ≤ scale·N and c_ab·scale ≤ c_prev·scale ≤ N·scale — one
    guard on N covers both stages. At a 100 TB corpus N ≈ 10^13 caps
    scale at ~10^5; the raise_error branch reports the exact bound
    instead of wrapping (Spark) or erroring opaquely (DuckDB).

    Scale shape: doc_bigrams → ONE (prev, cur) count aggregate; both
    marginals and the 1-row N re-aggregate the (already tiny) pair-count
    table; N broadcasts back via a 1-row cross join (the
    queries_round6 global-aggregate pattern) and the marginal joins key
    on prev/cur. Top-k rides TakeOrderedAndProject, rank attached after
    the sort+limit (the tfidf_topk rule)."""
    from pyspark.sql import Window

    counts = (
        doc_bigrams(docs)
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    prev_m = counts.groupBy("prev").agg(F.sum("n_pairs").alias("c_prev"))
    cur_m = counts.groupBy("cur").agg(F.sum("n_pairs").alias("c_cur"))
    total = counts.agg(F.sum("n_pairs").alias("n_total"))
    safe_max = (2**63 - 1) // scale
    score = (
        f"CASE WHEN n_total <= {safe_max} "
        f"THEN (((n_pairs * {scale}) DIV c_prev) * n_total) DIV c_cur "
        f"ELSE raise_error(concat('pmi_collocations: corpus bigram total ', "
        f"n_total, ' * scale {scale} exceeds BIGINT - scale must be at "
        f"most ', CAST({2**63 - 1} DIV n_total AS STRING))) END"
    )
    scored = (
        counts.filter(F.col("n_pairs") >= min_count)
        .join(prev_m, "prev")
        .join(cur_m, "cur")
        .crossJoin(F.broadcast(total))
        .select(
            "prev",
            "cur",
            "n_pairs",
            F.expr(score).cast("long").alias("pmi_scaled"),
        )
    )
    top = scored.orderBy(
        F.col("pmi_scaled").desc(), F.col("prev"), F.col("cur")
    ).limit(k)
    w = Window.orderBy(F.col("pmi_scaled").desc(), F.col("prev"), F.col("cur"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def vocab_oov_scores(docs: DataFrame, vocab_size: int = 500) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus's own
    top-``vocab_size`` token vocabulary (r8 registration queue): the
    fixed-vocab coverage signal every tokenizer-bound pipeline needs —
    a document whose tokens fall outside the working vocabulary inflates
    UNK rates / fertility downstream, and "OOV rate vs a reference
    vocab" is a standard cheap quality gate next to the stopword and
    repetition ratios. Output ``(doc_id, n_tokens, n_oov,
    oov_permille)`` with ``oov_permille = (n_oov·1000) div n_tokens`` —
    all-integer, hash-exact.

    The vocabulary is the top-``vocab_size`` terms by total occurrence
    count with a lexicographic tiebreak — a TOTAL order, so the cut is
    deterministic in any engine (the bpe_merge_topk rule). Note the
    whitespace tokenizer maps empty text to one empty-string token, so
    n_tokens ≥ 1 and the permille division is total.

    Scale shape: one term-count aggregate → TakeOrderedAndProject
    top-V → the ≤V-row vocab BROADCASTS back onto the exploded tokens
    (membership = broadcast left join, no shuffle of the corpus beyond
    the per-doc re-aggregate); one (doc_id) count/sum aggregate. At
    100 TB the vocab is a stored artifact and the scan is one pass."""
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    )
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .orderBy(F.col("n_occ").desc(), F.col("term"))
        .limit(vocab_size)
        .select("term", F.lit(True).alias("_in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("_in_vocab").isNull(), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            F.expr("(n_oov * 1000) DIV n_tokens").alias("oov_permille"),
        )
    )


def bpe_merge_topk(docs: DataFrame, k: int = 20) -> DataFrame:
    """Top-``k`` adjacent-token-pair counts — the candidate table of ONE
    BPE merge step at token granularity (r8 registration queue): vocab
    induction (Sennrich et al. 2016) repeatedly merges the most frequent
    adjacent pair, and at corpus scale the per-step candidate ranking is
    exactly this aggregate; an engine that feeds tokenizer training owns
    it next to the token/bigram statistics it already serves.
    Output ``(prev, cur, n_pairs, rnk)``, ranked by (count desc, prev,
    cur) — a total order, so the cut is deterministic in any engine.

    Scale: rides :func:`doc_bigrams` (zip-with-shifted-self, no
    re-tokenization) → one (prev, cur) count aggregate →
    TakeOrderedAndProject top-k (rank attached AFTER the sort+limit,
    the tfidf_topk rule). All-integer."""
    from pyspark.sql import Window

    counts = (
        doc_bigrams(docs)
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    top = counts.orderBy(
        F.col("n_pairs").desc(), F.col("prev"), F.col("cur")
    ).limit(k)
    w = Window.orderBy(F.col("n_pairs").desc(), F.col("prev"), F.col("cur"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def doc_trigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2, w3) for every adjacent token TRIPLE — the
    zip-with-shifted-self form one level deeper than :func:`doc_bigrams`
    (two nested zip_with calls, constant array references per row).
    Padded tails carry null w2/w3 and are filtered after the explode."""
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
    s2 = F.slice(F.col("_toks"), 2, 1000000)
    s3 = F.slice(F.col("_toks"), 3, 1000000)
    pairs = F.zip_with(
        F.col("_toks"), s2, lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))
    )
    triples = F.zip_with(
        pairs,
        s3,
        lambda p, c: F.struct(
            p.getField("w1").alias("w1"),
            p.getField("w2").alias("w2"),
            c.alias("w3"),
        ),
    )
    return (
        toked.select("doc_id", F.explode_outer(triples).alias("tg"))
        .select(
            "doc_id",
            F.col("tg.w1").alias("w1"),
            F.col("tg.w2").alias("w2"),
            F.col("tg.w3").alias("w3"),
        )
        .filter(F.col("w3").isNotNull())
    )


def stupid_backoff_scores(
    docs: DataFrame,
    tri_budget: int = 2000,
    bi_budget: int = 500,
    scale: int = 10**6,
) -> DataFrame:
    """Per-document trigram STUPID BACKOFF score under a budget-pruned
    self-corpus model (Brants et al., "Large Language Models in Machine
    Translation", EMNLP 2007 — the count-based LM actually used at
    web scale because it needs no discounting math): each position
    scores S(w3|w1w2) = c(w1w2w3)/c(w1w2) if the trigram is in the
    model, else 0.4·c(w2w3)/c(w2) if the bigram is, else 0.4²·c(w3)/N.
    Model PRUNING is by budget, not count threshold: the top
    ``tri_budget`` trigrams / ``bi_budget`` bigrams by (count desc,
    lexicographic) — how production LMs actually bound their table
    memory, and (unlike an absolute min-count) it exercises all three
    paths at every corpus size.

    Integer exactness: scaled truncating divisions staged in a fixed
    order — tri: (c123·scale) div c12; bi: ((c23·scale) div c2)·2
    div 5 (0.4 = 2/5 exactly); uni: ((c3·scale) div N)·4 div 25. No
    libm, no float — hash-identical in any engine. Per-doc sum is
    bounded by positions·scale (≤ ~1e8 per fixture doc; each term
    ≤ scale since c123 ≤ c12 etc.) — far inside BIGINT.

    Output (doc_id, n_positions, n_tri, n_bi, n_uni, score_scaled).
    Docs with < 3 tokens carry no trigram position and emit NO row (the
    bigram_surprisal <2-token contract one order up).

    Scale: the model tables are aggregates of the one corpus scan —
    trigram counts → TakeOrderedAndProject budget cut (the cut orders
    the MODEL TABLE, ≤|vocab|³ rows, never the corpus) — and every
    model side BROADCASTS (tri_budget + bi_budget + |vocab| + 1 rows);
    the only corpus shuffle is the per-doc aggregate."""
    pos = doc_trigrams(docs)
    tri_counts = pos.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c123")
    )
    tri_kept = (
        tri_counts.orderBy(
            F.col("c123").desc(), F.col("w1"), F.col("w2"), F.col("w3")
        )
        .limit(tri_budget)
    )
    bg = doc_bigrams(docs)
    bi_counts = bg.groupBy(
        F.col("prev").alias("b1"), F.col("cur").alias("b2")
    ).agg(F.count(F.lit(1)).alias("cb"))
    bi_kept = bi_counts.orderBy(
        F.col("cb").desc(), F.col("b1"), F.col("b2")
    ).limit(bi_budget)
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
    uni = (
        toked.select(F.explode_outer("_toks").alias("w"))
        .filter(F.col("w").isNotNull())
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    n_total = uni.agg(F.sum("cu").cast("long").alias("n_total"))

    scored = (
        pos.join(F.broadcast(tri_kept), ["w1", "w2", "w3"], "left")
        .join(
            F.broadcast(
                bi_counts.select(
                    F.col("b1").alias("w1"),
                    F.col("b2").alias("w2"),
                    F.col("cb").alias("c12"),
                )
            ),
            ["w1", "w2"],
            "left",
        )
        .join(
            F.broadcast(
                bi_kept.select(
                    F.col("b1").alias("w2"),
                    F.col("b2").alias("w3"),
                    F.col("cb").alias("c23"),
                )
            ),
            ["w2", "w3"],
            "left",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w2"), F.col("cu").alias("c2"))),
            "w2",
            "left",
        )
        .join(
            F.broadcast(uni.select(F.col("w").alias("w3"), F.col("cu").alias("c3"))),
            "w3",
            "left",
        )
        .crossJoin(F.broadcast(n_total))
    )
    term = F.expr(
        f"CASE WHEN c123 IS NOT NULL THEN (c123 * {scale}) DIV c12 "
        f"WHEN c23 IS NOT NULL THEN (((c23 * {scale}) DIV c2) * 2) DIV 5 "
        f"ELSE (((c3 * {scale}) DIV n_total) * 4) DIV 25 END"
    )
    path = F.expr(
        "CASE WHEN c123 IS NOT NULL THEN 'tri' "
        "WHEN c23 IS NOT NULL THEN 'bi' ELSE 'uni' END"
    )
    return (
        scored.select("doc_id", term.alias("_t"), path.alias("_p"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_positions"),
            F.sum((F.col("_p") == "tri").cast("int")).cast("long").alias("n_tri"),
            F.sum((F.col("_p") == "bi").cast("int")).cast("long").alias("n_bi"),
            F.sum((F.col("_p") == "uni").cast("int")).cast("long").alias("n_uni"),
            F.sum("_t").cast("long").alias("score_scaled"),
        )
    )


def good_turing_counts(docs: DataFrame, scale: int = 10**6) -> DataFrame:
    """Frequency-of-frequencies spectrum + Turing-adjusted counts — the
    input statistic of Good-Turing smoothing (Good, Biometrika 1953;
    Gale & Sampson's "simple Good-Turing", J. Quant. Linguistics 1995)
    and the standard vocabulary-growth / crawl-exhaustion diagnostic
    next to ``ngram_novelty``'s per-doc curve.

    For every observed term frequency ``r``: ``n_r`` = how many distinct
    terms occur exactly r times, and the raw Turing estimate
    ``r* = (r+1) * n_{r+1} / n_r`` carried as the scaled integer
    ``((r+1) * n_{r+1} * scale) div n_r`` — truncating division,
    hash-identical in any engine, no float. Where ``n_{r+1} = 0`` (the
    gappy high-r tail) the raw estimate is 0; simple GT replaces those
    by a log-log regression — a float fit that belongs to the consumer,
    not the hash-gated spectrum (documented, not dead code). The r=1
    mass ``n_1 / N`` is the Turing unseen-probability estimate; emitting
    the spectrum lets the consumer read it off the first row.

    Scale: the corpus scan aggregates to term counts (the ONE
    key-cardinality shuffle, map-side combined); the spectrum is
    ``|distinct r|`` rows — tens, log-distributed — so the r+1 lookup
    is a broadcast self-join of a tiny frame, never a window over data.
    """
    term_counts = (
        docs.select(F.explode_outer(tokens(F.col("text"))).alias("w"))
        .filter(F.col("w").isNotNull() & (F.col("w") != ""))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    spectrum = term_counts.groupBy("r").agg(
        F.count(F.lit(1)).cast("long").alias("n_r")
    )
    nxt = spectrum.select(
        (F.col("r") - F.lit(1)).alias("r"), F.col("n_r").alias("n_r1")
    )
    return (
        spectrum.join(F.broadcast(nxt), "r", "left")
        .select(
            F.col("r").cast("long").alias("r"),
            "n_r",
            (
                (F.col("r") + F.lit(1)).cast("long")
                * F.coalesce(F.col("n_r1"), F.lit(0)).cast("long")
                * F.lit(scale).cast("long")
            ).alias("_num"),
        )
        .withColumn(
            "r_star_scaled",
            F.expr("_num DIV n_r").cast("long"),
        )
        .drop("_num")
    )


def readability_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease per document in exact milli-units
    (Flesch 1948; Kincaid et al. 1975 recalibrate the same three
    terms): ``flesch_milli = 206835 - (1015·W) div S - (84600·SYL)
    div W`` with W = whitespace tokens, S = sentence marks ``[.!?]+``
    floored at 1, SYL = vowel-group count ``[aeiouy]+`` over the whole
    text.

    Returns ``(doc_id, n_words, n_sentences, n_syllables,
    flesch_milli)``. All-integer with floor division on both engines
    (Spark ``DIV``, DuckDB ``//``) — the score hash-checks, no libm.
    Semantics notes (stated, not implied): vowel groups never span the
    single-space separators, so the text-level SYL equals the per-word
    sum, and a consonant-only word contributes 0 syllables rather than
    the linguist's minimum 1. Fixture note: the documents corpus
    carries no punctuation, so S is constantly 1 there and the score
    varies purely with word count and vowel density (probed
    non-degenerate in tests); punctuated corpora engage the sentence
    term unchanged.

    Scale: stateless row-local expressions — fully codegen'd, no
    shuffle at all; the quality-gate tier's cheapest member.
    """
    t = F.col(text_col)
    staged = docs.select(
        "doc_id",
        F.size(F.split(t, " ")).cast("bigint").alias("n_words"),
        F.greatest(
            F.lit(1).cast("bigint"),
            F.size(F.regexp_extract_all(t, F.lit("[.!?]+"), 0)).cast("bigint"),
        ).alias("n_sentences"),
        F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), 0))
        .cast("bigint")
        .alias("n_syllables"),
    )
    return staged.withColumn(
        "flesch_milli",
        F.expr(
            "206835 - (1015 * n_words) DIV n_sentences"
            " - (84600 * n_syllables) DIV n_words"
        ).cast("long"),
    )


def bpe_train_merges(
    docs: DataFrame, n_merges: int = 3, text_col: str = "text"
) -> DataFrame:
    """Train the first ``n_merges`` BPE merges over the corpus and return
    the learned merge table ``(merge_rank, sym_x, sym_y, pair_count)``
    — the ACTUAL iterative trainer (Sennrich, Haddow & Birch, ACL 2016
    "Neural machine translation of rare words with subword units"),
    where each round recounts adjacent-pair statistics on the
    RE-TOKENIZED vocabulary, unlike ``bpe_merge_candidates`` which ranks
    round-1 candidates only.

    Semantics pinned to the reference algorithm: pair statistics count
    every adjacent position (overlapping — [a,a,a] holds (a,a) twice,
    exactly ``get_stats``), the winning pair is (count desc, sym_x,
    sym_y) — the deterministic tie-break the paper leaves open — and the
    merge rewrites every word GREEDY-LEFTMOST NON-OVERLAPPING
    ([a,a,a,a] → [aa,aa], [a,a,a] → [aa,a]).

    Greedy-leftmost inside one engine-side string op: words are encoded
    with each symbol space-WRAPPED (``regexp_replace(word, '(.)',
    ' $1 ')`` → ``' a  a  a '``: single space at the ends, double
    between symbols), and a merge of (x, y) is the literal
    ``replace(sym, ' x  y ', ' xy ')``. Because each symbol owns its
    own delimiters, consecutive matches share nothing — the left-to-
    right non-overlapping scan of ``replace`` (identical in Spark and
    DuckDB) IS the greedy-leftmost merge, with no suffix/prefix
    ambiguity (a single-delimiter encoding has both; the shared-space
    encoding breaks on runs — probed in tests against a Python
    reference fold including the [a,a,a,a] case).

    Scale shape: ONE corpus-size shuffle (the word-count aggregate);
    every iteration thereafter runs on the deduped VOCABULARY — the
    classic trainer optimization — recounting pairs via a staged
    zip-adjacent projection (explode_outer on the projected pair array:
    the r4 inferred-filter discipline) and applying the 1-row winning
    pair by broadcast cross join, so the loop never touches the corpus
    again and nothing is collected to the driver. ``n_merges`` is fixed
    (not converged) so plans stay bounded, the PageRank/SSSP rule.
    """
    if not 1 <= n_merges <= 8:
        raise ValueError(
            f"bpe_train_merges: n_merges must be in [1, 8] (each merge "
            f"deepens every downstream plan), got {n_merges}"
        )
    tops, _vocab = _bpe_chain(docs, n_merges, text_col)
    out = tops[0]
    for t in tops[1:]:
        out = out.union(t)
    return out


def _bpe_chain(
    docs: DataFrame, n_merges: int, text_col: str
) -> tuple:
    """Shared trainer chain: returns ``(tops, vocab)`` where ``tops`` is
    one 1-row frame per merge and ``vocab`` is the final re-tokenized
    vocabulary ``(word, sym, wc)`` after all merges — the word column is
    threaded through so :func:`bpe_apply_report` can join token counts
    back to the corpus."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    vocab = words.select(
        "word", F.regexp_replace("word", "(.)", " $1 ").alias("sym"), "wc"
    )
    tops = []
    for rank in range(1, n_merges + 1):
        staged = (
            vocab.select(
                "wc", F.split(F.trim(F.col("sym")), "  ").alias("_arr")
            )
            .select(
                "wc",
                F.arrays_zip(
                    F.expr("slice(_arr, 1, size(_arr) - 1)"),
                    F.expr("slice(_arr, 2, 1000000)"),
                ).alias("_pairs"),
            )
            .withColumn("_p", F.explode_outer("_pairs"))
        )
        # arrays_zip names fields "0"/"1"
        pair_counts = (
            staged.filter(F.col("_p").isNotNull())
            .select(
                F.col("_p.0").alias("sym_x"),
                F.col("_p.1").alias("sym_y"),
                "wc",
            )
            .groupBy("sym_x", "sym_y")
            .agg(F.sum("wc").alias("pair_count"))
        )
        top = (
            pair_counts.orderBy(
                F.col("pair_count").desc(), "sym_x", "sym_y"
            )
            .limit(1)
            .select(
                F.lit(rank).cast("long").alias("merge_rank"),
                "sym_x",
                "sym_y",
                F.col("pair_count").cast("long").alias("pair_count"),
            )
        )
        tops.append(top)
        vocab = vocab.crossJoin(
            F.broadcast(top.select("sym_x", "sym_y"))
        ).select(
            "word",
            F.expr(
                "replace(sym, concat(' ', sym_x, '  ', sym_y, ' '), "
                "concat(' ', sym_x, sym_y, ' '))"
            ).alias("sym"),
            "wc",
        )
    return tops, vocab


def bpe_apply_report(
    docs: DataFrame, n_merges: int = 3, text_col: str = "text"
) -> DataFrame:
    """Train ``n_merges`` BPE merges (:func:`bpe_train_merges`) and APPLY
    them back to the corpus — the full tokenizer train→apply roundtrip:
    ``(doc_id, n_char_tokens, n_bpe_tokens, compression_permille)`` per
    document, where ``n_char_tokens`` is the character-level token count
    (every word starts as its characters), ``n_bpe_tokens`` counts the
    merged symbols, and ``compression_permille = (1000·n_bpe_tokens)
    div n_char_tokens`` measures what the learned merges bought
    (1000 = nothing merged; Sennrich et al. 2016 §3 measures exactly
    this corpus-compression curve per merge count).

    Scale: the trainer chain runs on the deduped vocabulary; the apply
    step is ONE corpus-size explode joined to the |vocab|-row per-word
    symbol counts (broadcastable), then a doc-keyed aggregate — the
    corpus is scanned twice total (word counts + apply join), never per
    merge."""
    tops, vocab = _bpe_chain(docs, n_merges, text_col)
    per_word = vocab.select(
        "word",
        F.size(F.split(F.trim(F.col("sym")), "  ")).cast("long").alias("_n_syms"),
    )
    doc_words = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("word")
    )
    return (
        doc_words.join(F.broadcast(per_word), "word")
        .groupBy("doc_id")
        .agg(
            F.sum(F.length("word")).cast("long").alias("n_char_tokens"),
            F.sum("_n_syms").cast("long").alias("n_bpe_tokens"),
        )
        .withColumn(
            "compression_permille",
            F.expr("(1000 * n_bpe_tokens) DIV n_char_tokens").cast("long"),
        )
    )


def gopher_rules_report(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The published Gopher quality-filter rule set (Rae et al. 2021,
    "Scaling language models: ... Gopher", §A1.1) as named boolean
    columns — the citable heuristic gate next to the repo's composite
    ``quality_score``: ``(doc_id, n_words, n_word_chars, n_stopwords,
    rule_word_count, rule_mean_word_len, rule_stopwords,
    rule_alpha_words, pass_all)``.

    * ``rule_word_count``: ``min_words <= W <= max_words`` (the paper's
      50..100k);
    * ``rule_mean_word_len``: mean word length in [3, 10] — evaluated
      cross-multiplied (``3·W <= chars <= 10·W``), no division;
    * ``rule_stopwords``: at least 2 occurrences from the fixed stop
      list (functions/text.py::STOPWORDS — the paper uses a similar
      small set);
    * ``rule_alpha_words``: >= 80% of words contain an alphabetic
      character (``10·n_alpha >= 8·W``).

    Fixture honesty: the word-soup corpus passes the mean-word-length
    and alpha rules everywhere (probed — stated, the rules still
    ENFORCE their bounds) while word-count (~55%) and stopwords (~77%)
    split it, so ``pass_all`` is non-degenerate at every SF. All
    integer, row-local, zero shuffles — the cheapest gate tier with
    readability_report."""
    from kinesis_stream_video_project_spark.functions.text import STOPWORDS

    t = F.col(text_col)
    toks = F.split(t, " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    staged = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n_word_chars"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
        .cast("long")
        .alias("n_stopwords"),
        F.size(F.filter(toks, lambda x: x.rlike("[a-zA-Z]")))
        .cast("long")
        .alias("_n_alpha"),
    )
    return staged.select(
        "doc_id",
        "n_words",
        "n_word_chars",
        "n_stopwords",
        ((F.col("n_words") >= min_words) & (F.col("n_words") <= max_words)).alias(
            "rule_word_count"
        ),
        (
            (3 * F.col("n_words") <= F.col("n_word_chars"))
            & (F.col("n_word_chars") <= 10 * F.col("n_words"))
        ).alias("rule_mean_word_len"),
        (F.col("n_stopwords") >= 2).alias("rule_stopwords"),
        (10 * F.col("_n_alpha") >= 8 * F.col("n_words")).alias("rule_alpha_words"),
    ).withColumn(
        "pass_all",
        F.col("rule_word_count")
        & F.col("rule_mean_word_len")
        & F.col("rule_stopwords")
        & F.col("rule_alpha_words"),
    )


def heaps_law_curve(
    docs: DataFrame, n_buckets: int = 20, gram_n: int = 3
) -> DataFrame:
    """Vocabulary-growth (Heaps/Herdan law) curve in ingestion order —
    the corpus-level companion of ``ngram_novelty``'s per-doc statistic
    and ``good_turing_counts``'s static spectrum: walk the corpus in
    doc_id order, and at each of ``n_buckets`` equal doc_id-range
    checkpoints report cumulative gram OCCURRENCES processed (the n
    axis) vs cumulative DISTINCT types seen (the V axis). Heaps' law predicts V(n) ≈ K·n^β (β ≈ 0.4-0.6
    for natural text); a flattening curve is the crawl-exhaustion /
    dedup-yield signal at corpus granularity (the statistic Lee et al.
    2022 track across C4 scales). Emitted exactly — fitting K, β is a
    float regression that belongs to the consumer.

    Per bucket: ``(bucket, n_docs, n_tokens, new_types, cum_tokens,
    cum_types)`` where a type is NEW in the bucket holding its
    first-occurrence (minimum) doc_id. All integers. Types are
    ``gram_n``-token shingles, NOT unigrams: the fixture corpus is a
    31-word soup whose unigram curve saturates in bucket 0 (probed —
    new_types = [31, 0, 0, ...], a flat line that pins nothing), while
    the 3-shingle universe keeps growing corpus-wide exactly like the
    dedup tiers' shingle space; gram_n=1 still computes the classical
    word-Heaps curve on a natural corpus.

    Scale: buckets are fixed doc_id RANGES (width = ceil((max_id+1) /
    n_buckets) from a one-row broadcast max — the freqItems-adjudicated
    pattern), NOT an ntile window, so no global ordering of the doc
    frame exists anywhere; per-type min(doc_id) is the one
    key-cardinality shuffle (map-side combined); everything after is
    an ``n_buckets``-row frame and its prefix-sum window."""
    from pyspark.sql import Window

    if n_buckets < 1:
        raise ValueError(f"heaps_law_curve: n_buckets must be >= 1, got {n_buckets}")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
    if gram_n > 1:
        from kinesis_stream_video_project_spark.operators.dedup import (
            shingles_of,
        )

        toked = toked.select(
            "doc_id", shingles_of(F.col("_toks"), gram_n).alias("_toks")
        )
    bound = toked.agg(
        F.expr(f"CAST((MAX(doc_id) + {n_buckets}) DIV {n_buckets} AS BIGINT)")
        .alias("_w")
    )
    # token occurrences with their doc bucket
    occ = (
        toked.crossJoin(F.broadcast(bound))
        .select(
            F.expr("doc_id DIV _w").cast("long").alias("bucket"),
            "doc_id",
            F.explode_outer("_toks").alias("w"),
        )
        .filter(F.col("w").isNotNull() & (F.col("w") != ""))
    )
    per_bucket = occ.groupBy("bucket").agg(
        F.count_distinct("doc_id").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
    )
    first_seen = occ.groupBy("w").agg(F.min("bucket").alias("bucket"))
    new_types = first_seen.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("new_types")
    )
    w_cum = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_bucket.join(new_types, "bucket", "left")
        .select(
            F.col("bucket"),
            "n_docs",
            "n_tokens",
            F.coalesce("new_types", F.lit(0)).cast("long").alias("new_types"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w_cum).cast("long"))
        .withColumn("cum_types", F.sum("new_types").over(w_cum).cast("long"))
    )
