"""Text-analysis operators for training-data pipelines.

All pure Column expressions (whole-stage codegen; no UDFs): token
counting, n-gram extraction, language-ID heuristic, quality scoring, and a
position-weighted document fingerprint. Each has an exact DuckDB SQL twin
in :mod:`morph_kgc_spark.oracles` built from the same constants.

Scale: every operator is per-row (embarrassingly parallel, no shuffle);
the expensive ones (n-grams) stay inside higher-order array functions so
nothing leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from morph_kgc_spark.functions.hashing import P31, h64

# tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic; deterministic and mirrored into the DuckDB oracle.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "mit"),
    "en": ("the", "a", "of", "and", "to", "is"),
    "es": ("el", "la", "de", "que", "y", "en"),
    "fr": ("le", "la", "les", "de", "et", "un"),
    "zh": ("de", "shi", "bu", "le", "zai", "you"),
}


# logical-plan node classes that imply a shuffle/ordering stage: their
# output partitioning is already cluster-wide (or AQE-managed), so the
# narrow-scan repartition guard must not probe (or repartition) them
_WIDE_PLAN_NODES = frozenset({
    "Join", "Aggregate", "Window", "Sort", "Distinct", "Deduplicate",
    "DeduplicateWithinWatermark", "Repartition", "RepartitionByExpression",
    "RebalancePartitions", "GlobalLimit", "LocalLimit", "Intersect",
    "Except", "CoGroup", "FlatMapGroupsInPandas", "MapInPandas",
})


def _plan_has_wide_node(jplan) -> bool:
    """True if the analyzed logical plan contains a shuffle-implying
    node anywhere in its tree — exact match on node CLASS names, walked
    via the JVM tree's children, never the pretty-printed string."""
    stack = [jplan]
    while stack:
        node = stack.pop()
        if node.getClass().getSimpleName() in _WIDE_PLAN_NODES:
            return True
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return False


def _parallelize_narrow(df: DataFrame, key: str | None = None) -> DataFrame:
    """Repartition a scan that is narrower than the cluster.

    The heavy per-row work downstream (tokenize → n-gram → hash) is CPU
    bound; a small corpus arriving as one parquet file is ONE partition,
    so that work runs single-threaded no matter how many cores exist —
    AQE cannot help because the scan partitioning is fixed upstream of
    any shuffle. At real scale the input has thousands of file splits
    (≥ parallelism) and this is a NO-OP — the repartition shuffle is
    only paid when the input is small enough for it to be trivial.

    With ``key`` the repartition is HASH(key) instead of round-robin:
    a downstream groupBy(key) then reuses the partitioning and skips
    its own exchange — the parallelize shuffle does double duty.
    """
    if df.isStreaming:  # .rdd is illegal on streams; micro-batches
        return df       # inherit the source's own parallelism
    try:
        # only probe partition counts for SCAN-shaped inputs: under AQE,
        # df.rdd on a plan with exchanges EXECUTES those upstream stages
        # in a throwaway QueryExecution (the later real action does not
        # reuse them). For joins/aggregates the input is already
        # shuffle-partitioned to cluster width — the guard is moot there.
        # The check walks the analyzed tree's NODE CLASSES (a substring
        # probe of the pretty-printed plan false-positives on relation/
        # column names containing 'Join' etc. — round-4 advice).
        if _plan_has_wide_node(df._jdf.queryExecution().analyzed()):
            return df
    except Exception:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key) if key else df.repartition(target)
    return df


def tokens(col: Column) -> Column:
    """Whitespace tokenization (single-space split; pre-cleaned corpora)."""
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_ngrams(tok: Column, n: int) -> Column:
    """Word n-grams via 1-based element_at; empty array when too short.

    sequence(1, k) is guarded because Spark's sequence(1, 0) counts *down*.
    """
    k = F.size(tok) - (n - 1)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tok, i + j) for j in range(n)]
    )
    return F.when(k >= 1, F.transform(F.sequence(F.lit(1), k), gram)) \
            .otherwise(F.array().cast("array<string>"))


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, n_chars, mean_token_len) — no shuffle.

    mean token length is computed as non-space-chars / tokens (exact
    integer arithmetic → bit-identical across engines).
    """
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    n_char = F.length(F.col(text_col))
    non_space = F.length(F.replace(F.col(text_col), F.lit(" "), F.lit("")))
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        n_char.alias("n_chars"),
        F.round(non_space.cast("double") / n_tok.cast("double"), 6).alias("mean_token_len"),
    )


def quality_gate(df: DataFrame, id_col: str, text_col: str, *,
                 min_tokens: int = 50, max_tokens: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 min_unique_fraction: float = 0.2,
                 min_stopword_hits: int = 2) -> DataFrame:
    """Gopher-style composite quality FILTER: per-document keep/reject
    with the violated rule names, the gate a training-data pipeline
    runs after language ID and before dedup (Rae et al. 2021 §A1.1's
    rule family — word-count bounds, mean-word-length bounds, symbol
    ratio, duplicate-token fraction, stop-word presence).

    Output: (id, keep boolean, violations string) — ``violations`` is
    a comma-joined FIXED-ORDER list (mean_word_len, stopwords,
    symbol_ratio, unique_fraction, word_count), empty when kept, so
    rejection REASONS are auditable (a bare boolean hides why a corpus
    shrank).

    Engine-exactness: every ratio rule is compared CROSS-MULTIPLIED
    (``symbols > ratio × chars`` instead of ``symbols/chars > ratio``)
    — integer-times-double products, no division, so no NaN/Inf edge on
    empty documents and no libm divergence. The stop-word set is
    ``LANG_PROFILES['en']``, the same constant the oracle generators
    render. Zero shuffle: one narrow projection, all codegen.

    Degenerate inputs gate CLOSED: NULL text is treated as empty (a
    gate that answers keep=true for NULL — which every un-coalesced
    rule condition would, all WHENs evaluating to NULL — passes exactly
    the one document class that is unambiguously junk), and empty
    tokens from doubled/leading/trailing spaces are dropped before
    counting (matching :func:`tfidf_topk`; they would otherwise inflate
    n_tok/uniq and drag the mean word length).
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    t = F.filter(tokens(txt), lambda x: x != "")
    n_tok = F.size(t)
    non_space = F.length(F.replace(txt, F.lit(" "), F.lit("")))
    uniq = F.size(F.array_distinct(t))
    n_chars = F.length(txt)
    symbols = F.regexp_count(txt, F.lit("[^A-Za-z0-9 ]"))
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(t),
        F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])))

    def viol(cond, name):
        return F.when(cond, F.lit(name))

    violations = F.concat_ws(
        ",",
        viol((non_space < F.lit(min_mean_word_len) * n_tok)
             | (non_space > F.lit(max_mean_word_len) * n_tok),
             "mean_word_len"),
        viol(stop_hits < min_stopword_hits, "stopwords"),
        viol(symbols > F.lit(max_symbol_ratio) * n_chars, "symbol_ratio"),
        viol(uniq < F.lit(min_unique_fraction) * n_tok, "unique_fraction"),
        viol((n_tok < min_tokens) | (n_tok > max_tokens), "word_count"),
    )
    return df.select(
        F.col(id_col),
        (violations == "").alias("keep"),
        violations.alias("violations"),
    )


def tfidf_topk(df: DataFrame, id_col: str, text_col: str,
               k: int = 3) -> DataFrame:
    """Top-k most informative terms per document by tf·idf with a
    LINEAR inverse-document-frequency weight: score = tf × N / df.

    The linear idf (not log) is deliberate: tf, N and df are integers,
    so the score is one exact integer product and one IEEE-754 division
    — bit-identical in any engine — where ``ln`` would make the ranking
    depend on libm rounding at ties. The ranking it induces is the
    classic tf-idf family's (idf is any monotone decreasing function of
    df); ties break on term ASC so the top-k set is deterministic.

    Output: (id, term, tf, doc_freq, score, rank), rank 1..k.

    Scale shape: explode → one (id, term) aggregate (map-side
    combinable; output bounded by Σ distinct-terms-per-doc), a term
    aggregate over THAT (output = vocabulary size), a term-keyed join
    back (hash join; vocabulary side is the small one and broadcasts
    under AQE at real scale), and one window partitioned by doc id
    whose partitions are per-doc term lists — never corpus-scale. The
    corpus count enters as a 1-row cross join (broadcast nested loop),
    not a driver-side ``.count()``, so everything stays in one DAG.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    ).where(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col), "term", "tf", "doc_freq",
            (F.col("tf").cast("double") * F.col("n_docs") / F.col("doc_freq"))
            .alias("__s"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("__s").desc(),
                                           F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col(id_col), "term", "tf", "doc_freq",
                F.round("__s", 6).alias("score"), "rank")
    )


def ngram_counts_topk(df: DataFrame, id_col: str, text_col: str, *,
                      n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-level n-gram frequency top-k — the count-based LM /
    corpus-statistics table (what a boilerplate detector, a stop-list
    builder, or an n-gram LM trains from). Occurrences count WITH
    multiplicity (unlike the dedup shingle stream, which dedups
    per-doc) plus the number of distinct docs carrying the gram.

    Output: (gram, n_occurrences, n_docs, rank), rank 1..k by count
    desc with gram ASC tiebreak — deterministic top-k set.

    Scale shape: explode → per-(doc, gram) aggregate → per-gram
    aggregate, all whole-stage-codegen with map-side partial combine
    (the same chain as :func:`tfidf_topk`'s tf/df legs; after the first
    aggregate each row is one (doc, gram), so a plain ``count(*)`` IS
    the distinct-doc count — no Expand, no countDistinct). Tokens and
    grams are materialized in separate projections and the explode is
    ``explode_outer`` + null filter — the two Catalyst traps
    (transform-lambda re-splitting, InferFiltersFromGenerate) that
    :func:`~morph_kgc_spark.operators.dedup.shingle_arrays` /
    :func:`~morph_kgc_spark.operators.dedup.shingles` document as
    measured 20×. The (doc, gram) aggregate reuses the hash(id)
    scan-parallelism exchange (a subset of its clustering keys). The
    global top-k is a sort-limit Spark executes as TakeOrdered: O(k)
    state per partition + a k-row singleton reduce, never a full
    vocabulary sort; the final rank numbering windows over exactly
    k rows.
    """
    from pyspark.sql import Window

    tok = _parallelize_narrow(df, key=id_col).select(
        F.col(id_col),
        F.filter(tokens(F.coalesce(F.col(text_col), F.lit(""))),
                 lambda x: x != "").alias("__tok"),
    )
    grams = tok.select(F.col(id_col),
                       word_ngrams(F.col("__tok"), n).alias("__grams"))
    per_doc = (grams.select(F.col(id_col),
                            F.explode_outer("__grams").alias("gram"))
               .where(F.col("gram").isNotNull())
               .groupBy(id_col, "gram")
               .agg(F.count(F.lit(1)).alias("tf")))
    agg = per_doc.groupBy("gram").agg(
        F.sum("tf").alias("n_occurrences"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
    return (agg
            .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
            .limit(k)
            .withColumn("rank", F.row_number().over(w)))


def length_histogram(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token-length histogram in power-of-two buckets — the table a
    training pipeline reads before choosing context length, packing
    strategy, and per-bucket sampling rates (how much of the corpus is
    short-tail vs long-document).

    Output: (bucket_lo, bucket_hi, n_docs, total_tokens) with bucket
    [2^i, 2^(i+1)) for i ≥ 0 and a dedicated [0, 0] bucket for empty
    docs. The bucket index is ``length(bin(n)) − 1`` — integer-exact
    floor(log2) via the binary-string length, no libm ``log2`` whose
    rounding could flip a doc at a power-of-two boundary between
    engines.

    Scale shape: one narrow projection + one aggregate whose key
    cardinality is ~64 (map-side combine leaves a few dozen rows per
    partition); the exchange is negligible at any corpus size.

    ``id_col`` is accepted for signature uniformity with the sibling
    per-document operators but unused: the output is corpus-level (no
    per-document rows), so no id can appear in it (round-7 ADVICE,
    text.py:301 — documented rather than dropped to keep every
    text-operator call shape identical).
    """
    t = F.filter(tokens(F.coalesce(F.col(text_col), F.lit(""))),
                 lambda x: x != "")
    ntok = F.size(t).cast("long")
    # shiftleft's bit count must be a Column here → SQL-expr form
    # (python F.shiftleft only accepts a literal int)
    lo = F.when(F.col("__n") == 0, F.lit(0).cast("long")).otherwise(
        F.expr("shiftleft(CAST(1 AS BIGINT), length(bin(__n)) - 1)"))
    return (df.select(ntok.alias("__n"))
            .select(lo.alias("bucket_lo"), F.col("__n"))
            .groupBy("bucket_lo")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("__n").alias("total_tokens"))
            .select("bucket_lo",
                    F.when(F.col("bucket_lo") == 0, F.lit(0).cast("long"))
                     .otherwise(F.col("bucket_lo") * 2 - 1)
                     .alias("bucket_hi"),
                    "n_docs", "total_tokens"))


def length_quantiles(df: DataFrame, id_col: str, text_col: str,
                     group_col: str = "lang") -> DataFrame:
    """EXACT token-length quantiles per group (p25/p50/p90 + max) —
    the per-language corpus-composition table behind context-length
    and sampling-temperature choices.

    Exact interpolated percentiles, not approx_percentile: sketches
    (GK/t-digest) are engine-specific and would never hash-match an
    oracle, and exactness is CHEAP here because the aggregated value
    domain — token counts — is tiny (thousands of distinct lengths)
    regardless of corpus size, so the per-group value-count state the
    exact aggregate carries is bounded by the domain, not the corpus.
    Both engines compute lo + (hi − lo)·frac over the sorted domain in
    IEEE doubles → bit-identical (pinned by the oracle hash). One
    map-side-combinable aggregate; group cardinality = languages.

    ``id_col`` is accepted for signature uniformity with the sibling
    per-document operators but unused: the output is one row per
    ``group_col`` value (see length_histogram's matching note).
    """
    t = F.filter(tokens(F.coalesce(F.col(text_col), F.lit(""))),
                 lambda x: x != "")
    g = df.select(F.col(group_col), F.size(t).cast("long").alias("__n"))
    return g.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("percentile(__n, 0.25)").alias("p25_tokens"),
        F.expr("percentile(__n, 0.5)").alias("p50_tokens"),
        F.expr("percentile(__n, 0.9)").alias("p90_tokens"),
        F.max("__n").alias("max_tokens"),
    )


# GPT-2-style pretokenizer, simplified to syntax that means the same in
# Java regex (Spark) and RE2 (DuckDB): contractions, space-prefixed
# letter runs, digit runs, other-symbol runs. (The original uses \p{L}
# with lookahead; lookahead is dropped — trailing spaces fold into the
# next token — and the class set is explicit ASCII+Latin-1.)
BPE_TOKEN_RE = (r"'s|'t|'re|'ve|'m|'ll|'d"
                r"| ?[A-Za-zÀ-ÿ]+| ?[0-9]+"
                r"| ?[^A-Za-zÀ-ÿ0-9 ]+")


def bpe_token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_bpe_tokens, n_ws_tokens): BPE-ish pretoken count next to the
    whitespace count — the cost estimator a training-data pipeline uses
    to budget documents before real tokenization. Pure codegen
    (regexp_count), no shuffle."""
    return df.select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_RE))
         .cast("long").alias("n_bpe_tokens"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_ws_tokens"),
    )


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-profile language ID: argmax of per-language hit counts,
    alphabetical tie-break. (id, pred_lang, score).

    The per-language scores are MATERIALIZED in their own projection
    before the argmax: building the running-max as one nested ``when``
    expression embeds the previous best twice per step, so the filter
    lambdas get duplicated 2^|langs| times (measured ~1.7 s for 5k docs
    — this zero-shuffle op was slower than the shuffled aggregations).
    Over column attributes the argmax whens are free.
    """
    langs = sorted(LANG_PROFILES)  # alphabetical tie-break
    tok = _parallelize_narrow(df).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__tok"))

    def _hits(words):
        # closure factory: a 2-arg lambda would receive (element, index)
        return lambda x: x.isin(*words)

    scored = tok.select(F.col(id_col), *[
        F.size(F.filter(F.col("__tok"), _hits(LANG_PROFILES[lang])))
        .alias(f"__s_{lang}")
        for lang in langs
    ])
    best = F.col(f"__s_{langs[0]}")
    pred = F.lit(langs[0])
    for lang in langs[1:]:
        is_better = F.col(f"__s_{lang}") > best
        pred = F.when(is_better, F.lit(lang)).otherwise(pred)
        best = F.when(is_better, F.col(f"__s_{lang}")).otherwise(best)
    return scored.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        best.cast("long").alias("score"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Composite quality heuristic in [0,1]:
    0.3·min(1, tokens/100) + 0.4·uniq_ratio + 0.3·min(1, mean_len/8).
    """
    t = tokens(F.col(text_col))
    n_tok = F.size(t).cast("double")
    uniq = F.size(F.array_distinct(t)).cast("double")
    non_space = F.length(F.replace(F.col(text_col), F.lit(" "), F.lit(""))).cast("double")
    mean_len = non_space / n_tok
    score = (
        0.3 * F.least(F.lit(1.0), n_tok / F.lit(100.0))
        + 0.4 * (uniq / n_tok)
        + 0.3 * F.least(F.lit(1.0), mean_len / F.lit(8.0))
    )
    return df.select(F.col(id_col), F.round(score, 6).alias("quality"))


def _top_run_count(arr: Column) -> Column:
    """Count of the most frequent element of ``arr`` (the mode's
    multiplicity), computed ROW-LOCALLY: sort the array, then ONE
    ``aggregate`` pass tracks (previous element, current run, best run).
    Zero shuffle — the alternative (explode + groupBy(id, gram) + max)
    moves the whole gram stream through an exchange to compute what is
    a per-row statistic. Returns 0 for an empty array.

    Round 7: the previous formulation CAPTURED ``array_sort(arr)``
    inside a filter lambda's element predicate — Catalyst does no CSE
    inside lambdas (the trap :func:`~morph_kgc_spark.operators.dedup.
    shingle_arrays` documents), so the sort re-ran per element:
    O(n² log n) per row, measured 2.18 s of the operator's 2.2 s at
    sf0.1. The aggregate's input array is evaluated ONCE per row and
    iterated: O(n log n) per row total, measured ~12×."""
    s = F.array_sort(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        # x == NULL-prev is NULL → otherwise(1): the first element
        # always opens a run of 1
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    return F.aggregate(s, init, step, lambda acc: acc["best"])


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, adapted
    to the whitespace-token corpus): per doc,

    - ``dup_token_frac``   = 1 − distinct_tokens / n_tokens
    - ``top_bigram_frac``  = count of the most frequent word 2-gram
      over the number of 2-grams
    - ``dup_trigram_frac`` = 1 − distinct 3-grams / n_3-grams

    High values flag boilerplate/spam for curation filters. Everything
    is row-local array math (``array_distinct`` + sorted-run mode) —
    at 100 TB this is a pure map over the corpus: no exchange, no
    explode, partitions stream through whole-stage-codegen projections
    plus bounded per-row lambda work. Fractions are 0.0 for docs too
    short to form the n-gram.
    """
    tok_df = _parallelize_narrow(df, id_col).select(
        F.col(id_col), tokens(F.col(text_col)).alias("__tok"))
    # materialize gram arrays in their own projection: Catalyst does no
    # CSE inside lambdas, so inlining would re-derive them per use
    g = tok_df.select(
        F.col(id_col),
        F.col("__tok").alias("t1"),
        word_ngrams(F.col("__tok"), 2).alias("t2"),
        word_ngrams(F.col("__tok"), 3).alias("t3"),
    )

    def _dup_frac(arr: Column) -> Column:
        n = F.size(arr).cast("double")
        return F.when(
            n > 0,
            F.round(F.lit(1.0)
                    - F.size(F.array_distinct(arr)).cast("double") / n, 6),
        ).otherwise(F.lit(0.0))

    n2 = F.size("t2").cast("double")
    top2 = F.when(
        n2 > 0,
        F.round(_top_run_count(F.col("t2")).cast("double") / n2, 6),
    ).otherwise(F.lit(0.0))
    return g.select(
        F.col(id_col),
        _dup_frac(F.col("t1")).alias("dup_token_frac"),
        top2.alias("top_bigram_frac"),
        _dup_frac(F.col("t3")).alias("dup_trigram_frac"),
    )


CLASSIFIER_BUCKETS = 4096
CLASSIFIER_MIX = 2654435761  # Knuth multiplicative constant
CLASSIFIER_MOD = 1999        # prime → weights spread over [-999, 999]


def quality_classifier(df: DataFrame, id_col: str, text_col: str, *,
                       buckets: int = CLASSIFIER_BUCKETS) -> DataFrame:
    """Linear bag-of-hashed-ngrams quality score — the fastText-shaped
    "model-based filtering" stage modern pipelines run after the rule
    gates (GPT-3's LR filter, CCNet's fastText stage): features are
    unigrams + word bigrams hashed into ``buckets``, the score is the
    sum of per-bucket weights, keep = non-negative score.

    The weight table is DETERMINISTIC — weight(b) = (b·MIX) mod 1999 −
    999 — standing in for trained parameters so the whole operator is
    integer-exact and oracle-replayable; swapping in a real table is a
    broadcast join or a literal array, same plan shape. All math stays
    in int64 (max |b·MIX| ≈ 1.1e13), no floats, no libm: the score a
    1000-executor cluster computes is bit-identical to DuckDB's.

    Output: (id, n_features int, score_sum long, keep boolean).
    NULL text → 0 features, score 0, keep=false (gate closed, matching
    :func:`quality_gate`); empty tokens from doubled spaces are
    dropped. Tokens are hashed case-sensitively — lowercase upstream if
    desired (Java vs DuckDB Unicode case-folding differ on exotic
    codepoints, so the operator does not fold for you).

    Scale shape: tokens and features are MATERIALIZED in separate
    projections (Catalyst does no CSE inside transform() lambdas —
    inlining the token filter into word_ngrams would re-split the text
    per element_at, the O(tokens²) trap :func:`~morph_kgc_spark.
    operators.dedup.shingle_arrays` documents), then ``explode_outer``
    (a plain explode lets InferFiltersFromGenerate push an interpreted
    size()>0 filter below the projections — same file, same measured
    20×) feeds ONE map-side-combinable aggregate keyed on the doc id,
    with the md5 evaluated in whole-stage codegen on the exploded
    stream — the formulation :func:`~morph_kgc_spark.operators.dedup.
    minhash_signatures` measured ~8× faster than interpreted
    per-element lambda hashing. The scan-parallelism repartition keys
    on the doc id, so the aggregate reuses that exchange
    (hash(id) satisfies the (id) clustering): one exchange total.
    """
    from morph_kgc_spark.functions.hashing import h64_spark_sql

    tok = _parallelize_narrow(df, key=id_col).select(
        F.col(id_col),
        F.filter(tokens(F.coalesce(F.col(text_col), F.lit(""))),
                 lambda x: x != "").alias("__tok"),
    )
    feats = tok.select(
        F.col(id_col),
        F.concat(F.col("__tok"),
                 word_ngrams(F.col("__tok"), 2)).alias("__feats"),
    )
    half = (CLASSIFIER_MOD - 1) // 2
    weight = F.expr(
        f"({h64_spark_sql('feat')} % {buckets}) * {CLASSIFIER_MIX}"
        f" % {CLASSIFIER_MOD} - {half}")
    ex = (feats.select(F.col(id_col), F.explode_outer("__feats").alias("feat"))
          .select(F.col(id_col), F.col("feat"), weight.alias("__w")))
    n = F.count("feat")       # ignores the NULL the outer explode emits
    score = F.coalesce(F.sum("__w"), F.lit(0).cast("long"))
    return ex.groupBy(id_col).agg(
        n.cast("int").alias("n_features"),
        score.alias("score_sum"),
        ((n > 0) & (score >= 0)).alias("keep"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Position-weighted rolling document fingerprint mod P31.

    fp = (Σ_i (h64(token_i) % P) · i) % P  (i 1-based) — identical
    arithmetic to the oracle (modular addition is order-independent, so
    the per-step and whole-sum mod agree). Computed as ONE posexplode +
    codegen hash-aggregate: the previous per-row array-lambda form
    embedded split(text) inside the lambda (re-split per element,
    O(tokens²)) and ran md5 interpreted — measured ~1.5 s for 5k docs
    vs this plan's sub-second single shuffle; terms stay < 2^51 before
    the final mod for any realistic doc, so the sum cannot overflow.
    """
    # posexplode_outer WITHOUT a not-null filter: a NULL text yields one
    # (null, null) row, keeping the doc's GROUP alive so it fingerprints
    # to 0 (the array-lambda formulation's behavior) instead of silently
    # vanishing from the output; split() never returns an empty array,
    # so no real token is ever null
    pe = _parallelize_narrow(df, id_col).select(
        F.col(id_col),
        F.posexplode_outer(tokens(F.col(text_col))).alias("__pos", "__tok"),
    )
    term = (h64(F.col("__tok")) % F.lit(P31)) \
        * (F.col("__pos") + 1).cast("long") % F.lit(P31)
    return (pe.groupBy(id_col)
            .agg(F.coalesce(F.sum(term) % F.lit(P31),
                            F.lit(0).cast("long")).alias("fingerprint")))


# PII patterns shared with the DuckDB oracle — restricted to syntax that
# means the same thing in Java regex and RE2 (no backrefs, no lookaround,
# explicit classes only)
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_LONG_DIGITS_RE = r"\+?[0-9][0-9 ()+.-]{7,}[0-9]"
PII_EMAIL_TOKEN = "<EMAIL>"
PII_NUMBER_TOKEN = "<NUMBER>"


def scrub_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, clean_text, n_emails, n_numbers) — PII masking for
    training-data hygiene, zero shuffle, pure codegen regex.

    Emails are masked first (their local parts often contain digits that
    the number pattern would otherwise split), then long digit runs
    (phones / card-ish sequences). Counts are emitted so a pipeline can
    route high-PII documents to quarantine instead of training.
    """
    text = F.col(text_col)
    n_emails = F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_RE), F.lit(0)))
    no_email = F.regexp_replace(text, PII_EMAIL_RE, PII_EMAIL_TOKEN)
    n_numbers = F.size(F.regexp_extract_all(no_email,
                                            F.lit(PII_LONG_DIGITS_RE), F.lit(0)))
    clean = F.regexp_replace(no_email, PII_LONG_DIGITS_RE, PII_NUMBER_TOKEN)
    return df.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_emails.alias("n_emails"),
        n_numbers.alias("n_numbers"),
    )
