"""Round-6 late additions: characteristic sets, canonical survivor
selection, tf-idf top-k. Semantics pinned on hand-built fixtures; the
sf0.001/sf0.01 oracle parity is covered by tools/check_correctness.py
and the driver gate."""

import pytest
from pyspark.sql import functions as F

from morph_kgc_spark.operators import dedup as D
from morph_kgc_spark.operators import text as T
from morph_kgc_spark.operators.kgstats import characteristic_sets


# --- characteristic_sets ---------------------------------------------------

def test_characteristic_sets_groups_by_sorted_predicate_set(spark):
    triples = spark.createDataFrame(
        [
            ("s1", "p:b", "o"), ("s1", "p:a", "o"),     # cset "p:a p:b"
            ("s2", "p:a", "o1"), ("s2", "p:b", "o2"),   # same cset
            ("s2", "p:a", "o3"),                        # repeat predicate
            ("s3", "p:a", "o"),                         # cset "p:a"
        ],
        "subject string, predicate string, object string")
    out = {r.cset: (r.n_subjects, r.n_triples)
           for r in characteristic_sets(triples).collect()}
    assert out == {"p:a p:b": (2, 5), "p:a": (1, 1)}


def test_characteristic_sets_predicate_order_irrelevant(spark):
    """Sorted cset: insertion order of triples cannot split a group."""
    t1 = spark.createDataFrame([("s", "b", "o"), ("s", "a", "o")],
                               "subject string, predicate string, object string")
    t2 = spark.createDataFrame([("s", "a", "o"), ("s", "b", "o")],
                               "subject string, predicate string, object string")
    c1 = characteristic_sets(t1).collect()[0].cset
    c2 = characteristic_sets(t2).collect()[0].cset
    assert c1 == c2 == "a b"


# --- keep_canonical --------------------------------------------------------

@pytest.fixture()
def linked_docs(spark):
    """Docs 1-2-3 form one transitive cluster (1-2 and 2-3 paired, no
    1-3 pair); 4 is a singleton. Doc 2 has the longest text."""
    docs = spark.createDataFrame(
        [(1, "aa"), (2, "bbbb"), (3, "cc"), (4, "d")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    return docs, pairs


def test_keep_canonical_transitive_cluster_one_survivor(spark, linked_docs):
    docs, pairs = linked_docs
    out = {r.doc_id: r for r in
           D.keep_canonical(docs, pairs, "doc_id",
                            F.length("text")).collect()}
    assert set(out) == {2, 4}                   # longest of {1,2,3}; singleton
    assert out[2].cluster_id == 1 and out[2].cluster_size == 3
    assert out[2].score == 4.0
    assert out[4].cluster_id == 4 and out[4].cluster_size == 1


def test_keep_canonical_min_id_tiebreak(spark):
    docs = spark.createDataFrame([(7, "xx"), (5, "yy")],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(5, 7)], "id_a long, id_b long")
    out = D.keep_canonical(docs, pairs, "doc_id", F.length("text")).collect()
    assert len(out) == 1 and out[0].doc_id == 5   # equal score → min id


# --- tfidf_topk ------------------------------------------------------------

def test_tfidf_topk_ranks_rare_terms_above_stopwords(spark):
    """'the' appears in every doc (idf N/df = 1); each doc's unique term
    outranks it even at equal tf."""
    docs = spark.createDataFrame(
        [(1, "the zebra the"), (2, "the yak"), (3, "the xerus")],
        "doc_id long, text string")
    out = T.tfidf_topk(docs, "doc_id", "text", k=1).collect()
    top = {r.doc_id: r for r in out}
    assert {top[1].term, top[2].term, top[3].term} == {"zebra", "yak", "xerus"}
    # doc 1: zebra tf=1, df=1, N=3 → score 3.0
    assert top[1].score == 3.0 and top[1].tf == 1 and top[1].doc_freq == 1
    assert all(r.rank == 1 for r in out)


def test_tfidf_topk_term_asc_tiebreak_and_k(spark):
    docs = spark.createDataFrame([(1, "b a c"), (2, "q")],
                                 "doc_id long, text string")
    out = [r.term for r in
           T.tfidf_topk(docs, "doc_id", "text", k=2)
            .where(F.col("doc_id") == 1).orderBy("rank").collect()]
    assert out == ["a", "b"]                     # equal scores → term ASC, k=2


# --- quality_gate ----------------------------------------------------------

def test_quality_gate_rules_and_fixed_order(spark):
    """Each rule fires on a crafted doc; multi-violation docs list the
    names in the fixed canonical order."""
    good = "the fox and the hound ran " * 10            # 60 tokens, stops ok
    docs = spark.createDataFrame(
        [
            (1, good.strip()),
            (2, "a b c d e f g h i j"),                 # short words + short doc
            (3, "the " + "identical " * 60 + "of"),     # low unique fraction
            (4, "the quick brown fox jumps over lazy dogs quietly today "
                "and some other words follow here with more varied things "
                "about nature weather mountains rivers forests animals"),
                                                        # clean → keep
            (5, "#!@ $%^ &*( )_+ !!! ??? " * 10 + "the of"),  # symbol soup
        ],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           T.quality_gate(docs, "doc_id", "text", min_tokens=20).collect()}
    assert out[4].keep and out[4].violations == ""
    assert not out[2].keep
    # fixed canonical order (only "a" of the stop set is present → the
    # stopwords rule fires too)
    assert out[2].violations == "mean_word_len,stopwords,word_count"
    assert "unique_fraction" in out[3].violations
    assert "symbol_ratio" in out[5].violations
    # doc 1 repeats 6 words x10 → unique fraction 0.1 < 0.2
    assert out[1].violations == "unique_fraction"


def test_quality_gate_empty_text_no_nan_edge(spark):
    """Empty text must flag deterministically (no NaN/Inf from a 0/0
    ratio — the cross-multiplied comparisons never divide)."""
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    row = T.quality_gate(docs, "doc_id", "text").collect()[0]
    assert not row.keep
    assert "word_count" in row.violations
    assert "stopwords" in row.violations


def test_dup_clusters_empty_pairs_all_singletons(spark):
    """The dup-graph-nodes-only iteration (round-6 rewrite) must still
    emit every id as its own cluster when there are no pairs at all."""
    ids = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = {r.doc_id: r.cluster_id
           for r in D.dup_clusters(ids, pairs, "doc_id").collect()}
    assert out == {1: 1, 2: 2, 3: 3}


# --- code-review regression pins (round-6 session review) -------------------

def test_keep_canonical_null_score_never_wins(spark):
    """Spark struct ordering sorts NULL first — un-coalesced, a NULL
    score would crown the null-scored doc. It must lose instead."""
    docs = spark.createDataFrame([(1, None), (2, "long text")],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    out = D.keep_canonical(docs, pairs, "doc_id", F.length("text")).collect()
    assert len(out) == 1
    assert out[0].doc_id == 2 and out[0].score == 9.0


def test_keep_canonical_all_null_cluster_min_id_null_score(spark):
    docs = spark.createDataFrame([(3, None), (5, None)],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(3, 5)], "id_a long, id_b long")
    out = D.keep_canonical(docs, pairs, "doc_id", F.length("text")).collect()
    assert len(out) == 1
    assert out[0].doc_id == 3 and out[0].score is None


def test_dup_clusters_induced_subgraph_on_ids(spark):
    """Pairs touching ids outside the input set are ignored: one row
    per input id, every cluster_id an input id."""
    ids = spark.createDataFrame([(2,), (3,)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    out = {r.doc_id: r.cluster_id
           for r in D.dup_clusters(ids, pairs, "doc_id").collect()}
    assert out == {2: 2, 3: 2}          # (1,2) dropped; 2-3 still cluster


def test_quality_gate_null_text_rejected(spark):
    """NULL text must gate CLOSED (every rule condition is NULL without
    the coalesce, which silently kept it)."""
    docs = spark.createDataFrame([(1, None), (2, "x y")],
                                 "doc_id long, text string")
    out = {r.doc_id: r for r in
           T.quality_gate(docs, "doc_id", "text").collect()}
    assert not out[1].keep
    assert "word_count" in out[1].violations


def test_quality_gate_ignores_empty_tokens_from_spacing(spark):
    """Doubled/trailing spaces must not mint phantom tokens (29 real
    words + a double space is still 29 words, not 30)."""
    words = " ".join(f"w{i}" for i in range(29))
    docs = spark.createDataFrame(
        [(1, words.replace("w3 w4", "w3  w4") + " ")],
        "doc_id long, text string")
    row = T.quality_gate(docs, "doc_id", "text", min_tokens=30,
                         min_mean_word_len=1.0,
                         min_stopword_hits=0).collect()[0]
    assert "word_count" in row.violations


# --- asof_join ---------------------------------------------------------------

def test_asof_join_semantics(spark):
    """Latest right row at-or-before each left row, per key; inclusive
    bound; NULL columns when nothing precedes."""
    from morph_kgc_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [(10, "2024-01-01 10:00:00", 1),
         (11, "2024-01-01 12:00:00", 1),
         (12, "2024-01-01 09:00:00", 2)],
        "event_id long, ts string, user_id long"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id")
    right = spark.createDataFrame(
        [(100, "2024-01-01 09:30:00", 1, 1.0),
         (101, "2024-01-01 10:00:00", 1, 2.0),   # ties left@10:00 → inclusive
         (102, "2024-01-01 11:00:00", 1, 3.0),
         (103, "2024-01-01 23:00:00", 2, 4.0)],  # after left@09:00 → no match
        "event_id long, ts string, user_id long, value double"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "value")
    out = {r.event_id: r for r in
           asof_join(left, right, "user_id").collect()}
    assert out[10].asof_event_id == 101 and out[10].asof_value == 2.0
    assert out[11].asof_event_id == 102
    assert out[12].asof_event_id is None and out[12].asof_ts is None


def test_asof_join_tie_dedup_deterministic(spark):
    """Two right rows at the same (key, ts): the struct-max winner
    (greatest event_id) is matched, deterministically."""
    from morph_kgc_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7)],
        "event_id long, ts string, user_id long"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id")
    right = spark.createDataFrame(
        [(50, "2024-01-01 09:00:00", 7, 5.0),
         (51, "2024-01-01 09:00:00", 7, 6.0)],
        "event_id long, ts string, user_id long, value double"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP) ts", "user_id", "value")
    row = asof_join(left, right, "user_id").collect()[0]
    assert row.asof_event_id == 51


# --- void_property_partition ------------------------------------------------

def test_void_property_partition_counts(spark):
    from morph_kgc_spark.operators.kgstats import void_property_partition
    triples = spark.createDataFrame(
        [
            ("s1", "p:a", "o1"), ("s1", "p:a", "o1"),  # duplicate triple
            ("s2", "p:a", "o2"),
            ("s1", "p:b", "o1"),
        ],
        "subject string, predicate string, object string")
    out = {r.predicate: (r.n_triples, r.n_subjects, r.n_objects)
           for r in void_property_partition(triples).collect()}
    # p:a carries 3 triples over 2 subjects and 2 distinct objects
    assert out == {"p:a": (3, 2, 2), "p:b": (1, 1, 1)}


def test_void_property_partition_single_aggregate(spark):
    """One multi-distinct aggregate: the optimized plan has exactly one
    logical Aggregate chain (Expand-based), no join or window."""
    from morph_kgc_spark.operators.kgstats import void_property_partition
    triples = spark.createDataFrame(
        [("s", "p", "o")], "subject string, predicate string, object string")
    plan = void_property_partition(triples)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "Join" not in plan and "Window" not in plan


# --- quality_classifier ------------------------------------------------------

def test_quality_classifier_weight_math_pinned(spark):
    """Replay the exact weight formula driver-side for one doc: features
    are unigrams + bigrams, weight = (h64 % 4096)*MIX % 1999 - 999."""
    import hashlib
    from morph_kgc_spark.operators.text import (
        CLASSIFIER_BUCKETS, CLASSIFIER_MIX, CLASSIFIER_MOD)

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def w(f):
        return (h64(f) % CLASSIFIER_BUCKETS) * CLASSIFIER_MIX \
            % CLASSIFIER_MOD - (CLASSIFIER_MOD - 1) // 2

    text = "the cat sat"
    feats = ["the", "cat", "sat", "the cat", "cat sat"]
    expected = sum(w(f) for f in feats)
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    row = T.quality_classifier(df, "doc_id", "text").collect()[0]
    assert row.n_features == 5
    assert row.score_sum == expected
    assert row.keep == (expected >= 0)


def test_quality_classifier_null_and_spacing(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a  b")],  # doubled space → no phantom token
        "doc_id int, text string")
    out = {r.doc_id: r for r in
           T.quality_classifier(df, "doc_id", "text").collect()}
    assert out[1].n_features == 0 and out[1].score_sum == 0 and not out[1].keep
    assert out[2].n_features == 0 and not out[2].keep
    # "a  b" → tokens [a, b] (empty dropped) + bigram "a b" = 3 features
    assert out[3].n_features == 3


def test_quality_classifier_one_exchange(spark):
    """explode_outer → one doc-keyed aggregate reusing the scan-
    parallelism exchange: exactly ONE Exchange, no join/window, and the
    md5 lives in the projection (codegen), not a transform lambda."""
    df = spark.createDataFrame([(1, "x y")], "doc_id int, text string")
    plan = T.quality_classifier(df, "doc_id", "text")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Exchange") == 1
    # the md5 weight must be a Project over the exploded stream
    # (codegen), never inside a transform/aggregate lambda body
    md5_lines = [ln for ln in plan.splitlines() if "md5" in ln]
    assert md5_lines and all(ln.lstrip().startswith(("+- Project", "Project"))
                             for ln in md5_lines)


# --- incremental_dedup --------------------------------------------------------

def _inc_fixture(spark):
    idx = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "an entirely different document about spark pipelines")],
        "doc_id long, text string")
    # 10 = exact dup of idx 1, 11 = unique, 12 = empty text
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog today"),
         (11, "completely novel content never seen in the corpus before"),
         (12, "")],
        "doc_id long, text string")
    return idx, batch


def test_incremental_dedup_drops_corpus_dups(spark):
    idx, batch = _inc_fixture(spark)
    out = sorted(r.doc_id for r in
                 D.incremental_dedup(idx, batch, "doc_id", "text").collect())
    assert out == [11, 12]  # 10 collides with 1; empty text survives


def test_incremental_dedup_is_batch_vs_index_only(spark):
    """Two identical docs WITHIN the batch are not each other's dup here
    — within-batch dedup is minhash_lsh_pairs' job."""
    idx = spark.createDataFrame([(1, "unrelated corpus doc")],
                                "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "twin text inside the same batch only"),
         (11, "twin text inside the same batch only")],
        "doc_id long, text string")
    out = sorted(r.doc_id for r in
                 D.incremental_dedup(idx, batch, "doc_id", "text").collect())
    assert out == [10, 11]


def test_incremental_dedup_never_smj_over_index(spark):
    """The corpus stream must be probed via broadcast joins — a sort-
    merge join here would shuffle the whole index per batch."""
    idx, batch = _inc_fixture(spark)
    plan = D.incremental_dedup(idx, batch, "doc_id", "text")._jdf \
        .queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


# --- ngram_counts_topk / length_histogram -------------------------------------

def test_ngram_counts_multiplicity_and_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b x")],  # "a b": 2 occurrences doc1 + 1 doc2
        "doc_id int, text string")
    out = {r.gram: (r.n_occurrences, r.n_docs, r.rank)
           for r in T.ngram_counts_topk(df, "doc_id", "text", k=2).collect()}
    assert out["a b"] == (3, 2, 1)
    # "b a" and "b x" both occur once; tie broken gram ASC → "b a" wins k=2
    assert out["b a"] == (1, 1, 2)
    assert "b x" not in out


def test_ngram_counts_tiebreak_gram_asc(spark):
    df = spark.createDataFrame([(1, "z y"), (2, "a b")],
                               "doc_id int, text string")
    rows = T.ngram_counts_topk(df, "doc_id", "text", k=2).collect()
    assert [(r.gram, r.rank) for r in rows] == [("a b", 1), ("z y", 2)]


def test_length_histogram_buckets(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "a b c"), (4, "a b"), (5, None)],
        "doc_id int, text string")
    out = {r.bucket_lo: (r.bucket_hi, r.n_docs, r.total_tokens)
           for r in T.length_histogram(df, "doc_id", "text").collect()}
    # empty + NULL → [0,0]; 1 token → [1,1]; 2 and 3 tokens → [2,3]
    assert out == {0: (0, 2, 0), 1: (1, 1, 1), 2: (3, 2, 5)}


def test_length_histogram_power_of_two_boundary(spark):
    """Docs of exactly 2^i tokens land in [2^i, ...], not below —
    the libm-log2 edge the integer bucket avoids."""
    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 8)), (2, " ".join(["w"] * 7))],
        "doc_id int, text string")
    out = {r.bucket_lo for r in
           T.length_histogram(df, "doc_id", "text").collect()}
    assert out == {8, 4}


def test_void_class_partition_multi_class(spark):
    from morph_kgc_spark.operators.kgstats import void_class_partition
    t = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
    triples = spark.createDataFrame(
        [("s1", t, "<C1>"), ("s1", t, "<C1>"),   # duplicate assertion
         ("s2", t, "<C1>"), ("s3", t, "<C2>"),
         ("s1", "<p>", "<C9>")],                  # non-type triple ignored
        "subject string, predicate string, object string")
    out = {getattr(r, "class"): (r.n_triples, r.n_entities)
           for r in void_class_partition(triples).collect()}
    assert out == {"<C1>": (3, 2), "<C2>": (1, 1)}


def test_ngram_counts_topk_is_takeordered(spark):
    """The global top-k must execute as TakeOrdered (O(k) per
    partition), never a full vocabulary sort."""
    df = spark.createDataFrame([(1, "a b c"), (2, "b c d")],
                               "doc_id int, text string")
    plan = T.ngram_counts_topk(df, "doc_id", "text", k=3)._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_length_histogram_single_aggregate_no_join(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
    plan = T.length_histogram(df, "doc_id", "text")._jdf \
        .queryExecution().optimizedPlan().toString()
    assert "Join" not in plan and "Window" not in plan
    assert plan.count("Aggregate") == 1  # one logical aggregate chain


def test_length_quantiles_exact_interpolation(spark):
    """percentile is the exact lo + (hi-lo)*frac interpolation over
    sorted per-doc token counts — pinned against a hand computation."""
    df = spark.createDataFrame(
        [(i, "en", " ".join(["w"] * n)) for i, n in
         enumerate([1, 2, 3, 4, 10])] + [(9, "fr", "a b")],
        "doc_id long, lang string, text string")
    out = {r.lang: r for r in
           T.length_quantiles(df, "doc_id", "text", "lang").collect()}
    en = out["en"]
    # sorted [1,2,3,4,10]: p50 idx 2 -> 3; p90 idx 0.9*(5-1) -> between
    # 4 and 10 — computed with the engine's own float steps (0.9*(n-1)
    # is not exactly 3.6 in IEEE; the replay must use identical ops)
    assert en.n_docs == 5 and en.p50_tokens == 3.0
    idx = 0.9 * (5 - 1)
    frac = idx - int(idx)
    assert en.p90_tokens == 4 + frac * (10 - 4)
    assert en.max_tokens == 10
    assert out["fr"].p50_tokens == 2.0 and out["fr"].n_docs == 1


def test_funnel_requires_stage_order(spark):
    """A click BEFORE the user's first view must not advance the
    funnel; equal timestamps count (at-or-after semantics)."""
    import datetime as dt
    t = lambda m: dt.datetime(2026, 1, 1, 12, m)  # noqa: E731
    rows = [
        # u1: view@1 → click@2 → purchase@3: reaches all stages
        (1, 1, t(1), "view"), (2, 1, t(2), "click"), (3, 1, t(3), "purchase"),
        # u2: click@1 BEFORE view@2 → click never qualifies
        (4, 2, t(1), "click"), (5, 2, t(2), "view"),
        # u3: view and click at the SAME minute → qualifies (>=)
        (6, 3, t(5), "view"), (7, 3, t(5), "click"),
        # u4: purchase without click → stops at view
        (8, 4, t(1), "view"), (9, 4, t(2), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string")
    from morph_kgc_spark.operators.events import funnel
    out = {r.stage: r.n_users for r in funnel(df).collect()}
    assert out == {"view": 4, "click": 2, "purchase": 1}
