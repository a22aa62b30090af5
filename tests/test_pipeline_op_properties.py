"""Property tests: the round-6 pipeline operators must match a pure-
python replay of their documented semantics on arbitrary corpora —
including whitespace pathologies, NULLs, and empty docs. The DuckDB
oracle pins engine-exactness on the synthetic tables; these pin the
SEMANTICS independent of any SQL engine."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from morph_kgc_spark.operators import text as T
from morph_kgc_spark.operators.text import (
    CLASSIFIER_BUCKETS,
    CLASSIFIER_MIX,
    CLASSIFIER_MOD,
)

_words = st.sampled_from(["the", "cat", "sat", "on", "a", "mat", "—", "%x"])
_texts = st.lists(_words, min_size=0, max_size=12).map(" ".join)
_messy = st.sampled_from([
    "", " ", "  ", "a  b", " lead", "trail ", "a b  c   d", "one",
])
_doc = st.one_of(_texts, _messy, st.none())


def _toks(text):
    return [t for t in (text or "").split(" ") if t != ""]


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _corpus_df(spark, docs):
    return spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string")


@settings(max_examples=10, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=6))
def test_quality_classifier_matches_python_replay(spark, docs):
    rows = T.quality_classifier(
        _corpus_df(spark, docs), "doc_id", "text").collect()
    got = {r.doc_id: (r.n_features, r.score_sum, r.keep) for r in rows}
    half = (CLASSIFIER_MOD - 1) // 2
    for i, d in enumerate(docs):
        t = _toks(d)
        feats = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
        score = sum((_h64(f) % CLASSIFIER_BUCKETS) * CLASSIFIER_MIX
                    % CLASSIFIER_MOD - half for f in feats)
        assert got[i] == (len(feats), score,
                          len(feats) > 0 and score >= 0), (i, d)


@settings(max_examples=10, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=6))
def test_length_histogram_matches_python_replay(spark, docs):
    rows = T.length_histogram(
        _corpus_df(spark, docs), "doc_id", "text").collect()
    got = {r.bucket_lo: (r.bucket_hi, r.n_docs, r.total_tokens)
           for r in rows}
    want = {}
    for d in docs:
        n = len(_toks(d))
        lo = 0 if n == 0 else 1 << (n.bit_length() - 1)
        hi, cnt, tot = want.get(lo, (0 if lo == 0 else 2 * lo - 1, 0, 0))
        want[lo] = (hi, cnt + 1, tot + n)
    assert got == want


@settings(max_examples=8, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=5), st.integers(1, 4))
def test_ngram_counts_matches_python_replay(spark, docs, k):
    rows = T.ngram_counts_topk(
        _corpus_df(spark, docs), "doc_id", "text", k=k).collect()
    occ, ndocs = {}, {}
    for d in docs:
        t = _toks(d)
        grams = [f"{a} {b}" for a, b in zip(t, t[1:])]
        for g in grams:
            occ[g] = occ.get(g, 0) + 1
        for g in set(grams):
            ndocs[g] = ndocs.get(g, 0) + 1
    want = sorted(occ, key=lambda g: (-occ[g], g))[:k]
    got = sorted(rows, key=lambda r: r.rank)
    assert [r.gram for r in got] == want
    for r in got:
        assert (r.n_occurrences, r.n_docs) == (occ[r.gram], ndocs[r.gram])
