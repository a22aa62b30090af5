"""Dedup candidate-pair QUALITY tests (round-6, BENCH.md report twin).

CORRECTNESS_r*.json proves each pairing operator computes exactly what
it claims; these tests prove the shipped defaults give useful recall /
precision against EXACT n-gram Jaccard — the same gap the ANN recall
harness (tools/ann_recall.py + tests/test_ann_recall.py) closes for
similarity search. Ground truth: ``ngram_capped_pairs`` with an
effectively-infinite star cap (exact at this corpus size); a true
duplicate is a pair with jaccard >= 0.5 on the sf0.001 documents.

Gated claims (mirrored in BENCH.md's quality table):
- MinHash 4x4 banding: recall 1.0 AND candidate precision 1.0 — on
  this corpus its bucket collisions ARE the >=0.5-jaccard pairs.
- SimHash at the shipped hamming<=6: recall 1.0 (it is a CANDIDATE
  generator; precision is intentionally low and not gated).
- ngram_capped's star cap may drop true PAIRS from the stream, but
  never disconnects their docs: every true pair stays in one connected
  component of the emitted edge set (the documented cap contract).
"""

import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from morph_kgc_spark.operators import dedup as D
from morph_kgc_spark.operators.cache import release
from tools.dedup_quality import pair_set, true_pair_set

JACCARD_THRESHOLD = 0.5


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def true_pairs(docs):
    """Exact >=0.5-jaccard pairs — the same definition the BENCH.md
    report runs (tools/dedup_quality.true_pair_set)."""
    truth = true_pair_set(docs, JACCARD_THRESHOLD)
    assert truth, "fixture corpus lost its planted near-duplicates"
    return truth


def test_minhash_shipped_defaults_exact_on_corpus(docs, true_pairs):
    """Shipped 4x4 banding emits exactly the true pair set here —
    recall 1.0 and candidate precision 1.0 (no verify pass needed)."""
    out = D.minhash_lsh_pairs(docs, "doc_id", "text")
    emitted = pair_set(out)
    release(out)
    assert emitted == true_pairs, (
        f"minhash drifted: missed {len(true_pairs - emitted)}, "
        f"spurious {len(emitted - true_pairs)}")


def test_minhash_bucket_cap_preserves_quality(docs, true_pairs):
    """bucket_cap=8 (the capped CORRECTNESS entry) changes nothing on a
    non-degenerate corpus: same exact pair set."""
    out = D.minhash_lsh_pairs(docs, "doc_id", "text", bucket_cap=8)
    emitted = pair_set(out)
    release(out)
    assert emitted == true_pairs


def test_simhash_shipped_hamming_recall_complete(docs, true_pairs):
    """SimHash hamming<=6 is a candidate generator: every true pair is
    in its stream (recall 1.0); precision is the documented trade."""
    out = D.simhash_pairs(docs, "doc_id", "text", max_hamming=6)
    emitted = pair_set(out)
    release(out)
    missed = true_pairs - emitted
    assert not missed, f"simhash hamming<=6 missed true pairs: {missed}"


def test_ngram_star_cap_preserves_connectivity(docs, true_pairs):
    """star_cap=3 (aggressively small, the quality-report setting) may
    drop true pairs from the stream, but the star keeps both docs in
    one component — union-find over the emitted edges proves it."""
    out = D.ngram_capped_pairs(docs, "doc_id", "text", star_cap=3)
    emitted = pair_set(out)
    release(out)

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in emitted:
        parent[find(a)] = find(b)
    for a, b in true_pairs:
        assert find(a) == find(b), (
            f"star cap disconnected true pair ({a}, {b}) — the "
            "connectivity contract in ngram_capped_pairs is broken")
