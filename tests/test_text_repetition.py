"""repetition_stats: Gopher-style repetition signals
(morph_kgc_spark/operators/text.py)."""

from pyspark.sql import Row

from morph_kgc_spark.operators.text import repetition_stats


def _run(spark, rows):
    df = spark.createDataFrame([Row(doc_id=i, text=t)
                                for i, t in enumerate(rows)])
    return {r["doc_id"]: r for r in
            repetition_stats(df, "doc_id", "text").collect()}


def test_hand_computed_fractions(spark):
    out = _run(spark, [
        "a b a b a",        # tokens aabab: 5 tok 2 uniq; bigrams:
                            # [a b, b a, a b, b a] -> top 2/4; trigrams
                            # [aba, bab, aba] -> 2 distinct of 3
        "x y z w",          # all unique: bigram counts all 1 -> 1/3
        "q q q q",          # one bigram value 3 times -> 3/3
    ])
    r = out[0]
    assert r["dup_token_frac"] == round(1 - 2 / 5, 6)
    assert r["top_bigram_frac"] == 0.5
    assert r["dup_trigram_frac"] == round(1 - 2 / 3, 6)
    r = out[1]
    assert r["dup_token_frac"] == 0.0
    assert r["top_bigram_frac"] == round(1 / 3, 6)
    assert r["dup_trigram_frac"] == 0.0
    r = out[2]
    assert r["dup_token_frac"] == 0.75
    assert r["top_bigram_frac"] == 1.0
    assert r["dup_trigram_frac"] == 0.5


def test_short_docs_yield_zero_not_error(spark):
    out = _run(spark, ["solo", "two words", ""])
    assert out[0]["top_bigram_frac"] == 0.0     # no bigrams
    assert out[0]["dup_trigram_frac"] == 0.0
    assert out[1]["top_bigram_frac"] == 1.0     # exactly one bigram
    assert out[1]["dup_trigram_frac"] == 0.0
    # "" splits to [''] -> 1 token, no n-grams
    assert out[2]["dup_token_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == 0.0


def test_plan_is_map_only(spark):
    """The whole operator must be a pure map over the corpus: the only
    permissible exchange is the small-input parallelize repartition."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = repetition_stats(df, "doc_id", "text") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "HashAggregate" not in plan
    assert plan.count("Exchange") <= 1  # the parallelize round-robin
