"""Chunking + sequence packing (operators/packing.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from morph_kgc_spark.operators.packing import chunk_documents, pack_sequences


def test_chunk_fixture(spark):
    """Hand-computed windows: 10 tokens, chunk 4, overlap 1 → starts
    1,4,7 (step 3; a start at 10 would be PURE overlap — its only
    token t10 is already in chunk 2 — and is not emitted)."""
    text = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=1)
    rows = {r.chunk_idx: (r.chunk_n_tokens, r.chunk_text)
            for r in out.collect()}
    assert rows == {
        0: (4, "t1 t2 t3 t4"),
        1: (4, "t4 t5 t6 t7"),
        2: (4, "t7 t8 t9 t10"),
    }


def test_chunk_no_pure_overlap_windows(spark):
    """Every chunk after the first contributes at least one NEW token
    (round-6 review: a tail start inside the overlap region duplicated
    training text), and every token is still covered."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = chunk_documents(docs, "doc_id", "text",
                          chunk_tokens=20, overlap=5)
    bad = out.where((F.col("chunk_idx") > 0)
                    & (F.col("chunk_n_tokens") <= 5)).count()
    assert bad == 0


def test_chunk_overlap_consistency(spark):
    """Consecutive chunks share exactly `overlap` tokens; every token
    of the document appears in at least one chunk."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = chunk_documents(docs, "doc_id", "text",
                          chunk_tokens=20, overlap=5).cache()
    # reconstruct each doc from its chunks: drop the first `overlap`
    # tokens of every chunk but the first, concatenate in chunk order
    rebuilt = (out.withColumn(
        "part",
        F.when(F.col("chunk_idx") == 0, F.col("chunk_text")).otherwise(
            F.array_join(F.slice(F.split("chunk_text", " "), 6, 20), " ")))
        .groupBy("doc_id")
        .agg(F.array_join(
            # collect_list has NO order guarantee — sort by chunk_idx
            # via struct sort; a tail chunk that is PURE overlap
            # contributes an empty part, filtered before the join
            F.filter(
                F.transform(
                    F.array_sort(F.collect_list(
                        F.struct("chunk_idx", "part"))),
                    lambda x: x["part"]),
                lambda x: x != F.lit("")),
            " ").alias("rebuilt")))
    joined = docs.join(rebuilt, "doc_id")
    bad = joined.where(F.col("text") != F.col("rebuilt")).count()
    out.unpersist()
    assert bad == 0


def test_chunk_empty_doc_survives(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    rows = chunk_documents(df, "doc_id", "text").collect()
    assert len(rows) == 1 and rows[0].chunk_idx == 0


def test_chunk_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_pack_offsets_and_bins(spark):
    """Within a shard, offsets are the exclusive prefix sum by id and a
    doc joins the bin its START offset falls in."""
    df = spark.createDataFrame(
        [(i, 300) for i in range(10)], ["doc_id", "tc"])
    out = pack_sequences(df, "doc_id", "tc", max_tokens=512, n_shards=1)
    rows = sorted((r.doc_id, r.bin_idx, r.bin_start_offset)
                  for r in out.collect())
    assert [r[2] for r in rows] == [300 * i for i in range(10)]
    assert [r[1] for r in rows] == [(300 * i) // 512 for i in range(10)]


def test_pack_deterministic_under_partitioning(spark):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", F.size(F.split("text", " ")).alias("tc")))
    a = pack_sequences(docs, "doc_id", "tc").collect()
    b = pack_sequences(docs.repartition(13), "doc_id", "tc").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_pack_single_exchange(spark):
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", F.size(F.split("text", " ")).alias("tc")))
    plan = (pack_sequences(docs, "doc_id", "tc")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1, plan
    assert "Python" not in plan
