"""North-star pipeline: extraction invariant, EL determinism,
checkpoint/resume with lineage guard."""

import os

import pytest
from pyspark.sql import functions as F

from morph_kgc_spark.pipeline.checkpoint import (
    commit_metrics,
    read_committed,
    write_checkpointed,
)
from morph_kgc_spark.pipeline.pages import (
    alias_dictionary,
    detect_mentions,
    extract_text_udf,
    link_entities,
    run_pipeline,
    synthetic_pages,
)


def test_extraction_byte_identical(spark):
    pages = synthetic_pages(spark, 500)
    bad = (pages.withColumn("etext", extract_text_udf(F.col("html")))
           .where(F.col("etext") != F.col("text")).count())
    assert bad == 0


def test_generator_deterministic(spark):
    a = synthetic_pages(spark, 200, partitions=2).collect()
    b = synthetic_pages(spark, 200, partitions=8).collect()  # diff parallelism
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_mention_detection_and_linking(spark):
    pages = synthetic_pages(spark, 300).select("url", "text", "lang")
    aliases = alias_dictionary(spark, 64)
    mentions = detect_mentions(pages, aliases)
    assert mentions.count() > 0
    # every page embeds the alias of entity id%64 when id%256 < 64
    linked = link_entities(mentions)
    # one winner per (url, alias)
    dups = (linked.groupBy("url", "alias").count()
            .where(F.col("count") > 1).count())
    assert dups == 0
    # deterministic across runs
    l2 = link_entities(detect_mentions(pages, aliases))
    assert sorted(map(tuple, linked.select("url", "alias", "entity_iri").collect())) == \
        sorted(map(tuple, l2.select("url", "alias", "entity_iri").collect()))


def test_pipeline_triples_shape(spark):
    out = run_pipeline(spark, 1000, n_entities=32)
    assert out.columns == ["subject", "predicate", "object"]
    n = out.count()
    assert n > 1000  # mentions + lang + crawledAt + labels
    assert out.distinct().count() == n  # set semantics already applied


def test_checkpoint_resume(spark, tmp_path):
    root = str(tmp_path / "sink")
    out = run_pipeline(spark, 500, n_entities=16)

    s1 = write_checkpointed(out, root, n_buckets=4)
    assert len(s1.written_buckets) == 4 and not s1.skipped_buckets

    # resume: everything committed → no-op
    s2 = write_checkpointed(out, root, n_buckets=4)
    assert len(s2.skipped_buckets) == 4 and not s2.written_buckets

    # partial resume: delete one commit marker → only that bucket rewrites
    os.remove(os.path.join(root, "_commits", "bucket_2.json"))
    s3 = write_checkpointed(out, root, n_buckets=4)
    assert s3.written_buckets == [2] and len(s3.skipped_buckets) == 3

    total = read_committed(spark, root).count()
    assert total == out.count()
    m = commit_metrics(root)
    assert m["buckets"] == 4 and m["rows"] == total


def test_checkpoint_lineage_guard(spark, tmp_path):
    root = str(tmp_path / "sink")
    out1 = run_pipeline(spark, 300, n_entities=16)
    write_checkpointed(out1, root, n_buckets=2)
    out2 = run_pipeline(spark, 400, n_entities=16)  # different input
    with pytest.raises(ValueError, match="different lineage"):
        write_checkpointed(out2, root, n_buckets=2)
