"""Structured-Streaming KG construction.

The reference has no true streaming (its Kafka sink is a one-shot batch
message, utils.py:300-330). This module goes further, per the brief's
streaming mandate: the same rule compiler runs over an unbounded pages
stream — every term-materialization operator is stateless/per-row, so
the exact batch Column trees apply unchanged to ``readStream`` sources.

- ``stream_triples``: rules × streaming DataFrame → streaming triples.
  Set semantics caveat: global distinct over an unbounded stream needs
  state; we expose watermarked ``dropDuplicatesWithinWatermark`` keyed on
  the triple when an event-time column is available, else emit-with-dups
  (downstream Iceberg MERGE dedups at the sink, the standard lakehouse
  pattern).
- ``windowed_triple_counts``: watermark + tumbling-window rollup of
  emitted triples per predicate (monitoring stream).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from morph_kgc_spark import model as M
from morph_kgc_spark.plans.compiler import compile_term, _object_column


def stream_triples(stream_df: DataFrame, rules: list[M.Rule],
                   event_time_col: Optional[str] = None,
                   watermark: str = "10 minutes") -> DataFrame:
    """Apply rules to a streaming source (one logical source shared by
    all rules — the streaming pages table).

    Joins/gathers are not supported in-stream (they need stream-stream
    state); referencing maps must be self-join-eliminated or the parent
    broadcast as a static frame — both compile to per-row expressions.
    """
    out = None
    for rule in rules:
        if rule.join_conditions or rule.quoted_object or rule.quoted_subject:
            raise ValueError("stream rules must be join-free (broadcast the "
                             "parent as a static side or pre-join upstream)")
        refs = rule.references
        base = stream_df
        for r in refs:
            base = base.withColumn(r, F.col(r).cast("string"))
        base = base.na.drop("any", subset=refs) if refs else base
        cols = [
            compile_term(rule.subject).alias("subject"),
            compile_term(rule.predicate).alias("predicate"),
            _object_column(rule).alias("object"),
        ]
        if event_time_col:
            cols.append(F.col(event_time_col).alias("__event_time"))
        branch = base.select(*cols)
        out = branch if out is None else out.unionAll(branch)

    if event_time_col:
        out = (out.withWatermark("__event_time", watermark)
               .dropDuplicatesWithinWatermark(["subject", "predicate", "object"])
               .drop("__event_time"))
    return out


def windowed_triple_counts(triples_with_time: DataFrame,
                           time_col: str = "__event_time",
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Monitoring rollup: triples per predicate per tumbling window."""
    return (
        triples_with_time
        .withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("w"), F.col("predicate"))
        .agg(F.count("*").alias("n_triples"))
        .select(F.col("w.start").alias("window_start"), "predicate", "n_triples")
    )
