"""Training-prep operators: document chunking and sequence packing.

Two standard steps between curation and tokenized training shards:

- :func:`chunk_documents` splits each document into fixed-size token
  windows with overlap (context-window chunking). Pure per-row array
  work: tokenize once in a projection (Catalyst does no CSE inside
  lambdas — the repo's standing rule), build the window-start sequence,
  ``explode_outer`` (NOT ``explode``: InferFiltersFromGenerate would
  push an inferred ``size()>0`` through the projection and inline the
  whole token expression per element), then slice+join per window.
  Zero shuffle.

- :func:`pack_sequences` assigns documents to fixed-token-budget bins
  ("sequence packing"). A truly greedy global packer needs a serial
  scan, which dies at 100 TB; the scalable discipline used here is
  offset packing within deterministic shards: docs are sharded by
  ``h64(id) % n_shards``, ordered by id inside the shard, and a doc
  whose running-total START offset lands in bin k joins bin k — so a
  bin can overflow its budget by at most one document (the standard
  first-fit-by-offset approximation; exact per-bin totals are emitted
  so a trainer can truncate). ONE exchange (the shard window), bins
  are deterministic under ANY physical partitioning or cluster size,
  and every shard packs in parallel.

Both are dual-engine replayable: the DuckDB oracles
(``oracles.llm_chunk_documents`` / ``llm_pack_sequences``) reproduce
the exact arithmetic (list_slice / window cumsum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from morph_kgc_spark.functions.hashing import h64
from morph_kgc_spark.operators.text import _parallelize_narrow, tokens


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int = 100,
                    overlap: int = 10) -> DataFrame:
    """(id, chunk_idx, chunk_tokens, chunk_text): fixed token windows.

    Window k starts at token ``1 + k*(chunk_tokens - overlap)``
    (1-based); the last window may be short. Starts stop at
    ``n - overlap`` so no window is PURE overlap (a start past that
    bound covers only tokens the previous window already emitted —
    duplicated training text; round-6 review finding); the last kept
    start still reaches token n, so coverage is complete.
    Empty/whitespace-only documents produce one empty chunk (chunk_idx
    0) so no document silently disappears from the corpus.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_tokens "
            f"({chunk_tokens}) or the window sequence never advances")
    step = chunk_tokens - overlap
    # coalesce NULL text to '' (round-6 ADVICE): a NULL-text doc must
    # yield the documented single empty chunk, not NULL chunk fields —
    # same convention as quality_gate/quality_classifier. No effect on
    # non-null rows.
    toks = _parallelize_narrow(
        df.select(F.col(id_col),
                  tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__t")))
    toks = toks.withColumn("__n", F.size("__t"))
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.col("__n") - F.lit(overlap), F.lit(1)),
        F.lit(step))
    rows = toks.select(
        F.col(id_col), F.col("__t"),
        F.posexplode_outer(starts).alias("chunk_idx", "__s"))
    rows = rows.where(F.col("__s").isNotNull())
    chunk = F.slice(F.col("__t"), F.col("__s"), chunk_tokens)
    return rows.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.size(chunk).alias("chunk_n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"))


def pack_sequences(df: DataFrame, id_col: str, token_count_col,
                   max_tokens: int = 2048,
                   n_shards: int = 64) -> DataFrame:
    """(id, shard, bin_idx, bin_start_offset): offset packing.

    ``token_count_col`` is a column name or Column with the document's
    token count. ``bin_idx`` is ``floor(start_offset / max_tokens)``
    where ``start_offset`` is the running total of token counts of
    earlier docs (by id) in the same shard — deterministic under any
    partitioning, one window exchange, no global serial scan.
    """
    tc = (F.col(token_count_col) if isinstance(token_count_col, str)
          else token_count_col).cast("long")
    shard = (h64(F.concat(F.lit("shard|"),
                          F.col(id_col).cast("string")))
             % F.lit(n_shards)).alias("shard")
    base = df.select(F.col(id_col), tc.alias("__tc"), shard)
    w = (Window.partitionBy("shard").orderBy(F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    start = (F.sum("__tc").over(w) - F.col("__tc")).alias("bin_start_offset")
    out = base.select(F.col(id_col), F.col("shard"), F.col("__tc"), start)
    return out.select(
        F.col(id_col), F.col("shard"),
        F.floor(F.col("bin_start_offset") / F.lit(max_tokens))
        .cast("long").alias("bin_idx"),
        F.col("bin_start_offset"))
