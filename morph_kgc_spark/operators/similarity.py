"""Approximate-nearest-neighbor search over embedding columns.

Three strategies:
- ``cosine_topk``: exact brute-force top-k (the baseline; fine to ~10^6 ×
  10^3 queries when the query side is broadcast);
- ``ivf_topk``: IVF-style two-stage search — assign every vector to a
  coarse cell, pick the best ``nprobe`` cells per query by centroid
  similarity, then exact cosine only inside probed cells. At 100 TB the
  cell assignment is a bucketed/partitioned table and each query touches
  nprobe partitions instead of the full corpus;
- ``lsh_topk``: SRP-LSH bucketing — corpus AND queries key on the sign
  pattern of the leading coordinates (a fixed-hyperplane simhash), then
  exact cosine inside the shared bucket via an equi-join. No centroid
  pass at all, so it beats IVF when the corpus streams in (no training
  step); recall is approximate for cross-bucket neighbors.

Dot products run over array<double> in index order (F.zip_with +
F.aggregate) so the DuckDB oracle reproduces identical doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from morph_kgc_spark.operators.text import _parallelize_narrow


def _dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
                vec_col: str, k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, rank, cos_sim). Assumes L2-normalized
    vectors (cosine == dot); broadcast the (small) query side.
    """
    # parallelize a narrow single-file corpus scan: the broadcast join
    # keeps the corpus side's partitioning, so a 1-partition scan would
    # run every dot product in one task
    c = _parallelize_narrow(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"))
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).cast("array<double>").alias("qv")))
    scored = (
        c.crossJoin(q)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(_dot("qv", "cv"), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_sim"))


def sign_bucket(vec: Column, bits: int) -> Column:
    """Sign pattern of the first ``bits`` coordinates — a deterministic
    SRP bucket with axis-aligned hyperplanes (no RNG: both engines and
    every retry compute the same key)."""
    return F.concat_ws("", F.transform(
        F.slice(vec, 1, bits),
        lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0"))))


def lsh_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, k: int = 5, bits: int = 4) -> DataFrame:
    """SRP-LSH bucketed ANN: exact cosine top-k inside the query's sign
    bucket. One equi-join on the bucket key + one per-query window —
    at 10^12 vectors the corpus is written bucketed on this key, so a
    query batch touches only its buckets' files. ``bits`` trades recall
    (neighbors straddling a sign boundary are missed) against bucket
    size ~ n/2^bits; high-cosine pairs agree in sign wherever |x| is
    non-negligible, so small ``bits`` keeps recall high.
    """
    c = _parallelize_narrow(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv")) \
        .withColumn("bucket", sign_bucket(F.col("cv"), bits))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv")) \
               .withColumn("bucket", sign_bucket(F.col("qv"), bits))
    scored = (
        c.join(F.broadcast(q), on="bucket", how="inner")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(_dot("qv", "cv"), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(),
                                               F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_sim"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, cell_col: str, k: int = 5,
             nprobe: int = 1) -> DataFrame:
    """IVF two-stage ANN with precomputed coarse cells.

    ``cell_col`` is the coarse quantizer output (here: the dataset's label
    column; in production: k-means cell id). Stage 1 ranks cells per query
    by centroid dot product; stage 2 does exact cosine within the probed
    cells only. Centroid means are computed per-dimension with
    element-wise avg — deterministic (sum of doubles per partition is
    made order-stable by aggregating in cell, position order).
    """
    c = _parallelize_narrow(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(cell_col).alias("cell"),
        F.col(vec_col).cast("array<double>").alias("cv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))

    # centroids: posexplode → avg per (cell, pos) → re-assemble ordered
    cent = (
        c.select("cell", F.posexplode("cv").alias("pos", "x"))
        .groupBy("cell", "pos").agg(F.avg("x").alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cell", F.transform("pm", lambda s: s.m).alias("centroid"))
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("cell_sim").desc(), F.col("cell"))
    probed = (
        F.broadcast(q).crossJoin(F.broadcast(cent))
        .select("query_id", "qv", "cell",
                F.round(_dot("qv", "centroid"), 6).alias("cell_sim"))
        .withColumn("cr", F.row_number().over(probe_w))
        .where(F.col("cr") <= nprobe)
        .select("query_id", "qv", "cell")
    )
    scored = (
        c.join(probed, on="cell", how="inner")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                F.round(_dot("qv", "cv"), 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos_sim"))
