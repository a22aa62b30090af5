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

import math

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


def _probe_buckets(bucket: Column, bits: int, hamming: int) -> Column:
    """Array of bucket keys within Hamming distance ≤ ``hamming`` of the
    query's own bucket (multi-probe LSH). ``hamming=0`` → just the
    bucket itself; ``hamming=1`` adds the ``bits`` single-bit flips —
    the neighbors most likely to hold true matches, since a near
    neighbor differs in sign only where its coordinate is near zero.
    Pure string surgery on the key, evaluated per QUERY row (the small
    broadcast side) — the corpus stays keyed once."""
    variants = [bucket]
    if hamming >= 1:
        for i in range(bits):
            flipped = F.when(F.substring(bucket, i + 1, 1) == "1",
                             F.lit("0")).otherwise(F.lit("1"))
            variants.append(F.concat(F.substring(bucket, 1, i), flipped,
                                     F.substring(bucket, i + 2,
                                                 bits - i - 1)))
    if hamming >= 2:
        raise ValueError("lsh_topk: probe_hamming > 1 not supported "
                         "(bucket fan-out grows as C(bits, h); use more "
                         "nprobe-style cells via ivf_topk instead)")
    return F.array(*variants)


def lsh_topk(corpus: DataFrame, queries: DataFrame, id_col: str,
             vec_col: str, k: int = 5, bits: int = 4,
             probe_hamming: int = 1) -> DataFrame:
    """SRP-LSH bucketed ANN: exact cosine top-k inside the query's sign
    bucket. One equi-join on the bucket key + one per-query window —
    at 10^12 vectors the corpus is written bucketed on this key, so a
    query batch touches only its buckets' files. ``bits`` trades recall
    (neighbors straddling a sign boundary are missed) against bucket
    size ~ n/2^bits; high-cosine pairs agree in sign wherever |x| is
    non-negligible, so small ``bits`` keeps recall high.

    ``probe_hamming=1`` (the DEFAULT) enables multi-probe: each query
    also searches the ``bits`` buckets one sign-flip away (scan
    fraction ≈ (bits+1)/2^bits), recovering most boundary-straddling
    neighbors. Measured (tools/ann_recall.py, BENCH.md): on planted
    near-duplicates (cos ≥ 0.99) bits=4 single-probe recall@5 is 0.79
    — below the ≥0.8 quality bar — while multi-probe clears it; on the
    near-uniform sf0.1 embeddings it lifts bits=4 recall@5 ~0.14→~0.5.
    The explode happens on the broadcast query side only; a neighbor
    lives in exactly one corpus bucket, so probed buckets are disjoint
    and no pair dedup is needed. ``probe_hamming=0`` restores the
    single-bucket scan (fraction 1/2^bits) when scan cost dominates.
    """
    c = _parallelize_narrow(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv")) \
        .withColumn("bucket", sign_bucket(F.col("cv"), bits))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv")) \
               .withColumn("bucket", sign_bucket(F.col("qv"), bits))
    if probe_hamming:
        q = q.withColumn("bucket", F.explode(
            _probe_buckets(F.col("bucket"), bits, probe_hamming)))
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


def _double_lit(x: float) -> str:
    """Shortest round-trip double literal for Spark SQL (``D`` suffix —
    a bare decimal would parse as DECIMAL)."""
    return repr(float(x)) + "D"


def _check_finite(vec: list[float], vec_id) -> list[float]:
    """Reject NaN/Inf coordinates up front with the offending id.

    A non-finite seed would otherwise render as ``nanD``/``infD`` inside
    the centroid literal and fail Spark SQL *parsing* with an error far
    from the actual cause (round-6 advice, operators/similarity.py:101).
    """
    for i, x in enumerate(vec):
        if math.isnan(x) or math.isinf(x):
            raise ValueError(
                f"kmeans_train: vector id={vec_id!r} has a non-finite "
                f"coordinate at position {i} ({x!r}); clean the corpus "
                "(drop or impute non-finite embeddings) before training")
    return vec


def _dist_array_sql(cents: list[list[float]]) -> str:
    """SQL for the per-row array of squared-L2 distances from column
    ``v`` to each centroid (literal-embedded; evaluates in coordinate
    order so the DuckDB oracle reproduces identical doubles)."""
    return "array(%s)" % ", ".join(
        "aggregate(zip_with(v, array(%s), (x, c) -> (x - c) * (x - c)), "
        "cast(0.0 as double), (acc, x) -> acc + x)"
        % ", ".join(_double_lit(x) for x in c)
        for c in cents)


def _with_cell(vdf: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Assign each row's ``v`` to its nearest centroid → ``cell`` column.

    Centroids are embedded as literal arrays, so assignment is a pure
    per-row projection — ZERO shuffle over the corpus (the MLlib
    broadcast-centroid shape). Distances evaluate in index order and the
    argmin is ``array_position(d, array_min(d))`` — first-match, so ties
    break to the LOWEST cell, exactly like the oracle's replay. The
    distance array is materialized in its own projection to avoid
    duplicating k·dim literals into the argmin expression.
    """
    return (vdf.withColumn("__d", F.expr(_dist_array_sql(cents)))
            .withColumn("cell", F.expr(
                "CAST(array_position(__d, array_min(__d)) - 1 AS INT)"))
            .drop("__d"))


def _farthest_point_seeds(v: DataFrame, k: int) -> list[list[float]]:
    """Deterministic farthest-point (k-means++-style, argmax instead of
    sampling) seed selection: start from the min-id vector, then k-1
    times pick the vector maximizing the MIN squared-L2 distance to the
    seeds chosen so far, ties to the lowest id. No RNG — every engine
    and restart picks the same seeds, so the DuckDB oracle replays it.

    One job per seed (a TakeOrderedAndProject collecting ONE row) — k-1
    corpus scans total, the standard farthest-point cost; the corpus is
    never collected.

    Round 7 (guide §1.2 "don't compute things you throw away"): the
    running min-distance is INCREMENTAL — each step's frame carries the
    previous step's ``__d`` (persisted, so the scans read it from
    memory) and folds in ONE new centroid distance via ``least``.
    ``least(min(d_1..d_{i-1}), d_i) == min(d_1..d_i)`` exactly (IEEE
    min is associative), so every argmax sees bit-identical values to
    the re-evaluate-all-seeds formulation the DuckDB oracle replays —
    but evaluates O(k) distance expressions per row over the whole
    seeding instead of O(k²). Each step's TakeOrdered materializes the
    new cached frame; the superseded one is unpersisted immediately.
    """
    first = v.orderBy("id").limit(1).collect()
    if not first:
        raise ValueError("kmeans_train: empty corpus")
    cents = [_check_finite(list(first[0].v), first[0].id)]
    cur = v.withColumn(
        "__d", F.expr(f"array_min({_dist_array_sql(cents)})")).persist()
    live = [cur]
    try:
        for i in range(k - 1):
            # this TakeOrdered materializes `cur` (reading the previous
            # step's cache), so only THEN is that previous step's frame
            # safe to unpersist — dropping it earlier would force the
            # whole least() chain to recompute from the raw corpus
            row = (cur.orderBy(F.col("__d").desc(), F.col("id"))
                   .limit(1).collect()[0])
            if len(live) > 1:
                live.pop(0).unpersist()
            cents.append(_check_finite(list(row.v), row.id))
            if i < k - 2:
                cur = cur.withColumn(
                    "__d",
                    F.least(F.col("__d"), F.expr(
                        f"array_min({_dist_array_sql(cents[-1:])})"))
                ).persist()
                live.append(cur)
    finally:
        for f in live:
            f.unpersist()
    return cents


def kmeans_train(df: DataFrame, id_col: str, vec_col: str, k: int = 8,
                 iters: int = 2,
                 init: str = "min_id") -> list[list[float]]:
    """Deterministic Lloyd's k-means → driver-side centroid list.

    Spark-native and replayable by the DuckDB oracle bit-for-bit:

    - **init**: ``"min_id"`` (default) seeds with the vectors of the
      ``k`` smallest ids — one job, but degenerate when the lowest-id
      vectors are near-duplicates; ``"farthest"`` seeds with
      deterministic farthest-point selection
      (:func:`_farthest_point_seeds`) — k-1 extra single-row jobs,
      spread seeds regardless of id order (round-6 directive #6).
      Neither uses RNG, so every engine and every restart trains the
      same model;
    - **assign**: nearest centroid by squared L2 in coordinate order,
      ties to the lowest cell (:func:`_with_cell`) — zero shuffle;
    - **update**: per-cell means in SCALED-INTEGER space: coordinates
      become ``CAST(round(x·1e6) AS BIGINT)`` and are summed exactly —
      integer addition is order-independent, where a double sum would
      depend on partitioning and break both determinism and the oracle.
      The mean ``(s/n)/1e6`` is exact while ``s < 2^53`` (|x| ≤ ~1 up to
      ~9e9 rows per cell; beyond that switch the scale factor down).
      Empty cells keep their previous centroid.

    Per iteration: one job (scan + groupBy(cell, pos) with map-side
    partials over k·dim groups) collecting k·dim tiny rows to the
    driver — the classic iterative-refinement shape; the corpus is never
    collected. ``iters`` counts assignment rounds; updates run between
    them (iters=2 → seed-assign, update, final centroids returned).
    """
    v = _parallelize_narrow(df).select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"))
    if init == "farthest":
        cents = _farthest_point_seeds(v, k)
    elif init == "min_id":
        seeds = v.orderBy("id").limit(k).collect()
        cents = [_check_finite(list(r.v), r.id) for r in seeds]
    else:
        raise ValueError(f"unknown kmeans init {init!r} "
                         "(supported: 'min_id', 'farthest')")
    for _ in range(iters - 1):
        agg = (_with_cell(v, cents)
               .select("cell", F.posexplode(F.expr(
                   "transform(v, x -> CAST(round(x * 1000000.0) AS BIGINT))"
               )).alias("pos", "xi"))
               .groupBy("cell", "pos")
               .agg(F.sum("xi").alias("s"), F.count("*").alias("n"))
               .collect())
        new = [list(c) for c in cents]  # empty cells keep old centroid
        for r in agg:
            new[r.cell][r.pos] = (r.s / r.n) / 1e6
        cents = new
    return cents


def kmeans_cells(df: DataFrame, id_col: str, vec_col: str, k: int = 8,
                 iters: int = 2, init: str = "min_id") -> DataFrame:
    """(id, cell): coarse-quantizer assignment from :func:`kmeans_train`.

    The IVF entry point for corpora WITHOUT a precomputed label — train
    driver-side (k·dim doubles), then one zero-shuffle assignment
    projection over the corpus. Hash-exact vs the DuckDB replay of the
    same iterations (oracles.ann_kmeans_cells).
    """
    cents = kmeans_train(df, id_col, vec_col, k=k, iters=iters, init=init)
    v = df.select(F.col(id_col).alias("id"),
                  F.col(vec_col).cast("array<double>").alias("v"))
    return _with_cell(v, cents).select(F.col("id").alias(id_col), "cell")


def with_kmeans_cell(df: DataFrame, vec_col: str,
                     cents: list[list[float]]) -> DataFrame:
    """Add a ``cell`` column (nearest trained centroid) to ``df`` —
    zero-shuffle projection; the IVF corpus-preparation step."""
    tmp = df.withColumn("v", F.col(vec_col).cast("array<double>"))
    return _with_cell(tmp, cents).drop("v")


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
    from morph_kgc_spark.operators import cache

    # the prepared corpus feeds BOTH the centroid aggregate and the
    # in-cell scoring join — persist it so the cell-assignment /
    # cast work runs once (round 7; at production scale this is the
    # stored IVF index table, computed once, not per query). Released
    # with the result under the cache contract.
    c = _parallelize_narrow(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(cell_col).alias("cell"),
        F.col(vec_col).cast("array<double>").alias("cv")).persist()
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
    return cache.own(
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim"), [c])
