"""Cache lifecycle helpers for operators that persist intermediates.

Pattern: an operator that must read an intermediate twice (LSH banded
self-joins, iterative label propagation) persists it, EAGERLY
materializes its (much smaller) result via ``localCheckpoint``, then
unpersists the intermediate before returning — so no operator leaks
corpus-sized cache blocks across queries in one session. The returned
DataFrame owns exactly one set of blocks (its own checkpointed result);
callers that are done with it release those too with :func:`release`.

``localCheckpoint`` is the right materializer here (vs ``persist`` +
count): it also truncates the logical plan, which iterative algorithms
need anyway (the plan string otherwise grows per round until plan
processing OOMs), and its blocks are addressable for explicit release.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def persistent_rdd_ids(spark: SparkSession) -> set[int]:
    """Ids of all RDDs currently holding persisted/checkpointed blocks."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def own(result: DataFrame, intermediates: list[DataFrame]) -> DataFrame:
    """Attach persisted intermediates to ``result`` for deferred release.

    Lazy-mode pair operators (``minhash_lsh_pairs(..., lazy=True)`` etc.)
    skip the eager ``localCheckpoint`` of their result — the caller
    consumes it exactly once, so paying a checkpoint write inside the
    query is pure overhead — but their persisted intermediates must stay
    alive until that consumption happens (the two sides of an aliased
    self-join get no ReusedExchange; the persist is load-bearing).
    ``own`` records those intermediates on the returned wrapper so that
    :func:`release` frees them afterwards. Ownership composes: owning an
    already-owning frame chains its dependencies.

    Ownership lives on the PYTHON WRAPPER object, not the plan: any
    transformation (``df.where(...)``, ``df.select(...)``) returns a new
    wrapper without it — release the frame the operator RETURNED, not a
    derivative, or chain the ownership forward explicitly with
    ``own(derived, [original])``.
    """
    owned = list(getattr(result, "_mkgc_owned", ()))
    for dep in intermediates:
        owned.extend(getattr(dep, "_mkgc_owned", ()))
        owned.append(dep)
    result._mkgc_owned = owned
    return result


def release(df: DataFrame) -> None:
    """Release the blocks of a ``localCheckpoint``-ed DataFrame.

    Also unpersists any intermediates attached via :func:`own` (lazy-mode
    operators). The DataFrame must not be used afterwards. No-op when the
    frame is not checkpoint-backed or its blocks are already gone.
    (PySpark has no public unpersist for checkpointed frames; the JVM
    handles here are stable internals — same class of access as the
    session's own ``_jsc`` — and the hygiene test pins the behavior.)
    """
    for dep in getattr(df, "_mkgc_owned", ()):
        try:
            dep.unpersist()
        except Exception:
            pass
    if hasattr(df, "_mkgc_owned"):
        df._mkgc_owned = []
    try:
        plan = df._jdf.queryExecution().analyzed()
        if not plan.getClass().getName().endswith(".LogicalRDD"):
            return
        rdd_id = plan.rdd().id()
        jmap = df.sparkSession.sparkContext._jsc.getPersistentRDDs()
        for k in jmap.keySet().toArray():
            if int(k) == rdd_id:
                jmap.get(k).unpersist(False)
    except Exception:
        pass
