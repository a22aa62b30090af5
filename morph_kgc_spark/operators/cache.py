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


# owned persisted intermediates by their analyzed plan's semanticHash —
# the ownership record that SURVIVES transformations: df.where(...)
# returns a fresh Python wrapper (dropping any attribute), but its
# analyzed tree still CONTAINS the persisted intermediate's subtree, and
# semanticHash is exprId-normalized so the subtree is findable from any
# derivative. Strong refs are fine: the entries die exactly when
# released, and an unreleased persist would pin its blocks anyway.
_OWNED_BY_HASH: dict[int, list[DataFrame]] = {}


def _plan_semantic_hashes(df: DataFrame) -> set[int]:
    """semanticHash of every node in the frame's analyzed logical plan."""
    hashes: set[int] = set()
    stack = [df._jdf.queryExecution().analyzed()]
    while stack:
        node = stack.pop()
        hashes.add(int(node.semanticHash()))
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return hashes


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

    Ownership is ALSO recorded in a plan-keyed registry
    (``_OWNED_BY_HASH``), so it survives transformations: releasing a
    DERIVATIVE (``release(result.where(...))``) finds the intermediate's
    subtree in the derivative's analyzed plan by semanticHash and frees
    it (round-4 advice: the wrapper attribute alone was lost on any
    select/where). Two logically IDENTICAL plans share a semanticHash;
    releasing one frees owned intermediates of both — acceptable,
    because identical owned plans hold identical (re-computable) caches.
    """
    owned = list(getattr(result, "_mkgc_owned", ()))
    for dep in intermediates:
        owned.extend(getattr(dep, "_mkgc_owned", ()))
        owned.append(dep)
    result._mkgc_owned = owned
    for dep in owned:
        try:
            h = int(dep._jdf.queryExecution().analyzed().semanticHash())
            bucket = _OWNED_BY_HASH.setdefault(h, [])
            if not any(d is dep for d in bucket):
                bucket.append(dep)
        except Exception:
            pass
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
    released: list[DataFrame] = []
    for dep in getattr(df, "_mkgc_owned", ()):
        try:
            dep.unpersist()
            released.append(dep)
        except Exception:
            pass
    if hasattr(df, "_mkgc_owned"):
        df._mkgc_owned = []
    # registry pass: free owned intermediates whose subtree appears in
    # THIS frame's plan — works on derivatives of the owning frame too
    try:
        in_plan = _plan_semantic_hashes(df)
        for h in list(_OWNED_BY_HASH):
            if h in in_plan:
                for dep in _OWNED_BY_HASH.pop(h):
                    try:
                        dep.unpersist()
                    except Exception:
                        pass
    except Exception:
        pass
    # purge wrapper-released deps from the registry so entries (and
    # their python wrappers) do not accumulate over a long session
    for dep in released:
        try:
            h = int(dep._jdf.queryExecution().analyzed().semanticHash())
            bucket = [d for d in _OWNED_BY_HASH.get(h, ())
                      if d is not dep]
            if bucket:
                _OWNED_BY_HASH[h] = bucket
            else:
                _OWNED_BY_HASH.pop(h, None)
        except Exception:
            pass
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
