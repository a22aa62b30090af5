"""Referencing-object-map joins: broadcast, plain, and salted variants.

The reference implements exactly one join: an **inner equi-join** of child
rows against parent rows, with parent columns prefixed ``parent_``
(src/morph_kgc/materializer.py:896-907). At 100 TB the join key is the
child's foreign reference — often Zipf-skewed (head entities) — so the
salted variant replicates the parent side over ``n_salts`` shards and
appends a random-ish but *deterministic* salt on the child side (derived
from a sibling column hash, keeping the plan re-executable for
checkpoint/resume).

Strategy selection:
- parent known-small → Catalyst broadcasts (we also expose an explicit
  ``broadcast=True``);
- otherwise sort-merge/shuffled-hash chosen by AQE, with
  ``spark.sql.adaptive.skewJoin`` recommended on;
- ``salt > 1`` forces manual salting for pathological head keys that AQE's
  per-partition splitting cannot fix (a single hot *key*, not partition).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from morph_kgc_spark import model as M

PARENT_PREFIX = "parent_"


def prefix_parent(parent: DataFrame, prefix: str = PARENT_PREFIX) -> DataFrame:
    return parent.select([F.col(c).alias(prefix + c) for c in parent.columns])


def join_child_parent(child: DataFrame, parent: DataFrame,
                      join_conditions: Iterable[M.JoinCondition],
                      broadcast: bool = False,
                      salt: int = 1) -> DataFrame:
    """Inner equi-join child × parent with ``parent_``-prefixed columns."""
    jcs = list(join_conditions)
    parent_p = prefix_parent(parent)

    if broadcast:
        parent_p = F.broadcast(parent_p)
        cond = _eq_cond(child, parent_p, jcs)
        return child.join(parent_p, on=cond, how="inner")

    if salt > 1:
        return _salted_join(child, parent_p, jcs, salt)

    cond = _eq_cond(child, parent_p, jcs)
    return child.join(parent_p, on=cond, how="inner")


def _eq_cond(child: DataFrame, parent_p: DataFrame,
             jcs: list[M.JoinCondition]):
    cond = None
    for jc in jcs:
        c = child[jc.child] == parent_p[PARENT_PREFIX + jc.parent]
        cond = c if cond is None else (cond & c)
    return cond


def _salted_join(child: DataFrame, parent_p: DataFrame,
                 jcs: list[M.JoinCondition], n_salts: int) -> DataFrame:
    """Skew-safe join: child rows get a deterministic salt in [0, n_salts);
    the parent side is exploded n_salts×, so one hot key spreads over
    n_salts shuffle partitions. Deterministic (hash of all child columns,
    not rand()) so retried tasks produce identical output — required for
    per-partition checkpoint/resume.
    """
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in child.columns]),
                      F.lit(n_salts)).alias("__salt")
    child_s = child.select("*", salt_col)
    parent_s = parent_p.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    )
    cond = _eq_cond(child_s, parent_s, jcs) & (child_s["__salt"] == parent_s["__salt"])
    return (child_s.join(parent_s, on=cond, how="inner")
            .drop("__salt"))
