"""Hierarchical sources: JSON with JSONPath-ish iterators, XML rowTags.

Reference behavior (src/morph_kgc/data_source/data_file.py:141-167 JSON,
:188-253 XML; flattener src/morph_kgc/utils.py:266-283
``normalize_hierarchical_data``): evaluate the ``rml:iterator`` against
the document, then cartesian-flatten nested arrays so every rule sees a
flat row table, and drop rows with nulls in referenced columns.

Spark re-expression:
- JSON: ``spark.read.json`` (+multiLine) → iterator navigation compiled
  to select/explode steps (``$.a.b[*]`` → ``explode(a.b)``) →
  ``flatten_rows`` recursively explodes array fields (cartesian product
  via sequential explode_outer, exactly the reference's product
  semantics) and flattens structs to dotted column names;
- XML: Spark 4's native XML reader with ``rowTag``; attribute columns
  are renamed ``_x`` → ``@x`` to match RML XPath reference syntax
  (``@ID``); multi-valued elements explode per reference like
  data_file.py:250-251.

Supported iterator grammar (covers the reference test corpus):
``$``, ``$.*``, ``$[*]``, and dotted paths with optional ``[*]`` on any
step (``$.students[*]``, ``$.a.b[*]``).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType

_STEP_RE = re.compile(r"^(?P<key>[^.\[\]]*)(?P<star>\[\*\])?$")


def apply_iterator(df: DataFrame, iterator: str) -> DataFrame:
    """Navigate a JSONPath-subset iterator over a parsed JSON DataFrame."""
    it = iterator.strip()
    if it in ("", "$", "$.*", "$[*]"):
        # top-level objects/arrays: spark.read.json already row-izes
        return df
    if not it.startswith("$."):
        raise ValueError(f"unsupported iterator {iterator!r}")
    cur = df
    for raw_step in it[2:].split("."):
        m = _STEP_RE.match(raw_step)
        if not m or not m.group("key"):
            raise ValueError(f"unsupported iterator step {raw_step!r} in {iterator!r}")
        key, star = m.group("key"), bool(m.group("star"))
        field_type = dict(zip(cur.schema.names, [f.dataType for f in cur.schema.fields])).get(key)
        col = F.col(key)
        if isinstance(field_type, ArrayType) or star:
            cur = cur.select(F.explode(col).alias("__it"))
        else:
            cur = cur.select(col.alias("__it"))
        if isinstance(cur.schema["__it"].dataType, StructType):
            cur = cur.select("__it.*")
        else:
            cur = cur.select(F.col("__it").alias(key))
    return cur


def flatten_rows(df: DataFrame, sep: str = ".") -> DataFrame:
    """Cartesian-flatten: structs → dotted columns, arrays → explode_outer.

    Fixpoint loop — nested arrays multiply rows exactly like the
    reference's ``normalize_hierarchical_data`` product semantics.
    """
    while True:
        changed = False
        cols = []
        for field in df.schema.fields:
            if isinstance(field.dataType, StructType):
                for sub in field.dataType.fields:
                    cols.append(F.col(f"`{field.name}`.`{sub.name}`")
                                .alias(f"{field.name}{sep}{sub.name}"))
                changed = True
            elif isinstance(field.dataType, ArrayType):
                cols.append(F.explode_outer(F.col(f"`{field.name}`")).alias(field.name))
                changed = True
            else:
                cols.append(F.col(f"`{field.name}`"))
        if not changed:
            return df
        df = df.select(*cols)


def json_source(spark: SparkSession, path: str, iterator: str = "$.*",
                multi_line: bool = True, flatten: bool = True) -> DataFrame:
    df = spark.read.option("multiLine", str(multi_line).lower()).json(path)
    df = apply_iterator(df, iterator)
    return flatten_rows(df) if flatten else df


def xml_source(spark: SparkSession, path: str, row_tag: str,
               flatten: bool = True) -> DataFrame:
    df = spark.read.format("xml").option("rowTag", row_tag).load(path)
    # attribute columns: Spark names them _attr; RML references use @attr
    renames = {c: "@" + c[1:] for c in df.columns
               if c.startswith("_") and not c.startswith("_corrupt")}
    for old, new in renames.items():
        df = df.withColumnRenamed(old, new)
    return flatten_rows(df) if flatten else df
