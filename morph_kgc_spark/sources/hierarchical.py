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
- XML: Spark 4's native XML reader; the XPath iterator's last element
  step becomes the distributed rowTag scan, then ``flatten_xml``
  exposes reference paths as columns — ``name`` (element text,
  including text of elements with attributes via ``_VALUE``), ``@id``
  (attributes, at any depth: ``route/stop/@id``), ``address/city``
  (nested elements) — and explodes multi-valued elements exactly like
  data_file.py:211-251 (one explode per array = cartesian product).

Supported JSON iterator grammar (covers the reference test corpus):
``$``, ``$.*``, ``$[*]``, and dotted paths with optional ``[*]`` on any
step (``$.students[*]``, ``$.a.b[*]``). XPath iterators support element
steps and ``//`` descent; predicates/functions are rejected loudly.
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
        if raw_step in ("*", "[*]"):
            # wildcard over the current nodes: a top-level JSON array is
            # already row-ized by spark.read.json, so '*' mid-path
            # ($.*.author[*]) iterates the rows themselves — no-op
            continue
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


def flatten_rows(df: DataFrame, sep: str = ".",
                 explode_arrays: bool = True) -> DataFrame:
    """Cartesian-flatten: structs → dotted columns, arrays → explode_outer.

    Fixpoint loop — nested arrays multiply rows exactly like the
    reference's ``normalize_hierarchical_data`` product semantics.

    ``explode_arrays=False`` (RML-CC gather rules): structs still flatten
    to dotted columns but array columns stay ARRAYS, preserving document
    order per row — the gather operator then builds collection triples
    with per-row array lambdas instead of explode + re-group (no shuffle
    beyond the source dedup, and rdf:List order is the source order,
    which an exploded DataFrame cannot guarantee).
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
            elif isinstance(field.dataType, ArrayType) and explode_arrays:
                cols.append(F.explode_outer(F.col(f"`{field.name}`")).alias(field.name))
                changed = True
            else:
                cols.append(F.col(f"`{field.name}`"))
        if not changed:
            return df
        df = df.select(*cols)


def json_source(spark: SparkSession, path: str, iterator: str = "$.*",
                multi_line: bool = True, flatten: bool | str = True) -> DataFrame:
    """``flatten`` may be True (full cartesian flatten), False (raw), or
    ``"structs"`` (structs flatten, arrays preserved — gather rules)."""
    df = spark.read.option("multiLine", str(multi_line).lower()).json(path)
    df = apply_iterator(df, iterator)
    if flatten == "structs":
        return flatten_rows(df, explode_arrays=False)
    return flatten_rows(df) if flatten else df


# an XPath iterator step: a plain element name (no predicates/functions)
_XPATH_STEP_RE = re.compile(r"^[A-Za-z_][\w.:-]*$")  # ':' = XML namespaces

# last-step predicate subset: [@attr='v'] / [@attr="v"] / [n]
_XPATH_PRED_RE = re.compile(
    r"^(?P<name>[A-Za-z_][\w.:-]*)\[(?:"
    r"@(?P<attr>[\w.:-]+)\s*=\s*(?P<q>['\"])(?P<val>[^'\"]*)(?P=q)"
    r"|(?P<pos>[1-9]\d*)"
    r")\]$")


def _parse_last_step(iterator: str):
    """(rowTag, predicate | None, parentTag | None) for the LAST step.

    Supported predicates (matching elementpath's behavior on these
    shapes, reference data_file.py:188-253): attribute equality
    ``item[@type='book']`` and position ``item[2]``. Predicates on
    intermediate steps, functions, and anything else stay a loud
    rejection — the honest supported-surface boundary. ``parentTag`` is
    the plain element step preceding the last one (positional
    predicates are evaluated per PARENT context, as XPath requires).
    """
    steps = [s for s in iterator.strip().split("/") if s not in ("", "*")]
    if not steps:
        return None, None, None  # '/' or '/*': the document ROOT
    for s in steps[:-1]:
        if not _XPATH_STEP_RE.match(s) and s != ".":
            raise ValueError(
                f"unsupported XPath step {s!r} in iterator {iterator!r} "
                "(predicates are only supported on the last step)")
    parent = steps[-2] if len(steps) > 1 and \
        _XPATH_STEP_RE.match(steps[-2]) else None
    last = steps[-1]
    if _XPATH_STEP_RE.match(last):
        return last, None, parent
    m = _XPATH_PRED_RE.match(last)
    if m:
        if m.group("attr") is not None:
            return (m.group("name"),
                    ("attr", m.group("attr"), m.group("val")), parent)
        return m.group("name"), ("pos", int(m.group("pos"))), parent
    raise ValueError(
        f"unsupported XPath step {last!r} in iterator {iterator!r} "
        "(only [@attr='v'] and [n] predicates are supported)")


def xpath_row_tag(iterator: str) -> str:
    """Last element step of an XPath iterator → Spark XML rowTag.

    Spark's XML reader matches the rowTag element at any depth, which
    equals the reference's XPath evaluation (data_file.py:205) for the
    absolute/descendant paths RML test cases use (``/students/student``,
    ``//student``, ``students/student``) as long as the tag name is not
    reused at other depths — the common case for data documents.
    Last-step predicates ``[@attr='v']`` / ``[n]`` are supported
    (:func:`_parse_last_step`); other predicate and function forms are
    rejected explicitly. The reference evaluates full XPath 3.0
    driver-side via elementpath (data_file.py:188-253), which cannot be
    pushed into a distributed rowTag scan; the loud error is the honest
    boundary (tests/test_sources.py pins it).
    """
    return _parse_last_step(iterator)[0]


def _xml_leaf_name(name: str) -> str:
    """Rename the last path segment ``_attr`` → ``@attr`` (RML reference
    syntax ``route/stop/@id``); ``_VALUE`` collapses into the parent
    element's own path (XPath ``element`` returns its text); the row
    element's OWN text is XPath self — ``.`` (reference "." in
    rml_spec_example_section_5)."""
    head, _, last = name.rpartition("/")
    if last == "_VALUE":
        return head if head else "."
    if last.startswith("_") and not last.startswith("_corrupt"):
        last = "@" + last[1:]
    return f"{head}/{last}" if head else last


def _xml_leaves(col, dtype, path: str, is_array: bool, out: list) -> None:
    """Collect leaf columns: struct fields descend into ``a/b`` paths;
    arrays stay LISTS until the final per-leaf explode (transform maps
    struct access over array elements; nested arrays flatten)."""
    if isinstance(dtype, ArrayType):
        if is_array:
            col = F.flatten(col)
        _xml_leaves(col, dtype.elementType, path, True, out)
    elif isinstance(dtype, StructType):
        def _get(n):
            # F.transform passes (element, index) to 2-arg lambdas, so the
            # field name must be bound via a closure, not a kwarg default
            return lambda x: x[n]

        for f in dtype.fields:
            sub = (F.transform(col, _get(f.name)) if is_array
                   else col[f.name])
            _xml_leaves(sub, f.dataType, path + "/" + f.name, is_array, out)
    else:
        out.append((_xml_leaf_name(path), col, is_array))


def flatten_xml(df: DataFrame) -> DataFrame:
    """Flatten an XML row per the reference's PER-REFERENCE explode
    semantics (data_file.py:211-251): every leaf path becomes a column,
    multi-valued leaves stay lists, then each list explodes
    INDEPENDENTLY — sibling multi-valued references therefore cross
    (cartesian product), exactly like the reference's sequential
    ``df.explode(reference)`` loop (see xml/attributes: every country
    pairs with every rank when the iterator is the document root).

    Struct-aligned explode would be cheaper at scale but diverges from
    the reference on root-level iterators; rule-level dedup collapses
    the duplicates each rule's projection doesn't need.
    """
    leaves: list = []
    for field in df.schema.fields:
        _xml_leaves(F.col(f"`{field.name}`"), field.dataType,
                    field.name, False, leaves)
    df = df.select(*[col.alias(name) for name, col, _ in leaves])
    for name, _, is_array in leaves:
        if is_array:
            df = df.withColumn(name, F.explode_outer(F.col(f"`{name}`")))
    return df


def _sniff_root_tag(path: str) -> str:
    """Root element name from the document head (for '/*' iterators).

    Driver-side peek of ≤64 KB — on a DFS cluster this becomes a ranged
    read of the first block; the tag is in the first bytes either way.
    """
    with open(path, "rb") as f:
        head = f.read(65536).decode("utf-8", "replace")
    head = re.sub(r"<\?.*?\?>|<!--.*?-->|<!DOCTYPE[^>]*>", "", head,
                  flags=re.DOTALL)
    m = re.search(r"<([A-Za-z_][\w.-]*)[\s>/]", head)
    if not m:
        raise ValueError(f"cannot find a root element in {path!r}")
    return m.group(1)


def _positional_child_rows(spark: SparkSession, path: str, parent_tag: str,
                           child_tag: str, pos: int) -> DataFrame:
    """Rows for ``parent/child[pos]``: the n-th CHILD of each parent.

    XPath positional predicates count within the parent context, so the
    scan uses the PARENT as the rowTag and selects the n-th child
    element per parent row — ``/shelf/book[2]`` yields the 2nd book of
    EVERY shelf, not the 2nd book in the document. A global row_number
    over a distributed scan would silently return the latter (the bug
    the round-4 self-review caught).
    """
    from pyspark.sql.types import StructType as _St

    base = (spark.read.format("xml").option("rowTag", parent_tag)
            .option("inferSchema", "false").load(path))
    if child_tag not in base.columns:
        return base.select().where(F.lit(False))  # no such children
    dtype = base.schema[child_tag].dataType
    if isinstance(dtype, ArrayType):
        # try_element_at: a parent with fewer than pos children simply
        # contributes no row (plain element_at raises out-of-bounds)
        sel = F.try_element_at(F.col(f"`{child_tag}`"), F.lit(pos))
        dtype = dtype.elementType
    else:
        # a single child element: only position 1 exists
        sel = F.col(f"`{child_tag}`") if pos == 1 else \
            F.lit(None).cast(dtype)
    picked = base.select(sel.alias("__row")) \
                 .where(F.col("__row").isNotNull())
    if isinstance(dtype, _St):
        return picked.select("__row.*")
    # text-only child (<book>A</book> scans as a primitive): expose it
    # as _VALUE so the flattener maps it to the '.' self-reference
    return picked.select(F.col("__row").alias("_VALUE"))


def _apply_xpath_predicate(df: DataFrame, predicate, row_tag: str,
                           iterator: str) -> DataFrame:
    """Post-scan filter for a supported last-step predicate.

    ``[@attr='v']``: equality on the row element's own attribute (the
    scan exposes it as ``_attr``); an absent attribute never matches,
    like elementpath. ``[n]`` reaches here only when the iterator has
    NO parent step (``//book[2]``): with no parent context the n-th
    matched element in document order is the only consistent reading —
    evaluated via the scan's row order (single-file test-scale
    sources). Parent-scoped iterators take the per-parent path in
    :func:`_positional_child_rows` instead.
    """
    if predicate[0] == "attr":
        _, attr, val = predicate
        col = f"_{attr}"
        if col not in df.columns:
            return df.where(F.lit(False))
        return df.where(F.col(f"`{col}`").cast("string") == F.lit(val))
    _, pos = predicate
    from pyspark.sql.window import Window

    w = Window.orderBy(F.monotonically_increasing_id())
    return (df.withColumn("__xp_pos", F.row_number().over(w))
            .where(F.col("__xp_pos") == pos).drop("__xp_pos"))


def xml_source(spark: SparkSession, path: str, row_tag: str | None = None,
               iterator: str | None = None, flatten: bool = True) -> DataFrame:
    """XML scan with an XPath iterator (subset) per reference
    data_file.py:188-253. ``iterator`` (e.g. ``/students/student``)
    derives the rowTag; references then address flattened columns:
    ``name``, ``@id``, ``address/city``, ``route/stop/@id``."""
    predicate = parent_tag = None
    if row_tag is None:
        if iterator is None:
            raise ValueError("xml source needs rowTag or iterator")
        row_tag, predicate, parent_tag = _parse_last_step(iterator)
        row_tag = row_tag or _sniff_root_tag(path)
    if predicate is not None and predicate[0] == "pos" and parent_tag:
        # per-parent positional semantics: scan the PARENT as the row
        # and pick the n-th child within each parent element
        df = _positional_child_rows(spark, path, parent_tag, row_tag,
                                    predicate[1])
    else:
        # inferSchema off: XPath semantics are lexical — "30.0E0" must
        # stay the string "30.0E0", not double 30.0 (RMLTC0005a)
        df = (spark.read.format("xml").option("rowTag", row_tag)
              .option("inferSchema", "false").load(path))
        if predicate is not None:
            df = _apply_xpath_predicate(df, predicate, row_tag, iterator)
    if not flatten:
        return df
    df = flatten_xml(df)
    # the reference accepts both `country/@name` and `country@name`
    # (data_file.py:215 replaces '/@' with '@') — expose both spellings
    for c in df.columns:
        alt = c.replace("/@", "@")
        if alt != c and alt not in df.columns:
            df = df.withColumn(alt, F.col(f"`{c}`"))
    return df
