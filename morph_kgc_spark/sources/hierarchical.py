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
steps, ``//`` descent, ``*`` wildcards (schema-side branch expansion),
and per-step ``[@attr='v']`` / ``[text()='v']`` / ``[contains(@attr,
'v')]`` / ``[n]`` predicates; axes and other functions are rejected
loudly.
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

# per-step predicate subset: [@attr='v'] / [text()='v'] /
# [contains(@attr,'v')] / [n] (single or double quotes throughout)
_XPATH_PRED_RE = re.compile(
    r"^(?P<name>[A-Za-z_][\w.:-]*)\[(?:"
    r"@(?P<attr>[\w.:-]+)\s*=\s*(?P<q>['\"])(?P<val>[^'\"]*)(?P=q)"
    r"|text\(\)\s*=\s*(?P<tq>['\"])(?P<tval>[^'\"]*)(?P=tq)"
    r"|contains\(\s*@(?P<cattr>[\w.:-]+)\s*,\s*"
    r"(?P<cq>['\"])(?P<cval>[^'\"]*)(?P=cq)\s*\)"
    r"|(?P<pos>[1-9]\d*)"
    r")\]$")


def _parse_xpath(iterator: str) -> list[tuple]:
    """Parse an XPath iterator into ``[(name, pred, descendant)]`` steps.

    ``pred`` is ``None``, ``("attr", name, value)``,
    ``("text", value)`` (``[text()='v']``),
    ``("attr_contains", name, value)`` (``[contains(@attr,'v')]``) or
    ``("pos", n)`` — the supported predicate subset, allowed on ANY
    step (reference evaluates full XPath 3.0 via elementpath,
    data_file.py:188-253; this chain matches it on
    ``/a[@x='1']/b[text()='y']/c[2]`` shapes). ``descendant`` marks a
    step preceded by ``//`` (its parent is unknown). ``name`` is
    ``None`` for a ``*`` wildcard step; ``.`` self steps are dropped
    (they do not move the context). Other functions, axes, and
    multi-clause predicate forms raise.
    """
    steps: list[tuple] = []
    toks = iterator.strip().split("/")
    desc = False
    for i, s in enumerate(toks):
        if s == "":
            if i > 0:
                desc = True  # '//' descendant marker
            continue
        if s == ".":
            continue  # self step: context unchanged, parent chain intact
        if s == "*":
            steps.append((None, None, desc))
        elif _XPATH_STEP_RE.match(s):
            steps.append((s, None, desc))
        else:
            m = _XPATH_PRED_RE.match(s)
            if not m:
                raise ValueError(
                    f"unsupported XPath step {s!r} in iterator {iterator!r} "
                    "(only [@attr='v'], [text()='v'], "
                    "[contains(@attr,'v')] and [n] predicates are "
                    "supported)")
            if m.group("attr") is not None:
                pred = ("attr", m.group("attr"), m.group("val"))
            elif m.group("tq") is not None:
                pred = ("text", m.group("tval"))
            elif m.group("cattr") is not None:
                pred = ("attr_contains", m.group("cattr"), m.group("cval"))
            else:
                pred = ("pos", int(m.group("pos")))
            steps.append((m.group("name"), pred, desc))
        desc = False
    return steps


def xpath_row_tag(iterator: str) -> str:
    """rowTag for an XPath iterator (the deepest named element step).

    Spark's XML reader matches the rowTag element at any depth, which
    equals the reference's XPath evaluation (data_file.py:205) for the
    absolute/descendant paths RML test cases use (``/students/student``,
    ``//student``, ``students/student``) as long as the tag name is not
    reused at other depths — the common case for data documents.
    Predicates ``[@attr='v']`` / ``[n]`` are supported on any step
    (:func:`_parse_xpath` / :func:`xml_source`); other predicate and
    function forms are rejected explicitly. The reference evaluates full
    XPath 3.0 driver-side via elementpath (data_file.py:188-253), which
    cannot be pushed into a distributed rowTag scan; the loud error is
    the honest boundary (tests/test_sources.py pins it).
    """
    steps = [s for s in _parse_xpath(iterator) if s[0] is not None]
    return steps[-1][0] if steps else None


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


def _empty_nodes(df: DataFrame) -> DataFrame:
    """Zero rows with a ``_VALUE`` string column: the empty node-set.

    elementpath yields an empty sequence when a path step matches
    nothing; downstream (flatten → reference resolution) then produces
    zero triples. A zero-COLUMN frame instead crashes reference
    resolution on missing columns (round-4 advice) — ``_VALUE`` maps to
    the ``.`` self-reference, the one name every element can answer.
    """
    return df.where(F.lit(False)).select(
        F.lit(None).cast("string").alias("_VALUE"))


def _strip_node(cur: DataFrame, in_node: bool) -> DataFrame:
    """Normalize a descent context to plain columns so a recursive
    branch descent can restart with column-level steps: mid-descent the
    current element lives in the ``__n`` struct — projecting its fields
    (attributes included) makes them addressable as ordinary columns."""
    if not in_node:
        return cur
    node_t = cur.schema["__n"].dataType
    if isinstance(node_t, StructType):
        return cur.select("__n.*")
    # primitive element: no element children; expose text for _VALUE
    return cur.select(F.col("__n").alias("_VALUE"))


def _elem_pred(elem_dt, pred):
    """Per-element boolean Column builder for VALUE predicates
    (``attr`` / ``attr_contains`` / ``text``), or ``None`` when the
    predicate can never match under this element type (absent attribute
    / childless text — elementpath's empty-sequence comparison is
    false, so the caller returns the empty node-set).

    ``text()`` addresses the element's own text: the ``_VALUE`` struct
    field when the element also has attributes/children, else the
    primitive value itself (how the scan types a text-only element).
    """
    from pyspark.sql.types import StructType as _St

    if pred[0] in ("attr", "attr_contains"):
        attr_f = "_" + pred[1]
        if not (isinstance(elem_dt, _St) and attr_f in elem_dt.fieldNames()):
            return None
        if pred[0] == "attr":
            return lambda e: e[attr_f].cast("string") == F.lit(pred[2])
        return lambda e: F.contains(e[attr_f].cast("string"),
                                    F.lit(pred[2]))
    if pred[0] == "text":
        if isinstance(elem_dt, _St):
            if "_VALUE" not in elem_dt.fieldNames():
                return None
            return lambda e: e["_VALUE"].cast("string") == F.lit(pred[1])
        return lambda e: e.cast("string") == F.lit(pred[1])
    return None


_VALUE_PREDS = ("attr", "attr_contains", "text")


def _child_elems(cur: DataFrame, in_node: bool) -> dict:
    """Element-child fields of the current context (name → dataType).

    Attribute fields (``_attr``) and the text field (``_VALUE``) are
    excluded — the scan encodes them with a leading underscore, so an
    XML element whose own name starts with ``_`` is indistinguishable
    and not reachable through wildcard/descendant steps (named steps
    still find it)."""
    from pyspark.sql.types import StructType as _St

    if not in_node:
        return {f.name: f.dataType for f in cur.schema.fields
                if not f.name.startswith("_")}
    node_t = cur.schema["__n"].dataType
    if not isinstance(node_t, _St):
        return {}
    return {n: node_t[n].dataType for n in node_t.fieldNames()
            if not n.startswith("_")}


def _desc_paths(children: dict, name: str | None) -> list[tuple]:
    """All element-field paths from the current context whose final
    field is ``name`` (any element when ``None``), every depth ≥ 1 —
    the schema-side enumeration of a descendant step. The walk is over
    the (driver-side, finite) inferred struct schema, never the data."""
    from pyspark.sql.types import StructType as _St

    out: list[tuple] = []
    stack: list[tuple] = [((), children)]
    while stack:
        prefix, kids = stack.pop()
        for f, dt in kids.items():
            p = prefix + (f,)
            if name is None or f == name:
                out.append(p)
            inner = dt.elementType if isinstance(dt, ArrayType) else dt
            if isinstance(inner, _St):
                stack.append((p, {n: inner[n].dataType
                                  for n in inner.fieldNames()
                                  if not n.startswith("_")}))
    return sorted(out)


def _descend_steps(df: DataFrame, steps: list[tuple],
                   _as_branch: bool = False):
    """Navigate scan rows down a chain of steps with predicates.

    XPath evaluates each step within its PARENT context —
    ``/shelf/book[2]`` is the 2nd book of EVERY shelf, not the 2nd book
    in the document — so positional predicates use per-parent
    ``try_element_at`` and attribute predicates filter the child array
    per row (absent attribute never matches, like elementpath). All
    per-row Column work: fully distributed, no window over a global
    order.

    Wildcard (``*``) and descendant (``//``) steps are expanded
    DRIVER-SIDE against the inferred schema into the concrete child
    chains they can match (:func:`_desc_paths`), each branch descended
    independently and the results unioned by name — rows never leave
    the executors, and the branch count is bounded by the schema, not
    the data. Two caveats, both documented limits: document order is
    not preserved ACROSS branches (within one branch the per-parent
    array order survives), and a positional predicate directly on a
    wildcard step is rejected loudly (the typed representation does
    not record sibling interleaving across different tags).

    ``_as_branch=True`` (internal) returns ``None`` instead of the
    empty node-set so a parent expansion can skip dead branches rather
    than union their ``_VALUE`` schema in.
    """
    from pyspark.sql.types import StructType as _St

    def _nomatch(frame):
        return None if _as_branch else _empty_nodes(frame)

    cur, in_node = df, False
    for idx, (name, pred, desc) in enumerate(steps):
        if desc or name is None:
            if pred is not None and pred[0] == "pos" and name is None:
                raise ValueError(
                    "positional predicate on a wildcard step is "
                    "unsupported (sibling order across different tags "
                    "is not represented)")
            children = _child_elems(cur, in_node)
            paths = (_desc_paths(children, name) if desc
                     else [(f,) for f in sorted(children)
                           if name is None or f == name])
            rest = steps[idx + 1:]
            branches = []
            for p in paths:
                chain = ([(s, None, False) for s in p[:-1]]
                         + [(p[-1], pred, False)] + rest)
                b = _descend_steps(_strip_node(cur, in_node), chain,
                                   _as_branch=True)
                if b is not None:
                    branches.append(b)
            if not branches:
                return _nomatch(cur)
            from pyspark.errors import AnalysisException

            out = branches[0]
            for b in branches[1:]:
                try:
                    out = out.unionByName(b, allowMissingColumns=True)
                except AnalysisException as exc:
                    # two branches can reach same-named columns with
                    # incompatible types (e.g. <d>x</d> vs <d k="1">y</d>
                    # → string vs struct); surface the module's loud
                    # contract instead of Spark's union analysis error
                    raise ValueError(
                        f"wildcard/descendant expansion of {steps!r} "
                        "reaches elements whose same-named columns have "
                        "incompatible types across branches; narrow the "
                        "iterator to one concrete path") from exc
            return out
        if not in_node:
            dtypes = {f.name: f.dataType for f in cur.schema.fields}
            if name not in dtypes:
                return _nomatch(cur)
            col, dt = F.col(f"`{name}`"), dtypes[name]
        else:
            node_t = cur.schema["__n"].dataType
            if not isinstance(node_t, _St) or name not in node_t.fieldNames():
                return _nomatch(cur)
            col, dt = F.col("__n")[name], node_t[name].dataType
        if isinstance(dt, ArrayType):
            elem = dt.elementType
            if pred is not None and pred[0] == "pos":
                # try_element_at: a parent with fewer than pos children
                # contributes no row (element_at would raise)
                cur = (cur.select(F.try_element_at(col, F.lit(pred[1]))
                                  .alias("__n"))
                       .where(F.col("__n").isNotNull()))
            elif pred is not None and pred[0] in _VALUE_PREDS:
                fn = _elem_pred(elem, pred)
                if fn is None:
                    return _nomatch(cur)
                cur = (cur.select(F.explode_outer(F.filter(col, fn))
                                  .alias("__n"))
                       .where(F.col("__n").isNotNull()))
            else:
                cur = (cur.select(F.explode_outer(col).alias("__n"))
                       .where(F.col("__n").isNotNull()))
        else:
            # single child element: position 1 is the only one
            if pred is not None and pred[0] == "pos" and pred[1] != 1:
                return _nomatch(cur)
            cur = cur.select(col.alias("__n")) \
                     .where(F.col("__n").isNotNull())
            if pred is not None and pred[0] in _VALUE_PREDS:
                fn = _elem_pred(dt, pred)
                if fn is None:
                    return _nomatch(cur)
                cur = cur.where(fn(F.col("__n")))
        in_node = True
    if not in_node:
        return df
    node_t = cur.schema["__n"].dataType
    if isinstance(node_t, _St):
        return cur.select("__n.*")
    # text-only element (<book>A</book> scans as a primitive): expose it
    # as _VALUE so the flattener maps it to the '.' self-reference
    return cur.select(F.col("__n").alias("_VALUE"))


def _attr_row_filter(df: DataFrame, pred) -> DataFrame:
    """Value predicate on the scan's own row element: the scan exposes
    attributes as ``_attr`` columns and the element's own text as
    ``_VALUE`` (or as the whole primitive row for text-only elements);
    an absent attribute / text never matches (elementpath)."""
    if pred[0] == "text":
        if "_VALUE" not in df.columns:
            return df.where(F.lit(False))
        return df.where(
            F.col("`_VALUE`").cast("string") == F.lit(pred[1]))
    col = "_" + pred[1]
    if col not in df.columns:
        return df.where(F.lit(False))
    if pred[0] == "attr_contains":
        return df.where(
            F.contains(F.col(f"`{col}`").cast("string"), F.lit(pred[2])))
    return df.where(F.col(f"`{col}`").cast("string") == F.lit(pred[2]))


def xml_source(spark: SparkSession, path: str, row_tag: str | None = None,
               iterator: str | None = None, flatten: bool = True) -> DataFrame:
    """XML scan with an XPath iterator (subset) per reference
    data_file.py:188-253. ``iterator`` (e.g. ``/students/student``)
    derives the rowTag; references then address flattened columns:
    ``name``, ``@id``, ``address/city``, ``route/stop/@id``.

    Predicates ``[@attr='v']`` / ``[text()='v']`` /
    ``[contains(@attr,'v')]`` / ``[n]`` are supported on ANY step
    (``/a[@x='1']/b[text()='y']/c[2]``): the scan's rowTag is the first
    predicated step (its parent for positional predicates — XPath
    counts within the parent context) and the remaining steps navigate
    the typed row struct per row (:func:`_descend_steps`), fully
    distributed. Wildcard (``*``) and mid-chain descendant (``//``)
    steps are expanded against the inferred schema into concrete
    branches (:func:`_desc_paths`) — ``/a/*/c[2]``, ``/shelf//book[2]``
    and ``/a/b/*`` all navigate per-row; document order is not
    preserved ACROSS expansion branches.
    Still rejected loudly: parentless positional descendants
    (``//book[2]`` — the document root may itself be the element, and
    elementpath's document-node parent context cannot be reproduced
    from a rowTag scan), positional predicates directly on a wildcard
    step (sibling interleaving across tags is not represented), and
    descendant-from-root forms that could address the root element
    itself.
    """

    def _scan(tag: str) -> DataFrame:
        # inferSchema off: XPath semantics are lexical — "30.0E0" must
        # stay the string "30.0E0", not double 30.0 (RMLTC0005a)
        return (spark.read.format("xml").option("rowTag", tag)
                .option("inferSchema", "false").load(path))

    if row_tag is not None:
        df = _scan(row_tag)
    else:
        if iterator is None:
            raise ValueError("xml source needs rowTag or iterator")
        steps = _parse_xpath(iterator)
        absolute = iterator.lstrip().startswith("/")
        pred_idx = [i for i, s in enumerate(steps) if s[1] is not None]

        def _root_descend() -> DataFrame:
            """Universal fallback: scan the document root, consume an
            ABSOLUTE first step addressing the root element itself
            (``/name[n]`` matches only when the root carries that name
            and only at position 1 — elementpath; a child-descent here
            silently returned the wrong node set), then navigate the
            remaining steps schema-side."""
            root = _sniff_root_tag(path)
            rdf_ = _scan(root)
            if not steps:
                return rdf_
            if absolute:
                name0, pred0, desc0 = steps[0]
                if desc0 and (name0 is None or name0 == root):
                    raise ValueError(
                        f"descendant-from-root step in {iterator!r} may "
                        "address the root element itself, which a rowTag "
                        "scan cannot represent; unsupported")
                if desc0:
                    return _descend_steps(rdf_, steps)
                if name0 is not None and name0 != root:
                    return _empty_nodes(rdf_)
                if pred0 is not None:
                    if pred0[0] == "pos":
                        if pred0[1] != 1:
                            return _empty_nodes(rdf_)
                    else:
                        rdf_ = _attr_row_filter(rdf_, pred0)
                return _descend_steps(rdf_, steps[1:])
            # relative path: steps are children of the root
            return _descend_steps(rdf_, steps)

        if not pred_idx:
            named_idx = [i for i, s in enumerate(steps) if s[0] is not None]
            # The rowTag shortcut (scan at the deepest named step, which
            # matches at any depth — the documented approximation for
            # plain named chains) is only taken when every step up to
            # that deepest named one is named and non-descendant. A
            # leading '//' is exempt ONLY when step 0 IS the deepest
            # named step (bare '//book': any-depth is exactly its
            # semantics) — '//shelf/book' must branch-expand or it
            # would select books outside shelves while its predicated
            # twin '//shelf/book[1]' selects correctly (round-6 review,
            # second pass). Any mid-chain '//' or '*' before the
            # deepest named step likewise takes the exact schema-side
            # branch expansion.
            prefix_simple = bool(named_idx) and all(
                s[0] is not None
                and (not s[2] or (i == 0 and named_idx[-1] == 0))
                for i, s in enumerate(steps[:named_idx[-1] + 1]))
            if not named_idx:
                # pure wildcard chains: '/*' is the root element itself,
                # '/*/*' its grandchildren; '//*' could address the root
                if any(s[2] for s in steps):
                    raise ValueError(
                        f"descendant wildcard with no named step in "
                        f"{iterator!r} is unsupported (may address the "
                        "document root itself)")
                df = _root_descend()
            elif not prefix_simple:
                # mid-chain descendant/wildcard: exact navigation from
                # the document root (branch expansion in _descend_steps)
                df = _root_descend()
            elif named_idx[-1] == len(steps) - 1:
                # ends in a named step: distributed rowTag scan at the
                # deepest element name (matches at any depth, the
                # documented approximation for named chains)
                df = _scan(steps[-1][0])
            else:
                # wildcard/descendant TAIL ('/a/b/*', 'a/b//*'): scan
                # the deepest named step, navigate the rest per row
                df = _descend_steps(_scan(steps[named_idx[-1]][0]),
                                    steps[named_idx[-1] + 1:])
        else:
            i0 = pred_idx[0]
            name, pred, desc = steps[i0]
            if pred[0] == "pos" and desc and i0 == 0:
                raise ValueError(
                    f"positional predicate on a parentless descendant "
                    f"step in {iterator!r} is unsupported (parent "
                    "context unknown; elementpath counts per parent)")
            if pred[0] == "pos" and name is None:
                raise ValueError(
                    f"positional predicate on a wildcard step in "
                    f"{iterator!r} is unsupported (sibling order across "
                    "different tags is not represented)")
            if pred[0] in _VALUE_PREDS and name is not None:
                # scan AT the predicated element, filter its own
                # attribute / text per row
                df = _descend_steps(_attr_row_filter(_scan(name), pred),
                                    steps[i0 + 1:])
            elif i0 > 0 and steps[i0 - 1][0] is not None:
                # positional on a named step, or value-pred on a
                # wildcard: scan the nearest named ancestor, navigate
                # down (descendant steps search below it schema-side)
                df = _descend_steps(_scan(steps[i0 - 1][0]), steps[i0:])
            else:
                df = _root_descend()
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
