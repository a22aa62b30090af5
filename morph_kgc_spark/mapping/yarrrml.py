"""YARRRML front-end: YAML mapping documents → flat Rule table.

The reference translates YARRRML to an RML rdflib graph and re-parses it
(src/morph_kgc/mapping/yarrrml.py:426-589). Here the normalized YAML
compiles straight to :class:`morph_kgc_spark.model.Rule` — the same IR
the Turtle parser emits — so every downstream Spark plan (joins, quoted
maps, partitioning) is shared.

Supported YARRRML surface (mirroring the reference's normalizer,
yarrrml.py:86-378):
- key aliases: mapping(s)/m, subject(s)/s, predicateobject(s)/po,
  predicate(s)/p, object(s)/o, graph(s)/g, inversepredicate(s)/i,
  fn/f → function, pms → parameters, pm → parameter, v → value
- prefixes (+ defaults rml/xsd/rdfs/fno) expanded in all string values
- sources: named top-level sources, access/query/table/iterator dicts,
  and the ``['file.csv~csv', '$.iterator']`` shortcut
- list-valued sources / subjects / predicateobjects / predicates /
  objects / graphs expand into independent rules
- po shortcuts ``[p, o]`` and ``[p, o, lang~lang|datatype]``; object
  lists of ``[value, lang~lang|datatype]`` pairs; ``~iri`` / ``~literal``
  / ``~blanknode`` termtype suffixes; po-level type/datatype/language
- referencing object maps (``mappings:`` + ``condition`` equal(str1,str2))
- RML-star: ``quoted`` / ``quotedNonAsserted`` in subject & object maps
- FnO functions (``function`` + ``parameters``), composite allowed
- inverse predicates (object/subject swap)
"""

from __future__ import annotations

import os
from typing import Any

from morph_kgc_spark import model as M
from morph_kgc_spark.mapping.parser import (
    _EXT_KIND,
    _param_name,
    _resolve_quoted,
)
from morph_kgc_spark.mapping.turtle import RDF_TYPE

_DEFAULT_PREFIXES = {
    "rml": "http://w3id.org/rml/",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "fno": "https://w3id.org/function/ontology#",
}

_KEY_ALIASES = {
    "mapping": "mappings", "m": "mappings",
    "subject": "subjects", "s": "subjects",
    "predicateobject": "predicateobjects", "po": "predicateobjects",
    "predicate": "predicates", "p": "predicates",
    "inversepredicate": "inversepredicates", "i": "inversepredicates",
    "object": "objects", "o": "objects",
    "graph": "graphs", "g": "graphs",
    "fn": "function", "f": "function",
    "pms": "parameters", "pm": "parameter", "v": "value",
    "author": "authors",
}


def _normalize_keys(node: Any) -> Any:
    if isinstance(node, dict):
        out = {}
        for k, v in node.items():
            out[_KEY_ALIASES.get(k, k)] = _normalize_keys(v)
        return out
    if isinstance(node, list):
        return [_normalize_keys(v) for v in node]
    return node


def _expand_prefixes(node: Any, prefixes: dict[str, str]) -> Any:
    if isinstance(node, dict):
        return {k: _expand_prefixes(v, prefixes) for k, v in node.items()}
    if isinstance(node, list):
        return [_expand_prefixes(v, prefixes) for v in node]
    if isinstance(node, str):
        for p, iri in prefixes.items():
            if node.startswith(p + ":"):
                return iri + node[len(p) + 1:]
    return node


def _as_list(v: Any) -> list:
    return v if isinstance(v, list) else [v]


def _expand_source_shortcut(source: Any) -> Any:
    """['file.csv~csv', '$.it'] → {access, referenceFormulation, iterator}."""
    if isinstance(source, list):
        first = source[0]
        if "~" in first:
            access, rf = first.split("~", 1)
            out = {"access": access, "referenceFormulation": rf}
        else:
            out = {"access": first}
        if len(source) == 2:
            out["iterator"] = source[1]
        return out
    return source


def _source_to_model(source: dict, base_dir: str) -> M.Source:
    if "query" in source:
        return M.Source("sql", source["query"])
    if "table" in source:
        return M.Source("table", source["table"])
    path = source.get("access")
    if path is None:
        raise ValueError(f"YARRRML source without access/query/table: {source}")
    if not os.path.isabs(path):
        path = os.path.join(base_dir, path)
    ext = os.path.splitext(path)[1].lower()
    rf = str(source.get("referenceFormulation", "")).lower()
    kind = _EXT_KIND.get(ext, "csv")
    if rf.endswith("jsonpath"):
        kind = "json"
    elif rf.endswith("xpath"):
        kind = "xml"
    options: dict = {}
    if ext == ".tsv":
        options["sep"] = "\t"
    if "iterator" in source:
        options["iterator"] = source["iterator"]
    return M.Source(kind, path, options)


# ---------------------------------------------------------------------------
# term-map construction
# ---------------------------------------------------------------------------

_TERMTYPES = {"iri": M.IRI, "literal": M.LITERAL, "blanknode": M.BLANK_NODE}


def _template_to_term(value: str, default_termtype: str) -> M.TermMap:
    """$(ref)-style YARRRML template → TermMap (yarrrml.py:65-83):
    a lone ``$(x)`` is a reference; with surrounding text a template;
    with no reference a constant (IRI when it looks like one)."""
    value = str(value)
    if value == "a":
        return M.TermMap(M.CONSTANT, RDF_TYPE, M.IRI)
    n_refs = value.count("$(")
    if value.startswith("$(") and n_refs == 1 and value.endswith(")"):
        return M.TermMap(M.REFERENCE, value[2:-1], default_termtype)
    if n_refs:
        rml_tpl = ""
        rest = value
        while "$(" in rest:
            pre, rest = rest.split("$(", 1)
            ref, rest = rest.split(")", 1)
            rml_tpl += pre + "{" + ref + "}"
        rml_tpl += rest
        return M.TermMap(M.TEMPLATE, rml_tpl, default_termtype)
    if value.startswith(("http://", "https://", "ftp://")):
        return M.TermMap(M.CONSTANT, value, M.IRI)
    return M.TermMap(M.CONSTANT, value, M.LITERAL)


def _function_term(spec: dict, termtype: str) -> M.TermMap:
    """function + parameters → EXECUTION TermMap (composite allowed)."""
    fn = spec["function"]
    params = spec.get("parameters", [])
    if not params and fn.endswith(")"):
        # inline form fn:toUpper(valueParam=$(name)) — YARRRML ex. 99/101
        fn_id, _, arg_s = fn.partition("(")
        args = []
        for part in arg_s[:-1].replace(" ", "").split(","):
            if not part:
                continue
            pname, _, pval = part.partition("=")
            args.append({"parameter": pname, "value": pval})
        params, fn = args, fn_id
    arg_maps = []
    for p in params:
        if isinstance(p, list):
            p = {"parameter": p[0], "value": p[1]}
        pname = _param_name(str(p["parameter"]))
        pval = p["value"]
        if isinstance(pval, dict) and "function" in pval:
            arg_maps.append((pname, _function_term(pval, M.LITERAL)))
        else:
            arg_maps.append((pname, _template_to_term(pval, M.LITERAL)))
    return M.TermMap(M.EXECUTION, fn, termtype, args=tuple(arg_maps))


def _join_conditions(spec: dict) -> tuple[M.JoinCondition, ...]:
    """condition: {function: equal, parameters: [[str1,$(c)],[str2,$(p)]]}."""
    cond = spec.get("condition")
    if cond is None:
        return ()
    child = parent = None
    for p in cond.get("parameters", []):
        if isinstance(p, dict):
            key, val = p.get("parameter"), p.get("value")
        else:
            key, val = p[0], p[1]
        ref = str(val)
        ref = ref[2:-1] if ref.startswith("$(") else ref
        if str(key).endswith("str1"):
            child = ref
        elif str(key).endswith("str2"):
            parent = ref
    if child is None or parent is None:
        raise ValueError(f"join condition needs str1+str2 parameters: {cond}")
    return (M.JoinCondition(child, parent),)


def _object_term(spec: Any) -> dict:
    """Object value dict → Rule kwargs (object/datatype/language)."""
    if isinstance(spec, str):
        spec = {"value": spec}
    kw: dict = {}
    termtype = _TERMTYPES.get(spec.get("type", ""), None)
    if "language" in spec:
        # dynamic tags ($(ref)~lang) become language MAPS — reference
        # yarrrml_parser language handling (json/complex mapping.yaml
        # uses $(language.code)~lang)
        lang = spec["language"]
        if "$(" in str(lang):
            kw["language"] = _template_to_term(lang, M.LITERAL) \
                .but(termtype=M.LITERAL)
        else:
            kw["language"] = M.TermMap(M.CONSTANT, lang, M.LITERAL)
    elif "datatype" in spec:
        dt = spec["datatype"]
        if "$(" in str(dt):
            kw["datatype"] = _template_to_term(dt, M.IRI).but(termtype=M.IRI)
        else:
            kw["datatype"] = M.TermMap(M.CONSTANT, dt, M.IRI)
    if "function" in spec:
        kw["object"] = _function_term(spec, termtype or M.LITERAL)
        return kw
    # RML object-position defaults (reference _complete_termtypes):
    # reference → Literal, template → IRI unless language/datatype bound,
    # constant decided by _template_to_term (IRI-looking → IRI)
    tm = _template_to_term(spec["value"], M.LITERAL)
    if termtype is not None:
        tm = tm.but(termtype=termtype)
    elif kw:
        tm = tm.but(termtype=M.LITERAL)
    elif tm.kind == M.TEMPLATE:
        tm = tm.but(termtype=M.IRI)
    kw["object"] = tm
    return kw


# ---------------------------------------------------------------------------
# normalization of the mapping dict
# ---------------------------------------------------------------------------


def _split_termtype(value: str) -> dict:
    for tt in ("iri", "literal", "blanknode"):
        if value.endswith("~" + tt):
            return {"value": value[: -(len(tt) + 1)], "type": tt}
    return {"value": value}


def _normalize_pos(po: Any) -> list[dict]:
    """One predicateobjects entry → list of {predicates, objects, graphs}
    dicts with scalar predicates and object dicts."""
    if isinstance(po, list):  # shortcut [p, o] or [p, o, lang~lang|dt]
        if len(po) == 2:
            po = {"predicates": po[0], "objects": po[1]}
        else:
            p, o, third = po
            obj = {"value": o}
            if isinstance(third, str) and third.endswith("~lang"):
                obj["language"] = third[:-5]
            else:
                obj["datatype"] = third
            po = {"predicates": p, "objects": obj}
    out = []
    preds = _as_list(po.get("predicates", []))
    objects = po.get("objects", [])
    if isinstance(objects, list) and objects and isinstance(objects[0], list):
        # [[value, lang~lang|dt], ...] — YARRRML spec example 83
        expanded = []
        for val, third in objects:
            if isinstance(third, str) and third.endswith("~lang"):
                expanded.append({"value": val, "language": third[:-5]})
            else:
                expanded.append({"value": val, "datatype": third})
        objects = expanded
    graphs = _as_list(po.get("graphs", []))
    inv = _as_list(po.get("inversepredicates", []))
    for pred in preds:
        for obj in _as_list(objects):
            if isinstance(obj, str):
                obj = _split_termtype(obj)
            # po-level type/datatype/language (YARRRML spec ex. 68)
            for prop in ("type", "datatype", "language"):
                if prop in po and prop not in obj:
                    obj[prop] = po[prop]
            out.append({"predicate": pred, "object": obj, "graphs": graphs,
                        "inversepredicates": inv})
    return out


def parse_yarrrml(mapping: str, base_dir: str = ".") -> list[M.Rule]:
    """Compile a YARRRML document (YAML text or path) to Rules."""
    import yaml

    if "\n" not in mapping and os.path.exists(mapping):
        base_dir = os.path.dirname(os.path.abspath(mapping))
        with open(mapping, encoding="utf-8") as f:
            mapping = f.read()
    doc = yaml.safe_load(mapping)
    if not isinstance(doc, dict) or "mappings" not in _normalize_keys(
            {k: None for k in doc}):
        raise ValueError("not a YARRRML document (no mappings key)")
    doc = _normalize_keys(doc)
    prefixes = dict(_DEFAULT_PREFIXES)
    prefixes.update(doc.get("prefixes") or {})
    doc = _expand_prefixes(doc, prefixes)

    named_sources = {
        k: _expand_source_shortcut(v)
        for k, v in (doc.get("sources") or {}).items()
    }

    mappings: dict[str, dict] = doc["mappings"]

    # pre-resolve each mapping's source + subject spec
    tm_sources: dict[str, M.Source] = {}
    tm_subjects: dict[str, Any] = {}
    for tm_id, mv in mappings.items():
        raw_sources = _as_list(mv.get("sources"))
        if not raw_sources or raw_sources == [None]:
            raise ValueError(f"mapping {tm_id!r} without sources")
        src = raw_sources[0]  # list-valued sources: one rule set per source
        if len(raw_sources) > 1:
            raise NotImplementedError(
                "multiple sources per YARRRML mapping not supported yet")
        if isinstance(src, str):
            # a bare string is a named-source reference; tolerate the
            # common 'file.csv~csv' inline shorthand too
            if src in named_sources:
                src = named_sources[src]
            else:
                src = _expand_source_shortcut([src])
        src = _expand_source_shortcut(src)
        tm_sources[tm_id] = _source_to_model(src, base_dir)
        tm_subjects[tm_id] = mv.get("subjects")

    def subject_term(tm_id: str) -> M.TermMap:
        spec = tm_subjects[tm_id]
        if spec is None:
            # no subject → constant blank node (yarrrml.py:500-505)
            return M.TermMap(M.CONSTANT, f"yb_{tm_id}", M.BLANK_NODE)
        spec_l = _as_list(spec)[0]
        if isinstance(spec_l, str):
            spec_l = _split_termtype(spec_l)
        if "function" in spec_l:
            return _function_term(spec_l, M.IRI)
        tm = _template_to_term(spec_l["value"], M.IRI)
        tt = _TERMTYPES.get(spec_l.get("type", ""))
        return tm.but(termtype=tt) if tt else tm

    # raw rules per TM for quoted-map resolution (shared with the Turtle
    # parser's _resolve_quoted)
    raw: dict[str, list[tuple]] = {tm: [] for tm in mappings}
    non_asserted: set[str] = set()

    for tm_id, mv in mappings.items():
        source = tm_sources[tm_id]
        subj_spec = _as_list(tm_subjects[tm_id])[0] if tm_subjects[tm_id] else None
        quoted_subj = None
        if isinstance(subj_spec, dict) and (
                "quoted" in subj_spec or "quotedNonAsserted" in subj_spec):
            q_tm = subj_spec.get("quoted") or subj_spec["quotedNonAsserted"]
            if "quotedNonAsserted" in subj_spec:
                non_asserted.add(q_tm)
            quoted_subj = (q_tm, _join_conditions(subj_spec))
            subject = M.TermMap(M.CONSTANT, "__quoted__", M.IRI)
        else:
            subject = subject_term(tm_id)

        tm_graphs = [
            _template_to_term(g, M.IRI) for g in _as_list(mv.get("graphs", []))
        ]

        for po in _as_list(mv.get("predicateobjects", [])):
            for row in _normalize_pos(po):
                pred = _template_to_term(row["predicate"], M.IRI)
                po_graphs = [_template_to_term(g, M.IRI)
                             for g in row["graphs"]]
                graphs = po_graphs + [g for g in tm_graphs
                                      if g not in po_graphs]
                obj_spec = row["object"]
                kw: dict = {}
                quoted_obj = None
                if isinstance(obj_spec, dict) and (
                        "quoted" in obj_spec or "quotedNonAsserted" in obj_spec):
                    q_tm = obj_spec.get("quoted") or obj_spec["quotedNonAsserted"]
                    if "quotedNonAsserted" in obj_spec:
                        non_asserted.add(q_tm)
                    quoted_obj = (q_tm, _join_conditions(obj_spec))
                elif isinstance(obj_spec, dict) and "mappings" in obj_spec:
                    ref_tm = obj_spec["mappings"]
                    kw["parent_source"] = tm_sources[ref_tm]
                    kw["parent_subject"] = subject_term(ref_tm)
                    jcs = _join_conditions(obj_spec)
                    if jcs:
                        kw["join_conditions"] = jcs
                    elif tm_sources[ref_tm].cache_key() != source.cache_key():
                        raise ValueError(
                            "referencing object map without condition over "
                            "a different source")
                    else:  # self-join elimination
                        kw.pop("parent_source")
                else:
                    kw.update(_object_term(obj_spec))

                for graph in graphs or [None]:
                    raw[tm_id].append((M.Rule(
                        source=source, subject=subject, predicate=pred,
                        graph=graph, triples_map_id=tm_id, **kw,
                    ), quoted_subj, quoted_obj))

                # inverse predicates (yarrrml.py:359-377): swap s/o
                for ipred in row["inversepredicates"]:
                    if quoted_obj or "object" not in kw:
                        raise ValueError(
                            "inversepredicates need a plain object map")
                    raw[tm_id].append((M.Rule(
                        source=source,
                        subject=kw["object"].but(termtype=M.IRI),
                        predicate=_template_to_term(ipred, M.IRI),
                        object=subject.but(),
                        graph=None, triples_map_id=tm_id,
                    ), None, None))

    return _resolve_quoted(raw, list(mappings), lambda tm: tm in non_asserted)
