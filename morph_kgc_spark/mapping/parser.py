"""RML/R2RML mapping document → flat rule table.

Driver-side compile mirroring the reference's pipeline
(src/morph_kgc/mapping/mapping_parser.py:516-578): parse Turtle →
normalize shortcuts/vocabulary → per (TriplesMap × PredicateObjectMap ×
predicate × object) emit one :class:`morph_kgc_spark.model.Rule` →
self-join elimination. Both legacy vocab (rr:/rml:) and the new
unified RML namespace (http://w3id.org/rml/) are accepted.

Supported surface: logical sources (file source + tableName + rml:query +
iterator/referenceFormulation), subject/predicate/object/graph maps with
template/constant/reference/column, termType, rr:class, datatype,
language, parentTriplesMap + joinCondition. FNML and gather maps are
handled by dedicated modules once their vocab appears.
"""

from __future__ import annotations

import os
import re
from typing import Optional

from morph_kgc_spark import model as M
from morph_kgc_spark.mapping.turtle import Graph, RDF_TYPE, Term

# namespaces
RR = "http://www.w3.org/ns/r2rml#"
RML_L = "http://semweb.mmlab.be/ns/rml#"
RML_N = "http://w3id.org/rml/"
QL = "http://semweb.mmlab.be/ns/ql#"
FNML = "http://semweb.mmlab.be/ns/fnml#"
SD = "https://w3id.org/okn/o/sd#"


def _props(*names: str) -> list[str]:
    """Expand a property name over the vocab namespaces (incl. legacy
    fnml: for function executions)."""
    out = []
    for n in names:
        out += [RR + n, RML_L + n, RML_N + n, FNML + n]
    return out


def _undelimit(identifier: str) -> str:
    """Strip SQL-style double-quote delimiters from an identifier
    (reference _get_undelimited_identifier, mapping_parser.py:408-416)."""
    if len(identifier) > 1 and identifier.startswith('"') and identifier.endswith('"'):
        return identifier[1:-1]
    return identifier


def _undelimit_template(template: str) -> str:
    """``{"Name"}`` → ``{Name}`` (reference
    _get_valid_template_identifiers, mapping_parser.py:419-424)."""
    return template.replace('{"', "{").replace('"}', "}")


def _first(g: Graph, s: Term, *names: str) -> Optional[Term]:
    for p in _props(*names):
        v = g.value(s, p)
        if v is not None:
            return v
    return None


def _all(g: Graph, s: Term, *names: str) -> list[Term]:
    out: list[Term] = []
    for p in _props(*names):
        out.extend(g.objects(s, p))
    return out


_EXT_KIND = {
    ".csv": "csv", ".tsv": "csv", ".json": "json", ".parquet": "parquet",
    ".orc": "orc", ".xml": "xml", ".xlsx": "pandas_any",
    ".xls": "pandas_any", ".ods": "pandas_any", ".dta": "pandas_any",
    ".sas7bdat": "pandas_any", ".sav": "pandas_any",
    ".feather": "pandas_any",
}


def _source_for(g: Graph, tm: Term, base_dir: str) -> M.Source:
    ls = _first(g, tm, "logicalSource", "logicalTable")
    if ls is None:
        raise ValueError("triples map without logical source")
    table = _first(g, ls, "tableName")
    if table is not None:
        return M.Source("table", _undelimit(table[1]))
    query = _first(g, ls, "query", "sqlQuery")
    if query is not None:
        version = _first(g, ls, "sqlVersion")
        if version is not None and version[1] != RR + "SQL2008":
            # R2RML: rr:SQL2008 is the only registered identifier; an
            # unknown version is a mapping error (W3C R2RMLTC0003a)
            raise ValueError(f"unsupported rr:sqlVersion {version[1]!r}")
        # tabular views may reference file paths relative to the mapping
        # root (rml-tv suite) — carried for the DuckDB fallback
        return M.Source("sql", query[1], {"base_dir": base_dir})
    src = _first(g, ls, "source")
    if src is None:
        raise ValueError("logical source without rml:source")
    # in-memory python source: rml:source [ a sd:DatasetSpecification ;
    # sd:name "var" ] (reference data_source/python_data.py; the
    # rml-in-memory suite) — resolved from data the caller registered
    sd_name = g.value(src, SD + "name")
    if sd_name is not None:
        options = {}
        it = _first(g, ls, "iterator")
        if it is not None:
            options["iterator"] = it[1]
        return M.Source("python", sd_name[1], options)
    path = src[1]
    if not os.path.isabs(path):
        path = os.path.join(base_dir, path)
    ext = os.path.splitext(path)[1].lower()
    kind = _EXT_KIND.get(ext, "csv")
    options: dict = {}
    if ext == ".tsv":
        options["sep"] = "\t"
    it = _first(g, ls, "iterator")
    if it is not None:
        options["iterator"] = it[1]
    return M.Source(kind, path, options)


_TERMTYPE = {
    RR + "IRI": M.IRI, RML_N + "IRI": M.IRI,
    RR + "Literal": M.LITERAL, RML_N + "Literal": M.LITERAL,
    RR + "BlankNode": M.BLANK_NODE, RML_N + "BlankNode": M.BLANK_NODE,
}


PARAM_ALIASES = {
    # GREL/FnO parameter IRIs → built-in kwarg names (mirrors the
    # reference's @bif keyword declarations, built_in_functions.py)
    "valueParam": "string",
    "param_any_e": "string",
    "stringParam": "string",
    "param_string_sep": "separator",
    "param_string_pattern": "format_code",
    "modeParam": "mode",
    "bool_b": "bool_expression",
    "param_b": "bool_expression",
    "any_true": "value_true",
    "any_false": "value_false",
    "p_any_e": "number",
    "param_n": "number",
    "param_find": "old",
    "param_replace": "new",
    "param_int_i_from": "from_index",
    "param_int_i_opt_to": "to_index",
    "p_int_i_from": "from_index",
    "p_int_i_opt_to": "to_index",
    "param_dec_n": "number",
    "p_array_a": "array_str",
    "param_a": "array_str",
    "startParam": "str1",
    "endParam": "str2",
    "valueParam1": "str1",
    "valueParam2": "str2",
    "delimiterParam": "delimiter",
}


def _param_name(iri: str) -> str:
    local = iri.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
    return PARAM_ALIASES.get(local, local)


def _function_execution(g: Graph, exec_node: Term, termtype: str) -> M.TermMap:
    """Compile an FNML execution node (rml:function + rml:input*)."""
    fn = _first(g, exec_node, "function")
    if fn is None:
        raise ValueError("functionExecution without rml:function")
    args = []
    for inp in _all(g, exec_node, "input"):
        param = _first(g, inp, "parameter")
        if param is None:
            pm = _first(g, inp, "parameterMap")
            param = _first(g, pm, "constant") if pm is not None else None
        if param is None:
            raise ValueError("rml:input without parameter")
        vm = _first(g, inp, "inputValueMap", "valueMap", "inputValue")
        if vm is None:
            raise ValueError("rml:input without inputValueMap/inputValue")
        if vm[0] == "literal" or (vm[0] == "iri" and not g.predicates(vm)):
            # rml:inputValue constant shortcut (reference fnml vocab)
            arg = M.TermMap(M.CONSTANT, vm[1], M.LITERAL)
        else:
            nested = _first(g, vm, "functionExecution")
            if nested is not None:
                arg = _function_execution(g, nested, M.LITERAL)
            else:
                arg = _term_map(g, vm, M.LITERAL, "fn-arg")
        args.append((_param_name(param[1]), arg))
    return M.TermMap(M.EXECUTION, fn[1], termtype, args=tuple(args))


def _gather_spec(g: Graph, om: Term, position: str = "object") -> M.GatherSpec:
    """Parse rml:gather (an RDF collection of value maps) + rml:gatherAs."""
    gather_head = _first(g, om, "gather")
    gather_as = _first(g, om, "gatherAs")
    if gather_as is None:
        raise ValueError("rml:gather without rml:gatherAs")
    refs: list[str] = []
    termtype = M.LITERAL
    node = gather_head
    rdf_first = "http://www.w3.org/1999/02/22-rdf-syntax-ns#first"
    rdf_rest = "http://www.w3.org/1999/02/22-rdf-syntax-ns#rest"
    rdf_nil = "http://www.w3.org/1999/02/22-rdf-syntax-ns#nil"
    while node is not None and node != ("iri", rdf_nil):
        item = g.value(node, rdf_first)
        if item is None:
            break
        ref = _first(g, item, "reference", "column")
        if ref is None:
            raise ValueError("gather value maps must be references")
        refs.append(ref[1])
        tt = _first(g, item, "termType")
        if tt is not None:
            termtype = _TERMTYPE.get(tt[1], M.LITERAL)
        node = g.value(node, rdf_rest)
    head: M.TermMap | None = None
    tpl = _first(g, om, "template")
    if tpl is not None:
        head = M.TermMap(M.TEMPLATE, tpl[1], M.IRI)
    else:
        const = _first(g, om, "constant")
        if const is not None:
            head = M.TermMap(M.CONSTANT, const[1], M.IRI)
    strategy = _first(g, om, "strategy")
    allow_empty = _first(g, om, "allowEmptyListAndContainer")
    return M.GatherSpec(
        references=tuple(refs),
        gather_as=gather_as[1],
        value_termtype=termtype,
        head=head,
        strategy=(strategy[1].rsplit("/", 1)[-1] if strategy else "append"),
        allow_empty=bool(allow_empty and str(allow_empty[1]).lower() == "true"),
        position=position,
    )


def _subject_gather_rule(g: Graph, tm: Term, subj_node: Term,
                         source: M.Source, tm_id: str) -> M.Rule:
    """Compile a TM whose subjectMap carries rml:gather into ONE rule.

    The collection node (subjectMap template if named, else a fresh bnode
    per row) heads the chain/container AND subjects every
    predicate-object pair (reference materializer.py:454-892;
    test/rml-cc/JSON/RMLTC-CC-0004-SM* and -unnamed variants).
    """
    spec = _gather_spec(g, subj_node, position="subject")

    poms: list[tuple] = []
    for cls in _all(g, subj_node, "class"):
        poms.append((M.TermMap(M.CONSTANT, RDF_TYPE, M.IRI),
                     M.TermMap(M.CONSTANT, cls[1], M.IRI), None, None))
    for pom in _all(g, tm, "predicateObjectMap"):
        predicates = _shortcut_or_map(g, pom, ["predicateMap"],
                                      ["predicate"], M.IRI, "predicate")
        objects: list[tuple] = []
        for om in _all(g, pom, "objectMap"):
            if _first(g, om, "gather") is not None or \
                    _first(g, om, "parentTriplesMap") is not None:
                raise ValueError(
                    "object-side gather/join inside a subject-gather "
                    "triples map is not supported")
            datatype, language = _lang_datatype(g, om)
            default_tt = (M.LITERAL if datatype is not None
                          or language is not None else M.IRI)
            objects.append((_term_map(g, om, default_tt, "object"),
                            datatype, language))
        for const in _all(g, pom, "object"):
            if const[0] == "iri":
                objects.append((M.TermMap(M.CONSTANT, const[1], M.IRI),
                                None, None))
            else:
                objects.append((M.TermMap(M.CONSTANT, const[1], M.LITERAL),
                                None, None))
        for p in predicates:
            for (o, dt, lang) in objects:
                poms.append((p, o, dt, lang))

    # placeholder subject/predicate: the compiler routes on gather.position
    placeholder = M.TermMap(M.CONSTANT, "urn:x-internal:subject-gather", M.IRI)
    return M.Rule(source=source, subject=spec.head or placeholder,
                  predicate=placeholder, gather=spec, gather_poms=tuple(poms),
                  triples_map_id=tm_id, base_iri=g.base)


# allowed explicit termtypes per position (reference _validate_termtypes,
# mapping_parser.py:427-460)
_VALID_TERMTYPES = {
    "subject": {M.IRI, M.BLANK_NODE},
    "predicate": {M.IRI},
    "graph": {M.IRI},
    "object": {M.IRI, M.BLANK_NODE, M.LITERAL},
}


def _term_map(g: Graph, node: Term, default_termtype: str,
              position: str) -> M.TermMap:
    """Compile one term-map bnode (template/constant/reference/column)."""
    tt_node = _first(g, node, "termType")
    termtype = _TERMTYPE.get(tt_node[1], default_termtype) if tt_node else None
    if termtype is not None and position in _VALID_TERMTYPES \
            and termtype not in _VALID_TERMTYPES[position]:
        raise ValueError(
            f"invalid termtype {termtype!r} in {position} position "
            f"(allowed: {sorted(_VALID_TERMTYPES[position])})")

    fn_exec = _first(g, node, "functionExecution", "execution")
    if fn_exec is not None:
        default = M.LITERAL if position == "object" else default_termtype
        return _function_execution(g, fn_exec, termtype or default)

    tpl = _first(g, node, "template")
    if tpl is not None:
        return M.TermMap(M.TEMPLATE, _undelimit_template(tpl[1]),
                         termtype or default_termtype)
    const = _first(g, node, "constant")
    if const is not None:
        if const[0] == "iri":
            return M.TermMap(M.CONSTANT, const[1], termtype or M.IRI)
        return M.TermMap(M.CONSTANT, const[1], termtype or M.LITERAL)
    ref = _first(g, node, "reference", "column")
    if ref is not None:
        default = M.LITERAL if position == "object" else default_termtype
        return M.TermMap(M.REFERENCE, _undelimit(ref[1]), termtype or default)
    raise ValueError(f"term map with no template/constant/reference in {position}")


def _shortcut_or_map(g: Graph, parent: Term, map_names: list[str],
                     shortcut_names: list[str], default_termtype: str,
                     position: str) -> list[M.TermMap]:
    """Handle both `rr:xxxMap [ ... ]` and the constant shortcut `rr:xxx`."""
    out: list[M.TermMap] = []
    for node in _all(g, parent, *map_names):
        out.append(_term_map(g, node, default_termtype, position))
    for const in _all(g, parent, *shortcut_names):
        if const[0] == "iri":
            out.append(M.TermMap(M.CONSTANT, const[1], M.IRI))
        else:
            out.append(M.TermMap(M.CONSTANT, const[1], M.LITERAL))
    return out


_LANG_TAG_RE = re.compile(r"^[A-Za-z]{1,3}(-[A-Za-z0-9]{1,8})*$")


def _validate_language_tag(tag: str) -> str:
    """IANA language tags have a 1-3 character primary subtag (reference
    validate_mappings' rule, mapping_parser.py:735-746; W3C RMLTC0015b
    expects 'english' to be rejected)."""
    if not _LANG_TAG_RE.match(tag):
        raise ValueError(
            f"invalid language tag {tag!r}: primary subtag must be 1-3 "
            "characters (IANA Language Subtag Registry)")
    return tag


def _lang_datatype(g: Graph, om: Term) -> tuple[Optional[M.TermMap], Optional[M.TermMap]]:
    lang = _first(g, om, "language")
    if lang is not None:
        return None, M.TermMap(M.CONSTANT, _validate_language_tag(lang[1]),
                               M.LITERAL)
    lang_map = _first(g, om, "languageMap")
    if lang_map is not None:
        return None, _term_map(g, lang_map, M.LITERAL, "language")
    dt = _first(g, om, "datatype")
    if dt is not None:
        return M.TermMap(M.CONSTANT, dt[1], M.IRI), None
    dt_map = _first(g, om, "datatypeMap")
    if dt_map is not None:
        return _term_map(g, dt_map, M.IRI, "datatype"), None
    return None, None


# quoted-map placeholder: (parent TM term, join conditions)
_QuotedSpec = tuple


def parse_mapping(mapping: str, base_dir: str = ".") -> list[M.Rule]:
    """Compile a mapping document (Turtle text or path) to Rules.

    RML-star (reference mapping_parser.py:760-804 fixpoint expansion +
    materializer.py:925-962): ``rml:quotedTriplesMap`` in subject or
    object maps references another triples map whose rules become
    ``Rule.quoted_subject`` / ``Rule.quoted_object`` sub-rules — one
    outer rule per quoted rule, recursively for nested quoting.
    ``rml:NonAssertedTriplesMap`` rules are only reachable via quoting.
    """
    doc_uri = None
    if "\n" not in mapping and os.path.exists(mapping):
        doc_uri = "file://" + os.path.abspath(mapping)
        base_dir = os.path.dirname(os.path.abspath(mapping))
        with open(mapping, encoding="utf-8") as f:
            mapping = f.read()
    g = Graph.parse(mapping)

    # discover triples maps: anything with a logical source/table
    tms: list[Term] = []
    seen: set[Term] = set()
    for p in _props("logicalSource", "logicalTable"):
        for s in g.subjects(p):
            if s not in seen:
                seen.add(s)
                tms.append(s)

    non_asserted_iris = {ns + "NonAssertedTriplesMap"
                         for ns in (RR, RML_L, RML_N)}
    def is_non_asserted(tm: Term) -> bool:
        return any(o[1] in non_asserted_iris
                   for o in g.objects(tm, RDF_TYPE))

    # triples-map ids keep the document's own identifiers (IRI / bnode
    # label) so a config can detect one TM mapped in two data sources
    # (reference validate_mappings, mapping_parser.py:750-758). When the
    # document came from a FILE, relative/blank identifiers resolve
    # against the file URI — the reference parses each file with rdflib
    # under its own file:// base, so `<#TM>` in two unrelated mapping
    # files never collides across data-source sections.
    def _tm_id(tm: Term, i: int) -> str:
        label = tm[1] if tm[1] else f"tm{i}"
        if doc_uri is not None and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:",
                                                label):
            return f"{doc_uri}#{label}"
        return label

    tm_index = {tm: _tm_id(tm, i) for i, tm in enumerate(tms)}
    # per-TM raw rules: (Rule, quoted_subject_spec, quoted_object_spec)
    raw: dict[Term, list[tuple]] = {tm: [] for tm in tms}

    def _join_conditions(node: Term) -> tuple[M.JoinCondition, ...]:
        jcs = []
        for jc in _all(g, node, "joinCondition"):
            child = _first(g, jc, "child")
            parent = _first(g, jc, "parent")
            jcs.append(M.JoinCondition(_undelimit(child[1]),
                                       _undelimit(parent[1])))
        return tuple(jcs)

    def _quoted_spec(node: Term | None) -> Optional[_QuotedSpec]:
        """rml:quotedTriplesMap inside a subject/object map bnode."""
        if node is None:
            return None
        q = _first(g, node, "quotedTriplesMap")
        if q is None:
            return None
        if q not in raw:
            raise ValueError(f"quotedTriplesMap references unknown map {q}")
        return (q, _join_conditions(node))

    for tm in tms:
        source = _source_for(g, tm, base_dir)
        subj_node = _first(g, tm, "subjectMap")

        # RML-CC collection/container in SUBJECT position (reference
        # materializer.py:454-892): rml:gather on the subjectMap — one
        # rule per TM carrying the gather spec + every POM pair, since
        # the chain triples must be emitted once, not once per POM
        if subj_node is not None and _first(g, subj_node, "gather") is not None:
            raw[tm].append((_subject_gather_rule(
                g, tm, subj_node, source, tm_index[tm]), None, None))
            continue

        quoted_subj = _quoted_spec(subj_node)
        if quoted_subj is not None:
            # placeholder subject; replaced by the quoted sub-rule later
            subject = M.TermMap(M.CONSTANT, "__quoted__", M.IRI)
        else:
            subj_maps = _shortcut_or_map(g, tm, ["subjectMap"], ["subject"],
                                         M.IRI, "subject")
            if not subj_maps:
                raise ValueError(f"triples map {tm} without subject map")
            if len(subj_maps) > 1:
                # R2RML: exactly one subject map per triples map (W3C
                # RMLTC0012d expects an error)
                raise ValueError(
                    f"triples map {tm} has {len(subj_maps)} subject maps; "
                    "exactly one is allowed")
            subject = subj_maps[0]

        # subject-level graph maps apply to every POM (mapping_parser.py:179-199)
        tm_graphs: list[M.TermMap] = []
        if subj_node is not None:
            tm_graphs = _shortcut_or_map(g, subj_node, ["graphMap"], ["graph"],
                                         M.IRI, "graph")

        def emit(predicate: M.TermMap, pom_graphs: list[M.TermMap],
                 quoted_obj: Optional[_QuotedSpec] = None, **kw) -> None:
            # subject-map graph maps are ADDED to every POM's own graph
            # maps (union, deduplicated) — reference
            # _subject_graph_maps_to_pom, mapping_parser.py:179-199
            combined = list(pom_graphs)
            combined += [g for g in tm_graphs if g not in combined]
            graphs = combined or [None]
            for graph in graphs:
                if graph is not None and graph.kind == M.CONSTANT and \
                        graph.value in (RR + "defaultGraph",
                                        RML_L + "defaultGraph",
                                        RML_N + "defaultGraph"):
                    graph = None
                raw[tm].append((M.Rule(
                    source=source, subject=subject, predicate=predicate,
                    graph=graph, triples_map_id=tm_index[tm],
                    base_iri=g.base, **kw,
                ), quoted_subj, quoted_obj))

        # rr:class → rdf:type POM (mapping_parser.py:160-176)
        if subj_node is not None:
            for cls in _all(g, subj_node, "class"):
                emit(M.TermMap(M.CONSTANT, RDF_TYPE, M.IRI), [],
                     object=M.TermMap(M.CONSTANT, cls[1], M.IRI))

        for pom in _all(g, tm, "predicateObjectMap"):
            predicates = _shortcut_or_map(g, pom, ["predicateMap"],
                                          ["predicate"], M.IRI, "predicate")
            pom_graphs = _shortcut_or_map(g, pom, ["graphMap"], ["graph"],
                                          M.IRI, "graph")
            object_specs: list[dict] = []
            for om in _all(g, pom, "objectMap"):
                if _first(g, om, "gather") is not None:
                    object_specs.append(dict(gather=_gather_spec(g, om)))
                    continue
                q_spec = _quoted_spec(om)
                if q_spec is not None:
                    object_specs.append(dict(quoted_obj=q_spec))
                    continue
                parent_tm = _first(g, om, "parentTriplesMap")
                if parent_tm is not None:
                    jcs = list(_join_conditions(om))
                    parent_source = _source_for(g, parent_tm, base_dir)
                    parent_subject = _shortcut_or_map(
                        g, parent_tm, ["subjectMap"], ["subject"], M.IRI,
                        "subject")[0]
                    if jcs:
                        object_specs.append(dict(
                            parent_source=parent_source,
                            parent_subject=parent_subject,
                            join_conditions=tuple(jcs),
                        ))
                    elif parent_source.cache_key() == source.cache_key():
                        # self-join elimination (mapping_parser.py:807-831)
                        object_specs.append(dict(parent_subject=parent_subject))
                    else:
                        raise ValueError(
                            "referencing object map without join condition "
                            "over a different logical source")
                    continue
                datatype, language = _lang_datatype(g, om)
                # a language/datatype (map) forces termtype Literal unless
                # rr:termType is explicit (reference _complete_termtypes,
                # mapping_parser.py:249-260) — otherwise a template object
                # with rr:datatype would render as an IRI `<v>^^<dt>`
                default_tt = (M.LITERAL if datatype is not None
                              or language is not None else M.IRI)
                object_specs.append(dict(
                    object=_term_map(g, om, default_tt, "object"),
                    datatype=datatype, language=language,
                ))
            for const in _all(g, pom, "object"):
                if const[0] == "iri":
                    object_specs.append(dict(object=M.TermMap(M.CONSTANT, const[1], M.IRI)))
                else:
                    dt = const[2] if len(const) > 3 and const[2] else None
                    lang = const[3] if len(const) > 3 else None
                    object_specs.append(dict(
                        object=M.TermMap(M.CONSTANT, const[1], M.LITERAL),
                        datatype=M.TermMap(M.CONSTANT, dt, M.IRI) if dt else None,
                        language=M.TermMap(M.CONSTANT, lang, M.LITERAL) if lang else None,
                    ))
            for predicate in predicates:
                for spec in object_specs:
                    emit(predicate, pom_graphs, **spec)

    return _resolve_quoted(raw, tms, is_non_asserted)


def _resolve_quoted(raw: dict, tms: list[Term], is_non_asserted) -> list[M.Rule]:
    """Expand quoted-map placeholders into quoted sub-rules.

    Mirrors the reference's fixpoint expansion (_expand_rml_star,
    mapping_parser.py:770-804): a quoted reference to a TM with N
    normalized rules becomes N outer rules, one per quoted sub-rule;
    nesting resolves recursively. Only rules of asserted maps are
    returned at top level.
    """
    resolved: dict[Term, list[M.Rule]] = {}

    def resolve(tm: Term, stack: tuple) -> list[M.Rule]:
        if tm in resolved:
            return resolved[tm]
        if tm in stack:
            raise ValueError(f"cyclic quotedTriplesMap chain through {tm}")
        out: list[M.Rule] = []
        for rule, q_subj, q_obj in raw[tm]:
            variants = [rule]
            if q_subj is not None:
                q_tm, q_jcs = q_subj
                variants = [v.but(quoted_subject=q,
                                  subject_join_conditions=q_jcs)
                            for v in variants
                            for q in resolve(q_tm, stack + (tm,))]
            if q_obj is not None:
                q_tm, q_jcs = q_obj
                q_rules = resolve(q_tm, stack + (tm,))
                variants = [
                    v.but(quoted_object=q,
                          join_conditions=q_jcs or v.join_conditions)
                    for v in variants for q in q_rules
                ]
            out.extend(variants)
        resolved[tm] = out
        return out

    rules: list[M.Rule] = []
    for tm in tms:
        if not is_non_asserted(tm):
            rules.extend(resolve(tm, ()))
    return rules
