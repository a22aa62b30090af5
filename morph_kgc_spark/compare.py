"""Public N-Quads comparison API: canonicalization + isomorphism.

The reference returns an rdflib Graph and its test suite compares with
``rdflib.compare.isomorphic`` (/root/reference/test/*/test_*.py); this
engine returns N-Triples/N-Quads lines, and environments without rdflib
need an equivalent comparison. ``canonical_nquads`` relabels blank
nodes deterministically by structural signature (color refinement with
individualization backtracking and lexicographic-minimum tie-breaks),
so two serializations are isomorphic iff their canonical forms are
equal — list-chain STRUCTURE included (a reversed rdf:List chain is
detected, unlike label-stripping comparators). Property-tested in
tests/test_canonicalizer.py: relabeling-invariant, mutation-sensitive.

The search is COMPLETE (round-5 directive #7: no depth cap, no
label-order fallback): triples are split into connected components over
bnode co-occurrence and each component is canonicalized independently —
the classic blowup case (many disjoint isomorphic components, where
color refinement cannot separate anything and each individualization
level only resolves one component) becomes linear in the number of
components, and within one component the full backtracking-minimum
individualization runs to completion. Worst case remains exponential
for strongly-regular single components — structures no RDF toolchain
emits; rdflib's canonicalizer has the same bound.

Driver-side by design: expected outputs and conformance fixtures are
small. For corpus-scale set comparison, join the two triple DataFrames
instead — isomorphism at 10^12 triples is not a meaningful operation.
"""

from __future__ import annotations

import re

BNODE_RE = re.compile(r"_:[A-Za-z0-9_.-]+")


def tokenize_nquads(line: str) -> list[str]:
    """Split an N-Quads line into terms, treating << and >> as tokens —
    serializations differ in whitespace around quoted triples."""
    toks, i, n = [], 0, len(line)
    while i < n:
        while i < n and line[i] in " \t":
            i += 1
        if i >= n:
            break
        if line.startswith("<<", i):
            toks.append("<<")
            i += 2
        elif line.startswith(">>", i):
            toks.append(">>")
            i += 2
        elif line[i] == "<":
            j = line.find(">", i)
            if j < 0:
                raise ValueError(
                    f"malformed N-Quads line (unclosed IRI): {line!r}")
            toks.append(line[i:j + 1])
            i = j + 1
        elif line[i] == '"':
            j = i + 1
            while j < n:
                if line[j] == "\\":
                    j += 2
                    continue
                if line[j] == '"':
                    break
                j += 1
            j += 1
            # datatype/lang suffix up to whitespace or '>>'
            while j < n and line[j] not in " \t" and not line.startswith(">>", j):
                j += 1
            toks.append(line[i:j])
            i = j
        else:
            j = i
            while j < n and line[j] not in " \t" and not line.startswith(">>", j):
                j += 1
            toks.append(line[i:j])
            i = j
    return toks


def canonical_nquads(lines: list[str]) -> list[str]:
    """Isomorphism-safe canonical form: deterministic bnode relabeling by
    signature (color refinement + individualization with backtracking-min
    tie-breaks), so list-chain STRUCTURE is verified — the reference's own
    tests compare with rdflib.compare.isomorphic. The previous regex
    canonicalizer collapsed every bnode to one token (chain structure
    unchecked) and split labels containing '_' (spurious mismatches on
    the rml-cc suite's `_:bnode_subject1` style labels)."""
    triples: list[list[str]] = []
    for ln in lines:
        ln = ln.strip()
        if ln.endswith("."):
            ln = ln[:-1].strip()
        triples.append(tokenize_nquads(ln))
    return canonical_triples(triples)


def canonical_triples(triples: list[list[str]]) -> list[str]:
    all_bnodes = sorted({t for tr in triples for t in tr
                         if BNODE_RE.fullmatch(t)})
    if not all_bnodes:
        return sorted(" ".join(tr) for tr in triples)

    # connected components over bnode co-occurrence: bnodes never relate
    # across triples they do not share, so each component canonicalizes
    # independently — this is what makes the search complete AND fast on
    # disjoint-symmetric graphs (k identical components: k small
    # searches instead of one depth-k exponential one)
    parent = {b: b for b in all_bnodes}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for tr in triples:
        bs = [t for t in tr if t in parent]
        for u, v in zip(bs, bs[1:]):
            parent[find(u)] = find(v)

    ground: list[str] = []
    comps: dict[str, list[list[str]]] = {}
    for tr in triples:
        bs = [t for t in tr if t in parent]
        if not bs:
            ground.append(" ".join(tr))
        else:
            comps.setdefault(find(bs[0]), []).append(tr)

    # canonicalize each component with LOCAL names _:c0.., then order
    # components by their rendered form and assign disjoint global name
    # ranges in that order — identical components render identically, so
    # their relative order cannot affect the output. Renaming happens
    # per TOKEN (lines stay token lists until here): a regex over the
    # joined line would also rewrite '_:cN'-looking text inside literal
    # tokens and could equate non-isomorphic graphs.
    rendered = sorted(
        (_canonical_component(trs) for trs in comps.values()),
        key=lambda x: x[0])
    out = list(ground)
    offset = 0
    for token_lines, n in rendered:
        for tr in token_lines:
            out.append(" ".join(
                f"_:g{offset + int(t[3:])}"
                if t.startswith("_:c") and t[3:].isdigit() else t
                for t in tr))
        offset += n
    return sorted(out)


def _canonical_component(
        triples: list[list[str]]) -> tuple[list[list[str]], int]:
    """Canonical TOKEN lines (local names ``_:c0..``) for ONE
    bnode-connected component, plus its bnode count. Complete
    individualization-refinement: no depth cap, backtracking keeps the
    lexicographic minimum over every member of the smallest ambiguous
    class. Lines stay token LISTS so the caller's global rename can
    distinguish bnode tokens from literal text."""
    import hashlib

    def h(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    bnodes = sorted({t for tr in triples for t in tr
                     if BNODE_RE.fullmatch(t)})

    def refine(colors: dict[str, str], rounds: int) -> dict[str, str]:
        for _ in range(rounds):
            sigs = {b: [] for b in colors}
            for tr in triples:
                if not any(t in colors for t in tr):
                    continue
                for i, t in enumerate(tr):
                    if t in colors:
                        ctx = tuple(colors.get(x, x) for j, x in enumerate(tr)
                                    if j != i)
                        sigs[t].append((i,) + ctx)
            nxt = {b: h(colors[b] + repr(sorted(sigs[b])))
                   for b in colors}
            if nxt == colors:
                break
            colors = nxt
        return colors

    def serialize(colors: dict[str, str]) -> list[list[str]] | None:
        """Final names by color rank; None if colors are not all distinct.
        Token lists, not joined strings (see _canonical_component)."""
        ranked = sorted(set(colors.values()))
        if len(ranked) < len(colors):
            return None
        rank = {c: f"_:c{i}" for i, c in enumerate(ranked)}
        return sorted([rank[colors[t]] if t in colors else t
                       for t in tr] for tr in triples)

    def search(colors: dict[str, str]) -> list[str]:
        colors = refine(colors, len(bnodes) + 2)
        out = serialize(colors)
        if out is not None:
            return out
        # individualize one member of the smallest ambiguous class; try
        # each member, keep the lexicographically smallest canonical
        # form — COMPLETE (the former depth-8 label-order fallback could
        # false-negative on symmetric graphs; component splitting keeps
        # this tractable for every realistic shape)
        by_color: dict[str, list[str]] = {}
        for b, c in colors.items():
            by_color.setdefault(c, []).append(b)
        cls = min((v for v in by_color.values() if len(v) > 1),
                  key=lambda v: (len(v), colors[v[0]]))
        best = None
        for b in sorted(cls):
            trial = dict(colors)
            trial[b] = h(colors[b] + "!ind")
            cand = search(trial)
            if best is None or cand < best:
                best = cand
        return best

    return search({b: "" for b in bnodes}), len(bnodes)




def isomorphic(a: list[str], b: list[str]) -> bool:
    """True iff two N-Triples/N-Quads serializations describe isomorphic
    RDF graphs (equal up to blank-node relabeling)."""
    return canonical_nquads(list(a)) == canonical_nquads(list(b))
