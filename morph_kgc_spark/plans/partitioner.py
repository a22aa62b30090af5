"""Mapping partitioning: disjointness analysis over template invariants.

The reference's signature optimization (SWJ paper; reference:
src/morph_kgc/mapping/mapping_partitioner.py:18-33, 159-358) groups rules
whose emitted triples *provably cannot collide*, so each group can be
deduplicated independently and unioned without a global distinct. There it
saves cross-process set unions; on Spark it prunes the final global
``distinct()`` shuffle — at 10^12 triples the dominant cost.

Soundness argument (conservative variant of PARTIAL-AGGREGATIONS): two
rules may emit the same triple only if, in EVERY position (s, p, o, g), the
constant prefixes (invariants) of their term maps are prefix-compatible
(one is a prefix of the other). If any position has incompatible
invariants, no triple can be shared. We build the "may-collide" graph and
take connected components as mapping partitions. This is coarser than the
reference's maximal 24-ordering search but never unsound.
"""

from __future__ import annotations

from morph_kgc_spark import model as M


def _invariants(rule: M.Rule) -> tuple[str, str, str, str]:
    def inv(tm) -> str:
        return tm.invariant if tm is not None else ""

    # gather rules also emit rdf:first/rest/_n triples with bnode/list
    # subjects — no useful invariant; conservatively collide with all
    if rule.gather is not None:
        return ("", "", "", "")

    # object position: a referencing object map's object is the parent
    # subject; quoted maps have '<< ' prefix
    if rule.quoted_object is not None:
        o = "<< " + _pos_invariant(rule.quoted_object.subject)
    elif rule.parent_subject is not None:
        o = _pos_invariant(rule.parent_subject)
    elif rule.object is not None:
        o = _pos_invariant(rule.object)
    else:
        o = ""

    if rule.quoted_subject is not None:
        s = "<< " + _pos_invariant(rule.quoted_subject.subject)
    else:
        s = _pos_invariant(rule.subject)

    return (s, _pos_invariant(rule.predicate), o, inv(rule.graph))


def _pos_invariant(tm: M.TermMap) -> str:
    """Invariant including the termtype wrapper, so IRIs never collide with
    literals/bnodes even with empty template prefixes."""
    if tm is None:
        return ""
    prefix = {"iri": "<", "blanknode": "_:", "literal": '"'}.get(tm.termtype, "")
    return prefix + tm.invariant


def _prefix_compatible(a: str, b: str) -> bool:
    return a.startswith(b) or b.startswith(a)


def may_collide(r1: M.Rule, r2: M.Rule) -> bool:
    """True unless some position's invariants prove disjointness."""
    for i1, i2 in zip(_invariants(r1), _invariants(r2)):
        if not _prefix_compatible(i1, i2):
            return False
    return True


def assign_mapping_partitions(rules: list[M.Rule]) -> list[M.Rule]:
    """Label rules with connected-component partition ids (union-find)."""
    n = len(rules)
    parent = list(range(n))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra

    for i in range(n):
        for j in range(i + 1, n):
            if may_collide(rules[i], rules[j]):
                union(i, j)

    labels: dict[int, str] = {}
    out: list[M.Rule] = []
    for i, r in enumerate(rules):
        root = find(i)
        labels.setdefault(root, f"g{len(labels)}")
        out.append(r.but(mapping_partition=labels[root]))
    return out
