"""Property tests for the conformance runner's bnode canonicalizer.

The canonicalizer must be isomorphism-INVARIANT (any relabeling of
bnodes yields the same canonical form) and structure-SENSITIVE (the
round-2 regex canonicalizer collapsed all labels to one token, so a
reversed rdf:List chain still "matched"). Hypothesis drives both
directions over random small graphs.
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from test_rml_conformance import _canon, _canonical_lines, _tokenize_nq

IRIS = [f"<http://x.org/{n}>" for n in ("p", "q", "r")]
LITS = ['"a"', '"b"']


@st.composite
def graphs(draw):
    n_b = draw(st.integers(2, 6))
    bnodes = [f"_:b{i}" for i in range(n_b)]
    n_t = draw(st.integers(1, 10))
    triples = set()
    for _ in range(n_t):
        s = draw(st.sampled_from(bnodes + IRIS[:1]))
        p = draw(st.sampled_from(IRIS))
        o = draw(st.sampled_from(bnodes + LITS))
        triples.add(f"{s} {p} {o}")
    return sorted(triples)


def _permute(lines: list[str], seed: int) -> list[str]:
    labels = sorted({t for ln in lines for t in _tokenize_nq(ln)
                     if t.startswith("_:")})
    rng = random.Random(seed)
    new = [f"_:z{i}" for i in range(len(labels))]
    rng.shuffle(new)
    mapping = dict(zip(labels, new))
    return [" ".join(mapping.get(t, t) for t in _tokenize_nq(ln))
            for ln in lines]


@settings(max_examples=120, deadline=None)
@given(graphs(), st.integers(0, 10_000))
def test_canonical_form_is_relabeling_invariant(lines, seed):
    assert _canonical_lines([_tokenize_nq(x) for x in lines]) == \
        _canonical_lines([_tokenize_nq(x) for x in _permute(lines, seed)])


@settings(max_examples=60, deadline=None)
@given(graphs())
def test_canonical_form_detects_extra_triple(lines):
    mutated = lines + ['<http://x.org/NEW> <http://x.org/NEW> "zz"']
    assert _canonical_lines([_tokenize_nq(x) for x in lines]) != \
        _canonical_lines([_tokenize_nq(x) for x in mutated])


def test_list_chain_structure_is_verified():
    """The regression the round-2 regex canonicalizer had: a REVERSED
    rdf:List chain must NOT match the original."""
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    chain = [
        f'<http://x.org/s> <http://x.org/with> _:h',
        f'_:h <{rdf}first> "1"',
        f'_:h <{rdf}rest> _:m',
        f'_:m <{rdf}first> "2"',
        f'_:m <{rdf}rest> <{rdf}nil>',
    ]
    reversed_chain = [
        f'<http://x.org/s> <http://x.org/with> _:h',
        f'_:h <{rdf}first> "2"',
        f'_:h <{rdf}rest> _:m',
        f'_:m <{rdf}first> "1"',
        f'_:m <{rdf}rest> <{rdf}nil>',
    ]
    assert _canon(chain) != _canon(reversed_chain)
    # and relabeled-but-equal chains DO match
    relabeled = [ln.replace("_:h", "_:x9").replace("_:m", "_:k0")
                 for ln in chain]
    assert _canon(chain) == _canon(relabeled)


def test_public_compare_api():
    """The canonicalizer is a public surface (morph_kgc_spark.compare):
    users without rdflib compare engine output to expected N-Quads with
    it — VERDICT round-3 asked for exactly this promotion."""
    from morph_kgc_spark.compare import canonical_nquads, isomorphic

    a = ['_:x <http://p> _:y .', '_:y <http://p> "1" .']
    b = ['_:n1 <http://p> _:n2 .', '_:n2 <http://p> "1" .']
    assert isomorphic(a, b)
    assert canonical_nquads(a) == canonical_nquads(b)
    assert not isomorphic(a, ['_:x <http://p> _:y .',
                              '_:x <http://p> "1" .'])


def test_disjoint_symmetric_components_complete_and_fast():
    """10 disjoint mutual-edge bnode pairs: color refinement cannot
    separate ANY node, and the former depth-8 label-order fallback
    false-negatived on scrambled labels. Component splitting makes the
    complete search linear here (round-5 directive #7)."""
    import random
    import time

    from morph_kgc_spark.compare import isomorphic

    p = "<http://x.org/p>"

    def pairs_graph(names):
        out = []
        for i in range(0, len(names), 2):
            a, b = names[i], names[i + 1]
            out.append(f"_:{a} {p} _:{b} .")
            out.append(f"_:{b} {p} _:{a} .")
        return out

    base = [f"n{i}" for i in range(20)]
    g1 = pairs_graph(base)
    # scrambled labels AND scrambled pairing over the same node names —
    # still 10 mutual pairs, so isomorphic
    rng = random.Random(7)
    shuffled = base[:]
    rng.shuffle(shuffled)
    g2 = pairs_graph(shuffled)
    t0 = time.time()
    assert isomorphic(g1, g2)
    assert time.time() - t0 < 5.0  # complete search must stay linear-ish
    # NOT isomorphic: replace two pairs with a 4-cycle (same node and
    # edge counts, different structure)
    g3 = pairs_graph(base[:16]) + [
        f"_:n16 {p} _:n17 .", f"_:n17 {p} _:n18 .",
        f"_:n18 {p} _:n19 .", f"_:n19 {p} _:n16 .",
    ]
    assert not isomorphic(g1, g3)


def test_single_component_symmetric_cycles():
    """Within ONE component the complete backtracking distinguishes a
    6-cycle from two 3-cycles and accepts any relabeling of itself."""
    from morph_kgc_spark.compare import isomorphic

    p = "<http://x.org/p>"

    def cycle(names):
        return [f"_:{a} {p} _:{b} ."
                for a, b in zip(names, names[1:] + names[:1])]

    six = cycle([f"a{i}" for i in range(6)])
    six_relabel = cycle(["q", "w", "e", "r", "t", "y"])
    two_threes = cycle(["x0", "x1", "x2"]) + cycle(["y0", "y1", "y2"])
    assert isomorphic(six, six_relabel)
    assert not isomorphic(six, two_threes)


def test_literal_that_looks_like_local_bnode_name_not_rewritten():
    """Round-5 self-review: the global rename must only touch bnode
    TOKENS — a literal whose text is '_:c0' (or '_:g0') must not be
    rewritten, else non-isomorphic graphs compare equal."""
    from morph_kgc_spark.compare import isomorphic

    p = "<http://x.org/p>"
    a = [f'_:x {p} "_:c0" .']
    b = [f'_:y {p} "_:g0" .']
    assert not isomorphic(a, b)
    assert isomorphic(a, [f'_:z {p} "_:c0" .'])
