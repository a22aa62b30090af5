"""Minimal Turtle parser for RML/R2RML mapping documents.

rdflib is not available in this environment, so mapping documents are
parsed with a small self-contained Turtle-subset reader covering what RML
mappings actually use (the reference parses with rdflib at
src/morph_kgc/mapping/mapping_parser.py:516-561):

- @prefix / @base (and SPARQL-style PREFIX/BASE)
- prefixed names, <IRIs>, 'a' for rdf:type
- blank nodes: labeled (_:b0) and anonymous property lists [ ... ]
- RDF collections ( e1 e2 ... ) → rdf:first/rest/nil chains
- literals: quoted strings (single/double/triple), @lang, ^^datatype,
  integers/decimals/booleans
- predicate lists (;) and object lists (,)

Produces a plain list of (subject, predicate, object) where terms are
wrapped as ("iri", v) / ("bnode", v) / ("literal", v, datatype, lang).
This runs on the DRIVER over KB-sized documents — clarity over speed.
"""

from __future__ import annotations

import re
from typing import Iterator, Optional

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

Term = tuple  # ("iri", v) | ("bnode", v) | ("literal", v, dt, lang)
Triple = tuple  # (Term, Term, Term)

_TOKEN_RE = re.compile(
    r"""
    (?P<comment>\#[^\n]*)
  | (?P<triple_dq>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
  | (?P<triple_sq>'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<string_dq>"(?:[^"\\\n]|\\.)*")
  | (?P<string_sq>'(?:[^'\\\n]|\\.)*')
  | (?P<iri><[^<>"{}|^`\\\s]*>)
  | (?P<prefix_decl>@prefix|@base|PREFIX|BASE)
  | (?P<lang>@[a-zA-Z][a-zA-Z0-9-]*)
  | (?P<dtype_sep>\^\^)
  | (?P<bnode>_:[A-Za-z0-9_.-]+)
  | (?P<pname>[A-Za-z_][\w-]*(?:\.[\w-]+)*)?:(?P<local>(?:[\w%-]+(?:\.+[\w%-]+)*)?)
  | (?P<number>[+-]?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<kw_a>\ba\b)
  | (?P<bool>\btrue\b|\bfalse\b)
  | (?P<punct>[\[\]().;,])
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            if n in _ESCAPES:
                out.append(_ESCAPES[n])
                i += 2
                continue
            if n == "u" and i + 6 <= len(s):
                out.append(chr(int(s[i + 2:i + 6], 16)))
                i += 6
                continue
            if n == "U" and i + 10 <= len(s):
                out.append(chr(int(s[i + 2:i + 10], 16)))
                i += 10
                continue
        out.append(c)
        i += 1
    return "".join(out)


class _Tokens:
    def __init__(self, text: str):
        self.toks: list[tuple[str, str]] = []
        for m in _TOKEN_RE.finditer(text):
            kind = m.lastgroup
            if kind in ("comment",):
                continue
            if kind == "local":
                # pname match: reconstruct "prefix:local"
                self.toks.append(("pname", m.group(0)))
            elif kind is None:
                continue
            else:
                if kind in ("pname",):
                    self.toks.append(("pname", m.group(0)))
                else:
                    self.toks.append((kind, m.group(0)))
        self.pos = 0

    def peek(self) -> Optional[tuple[str, str]]:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self) -> tuple[str, str]:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, value: str) -> None:
        t = self.next()
        if t[1] != value:
            raise SyntaxError(f"expected {value!r}, got {t[1]!r} at token {self.pos}")


class TurtleParser:
    def __init__(self) -> None:
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self.triples: list[Triple] = []
        self._bnode_n = 0

    # -- public -------------------------------------------------------------

    def parse(self, text: str) -> list[Triple]:
        tk = _Tokens(text)
        while tk.peek() is not None:
            kind, val = tk.peek()
            if kind == "prefix_decl":
                self._directive(tk)
            else:
                self._triples_block(tk)
        return self.triples

    # -- grammar ------------------------------------------------------------

    def _directive(self, tk: _Tokens) -> None:
        _, decl = tk.next()
        if decl in ("@prefix", "PREFIX"):
            _, pname = tk.next()
            prefix = pname[:-1] if pname.endswith(":") else pname.split(":")[0]
            _, iri = tk.next()
            self.prefixes[prefix] = iri[1:-1]
        else:  # @base / BASE
            _, iri = tk.next()
            self.base = iri[1:-1]
        if decl.startswith("@"):
            tk.expect(".")

    def _triples_block(self, tk: _Tokens) -> None:
        subj = self._term(tk, position="subject")
        self._predicate_object_list(tk, subj)
        tk.expect(".")

    def _predicate_object_list(self, tk: _Tokens, subj: Term) -> None:
        while True:
            pred = self._verb(tk)
            while True:
                obj = self._term(tk, position="object")
                self.triples.append((subj, pred, obj))
                nxt = tk.peek()
                if nxt and nxt[1] == ",":
                    tk.next()
                    continue
                break
            nxt = tk.peek()
            if nxt and nxt[1] == ";":
                tk.next()
                nxt = tk.peek()
                # repeated ';' are legal Turtle (e.g. `ex:p ex:o ; ;`)
                while nxt and nxt[1] == ";":
                    tk.next()
                    nxt = tk.peek()
                # allow trailing ';' before '.' or ']'
                if nxt and nxt[1] in (".", "]"):
                    return
                continue
            return

    def _verb(self, tk: _Tokens) -> Term:
        kind, val = tk.peek()
        if kind == "kw_a" or (kind == "pname" and val == "a"):
            tk.next()
            return ("iri", RDF_TYPE)
        return self._term(tk, position="predicate")

    def _term(self, tk: _Tokens, position: str) -> Term:
        kind, val = tk.next()
        if kind == "iri":
            iri = val[1:-1]
            if self.base and not re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", iri):
                iri = self.base + iri
            return ("iri", _unescape(iri))
        if kind == "kw_a" and position == "predicate":
            return ("iri", RDF_TYPE)
        if kind == "pname":
            if ":" not in val:
                raise SyntaxError(f"bare token {val!r} in {position}")
            prefix, _, local = val.partition(":")
            if prefix not in self.prefixes:
                raise SyntaxError(f"undefined prefix {prefix!r}:")
            return ("iri", self.prefixes[prefix] + local)
        if kind == "bnode":
            return ("bnode", val[2:])
        if kind in ("string_dq", "string_sq"):
            return self._literal(tk, _unescape(val[1:-1]))
        if kind in ("triple_dq", "triple_sq"):
            return self._literal(tk, _unescape(val[3:-3]))
        if kind == "number":
            dt = ("http://www.w3.org/2001/XMLSchema#integer"
                  if re.fullmatch(r"[+-]?\d+", val)
                  else "http://www.w3.org/2001/XMLSchema#decimal"
                  if "e" not in val.lower()
                  else "http://www.w3.org/2001/XMLSchema#double")
            return ("literal", val, dt, None)
        if kind == "bool":
            return ("literal", val, "http://www.w3.org/2001/XMLSchema#boolean", None)
        if val == "[":
            return self._anon_bnode(tk)
        if val == "(":
            return self._collection(tk)
        raise SyntaxError(f"unexpected token {val!r} in {position}")

    def _literal(self, tk: _Tokens, value: str) -> Term:
        nxt = tk.peek()
        if nxt and nxt[0] == "lang":
            tk.next()
            return ("literal", value, None, nxt[1][1:])
        if nxt and nxt[0] == "dtype_sep":
            tk.next()
            dt = self._term(tk, position="datatype")
            return ("literal", value, dt[1], None)
        return ("literal", value, None, None)

    def _fresh_bnode(self) -> Term:
        self._bnode_n += 1
        return ("bnode", f"anon{self._bnode_n}")

    def _anon_bnode(self, tk: _Tokens) -> Term:
        node = self._fresh_bnode()
        nxt = tk.peek()
        if nxt and nxt[1] == "]":
            tk.next()
            return node
        self._predicate_object_list(tk, node)
        tk.expect("]")
        return node

    def _collection(self, tk: _Tokens) -> Term:
        items: list[Term] = []
        while True:
            nxt = tk.peek()
            if nxt is None:
                raise SyntaxError("unterminated collection")
            if nxt[1] == ")":
                tk.next()
                break
            items.append(self._term(tk, position="object"))
        if not items:
            return ("iri", RDF_NIL)
        head = self._fresh_bnode()
        node = head
        for i, item in enumerate(items):
            self.triples.append((node, ("iri", RDF_FIRST), item))
            if i == len(items) - 1:
                self.triples.append((node, ("iri", RDF_REST), ("iri", RDF_NIL)))
            else:
                nxt_node = self._fresh_bnode()
                self.triples.append((node, ("iri", RDF_REST), nxt_node))
                node = nxt_node
        return head


def parse_turtle(text: str) -> list[Triple]:
    return TurtleParser().parse(text)


class Graph:
    """Tiny triple store with the few lookups the mapping compiler needs."""

    def __init__(self, triples: list[Triple], base: str = ""):
        self.triples = triples
        self.base = base  # document @base — needed for relative-IRI data
        self._spo: dict[Term, dict[str, list[Term]]] = {}
        for s, p, o in triples:
            self._spo.setdefault(s, {}).setdefault(p[1], []).append(o)

    @classmethod
    def parse(cls, text: str) -> "Graph":
        parser = TurtleParser()
        triples = parser.parse(text)
        return cls(triples, base=parser.base)

    def subjects(self, pred: str, obj: Term | None = None) -> Iterator[Term]:
        for s, props in self._spo.items():
            for o in props.get(pred, []):
                if obj is None or o == obj:
                    yield s
                    break

    def objects(self, subj: Term, pred: str) -> list[Term]:
        return self._spo.get(subj, {}).get(pred, [])

    def value(self, subj: Term, pred: str) -> Optional[Term]:
        objs = self.objects(subj, pred)
        return objs[0] if objs else None

    def predicates(self, subj: Term) -> list[str]:
        return list(self._spo.get(subj, {}).keys())
