"""Run the reference's own RML test suite end-to-end.

Each case directory under /root/reference/test/{rml-core,rml-star,rml-cc}
carries a mapping.ttl and an expected output.nq; we materialize the
mapping with OUR engine and compare triple sets (bnode-label- and
whitespace-insensitive). Cases whose reference test asserts an exception
(``assert False`` inside try) are expected-error cases: our engine must
raise too (or produce nothing, for empty expected output).

Known-unsupported cases are XFAIL with reasons, so a regression in any
passing case fails loudly while the conformance score stays honest.
"""

from __future__ import annotations

import os
import re

import pytest

import morph_kgc_spark as mks
from morph_kgc_spark.mapping import parse_any_mapping

REF = "/root/reference"
FAMILIES = ["rml-core/csv", "rml-core/json", "rml-core/xml",
            "rml-core/tabular", "rml-star", "rml-cc/JSON", "rml-tv",
            "rml-fnml", "issues", "r2rml",
            "rml-in-memory/json_dictionary", "rml-in-memory/pandas_dataframe"]

# case → reason
_R2RML_NATMAP = (
    "suite-internal inconsistency: these expected outputs encode W3C "
    "natural-mapping typed literals / canonical double lexicals "
    "('3.0E1', '10'^^xsd:integer) that the reference implementation "
    "itself does not produce (its sqlite type lookup quotes the column "
    "name as a string literal, so inference never fires), while sibling "
    "cases with identical shapes (R2RMLTC0016a vs 0007e: both "
    "rr:column ID over INTEGER) expect PLAIN literals — the two "
    "expectations are mutually exclusive for one engine. This run "
    "mirrors the reference INI (PLAIN camp); the SAME cases PASS under "
    "our strict_natural_mapping=yes extension — see "
    "test_r2rml_strict_natmap.py")

_R2RML_NATMAP_IMPOSSIBLE = (
    "provably unsatisfiable under ANY inference policy: 0012a expects "
    "'30'^^xsd:integer and 0012e expects '3.0E1'^^xsd:double for the "
    "SAME column (IOUs.amount FLOAT) with IDENTICAL data, and "
    "0005b/0016b expect the canonical double lexical WITHOUT the "
    "datatype tag 0012e requires WITH it — executable proofs in "
    "test_r2rml_strict_natmap.py::test_suite_contradiction_*")

XFAIL = {
    "r2rml/R2RMLTC0002f":
        "the reference's own test asserts an exception (its impl crashes "
        "on this shape) and ships NO expected output; our engine — "
        "strict mode included — materializes the W3C-valid triples "
        "instead of crashing, which this error-case harness counts as a "
        "failure",
    "r2rml/R2RMLTC0005b": _R2RML_NATMAP_IMPOSSIBLE,
    "r2rml/R2RMLTC0007e": _R2RML_NATMAP,
    "r2rml/R2RMLTC0007f": _R2RML_NATMAP,
    "r2rml/R2RMLTC0008a": _R2RML_NATMAP,
    "r2rml/R2RMLTC0012a": _R2RML_NATMAP_IMPOSSIBLE,
    "r2rml/R2RMLTC0012e": _R2RML_NATMAP,
    "r2rml/R2RMLTC0016b": _R2RML_NATMAP_IMPOSSIBLE,
    "r2rml/R2RMLTC0016c": _R2RML_NATMAP,
    "r2rml/R2RMLTC0016d": _R2RML_NATMAP,
    "r2rml/R2RMLTC0016e": _R2RML_NATMAP,
    "r2rml/R2RMLTC0020a":
        "shipped resource.db ('http://company.com/Alice') contradicts "
        "the expected output ('http://example.com/company/Alice')",
    "r2rml/R2RMLTC0020b":
        "shipped resource.db contradicts the expected output (same as "
        "R2RMLTC0020a)",
}

from morph_kgc_spark.compare import (  # noqa: F401 — re-exported for
    BNODE_RE,  # sibling test modules (test_canonicalizer, strict natmap)
    canonical_nquads as _canon,
    canonical_triples as _canonical_lines,
    tokenize_nquads as _tokenize_nq,
)


def _cases():
    out = []
    for family in FAMILIES:
        base = os.path.join(REF, "test", family)
        if not os.path.isdir(base):
            continue
        for d in sorted(os.listdir(base)):
            full = os.path.join(base, d)
            if os.path.isdir(full) and \
                    os.path.exists(os.path.join(full, "mapping.ttl")):
                out.append((f"{family}/{d}", full))
                if os.path.exists(os.path.join(full, "mapping.yaml")):
                    # YARRRML twin shipped alongside the Turtle mapping
                    # (json/complex): same expected output, parsed through
                    # the YARRRML front-end
                    out.append((f"{family}/{d}#yarrrml", full))
    return out


def _expects_error(case_dir: str, expected: list[str]) -> bool:
    """The reference test for this case asserts an exception."""
    if not expected:
        return True
    for name in os.listdir(case_dir):
        if name.startswith("test_") and name.endswith(".py"):
            with open(os.path.join(case_dir, name)) as f:
                body = f.read()
            if "assert False" in body and "except" in body:
                return True
    return False


def _render(df, rows) -> list[str]:
    out = []
    for r in rows:
        parts = [r.subject, r.predicate, r.object]
        if "graph" in df.columns and r.graph is not None:
            parts.append(r.graph)
        out.append(" ".join(parts))
    return out


def _read_expected(case_dir: str) -> list[str]:
    p = os.path.join(case_dir, "output.nq")
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return [ln.strip() for ln in f
                if ln.strip() and not ln.lstrip().startswith("#")]


def _extract_python_source(case_dir: str):
    """Pull the in-memory data definition out of the case's reference
    test: the statements between the test function header and the
    mapping_path line build the python_source dict passed to
    materialize (rml-in-memory suite)."""
    import textwrap

    for name in sorted(os.listdir(case_dir)):
        if not (name.startswith("test_") and name.endswith(".py")):
            continue
        with open(os.path.join(case_dir, name)) as f:
            body = f.read()
        m = re.search(r"def test_\w+\(\):\n(.*?)\n\s*mapping_path",
                      body, re.DOTALL)
        call = re.search(r"materialize(?:_set)?\(config\s*,\s*(\w+)\s*\)", body)
        if not m or not call:
            return None
        code = "\n".join(
            ln for ln in textwrap.dedent(m.group(1)).splitlines()
            if not ln.strip().startswith(("g.parse", "g =", "#")))
        import pandas as pd

        ns = {"pd": pd, "pandas": pd, "os": os}
        exec(compile(code, name, "exec"), ns)  # noqa: S102 — suite fixtures
        return ns.get(call.group(1))
    return None


def _materialize(spark, case_dir: str, yarrrml: bool = False):
    if "rml-in-memory" in case_dir:
        data = _extract_python_source(case_dir)
        if data is None:
            pytest.skip("could not extract in-memory fixture data")
        ini = f"[DataSource]\nmappings={case_dir}/mapping.ttl\n"
        df = mks.materialize_from_config(spark, ini, python_source=data)
        return df, df.collect()
    udf_file = os.path.join(case_dir, "udf.py")
    if os.path.exists(udf_file):
        from morph_kgc_spark.functions.builtins import load_udfs

        load_udfs(udf_file)
    db_file = os.path.join(case_dir, "resource.db")
    if os.path.exists(db_file):
        # SQLite-backed case (r2rml family): drive it exactly like the
        # reference test does — through the INI config
        infer = ""
        for name in os.listdir(case_dir):
            # some cases name their test R2RMLTC00NNx_SQLITE.py (no
            # test_ prefix) — scan every python file for the flag
            if name.endswith(".py"):
                with open(os.path.join(case_dir, name)) as f:
                    if "infer_sql_datatypes=yes" in f.read():
                        infer = "infer_sql_datatypes=yes\n"
        ini = (f"[CONFIGURATION]\n{infer}"
               f"[DataSource]\nmappings={case_dir}/mapping.ttl\n"
               f"db_url=sqlite:///{db_file}\n")
        df = mks.materialize_from_config(spark, ini)
        return df, df.collect()
    mapping_file = "mapping.yaml" if yarrrml else "mapping.ttl"
    with open(os.path.join(case_dir, mapping_file)) as f:
        text = f.read()
    try:
        rules = parse_any_mapping(text, base_dir=REF)
        df = mks.materialize(spark, rules)
        return df, df.collect()
    except Exception:
        # a few suite files use sources relative to the case dir
        rules = parse_any_mapping(text, base_dir=case_dir)
        df = mks.materialize(spark, rules)
        return df, df.collect()


@pytest.mark.parametrize("name,case_dir", _cases(),
                         ids=[c[0] for c in _cases()])
def test_rml_conformance(spark, name, case_dir):
    if name in XFAIL:
        pytest.xfail(XFAIL[name])
    yarrrml = name.endswith("#yarrrml")
    expected = _read_expected(case_dir)
    if _expects_error(case_dir, expected):
        try:
            df, rows = _materialize(spark, case_dir, yarrrml)
        except Exception:
            return  # engine rejected the invalid mapping: pass
        if expected:
            # the reference's error test is VACUOUS — `assert False`
            # INSIDE the try block raises AssertionError, which its own
            # bare `except` swallows, so that test passes whether or
            # not materialize() raises — and the suite ships non-empty
            # W3C expected triples. When OUR validation accepts the
            # mapping (it rejects the genuinely-invalid shapes like
            # TC0004b's literal subject above), the shipped W3C
            # artifact is the real ground truth: grade as a normal
            # comparison (R2RMLTC0002b — legal blank-node template
            # subject, round-5 directive #9).
            assert _canon(_render(df, rows)) == _canon(expected), name
            return
        assert rows == [], f"{name}: expected error/empty, got {len(rows)} rows"
        return
    df, rows = _materialize(spark, case_dir, yarrrml)
    ours = _render(df, rows)
    with open(os.path.join(case_dir, "mapping.ttl")) as f:
        mapping_text = f.read()
    if "#uuid" in mapping_text or ":uuid" in mapping_text:
        # non-deterministic uuid values: the reference's own test only
        # compares triple LENGTHS (test_RMLFNOTC0000_CSV)
        assert sorted(len(o) for o in _canon(ours)) == \
               sorted(len(e) for e in _canon(expected)), name
        return
    assert _canon(ours) == _canon(expected), name
