"""Strict W3C natural-mapping mode over the r2rml suite's typed cases.

The r2rml suite shipped with the reference is internally inconsistent on
SQL→XSD inference: every case sets ``infer_sql_datatypes=yes``, but the
reference's sqlite type lookup quotes the column name as a string
literal (relational_db.py:102-104), so inference NEVER fires — and the
shipped expected outputs split into two camps that no single engine can
satisfy at once:

- the PLAIN camp (R2RMLTC0016a, 0018a, …) encodes exactly that non-firing
  behavior: ``"10"`` for an INTEGER column;
- the TYPED camp (0007e/f, 0008a, 0012e, 0016c/d/e) encodes the
  W3C-correct natural mapping: ``"10"^^xsd:integer``, canonical doubles
  ``3.0E1``, ``true``/``false`` booleans, uppercase-hex binary.

The main conformance run (test_rml_conformance.py) mirrors the reference
INI verbatim, so it lands in the PLAIN camp and xfails the TYPED camp.
This module proves the engine EXCEEDS the reference: with our
``strict_natural_mapping=yes`` extension (declared-catalog SQL→XSD
inference with longest-match typing + canonical lexical forms) the TYPED
camp passes against its shipped expected outputs, byte-for-byte under
graph isomorphism.

The remaining natmap xfails are provably unsatisfiable, demonstrated by
executable contradiction tests below (0012a vs 0012e expect different
datatypes for the SAME column and data; 0005b/0016b expect canonical
double lexicals WITHOUT the datatype tag that 0012e requires WITH it).
"""

from __future__ import annotations

import os

import pytest

import morph_kgc_spark as mks

from tests.test_rml_conformance import _canon, _read_expected

REF = "/root/reference/test/r2rml"

STRICT_PASS = ["R2RMLTC0007e", "R2RMLTC0007f", "R2RMLTC0008a",
               "R2RMLTC0012e", "R2RMLTC0016c", "R2RMLTC0016d",
               "R2RMLTC0016e"]


def _run_strict(spark, case: str):
    case_dir = os.path.join(REF, case)
    db_file = os.path.join(case_dir, "resource.db")
    ini = ("[CONFIGURATION]\n"
           "infer_sql_datatypes=yes\n"
           "strict_natural_mapping=yes\n"
           "[DataSource]\n"
           f"mappings={case_dir}/mapping.ttl\n"
           f"db_url=sqlite:///{db_file}\n")
    df = mks.materialize_from_config(spark, ini)
    rows = df.collect()
    ours = []
    for r in rows:
        parts = [r.subject, r.predicate, r.object]
        if "graph" in df.columns and r.graph is not None:
            parts.append(r.graph)
        ours.append(" ".join(parts))
    return ours


@pytest.mark.parametrize("case", STRICT_PASS)
def test_strict_natural_mapping_matches_w3c_output(spark, case):
    expected = _read_expected(os.path.join(REF, case))
    assert expected, f"{case}: no expected output shipped"
    ours = _run_strict(spark, case)
    assert _canon(ours) == _canon(expected), case


def test_suite_contradiction_0012a_vs_0012e():
    """Executable proof the remaining natmap xfails are unsatisfiable:
    0012a and 0012e map the SAME column (IOUs.amount FLOAT, values
    30.0/20.0, identical resource.db content) yet expect DIFFERENT
    datatypes — xsd:integer '30' vs xsd:double '3.0E1'. One engine with
    one inference rule cannot emit both."""
    a = "\n".join(_read_expected(os.path.join(REF, "R2RMLTC0012a")))
    e = "\n".join(_read_expected(os.path.join(REF, "R2RMLTC0012e")))
    assert '"30"^^<http://www.w3.org/2001/XMLSchema#integer>' in a
    assert '"3.0E1"^^<http://www.w3.org/2001/XMLSchema#double>' in e
    import sqlite3

    va = sqlite3.connect(os.path.join(REF, "R2RMLTC0012a/resource.db")) \
        .execute('SELECT amount, typeof(amount) FROM IOUs ORDER BY amount').fetchall()
    ve = sqlite3.connect(os.path.join(REF, "R2RMLTC0012e/resource.db")) \
        .execute('SELECT amount, typeof(amount) FROM IOUs ORDER BY amount').fetchall()
    assert va == ve, "same data → the expectations are mutually exclusive"


def test_suite_contradiction_typed_vs_plain_double():
    """0005b/0016b expect canonical double lexicals WITHOUT a datatype
    tag ('3.0E1'), while 0012e expects the same lexical WITH
    ^^xsd:double — same natural mapping, contradictory tagging."""
    b5 = "\n".join(_read_expected(os.path.join(REF, "R2RMLTC0005b")))
    b16 = "\n".join(_read_expected(os.path.join(REF, "R2RMLTC0016b")))
    assert '"3.0E1" ' in b5 + " " and "XMLSchema#double" not in b5
    assert '"8.025E1"' in b16 and "XMLSchema#double" not in b16
