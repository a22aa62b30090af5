"""Round-4 advice fixes: ODS row repeats / covered cells, XLSX sheet
order, short-circuit condition eval, gather structs-flatten fallback."""

from __future__ import annotations

import json
import zipfile

import pytest

from morph_kgc_spark import materialize
from morph_kgc_spark.functions.builtins import _safe_eval_bool
from morph_kgc_spark.sources.sheets import read_ods, read_xlsx

EX = "http://example.com/"


# ---------------------------------------------------------------- ODS

_ODS_CONTENT = """<?xml version="1.0" encoding="UTF-8"?>
<office:document-content
 xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"
 xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0"
 xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0">
 <office:body><office:spreadsheet>
  <table:table table:name="Sheet1">
   <table:table-row>
    <table:table-cell office:value-type="string"><text:p>a</text:p></table:table-cell>
    <table:table-cell office:value-type="string"><text:p>b</text:p></table:table-cell>
    <table:table-cell office:value-type="string"><text:p>c</text:p></table:table-cell>
   </table:table-row>
   <table:table-row table:number-rows-repeated="3">
    <table:table-cell office:value-type="string"><text:p>x</text:p></table:table-cell>
    <table:table-cell office:value-type="float" office:value="1"/>
    <table:table-cell office:value-type="float" office:value="2"/>
   </table:table-row>
   <table:table-row>
    <table:table-cell table:number-columns-spanned="2"
        office:value-type="string"><text:p>merged</text:p></table:table-cell>
    <table:covered-table-cell/>
    <table:table-cell office:value-type="string"><text:p>after</text:p></table:table-cell>
   </table:table-row>
  </table:table>
 </office:spreadsheet></office:body>
</office:document-content>
"""


def _write_ods(path):
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        z.writestr("content.xml", _ODS_CONTENT)


def test_ods_row_repeats_expand(tmp_path):
    """table:number-rows-repeated collapses identical data rows; the
    reader must expand them (LibreOffice writes e.g. two identical
    consecutive rows as one element with repeat=2)."""
    p = tmp_path / "t.ods"
    _write_ods(p)
    df = read_ods(str(p))
    assert list(df.columns) == ["a", "b", "c"]
    assert len(df) == 4  # 3 repeated data rows + the merged row
    assert [r for r in df["a"][:3]] == ["x", "x", "x"]


def test_ods_covered_cell_keeps_column_positions(tmp_path):
    """A merged range's covered-table-cell still occupies its grid
    column: the value AFTER the merge must land in column 3, not
    shift left into column 2."""
    p = tmp_path / "t.ods"
    _write_ods(p)
    df = read_ods(str(p))
    import pandas as pd

    last = df.iloc[-1]
    assert last["a"] == "merged"
    assert pd.isna(last["b"])  # covered by the merge
    assert last["c"] == "after"


# --------------------------------------------------------------- XLSX

_WB = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets>
  <sheet name="Data" sheetId="1" r:id="rId2"/>
  <sheet name="Old" sheetId="2" r:id="rId1"/>
 </sheets>
</workbook>"""
_RELS = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""


def _sheet_xml(value):
    return (
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>col</t></is></c></row>'
        f'<row r="2"><c r="A2" t="inlineStr"><is><t>{value}</t></is></c></row>'
        "</sheetData></worksheet>"
    )


def test_xlsx_first_sheet_resolved_from_workbook_order(tmp_path):
    """The first TAB is sheet2.xml here (tabs were reordered); picking
    the lexicographically first file would read the wrong sheet."""
    p = tmp_path / "t.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/workbook.xml", _WB)
        z.writestr("xl/_rels/workbook.xml.rels", _RELS)
        z.writestr("xl/worksheets/sheet1.xml", _sheet_xml("WRONG"))
        z.writestr("xl/worksheets/sheet2.xml", _sheet_xml("RIGHT"))
    df = read_xlsx(str(p))
    assert df.iloc[0]["col"] == "RIGHT"


def test_xlsx_falls_back_without_workbook_xml(tmp_path):
    p = tmp_path / "t.xlsx"
    with zipfile.ZipFile(p, "w") as z:
        z.writestr("xl/worksheets/sheet1.xml", _sheet_xml("ONLY"))
    df = read_xlsx(str(p))
    assert df.iloc[0]["col"] == "ONLY"


# -------------------------------------------------- short-circuit eval

def test_safe_eval_short_circuits_like_python():
    assert _safe_eval_bool("1 == 1 or 1/0") is True
    assert _safe_eval_bool("1 == 2 and 1/0") is False
    assert _safe_eval_bool("0 or 'x'") is True   # returns operand, bool()ed
    with pytest.raises(ZeroDivisionError):
        _safe_eval_bool("1/0 or 1 == 1")  # live operand still evaluates


# ------------------------------------- gather structs-flatten fallback

def test_gather_scalar_ref_under_array_falls_back_to_full_flatten(spark, tmp_path):
    """A gather reference nested under an array ("items.name") is not a
    column under the array-preserving load; the compiler must fall back
    to the full cartesian flatten (grouped cross-row gather) instead of
    failing analysis."""
    p = tmp_path / "d.json"
    p.write_text(json.dumps([
        {"id": "a", "items": [{"name": "1"}, {"name": "2"}]},
        {"id": "b", "items": [{"name": "3"}]},
    ]))
    ttl = f"""
@prefix rml: <http://w3id.org/rml/>.
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>.
@prefix ex: <{EX}>.
<#TM> a rml:TriplesMap;
  rml:logicalSource [ rml:source "{p}" ;
      rml:referenceFormulation rml:JSONPath ; rml:iterator "$.*" ] ;
  rml:predicateObjectMap [
    rml:predicate ex:with ;
    rml:objectMap [ rml:gather ( [ rml:reference "items.name" ] ) ;
                    rml:gatherAs rdf:Bag ] ] ;
  rml:subjectMap [ rml:template "{EX}e/{{id}}" ] .
"""
    from morph_kgc_spark.mapping import parse_any_mapping

    rules = parse_any_mapping(ttl)
    out = materialize(spark, rules)
    rows = [(r.subject, r.predicate, r.object) for r in out.collect()]
    # bag membership triples must carry every item value
    members = sorted(o for s, p_, o in rows
                     if p_.endswith("#_1>") or p_.endswith("#_2>"))
    assert any('"1"' == o for o in members) or \
           any(o == '"1"' for s, p_, o in rows), rows
    objs = {o for _, _, o in rows}
    assert '"1"' in objs and '"2"' in objs and '"3"' in objs


# ------------------------- self-review regression tests (round 4)

def test_strict_mode_decimal_and_tinyint_lexicals(spark, tmp_path):
    """DECIMAL columns must NOT get exponent-notation lexicals (illegal
    for xsd:decimal), and TINYINT (→ xsd:boolean) must canonicalize its
    integers to true/false."""
    import sqlite3

    db = tmp_path / "t.db"
    con = sqlite3.connect(db)
    con.execute('CREATE TABLE "T" ("ID" INTEGER, "price" DECIMAL(5,2), '
                '"flag" TINYINT)')
    con.execute('INSERT INTO "T" VALUES (1, 3.5, 1), (2, 30.0, 0)')
    con.commit(); con.close()
    ttl = tmp_path / "m.ttl"
    ttl.write_text("""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
<#TM> rr:logicalTable [ rr:tableName "T" ];
  rr:subjectMap [ rr:template "http://e.com/{ID}" ];
  rr:predicateObjectMap [ rr:predicate <http://e.com/price> ;
                          rr:objectMap [ rr:column "price" ] ];
  rr:predicateObjectMap [ rr:predicate <http://e.com/flag> ;
                          rr:objectMap [ rr:column "flag" ] ] .
""")
    import morph_kgc_spark as mks

    ini = ("[CONFIGURATION]\nstrict_natural_mapping=yes\n[DataSource]\n"
           f"mappings={ttl}\ndb_url=sqlite:///{db}\n")
    objs = {r.object for r in mks.materialize_from_config(spark, ini).collect()}
    dec = "http://www.w3.org/2001/XMLSchema#decimal"
    boo = "http://www.w3.org/2001/XMLSchema#boolean"
    assert f'"3.5"^^<{dec}>' in objs, objs
    assert f'"30"^^<{dec}>' in objs, objs          # no 3.0E1 for decimal
    assert f'"true"^^<{boo}>' in objs, objs        # not "1"
    assert f'"false"^^<{boo}>' in objs, objs


def test_fingerprint_keeps_null_text_rows(spark):
    """A NULL text must still yield a fingerprint row (value 0), not
    silently vanish from the output (count parity with the input)."""
    from morph_kgc_spark.operators.text import fingerprint

    df = spark.createDataFrame([(1, "a b c"), (2, None)],
                               ["doc_id", "text"])
    rows = {r.doc_id: r.fingerprint for r in
            fingerprint(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2}
    assert rows[2] == 0


def test_compare_rejects_malformed_iri_line():
    from morph_kgc_spark.compare import canonical_nquads

    with pytest.raises(ValueError, match="unclosed IRI"):
        canonical_nquads(["<http://truncated "])
