"""Hierarchical sources: JSON iterators + cartesian flatten, XML rowTag."""

import json
import os

from morph_kgc_spark import materialize
from morph_kgc_spark import model as M
from morph_kgc_spark.sources.hierarchical import json_source, xml_source
from morph_kgc_spark.sources.registry import default_registry

EX = "http://example.com/"


def test_json_iterator_and_flatten(spark, tmp_path):
    data = {"students": [
        {"ID": "10", "Name": "Venus", "codes": ["a", "b"]},
        {"ID": "20", "Name": "Ana", "codes": ["c"]},
    ]}
    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        json.dump(data, f)

    df = json_source(spark, p, iterator="$.students[*]")
    rows = {(r.ID, r.Name, r.codes) for r in df.collect()}
    # nested array cartesian-flattened: one row per (student, code)
    assert rows == {("10", "Venus", "a"), ("10", "Venus", "b"), ("20", "Ana", "c")}


def test_json_top_level_array(spark, tmp_path):
    p = str(tmp_path / "arr.json")
    with open(p, "w") as f:
        json.dump([{"k": "1"}, {"k": "2"}], f)
    df = json_source(spark, p, iterator="$[*]")
    assert sorted(r.k for r in df.collect()) == ["1", "2"]


def test_xml_rowtag_attributes(spark, tmp_path):
    p = str(tmp_path / "d.xml")
    with open(p, "w") as f:
        f.write("<root>"
                "<student ID='10'><Name>Venus</Name></student>"
                "<student ID='20'><Name>Ana</Name></student>"
                "</root>")
    df = xml_source(spark, p, row_tag="student")
    assert "@ID" in df.columns
    rows = {(str(r["@ID"]), r.Name) for r in df.collect()}
    assert rows == {("10", "Venus"), ("20", "Ana")}


def test_materialize_from_json_source(spark, tmp_path):
    p = str(tmp_path / "d.json")
    with open(p, "w") as f:
        json.dump({"items": [{"ID": "1", "Name": "x"}]}, f)
    rule = M.Rule(
        source=M.Source("json", p, {"iterator": "$.items[*]"}),
        subject=M.TermMap(M.TEMPLATE, EX + "{ID}", M.IRI),
        predicate=M.TermMap(M.CONSTANT, EX + "name", M.IRI),
        object=M.TermMap(M.REFERENCE, "Name", M.LITERAL),
    )
    rows = materialize(spark, [rule]).collect()
    assert [tuple(r) for r in rows] == [(f"<{EX}1>", f"<{EX}name>", '"x"')]


def test_python_sources(spark):
    """Reference-compatible in-memory sources (python_data.py shapes)."""
    reg = default_registry()
    reg.register_python(spark, "as_dict", {"ID": ["1"], "Name": ["d"]})
    reg.register_python(spark, "as_records", [{"ID": "2", "Name": "r"}])
    reg.register_python(spark, "as_json", '[{"ID": "3", "Name": "j"}]')
    triples = set()
    for name in ("as_dict", "as_records", "as_json"):
        rule = M.Rule(
            source=M.Source("df", name),
            subject=M.TermMap(M.TEMPLATE, EX + "{ID}", M.IRI),
            predicate=M.TermMap(M.CONSTANT, EX + "name", M.IRI),
            object=M.TermMap(M.REFERENCE, "Name", M.LITERAL),
        )
        triples |= {tuple(r) for r in materialize(spark, [rule], registry=reg).collect()}
    assert triples == {
        (f"<{EX}1>", f"<{EX}name>", '"d"'),
        (f"<{EX}2>", f"<{EX}name>", '"r"'),
        (f"<{EX}3>", f"<{EX}name>", '"j"'),
    }
