"""YARRRML front-end: YAML mapping documents → identical Rule tables.

Shapes mirror the reference's translator (src/morph_kgc/mapping/
yarrrml.py:426-589) and the YARRRML spec examples it implements.
"""

import os

import pytest

from morph_kgc_spark import materialize
from morph_kgc_spark import model as M
from morph_kgc_spark.mapping import parse_any_mapping
from morph_kgc_spark.mapping.parser import parse_mapping
from morph_kgc_spark.mapping.yarrrml import parse_yarrrml

EX = "http://example.com/"
FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


def _rule_key(r: M.Rule):
    """Comparable projection of a Rule (ignores triples_map_id labels)."""
    tm = lambda t: None if t is None else (t.kind, t.value, t.termtype)  # noqa: E731
    return (r.source.kind, r.source.value, tm(r.subject), tm(r.predicate),
            tm(r.object), tm(r.graph), tm(r.parent_subject),
            r.join_conditions, tm(r.datatype), tm(r.language))


TTL_TWIN = f"""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
@prefix ex: <{EX}> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

<TriplesMap1> a rr:TriplesMap ;
  rml:logicalSource [ rml:source "student.csv" ] ;
  rr:subjectMap [ rr:template "{EX}student/{{ID}}" ] ;
  rr:predicateObjectMap [
    rr:predicate foaf:name ;
    rr:objectMap [ rml:reference "Name" ] ] ;
  rr:predicateObjectMap [
    rr:predicate ex:id ;
    rr:objectMap [ rml:reference "ID" ; rr:datatype xsd:integer ] ] ;
  rr:predicateObjectMap [
    rr:predicate ex:plays ;
    rr:objectMap [
      rr:parentTriplesMap <TriplesMap2> ;
      rr:joinCondition [ rr:child "Sport" ; rr:parent "ID" ] ] ] .

<TriplesMap2> a rr:TriplesMap ;
  rml:logicalSource [ rml:source "sport.csv" ] ;
  rr:subjectMap [ rr:template "{EX}sport/{{ID}}" ] ;
  rr:predicateObjectMap [
    rr:predicate ex:description ;
    rr:objectMap [ rml:reference "Description" ] ] .
"""

YML_TWIN = f"""
prefixes:
  ex: {EX}
  foaf: http://xmlns.com/foaf/0.1/
  xsd: http://www.w3.org/2001/XMLSchema#

mappings:
  student:
    sources: ['student.csv~csv']
    s: {EX}student/$(ID)
    po:
      - [foaf:name, $(Name)]
      - p: ex:id
        o:
          value: $(ID)
          datatype: xsd:integer
      - p: ex:plays
        o:
          mappings: sport
          condition:
            function: equal
            parameters:
              - [str1, $(Sport)]
              - [str2, $(ID)]
  sport:
    sources: ['sport.csv~csv']
    s: {EX}sport/$(ID)
    po:
      - [ex:description, $(Description)]
"""


def test_yarrrml_twin_of_turtle_mapping():
    """The YARRRML document compiles to the same rules as its TTL twin
    (VERDICT done-criterion for the YARRRML front-end)."""
    ttl_rules = {_rule_key(r) for r in parse_mapping(TTL_TWIN, FIXTURES)}
    yml_rules = {_rule_key(r) for r in parse_yarrrml(YML_TWIN, FIXTURES)}
    assert yml_rules == ttl_rules
    assert len(yml_rules) == 4


def test_yarrrml_materializes_like_turtle(spark):
    a = {tuple(r) for r in materialize(spark, parse_mapping(TTL_TWIN, FIXTURES)).collect()}
    b = {tuple(r) for r in materialize(spark, parse_yarrrml(YML_TWIN, FIXTURES)).collect()}
    assert a == b and len(a) > 0


def test_parse_any_mapping_dispatch(tmp_path):
    y = tmp_path / "m.yaml"
    y.write_text(YML_TWIN)
    t = tmp_path / "m.ttl"
    t.write_text(TTL_TWIN)
    for csv in ("student.csv", "sport.csv"):
        (tmp_path / csv).write_text("ID,Name,Sport,Description\n1,a,1,d\n")
    assert {_rule_key(r) for r in parse_any_mapping(str(y))} == \
           {_rule_key(r) for r in parse_any_mapping(str(t))}
    # inline text dispatch
    assert parse_any_mapping(YML_TWIN, FIXTURES)
    assert parse_any_mapping(TTL_TWIN, FIXTURES)


def test_yarrrml_po_shortcut_with_language_and_datatype():
    yml = f"""
mappings:
  d:
    sources: ['docs.csv~csv']
    s: {EX}doc/$(id)
    po:
      - [{EX}title, $(title), en~lang]
      - [{EX}size, $(size), http://www.w3.org/2001/XMLSchema#integer]
"""
    rules = parse_yarrrml(yml)
    by_pred = {r.predicate.value: r for r in rules}
    title = by_pred[EX + "title"]
    assert title.language.value == "en" and title.object.termtype == M.LITERAL
    size = by_pred[EX + "size"]
    assert size.datatype.value.endswith("integer")


def test_yarrrml_termtype_suffixes_and_graphs():
    yml = f"""
mappings:
  d:
    sources: ['d.csv~csv']
    s: {EX}s/$(id)
    graphs: {EX}g/$(part)
    po:
      - p: {EX}link
        o: {EX}o/$(ref)~iri
      - p: {EX}note
        o: $(txt)~literal
"""
    rules = parse_yarrrml(yml)
    by_pred = {r.predicate.value: r for r in rules}
    assert by_pred[EX + "link"].object.termtype == M.IRI
    assert by_pred[EX + "link"].object.kind == M.TEMPLATE
    assert by_pred[EX + "note"].object.termtype == M.LITERAL
    assert all(r.graph is not None and r.graph.kind == M.TEMPLATE
               for r in rules)


def test_yarrrml_named_sources_and_multiple_subject_rules():
    yml = f"""
sources:
  people: ['people.csv~csv']
mappings:
  p:
    sources: people
    s: {EX}p/$(id)
    po:
      - [{EX}a, $(x)]
      - [{EX}b, $(y)]
"""
    rules = parse_yarrrml(yml)
    assert len(rules) == 2
    assert all(r.source.kind == "csv" and r.source.value.endswith("people.csv")
               for r in rules)


def test_yarrrml_quoted_maps(spark, tmp_path):
    csv = tmp_path / "d.csv"
    csv.write_text("c1,c2,c3\nA,B,1\n")
    yml = f"""
mappings:
  inner:
    sources: ['{csv}~csv']
    s: http://example/$(c1)
    po:
      - [http://example/p, $(c2)]
  outer:
    sources: ['{csv}~csv']
    s:
      quotedNonAsserted: inner
    po:
      - [http://example/q, $(c3)]
"""
    out = {(r.subject, r.predicate, r.object)
           for r in materialize(spark, parse_yarrrml(yml)).collect()}
    assert out == {('<< <http://example/A> <http://example/p> "B" >>',
                    "<http://example/q>", '"1"')}


def test_yarrrml_inverse_predicates():
    yml = f"""
mappings:
  p:
    sources: ['d.csv~csv']
    s: {EX}p/$(id)
    po:
      - p: {EX}owns
        i: {EX}ownedBy
        o: {EX}thing/$(tid)~iri
"""
    rules = parse_yarrrml(yml)
    assert len(rules) == 2
    inv = [r for r in rules if r.predicate.value == EX + "ownedBy"][0]
    assert inv.subject.value == EX + "thing/{tid}"
    assert inv.object.value == EX + "p/{id}"


def test_yarrrml_function_term():
    yml = f"""
mappings:
  p:
    sources: ['d.csv~csv']
    s: {EX}p/$(id)
    po:
      - p: {EX}name
        o:
          function: http://users.ugent.be/~bjdmeest/function/grel.ttl#toUpperCase
          parameters:
            - [http://users.ugent.be/~bjdmeest/function/grel.ttl#valueParam, $(name)]
"""
    (rule,) = parse_yarrrml(yml)
    assert rule.object.kind == M.EXECUTION
    assert rule.object.value.endswith("toUpperCase")
    assert rule.object.args[0][0] == "string"
    assert rule.object.args[0][1].kind == M.REFERENCE
