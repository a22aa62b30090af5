"""Turtle-level RML-CC gather and FNML parsing → end-to-end triples."""

import json
import os

from morph_kgc_spark import materialize
from morph_kgc_spark.mapping.parser import parse_mapping

EX = "http://example.com/"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RML = "http://w3id.org/rml/"
GREL = "http://users.ugent.be/~bjdmeest/function/grel.ttl#"


def _write(tmp_path, name, content):
    p = str(tmp_path / name)
    with open(p, "w") as f:
        f.write(content)
    return p


def test_gather_list_from_turtle(spark, tmp_path):
    # RMLTC-CC-0001-List shape: JSON objects with a values array
    data = _write(tmp_path, "data.json", json.dumps(
        {"items": [{"id": "a", "v1": "x", "v2": "y"}]}))
    mapping = f"""
@prefix rml: <{RML}> .
@prefix rdf: <{RDF}> .
<#tm> rml:logicalSource [ rml:source "{data}" ;
                          rml:iterator "$.items[*]" ] ;
  rml:subjectMap [ rml:template "{EX}s/{{id}}" ] ;
  rml:predicateObjectMap [
    rml:predicate <{EX}values> ;
    rml:objectMap [
      rml:gather ( [ rml:reference "v1" ] [ rml:reference "v2" ] ) ;
      rml:gatherAs rdf:List ;
      rml:template "{EX}list/{{id}}"
    ]
  ] .
"""
    rules = parse_mapping(mapping)
    assert len(rules) == 1 and rules[0].gather is not None
    assert rules[0].gather.references == ("v1", "v2")
    assert rules[0].gather.gather_as == RDF + "List"
    assert rules[0].gather.head.value == EX + "list/{id}"

    rows = {tuple(r) for r in materialize(spark, rules).collect()}
    assert (f"<{EX}s/a>", f"<{EX}values>", f"<{EX}list/a>") in rows
    assert (f"<{EX}list/a>", f"<{RDF}first>", '"x"') in rows
    # second element lives on a bnode chain ending in nil
    rests = {o for s, p, o in rows if p == f"<{RDF}rest>"}
    assert f"<{RDF}nil>" in rests


def test_fnml_from_turtle(spark, tmp_path):
    csv = _write(tmp_path, "d.csv", "ID,Name\n1,ana maria\n")
    mapping = f"""
@prefix rml: <{RML}> .
@prefix grel: <{GREL}> .
<#tm> rml:logicalSource [ rml:source "{csv}" ] ;
  rml:subjectMap [ rml:template "{EX}{{ID}}" ] ;
  rml:predicateObjectMap [
    rml:predicate <{EX}name> ;
    rml:objectMap [
      rml:functionExecution [
        rml:function grel:toUpperCase ;
        rml:input [
          rml:parameter grel:valueParam ;
          rml:inputValueMap [ rml:reference "Name" ]
        ]
      ]
    ]
  ] .
"""
    rules = parse_mapping(mapping)
    assert rules[0].object.kind == "execution"
    assert rules[0].object.value == GREL + "toUpperCase"
    rows = [tuple(r) for r in materialize(spark, rules).collect()]
    assert rows == [(f"<{EX}1>", f"<{EX}name>", '"ANA MARIA"')]
