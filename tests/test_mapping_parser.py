"""End-to-end: RML Turtle mapping → rules → materialized triples.

Models the reference's test pattern (golden output comparison, e.g.
test/rml-core/csv/RMLTC0001a) with hand-computed expected triple sets.
"""

import os

from morph_kgc_spark import materialize
from morph_kgc_spark.mapping.parser import parse_mapping
from morph_kgc_spark.mapping.turtle import parse_turtle

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")

EX = "http://example.com/"
FOAF = "http://xmlns.com/foaf/0.1/"
XSD = "http://www.w3.org/2001/XMLSchema#"


def test_turtle_parser_core():
    triples = parse_turtle("""
@prefix ex: <http://example.com/> .
ex:s a ex:T ; ex:p "lit"@en, "42"^^ex:dt ; ex:q [ ex:r ex:o ] .
""")
    spo = {(s[1] if s[0] == "iri" else "_b", p[1], o[:2]) for s, p, o in triples}
    assert (EX + "s", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
            ("iri", EX + "T")) in spo
    lits = [o for s, p, o in triples if o[0] == "literal"]
    assert ("literal", "lit", None, "en") in lits
    assert ("literal", "42", EX + "dt", None) in lits


def test_parse_mapping_rule_count():
    rules = parse_mapping(os.path.join(FIXTURES, "mapping_basic.ttl"))
    # rr:class + name + id + join (TM1) + name (TM2) = 5 rules
    assert len(rules) == 5
    kinds = sorted(
        (r.predicate.value.rsplit("/", 1)[-1].rsplit("#", 1)[-1]) for r in rules
    )
    assert kinds == ["id", "name", "name", "plays", "type"]
    join_rule = [r for r in rules if r.join_conditions][0]
    assert join_rule.join_conditions[0].child == "Sport"
    assert join_rule.parent_subject.value == EX + "sport/{ID}"


def test_materialize_mapping_end_to_end(spark):
    out = materialize(spark, os.path.join(FIXTURES, "mapping_basic.ttl"))
    triples = {tuple(r) for r in out.collect()}

    expected = {
        # rr:class
        (f"<{EX}student/10>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", f"<{FOAF}Person>"),
        (f"<{EX}student/20>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", f"<{FOAF}Person>"),
        (f"<{EX}student/30>", "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", f"<{FOAF}Person>"),
        # names (literal, default termtype from reference)
        (f"<{EX}student/10>", f"<{FOAF}name>", '"Venus Williams"'),
        (f"<{EX}student/20>", f"<{FOAF}name>", '"Demi Moore"'),
        (f"<{EX}student/30>", f"<{FOAF}name>", '"Ana Laura"'),
        # typed ids
        (f"<{EX}student/10>", f"<{EX}id>", f'"10"^^<{XSD}integer>'),
        (f"<{EX}student/20>", f"<{EX}id>", f'"20"^^<{XSD}integer>'),
        (f"<{EX}student/30>", f"<{EX}id>", f'"30"^^<{XSD}integer>'),
        # join: row 20 has NULL Sport → dropped
        (f"<{EX}student/10>", f"<{EX}plays>", f"<{EX}sport/110>"),
        (f"<{EX}student/30>", f"<{EX}plays>", f"<{EX}sport/112>"),
        # TM2
        (f"<{EX}sport/110>", f"<{FOAF}name>", '"Tennis"'),
        (f"<{EX}sport/112>", f"<{FOAF}name>", '"Darts"'),
    }
    assert triples == expected


def test_mapping_partitions_assigned():
    from morph_kgc_spark.plans.partitioner import assign_mapping_partitions

    rules = assign_mapping_partitions(
        parse_mapping(os.path.join(FIXTURES, "mapping_basic.ttl")))
    parts = {r.mapping_partition for r in rules}
    # different predicate invariants → several disjoint groups
    assert len(parts) >= 3
    assert all(r.mapping_partition for r in rules)


def test_r2rml_legacy_vocab(spark):
    """R2RML rr: vocabulary (logicalTable/tableName/column) parses and
    materializes against a registered catalog table."""
    import pandas as pd

    spark.createDataFrame(pd.DataFrame(
        {"ID": [7], "NAME": ["Zed"]})).createOrReplaceTempView("STUDENT")
    mapping = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
<#tm> a rr:TriplesMap ;
  rr:logicalTable [ rr:tableName "STUDENT" ] ;
  rr:subjectMap [ rr:template "http://example.com/s/{ID}" ;
                  rr:class <http://example.com/Student> ] ;
  rr:predicateObjectMap [
    rr:predicate <http://example.com/name> ;
    rr:objectMap [ rr:column "NAME" ]
  ] .
"""
    out = materialize(spark, mapping)
    rows = {tuple(r) for r in out.collect()}
    assert rows == {
        ("<http://example.com/s/7>",
         "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>",
         "<http://example.com/Student>"),
        ("<http://example.com/s/7>", "<http://example.com/name>", '"Zed"'),
    }


def test_dynamic_datatype_map(spark):
    """Datatype map from a column (rml:datatypeMap with reference)."""
    import pandas as pd

    from morph_kgc_spark.sources.registry import default_registry
    from morph_kgc_spark import model as M
    from morph_kgc_spark.plans.compiler import compile_rule

    reg = default_registry()
    reg.register_python(spark, "t", {"ID": ["1"], "v": ["42"],
                                     "dt": ["http://www.w3.org/2001/XMLSchema#int"]})
    rule = M.Rule(
        source=M.Source("df", "t"),
        subject=M.TermMap(M.TEMPLATE, "http://example.com/{ID}", M.IRI),
        predicate=M.TermMap(M.CONSTANT, "http://example.com/p", M.IRI),
        object=M.TermMap(M.REFERENCE, "v", M.LITERAL),
        datatype=M.TermMap(M.REFERENCE, "dt"),
    )
    [r] = compile_rule(spark, rule, reg).collect()
    assert r.object == '"42"^^<http://www.w3.org/2001/XMLSchema#int>'


def test_graph_maps_produce_quads(spark, tmp_path):
    import pandas as pd

    csv = str(tmp_path / "g.csv")
    pd.DataFrame({"ID": ["1"], "Name": ["x"], "G": ["ga"]}).to_csv(csv, index=False)
    mapping = f"""
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
<#tm> rml:logicalSource [ rml:source "{csv}" ] ;
  rr:subjectMap [ rr:template "http://example.com/{{ID}}" ;
                  rr:graphMap [ rr:template "http://example.com/g/{{G}}" ] ] ;
  rr:predicateObjectMap [
    rr:predicate <http://example.com/name> ;
    rr:objectMap [ rml:reference "Name" ]
  ] .
"""
    out = materialize(spark, mapping)
    assert out.columns == ["subject", "predicate", "object", "graph"]
    [r] = out.collect()
    assert r.graph == "<http://example.com/g/ga>"


def test_rml_query_tabular_view(spark):
    """RML tabular view: rml:query SQL runs through Spark SQL (the
    reference runs DuckDB over files — data_file.py:59-60)."""
    import pandas as pd

    spark.createDataFrame(pd.DataFrame(
        {"ID": [1, 2, 3], "Name": ["a", "b", "c"], "active": [1, 0, 1]}
    )).createOrReplaceTempView("people")
    mapping = """
@prefix rml: <http://w3id.org/rml/> .
<#tm> rml:logicalSource [
    rml:query "SELECT ID, upper(Name) AS NAME FROM people WHERE active = 1"
  ] ;
  rml:subjectMap [ rml:template "http://example.com/{ID}" ] ;
  rml:predicateObjectMap [
    rml:predicate <http://example.com/name> ;
    rml:objectMap [ rml:reference "NAME" ]
  ] .
"""
    rows = {tuple(r) for r in materialize(spark, mapping).collect()}
    assert rows == {
        ("<http://example.com/1>", "<http://example.com/name>", '"A"'),
        ("<http://example.com/3>", "<http://example.com/name>", '"C"'),
    }
