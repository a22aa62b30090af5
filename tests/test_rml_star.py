"""RML-star mapping-document front-end (rml:quotedTriplesMap).

Document shapes mirror the reference's test/rml-star/RMLSTARTC00* cases:
quoted subject (TC002a), quoted object (TC004a), nested quoting (TC004a
thirdTM), NonAssertedTriplesMap (TC001b/008a), and quoted object with a
join condition (TC002b). Engine semantics were already oracle-green in
round 1; these tests cover the Turtle parsing path.
"""

import os

import pytest

from morph_kgc_spark import materialize
from morph_kgc_spark import model as M
from morph_kgc_spark.mapping.parser import parse_mapping

EX = "http://example/"

PREFIXES = """
@prefix rml: <http://w3id.org/rml/> .
@prefix ex: <http://example/> .
@prefix : <http://example.org/> .
"""


def _csv(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return p


def test_quoted_subject_parses_and_materializes(spark, tmp_path):
    """TC002a shape: asserted TM quoting another TM in subject position."""
    csv = _csv(tmp_path, "d.csv", "c1,c2,c3\nA,B,1\nX,Y,2\n")
    ttl = PREFIXES + f"""
:firstTM a rml:AssertedTriplesMap ;
  rml:logicalSource [ rml:source "{csv}" ] ;
  rml:subjectMap [ rml:template "{EX}{{c1}}" ] ;
  rml:predicateObjectMap [
    rml:predicate ex:p ;
    rml:objectMap [ rml:reference "c2" ] ] .

:secondTM a rml:AssertedTriplesMap ;
  rml:logicalSource [ rml:source "{csv}" ] ;
  rml:subjectMap [ rml:quotedTriplesMap :firstTM ] ;
  rml:predicateObjectMap [
    rml:predicate ex:q ;
    rml:objectMap [ rml:reference "c3" ] ] .
"""
    rules = parse_mapping(ttl)
    quoted = [r for r in rules if r.quoted_subject is not None]
    assert len(quoted) == 1
    assert quoted[0].quoted_subject.predicate.value == EX + "p"

    out = {(r.subject, r.predicate, r.object)
           for r in materialize(spark, ttl).collect()}
    assert (f'<< <{EX}A> <{EX}p> "B" >>', f"<{EX}q>", '"1"') in out
    assert (f"<{EX}A>", f"<{EX}p>", '"B"') in out  # firstTM is asserted too
    assert len(out) == 4


def test_non_asserted_tm_not_emitted(spark, tmp_path):
    csv = _csv(tmp_path, "d.csv", "c1,c2,c3\nA,B,1\n")
    ttl = PREFIXES + f"""
:firstTM a rml:NonAssertedTriplesMap ;
  rml:logicalSource [ rml:source "{csv}" ] ;
  rml:subjectMap [ rml:template "{EX}{{c1}}" ] ;
  rml:predicateObjectMap [
    rml:predicate ex:p ;
    rml:objectMap [ rml:reference "c2" ] ] .

:secondTM a rml:AssertedTriplesMap ;
  rml:logicalSource [ rml:source "{csv}" ] ;
  rml:subjectMap [ rml:quotedTriplesMap :firstTM ] ;
  rml:predicateObjectMap [
    rml:predicate ex:q ;
    rml:objectMap [ rml:reference "c3" ] ] .
"""
    out = {(r.subject, r.predicate, r.object)
           for r in materialize(spark, ttl).collect()}
    assert out == {(f'<< <{EX}A> <{EX}p> "B" >>', f"<{EX}q>", '"1"')}


def test_quoted_object_and_nested_quoting(spark, tmp_path):
    """TC004a shape: object quoting + a TM quoting the quoting TM."""
    csv = _csv(tmp_path, "d.csv", "c1,c2,c3,c4\na,b,c,d\n")
    ttl = PREFIXES + f"""
:firstTM a rml:NonAssertedTriplesMap ;
  rml:logicalSource [ rml:source "{csv}" ] ;
  rml:subjectMap [ rml:template "{EX}{{c1}}" ] ;
  rml:predicateObjectMap [
    rml:predicate ex:p ;
    rml:objectMap [ rml:template "{EX}{{c2}}" ] ] .

:secondTM a rml:NonAssertedTriplesMap ;
  rml:logicalSource [ rml:source "{csv}" ] ;
  rml:subjectMap [ rml:template "{EX}{{c3}}" ] ;
  rml:predicateObjectMap [
    rml:predicate ex:q ;
    rml:objectMap [ rml:quotedTriplesMap :firstTM ] ] .

:thirdTM a rml:AssertedTriplesMap ;
  rml:logicalSource [ rml:source "{csv}" ] ;
  rml:subjectMap [ rml:quotedTriplesMap :secondTM ] ;
  rml:predicateObjectMap [
    rml:predicate ex:r ;
    rml:objectMap [ rml:template "{EX}{{c4}}" ] ] .
"""
    out = {(r.subject, r.predicate, r.object)
           for r in materialize(spark, ttl).collect()}
    inner = f"<< <{EX}a> <{EX}p> <{EX}b> >>"
    mid = f"<< <{EX}c> <{EX}q> {inner} >>"
    assert out == {(mid, f"<{EX}r>", f"<{EX}d>")}


def test_quoted_object_with_join_condition(spark, tmp_path):
    """TC002b shape: the quoted TM materializes over ITS OWN source,
    joined to the child on the join condition."""
    child = _csv(tmp_path, "child.csv", "k,v\n1,x\n2,y\n")
    parent = _csv(tmp_path, "parent.csv", "pk,name\n1,Ann\n3,Bob\n")
    ttl = PREFIXES + f"""
:parentTM a rml:NonAssertedTriplesMap ;
  rml:logicalSource [ rml:source "{parent}" ] ;
  rml:subjectMap [ rml:template "{EX}person/{{pk}}" ] ;
  rml:predicateObjectMap [
    rml:predicate ex:name ;
    rml:objectMap [ rml:reference "name" ] ] .

:childTM a rml:AssertedTriplesMap ;
  rml:logicalSource [ rml:source "{child}" ] ;
  rml:subjectMap [ rml:template "{EX}row/{{k}}" ] ;
  rml:predicateObjectMap [
    rml:predicate ex:says ;
    rml:objectMap [
      rml:quotedTriplesMap :parentTM ;
      rml:joinCondition [ rml:child "k" ; rml:parent "pk" ] ] ] .
"""
    rules = parse_mapping(ttl)
    (rule,) = rules
    assert rule.quoted_object is not None
    assert rule.join_conditions == (M.JoinCondition("k", "pk"),)

    out = {(r.subject, r.predicate, r.object)
           for r in materialize(spark, ttl).collect()}
    assert out == {
        (f"<{EX}row/1>", f"<{EX}says>",
         f'<< <{EX}person/1> <{EX}name> "Ann" >>'),
    }


def test_quoted_subject_with_join_condition(spark, tmp_path):
    """TC002b shape: quoted SUBJECT map with a join condition — the
    quoted rule materializes over its own source, joined on the subject
    join (reference materializer.py:929-944)."""
    child = _csv(tmp_path, "child.csv", "k,note\n1,hot\n2,cold\n3,warm\n")
    parent = _csv(tmp_path, "parent.csv", "pk,status\n1,open\n2,closed\n")
    ttl = PREFIXES + f"""
:statusTM a rml:NonAssertedTriplesMap ;
  rml:logicalSource [ rml:source "{parent}" ] ;
  rml:subjectMap [ rml:template "{EX}case/{{pk}}" ] ;
  rml:predicateObjectMap [
    rml:predicate ex:status ;
    rml:objectMap [ rml:reference "status" ] ] .

:annotTM a rml:AssertedTriplesMap ;
  rml:logicalSource [ rml:source "{child}" ] ;
  rml:subjectMap [
    rml:quotedTriplesMap :statusTM ;
    rml:joinCondition [ rml:child "k" ; rml:parent "pk" ] ] ;
  rml:predicateObjectMap [
    rml:predicate ex:note ;
    rml:objectMap [ rml:reference "note" ] ] .
"""
    rules = parse_mapping(ttl)
    (rule,) = rules
    assert rule.quoted_subject is not None
    assert rule.subject_join_conditions == (M.JoinCondition("k", "pk"),)

    out = {(r.subject, r.predicate, r.object)
           for r in materialize(spark, ttl).collect()}
    assert out == {
        (f'<< <{EX}case/1> <{EX}status> "open" >>', f"<{EX}note>", '"hot"'),
        (f'<< <{EX}case/2> <{EX}status> "closed" >>', f"<{EX}note>", '"cold"'),
    }  # k=3 has no parent row → inner-join drop


def test_cyclic_quoting_rejected(tmp_path):
    csv = _csv(tmp_path, "d.csv", "c1\nA\n")
    ttl = PREFIXES + f"""
:tm1 a rml:AssertedTriplesMap ;
  rml:logicalSource [ rml:source "{csv}" ] ;
  rml:subjectMap [ rml:template "{EX}{{c1}}" ] ;
  rml:predicateObjectMap [
    rml:predicate ex:p ;
    rml:objectMap [ rml:quotedTriplesMap :tm2 ] ] .

:tm2 a rml:AssertedTriplesMap ;
  rml:logicalSource [ rml:source "{csv}" ] ;
  rml:subjectMap [ rml:template "{EX}{{c1}}" ] ;
  rml:predicateObjectMap [
    rml:predicate ex:q ;
    rml:objectMap [ rml:quotedTriplesMap :tm1 ] ] .
"""
    with pytest.raises(ValueError, match="cyclic"):
        parse_mapping(ttl)


def test_multi_pom_quoted_tm_expands_per_rule(tmp_path):
    """A quoted TM with two POMs yields two outer rules (reference
    _expand_rml_star adds one rule per normalized quoted rule)."""
    csv = _csv(tmp_path, "d.csv", "c1,c2,c3\nA,B,C\n")
    ttl = PREFIXES + f"""
:firstTM a rml:NonAssertedTriplesMap ;
  rml:logicalSource [ rml:source "{csv}" ] ;
  rml:subjectMap [ rml:template "{EX}{{c1}}" ] ;
  rml:predicateObjectMap [
    rml:predicate ex:p ; rml:objectMap [ rml:reference "c2" ] ] ;
  rml:predicateObjectMap [
    rml:predicate ex:p2 ; rml:objectMap [ rml:reference "c3" ] ] .

:secondTM a rml:AssertedTriplesMap ;
  rml:logicalSource [ rml:source "{csv}" ] ;
  rml:subjectMap [ rml:quotedTriplesMap :firstTM ] ;
  rml:predicateObjectMap [
    rml:predicate ex:q ; rml:objectMap [ rml:reference "c3" ] ] .
"""
    rules = parse_mapping(ttl)
    assert len(rules) == 2
    preds = {r.quoted_subject.predicate.value for r in rules}
    assert preds == {EX + "p", EX + "p2"}
