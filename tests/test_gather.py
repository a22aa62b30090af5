"""RML-CC gather maps: rdf:List chains + Bag/Seq/Alt containers.

Output is asserted with bnode-canonicalization (the reference suite
asserts graph isomorphism — test/rml-cc/*)."""

import re

import pandas as pd
from pyspark.sql import functions as F

from morph_kgc_spark import model as M
from morph_kgc_spark.operators.gather import (
    RDF,
    RDF_BAG,
    RDF_LIST,
    RDF_SEQ,
    gather_triples,
)

EX = "http://example.com/"


def _canon(rows):
    """Replace bnode labels with canonical ids in first-seen order."""
    mapping: dict[str, str] = {}

    def sub(term):
        if term.startswith("_:"):
            if term not in mapping:
                mapping[term] = f"_:c{len(mapping)}"
            return mapping[term]
        return term

    return sorted((sub(s), p, sub(o)) for s, p, o in
                  sorted((r.subject, r.predicate, r.object) for r in rows))


def test_named_list(spark):
    pdf = pd.DataFrame({"id": ["a", "a", "b"], "v": ["1", "2", "9"]})
    df = spark.createDataFrame(pdf)
    out = gather_triples(
        df,
        subject_col=F.concat(F.lit(f"<{EX}s/"), F.col("id"), F.lit(">")),
        predicate_iri=EX + "values",
        gather_refs=["v"],
        gather_as=RDF_LIST,
        head_col=F.concat(F.lit(f"<{EX}list/"), F.col("id"), F.lit(">")),
    )
    rows = _canon(out.collect())
    # subject a: head <list/a> → "1" → bnode → "2" → nil
    assert (f"<{EX}s/a>", f"<{EX}values>", f"<{EX}list/a>") in rows
    assert (f"<{EX}list/a>", f"<{RDF}first>", '"1"') in rows
    rest_a = [o for s, p, o in rows if s == f"<{EX}list/a>" and p == f"<{RDF}rest>"][0]
    assert rest_a.startswith("_:")
    assert (rest_a, f"<{RDF}first>", '"2"') in rows
    assert (rest_a, f"<{RDF}rest>", f"<{RDF}nil>") in rows
    # subject b: single element list ends in nil
    assert (f"<{EX}list/b>", f"<{RDF}first>", '"9"') in rows
    assert (f"<{EX}list/b>", f"<{RDF}rest>", f"<{RDF}nil>") in rows


def test_unnamed_list_fresh_bnode_head(spark):
    df = spark.createDataFrame(pd.DataFrame({"id": ["a"], "v": ["x"]}))
    out = gather_triples(
        df,
        subject_col=F.concat(F.lit(f"<{EX}s/"), F.col("id"), F.lit(">")),
        predicate_iri=EX + "values",
        gather_refs=["v"],
        gather_as=RDF_LIST,
    )
    rows = out.collect()
    head = [r.object for r in rows if r.predicate == f"<{EX}values>"][0]
    assert head.startswith("_:")
    assert {(r.predicate, r.object) for r in rows if r.subject == head} == {
        (f"<{RDF}first>", '"x"'), (f"<{RDF}rest>", f"<{RDF}nil>")}


def test_bag_container_membership(spark):
    df = spark.createDataFrame(pd.DataFrame({"id": ["a", "a"], "v": ["1", "2"]}))
    out = gather_triples(
        df,
        subject_col=F.lit(f"<{EX}s>"),
        predicate_iri=EX + "bag",
        gather_refs=["v"],
        gather_as=RDF_BAG,
        head_col=F.concat(F.lit(f"<{EX}bag/"), F.col("id"), F.lit(">")),
    )
    rows = {(r.subject, r.predicate, r.object) for r in out.collect()}
    assert (f"<{EX}bag/a>", f"<{RDF}type>", f"<{RDF}Bag>") in rows
    assert (f"<{EX}bag/a>", f"<{RDF}_1>", '"1"') in rows
    assert (f"<{EX}bag/a>", f"<{RDF}_2>", '"2"') in rows


def test_multi_reference_melt(spark):
    # two gather references melt into one value stream (dedup + sorted)
    df = spark.createDataFrame(pd.DataFrame(
        {"id": ["a"], "v1": ["beta"], "v2": ["alpha"]}))
    out = gather_triples(
        df,
        subject_col=F.lit(f"<{EX}s>"),
        predicate_iri=EX + "seq",
        gather_refs=["v1", "v2"],
        gather_as=RDF_SEQ,
        head_col=F.lit(f"<{EX}seq/a>"),
    )
    rows = {(r.predicate, r.object) for r in out.collect() if r.subject == f"<{EX}seq/a>"}
    assert (f"<{RDF}_1>", '"alpha"') in rows  # sorted: alpha before beta
    assert (f"<{RDF}_2>", '"beta"') in rows


def test_empty_list_allow_empty(spark):
    df = spark.createDataFrame([("a", None)], schema="id string, v string")
    out = gather_triples(
        df,
        subject_col=F.lit(f"<{EX}s>"),
        predicate_iri=EX + "values",
        gather_refs=["v"],
        gather_as=RDF_LIST,
        allow_empty=True,
    )
    rows = {(r.subject, r.predicate, r.object) for r in out.collect()}
    assert rows == {(f"<{EX}s>", f"<{EX}values>", f"<{RDF}nil>")}


def test_order_preserving_gather(spark):
    # explicit order column overrides value-sort (source row order)
    df = spark.createDataFrame(pd.DataFrame(
        {"id": ["a", "a"], "v": ["zz", "aa"], "pos": [0, 1]}))
    out = gather_triples(
        df,
        subject_col=F.lit(f"<{EX}s>"),
        predicate_iri=EX + "seq",
        gather_refs=["v"],
        gather_as=RDF_SEQ,
        head_col=F.lit(f"<{EX}seq/a>"),
        order_col=F.col("pos"),
    )
    rows = {(r.predicate, r.object) for r in out.collect() if r.subject == f"<{EX}seq/a>"}
    assert (f"<{RDF}_1>", '"zz"') in rows
    assert (f"<{RDF}_2>", '"aa"') in rows


def test_subject_position_gather(spark):
    from morph_kgc_spark.operators.gather import gather_triples_per_row

    df = spark.createDataFrame(pd.DataFrame(
        {"id": ["a"], "v": [["1", "2"]], "label": ["L"]}))
    out = gather_triples_per_row(
        df,
        vals_col=F.col("v"),
        gather_as=RDF_LIST,
        head_col=F.concat(F.lit(f"<{EX}list/"), F.col("id"), F.lit(">")),
        poms=((F.lit(f"<{EX}label>"),
               F.concat(F.lit('"'), F.col("label"), F.lit('"'))),),
    )
    rows = {(r.subject, r.predicate, r.object) for r in out.collect()}
    # the collection node is the subject of the POM triple
    assert (f"<{EX}list/a>", f"<{EX}label>", '"L"') in rows
    # and heads its own first/rest chain
    assert (f"<{EX}list/a>", f"<{RDF}first>", '"1"') in rows


def test_subject_gather_null_pom_value_drops_triple(spark):
    """A row whose POM reference is null contributes NO pom triple —
    never one with a NULL object (corrupt N-Triples)."""
    from morph_kgc_spark.operators.gather import gather_triples_per_row

    df = spark.createDataFrame(
        [("a", ["1"], "L"), ("b", ["2"], None)],
        "id string, v array<string>, label string")
    out = gather_triples_per_row(
        df,
        vals_col=F.col("v"),
        gather_as=RDF_SEQ,
        head_col=F.concat(F.lit(f"<{EX}e/"), F.col("id"), F.lit(">")),
        poms=((F.lit(f"<{EX}label>"),
               F.when(F.col("label").isNotNull(),
                      F.concat(F.lit('"'), F.col("label"), F.lit('"')))),),
    )
    rows = {(r.subject, r.predicate, r.object) for r in out.collect()}
    assert (f"<{EX}e/a>", f"<{EX}label>", '"L"') in rows
    assert not any(o is None for _, _, o in rows)
    assert (f"<{EX}e/b>", f"<{RDF}_1>", '"2"') in rows  # chain still emitted
