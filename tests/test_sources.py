"""Hierarchical sources: JSON iterators + cartesian flatten, XML XPath."""

import json
import os

import pytest

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


STUDENTS_XML = """<?xml version="1.0"?>
<students>
  <student id="10">
    <name>Venus</name>
    <address zip="28001"><city>Madrid</city></address>
    <hobby>tennis</hobby><hobby>chess</hobby>
    <note lang="en">fast</note>
  </student>
  <student id="20">
    <name>Demi</name>
    <address zip="10001"><city>NYC</city></address>
    <hobby>darts</hobby>
    <note lang="nl">snel</note>
  </student>
</students>"""


def test_xml_xpath_iterator_nested_and_attrs(spark, tmp_path):
    """XPath iterator /students/student with nested-element, nested-
    attribute, and text-with-attribute references (reference
    data_file.py:188-253 semantics)."""
    p = str(tmp_path / "students.xml")
    with open(p, "w") as f:
        f.write(STUDENTS_XML)
    df = xml_source(spark, p, iterator="/students/student")
    cols = set(df.columns)
    assert {"@id", "name", "address/city", "address/@zip",
            "hobby", "note", "note/@lang"} <= cols
    rows = {(str(r["@id"]), r["name"], r["address/city"],
             str(r["address/@zip"]), r["hobby"], r["note"], r["note/@lang"])
            for r in df.collect()}
    # multi-valued hobby explodes per row (cartesian per reference)
    assert ("10", "Venus", "Madrid", "28001", "tennis", "fast", "en") in rows
    assert ("10", "Venus", "Madrid", "28001", "chess", "fast", "en") in rows
    assert ("20", "Demi", "NYC", "10001", "darts", "snel", "nl") in rows
    assert len(rows) == 3


def test_xml_xpath_rejects_unsupported_predicates():
    from morph_kgc_spark.sources.hierarchical import xpath_row_tag

    # supported predicates parse to the element name — on any step now
    assert xpath_row_tag("/students/student[1]") == "student"
    assert xpath_row_tag("/items/item[@type='book']") == "item"
    assert xpath_row_tag("/a[1]/b") == "b"
    assert xpath_row_tag("/a[@x='1']/b[2]/c") == "c"
    # functions / multi-clause predicates stay a loud rejection
    with pytest.raises(ValueError, match="predicate"):
        xpath_row_tag("/items/item[position()=1]")
    with pytest.raises(ValueError, match="predicate"):
        xpath_row_tag("/items/item[@a='1' and @b='2']")
    assert xpath_row_tag("//student") == "student"
    assert xpath_row_tag("students/student") == "student"


_ITEMS_XML = """<items>
  <item type="book"><title>Dune</title></item>
  <item type="cd"><title>Kind of Blue</title></item>
  <item type="book"><title>Emma</title></item>
</items>"""


def test_xml_xpath_attribute_predicate(spark, tmp_path):
    """item[@type='book'] filters like elementpath: attribute equality
    on the row element, absent attribute never matches."""
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "items.xml")
    with open(p, "w") as f:
        f.write(_ITEMS_XML)
    df = xml_source(spark, p, iterator="/items/item[@type='book']")
    titles = sorted(r["title"] for r in df.collect())
    assert titles == ["Dune", "Emma"]
    # no element carries @missing → zero rows, not an error
    df2 = xml_source(spark, p, iterator="/items/item[@missing='x']")
    assert df2.count() == 0


def test_xml_xpath_positional_predicate(spark, tmp_path):
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "items.xml")
    with open(p, "w") as f:
        f.write(_ITEMS_XML)
    df = xml_source(spark, p, iterator="/items/item[2]")
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["title"] == "Kind of Blue"


def test_xml_xpath_positional_is_per_parent(spark, tmp_path):
    """XPath [n] counts within the PARENT context: /shelf/book[2] is
    the 2nd book of EVERY shelf, not the 2nd book in the document."""
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "lib.xml")
    with open(p, "w") as f:
        f.write("<library>"
                "<shelf><book>A</book><book>B</book></shelf>"
                "<shelf><book>C</book><book>D</book></shelf>"
                "<shelf><book>E</book></shelf>"  # no 2nd book
                "</library>")
    df = xml_source(spark, p, iterator="/library/shelf/book[2]")
    vals = sorted(r["."] for r in df.collect())
    assert vals == ["B", "D"]


_CATALOG_XML = """<catalog>
  <section kind="fiction">
    <shelf><title>A1</title><title>A2</title></shelf>
    <shelf><title>B1</title></shelf>
  </section>
  <section kind="science">
    <shelf><title>C1</title><title>C2</title></shelf>
  </section>
  <section>
    <shelf><title>D1</title><title>D2</title></shelf>
  </section>
</catalog>"""


def test_xml_xpath_multi_step_predicates(spark, tmp_path):
    """Predicate CHAINS across steps, per-parent semantics at each one
    (reference evaluates these via elementpath, data_file.py:188-253):
    /catalog/section[@kind='fiction']/shelf[1]/title picks, within the
    fiction sections only, each one's FIRST shelf's titles (B1 lives in
    the fiction section's SECOND shelf — excluded)."""
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "catalog.xml")
    with open(p, "w") as f:
        f.write(_CATALOG_XML)
    df = xml_source(
        spark, p,
        iterator="/catalog/section[@kind='fiction']/shelf[1]/title")
    assert sorted(r["."] for r in df.collect()) == ["A1", "A2"]
    # positional then plain step: every section's first shelf's titles
    df2 = xml_source(spark, p, iterator="/catalog/section/shelf[1]/title")
    assert sorted(r["."] for r in df2.collect()) == \
        ["A1", "A2", "C1", "C2", "D1", "D2"]
    # two positional predicates chained
    df3 = xml_source(spark, p,
                     iterator="/catalog/section/shelf[1]/title[2]")
    assert sorted(r["."] for r in df3.collect()) == ["A2", "C2", "D2"]
    # attr predicate mid-chain with an absent attribute: no match
    df4 = xml_source(spark, p,
                     iterator="/catalog/section[@kind='poetry']/shelf/title")
    assert df4.count() == 0


def test_xml_xpath_parentless_positional_rejected(spark, tmp_path):
    """//book[2] has no parent step: per-parent [n] semantics cannot be
    reproduced without it — loud rejection, not a document-order guess
    (round-4 advice)."""
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "lib.xml")
    with open(p, "w") as f:
        f.write("<library><shelf><book>A</book><book>B</book></shelf>"
                "</library>")
    with pytest.raises(ValueError, match="descendant"):
        xml_source(spark, p, iterator="//book[2]")
    # a ROOT-scoped positional predicate has the document root as its
    # parent — supported via the sniffed root tag
    df = xml_source(spark, p, iterator="/library/shelf[1]/book[2]")
    assert [r["."] for r in df.collect()] == ["B"]


def test_xml_xpath_text_predicate(spark, tmp_path):
    """[text()='v'] on chain steps (round-6 directive #4; reference
    evaluates it via elementpath, data_file.py:188-253): matches the
    element whose own text equals the literal, per parent."""
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "lib.xml")
    with open(p, "w") as f:
        f.write("<library>"
                "<shelf loc=\"north\"><book>one</book><book>two</book>"
                "</shelf>"
                "<shelf loc=\"south\"><book>two</book><book>three</book>"
                "</shelf>"
                "</library>")
    # text predicate on the LAST step of a chain
    df = xml_source(spark, p, iterator="/library/shelf/book[text()='two']")
    assert sorted(r["."] for r in df.collect()) == ["two", "two"]
    # chained with an attribute predicate upstream
    df2 = xml_source(
        spark, p,
        iterator="/library/shelf[@loc='south']/book[text()='two']")
    assert [r["."] for r in df2.collect()] == ["two"]
    # no element carries that text → empty node-set, not an error
    df3 = xml_source(spark, p, iterator="/library/shelf/book[text()='zzz']")
    assert df3.count() == 0


def test_xml_xpath_text_predicate_midchain(spark, tmp_path):
    """/shelf/book[text()='x']/title shape (the verdict's example):
    text() selects among MIXED-content elements mid-chain, and the
    descent continues into their typed children."""
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "shop.xml")
    with open(p, "w") as f:
        f.write("<shop>"
                "<shelf>"
                "<book>x<title>T1</title></book>"
                "<book>y<title>T2</title></book>"
                "<book>x<title>T3</title></book>"
                "</shelf>"
                "</shop>")
    df = xml_source(spark, p,
                    iterator="/shop/shelf/book[text()='x']/title")
    assert sorted(r["."] for r in df.collect()) == ["T1", "T3"]
    # an element with children but NO text: text() is the empty
    # sequence — comparison false for every literal
    p2 = str(tmp_path / "no_text.xml")
    with open(p2, "w") as f:
        f.write("<shop><shelf><book><title>T</title></book></shelf></shop>")
    df2 = xml_source(spark, p2,
                     iterator="/shop/shelf/book[text()='x']/title")
    assert df2.count() == 0


def test_xml_xpath_contains_predicate(spark, tmp_path):
    """[contains(@attr,'v')] — substring match on an attribute, absent
    attribute never matches (elementpath semantics)."""
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "books.xml")
    with open(p, "w") as f:
        f.write("<books>"
                "<book lang=\"en-US\"><title>A</title></book>"
                "<book lang=\"en-GB\"><title>B</title></book>"
                "<book lang=\"nl\"><title>C</title></book>"
                "<book><title>D</title></book>"
                "</books>")
    df = xml_source(spark, p,
                    iterator="/books/book[contains(@lang,'en')]/title")
    assert sorted(r["."] for r in df.collect()) == ["A", "B"]
    # contains on a scan-level (first) predicated step
    df2 = xml_source(spark, p,
                     iterator="/books/book[contains(@lang,'n')]")
    assert sorted(r["title"] for r in df2.collect()) == ["A", "B", "C"]
    # absent attribute → no match, no error
    df3 = xml_source(spark, p,
                     iterator="/books/book[contains(@missing,'x')]/title")
    assert df3.count() == 0


def test_xml_xpath_other_functions_still_rejected():
    """Only the documented subset parses; other functions stay loud."""
    from morph_kgc_spark.sources.hierarchical import xpath_row_tag

    assert xpath_row_tag("/a/b[text()='v']/c") == "c"
    assert xpath_row_tag("/a/b[contains(@x,'v')]") == "b"
    with pytest.raises(ValueError, match="predicate"):
        xpath_row_tag("/a/b[starts-with(@x,'v')]")
    with pytest.raises(ValueError, match="predicate"):
        xpath_row_tag("/a/b[contains(text(),'v')]")
    with pytest.raises(ValueError, match="predicate"):
        xpath_row_tag("/a/b[not(@x='v')]")


def test_xml_xpath_missing_child_yields_empty_nodeset(spark, tmp_path):
    """A chain step matching nothing → ZERO rows with a usable schema
    (elementpath's empty sequence), not a zero-column analysis crash
    (round-4 advice)."""
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "lib.xml")
    with open(p, "w") as f:
        f.write("<library><shelf><book>A</book></shelf></library>")
    df = xml_source(spark, p, iterator="/library/shelf[1]/magazine")
    assert df.count() == 0 and df.columns  # non-empty schema
    df2 = xml_source(spark, p, iterator="/library/shelf[2]/book")
    assert df2.count() == 0


def test_materialize_from_xml_mapping_with_iterator(spark, tmp_path):
    """Full path: Turtle mapping with ql:XPath iterator over XML."""
    p = str(tmp_path / "students.xml")
    with open(p, "w") as f:
        f.write(STUDENTS_XML)
    ttl = f"""
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix ex: <http://example.com/> .
<#TM> rml:logicalSource [
    rml:source "{p}" ;
    rml:referenceFormulation ql:XPath ;
    rml:iterator "/students/student" ] ;
  rr:subjectMap [ rr:template "http://example.com/student/{{@id}}" ] ;
  rr:predicateObjectMap [
    rr:predicate ex:city ;
    rr:objectMap [ rml:reference "address/city" ] ] ;
  rr:predicateObjectMap [
    rr:predicate ex:hobby ;
    rr:objectMap [ rml:reference "hobby" ] ] .
"""
    out = {(r.subject, r.predicate, r.object)
           for r in materialize(spark, ttl).collect()}
    ex = "http://example.com/"
    assert (f"<{ex}student/10>", f"<{ex}city>", '"Madrid"') in out
    assert (f"<{ex}student/10>", f"<{ex}hobby>", '"tennis"') in out
    assert (f"<{ex}student/10>", f"<{ex}hobby>", '"chess"') in out
    assert (f"<{ex}student/20>", f"<{ex}hobby>", '"darts"') in out
    assert len(out) == 5  # 2 city + 3 hobby


def test_xml_xpath_root_positional_absolute_semantics(spark, tmp_path):
    """Round-5 self-review: /name[n] at the top of an ABSOLUTE path
    addresses the root element itself — it matches only when the root
    carries that name and only at position 1 (elementpath semantics)."""
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "book.xml")
    with open(p, "w") as f:
        f.write("<book><title>T</title></book>")
    df = xml_source(spark, p, iterator="/book[1]/title")
    assert [r["."] for r in df.collect()] == ["T"]
    # /book[2]: only one root → empty, not an error
    assert xml_source(spark, p, iterator="/book[2]").count() == 0
    # absolute /b[1] with a root named 'book' → empty node-set
    assert xml_source(spark, p, iterator="/b[1]").count() == 0
    # RELATIVE b[1] evaluates against the root's children
    p2 = str(tmp_path / "a.xml")
    with open(p2, "w") as f:
        f.write("<a><b>one</b><b>two</b></a>")
    df2 = xml_source(spark, p2, iterator="b[2]")
    assert [r["."] for r in df2.collect()] == ["two"]


def test_xml_xpath_wildcard_parent_of_positional(spark, tmp_path):
    """A wildcard parent of a positional step expands schema-side into
    its concrete tags (round-6; previously a loud rejection)."""
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "w.xml")
    with open(p, "w") as f:
        f.write("<a><x><b><c>1</c></b></x><y><b><c>2</c><c>3</c></b>"
                "</y></a>")
    df = xml_source(spark, p, iterator="/a/*/b[1]/c")
    assert sorted(r["."] for r in df.collect()) == ["1", "2", "3"]


def test_xml_xpath_wildcard_steps(spark, tmp_path):
    """Wildcard steps anywhere in the chain, including the tail."""
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "wild.xml")
    with open(p, "w") as f:
        f.write("<cat><fiction><b><t>Dune</t></b></fiction>"
                "<science><b><t>Cosmos</t></b></science></cat>")
    # wildcard mid-chain: /cat/*/b ≡ both genres' books
    df = xml_source(spark, p, iterator="/cat/*/b")
    assert sorted(r["t"] for r in df.collect()) == ["Cosmos", "Dune"]
    # wildcard TAIL: /cat/fiction/* ≡ fiction's children
    df2 = xml_source(spark, p, iterator="/cat/fiction/*")
    assert [r["t"] for r in df2.collect()] == ["Dune"]
    # value predicate through a wildcard
    df3 = xml_source(spark, p, iterator="/cat/*/b[text()='x']/t")
    assert df3.count() == 0


def test_xml_xpath_descendant_mid_chain(spark, tmp_path):
    """Mid-chain // expands to every schema path reaching the name —
    including a per-parent positional on the terminal step."""
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "deep.xml")
    with open(p, "w") as f:
        f.write("<lib><shelf><book>A</book><book>B</book>"
                "<box><book>C</book></box></shelf></lib>")
    df = xml_source(spark, p, iterator="/lib//book")
    assert sorted(r["."] for r in df.collect()) == ["A", "B", "C"]
    # //book[2]: 2nd book of EACH parent (shelf has one, box has none)
    df2 = xml_source(spark, p, iterator="/lib//book[2]")
    assert [r["."] for r in df2.collect()] == ["B"]
    # named anchor then descendant: shelf//book
    df3 = xml_source(spark, p, iterator="/lib/shelf//book[1]")
    assert sorted(r["."] for r in df3.collect()) == ["A", "C"]


def test_xml_xpath_descendant_respects_prefix(spark, tmp_path):
    """A pred-free mid-chain '//' must select from the SAME node-set as
    its predicated twin — the any-depth rowTag shortcut is only valid
    for plain named chains (round-6 review finding: '/lib/shelf//book'
    previously scanned rowTag 'book' anywhere, returning nodes outside
    /lib/shelf that '/lib/shelf//book[1]' correctly excluded)."""
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "pfx.xml")
    with open(p, "w") as f:
        f.write("<lib><shelf><book>A</book></shelf>"
                "<archive><box><book>B</book></box></archive></lib>")
    df = xml_source(spark, p, iterator="/lib/shelf//book")
    assert sorted(r["."] for r in df.collect()) == ["A"]
    # relative spelling with a mid-chain descendant: same exact node-set
    df2 = xml_source(spark, p, iterator="shelf//book")
    assert sorted(r["."] for r in df2.collect()) == ["A"]
    # wildcard before the deepest named step is exact too
    df3 = xml_source(spark, p, iterator="/lib/*/book")
    assert sorted(r["."] for r in df3.collect()) == ["A"]


def test_xml_xpath_branch_type_conflict_is_loud(spark, tmp_path):
    """Branch expansion reaching same-named columns of incompatible
    types (string text vs attribute struct) raises the module's loud
    ValueError, not Spark's union analysis error (round-6 review)."""
    from morph_kgc_spark.sources.hierarchical import xml_source

    p = str(tmp_path / "conflict.xml")
    with open(p, "w") as f:
        f.write('<root><a><item><d>x</d></item></a>'
                '<b><item><d k="1">y</d></item></b></root>')
    with pytest.raises(ValueError, match="incompatible types"):
        xml_source(spark, p, iterator="/root/*/item").collect()


def test_parquet_schema_cache_key_normalization(spark):
    """Equivalent path spellings (trailing slash, file:// prefix) hit —
    and invalidate — one cache entry (round-6 review: raw-string keys
    made invalidate('/p/') silently miss the entry for '/p')."""
    from morph_kgc_spark.sources import registry as R

    path = "/root/testdata/sf0.001/customer.parquet"
    R.invalidate_parquet_schema_cache()
    R.read_parquet_cached_schema(spark, path)
    key = R._schema_cache_key(path)
    assert key in R._PARQUET_SCHEMAS
    assert R._schema_cache_key(path + "/") == key
    assert R._schema_cache_key("file://" + path) == key
    R.invalidate_parquet_schema_cache(path + "/")  # variant spelling
    assert key not in R._PARQUET_SCHEMAS
    # authority form 'file://host/x' keeps the host verbatim (round-7
    # ADVICE fix, registry.py:223): it must NOT be realpath'd as the
    # local path '//host/x', and its spellings normalize to one key
    assert R._schema_cache_key("file://nas01/data/t") == "//nas01/data/t"
    assert R._schema_cache_key("file://nas01/data/t/") == "//nas01/data/t"
