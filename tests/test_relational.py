"""RDB SQL generation + datatype inference (no live DB needed).

Mirrors reference relational_db.py:18-186 and mapping_parser.py:682-721.
"""

from morph_kgc_spark import model as M
from morph_kgc_spark.sources.relational import (
    build_select,
    dialect_quote,
    infer_sql_datatypes,
    infer_xsd_datatype,
    jdbc_read_options,
    rule_select,
)


def test_build_select_projects_and_not_nulls():
    sql = build_select("student", ["ID", "Name"])
    assert sql == ('SELECT `ID`, `Name` FROM `student` '
                   'WHERE `ID` IS NOT NULL AND `Name` IS NOT NULL')


def test_build_select_schema_qualified():
    sql = build_select("public.student", ["s.ID"])
    assert sql == ('SELECT `s`.`ID` FROM `public`.`student` '
                   'WHERE `s`.`ID` IS NOT NULL')


def test_build_select_all_constant_rule_is_none():
    assert build_select("t", []) is None


def test_dialect_quoting():
    sql = build_select("student", ["ID"])
    assert dialect_quote(sql, "mysql") == sql  # backticks native
    assert dialect_quote(sql, "postgresql") == \
        'SELECT "ID" FROM "student" WHERE "ID" IS NOT NULL'
    assert dialect_quote(sql, "mssql") == \
        'SELECT [ID] FROM [student] WHERE [ID] IS NOT NULL'
    assert dialect_quote(sql, "databricks") == \
        'SELECT ID FROM student WHERE ID IS NOT NULL'


def test_rule_select_for_table_rule():
    rule = M.Rule(
        source=M.Source("table", "student"),
        subject=M.TermMap(M.TEMPLATE, "http://ex/{ID}", M.IRI),
        predicate=M.TermMap(M.CONSTANT, "http://ex/name", M.IRI),
        object=M.TermMap(M.REFERENCE, "Name", M.LITERAL),
    )
    assert rule_select(rule, "oracle") == \
        'SELECT "ID", "Name" FROM "student" WHERE "ID" IS NOT NULL AND "Name" IS NOT NULL'
    # rml:query rules pass their SQL through untouched
    q = rule.but(source=M.Source("sql", "SELECT 1 AS x"))
    assert rule_select(q) == "SELECT 1 AS x"


def test_infer_xsd_datatype_substring_match():
    assert infer_xsd_datatype("BIGINT") == M.XSD_INTEGER
    assert infer_xsd_datatype("DOUBLE PRECISION") == M.XSD_DOUBLE
    assert infer_xsd_datatype("NUMERIC(10,2)") == M.XSD_DECIMAL
    assert infer_xsd_datatype("UUID") is None
    # first-substring-in-dict-order semantics, byte-compatible with the
    # reference (relational_db.py:118-121) including its quirks:
    # TIMESTAMP hits the earlier TIME entry, DATETIME hits DATE,
    # TINYINT hits INT
    assert infer_xsd_datatype("timestamp") == M.XSD_TIME
    assert infer_xsd_datatype("datetime") == M.XSD_DATE
    assert infer_xsd_datatype("tinyint") == M.XSD_INTEGER


def test_infer_sql_datatypes_rule_conditions():
    types = {("student", "age"): "INTEGER", ("student", "name"): "VARCHAR"}
    lookup = lambda t, c: types.get((t, c))  # noqa: E731
    mk = lambda **kw: M.Rule(  # noqa: E731
        source=M.Source("jdbc", "student"),
        subject=M.TermMap(M.TEMPLATE, "http://ex/{id}", M.IRI),
        predicate=M.TermMap(M.CONSTANT, "http://ex/p", M.IRI),
        **kw)
    rules = [
        mk(object=M.TermMap(M.REFERENCE, "age", M.LITERAL)),     # inferred
        mk(object=M.TermMap(M.REFERENCE, "name", M.LITERAL)),    # VARCHAR → none
        mk(object=M.TermMap(M.REFERENCE, "age", M.LITERAL),      # explicit wins
           datatype=M.TermMap(M.CONSTANT, M.XSD_STRING, M.IRI)),
        mk(object=M.TermMap(M.REFERENCE, "age", M.LITERAL),      # language wins
           language=M.TermMap(M.CONSTANT, "en", M.LITERAL)),
        mk(object=M.TermMap(M.TEMPLATE, "x{age}", M.LITERAL)),   # template: no
    ]
    out = infer_sql_datatypes(rules, lookup)
    assert out[0].datatype is not None and out[0].datatype.value == M.XSD_INTEGER
    assert out[1].datatype is None
    assert out[2].datatype.value == M.XSD_STRING
    assert out[3].datatype is None and out[3].language is not None
    assert out[4].datatype is None
    # non-RDB sources never infer
    pq = [rules[0].but(source=M.Source("parquet", "/x.parquet"))]
    assert infer_sql_datatypes(pq, lambda t, c: "INTEGER")[0].datatype is None


def test_jdbc_read_options_builds_dbtable_subquery():
    opts = jdbc_read_options(
        {"url": "jdbc:postgresql://h/db", "table": "student"},
        references=["ID", "Name"])
    assert opts["dbtable"] == ('(SELECT "ID", "Name" FROM "student" WHERE '
                               '"ID" IS NOT NULL AND "Name" IS NOT NULL) spark_gen')
    assert "table" not in opts
    # mysql url → backticks kept
    opts = jdbc_read_options(
        {"url": "jdbc:mysql://h/db", "table": "t"}, references=["a"])
    assert opts["dbtable"].startswith("(SELECT `a` FROM `t`")
    # no references → plain table passthrough
    opts = jdbc_read_options({"url": "jdbc:mysql://h/db", "table": "t"})
    assert opts["dbtable"] == "t"
