"""Relational-DB source support: pushed-down SQL generation + datatype
inference.

Mirrors the reference's RDB layer (src/morph_kgc/data_source/
relational_db.py:18-186, mapping_parser.py:682-721) without requiring a
live database in this sandbox:

- :func:`build_select` generates the per-rule pushed-down query —
  ``SELECT refs FROM table WHERE ref IS NOT NULL AND …`` — with
  delimited identifiers, schema-qualified names split on ``.``
  (reference issue #89), canonical backticks;
- :func:`dialect_quote` rewrites the enclosing characters per dialect
  (MySQL/MariaDB backticks, MSSQL square brackets, Databricks bare,
  ANSI/PostgreSQL/Oracle/SQLite double quotes);
- :func:`infer_xsd_datatype` maps SQL type names to XSD datatypes per
  the R2RML natural-mapping table (relational_db.py:18-57);
- :func:`infer_sql_datatypes` applies the reference's inference rule to
  a Rule list: RDB source + literal reference object + no explicit
  language/datatype → constant datatype map. The column-type lookup is
  injected (a live JDBC catalog on a cluster; a dict in tests).

On Spark the generated SELECT is attached as the JDBC ``dbtable``
subquery, so the database — not the cluster — evaluates the projection
and NOT-NULL filters; Spark's JDBC relation additionally pushes its own
filters at runtime.
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

from morph_kgc_spark import model as M

# SQL type → XSD datatype (R2RML §10.2 natural mapping; reference
# relational_db.py:18-57, sourced from the PostgreSQL/Oracle/MySQL docs)
SQL_RDF_DATATYPE = {
    "BINARY": M.XSD_HEX_BINARY,
    "VARBINARY": M.XSD_HEX_BINARY,
    "BLOB": M.XSD_HEX_BINARY,
    "BFILE": M.XSD_HEX_BINARY,
    "RAW": M.XSD_HEX_BINARY,
    "LONG RAW": M.XSD_HEX_BINARY,
    "INTEGER": M.XSD_INTEGER,
    "INT": M.XSD_INTEGER,
    "SMALLINT": M.XSD_INTEGER,
    "INT8": M.XSD_INTEGER,
    "INT4": M.XSD_INTEGER,
    "BIGINT": M.XSD_INTEGER,
    "BIGSERIAL": M.XSD_INTEGER,
    "SMALLSERIAL": M.XSD_INTEGER,
    "INT2": M.XSD_INTEGER,
    "SERIAL2": M.XSD_INTEGER,
    "SERIAL4": M.XSD_INTEGER,
    "SERIAL8": M.XSD_INTEGER,
    "DECIMAL": M.XSD_DECIMAL,
    "NUMERIC": M.XSD_DECIMAL,
    "FLOAT": M.XSD_DOUBLE,
    "FLOAT8": M.XSD_DOUBLE,
    "REAL": M.XSD_DOUBLE,
    "DOUBLE": M.XSD_DOUBLE,
    "DOUBLE PRECISION": M.XSD_DOUBLE,
    "NUMBER": M.XSD_DOUBLE,
    "BOOL": M.XSD_BOOLEAN,
    "TINYINT": M.XSD_BOOLEAN,
    "BOOLEAN": M.XSD_BOOLEAN,
    "DATE": M.XSD_DATE,
    "TIME": M.XSD_TIME,
    "DATETIME": M.XSD_DATETIME,
    "TIMESTAMP": M.XSD_DATETIME,
}

MYSQL_LIKE = ("mysql", "mariadb")


def _bt(identifier: str) -> str:
    """Backtick-quote, splitting schema-qualified names on '.'."""
    return "`" + identifier.replace(".", "`.`") + "`"


def build_select(table: str, references: Iterable[str]) -> Optional[str]:
    """Pushed-down SELECT in canonical backtick quoting.

    Reference _build_sql_query (relational_db.py:152-171): project only
    the referenced columns and require each NOT NULL, so the database
    never ships rows the preprocessing would drop anyway. Returns None
    for all-constant rules (no references — R2RMLTC0006a shape).
    """
    refs = list(references)
    if not refs:
        return None
    cols = ", ".join(_bt(r) for r in refs)
    where = " AND ".join(f"{_bt(r)} IS NOT NULL" for r in refs)
    return f"SELECT {cols} FROM {_bt(table)} WHERE {where}"


def dialect_quote(sql: str, dialect: str) -> str:
    """Rewrite canonical backticks for the target dialect
    (reference _replace_query_enclosing_characters,
    relational_db.py:60-82)."""
    d = dialect.lower()
    if d in MYSQL_LIKE:
        return sql
    if d == "mssql":
        out, n = [], 0
        for ch in sql:
            if ch == "`":
                out.append("[" if n % 2 == 0 else "]")
                n += 1
            else:
                out.append(ch)
        return "".join(out)
    if d == "databricks":
        return sql.replace("`", "")
    return sql.replace("`", '"')  # ANSI: postgresql / oracle / sqlite / duckdb


def rule_select(rule: M.Rule, dialect: str = "postgresql") -> Optional[str]:
    """The dialect-quoted pushed-down query for a table-sourced rule."""
    if rule.source.kind == "sql":
        return rule.source.value
    sql = build_select(rule.source.value, rule.references)
    return dialect_quote(sql, dialect) if sql else None


def infer_xsd_datatype(sql_type: str) -> Optional[str]:
    """SQL type name → XSD datatype, first substring match in dict order
    — byte-compatible with the reference (relational_db.py:118-121)
    *including its dict-order quirks*: TIMESTAMP matches the earlier
    TIME entry, DATETIME matches DATE, TINYINT matches INT. Parity with
    observable reference output beats fixing the table here."""
    t = sql_type.upper()
    for k, v in SQL_RDF_DATATYPE.items():
        if k in t:
            return v
    return None


def infer_xsd_datatype_strict(sql_type: str) -> Optional[str]:
    """SQL type name → XSD datatype, LONGEST-substring match.

    The W3C-correct variant of :func:`infer_xsd_datatype`: first-match
    dict order maps TIMESTAMP→xsd:time (via the earlier TIME entry) and
    DATETIME→xsd:date; longest-match resolves to the intended
    xsd:dateTime. Used by ``strict_natural_mapping`` mode only — the
    default path stays byte-compatible with the reference.
    """
    t = sql_type.upper()
    best: Optional[str] = None
    best_len = -1
    for k, v in SQL_RDF_DATATYPE.items():
        if k in t and len(k) > best_len:
            best, best_len = v, len(k)
    return best


def _undelimit(identifier: str) -> str:
    """Strip R2RML delimited-identifier quotes: '"amount"' → 'amount'."""
    if len(identifier) >= 2 and identifier[0] == '"' and identifier[-1] == '"':
        return identifier[1:-1].replace('""', '"')
    return identifier


TypeLookup = Callable[[str, str], Optional[str]]


def infer_sql_datatypes(rules: list[M.Rule], lookup: TypeLookup,
                        source_kinds: tuple = ("jdbc", "table", "sql"),
                        to_xsd: Callable[[str], Optional[str]] = None) -> list[M.Rule]:
    """Add inferred constant datatypes to RDB-sourced literal reference
    object maps (reference _infer_datatypes, mapping_parser.py:682-721).

    ``lookup(table, column)`` returns the SQL type name or None — on a
    cluster this queries information_schema over JDBC; tests inject a
    dict. Inference only fires when the object is a plain reference
    with termtype Literal and no explicit language/datatype.
    """
    out = []
    for rule in rules:
        if (rule.source.kind in source_kinds
                and rule.object is not None
                and rule.object.kind == M.REFERENCE
                and rule.object.termtype == M.LITERAL
                and rule.datatype is None and rule.language is None):
            sql_type = lookup(rule.source.value, rule.object.value)
            conv = to_xsd if to_xsd is not None else infer_xsd_datatype
            xsd = conv(sql_type) if sql_type else None
            if xsd:
                rule = rule.but(datatype=M.TermMap(M.CONSTANT, xsd, M.IRI))
        out.append(rule)
    return out


def jdbc_read_options(options: dict, references: Iterable[str] = ()) -> dict:
    """Spark JDBC options with the pushed-down subquery as dbtable.

    ``options`` carries url/driver/credentials plus ``table`` (or a
    prebuilt ``dbtable``/``query``). The dialect is derived from the
    JDBC url scheme unless given explicitly.
    """
    opts = dict(options)
    refs = list(references)
    table = opts.pop("table", None)
    if table and refs and "query" not in opts and "dbtable" not in opts:
        dialect = opts.pop("dialect", None) or \
            opts.get("url", "jdbc:postgresql:").split(":")[1]
        opts["dbtable"] = f"({dialect_quote(build_select(table, refs), dialect)}) spark_gen"
    elif table:
        opts.setdefault("dbtable", table)
    return opts


def sqlite_path(db_url: str) -> Optional[str]:
    """sqlite:///path/to.db → filesystem path (else None)."""
    if db_url.startswith("sqlite:///"):
        return db_url[len("sqlite:///"):]
    return None


def sqlite_type_lookup(db_url: str) -> TypeLookup:
    """Column-type lookup for SQLite — byte-compatible with the
    reference (relational_db.py:102-104), which runs
    ``SELECT typeof('{column}') FROM table``: the SINGLE QUOTES make the
    column name a string literal, so typeof is always 'text' and sqlite
    inference never fires. Replicated verbatim because the expected
    outputs of the R2RML suite (R2RMLTC0016a/0018a) encode exactly this
    behavior — plain literals despite infer_sql_datatypes=yes."""
    import sqlite3

    path = sqlite_path(db_url)

    def lookup(table: str, column: str) -> Optional[str]:
        try:
            con = sqlite3.connect(path)
            cur = con.execute(
                f"SELECT typeof('{column}') FROM \"{table}\" LIMIT 1")
            row = cur.fetchone()
            con.close()
            return row[0] if row else None
        except Exception:
            return None

    return lookup


def sqlite_catalog_type_lookup(db_url: str) -> TypeLookup:
    """DECLARED column type from the SQLite catalog (pragma_table_info)
    — the lookup the reference *intended*: its
    ``SELECT typeof('{column}')`` quotes the column name as a string
    literal, so typeof is always 'text' and inference never fires
    (relational_db.py:102-104). Used by ``strict_natural_mapping``.
    """
    import sqlite3

    path = sqlite_path(db_url)

    def lookup(table: str, column: str) -> Optional[str]:
        try:
            con = sqlite3.connect(path)
            cur = con.execute(
                "SELECT type FROM pragma_table_info(?) WHERE name = ?",
                (_undelimit(table), _undelimit(column)))
            row = cur.fetchone()
            con.close()
            return row[0] if row and row[0] else None
        except Exception:
            return None

    return lookup


def canonical_double(v: float) -> str:
    """XSD canonical lexical form of xsd:double: '3.0E1', '8.025E1'.

    Shortest round-trip digits (python repr) re-expressed with a single
    nonzero leading digit and an 'E' exponent, ≥1 fractional digit —
    the form the W3C R2RML natural-mapping outputs use.
    """
    import math
    from decimal import Decimal

    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "INF" if v > 0 else "-INF"
    if v == 0:
        return "-0.0E0" if math.copysign(1.0, v) < 0 else "0.0E0"
    sign, digits, exp = Decimal(repr(float(v))).as_tuple()
    dstr = "".join(map(str, digits)).rstrip("0") or "0"
    e = len(digits) - 1 + exp  # power of ten of the leading digit
    mant = dstr[0] + "." + (dstr[1:] or "0")
    return ("-" if sign else "") + mant + "E" + str(e)


def _canonical_sql_value(v, decl_type: Optional[str]):
    """Canonical lexical form of one SQL value (strict natural mapping).

    bytes → uppercase hex (xsd:hexBinary canonical); float → canonical
    double; BOOLEAN-declared integers → true/false; everything else the
    plain string form. R2RML §10.2 'natural RDF lexical form'.
    """
    if v is None:
        return None
    if isinstance(v, bytes):
        return v.hex().upper()
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        # TINYINT maps to xsd:boolean in the inference table, so its
        # canonical lexical is true/false, same as BOOLEAN-declared
        if decl_type and ("BOOL" in decl_type or "TINYINT" in decl_type):
            return "true" if v else "false"
        return str(v)
    if isinstance(v, float):
        # DECIMAL/NUMERIC columns infer xsd:decimal, whose lexical space
        # has NO exponent notation — plain decimal form, not 3.5E0
        if decl_type and ("DECIMAL" in decl_type or "NUMERIC" in decl_type):
            from decimal import Decimal

            d = Decimal(repr(float(v))).normalize()
            return format(d, "f")
        return canonical_double(v)
    return str(v)


def load_sqlite(spark, db_url: str, table: Optional[str] = None,
                query: Optional[str] = None, lexical: str = "raw"):
    """Driver-side SQLite load. Test-scale databases only; a production
    deployment reads through JDBC with the pushed-down query from
    :func:`build_select`.

    Reads through the raw sqlite3 cursor, NOT pandas: pandas upcasts
    integer columns containing NULL to float64, turning join keys like
    100 into '100.0' and silently emptying equi-joins (R2RMLTC0009a).
    The cursor keeps python ints/floats/str/None; Spark infers the
    schema per column over all rows.
    """
    import sqlite3

    con = sqlite3.connect(sqlite_path(db_url))
    sql = query if query is not None else \
        f'SELECT * FROM "{_undelimit(table)}"'
    cur = con.execute(sql)
    columns = [d[0] for d in cur.description]
    rows = cur.fetchall()
    if lexical == "canonical":
        # strict natural mapping: every value to its canonical lexical
        # form driver-side (floats → 3.0E1, blobs → uppercase hex,
        # BOOLEAN columns → true/false), using the declared column
        # types from the catalog when the source is a table
        decls: dict[str, str] = {}
        if table is not None:
            for _, name, ctype, *_ in con.execute(
                    "SELECT * FROM pragma_table_info(?)",
                    (_undelimit(table),)):
                decls[name] = (ctype or "").upper()
        rows = [tuple(_canonical_sql_value(v, decls.get(c))
                      for v, c in zip(r, columns)) for r in rows]
    con.close()
    if not rows:
        from pyspark.sql.types import StringType, StructField, StructType

        schema = StructType([StructField(c, StringType()) for c in columns])
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(rows, columns)
