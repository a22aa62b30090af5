"""SQL-expression-string twins of the term-encoding Column builders.

Why strings: every ``F.*`` / Column-method invocation is one py4j
round-trip (~0.2 ms); a term map compiles to dozens of them, and a
flagship mapping (12 rules) paid ~1.3 s of driver time just BUILDING
Column trees (round-4 cProfile; BENCH.md fixed-cost note). Rendering
each term as ONE SQL string and parsing it with a single ``F.expr``
collapses that to one round-trip per term — the resulting Catalyst
expression tree is identical (same functions, same arguments), so plans,
codegen, and results are byte-for-byte unchanged. The Column builders in
:mod:`morph_kgc_spark.functions.encoding` remain the fallback for
non-SQL-expressible paths (pandas-UDF encoding for non-ASCII safe chars,
FNML executions); ``tests/test_sqlexpr_parity.py`` pins the string twins
against the Column builders AND the pure-Python references with
Hypothesis over adversarial strings.
"""

from __future__ import annotations

from morph_kgc_spark.functions.encoding import _NT_ESCAPES


def sql_ident(name: str) -> str:
    """Backtick-quoted identifier (XPath-ish names: ``.``, ``a/b``, ``@id``)."""
    return "`" + name.replace("`", "``") + "`"


def sql_str(value: str) -> str:
    """Spark SQL single-quoted string literal, escape-safe.

    Control characters go out as ``\\uXXXX``: Spark's unescapeSQLString
    drops the backslash of unrecognized escapes (``'\\f'`` → ``'f'``),
    so only the explicit unicode form round-trips every byte.
    """
    out = []
    for ch in value:
        o = ord(ch)
        if ch == "\\":
            out.append("\\\\")
        elif ch == "'":
            out.append("\\'")
        elif o < 0x20 or o == 0x7F:
            out.append("\\u%04X" % o)
        else:
            out.append(ch)
    return "'" + "".join(out) + "'"


def ntriples_escape_sql(expr: str) -> str:
    """String twin of ``encoding.ntriples_escape_col`` (same replace
    chain, reference materializer.py:144 order)."""
    for search, repl in _NT_ESCAPES:
        expr = f"replace({expr}, {sql_str(search)}, {sql_str(repl)})"
    return expr


def percent_encode_sql(expr: str, safe: str | None = None) -> str | None:
    """String twin of ``encoding.percent_encode_col``; ``None`` when the
    pandas-UDF fallback is required (non-ASCII safe characters)."""
    if safe and not safe.isascii():
        return None
    out = f"url_encode({expr})"
    out = f"replace({out}, '+', '%20')"
    out = f"replace({out}, '*', '%2A')"
    out = f"replace({out}, '%7E', '~')"
    for ch in dict.fromkeys(safe or ""):
        if ch in ("ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                  "abcdefghijklmnopqrstuvwxyz0123456789_.-~"):
            continue  # never encoded in the first place
        out = f"replace({out}, {sql_str('%%%02X' % ord(ch))}, {sql_str(ch)})"
    return out


def natural_mapping_sql(expr: str, datatype: str | None) -> str:
    """String twin of ``encoding.natural_mapping_col`` (R2RML §10.2)."""
    from morph_kgc_spark import model as M

    if datatype == M.XSD_BOOLEAN:
        return f"lower({expr})"
    if datatype == M.XSD_DATETIME:
        return f"replace({expr}, ' ', 'T')"
    if datatype == M.XSD_INTEGER:
        return f"CAST(CAST(CAST({expr} AS DOUBLE) AS BIGINT) AS STRING)"
    return expr
