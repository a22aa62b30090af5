"""FNML/FnO built-in function registry (the GREL surface).

Spark re-expression of the reference's ``bif_dict``
(src/morph_kgc/fnml/built_in_functions.py:9-27 registry; function bodies
at :35-255). The reference executes functions in a per-row Python loop
(src/morph_kgc/fnml/fnml_executer.py:105-112); here every function is a
native Column expression where Spark has one, and an Arrow-batched pandas
UDF otherwise — no per-row Python in either case.

Each builder takes keyword Column/str args (constants arrive as python
strings, references as Columns) and returns a Column. Functions that
return a *list* set ``.explodes = True`` — the compiler wraps them in
``explode`` (reference: fnml_executer.py:120).

A ``@udf``-style plug-in protocol mirrors the reference's user-defined
function loading (fnml_executer.py:14-41): users register additional
builders under their own IRIs.
"""

from __future__ import annotations

import html as _html
from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType, StringType

GREL = "http://users.ugent.be/~bjdmeest/function/grel.ttl#"
IDLAB = "https://w3id.org/imec/idlab/function#"

bif_dict: dict[str, Callable[..., Column]] = {}


def bif(fun_id: str, explodes: bool = False):
    """Register a built-in function builder (mirror of the reference's
    @bif decorator protocol)."""

    def deco(fn):
        fn.explodes = explodes
        bif_dict[fun_id] = fn
        return fn

    return deco


# alias for user plug-ins (reference: fnml_executer.py @udf protocol)
udf = bif


def _as_col(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


@bif(GREL + "toUpperCase")
def to_upper(string) -> Column:
    return F.upper(_as_col(string))


@bif(GREL + "toLowerCase")
def to_lower(string) -> Column:
    return F.lower(_as_col(string))


@bif(GREL + "string_toTitlecase")
def to_titlecase(string) -> Column:
    return F.initcap(_as_col(string))


@bif(GREL + "string_trim")
def string_trim(string) -> Column:
    return F.trim(_as_col(string))


@bif(GREL + "string_reverse")
def string_reverse(string) -> Column:
    return F.reverse(_as_col(string))


@bif(GREL + "string_toString")
def string_to_string(string) -> Column:
    return _as_col(string).cast("string")


@bif(GREL + "string_length")
def string_length(string) -> Column:
    return F.length(_as_col(string)).cast("string")


@bif(GREL + "string_replace")
def string_replace(string, old, new) -> Column:
    return F.replace(_as_col(string), _as_col(old), _as_col(new))


@bif(GREL + "string_split")
def string_split(string, separator) -> Column:
    """Returns the *stringified* python list — quirk-compatible with the
    reference (built_in_functions.py string_split returns str(list))."""

    @pandas_udf(StringType())
    def _split_str(s: pd.Series, sep: pd.Series) -> pd.Series:
        return pd.Series(
            [str(v.split(p)) if v is not None else None
             for v, p in zip(s, sep)], index=s.index)

    return _split_str(_as_col(string), _as_col(separator))


@bif(GREL + "string_split_explode", explodes=True)
def string_split_explode(string, separator) -> Column:
    return F.split(_as_col(string), _as_col(separator))


@bif(GREL + "array_join")
def array_join(*parts, separator="") -> Column:
    sep = separator if isinstance(separator, str) else ""
    return F.concat_ws(sep, *[_as_col(p) for p in parts])


_EVAL_LOCALS = {
    # boolean lexical forms resolve as names inside the evaluated
    # expression, so plain XSD-boolean cells work alongside comparisons
    "true": True, "false": False, "True": True, "False": False,
    "yes": True, "no": False, "on": True, "off": False,
}


@pandas_udf(BooleanType())
def _eval_bool_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched python-expression evaluation of condition cells
    (reference controls_if evals the cell, built_in_functions.py:159-168).
    Builtins are stripped; evaluation errors → null (false branch),
    where the reference would raise."""
    def one(v):
        if v is None:
            return None
        try:
            return bool(eval(v, {"__builtins__": {}}, dict(_EVAL_LOCALS)))
        except Exception:
            return None
    return s.map(one)


@bif(GREL + "controls_if")
def controls_if(bool_expression, value_true, value_false=None) -> Column:
    """The reference *evaluates* the condition cell as a python
    expression (built_in_functions.py:159-168): ``"1 > 2"`` → False,
    ``"True"`` → True. Simple boolean/numeric lexicals stay JVM-side;
    anything else goes through the Arrow eval UDF."""
    cond = _as_col(bool_expression)
    truthy_lex = F.lower(cond).isin("true", "yes", "on")
    falsy_lex = F.lower(cond).isin("false", "no", "off", "") | cond.isNull()
    numeric = cond.rlike(r"^[+-]?\d+(\.\d+)?$")
    verdict = (
        F.when(truthy_lex, F.lit(True))
        .when(falsy_lex, F.lit(False))
        .when(numeric, cond.cast("double") != 0)
        .otherwise(_eval_bool_udf(cond))
    )
    return F.when(verdict, _as_col(value_true)).otherwise(
        _as_col(value_false) if value_false is not None else F.lit(None))


@bif(GREL + "math_round")
def math_round(number) -> Column:
    # reference handles ','-decimal inputs (built_in_functions.py:171-180)
    n = F.replace(_as_col(number), F.lit(","), F.lit("."))
    return F.round(n.cast("double")).cast("long").cast("string")


@bif(GREL + "date_toDate")
def date_to_date(string, format_code) -> Column:
    """strptime-format → ISO date. Format arrives as a python strptime
    pattern; translate the common directives to Spark's."""
    fmt = format_code if isinstance(format_code, str) else None
    if fmt is None:
        raise ValueError("date_toDate needs a constant format pattern")
    spark_fmt = (fmt.replace("%Y", "yyyy").replace("%y", "yy")
                 .replace("%m", "MM").replace("%d", "dd")
                 .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss"))
    return F.date_format(F.to_date(_as_col(string), spark_fmt), "yyyy-MM-dd")


@bif(GREL + "string_sha256")
def string_sha256(string) -> Column:
    return F.sha2(_as_col(string), 256)


@bif(GREL + "escape")
def string_escape(string, mode="html") -> Column:
    @pandas_udf(StringType())
    def _esc(s: pd.Series) -> pd.Series:
        return s.map(lambda v: _html.escape(v) if v is not None else None)

    if (mode if isinstance(mode, str) else "html") != "html":
        raise ValueError(f"unsupported escape mode: {mode!r}")
    return _esc(_as_col(string))


@bif(GREL + "array_get")
def array_get(array_str, from_index, to_index=None) -> Column:
    """Index/slice into the stringified-list output of string_split
    (quirk-compatible with built_in_functions.py:73-112)."""

    @pandas_udf(StringType())
    def _get(a: pd.Series, i: pd.Series) -> pd.Series:
        import ast

        def one(v, idx):
            if v is None:
                return None
            lst = ast.literal_eval(v)
            return str(lst[int(idx)])

        return pd.Series([one(v, idx) for v, idx in zip(a, i)], index=a.index)

    if to_index is None:
        return _get(_as_col(array_str), _as_col(from_index))

    @pandas_udf(StringType())
    def _slice(a: pd.Series, i: pd.Series, j: pd.Series) -> pd.Series:
        import ast

        return pd.Series(
            [str(ast.literal_eval(v)[int(x):int(y)]) if v is not None else None
             for v, x, y in zip(a, i, j)], index=a.index)

    return _slice(_as_col(array_str), _as_col(from_index), _as_col(to_index))


@bif(IDLAB + "hash")
def idlab_hash(string) -> Column:
    return F.sha2(_as_col(string), 256)


@bif(IDLAB + "hash_iri")
def idlab_hash_iri(string) -> Column:
    """sha256 wrapped into an IRI-shaped value (reference:
    built_in_functions.py hash_iri)."""
    return F.concat(F.lit("http://example.com/ns#"), F.sha2(_as_col(string), 256))


@bif(GREL + "controls_if_cast")
def controls_if_cast(bool_expression, value_true, value_false=None) -> Column:
    """Falsy lexical forms: '', 'false', 'no', 'off', '0' (reference:
    built_in_functions.py:188-198)."""
    cond = _as_col(bool_expression)
    falsy = F.lower(cond).isin("", "false", "no", "off", "0") | cond.isNull()
    return F.when(~falsy, _as_col(value_true)).otherwise(
        _as_col(value_false) if value_false is not None else F.lit(None))


@bif(GREL + "uuid")
def grel_uuid() -> Column:
    """Non-deterministic (flagged: reruns/retries produce new values —
    same caveat as the reference, built_in_functions.py:201-206)."""
    return F.expr("uuid()")


@bif(IDLAB + "toUpperCaseURL")
def to_upper_case_url(url) -> Column:
    from morph_kgc_spark.functions.encoding import percent_encode_col

    return percent_encode_col(F.upper(_as_col(url)))


@bif(IDLAB + "concat")
def idlab_concat(str1, str2, delimiter="") -> Column:
    sep = delimiter if isinstance(delimiter, str) else ""
    return F.concat_ws(sep, _as_col(str1), _as_col(str2))


def apply_function(fun_id: str, **kwargs) -> tuple[Column, bool]:
    """Resolve + apply a built-in: returns (column, explodes)."""
    if fun_id not in bif_dict:
        raise ValueError(f"unknown FNML function {fun_id!r}; "
                         f"register it with @udf/@bif")
    fn = bif_dict[fun_id]
    return fn(**kwargs), getattr(fn, "explodes", False)


def load_udfs(path: str) -> None:
    """Load a user plug-in file that uses the @udf decorator (mirror of
    fnml_executer.py:14-41's exec-based loading)."""
    scope = {"udf": udf, "bif": bif, "F": F}
    with open(path, encoding="utf-8") as f:
        exec(compile(f.read(), path, "exec"), scope)  # noqa: S102
