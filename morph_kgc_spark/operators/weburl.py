"""URL canonicalization, URL-level dedup, and domain statistics.

The FIRST stage of a Common-Crawl-style curation pipeline is URL
normalization and URL-level dedup — the same page is recrawled under
scheme/case/port/tracking-parameter variants long before its text is
compared (the reference pipeline's normalization rules are the KG
analogue: morph-kgc normalizes IRIs before set-semantics dedup,
src/morph_kgc/utils.py). Everything here is a pure Column expression
(whole-stage codegen, zero Python), written once as a dual-dialect SQL
template so the DuckDB correctness oracle replays the EXACT same
transformation (``morph_kgc_spark.oracles`` renders the other dialect).

Canonicalization semantics (bounded, deterministic, replayable):

- scheme and host lowercased; ``www.`` prefix dropped
- default ports stripped (``:80`` for http, ``:443`` for https)
- fragment dropped
- path: duplicate slashes collapsed, ``/./`` segments removed and
  single-level ``/seg/../`` resolved (two fixed regexp passes each —
  bounded normalization, documented: pathological nestings deeper than
  two levels are left as-is on BOTH engines), trailing slash dropped
  (except root), empty path → ``/``
- query: tracking parameters removed (``utm_*``, ``fbclid``,
  ``gclid``), remaining params sorted bytewise, empty query dropped

100-TB design: canonicalize is a narrow zero-shuffle projection;
``url_dedup`` is ONE hash-aggregate on the canonical URL (map-side
partials — the classic first-shuffle of a crawl pipeline);
``domain_stats`` likewise groups on the registered domain. Nothing is
collected driver-side and no UDF leaves the JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from morph_kgc_spark.operators.text import _parallelize_narrow

# prime-ish page-key modulus: distinct ids collide onto ~PAGE_MOD
# canonical pages, so URL dedup over the synthetic corpus is non-trivial
PAGE_MOD = 211

_TRACKING_PREFIXES = ("utm_",)
_TRACKING_PARAMS = ("fbclid", "gclid")


def _fns(dialect: str) -> dict:
    """Per-dialect spellings of the few functions whose names/arity
    differ. Patterns avoid single quotes so template quoting stays
    trivial; Spark and DuckDB (RE2 vs Java regex) agree on every
    construct used here (no lookaround, no backrefs)."""
    if dialect == "spark":
        # Spark SQL string literals PROCESS backslash escapes ('\.' in
        # the SQL text reaches the regex engine as '.'), DuckDB's do
        # not — so the Spark renderer doubles backslashes in regex
        # patterns or the two engines silently run DIFFERENT regexes
        # ('.'-as-any corrupted multi-segment paths before this fix)
        esc = lambda p: p.replace("\\", "\\\\")  # noqa: E731
        return {
            "re": lambda s, p, r: f"regexp_replace({s}, '{esc(p)}', '{r}')",
            "split": lambda s, sep: f"split({s}, '{sep}')",
            "filter": lambda a, lam: f"filter({a}, {lam})",
            "sort": lambda a: f"array_sort({a})",
            "join": lambda a, sep: f"array_join({a}, '{sep}')",
            "str": lambda x: f"CAST({x} AS STRING)",
        }
    if dialect == "duckdb":
        return {
            "re": lambda s, p, r: f"regexp_replace({s}, '{p}', '{r}', 'g')",
            "split": lambda s, sep: f"string_split({s}, '{sep}')",
            "filter": lambda a, lam: f"list_filter({a}, {lam})",
            "sort": lambda a: f"list_sort({a})",
            "join": lambda a, sep: f"array_to_string({a}, '{sep}')",
            "str": lambda x: f"CAST({x} AS VARCHAR)",
        }
    raise ValueError(f"unknown dialect {dialect!r}")


def synth_url_sql(dialect: str, id_col: str) -> str:
    """Deterministic MESSY url from an integer id (dual-dialect SQL).

    Page identity k = id % PAGE_MOD decides the canonical URL; the id
    itself decides which mess variant carries it (scheme case, www
    prefix, explicit default port, duplicate/dot/parent path segments,
    trailing slash, swapped query order, tracking params, fragment) —
    so ids with equal k canonicalize to ONE url via different spellings.
    """
    f = _fns(dialect)
    S = f["str"]
    k = f"({id_col} % {PAGE_MOD})"
    scheme = f"(CASE WHEN {k} % 2 = 0 THEN 'http' ELSE 'https' END)"
    scheme_m = (f"(CASE WHEN {id_col} % 3 = 0 THEN upper({scheme}) "
                f"ELSE {scheme} END)")
    host = (f"('site' || {S(f'{k} % 23')} || '.example' || "
            f"{S(f'{k} % 7')} || '.com')")
    port = f"(CASE WHEN {k} % 2 = 0 THEN ':80' ELSE ':443' END)"
    host_m = (f"(CASE WHEN {id_col} % 4 = 0 THEN upper({host}) "
              f"WHEN {id_col} % 4 = 1 THEN 'www.' || {host} "
              f"WHEN {id_col} % 4 = 2 THEN {host} || {port} "
              f"ELSE {host} END)")
    path = f"('/cat' || {S(f'{k} % 5')} || '/item' || {S(k)})"
    path_m = (f"(CASE WHEN {id_col} % 5 = 0 THEN {path} || '/' "
              f"WHEN {id_col} % 5 = 1 THEN '/.' || {path} "
              f"WHEN {id_col} % 5 = 2 THEN '/' || {path} "
              f"WHEN {id_col} % 5 = 3 THEN '/tmp/..' || {path} "
              f"ELSE {path} END)")
    a = f"('a=' || {S(f'{k} % 4')})"
    b = f"('b=' || {S(f'{k} % 3')})"
    query_m = (f"(CASE WHEN {id_col} % 3 = 0 "
               f"THEN {b} || '&' || {a} "
               f"WHEN {id_col} % 3 = 1 "
               f"THEN {a} || '&' || {b} || '&utm_source=feed' || "
               f"{S(f'{id_col} % 9')} "
               f"ELSE 'fbclid=x' || {S(id_col)} || '&' || {a} || '&' || {b} "
               f"END)")
    frag = (f"(CASE WHEN {id_col} % 6 = 0 THEN '#sec' || "
            f"{S(f'{id_col} % 4')} ELSE '' END)")
    return (f"({scheme_m} || '://' || {host_m} || {path_m} || '?' || "
            f"{query_m} || {frag})")


def canonical_url_sql(dialect: str, url: str) -> str:
    """Canonicalize a url expression (dual-dialect SQL; see module doc)."""
    f = _fns(dialect)
    RE = f["re"]
    u = RE(f"({url})", "#.*$", "")  # fragment off first
    scheme = f"lower(coalesce(regexp_extract({u}, '^([A-Za-z]+)://', 1), ''))"
    hostport = (f"lower(coalesce(regexp_extract({u}, "
                f"'^[A-Za-z]+://([^/?#]*)', 1), ''))")
    hostport = RE(hostport, "^www\\.", "")
    host = (f"(CASE WHEN {scheme} = 'http' THEN {RE(hostport, ':80$', '')} "
            f"WHEN {scheme} = 'https' THEN {RE(hostport, ':443$', '')} "
            f"ELSE {hostport} END)")
    rest = RE(u, "^[A-Za-z]+://[^/?#]*", "")
    path = f"coalesce(regexp_extract({rest}, '^([^?]*)', 1), '')"
    path = RE(path, "/{2,}", "/")
    path = RE(RE(path, "/\\./", "/"), "/\\./", "/")  # 2 bounded passes
    path = RE(RE(path, "/[^/.][^/]*/\\.\\./", "/"),
              "/[^/.][^/]*/\\.\\./", "/")
    path = (f"(CASE WHEN {path} = '' THEN '/' "
            f"WHEN {path} <> '/' AND substring({path}, length({path}), 1) "
            f"= '/' THEN substring({path}, 1, length({path}) - 1) "
            f"ELSE {path} END)")
    # query comes from the FRAGMENT-STRIPPED u, not the original url —
    # an SPA-style '#/route?tab=1' fragment must not invent a query
    # (round-6 review finding, verified by execution)
    query = f"coalesce(regexp_extract({u}, '[?](.*)', 1), '')"
    keep = (f"x -> NOT (x = '' OR "
            + " OR ".join(
                [f"substring(x, 1, {len(p)}) = '{p}'"
                 for p in _TRACKING_PREFIXES]
                + [f"substring(x, 1, {len(p) + 1}) = '{p}='"
                   for p in _TRACKING_PARAMS])
            + ")")
    params = f["sort"](f["filter"](f["split"](query, "&"), keep))
    # DuckDB's array_to_string([], '&') is NULL where Spark's
    # array_join returns '' — coalesce or the whole canonical URL goes
    # NULL for any query-less input (round-6 review finding)
    qjoin = f"coalesce({f['join'](params, '&')}, '')"
    qfinal = f"(CASE WHEN {qjoin} = '' THEN '' ELSE '?' || {qjoin} END)"
    return f"({scheme} || '://' || {host} || {path} || {qfinal})"


def domain_sql(dialect: str, canonical: str) -> str:
    """Registered domain (heuristic: last two host labels) from a
    canonical url expression."""
    return (f"coalesce(regexp_extract(({canonical}), "
            f"'^[a-z]+://(?:[^/?#]*[.])?([^/?#.]+[.][^/?#.:]+)', 1), '')")


def synth_urls(df: DataFrame, id_col: str) -> DataFrame:
    """(id, url): deterministic messy URLs from an integer id column.
    Narrow projection (the synthetic stand-in for a crawl-log scan)."""
    out = df.select(F.col(id_col),
                    F.expr(synth_url_sql("spark", id_col)).alias("url"))
    return _parallelize_narrow(out)


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str = "canonical_url") -> DataFrame:
    """Append the canonical form of ``url_col`` — zero-shuffle.

    Round 7: STAGED through intermediate projections instead of one
    monolithic expression. ``canonical_url_sql`` textually nests the
    fragment-stripped url ~4× and the hostport ~3×, so the single-expr
    form re-ran those regexes per use (and the analyzer/codegen paid
    for the duplicated tree on every plan build). Each stage aliases a
    non-cheap expression used multiply downstream, which CollapseProject
    deliberately does NOT re-inline. Values are identical — the same
    template renders each stage, just over a materialized column — and
    the DuckDB oracle keeps replaying the original one-shot SQL.
    """
    f = _fns("spark")
    RE = f["re"]
    # stage 1: fragment-stripped url (used by scheme/hostport/rest/query)
    out = df.withColumn("__cu_u", F.expr(RE(f"({url_col})", "#.*$", "")))
    # stage 2: components off __cu_u
    scheme = ("lower(coalesce(regexp_extract(__cu_u, '^([A-Za-z]+)://', 1),"
              " ''))")
    hostport = ("lower(coalesce(regexp_extract(__cu_u, "
                "'^[A-Za-z]+://([^/?#]*)', 1), ''))")
    hostport = RE(hostport, "^www\\.", "")
    rest = RE("__cu_u", "^[A-Za-z]+://[^/?#]*", "")
    query = "coalesce(regexp_extract(__cu_u, '[?](.*)', 1), '')"
    out = out.withColumn("__cu_scheme", F.expr(scheme)) \
             .withColumn("__cu_hostport", F.expr(hostport)) \
             .withColumn("__cu_rest", F.expr(rest)) \
             .withColumn("__cu_query", F.expr(query))
    # stage 3: host (scheme-dependent default-port strip), path passes
    host = ("(CASE WHEN __cu_scheme = 'http' THEN "
            + RE("__cu_hostport", ":80$", "")
            + " WHEN __cu_scheme = 'https' THEN "
            + RE("__cu_hostport", ":443$", "")
            + " ELSE __cu_hostport END)")
    path = "coalesce(regexp_extract(__cu_rest, '^([^?]*)', 1), '')"
    path = RE(path, "/{2,}", "/")
    path = RE(RE(path, "/\\./", "/"), "/\\./", "/")  # 2 bounded passes
    path = RE(RE(path, "/[^/.][^/]*/\\.\\./", "/"),
              "/[^/.][^/]*/\\.\\./", "/")
    out = out.withColumn("__cu_host", F.expr(host)) \
             .withColumn("__cu_path0", F.expr(path))
    path_final = ("(CASE WHEN __cu_path0 = '' THEN '/' "
                  "WHEN __cu_path0 <> '/' AND substring(__cu_path0, "
                  "length(__cu_path0), 1) = '/' THEN substring(__cu_path0, "
                  "1, length(__cu_path0) - 1) ELSE __cu_path0 END)")
    keep = ("x -> NOT (x = '' OR "
            + " OR ".join(
                [f"substring(x, 1, {len(p)}) = '{p}'"
                 for p in _TRACKING_PREFIXES]
                + [f"substring(x, 1, {len(p) + 1}) = '{p}='"
                   for p in _TRACKING_PARAMS])
            + ")")
    params = f["sort"](f["filter"](f["split"]("__cu_query", "&"), keep))
    qjoin = f"coalesce({f['join'](params, '&')}, '')"
    out = out.withColumn("__cu_qjoin", F.expr(qjoin))
    qfinal = "(CASE WHEN __cu_qjoin = '' THEN '' ELSE '?' || __cu_qjoin END)"
    return (out.withColumn(out_col, F.expr(
        f"(__cu_scheme || '://' || __cu_host || {path_final} || {qfinal})"))
        .drop("__cu_u", "__cu_scheme", "__cu_hostport", "__cu_rest",
              "__cu_query", "__cu_host", "__cu_path0", "__cu_qjoin"))


def url_dedup(df: DataFrame, id_col: str, url_col: str = "url") -> DataFrame:
    """(canonical_url, keep_id, n_dups): URL-level exact dedup.

    ONE hash-aggregate on the canonical URL with map-side partials —
    at crawl scale this is the standard first shuffle; the keeper is
    the smallest id (deterministic on any partitioning).
    """
    canon = canonicalize_urls(df, url_col)
    return (canon.groupBy("canonical_url")
            .agg(F.min(id_col).alias("keep_id"),
                 F.count(F.lit(1)).alias("n_dups")))


def domain_stats(df: DataFrame, id_col: str,
                 url_col: str = "url") -> DataFrame:
    """(domain, n_urls, n_pages): crawl-frontier accounting per
    registered domain — n_pages counts DISTINCT canonical URLs.

    One hash-aggregate on domain; the distinct count is Spark's
    two-phase partial-distinct aggregate (no extra job).
    """
    canon = canonicalize_urls(df, url_col)
    canon = canon.withColumn(
        "domain", F.expr(domain_sql("spark", "canonical_url")))
    return (canon.groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n_urls"),
                 F.countDistinct("canonical_url").alias("n_pages")))
