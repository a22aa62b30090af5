"""URL canonicalization / URL dedup / domain stats (operators/weburl.py).

The dual-dialect SQL template is the parity mechanism (the DuckDB
oracle renders the same template), so these tests pin the SEMANTICS on
hand-written fixtures plus the plan shape — the engine-vs-engine
equality is covered by the driver's web_url_dedup / web_domain_stats
correctness rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from morph_kgc_spark.operators import weburl as W


def _canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    return [r.canonical_url
            for r in W.canonicalize_urls(df).orderBy("url").collect()]


def test_canonicalize_fixtures(spark):
    got = _canon(spark, [
        "HTTP://WWW.Example.COM:80/a//b/./c/../d/?b=2&a=1&utm_source=x#f",
        "https://example.com:443/",
        "http://example.com",
        "http://example.com/x/?fbclid=abc&gclid=1",
        "http://example.com:8080/x",   # non-default port survives
        "https://example.com:80/x",    # :80 is NOT https' default port
    ])
    want_by_input = {
        "HTTP://WWW.Example.COM:80/a//b/./c/../d/?b=2&a=1&utm_source=x#f":
            "http://example.com/a/b/d?a=1&b=2",
        "https://example.com:443/": "https://example.com/",
        "http://example.com": "http://example.com/",
        "http://example.com/x/?fbclid=abc&gclid=1": "http://example.com/x",
        "http://example.com:8080/x": "http://example.com:8080/x",
        "https://example.com:80/x": "https://example.com:80/x",
    }
    assert got == [want_by_input[u] for u in sorted(want_by_input)]


def test_canonicalize_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) over the synthetic mess
    space — the defining property of a canonical form."""
    ids = spark.range(0, 500).selectExpr("id AS doc_id")
    c1 = W.canonicalize_urls(W.synth_urls(ids, "doc_id"))
    c2 = W.canonicalize_urls(c1.select(F.col("canonical_url").alias("url")))
    assert c2.where(F.col("canonical_url") != F.col("url")).count() == 0


def test_url_dedup_groups_all_variants(spark):
    """Every id with the same page key (id % PAGE_MOD) lands in ONE
    canonical group regardless of which mess variant it drew."""
    n = 4 * W.PAGE_MOD
    ids = spark.range(0, n).selectExpr("id AS doc_id")
    out = W.url_dedup(W.synth_urls(ids, "doc_id"), "doc_id")
    rows = out.collect()
    assert len(rows) == W.PAGE_MOD
    assert all(r.n_dups == 4 for r in rows)
    # keeper is the smallest id of the group = the page key itself
    assert sorted(r.keep_id for r in rows) == list(range(W.PAGE_MOD))


def test_domain_stats_counts(spark):
    ids = spark.range(0, W.PAGE_MOD).selectExpr("id AS doc_id")
    out = W.domain_stats(W.synth_urls(ids, "doc_id"), "doc_id")
    rows = {r.domain: (r.n_urls, r.n_pages) for r in out.collect()}
    # hosts are site{k%23}.example{k%7}.com → 7 registered domains
    assert set(rows) == {f"example{i}.com" for i in range(7)}
    assert sum(u for u, _ in rows.values()) == W.PAGE_MOD
    # one url per page key here, so n_pages == n_urls per domain
    assert all(u == p for u, p in rows.values())


def test_url_dedup_single_exchange_no_python(spark):
    """The whole operator is JVM-side (no Python workers) and the only
    exchange is the canonical-url hash-aggregate — plus at most the
    small-input parallelize guard, which at scale is a no-op."""
    ids = spark.range(0, 1000).selectExpr("id AS doc_id")
    plan = (W.url_dedup(W.synth_urls(ids, "doc_id"), "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan and "BatchEvalPython" not in plan
    # range input is already parallel → no parallelize shuffle; the
    # aggregate contributes the single exchange (partial + final)
    assert plan.count("Exchange") <= 1, plan
    assert "partial_min" in plan or "partial" in plan.lower(), plan


def test_canonicalize_spark_duckdb_parity_generated(spark):
    """The dual-dialect claim, pinned: Spark and DuckDB render of
    canonical_url_sql agree byte-for-byte over ~500 seeded messy URLs
    covering scheme case, www, default/odd ports, duplicate//dot//
    parent path segments, trailing slashes, shuffled query params,
    tracking params (incl. ONLY-tracking queries → empty canonical
    query, the DuckDB NULL-join regression), and fragments containing
    '?' (the fragment-query regression)."""
    import random

    import duckdb

    rng = random.Random(20260817)
    urls = [
        # adversarial fixtures first
        "http://example.com",
        "http://example.com/?utm_source=x",          # only-tracking query
        "http://example.com/a#/route?tab=1",          # '?' inside fragment
        "HTTPS://WWW.X.ORG:443//a/./b/../c/?b=2&a=1#f",
        "http://h.io:8080/p",                         # non-default port
    ]
    schemes = ["http", "https", "HTTP", "Https"]
    for _ in range(500):
        k = rng.randrange(40)
        host = f"s{k % 7}.ex{k % 3}.com"
        if rng.random() < 0.3:
            host = "www." + host
        if rng.random() < 0.3:
            host = host.upper()
        if rng.random() < 0.3:
            host += rng.choice([":80", ":443", ":8080"])
        path = rng.choice(
            ["", "/", f"/a{k}", f"/a{k}/", f"//a{k}", f"/./a{k}",
             f"/x/../a{k}", f"/a{k}/b/./c"])
        params = [f"a={k % 5}", f"b={k % 3}", "utm_source=t",
                  f"fbclid=z{k}", "gclid=1"]
        rng.shuffle(params)
        q = "&".join(params[:rng.randrange(len(params) + 1)])
        frag = rng.choice(["", "#f", f"#/r?x={k}"])
        urls.append(f"{rng.choice(schemes)}://{host}{path}"
                    + (f"?{q}" if q else "") + frag)

    sdf = spark.createDataFrame([(u,) for u in urls], ["url"])
    got_spark = [r.canonical_url
                 for r in W.canonicalize_urls(sdf).collect()]
    # collect() preserves input order for a narrow projection of a
    # local relation, but don't rely on it: re-key by input url
    spark_by_url = {r.url: r.canonical_url
                    for r in W.canonicalize_urls(sdf).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in urls])
    duck = con.execute(
        f"SELECT url, {W.canonical_url_sql('duckdb', 'url')} FROM u"
    ).fetchall()
    mismatches = [(u, spark_by_url[u], c)
                  for u, c in duck if spark_by_url[u] != c]
    assert not mismatches, mismatches[:5]
    # and none may be NULL/None on either engine
    assert all(c is not None for _, c in duck)
    assert all(v is not None for v in got_spark)
