"""Engine ⇄ DuckDB oracle parity at sf0.001 — the same comparison the
driver's correctness gate performs (row count + columns + value hash)."""

import hashlib

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# the fast representative subset (full set checked by tools/check_correctness.py)
SUBSET = [
    "kg_customer_triples",
    "kg_typed_literals",
    "kg_join_customer_nation",
    "kg_union_distinct",
    "kg_ntriples_escaping",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "text_language_id",
    "text_fingerprint",
    "events_sessionize",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _normalize(df):
    cols = sorted(df.columns)
    df = df[cols]

    def canon(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return repr(round(v, 9))
        return str(v)

    rows = sorted(tuple(canon(v) for v in row) for row in df.itertuples(index=False))
    return len(df), cols, hashlib.md5(repr(rows).encode()).hexdigest()


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    sdf = entrymod.queries()[name](spark, SF).toPandas()
    odf = duck.sql(entrymod.oracle_sql()[name]).df()
    assert _normalize(sdf) == _normalize(odf)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["subject", "predicate", "object"]
