"""Portable deterministic hashing shared by dedup/similarity operators.

Every hash bottoms out in MD5 so the exact same numbers are computable in
Spark SQL (``conv(substr(md5(x),1,15),16,10)``) and in the DuckDB oracle
(``CAST('0x'||substr(md5(x),1,15) AS UBIGINT)``) — the correctness gate
compares value hashes, so engine-specific hash functions (xxhash64,
duckdb hash()) are banned from result-bearing columns.

h64(s): first 15 hex digits of md5 → 60-bit non-negative bigint.
Permutation family: ``perm_i(h) = (A_i * (h % P) + B_i) % P`` with
P = 2^31 - 1 (keeps products < 2^62: no int64 overflow in either engine).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P31 = 2_147_483_647  # 2^31 - 1 (Mersenne prime)

# fixed permutation parameters (seeded, odd, < 2^31)
MINHASH_A = [1664525, 22695477, 69069, 1103515245, 134775813, 214013,
             16843009, 1000003, 48271, 65537, 16807, 2147483629,
             1299709, 104729, 7919, 15485863]
MINHASH_B = [1013904223, 1, 362437, 12345, 1, 2531011,
             826366247, 999979, 11, 101, 7, 13,
             15485867, 32452843, 49979687, 67867967]

N_PERMS = len(MINHASH_A)
LSH_BANDS = 4
LSH_ROWS = N_PERMS // LSH_BANDS


def h64(col: Column) -> Column:
    """60-bit md5-derived hash, identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h64_sql(expr: str) -> str:
    """DuckDB twin of :func:`h64`."""
    return f"CAST(CAST('0x' || substr(md5({expr}), 1, 15) AS UBIGINT) AS BIGINT)"


def h64_spark_sql(expr: str) -> str:
    """Spark SQL string form of :func:`h64` — parses to the same
    Catalyst tree, for F.expr-batched plan construction."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def perm(col: Column, i: int) -> Column:
    """i-th minhash permutation of an h64 value (column form)."""
    return (F.lit(MINHASH_A[i]) * (col % F.lit(P31)) + F.lit(MINHASH_B[i])) % F.lit(P31)


def perm_sql(expr: str, i: int) -> str:
    return f"(({MINHASH_A[i]} * (({expr}) % {P31}) + {MINHASH_B[i]}) % {P31})"
