"""Generate a shape-compatible scale replica of the driver's testdata.

NOT driver data and NEVER written under /root/testdata (which is
read-only per TESTDATA.md).  This tool exists so the frozen bench can
be exercised end-to-end at a larger scale factor than the shipped
sf0.1 — the driver's round-end measurement may use a bigger,
driver-generated SF, and "optimizations must hold at both sizes".

Method (schemas and key spaces verified against sf0.1):

- Relational tables (customer/supplier/part/orders/lineitem/events):
  k-fold replication with per-fold key OFFSETS.  All keys in the
  shipped data are contiguous and 0-based, so adding ``fold * n_base``
  to every key column preserves referential integrity, per-key group
  sizes and value skew exactly while scaling row counts linearly —
  the conservative shape for window/join operators (a real generator
  might also grow per-key history; replication never shrinks it).
- documents: FRESH uniform draws from the same 31-word vocabulary and
  the same length regime as the shipped data (seeded, deterministic).
  Replicating texts would make every doc an exact-signature duplicate;
  fresh draws reproduce the real property of this corpus at scale — a
  DENSE simhash/minhash near-dup graph over a tiny vocabulary — which
  is the stress case the round-7 scale hardening targets.
- embeddings: fold replication with vec_id offsets (distance ties are
  harmless for a robustness run).
- region/nation: copied unchanged (fixed dimension tables).

Usage:  python tools/gen_scale_replica.py OUT_DIR SCALE
        # e.g. python tools/gen_scale_replica.py /tmp/sf1.0 10
"""

from __future__ import annotations

import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "en", "zh", "es", "fr", "de"]  # ~40% en like the shipped data

# key columns to offset, per table: {col: base_cardinality}
OFFSETS = {
    "customer": {"c_custkey": 15000},
    "supplier": {"s_suppkey": 1000},
    "part": {"p_partkey": 20000},
    "orders": {"o_orderkey": 150000, "o_custkey": 15000},
    "lineitem": {"l_orderkey": 150000, "l_partkey": 20000,
                 "l_suppkey": 1000},
    "events": {"event_id": 100000, "user_id": 1500},
    "embeddings": {"vec_id": 2000},
}


def replicate(name: str, folds: int, out_dir: str) -> None:
    base = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for i in range(folds):
        t = base
        for col, card in OFFSETS[name].items():
            idx = t.schema.get_field_index(col)
            shifted = pa.compute.add(t[col], i * card)
            t = t.set_column(idx, t.schema.field(idx), shifted)
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{out_dir}/{name}.parquet")
    print(f"{name}: {base.num_rows} x {folds} = {base.num_rows * folds}")


def gen_documents(n: int, out_dir: str) -> None:
    rng = random.Random(777)
    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for i in range(n):
        words = rng.randint(8, 100)
        text = " ".join(rng.choice(VOCAB) for _ in range(words))
        ids.append(i)
        texts.append(text)
        langs.append(rng.choice(LANGS))
        sources.append(f"src{rng.randrange(20)}")
        n_chars.append(len(text))
    t = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    })
    pq.write_table(t, f"{out_dir}/documents.parquet")
    print(f"documents: fresh {n}")


def main() -> None:
    out_dir = sys.argv[1]
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import os

    os.makedirs(out_dir, exist_ok=True)
    for name in ["region", "nation"]:
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"),
                       f"{out_dir}/{name}.parquet")
    for name in ["customer", "supplier", "part", "orders", "lineitem",
                 "events"]:
        replicate(name, scale, out_dir)
    # embeddings grew ~4x per decade in the shipped data (500 -> 2000)
    replicate("embeddings", max(scale * 4 // 10, 1), out_dir)
    gen_documents(5000 * scale, out_dir)


if __name__ == "__main__":
    main()
