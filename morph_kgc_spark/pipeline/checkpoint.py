"""Checkpoint-resumable partitioned triple sink with lineage + metrics.

North-rule requirement: the pipeline must be resumable per partition with
lineage and counter metrics written alongside each commit. On a real
cluster the sink is an Iceberg table (atomic snapshot commits, partition
spec ``bucket(url)``/``days(warc_ts)``); this sandbox has no Iceberg
runtime jar, so the same commit protocol is implemented over a parquet
directory layout:

    <root>/bucket=<k>/part-*.parquet       (data, atomic via staging+rename)
    <root>/_commits/bucket_<k>.json        (commit marker: metrics+lineage)

A bucket is committed iff its marker exists; ``write_checkpointed``
skips committed buckets, so a killed run resumes where it stopped, and a
re-run of a fully-committed table is a no-op. Markers carry row counts,
wall time, and a lineage fingerprint (plan + input description) so a
resume against *different* inputs is refused instead of silently mixed.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CommitStats:
    written_buckets: list[int]
    skipped_buckets: list[int]
    rows_written: int


_EXPR_ID_RE = re.compile(r"#\d+L?")


def _lineage_fingerprint(df: DataFrame, extra: str = "") -> str:
    """Restart-stable fingerprint of the logical plan + caller input id.

    The raw plan string embeds per-JVM attribute exprIds (``subject#123``)
    that change on every new driver, which would make every resume after
    a restart refuse with 'different lineage'. Canonicalize by stripping
    the numeric ids — relation paths, schemas, and operator structure
    (the parts that actually identify the lineage) survive.
    """
    plan = df._jdf.queryExecution().logical().toString()
    plan = _EXPR_ID_RE.sub("#", plan)
    return hashlib.md5((plan + "\n" + extra).encode()).hexdigest()


def bucketed(df: DataFrame, key_col: str, n_buckets: int) -> DataFrame:
    """Add a deterministic bucket column (md5-derived, engine-portable)."""
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col(key_col)), 1, 15), 16, 10).cast("long"),
        F.lit(n_buckets),
    ).cast("int")
    return df.withColumn("bucket", bucket)


def write_checkpointed(df: DataFrame, root: str, key_col: str = "subject",
                       n_buckets: int = 16, lineage: str = "") -> CommitStats:
    """Write df partitioned by bucket(key_col), resuming past commits.

    One Spark job per *uncommitted* bucket (a driver loop — fine for
    O(10²) buckets; an Iceberg sink replaces the loop with a single
    atomic snapshot commit per partition batch at cluster scale).
    """
    os.makedirs(os.path.join(root, "_commits"), exist_ok=True)
    bdf = bucketed(df, key_col, n_buckets).persist()
    try:
        fingerprint = _lineage_fingerprint(df, lineage)

        written, skipped, total_rows = [], [], 0
        for k in range(n_buckets):
            marker = os.path.join(root, "_commits", f"bucket_{k}.json")
            if os.path.exists(marker):
                with open(marker) as f:
                    prev = json.load(f)
                if prev.get("lineage") != fingerprint:
                    raise ValueError(
                        f"bucket {k} was committed from different lineage "
                        f"{prev.get('lineage')[:12]}… (current {fingerprint[:12]}…); "
                        "refusing to mix — clear the sink or bump the root path")
                skipped.append(k)
                continue

            part = bdf.where(F.col("bucket") == k).drop("bucket")
            final_dir = os.path.join(root, f"bucket={k}")
            staging = os.path.join(root, f"_staging_bucket_{k}")
            t0 = time.time()
            part.write.mode("overwrite").parquet(staging)
            # metadata-only count from the freshly written footers (the
            # filtered plan would otherwise recompute the whole branch)
            n = df.sparkSession.read.parquet(staging).count()
            if os.path.exists(final_dir):
                shutil.rmtree(final_dir)
            os.rename(staging, final_dir)
            with open(marker + ".tmp", "w") as f:
                json.dump({
                    "bucket": k,
                    "rows": n,
                    "seconds": round(time.time() - t0, 3),
                    "lineage": fingerprint,
                    "committed_at_epoch": int(time.time()),
                }, f)
            os.rename(marker + ".tmp", marker)
            written.append(k)
            total_rows += n
        return CommitStats(written, skipped, total_rows)
    finally:
        bdf.unpersist()


def read_committed(spark, root: str) -> DataFrame:
    """Read only committed buckets."""
    commits = os.path.join(root, "_commits")
    dirs = []
    for name in sorted(os.listdir(commits)):
        if name.endswith(".json"):
            k = int(name[len("bucket_"):-len(".json")])
            dirs.append(os.path.join(root, f"bucket={k}"))
    if not dirs:
        raise ValueError(f"no committed buckets under {root}")
    return spark.read.parquet(*dirs)


def commit_metrics(root: str) -> dict:
    """Aggregate the per-partition counter metrics."""
    commits = os.path.join(root, "_commits")
    out = {"buckets": 0, "rows": 0, "seconds": 0.0}
    for name in os.listdir(commits):
        if name.endswith(".json"):
            with open(os.path.join(commits, name)) as f:
                m = json.load(f)
            out["buckets"] += 1
            out["rows"] += m["rows"]
            out["seconds"] += m["seconds"]
    return out
