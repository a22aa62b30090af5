"""spark-submit entry point for the KG-construction pipeline.

Usage (north_rule deployment shape):

    python tools/make_pyfiles.py                      # → dist/morph_kgc_spark.zip
    spark-submit --py-files dist/morph_kgc_spark.zip \\
        jobs/materialize_job.py \\
        --mode pipeline --pages 1000000 --out /data/triples \\
        [--buckets 16] [--resume]

    spark-submit --py-files dist/morph_kgc_spark.zip \\
        jobs/materialize_job.py --mode config --config config.ini

On a real cluster add --master/--num-executors etc.; the job only uses
the session it is handed. Output goes through the checkpoint-resumable
bucket sink (pipeline mode) or the distributed N-Triples writer (config
mode).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["pipeline", "config"], default="pipeline")
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--entities", type=int, default=256)
    ap.add_argument("--out", default=None)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--config", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("morph-kgc-spark").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    t0 = time.time()
    if args.mode == "pipeline":
        from morph_kgc_spark.pipeline.checkpoint import commit_metrics, write_checkpointed
        from morph_kgc_spark.pipeline.pages import run_pipeline

        triples = run_pipeline(spark, args.pages, n_entities=args.entities)
        if args.out:
            stats = write_checkpointed(
                triples, args.out, n_buckets=args.buckets,
                lineage=f"pipeline:pages={args.pages}:entities={args.entities}")
            report = {
                "mode": "pipeline",
                "written_buckets": stats.written_buckets,
                "skipped_buckets": stats.skipped_buckets,
                "rows_written": stats.rows_written,
                "metrics": commit_metrics(args.out),
                "seconds": round(time.time() - t0, 2),
            }
        else:
            report = {"mode": "pipeline", "triples": triples.count(),
                      "seconds": round(time.time() - t0, 2)}
        from morph_kgc_spark.operators.cache import release

        release(triples)
    else:
        if not args.config:
            ap.error("--mode config requires --config")
        from morph_kgc_spark.config import materialize_from_config

        df = materialize_from_config(spark, args.config, write=True)
        report = {"mode": "config", "triples": df.count(),
                  "seconds": round(time.time() - t0, 2)}

    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
