"""CLI entry point: ``python -m morph_kgc_spark config.ini``.

Mirrors the reference's CLI (src/morph_kgc/__main__.py: parse args →
materialize → write). The config's ``output_file`` receives the
distributed N-Triples/N-Quads directory; without one, triples stream to
stdout (small graphs only — the count goes to stderr either way).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m morph_kgc_spark",
        description="Materialize a knowledge graph from an INI config "
                    "(morph-kgc compatible) on Spark.")
    ap.add_argument("config", help="INI config path (reference shape: "
                                   "[CONFIGURATION] + data-source sections)")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("--shuffle-partitions", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = (SparkSession.builder.master(args.master)
               .appName("morph-kgc-spark")
               .config("spark.ui.showConsoleProgress", "false")
               .config("spark.sql.session.timeZone", "UTC"))
    if args.shuffle_partitions:
        builder = builder.config("spark.sql.shuffle.partitions",
                                 args.shuffle_partitions)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    from morph_kgc_spark.config import load_config, materialize_from_config

    cfg = load_config(args.config)
    t0 = time.time()
    df = materialize_from_config(spark, args.config, write=True)
    if cfg.output_file:
        n = spark.read.text(cfg.output_file).count()
    else:
        from morph_kgc_spark.sinks.ntriples import ntriples_lines

        n = 0
        for row in ntriples_lines(df).toLocalIterator():
            sys.stdout.write(row.value + "\n")
            n += 1
    print(f"{n} triples materialized in {time.time() - t0:.2f}s"
          + (f" -> {cfg.output_file}" if cfg.output_file else ""),
          file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
