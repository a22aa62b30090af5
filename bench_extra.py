"""Per-query isolation bench + plan capture (guide §1.4/§7.2).

NOT the official bench — bench.py stays frozen for the driver. This
harness exists so optimization work can (a) time one query at a time
with the noop sink, (b) dump .explain("formatted") for the plan
artifacts under plans/r07/, and (c) iterate quickly without paying the
full 53-query suite.

Usage:
  python bench_extra.py q1 q2 ...            # time the named queries
  python bench_extra.py --all                # time everything
  python bench_extra.py --plans DIR q1 ...   # also write DIR/<q>.txt
  python bench_extra.py --trials N ...       # default 3
  python bench_extra.py --pipeline           # web pipeline only

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32) — same contract as bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_spark(cores: int):
    # identical session config to bench.py so numbers are comparable
    from bench import build_spark as _bs

    return _bs(cores)


def capture_plan(df, path: str) -> None:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(path, "w", encoding="utf-8") as f:
        f.write(plan)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') files")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--pipeline", action="store_true",
                    help="run the web pipeline (1M pages) instead")
    ap.add_argument("--pages", type=int, default=1_000_000)
    ap.add_argument("--suffix", default="",
                    help="suffix for plan filenames, e.g. _before/_after")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from bench import cpu_spin_sec

    spark = build_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    spin0 = cpu_spin_sec()

    from morph_kgc_spark.operators.cache import release as cache_release

    results: dict[str, list[float]] = {}

    def timed(name, fn):
        spark.sparkContext.setJobDescription(name)
        times = []
        for t in range(args.trials):
            t0 = time.time()
            out = fn()
            out.write.format("noop").mode("overwrite").save()
            cache_release(out)
            times.append(round(time.time() - t0, 3))
        results[name] = times
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            capture_plan(fn(), os.path.join(
                args.plans, f"{name}{args.suffix}.txt"))
        spark.sparkContext.setJobDescription(None)
        print(json.dumps({name: times}), flush=True)

    if args.pipeline:
        from morph_kgc_spark.pipeline.pages import run_pipeline

        timed("web_pipeline", lambda: run_pipeline(spark, args.pages))
    else:
        qs = entrymod.queries()
        names = list(qs) if args.all else args.names
        for name in names:
            if name == "kg_materialize_all":
                timed(name, lambda: entrymod.flagship(spark, sf_dir))
                continue
            if name not in qs:
                print(f"unknown query {name}", file=sys.stderr)
                continue
            timed(name, lambda fn=qs[name]: fn(spark, sf_dir))

    print(json.dumps({
        "summary": {k: min(v) for k, v in results.items()},
        "spin_start": spin0, "spin_end": cpu_spin_sec(),
        "load": [round(x, 2) for x in os.getloadavg()],
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
