"""Two-parallelism scaling evidence for the north rule.

Runs the full web-pipeline job (synthetic pages → extract → mention
detect → EL → triples → distinct) at N and 4N local cores, computes
throughput scaling efficiency, and writes BENCH.md.

Methodology notes (sandbox realities):
- this host carries background load from other tenants (load avg has
  ranged 1-6 across sessions with nothing of ours running) → each level
  runs ``repeats`` timed trials; the REPORTED efficiency is the MEDIAN
  over index-paired trials (best-of is also shown), with the full
  distribution disclosed;
- the box advertises 32 logical CPUs but only ~16 physical cores
  (pure-python spin test: 8→32 procs scales 3.06×, 16 procs 1.78× over
  8) — beyond 16 threads SMT caps any job's scaling at ~0.76, and each
  pandas-UDF stage doubles effective process count (JVM task + python
  worker). The honest N→4N pair inside physical capacity is 1→4 or
  2→8 cores.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import time, sys
sys.path.insert(0, {repo!r})
from bench import build_spark
from morph_kgc_spark.pipeline.pages import run_pipeline
from morph_kgc_spark.operators.cache import release
spark = build_spark({cores})
spark.sparkContext.setLogLevel("ERROR")
# full-size warmup, discarded: a small warmup leaves whole-stage codegen
# and the GC heap cold and the first timed trial runs ~3x slow
out = run_pipeline(spark, {pages}); out.count(); release(out)
times = []
n = 0
for _ in range({repeats}):
    t0 = time.time()
    out = run_pipeline(spark, {pages})
    n = out.count()
    # release INSIDE the trial: every trial is a full honest recompute
    # (round 3 leaked the linked persist, so trials 2+ were cache-warm
    # at BOTH levels; releasing keeps the ratio honest and the heap flat)
    release(out)
    times.append(round(time.time() - t0, 2))
print("SCALERESULT", {cores}, n, ",".join(str(t) for t in times))
spark.stop()
"""


def run(cores: int, pages: int, repeats: int) -> tuple[int, list[float]]:
    out = subprocess.run(
        [sys.executable, "-c",
         RUNNER.format(repo=REPO, cores=cores, pages=pages, repeats=repeats)],
        capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    for ln in out.stdout.splitlines():
        if ln.startswith("SCALERESULT"):
            _, c, n, ts = ln.split()
            return int(n), [float(t) for t in ts.split(",")]
    raise RuntimeError(f"no result from cores={cores}: {out.stderr[-2000:]}")


def main() -> None:
    pages = int(os.environ.get("SPARK_GRAFT_SCALE_PAGES", "3000000"))
    repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "5"))
    # 1 vs 4: the only N→4N pair that stays inside this host's FREE
    # physical capacity (~16 phys cores minus tenant noise; each
    # pandas-UDF stage doubles process count) — see module docstring
    n_lo = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "1"))
    n_hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "4"))
    ratio = n_hi / n_lo
    triples, t_lo = run(n_lo, pages, repeats)
    _, t_hi = run(n_hi, pages, repeats)

    effs = [round((lo / hi) / ratio, 3) for lo, hi in zip(t_lo, t_hi)]
    med_eff = round(statistics.median(effs), 3)
    best_eff = round((min(t_lo) / min(t_hi)) / ratio, 3)
    med_lo, med_hi = statistics.median(t_lo), statistics.median(t_hi)

    report = {
        "pages": pages, "triples": triples,
        "cores_low": n_lo, "cores_high": n_hi,
        "sec_low_trials": t_lo, "sec_high_trials": t_hi,
        "sec_low_median": med_lo, "sec_high_median": med_hi,
        "triples_per_sec_low": round(triples / med_lo, 1),
        "triples_per_sec_high": round(triples / med_hi, 1),
        "per_trial_efficiency": effs,
        "scaling_efficiency_median": med_eff,
        "scaling_efficiency_best": best_eff,
        "repeats": repeats,
        "timestamp": datetime.now(timezone.utc).isoformat(),
    }
    print(json.dumps(report))
    # SCALING_LATEST.md, not BENCH.md: BENCH.md is a curated multi-
    # section document now — clobbering it from here lost nothing only
    # because earlier rounds ran this before the hand-curation. The
    # round report gets merged into BENCH.md's scaling section by hand.
    with open(os.path.join(REPO, "SCALING_LATEST.md"), "w") as f:
        f.write(f"""# Scaling evidence (north rule)

Job: full KG-construction web pipeline (synthetic pages → JVM
binary-slice text extraction → token-aligned mention detection →
broadcast-dict candidate gen → JVM array-intersect EL scoring →
template expansion → distinct; python-free since round 7),
{pages:,} pages → {triples:,} triples. Sandbox proxy for N vs 4N
executors per driver instruction: `local[{n_lo}]` vs `local[{n_hi}]`,
{repeats} timed trials per level after warmup (host has shifting
background tenant load and only ~16 physical cores behind 32 SMT
threads — see tools/scaling_bench.py docstring; the {n_lo}→{n_hi} pair
stays inside free physical capacity including per-task python workers).

| cores | wall times (s) | median (s) | throughput (triples/sec) |
|---|---|---|---|
| {n_lo} | {", ".join(map(str, t_lo))} | {med_lo} | {report['triples_per_sec_low']} |
| {n_hi} | {", ".join(map(str, t_hi))} | {med_hi} | {report['triples_per_sec_high']} |

**Scaling efficiency {n_lo}→{n_hi} cores: MEDIAN {med_eff}** over
index-paired trials {effs} (best-pair {best_eff}). Round 1 reported a
best-of-7 0.836 with median ≈0.70 under heavy tenant noise; round 2
moved the always-dirty URL percent-encode from an Arrow UDF to a pure
JVM url_encode expression chain (functions/encoding.py), removing the
largest python-side cost from the hot path, and re-measured at low
ambient load.

Why this holds at cluster scale: every stage is either per-row
(generation, extraction, matching — zero shuffle) or a single
hash-partitioned exchange (EL window on (url, alias); global distinct),
with the dictionary broadcast. No stage has driver-side row processing;
parallelism is bounded only by partition counts, which scale with the
input. On a real 4N-executor cluster the fixed driver costs measured
here (plan compile, py4j, scheduling) do not grow with N.

Raw: `{json.dumps(report)}`
""")


if __name__ == "__main__":
    main()
