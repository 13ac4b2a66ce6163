"""Scaling-evidence runner (BASELINE.md section 3 protocol).

Runs the IDENTICAL flagship pipeline at two local parallelism levels
(N and 4N cores) on the same stored input table and reports median /
min wall-clock, turns/sec, and efficiency = tput(4N) / (4 * tput(N)).

Protocol details that make the comparison honest on a single box:
  - INTERLEAVED runs: the levels alternate (N, 4N, N, 4N, ...) so any
    environment drift (thermal, page cache, background noise) hits
    both levels symmetrically instead of biasing whichever level ran
    last;
  - fresh subprocess (fresh JVM) per run — no shared session state,
    mirroring two spark-submit deployments of jobs/run_pipeline.py;
  - ONE untimed warm-up execution per JVM before its timed run, so
    JIT/codegen compilation (which BASELINE.md's "exclude Spark
    session startup" is about) doesn't land inside a measurement;
  - the input is the sf0.1 table replicated INFLATE x with distinct
    conv_ids (default 100 -> 10M turns), materialized once and read
    by both levels: per-core work must dominate fixed job overhead
    (~3s of planning/scheduling per run) or the ratio measures
    overhead, not the pipeline;
  - >=3 timed runs per level; median AND min reported (min is the
    least-noise estimator on a shared box, median the conservative
    one). Efficiency is reported for both.
  - per-sink routed rows, bytes written and output partition stats
    (BASELINE.md section 3 item 4) come from the written dataset.

Usage: python tools/scaling_bench.py [sf_dir] [n_low] [n_high] [reps] [inflate]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

_CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from opentelemetry_log_collection_spark.flagship import route_name_col, tag_transcripts, write_sinks
from opentelemetry_log_collection_spark.session import get_spark
from opentelemetry_log_collection_spark.transcripts import inflated_transcripts

sf_dir, cores, inflate = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
# optional memory tuning for deep (10M+) campaigns: the 25M attempt
# died on execution-memory pressure at default fraction
extra = {}
if os.environ.get("SPARK_GRAFT_MEMORY_FRACTION"):
    extra["spark.memory.fraction"] = os.environ["SPARK_GRAFT_MEMORY_FRACTION"]
spark = get_spark(f"local[{cores}]", shuffle_partitions=cores,
                  app_name=f"scaling-{cores}", extra_conf=extra)
t = inflated_transcripts(spark, sf_dir, inflate)  # built once, shared

def pipeline(out):
    # no persist: at 10M+ rows caching the full wide frame just to
    # count it costs more memory than it saves; counts come from the
    # written dataset's footers (metadata-only scan). The write path
    # is the engine's own write_sinks (coalesce-to-cores + zstd).
    tagged = tag_transcripts(spark, t).withColumn("sink", route_name_col())
    write_sinks(spark, tagged, out)
    counts = {r["sink"]: r["cnt"] for r in
              spark.read.parquet(out).groupBy("sink")
                   .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    return counts

base = os.environ.get("SPARK_GRAFT_BENCH_DIR") or None
out = tempfile.mkdtemp(prefix="scale_sinks_", dir=base)
pipeline(out)  # untimed warm-up: JIT + codegen compile
t0 = time.time()
counts = pipeline(out)
wall = time.time() - t0
# secondary metric: the transform pipeline alone (scan->parse->enrich->
# route->count, no sink write) — separates engine scaling from the
# single-box filesystem/write tail, which a real cluster does not share
t0 = time.time()
tag_transcripts(spark, t).groupBy("_route").agg(F.count(F.lit(1))).collect()
compute_wall = time.time() - t0
n_bytes = sum(os.path.getsize(os.path.join(dp, f))
              for dp, _, fs in os.walk(out) for f in fs)
n_files = sum(len(fs) for _, _, fs in os.walk(out))
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({"wall": wall, "compute_wall": compute_wall,
                  "rows": sum(counts.values()),
                  "counts": counts, "bytes": n_bytes, "files": n_files}))
spark.stop()
"""


def cpu_probe() -> float:
    """Single-thread CPU probe, independent of Spark and of the level
    under test. This sandbox is a guest on a contended host: identical
    runs swing 3-4x with nothing running in the guest. The probe
    samples the host's current speed so contaminated reps can be
    CLASSIFIED (not silently dropped) — the report carries every wall
    plus its probe, and clean-rep medians are computed over reps whose
    probe is within 25% of the best probe seen."""
    import time

    t0 = time.perf_counter()
    x = 0
    for i in range(12_000_000):
        x += i ^ (i >> 3)
    return time.perf_counter() - t0


def run_once(sf_dir: str, cores: int, inflate: int) -> dict:
    import os

    env = dict(os.environ, SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "24g"))
    probe = cpu_probe()
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, sf_dir, str(cores), str(inflate)],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"child at {cores} cores failed rc={out.returncode}")
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r["probe"] = probe + cpu_probe()  # before + after, catches mid-run shifts
    return r


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    inflate = int(sys.argv[5]) if len(sys.argv) > 5 else 100

    walls: dict[int, list[float]] = {n_low: [], n_high: []}
    cwalls: dict[int, list[float]] = {n_low: [], n_high: []}
    probes: dict[int, list[float]] = {n_low: [], n_high: []}
    last: dict[int, dict] = {}
    # interleave: N, 4N, N, 4N, ... so drift hits both levels equally
    for rep in range(reps):
        for cores in (n_low, n_high):
            r = run_once(sf_dir, cores, inflate)
            walls[cores].append(r["wall"])
            cwalls[cores].append(r.get("compute_wall", r["wall"]))
            probes[cores].append(r["probe"])
            last[cores] = r
            print(
                f"  rep {rep + 1}/{reps} cores={cores:<3d} "
                f"wall={r['wall']:.2f}s tput={r['rows'] / r['wall']:,.0f}/s "
                f"compute={r.get('compute_wall', 0):.2f}s "
                f"probe={r['probe']:.2f}s",
                file=sys.stderr,
            )

    report: dict = {"sf_dir": sf_dir, "inflate": inflate,
                    "protocol": "interleaved, fresh JVM + warm-up per run",
                    "levels": {}}
    best_probe = min(min(probes[n_low]), min(probes[n_high]))

    def clean(vals: list[float], cores: int) -> list[float]:
        out = [
            w
            for w, p in zip(vals, probes[cores])
            if p <= best_probe * 1.25
        ]
        return out or vals  # never empty: fall back to all reps

    for cores in (n_low, n_high):
        ws = walls[cores]
        cw = clean(ws, cores)
        med, mn = statistics.median(cw), min(ws)
        rows = last[cores]["rows"]
        report["levels"][str(cores)] = {
            "walls": [round(w, 2) for w in ws],
            "compute_walls": [round(w, 2) for w in cwalls[cores]],
            "probes": [round(p, 2) for p in probes[cores]],
            "clean_walls": [round(w, 2) for w in cw],
            "median_clean_wall": round(med, 2),
            "min_wall": round(mn, 2),
            "rows": rows,
            "turns_per_sec_median_clean": round(rows / med, 1),
            "turns_per_sec_min": round(rows / mn, 1),
            "bytes_written": last[cores]["bytes"],
            "files_written": last[cores]["files"],
            "routed_counts": last[cores]["counts"],
        }
    ratio = n_high / n_low
    lo, hi = report["levels"][str(n_low)], report["levels"][str(n_high)]
    report["efficiency_median_clean"] = round(
        hi["turns_per_sec_median_clean"]
        / (ratio * lo["turns_per_sec_median_clean"]),
        3,
    )
    report["efficiency_min"] = round(
        hi["turns_per_sec_min"] / (ratio * lo["turns_per_sec_min"]), 3
    )
    report["compute_efficiency_min"] = round(
        min(clean(cwalls[n_low], n_low))
        / (ratio * min(clean(cwalls[n_high], n_high))),
        3,
    )
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
