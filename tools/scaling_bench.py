"""Scaling-evidence runner (BASELINE.md section 3 protocol).

Runs the IDENTICAL flagship pipeline at two local parallelism levels
(N and 4N cores) on the same input, >=3 runs each, reports median
wall-clock, turns/sec, and efficiency = tput(4N) / (4 * tput(N)).

Each measurement is a fresh subprocess (fresh JVM) so the two levels
can't share a session, mirroring two spark-submit deployments.

Usage: python tools/scaling_bench.py [sf_dir] [n_low] [n_high] [reps]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

_CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, ".")
from opentelemetry_log_collection_spark.flagship import run_flagship
from opentelemetry_log_collection_spark.session import get_spark

sf_dir, cores = sys.argv[1], int(sys.argv[2])
spark = get_spark(f"local[{cores}]", shuffle_partitions=cores,
                  app_name=f"scaling-{cores}")
n = spark.read.parquet(f"{sf_dir}/events.parquet").count()  # JVM warm-up
out = tempfile.mkdtemp(prefix="scale_sinks_")
t0 = time.time()
counts = run_flagship(spark, sf_dir, out_dir=out)
rows = sum(r["cnt"] for r in counts.collect())
wall = time.time() - t0
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({"wall": wall, "rows": rows}))
spark.stop()
"""


def run_once(sf_dir: str, cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, sf_dir, str(cores)],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    report: dict = {"sf_dir": sf_dir, "levels": {}}
    for cores in (n_low, n_high):
        walls, rows = [], 0
        for _ in range(reps):
            r = run_once(sf_dir, cores)
            walls.append(r["wall"])
            rows = r["rows"]
        med = statistics.median(walls)
        report["levels"][str(cores)] = {
            "walls": [round(w, 2) for w in walls],
            "median_wall": round(med, 2),
            "rows": rows,
            "turns_per_sec": round(rows / med, 1),
        }
    lo = report["levels"][str(n_low)]["turns_per_sec"]
    hi = report["levels"][str(n_high)]["turns_per_sec"]
    report["efficiency"] = round(hi / ((n_high / n_low) * lo), 3)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
