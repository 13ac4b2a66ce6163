"""Scaling-evidence runner (BASELINE.md section 3 protocol).

Runs the IDENTICAL flagship pipeline at two local parallelism levels
(N and 4N cores) on the same stored input table and reports median
wall-clock, turns/sec, and efficiency = tput(4N) / (4 * tput(N)).

Protocol details that make the comparison honest on a single box:
  - fresh subprocess (fresh JVM) per level — no shared session state,
    mirroring two spark-submit deployments;
  - ONE untimed warm-up execution per JVM before the timed runs, so
    JIT/codegen compilation (which BASELINE.md's "exclude Spark
    session startup" is about) doesn't land inside a measurement;
  - the input is the sf0.1 table replicated INFLATE x with distinct
    conv_ids (default 100 -> 10M turns), materialized once and read
    by both levels: per-core work must dominate fixed job overhead
    (~3s of planning/scheduling per run) or the ratio measures
    overhead, not the pipeline;
  - >=3 timed runs per level, median reported.

Usage: python tools/scaling_bench.py [sf_dir] [n_low] [n_high] [reps] [inflate]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

_CHILD = r"""
import json, shutil, sys, tempfile, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from opentelemetry_log_collection_spark.flagship import ROUTE_COL, route_name_col, tag_transcripts
from opentelemetry_log_collection_spark.session import get_spark
from opentelemetry_log_collection_spark.transcripts import inflated_transcripts

sf_dir, cores, inflate, reps = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
spark = get_spark(f"local[{cores}]", shuffle_partitions=cores,
                  app_name=f"scaling-{cores}")
t = inflated_transcripts(spark, sf_dir, inflate)  # built once, shared

def pipeline(out):
    # no persist: at 10M+ rows caching the full wide frame just to
    # count it costs more memory than it saves; counts come from the
    # written dataset's footers (metadata-only scan)
    tagged = tag_transcripts(spark, t).withColumn("sink", route_name_col())
    (tagged.drop(ROUTE_COL)
           .sortWithinPartitions("sink", "conv_id", "turn_idx")
           .write.mode("overwrite").partitionBy("sink").parquet(out))
    rows = sum(r["cnt"] for r in
               spark.read.parquet(out).groupBy("sink")
                    .agg(F.count(F.lit(1)).alias("cnt")).collect())
    return rows

out = tempfile.mkdtemp(prefix="scale_sinks_")
pipeline(out)  # untimed warm-up: JIT + codegen compile
walls, rows = [], 0
for _ in range(reps):
    t0 = time.time()
    rows = pipeline(out)
    walls.append(time.time() - t0)
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({"walls": walls, "rows": rows}))
spark.stop()
"""


def run_level(sf_dir: str, cores: int, inflate: int, reps: int) -> dict:
    import os

    env = dict(os.environ, SPARK_DRIVER_MEM=os.environ.get("SPARK_DRIVER_MEM", "24g"))
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, sf_dir, str(cores), str(inflate), str(reps)],
        capture_output=True, text=True, cwd="/root/repo", env=env,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"child at {cores} cores failed rc={out.returncode}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    inflate = int(sys.argv[5]) if len(sys.argv) > 5 else 100

    report: dict = {"sf_dir": sf_dir, "inflate": inflate, "levels": {}}
    for cores in (n_low, n_high):
        r = run_level(sf_dir, cores, inflate, reps)
        med = statistics.median(r["walls"])
        report["levels"][str(cores)] = {
            "walls": [round(w, 2) for w in r["walls"]],
            "median_wall": round(med, 2),
            "rows": r["rows"],
            "turns_per_sec": round(r["rows"] / med, 1),
        }
    lo = report["levels"][str(n_low)]["turns_per_sec"]
    hi = report["levels"][str(n_high)]["turns_per_sec"]
    report["efficiency"] = round(hi / ((n_high / n_low) * lo), 3)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
