"""Per-query isolation bench (guide §1.4): times any subset of
declared queries with the noop sink so the computation is measured,
not the collect/sink, and can dump .explain("formatted") per query.

This is the round-6 measurement harness; bench.py stays frozen.

Usage:
  SPARK_GRAFT_SF_DIR=/root/sfx/sf1.0 python bench_extra.py q1 q2 ...
  flags: --reps N (default 2)  --explain DIR  --count (bench.py-style
  count() action instead of noop, for apples-to-apples with bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time


def cpu_probe() -> float:
    t0 = time.perf_counter()
    x = 0
    for i in range(12_000_000):
        x += i ^ (i >> 3)
    return round(time.perf_counter() - t0, 3)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from opentelemetry_log_collection_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    explain_dir = None
    use_count = False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--reps":
            reps = int(args[i + 1]); i += 2
        elif a == "--explain":
            explain_dir = args[i + 1]; i += 2
        elif a == "--count":
            use_count = True; i += 1
        else:
            names.append(a); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(f"local[{cpus}]", shuffle_partitions=cpus,
                      app_name="bench_extra")
    qmap = E.queries()
    if not names:
        names = list(qmap)

    # warm JVM + transcript cache the way bench.py does
    E.q_transcripts(spark, sf_dir).count()

    out: dict[str, list[float]] = {}
    for name in names:
        walls = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name}#{r}")
            t0 = time.time()
            df = qmap[name](spark, sf_dir)
            if use_count:
                df.select(F.count(F.lit(1))).collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = walls
        print(f"{name}: {walls} (probe {cpu_probe()}, idle ref 1.05)", flush=True)
        if explain_dir:
            os.makedirs(explain_dir, exist_ok=True)
            df = qmap[name](spark, sf_dir)
            with open(os.path.join(explain_dir, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
    print(json.dumps({"sf_dir": sf_dir, "reps": reps, "walls": out}))
    spark.stop()


if __name__ == "__main__":
    main()
