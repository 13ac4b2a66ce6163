"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "turns_per_sec": ...}

The flagship query is the north-rule pipeline: transcripts -> parse
(4 shapes) -> enrich -> route -> per-sink parquet writes + aggregate
counts; its turns/sec is the BASELINE.json headline metric.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from opentelemetry_log_collection_spark.flagship import run_flagship  # noqa: E402
from opentelemetry_log_collection_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(f"local[{cpus}]", shuffle_partitions=cpus, app_name="bench")

    # warm the JVM + parquet footers so timings measure the pipeline
    n_turns = E.q_transcripts(spark, sf_dir).count()

    timings: dict[str, float] = {}

    out_dir = tempfile.mkdtemp(prefix="bench_sinks_")
    t0 = time.time()
    counts = run_flagship(spark, sf_dir, out_dir=out_dir)
    routed = {r["sink"]: r["cnt"] for r in counts.collect()}
    flagship_sec = time.time() - t0
    timings["flagship_parse_route_write"] = round(flagship_sec, 3)
    shutil.rmtree(out_dir, ignore_errors=True)

    # second, plan-warm run: Catalyst + JIT/codegen compile of the
    # 4-parser tree is ~2/3 of the cold wall at this SF (11.1s cold vs
    # 3.6s warm measured) and amortizes to zero at cluster scale —
    # BASELINE.md's "exclude session startup" principle, same as the
    # scaling protocol's untimed warm-up. Cold stays the headline for
    # round-over-round comparability; warm is the number that
    # extrapolates.
    out_dir = tempfile.mkdtemp(prefix="bench_sinks_")
    t0 = time.time()
    run_flagship(spark, sf_dir, out_dir=out_dir)
    warm_sec = time.time() - t0
    timings["flagship_warm"] = round(warm_sec, 3)
    shutil.rmtree(out_dir, ignore_errors=True)

    bench_queries = [
        "regex_tomcat",
        "severity_http",
        "syslog_rfc3164",
        "uri_request",
        "recombine_conv",
        "routed_rows",
        "dedup_exact",
        "minhash_pairs",
        "token_stats",
        "lang_id",
        "embed_topk",
        "ann_lsh",
        "ann_ivf",
    ]
    qmap = E.queries()
    for name in bench_queries:
        t0 = time.time()
        df = qmap[name](spark, sf_dir)
        df.select(F.count(F.lit(1))).collect()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    turns_per_sec = round(n_turns / flagship_sec, 1)
    print(
        json.dumps(
            {
                "metric": "parsed+routed turns/sec end-to-end (flagship)",
                "value": turns_per_sec,
                "unit": "turns/sec",
                "queries": timings,
                "total_sec": total,
                "sf": sf,
                "n_turns": n_turns,
                "turns_per_sec": turns_per_sec,
                "turns_per_sec_warm": round(n_turns / warm_sec, 1),
                "routed_counts": routed,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
