"""spark-submit entry point for the flagship pipeline.

Deploy (cluster):
    zip -r otel_spark.zip opentelemetry_log_collection_spark
    spark-submit --py-files otel_spark.zip jobs/run_pipeline.py \
        --input /data/transcripts --out /data/sinks --buckets 64 --resume

Local two-level scaling evidence uses the same job via
tools/scaling_bench.py (local[N] vs local[4N]).

The job is resume-safe: re-running after a failure skips committed
buckets (see checkpoint.CheckpointedRunner) and converges to
byte-identical sinks. Exit prints the aggregate lineage/metrics JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# `python jobs/run_pipeline.py` puts jobs/ (not the repo root) on
# sys.path; spark-submit --py-files ships the package instead — make
# the direct invocation work without an install either way
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", default="/root/testdata/sf0.01",
                   help="sf_dir with events.parquet (transcript source)")
    p.add_argument("--out", required=True, help="sink output directory")
    p.add_argument("--buckets", type=int, default=8,
                   help="checkpoint work units (O(cores x 4) at scale)")
    p.add_argument("--cores", type=int, default=None,
                   help="local[] core count (ignored under a real master)")
    p.add_argument("--master", default=None)
    p.add_argument("--fail-after", type=int, default=None,
                   help="test hook: abort after N buckets")
    args = p.parse_args()

    from opentelemetry_log_collection_spark.checkpoint import CheckpointedRunner
    from opentelemetry_log_collection_spark.session import get_spark

    master = args.master or (f"local[{args.cores}]" if args.cores else None)
    spark = get_spark(master, app_name="otel-flagship")
    runner = CheckpointedRunner(
        spark, args.input, args.out, n_buckets=args.buckets
    )
    try:
        metrics = runner.run(fail_after=args.fail_after)
    except RuntimeError as exc:
        print(f"aborted: {exc}", file=sys.stderr)
        print(json.dumps(runner.metrics()))
        return 1
    print(json.dumps(metrics))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
