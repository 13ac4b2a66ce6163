"""Times run_flagship exactly the way bench.py does (warmup
transcripts count, then cold + warm walls). Measurement harness
only."""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as E  # noqa: E402
from opentelemetry_log_collection_spark.flagship import run_flagship  # noqa: E402
from opentelemetry_log_collection_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(f"local[{cpus}]", shuffle_partitions=cpus, app_name="fprobe")

t0 = time.time()
n = E.q_transcripts(spark, sf_dir).count()
print(f"warmup count: {time.time()-t0:.2f}s ({n} turns)", flush=True)

for label in ("cold", "warm1", "warm2", "warm3"):
    out_dir = tempfile.mkdtemp(prefix="fprobe_")
    t0 = time.time()
    counts = run_flagship(spark, sf_dir, out_dir=out_dir)
    routed = {r["sink"]: r["cnt"] for r in counts.collect()}
    wall = time.time() - t0
    shutil.rmtree(out_dir, ignore_errors=True)
    print(f"{label}: {wall:.2f}s routed={sum(routed.values())}", flush=True)
spark.stop()
