"""Phase-level timing of one cold + one warm flagship run, mimicking
bench.py's sequence (warmup transcripts count first). Measurement
harness only."""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from opentelemetry_log_collection_spark.flagship import (  # noqa: E402
    route_name_col,
    tagged_frame,
    write_sinks,
)
from opentelemetry_log_collection_spark.session import get_spark  # noqa: E402

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(f"local[{cpus}]", shuffle_partitions=cpus, app_name="fprobe")

t0 = time.time()
n = E.q_transcripts(spark, sf_dir).count()
print(f"warmup count: {time.time()-t0:.2f}s ({n} turns)", flush=True)


def one(label: str) -> None:
    out_dir = tempfile.mkdtemp(prefix="fprobe_")
    t0 = time.time()
    tagged = tagged_frame(spark, sf_dir)
    t1 = time.time()
    tagged = tagged.withColumn("sink", route_name_col()).persist()
    tagged.count()  # materialize cache explicitly to split timing
    t2 = time.time()
    write_sinks(spark, tagged, out_dir)
    t3 = time.time()
    rows = tagged.groupBy("sink").agg(F.count(F.lit(1)).alias("cnt")).collect()
    t4 = time.time()
    tagged.unpersist()
    shutil.rmtree(out_dir, ignore_errors=True)
    print(
        f"{label}: plan={t1-t0:.2f}s persist+count={t2-t1:.2f}s "
        f"write={t3-t2:.2f}s counts={t4-t3:.2f}s total={t4-t0:.2f}s",
        flush=True,
    )


one("cold")
one("warm1")
one("warm2")
spark.stop()
