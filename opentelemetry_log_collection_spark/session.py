"""SparkSession helper with the engine's canonical configuration.

Scale posture: AQE on (runtime skew-join splitting + partition
coalescing), Arrow enabled for the pandas-UDF slow path, UTC session
timezone so timestamp semantics are reproducible across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "otel-log-collection-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        # engine-created sessions run merge-overwrite via plain
        # map_concat (fields.merge_maps fast path); caller-provided
        # sessions without this policy get the policy-independent
        # filter+concat instead
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # local-bench scan granularity: the test tables are a few MB,
        # which the 128MB default packs into 1-5 splits — capping
        # parallelism at 5 tasks no matter how many cores. Force at
        # least one split per core and small bins. 100TB deployments
        # override these back up via extra_conf.
        .config("spark.sql.files.maxPartitionBytes", "1m")
        .config("spark.sql.files.openCostInBytes", "16k")
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # one BLAS thread per Python worker: numpy matmuls inside
        # Arrow UDFs must not oversubscribe the cores Spark already
        # saturates with one worker per slot
        .config("spark.executorEnv.OMP_NUM_THREADS", "1")
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS", "1")
        .config("spark.executorEnv.MKL_NUM_THREADS", "1")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # throughput GC: G1's pause-target pacing collapses under 32
        # mutator threads of columnar churn (measured 2-4x slower than
        # ParallelGC on the flagship at local[32])
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        # task-side commit (v2): the v1 driver-side serial rename of
        # every task's partitioned output files is an Amdahl tail that
        # grows with task count
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2"
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
