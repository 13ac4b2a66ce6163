from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opentelemetry_log_collection_spark.entry import to_entries
from opentelemetry_log_collection_spark.session import get_spark
import opentelemetry_log_collection_spark.operators  # noqa: F401  (register)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("local[4]", shuffle_partitions=4, app_name="otel-spark-tests")
    yield s
    s.stop()


TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)


def make_entries(spark, texts, conv_id="c0", role="user", tool=""):
    """Build a canonical entry frame from a list of body texts (or
    (text, role) tuples), turn_idx in list order."""
    rows = []
    for i, t in enumerate(texts):
        if isinstance(t, tuple):
            t, r = t
        else:
            r = role
        rows.append((conv_id, i, r, t, tool, BASE_TS + dt.timedelta(seconds=i)))
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    return to_entries(df)


def collected(df, *cols, order=("conv_id", "turn_idx")):
    out = df
    if order and all(c in df.columns for c in order):
        out = out.orderBy(*order)
    if cols:
        out = out.select(*cols)
    return [r.asDict(recursive=True) for r in out.collect()]
