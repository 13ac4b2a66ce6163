"""As-of join semantics (small literal frames)."""

from __future__ import annotations

from opentelemetry_log_collection_spark.asof import asof_join


def _ts(spark, rows, cols):
    df = spark.createDataFrame(rows, cols)
    return df.withColumn("ts", df["ts"].cast("timestamp"))


def test_asof_backward_and_ties(spark):
    left = _ts(spark, [
        (1, "u", "2024-01-01 00:00:05"),
        (2, "u", "2024-01-01 00:00:10"),   # ts EQUAL to a right row
        (3, "u", "2024-01-01 00:00:02"),   # before any right row
        (4, "v", "2024-01-01 00:00:30"),   # other key
    ], ["event_id", "user", "ts"])
    right = _ts(spark, [
        ("u", "2024-01-01 00:00:03", 1.5),
        ("u", "2024-01-01 00:00:10", 2.5),  # equal-ts: <= must match
        ("u", "2024-01-01 00:00:20", 9.9),  # future: never matches
        ("v", "2024-01-01 00:00:01", 7.0),
    ], ["user", "ts", "value"])
    out = {r["event_id"]: r for r in asof_join(
        left, right, on="user", ts="ts", value_cols=("value",)
    ).collect()}
    assert out[1]["r_value"] == 1.5
    assert out[2]["r_value"] == 2.5          # <= semantics at the tie
    assert out[3]["r_value"] is None         # no prior right row
    assert out[3]["r_ts"] is None
    assert out[4]["r_value"] == 7.0
    assert len(out) == 4                     # left rows never dropped


def test_asof_dedup_right_keeps_max(spark):
    left = _ts(spark, [(1, "u", "2024-01-01 00:00:09")],
               ["event_id", "user", "ts"])
    right = _ts(spark, [
        ("u", "2024-01-01 00:00:07", 1.0),
        ("u", "2024-01-01 00:00:07", 4.0),   # duplicate (key, ts)
    ], ["user", "ts", "value"])
    out = asof_join(left, right, on="user", ts="ts",
                    value_cols=("value",)).collect()
    assert out[0]["r_value"] == 4.0          # deterministic: max wins


def test_asof_multiple_value_cols_defaulted(spark):
    left = _ts(spark, [(1, "u", "2024-01-01 00:01:00")],
               ["event_id", "user", "ts"])
    right = _ts(spark, [("u", "2024-01-01 00:00:59", 3.5, "deploy")],
                ["user", "ts", "value", "tag"])
    row = asof_join(left, right, on="user", ts="ts").collect()[0]
    assert row["r_value"] == 3.5 and row["r_tag"] == "deploy"


def test_interval_join_boundaries_and_buckets(spark):
    from opentelemetry_log_collection_spark.asof import interval_join

    pts = _ts(spark, [
        (1, "u", "2024-01-01 00:10:00"),   # inside
        (2, "u", "2024-01-01 00:00:00"),   # == start: inclusive
        (3, "u", "2024-01-01 01:00:00"),   # == end: exclusive
        (4, "u", "2024-01-01 03:59:00"),   # inside an interval that
                                           # STRADDLES a bucket edge,
                                           # point in a LATER bucket
        (5, "w", "2024-01-01 00:10:00"),   # other key: no match
    ], ["event_id", "user", "ts"])
    ivs = spark.createDataFrame([
        ("u", "2024-01-01 00:00:00", "2024-01-01 01:00:00", "a"),
        ("u", "2024-01-01 03:30:00", "2024-01-01 04:30:00", "b"),
        ("u", "2024-01-01 02:00:00", "2024-01-01 02:00:00", "z"),  # empty
    ], ["user", "ts_start", "ts_end", "tag"])
    for c in ("ts_start", "ts_end"):
        ivs = ivs.withColumn(c, ivs[c].cast("timestamp"))
    out = sorted((r["event_id"], r["tag"]) for r in interval_join(
        pts, ivs, on="user", bucket_s=3600).collect())
    assert out == [(1, "a"), (2, "a"), (4, "b")]


def test_interval_join_overlaps_each_produce_a_row(spark):
    from opentelemetry_log_collection_spark.asof import interval_join

    pts = _ts(spark, [(1, "u", "2024-01-01 00:30:00")],
              ["event_id", "user", "ts"])
    ivs = spark.createDataFrame([
        ("u", "2024-01-01 00:00:00", "2024-01-01 01:00:00", "x"),
        ("u", "2024-01-01 00:15:00", "2024-01-01 00:45:00", "y"),
    ], ["user", "ts_start", "ts_end", "tag"])
    for c in ("ts_start", "ts_end"):
        ivs = ivs.withColumn(c, ivs[c].cast("timestamp"))
    # tiny bucket (60s): interval x spans 60 buckets, match still unique
    out = sorted(r["tag"] for r in interval_join(
        pts, ivs, on="user", bucket_s=60).collect())
    assert out == ["x", "y"]


def test_interval_join_huge_span_raises_clear_error(spark):
    """One corrupt far-future end timestamp must raise the documented
    interval_join error, not abort the job against Spark's
    array-length ceiling (max_buckets guard)."""
    from opentelemetry_log_collection_spark.asof import interval_join

    pts = _ts(spark, [(1, "u", "2024-01-01 00:30:00")],
              ["event_id", "user", "ts"])
    ivs = spark.createDataFrame([
        ("u", "2024-01-01 00:00:00", "2999-01-01 00:00:00", "bad"),
    ], ["user", "ts_start", "ts_end", "tag"])
    for c in ("ts_start", "ts_end"):
        ivs = ivs.withColumn(c, ivs[c].cast("timestamp"))
    import pytest
    from py4j.protocol import Py4JJavaError
    with pytest.raises(Exception, match="interval_join|USER_RAISED"):
        interval_join(pts, ivs, on="user", bucket_s=60,
                      max_buckets=1000).collect()
    # a legitimate span below the cap still joins
    ok = spark.createDataFrame([
        ("u", "2024-01-01 00:00:00", "2024-01-01 01:00:00", "ok"),
    ], ["user", "ts_start", "ts_end", "tag"])
    for c in ("ts_start", "ts_end"):
        ok = ok.withColumn(c, ok[c].cast("timestamp"))
    assert [r["tag"] for r in interval_join(
        pts, ok, on="user", bucket_s=60, max_buckets=1000).collect()] == ["ok"]
