"""Gap-based sessionization (sessions.py): window semantics + the
single-shuffle plan shape."""
from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from opentelemetry_log_collection_spark import sessions


def _ev(uid, eid, s):
    return (eid, datetime(2024, 1, 1, 0, 0, s), uid)


def test_sessionize_gap_semantics(spark):
    df = spark.createDataFrame(
        [
            _ev(1, 0, 0), _ev(1, 1, 10), _ev(1, 2, 41),  # 31s gap splits
            _ev(2, 3, 5),                                  # own user
        ],
        ["event_id", "ts", "user_id"],
    )
    out = sessions.sessionize(df, gap_s=30).orderBy("event_id").collect()
    assert [r["session_idx"] for r in out] == [1, 1, 2, 1]


def test_sessionize_boundary_is_exclusive(spark):
    """A gap of exactly gap_s keeps the session open (> closes)."""
    df = spark.createDataFrame(
        [_ev(1, 0, 0), _ev(1, 1, 30)], ["event_id", "ts", "user_id"])
    out = sessions.sessionize(df, gap_s=30).collect()
    assert {r["session_idx"] for r in out} == {1}


def test_sessionize_ties_break_on_order_col(spark):
    ts = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(5, ts, 1), (2, ts, 1)], ["event_id", "ts", "user_id"])
    out = sessions.sessionize(df, gap_s=1).orderBy("event_id").collect()
    assert [r["session_idx"] for r in out] == [1, 1]


def test_session_stats_rollup_and_plan(spark):
    df = spark.createDataFrame(
        [_ev(1, 0, 0), _ev(1, 1, 10), _ev(1, 2, 50), _ev(2, 3, 7)],
        ["event_id", "ts", "user_id"],
    )
    out = {(r["user_id"], r["session_idx"]): r
           for r in sessions.session_stats(df, gap_s=30).collect()}
    assert out[(1, 1)]["n_events"] == 2
    assert out[(1, 1)]["duration_us"] == 10_000_000
    assert out[(1, 2)]["n_events"] == 1 and out[(1, 2)]["duration_us"] == 0
    assert out[(2, 1)]["n_events"] == 1
    # ONE shuffle: window + rollup share the user partitioning
    plan = sessions.session_stats(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_windowed_rates_buckets_epoch_aligned(spark):
    from datetime import datetime

    df = spark.createDataFrame(
        [
            (0, datetime(2024, 1, 1, 0, 10), 1, "click", 2.0),
            (1, datetime(2024, 1, 1, 0, 50), 1, "click", 3.0),
            (2, datetime(2024, 1, 1, 1, 5), 1, "click", 5.0),
            (3, datetime(2024, 1, 1, 0, 20), 2, "view", 1.0),
        ],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )
    out = {(r["w_start_us"], r["event_type"]): r
           for r in sessions.windowed_rates(df).collect()}
    h0 = 1704067200 * 1_000_000  # 2024-01-01T00Z epoch us
    assert out[(h0, "click")]["n_events"] == 2
    assert out[(h0, "click")]["value_sum"] == 5.0
    assert out[(h0 + 3600_000_000, "click")]["n_events"] == 1
    assert out[(h0, "view")]["n_events"] == 1


def test_top_k_per_group_ties_and_limit(spark):
    from opentelemetry_log_collection_spark.sessions import top_k_per_group

    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, 9.0), ("a", 4, 1.0),
         ("b", 5, 2.0)],
        ["grp", "id", "v"],
    )
    out = [(r["grp"], r["rk"], r["id"]) for r in top_k_per_group(
        df, key_col="grp", order_col="v", tie_col="id", k=2
    ).orderBy("grp", "rk").collect()]
    # value desc, tie broken by id asc: 9.0 first, then the 5.0 with
    # the smaller id; row 4 cut by k=2; group b keeps its only row
    assert out == [("a", 1, 3), ("a", 2, 1), ("b", 1, 5)]
