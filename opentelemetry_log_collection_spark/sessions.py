"""Gap-based sessionization — the classic log-analytics rollup the
reference's downstream consumers run on collected events (the
reference itself stops at transport; SURVEY.md §2.6 "conventional
engine categories" covers windowed aggregation).

100 TB shape: ONE shuffle, partitioned by the actor key. The lag +
running-sum window and the per-session aggregation share the same
partitioning (user_id), so Catalyst plans a single Exchange and the
groupBy rides it map-side. Skew note: a single pathological actor
(one bot = millions of events) serializes its own partition — the
window is order-dependent per actor, so salting cannot apply; cap or
pre-filter such actors upstream if profiles show them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: default inactivity gap that closes a session
DEFAULT_GAP_S = 1800


def _us(ts_col: str):
    # microsecond epoch: gap arithmetic at full timestamp precision
    # (unix_timestamp truncates to seconds and would mis-split
    # sessions whose gap straddles a second boundary)
    return F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_s: int = DEFAULT_GAP_S,
) -> DataFrame:
    """Assign every event a per-user session index: a session closes
    after ``gap_s`` seconds of inactivity. ``order_col`` breaks
    timestamp ties deterministically (hash-equal output on reruns).
    Adds ``session_idx`` (1-based per user) to the input frame."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    prev = F.lag(_us(ts_col)).over(w)
    new_session = (
        prev.isNull() | (_us(ts_col) - prev > gap_s * 1_000_000)
    ).cast("int")
    return df.withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def windowed_rates(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_s: int = 3600,
    value_col: str = "value",
) -> DataFrame:
    """Tumbling-window rate rollup: per (window, key) event count and
    value sum — the volumetric dashboard query over collected logs.
    ``F.window`` is Catalyst-native (epoch-aligned bucketing, ONE
    partial-agg shuffle on (window, key)) and is the same expression a
    streaming plan uses under a watermark, so batch and streaming
    rollups share semantics."""
    w = F.window(F.col(ts_col), f"{window_s} seconds")
    return (
        df.groupBy(w.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("value_sum"),
        )
        .select(
            F.unix_micros(F.col("w.start").cast("timestamp_ltz")).alias(
                "w_start_us"
            ),
            key_col,
            "n_events",
            "value_sum",
        )
    )


def top_k_per_group(
    df: DataFrame,
    key_col: str,
    order_col: str,
    tie_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-k rows per group by ``order_col`` DESC (``tie_col`` ASC
    breaks ties deterministically), with a 1-based ``rk`` column.

    100 TB shape: expressed as the idiomatic row_number window so
    Catalyst's WindowGroupLimit rule (Spark >= 3.5) plans it as a
    per-partition group-limit BEFORE the exchange — each map task
    forwards at most k rows per group, so the shuffle carries
    O(partitions x groups x k), not the full table, and no group is
    ever fully sorted in one place. (Verified in the physical plan:
    two WindowGroupLimit nodes, Partial below the exchange, Final
    above.)"""
    w = Window.partitionBy(key_col).orderBy(
        F.col(order_col).desc(), F.col(tie_col).asc()
    )
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_s: int = DEFAULT_GAP_S,
) -> DataFrame:
    """Per-session rollup: event count, start/end, exact microsecond
    duration. Shares sessionize's partitioning, so the aggregation
    adds no second shuffle."""
    s = sessionize(df, user_col, ts_col, order_col, gap_s)
    return s.groupBy(user_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("t_start"),
        F.max(ts_col).alias("t_end"),
        (F.max(_us(ts_col)) - F.min(_us(ts_col))).alias("duration_us"),
    )
