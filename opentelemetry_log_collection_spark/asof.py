"""Temporal joins: as-of (backward) join and bucketed range join.

As-of join — attach to every left row the most
recent right row with ``r.ts <= l.ts`` per key. The classic point-in-
time enrichment (quotes->trades, config->events, deploy->errors) that
Spark has no built-in operator for; the reference has no joins at all
(SURVEY.md §2.6), so this is an engine addition from the brief's
custom-operator list.

Spark-first shape — the union + null-ignoring window trick, NOT a
join:

  - the right rows are tagged side=0, the left side=1, both projected
    to a common (key, ts, side, right-payload, left-payload) schema
    and unioned (pipeline-local, no shuffle);
  - ONE shuffle partitions by key; within each key, rows sort by
    (ts, side) so a right row at ts==t sorts BEFORE left rows at t
    (that ordering IS the <= semantics);
  - ``last(right_payload, ignorenulls=True)`` over
    rowsBetween(unboundedPreceding, currentRow) carries the latest
    right payload forward onto every left row; left rows contribute
    null payloads so ties among them cannot disturb the result.

Contrast with the naive theta-join
``l.join(r, (l.key==r.key) & (r.ts<=l.ts))`` + max-window: that
materializes |L_k| x |R_k| rows per key before pruning — quadratic in
the key's history and a guaranteed skew bomb at 100 TB. The union
form moves each row exactly once and does linear per-key work.

Determinism: callers must make the right side unique per (key, ts)
(`dedup_right=True` keeps the lexicographically greatest payload) —
otherwise "the" most recent right row is ill-defined and any engine
(including DuckDB's native ASOF JOIN, the oracle) may pick either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    value_cols: tuple[str, ...] = (),
    prefix: str = "r_",
    dedup_right: bool = True,
) -> DataFrame:
    """For every left row, attach ``value_cols`` of the most recent
    right row with ``right.ts <= left.ts`` and the same ``on`` key,
    plus ``<prefix>ts`` (the matched right timestamp; all null when no
    right row precedes the left row — left rows are never dropped).

    Equivalent SQL: ``FROM left ASOF LEFT JOIN right ON left.on =
    right.on AND right.ts <= left.ts`` (DuckDB dialect)."""
    value_cols = tuple(value_cols) or tuple(
        c for c in right.columns if c not in (on, ts)
    )
    payload = F.struct(
        F.col(ts).alias(f"{prefix}{ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
    )
    r2 = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_side"),
        payload.alias("_rv"),
    )
    left_cols = [c for c in left.columns]
    l2 = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r2.schema["_rv"].dataType).alias("_rv"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    )
    merged = r2.select(
        *r2.columns,
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
            for c in left_cols
        ],
    ).unionByName(l2)
    # dedup_right needs no extra exchange: ordering same-(key, ts)
    # right rows by their payload struct makes last() pick the
    # lexicographically greatest one (left rows carry null payloads
    # and sort after right rows at equal ts via _side, so the tie
    # order among them is irrelevant)
    order = [F.col(ts), F.col("_side")] + (
        [F.col("_rv")] if dedup_right else []
    )
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "_m", F.last("_rv", ignorenulls=True).over(w)
    ).filter(F.col("_side") == 1)
    return carried.select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        F.col(f"_m.{prefix}{ts}").alias(f"{prefix}{ts}"),
        *[F.col(f"_m.{prefix}{c}").alias(f"{prefix}{c}") for c in value_cols],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str = "ts",
    start: str = "ts_start",
    end: str = "ts_end",
    bucket_s: int = 3600,
    max_buckets: int = 1_000_000,
) -> DataFrame:
    """Range join: one output row per (point, interval) pair with the
    same ``on`` key and ``start <= point.ts < end`` (end-exclusive).
    Points matching no interval are dropped (inner semantics);
    overlapping intervals each produce a row.

    Spark-first shape — the bucketed range join (what a plain
    ``p.join(i, (key) & (ts >= start) & (ts < end))`` is NOT: Catalyst
    executes that as an equi-join on the key with the range as a
    post-filter, so one hot key's |P_k| x |I_k| pairs materialize
    before filtering): time is cut into fixed ``bucket_s`` buckets,
    each interval explodes to the buckets it covers (pipeline-local),
    each point maps to exactly ONE bucket, and the join runs as a pure
    equi-join on (key, bucket) with the exact range as a residual.
    Because a point lives in a single bucket, every true pair appears
    exactly once — no dedup pass. Per-bucket work is |P_b| x |I_b|,
    bounded by the bucket width instead of the key's full history.

    Pick ``bucket_s`` near the typical interval length: shorter
    buckets shrink join fan-in but replicate long intervals across
    more buckets (an interval spanning B buckets ships B rows of its
    (key, start, end, payload) — payloads never duplicate per point).
    Degenerate intervals (end <= start) match nothing and emit no
    bucket rows; an interval spanning more than ``max_buckets``
    buckets (a corrupt far-future end timestamp, say) raises a clear
    error from the expression instead of letting ``sequence`` abort
    the whole job against Spark's array-length ceiling — widen
    ``bucket_s`` or raise ``max_buckets`` for legitimately huge
    spans."""
    w_us = int(bucket_s) * 1_000_000

    def us(col: str):
        return F.unix_micros(F.col(col).cast("timestamp_ltz"))

    pts = points.withColumn("_b", F.floor(us(ts) / w_us))
    b_lo = F.floor(us(start) / w_us)
    b_hi = F.floor((us(end) - 1) / w_us)
    guarded_hi = F.when(
        b_hi - b_lo < F.lit(int(max_buckets)), b_hi
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval_join: interval spans more than {max_buckets}"
                    f" buckets of {bucket_s}s (ts_start="
                ),
                F.col(start).cast("string"),
                F.lit(", ts_end="),
                F.col(end).cast("string"),
                F.lit("); widen bucket_s or raise max_buckets"),
            )
        ).cast("bigint")
    )
    ivs = (
        intervals.withColumn(
            "_bs",
            F.when(
                us(end) > us(start),
                F.sequence(b_lo, guarded_hi),
            ),
        )
        .withColumn("_b", F.explode("_bs"))
        .drop("_bs")
    )
    return (
        pts.join(ivs, [on, "_b"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("_b")
    )
