"""As-of (backward temporal) join — attach to every left row the most
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
    r = right
    if dedup_right:
        r = r.groupBy(on, ts).agg(
            *[F.max(c).alias(c) for c in value_cols]
        )
    payload = F.struct(
        F.col(ts).alias(f"{prefix}{ts}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
    )
    r2 = r.select(
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
    w = (
        Window.partitionBy(on)
        .orderBy(ts, "_side")
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
