"""Canonical entry schema over the transcript table.

The reference's dynamic Entry (entry/entry.go:25-37) becomes a fixed
columnar schema (SURVEY.md section 1.4). The graft input maps on as:
``text`` -> body (string), ``role``/``tool`` -> attributes,
``conv_id`` -> resource, ``ts`` -> Timestamp, ``turn_idx`` -> the
stable ordering key replacing the reference's implicit arrival order.

``observed_ts`` is stamped from an *injected* reference clock, never
wall-clock (entry/entry.go:40-44 uses time.Now(); determinism at
10^12 rows demands reproducible runs — SURVEY.md section 7.3).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .fields import MAP_SS

DEFAULT_OBSERVED_TS = "2024-06-01T00:00:00+00:00"

#: entry columns added on top of the transcript's native six
ENTRY_FIELDS: list[tuple[str, T.DataType]] = [
    ("body", MAP_SS),
    ("attributes", MAP_SS),
    ("resource", MAP_SS),
    ("observed_ts", T.TimestampType()),
    ("severity", T.IntegerType()),
    ("severity_text", T.StringType()),
    ("trace_id", T.BinaryType()),
    ("span_id", T.BinaryType()),
    ("trace_flags", T.BinaryType()),
    ("scope_name", T.StringType()),
]


def to_entries(df: DataFrame, observed_ts: str = DEFAULT_OBSERVED_TS) -> DataFrame:
    """Lift a transcript frame (conv_id, turn_idx, role, text, tool,
    ts) into the canonical entry frame. Pure projection — no shuffle,
    survives any scan pushdown."""
    obs = _dt.datetime.fromisoformat(observed_ts).replace(tzinfo=None)
    out = df
    existing = set(df.columns)
    for name, dtype in ENTRY_FIELDS:
        if name in existing:
            continue
        if name == "attributes":
            col = F.create_map(
                F.lit("role"), F.coalesce(F.col("role"), F.lit("")),
                F.lit("tool"), F.coalesce(F.col("tool"), F.lit("")),
            ).cast(MAP_SS)
        elif name == "resource":
            col = F.create_map(
                F.lit("conv_id"), F.col("conv_id").cast(T.StringType())
            ).cast(MAP_SS)
        elif name == "observed_ts":
            col = F.lit(obs).cast(T.TimestampType())
        elif name == "severity":
            col = F.lit(0).cast(T.IntegerType())
        else:
            col = F.lit(None).cast(dtype)
        out = out.withColumn(name, col)
    return out
