"""Input / output operators (SURVEY.md sections 2.2-2.3).

The reference's connector zoo (file/tcp/udp/journald/k8s/windows
inputs) collapses into table scans here — the engine's source of truth
is the transcript table (transcripts.py). What remains meaningful:

  - generate_input: the reference's synthetic source
    (operator/input/generate/generate.go:50-110) ≙ ``spark.range`` +
    literal columns; our deterministic fixture generator.
  - stdin-style literal input for tests.
  - sinks: stdout (NDJSON debug), file (parquet/json dataset writes ≙
    operator/output/file/file.go:36-130), drop
    (operator/output/drop/drop.go:40-63).

Every input can stamp ``attributes:``/``resource:`` template maps at
creation (operator/helper/input.go:76-95) — mirrored by
``stamp_attributes``/``stamp_resource``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..entry import ENTRY_FIELDS, to_entries
from ..exprs import compile_template
from ..fields import Field, apply_updates
from ..pipeline import Stage, register


def stamp(df: DataFrame, attributes: dict | None, resource: dict | None) -> DataFrame:
    """Stamp EXPR()-template attribute/resource maps at scan time
    (operator/helper/attributer.go:57-74, identifier.go:57-74)."""
    for root, mapping in (("attributes", attributes), ("resource", resource)):
        if not mapping:
            continue
        entries = []
        for k, v in mapping.items():
            entries.append(F.lit(str(k)))
            entries.append(compile_template(str(v)))
        updates = Field.parse(root).set_map(F.create_map(*entries))
        df = apply_updates(df, updates)
    return df


@register("generate_input")
class GenerateInputStage(Stage):
    """Emit a configured static entry N times
    (operator/input/generate/generate.go:50-110)."""

    type_name = "generate_input"

    def __init__(self, entry: dict | None = None, count: int = 1, **kw):
        super().__init__(**kw)
        self.entry = entry or {}
        self.count = int(count)

    def generate(self, spark: SparkSession) -> DataFrame:
        body = self.entry.get("body", "")
        attrs = self.entry.get("attributes") or {}
        res = self.entry.get("resource") or {}
        df = spark.range(self.count).select(
            F.lit("gen").alias("conv_id"),
            F.col("id").cast(T.IntegerType()).alias("turn_idx"),
            F.lit("").alias("role"),
            F.lit(str(body)).alias("text"),
            F.lit("").alias("tool"),
            F.lit(None).cast(T.TimestampType()).alias("ts"),
        )
        df = to_entries(df)
        return stamp(df, attrs, res)

    def apply(self, df: DataFrame) -> DataFrame:  # source: passthrough
        return df


@register("stdin")
class StdinInputStage(Stage):
    """Line-per-entry local input (operator/input/stdin/stdin.go:43-117)
    ≙ ``spark.createDataFrame`` of driver-read lines — a test/dev path,
    never a cluster-scale source."""

    type_name = "stdin"

    def __init__(self, lines: list[str] | None = None, **kw):
        super().__init__(**kw)
        self.lines = lines

    def generate(self, spark: SparkSession, lines: list[str] | None = None) -> DataFrame:
        import sys

        data = lines if lines is not None else self.lines
        if data is None:
            data = [ln.rstrip("\n") for ln in sys.stdin]
        df = spark.createDataFrame(
            [("stdin", i, "", t, "", None) for i, t in enumerate(data)],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
        return to_entries(df)

    def apply(self, df: DataFrame) -> DataFrame:  # source: passthrough
        return df


class Sink(Stage):
    @property
    def is_sink(self) -> bool:
        return True

    def apply(self, df: DataFrame) -> DataFrame:
        return df

    def write(self, df: DataFrame, base_dir: str) -> None:
        raise NotImplementedError


@register("stdout")
class StdoutSink(Sink):
    """NDJSON to stdout (operator/output/stdout/stdout.go:31-81) —
    debug only; truncated to avoid driver floods."""

    type_name = "stdout"

    def __init__(self, limit: int = 20, **kw):
        super().__init__(**kw)
        self.limit = limit

    def write(self, df: DataFrame, base_dir: str) -> None:
        for row in df.limit(self.limit).toJSON().collect():
            print(row)


@register("file_output")
class FileSink(Sink):
    """Dataset write (operator/output/file/file.go:36-130 writes
    NDJSON lines; a distributed engine writes a parquet dataset —
    format: json gives byte-parity when needed)."""

    type_name = "file_output"

    def __init__(self, path: str | None = None, format: str = "parquet",
                 sort_within_partitions: bool = True, **kw):
        super().__init__(**kw)
        self.path = path
        self.format = format
        self.sort_within_partitions = sort_within_partitions

    def write(self, df: DataFrame, base_dir: str) -> None:
        path = self.path or f"{base_dir}/{self.id}"
        out = df
        if self.sort_within_partitions and {"conv_id", "turn_idx"} <= set(df.columns):
            # deterministic file contents for fixture equality
            out = df.sortWithinPartitions("conv_id", "turn_idx")
        writer = out.write.mode("overwrite")
        if self.format == "json":
            # maps serialize fine as JSON; binary columns are base64
            writer.json(path)
        else:
            writer.parquet(path)


@register("drop_output")
@register("drop")
class DropSink(Sink):
    """Swallow entries (operator/output/drop/drop.go:40-63)."""

    type_name = "drop"

    def write(self, df: DataFrame, base_dir: str) -> None:
        return None
