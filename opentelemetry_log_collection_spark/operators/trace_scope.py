"""trace_parser + scope_name_parser.

trace: hex-decode trace_id/span_id/trace_flags fields onto the entry
top level (operator/parser/trace/trace.go:30-71, helper
operator/helper/trace.go:89-129). ``unhex`` returns null for invalid
hex, mirroring Go's hex.DecodeString error path.

scope_name: copy a string field to ScopeName
(operator/parser/scope/scope_name.go:29-67).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..fields import Field
from ..pipeline import ColumnStage, register


class TraceParser:
    def __init__(
        self,
        trace_id: dict | None = None,
        span_id: dict | None = None,
        trace_flags: dict | None = None,
    ):
        # defaults per helper/trace.go:62-85
        self.trace_id = Field.parse((trace_id or {}).get("parse_from", "body.trace_id"))
        self.span_id = Field.parse((span_id or {}).get("parse_from", "body.span_id"))
        self.trace_flags = Field.parse(
            (trace_flags or {}).get("parse_from", "body.trace_flags")
        )

    def embed_apply(self, df: DataFrame, cond: Column) -> tuple[DataFrame, Column]:
        err = F.lit(False)
        for field, col_name in (
            (self.trace_id, "trace_id"),
            (self.span_id, "span_id"),
            (self.trace_flags, "trace_flags"),
        ):
            src = field.get().cast(T.StringType())
            decoded = F.unhex(src)
            ok = cond & decoded.isNotNull()
            df = df.withColumn(
                col_name, F.when(ok, decoded).otherwise(F.col(col_name))
            )
            err = err | (src.isNotNull() & decoded.isNull())
        return df, err


@register("trace_parser")
class TraceParserStage(ColumnStage):
    def __init__(self, trace_id=None, span_id=None, trace_flags=None, **kw):
        super().__init__(**kw)
        self.parser = TraceParser(trace_id, span_id, trace_flags)

    def transform(self, df: DataFrame, cond: Column):
        return self.parser.embed_apply(df, cond)


class ScopeNameParser:
    def __init__(self, parse_from: str):
        self.parse_from = Field.parse(parse_from)

    def embed_apply(self, df: DataFrame, cond: Column) -> tuple[DataFrame, Column]:
        src = self.parse_from.get().cast(T.StringType())
        err = src.isNull()
        df = df.withColumn(
            "scope_name",
            F.when(cond & src.isNotNull(), src).otherwise(F.col("scope_name")),
        )
        return df, err


@register("scope_name_parser")
class ScopeNameParserStage(ColumnStage):
    def __init__(self, parse_from: str = "body", **kw):
        super().__init__(**kw)
        self.parser = ScopeNameParser(parse_from)

    def transform(self, df: DataFrame, cond: Column):
        return self.parser.embed_apply(df, cond)
