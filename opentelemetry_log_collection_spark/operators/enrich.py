"""lookup_enrich — broadcast-hash-join enrichment.

The north rule adds a *lookup enrich* stage with no reference
counterpart (the reference never consumes two streams —
operator/operator.go:53 takes a single entry; SURVEY.md section 2.6).
Spark-first: a dimension table small enough to describe routes/tools/
roles is broadcast to every executor, so enrichment is a map-side hash
probe with ZERO shuffle of the (huge) fact side — the only sane plan
at 10^12 turns.

The joined dimension columns are merged into ``attributes`` with the
engine's standard merge-overwrite semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..fields import Field, apply_updates
from ..pipeline import Stage, register


@register("lookup_enrich")
class LookupEnrichStage(Stage):
    type_name = "lookup_enrich"

    def __init__(
        self,
        lookup: "DataFrame | None" = None,
        on: str = "",
        key_column: str | None = None,
        prefix: str = "",
        target: str = "attributes",
        **kw,
    ):
        super().__init__(**kw)
        if lookup is None:
            raise ValueError("lookup_enrich requires a lookup DataFrame")
        self.lookup = lookup
        self.on = Field.parse(on)  # field on the entry side
        self.key_column = key_column or self.lookup.columns[0]
        self.prefix = prefix
        self.target = Field.parse(target)

    def apply(self, df: DataFrame) -> DataFrame:
        dim_cols = [c for c in self.lookup.columns if c != self.key_column]
        dim = self.lookup.select(
            F.col(self.key_column).cast(T.StringType()).alias("_enrich_key"),
            *[F.col(c).cast(T.StringType()).alias(c) for c in dim_cols],
        )
        key = self.on.get().cast(T.StringType())
        joined = df.withColumn("_enrich_key", key).join(
            F.broadcast(dim), on="_enrich_key", how="left"
        )
        entries: list[Column] = []
        for c in dim_cols:
            entries.append(F.lit(self.prefix + c))
            entries.append(F.col(c))
        # only stamp when the probe hit (left-join miss -> no-op merge)
        hit = F.lit(False)
        for c in dim_cols:
            hit = hit | F.col(c).isNotNull()
        val = F.when(hit, F.map_filter(F.create_map(*entries), lambda _k, v: v.isNotNull()))
        out = apply_updates(joined, self.target.set_map(val))
        return out.drop("_enrich_key", *dim_cols)
