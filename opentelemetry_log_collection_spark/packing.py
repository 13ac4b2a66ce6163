"""Sequence packing for pretraining batches: concat-and-chunk.

The standard packing used by large-scale LM training pipelines:
documents are concatenated in a deterministic order (doc_id) and the
token stream is cut into fixed-size context windows; a document's
tokens land in chunks [first_chunk, last_chunk]. Computing that is a
GLOBAL prefix sum over token counts — the naive
``Window.orderBy(doc_id)`` with no partition drags the whole corpus
through one task, so this uses the same two-phase prefix sum as
recombine's default-bucket tagging (operators/recombine.py:159-234):

  1. range-partition by doc_id — spark_partition_id is then monotonic
     in the global order, each partition a contiguous doc_id slice;
  2. per-slice local running sums (parallel, bounded by slice size);
  3. a P-row totals frame (one row per partition) is cumulated on the
     driver-sized side and broadcast back: global = local + offset.

One materialization (persist) feeds both the totals aggregate and the
row side, so every consumer sees the same range boundaries. At 10^9
documents the totals frame is still just P rows — the only
single-task window in the plan is over those P rows.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def whitespace_tokens(text: Column) -> Column:
    """The engine's whitespace token count (same convention as
    textops/dedup: lower+trim+split on runs of whitespace)."""
    return F.size(F.split(F.lower(F.trim(text)), r"\s+"))


def pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count: Column | None = None,
) -> DataFrame:
    """Assign each document its slice of the packed token stream.

    Returns (id_col, n_tokens, token_offset, first_chunk, last_chunk,
    n_chunks): token_offset is the document's global start position in
    the concatenated stream, chunks are the ``budget``-token windows
    it overlaps (a doc spanning a boundary is split across chunks —
    concat-and-chunk semantics, no padding waste).
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    n_tok = (
        token_count if token_count is not None else whitespace_tokens(F.col(text_col))
    ).cast("bigint")
    d = (
        docs.select(F.col(id_col), n_tok.alias("n_tokens"))
        .repartitionByRange(F.col(id_col))
        .withColumn("_bkt", F.spark_partition_id())
    )
    wloc = Window.partitionBy("_bkt").orderBy(id_col)
    lcum = F.coalesce(
        F.sum("n_tokens").over(wloc.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("bigint"),
    )
    d = d.withColumn("_lcum", lcum)
    # one materialization: totals and the row side must agree on the
    # (sampled, order-sensitive) range-partition boundaries
    d = d.persist(StorageLevel.MEMORY_AND_DISK)
    totals = d.groupBy("_bkt").agg(F.sum("n_tokens").alias("_t"))
    wtot = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_bkt",
        F.coalesce(F.sum("_t").over(wtot), F.lit(0).cast("bigint")).alias(
            "_off"
        ),
    )
    d = d.join(F.broadcast(offsets), "_bkt")
    off = (F.col("_off") + F.col("_lcum")).alias("token_offset")
    first = F.floor(F.col("token_offset") / budget).alias("first_chunk")
    last = F.floor(
        (F.col("token_offset") + F.col("n_tokens") - 1) / budget
    ).alias("last_chunk")
    out = d.select(id_col, "n_tokens", off).select(
        id_col, "n_tokens", "token_offset", first, last
    )
    return out.withColumn(
        "n_chunks",
        F.when(F.col("n_tokens") > 0, F.col("last_chunk") - F.col("first_chunk") + 1)
        .otherwise(F.lit(0))
        .cast("bigint"),
    )
