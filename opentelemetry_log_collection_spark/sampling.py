"""Training-corpus curation ops: deterministic stratified sampling and
benchmark decontamination.

No reference counterpart (the reference is a log collector); these are
the corpus-side operations a 100 TB training-data pipeline runs after
ingest, built to the same standard as dedup.py/similarity.py: Spark
builtins only, candidate generation bucketed, nothing collected.

Scale shapes:
  - stratified_sample: a pure codegen FILTER — md5(seed|key) compared
    against a per-stratum hex threshold. Zero shuffle, zero RNG state,
    reproducible under retries/re-partitioning (Bernoulli `sample()`
    is neither), and Parquet row-group statistics can skip nothing
    here but the filter itself pipelines into any downstream op. The
    per-stratum rate map compiles to one literal create_map probe.
  - decontaminate: documents sharing an n-gram with a benchmark set.
    Gram sets explode pipeline-locally (dedup.shingles); the join key
    is xxhash64(gram) — an 8-byte shuffle key with a string-equality
    guard, so hash collisions cannot create false positives. The
    benchmark side is DISTINCT gram hashes, broadcast when small
    (the common case: eval sets are tiny next to the corpus); set
    ``broadcast_bench=False`` to fall back to a shuffle join when the
    "benchmark" is itself huge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles

#: md5-prefix width: 8 hex chars = 32-bit granularity, plenty for any
#: realistic sampling rate while keeping the comparison a short string
_HEX_DIGITS = 8
_HEX_SPACE = 16 ** _HEX_DIGITS


def _threshold_hex(rate: float) -> str:
    """rate in [0,1] -> lowercase hex threshold on the md5 prefix.
    rate 1.0 must keep EVERY row, including the ~2^-32 of rows whose
    prefix is exactly 'ffffffff' — 'g' sorts above every hex digit, so
    the strict '<' comparison passes all of them."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(int(rate * _HEX_SPACE), f"0{_HEX_DIGITS}x")


def sample_hash(key: Column, seed: int) -> Column:
    """The sampling coordinate of a row: the first 8 hex chars of
    md5(seed|key). Uniform on [0, 2^32), deterministic across runs,
    partitionings, and engines (md5 is md5 everywhere — the DuckDB
    oracle computes the identical string)."""
    return F.substring(
        F.md5(F.concat_ws("|", F.lit(str(seed)), key.cast("string"))),
        1,
        _HEX_DIGITS,
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff its hash coordinate falls under its stratum's
    threshold. A stratum absent from ``rates`` uses ``default_rate``
    (0.0 = drop unknown strata, the usual curation default)."""
    entries: list[Column] = []
    for stratum, rate in rates.items():
        entries.append(F.lit(stratum))
        entries.append(F.lit(_threshold_hex(rate)))
    thresholds = F.create_map(*entries) if entries else None
    thr = (
        F.coalesce(
            F.try_element_at(thresholds, F.col(strata_col)),
            F.lit(_threshold_hex(default_rate)),
        )
        if thresholds is not None
        else F.lit(_threshold_hex(default_rate))
    )
    return df.filter(sample_hash(F.col(key_col), seed) < thr)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Flag corpus documents sharing at least one n-gram with the
    benchmark set. Returns (doc_id, n_shared) — the count of DISTINCT
    benchmark grams the document contains; docs with zero overlap are
    absent (the caller anti-joins to keep the clean corpus).

    The join runs on xxhash64(gram) with the gram string re-checked in
    the join condition: the 8-byte key does the shuffling/broadcast
    work, the guard keeps exactness."""
    corpus_grams = shingles(docs, text_col, n=n).withColumn(
        "gh", F.xxhash64("shingle")
    )
    bench_grams = (
        shingles(benchmark, text_col, n=n)
        .select(F.col("shingle").alias("bgram"))
        .distinct()
        .withColumn("bgh", F.xxhash64("bgram"))
    )
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    hits = corpus_grams.join(
        bench_grams,
        (F.col("gh") == F.col("bgh")) & (F.col("shingle") == F.col("bgram")),
        "inner",
    )
    return hits.groupBy("doc_id").agg(
        F.count_distinct(F.col("shingle")).alias("n_shared")
    )
