"""A/B bench for the MinHash LSH band-join key at the PRODUCTION
config (128 seeds / 16 bands of 8), isolating the band join from the
signature computation.

Corpus: documents.parquet replicated R times (default 100 -> 500k
docs). 90% of replicas get every word salted with a replica-unique
token (all shingles change -> no cross-replica collisions); 10% stay
verbatim (real duplicate clusters, so buckets and the verify join do
real work). The 128-seed signature is computed ONCE and written to
parquet; both key variants then read the SAME signature table, so the
timed delta is purely the band-key representation:

  old: band_key = concat_ws(',', mh_b*8 .. mh_b*8+7)  -- 8 md5 hex
       strings, ~264 bytes, plus a separate band column in the join
  new: band_key = xxhash64(band, mh...)               -- one BIGINT

Also times the 128-seed SIGNATURE itself under both hash families
(md5 hex strings vs xxhash64 longs) — the dominant cost at production
config, and the reason MINHASH_HASH defaults to xxhash64.

Usage: python tools/minhash_band_bench.py [replication] [reps] [families]
(families: comma list of md5,xxhash64 — md5 is ~15x slower, skip it
for large replications). Prints one JSON line with per-variant walls
+ shuffle-width estimate.
"""

from __future__ import annotations

import json
import statistics
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from opentelemetry_log_collection_spark.dedup import (  # noqa: E402
    MINHASH_SEEDS,
    BAND_SIZE,
    lsh_candidate_pairs,
    minhash_signature,
)
from opentelemetry_log_collection_spark.session import get_spark  # noqa: E402


def old_pairs(sig, seeds: int = MINHASH_SEEDS, band_size: int = BAND_SIZE):
    """The round-3 band key: concatenated md5 hex strings + band col."""
    n_bands = seeds // band_size
    bands = []
    for b in range(n_bands):
        key = F.concat_ws(
            ",", *[F.col(f"mh{b * band_size + r}") for r in range(band_size)]
        )
        bands.append(
            sig.select(
                F.col("doc_id"), F.lit(b).alias("band"), key.alias("band_key")
            )
        )
    banded = bands[0]
    for extra in bands[1:]:
        banded = banded.unionByName(extra)
    a, b_ = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def main() -> None:
    repl = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("local[32]", shuffle_partitions=32, app_name="mh_bench")

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    r = spark.range(repl).withColumnRenamed("id", "r")
    corpus = (
        docs.crossJoin(r)
        .select(
            (F.col("doc_id") * repl + F.col("r")).alias("doc_id"),
            F.when(
                F.col("r") % 10 == 0, F.col("text")  # verbatim dup cluster
            )
            .otherwise(
                F.regexp_replace(
                    F.col("text"), r"(\S+)", F.concat(F.lit("s"), F.col("r"), F.lit("$1"))
                )
            )
            .alias("text"),
        )
    )
    n_docs = corpus.count()

    families = (
        sys.argv[3].split(",") if len(sys.argv) > 3 else ["md5", "xxhash64"]
    )
    sig_secs: dict[str, float] = {}
    sig_dirs: dict[str, str] = {}
    for hash_fn in families:
        d = tempfile.mkdtemp(prefix=f"mh_sig_{hash_fn}_")
        t0 = time.time()
        minhash_signature(corpus, hash_fn=hash_fn).write.mode(
            "overwrite"
        ).parquet(d)
        sig_secs[hash_fn] = round(time.time() - t0, 2)
        sig_dirs[hash_fn] = d

    out: dict = {
        "n_docs": n_docs,
        "seeds": MINHASH_SEEDS,
        "band_size": BAND_SIZE,
        "signature_sec": sig_secs,
        "band_rows": n_docs * (MINHASH_SEEDS // BAND_SIZE),
        "key_bytes_old": 33 * BAND_SIZE,  # md5 hex + separators
        "key_bytes_new": 8,
    }
    # each variant reads its OWN production signature: old keys over
    # the md5 hex-string signature (the exact r3 plan), new keys over
    # the xxhash64 long signature (the exact r4 plan)
    variants = []
    if "md5" in sig_dirs:
        variants.append(("old_concat_md5", old_pairs, sig_dirs["md5"]))
    if "xxhash64" in sig_dirs:
        variants.append(
            ("new_xxhash64", lsh_candidate_pairs, sig_dirs["xxhash64"])
        )
    for name, fn, d in variants:
        sig = spark.read.parquet(d)
        walls = []
        n_pairs = None
        for _ in range(reps):
            t0 = time.time()
            n_pairs = fn(sig).count()
            walls.append(round(time.time() - t0, 2))
        out[name] = {
            "walls": walls,
            "median": round(statistics.median(walls), 2),
            "min": min(walls),
            "n_pairs": n_pairs,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
