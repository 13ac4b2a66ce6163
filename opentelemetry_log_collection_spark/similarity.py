"""Similarity search over an embedding column (array<float>).

Two plans, per the standard ANN playbook:

  - brute_force_topk: the exactness baseline. The (small) query set
    broadcasts; scoring is a map-side nested loop with the cosine
    computed by builtin higher-order functions (zip_with + aggregate,
    left-fold => deterministic summation order), then ONE window
    per-query top-k. Cost: |corpus| x |queries| partial products, no
    corpus shuffle — right up to a few thousand queries.

  - lsh_topk: the scale path. Random-hyperplane (sign) LSH buckets
    both sides; candidates = bucket collisions (shuffle of (bucket,
    id) pairs only); exact cosine re-rank within candidates. Recall
    is tunable via n_planes/n_tables. Hyperplanes are derived
    deterministically from a seed (md5 stream), never RNG state.

All math is done in DOUBLE after an explicit cast from float32 —
identical left-to-right IEEE ops in any engine, so oracle checks can
reproduce scores bit-for-bit.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _dvec(c: Column) -> Column:
    return c.cast(T.ArrayType(T.DoubleType()))


def dot(a: Column, b: Column) -> Column:
    """Left-fold sum of elementwise products — deterministic order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, neighbor_id, sim): exact top-k by cosine.
    Queries broadcast; ties broken by neighbor_id for determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _dvec(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _dvec(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


# --------------------------------------------------------------------
# random-hyperplane LSH
# --------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes from an md5 counter
    stream (no RNG state: same planes on every executor, run, engine)."""
    planes: list[list[float]] = []
    for p in range(n_planes):
        row: list[float] = []
        i = 0
        while len(row) < dim:
            h = hashlib.md5(f"{seed}:{p}:{i}".encode()).digest()
            for off in range(0, 16, 4):
                (u,) = struct.unpack_from("<I", h, off)
                # map uniform u to a symmetric triangular-ish value;
                # sign-LSH only needs symmetry around 0
                row.append((u / 2**31) - 1.0)
                if len(row) == dim:
                    break
            i += 1
        planes.append(row)
    return planes


def bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit string over the hyperplanes — the LSH bucket key."""
    bits = [
        F.when(
            dot(vec, F.array(*[F.lit(x) for x in plane])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """Approximate top-k: bucket-join candidates on IDS ONLY, then
    exact re-rank after re-attaching vectors.

    Scale shape (the parts that survive 100 TB):
      - the per-table bucket join and the cross-table dedup shuffle
        only (bucket, id) / (query_id, neighbor_id) pairs — embedding
        vectors NEVER ride a shuffle until candidates are final;
      - corpus vectors move exactly once, in the final re-attach join
        keyed on neighbor_id (proportional to candidate count, not
        n_tables x candidates);
      - ``max_bucket_size`` drops corpus-side mega-buckets (hash
        regions so dense they would go quadratic); skipping them costs
        recall on degenerate near-constant regions only — the standard
        LSH guardrail. Size ``n_planes`` ~ log2(corpus/target_bucket)
        so expected bucket size stays bounded.

    Missing neighbors (hash misses) are the accepted approximation;
    recall is tunable via n_planes/n_tables (measured in
    tests/test_training_ops.py::test_lsh_recall_vs_brute_force)."""
    from pyspark.storagelevel import StorageLevel

    q = queries.select(
        F.col(id_col).alias("query_id"), _dvec(F.col(vec_col)).alias("qv")
    )
    # the corpus vector frame feeds the bucket projection AND the
    # final re-attach; persist so the scan+cast runs once
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _dvec(F.col(vec_col)).alias("cv")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # ALL tables' buckets in ONE projection + explode — a per-table
    # select+union would recompute the vector frame (and its
    # n_planes dot products) once per table
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]

    def all_buckets(vec: Column) -> Column:
        return F.posexplode(
            F.array(*[bucket_col(vec, planes) for planes in tables])
        )

    qb = q.select("query_id", all_buckets(F.col("qv")).alias("tbl", "bucket"))
    cb = c.select(
        "neighbor_id", all_buckets(F.col("cv")).alias("tbl", "bucket")
    )
    if max_bucket_size is not None:
        sizes = cb.groupBy("tbl", "bucket").agg(F.count(F.lit(1)).alias("_n"))
        cb = cb.join(
            sizes.filter(F.col("_n") <= max_bucket_size).drop("_n"),
            ["tbl", "bucket"],
        )
    # queries are the small side — broadcast them into the bucket
    # probe so the corpus side never shuffles here
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .select("query_id", "neighbor_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .distinct()
    )
    # re-attach vectors AFTER dedup: corpus shuffles once by id
    scored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: partition the corpus into
    ``n_cells`` Voronoi cells around deterministically SAMPLED
    centroids (the first ``n_cells`` corpus vectors — sampling is a
    standard IVF centroid init and keeps the whole plan replayable in
    a SQL oracle), probe the ``nprobe`` cells nearest each query, and
    exact-re-rank the candidates.

    Scale shape (mirrors lsh_topk's discipline):
      - centroids broadcast (n_cells x dim, tiny); cell assignment is
        a map-side score + ONE groupBy(id) arg-max whose shuffle rows
        are (id, cell, sim) triples — corpus vectors never move;
      - the probe table (queries x nprobe) broadcasts into the
        candidate join, so candidate generation is shuffle-free on
        the corpus side;
      - vectors re-attach once, keyed by candidate id.
    Cells are Voronoi regions, so each corpus vector lives in EXACTLY
    one cell — no cross-table dedup is needed (unlike LSH).
    Recall is tuned by nprobe/n_cells; ties break deterministically
    (max cell id on equal sim, min neighbor_id on equal rank)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _dvec(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _dvec(F.col(vec_col)).alias("cv")
    )
    cent = corpus.filter(F.col(id_col) < n_cells).select(
        F.col(id_col).alias("cid"), _dvec(F.col(vec_col)).alias("cent")
    )
    scored = c.crossJoin(F.broadcast(cent)).select(
        "neighbor_id", "cid", cosine(F.col("cv"), F.col("cent")).alias("csim")
    )
    assign = (
        scored.groupBy("neighbor_id")
        .agg(F.max(F.struct(F.col("csim"), F.col("cid"))).alias("m"))
        .select("neighbor_id", F.col("m.cid").alias("cid"))
    )
    qscore = q.crossJoin(F.broadcast(cent)).select(
        "query_id", "cid", cosine(F.col("qv"), F.col("cent")).alias("qsim")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qsim").desc(), F.col("cid").desc()
    )
    probes = (
        qscore.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", "cid")
    )
    cand = (
        assign.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
    )
    rescored = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def embedding_near_dups(
    df: DataFrame,
    threshold: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 6,
    n_tables: int = 3,
    seed: int = 7,
    max_bucket_size: int | None = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH candidates +
    exact threshold: (doc_a, doc_b, sim) with doc_a < doc_b.

    Same shuffle discipline as lsh_topk: the per-table self-join and
    the cross-table dedup carry (bucket, id) / (doc_a, doc_b) pairs
    only; vectors re-attach once per side after the dedup — and the
    same ``max_bucket_size`` guard: a near-constant embedding region
    (one dense hash bucket) would make the self-join quadratic, so
    mega-buckets are dropped, trading recall only on degenerate
    regions."""
    from pyspark.storagelevel import StorageLevel

    # the vector frame feeds the bucket projection (both self-join
    # sides + the size guard) and both verify-side re-attaches —
    # persist so the scan+cast runs once
    v = df.select(
        F.col(id_col).alias("vid"), _dvec(F.col(vec_col)).alias("vv")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # ALL tables' buckets in ONE projection + explode (same
    # build-once discipline as lsh_topk / lsh_candidate_pairs)
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    b = v.select(
        "vid",
        F.posexplode(
            F.array(*[bucket_col(F.col("vv"), planes) for planes in tables])
        ).alias("tbl", "bucket"),
    )
    if max_bucket_size is not None:
        sizes = b.groupBy("tbl", "bucket").agg(F.count(F.lit(1)).alias("_n"))
        b = b.join(
            sizes.filter(F.col("_n") <= max_bucket_size).drop("_n"),
            ["tbl", "bucket"],
        )
    left = b.select(F.col("vid").alias("doc_a"), "tbl", "bucket")
    right = b.select(F.col("vid").alias("doc_b"), "tbl", "bucket")
    cand = (
        left.join(right, ["tbl", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    va = v.select(F.col("vid").alias("doc_a"), F.col("vv").alias("va"))
    vb = v.select(F.col("vid").alias("doc_b"), F.col("vv").alias("vb"))
    return (
        cand.join(va, "doc_a")
        .join(vb, "doc_b")
        .select(
            "doc_a", "doc_b", cosine(F.col("va"), F.col("vb")).alias("sim")
        )
        .filter(F.col("sim") >= threshold)
    )
