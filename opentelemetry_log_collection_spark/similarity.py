"""Similarity search over an embedding column (array<float>).

Two plans, per the standard ANN playbook:

  - brute_force_topk: the exactness baseline. The (small) query set
    broadcasts; scoring is a map-side nested loop with the cosine
    computed by builtin expressions (left-to-right fold =>
    deterministic summation order), then ONE window per-query top-k.
    Cost: |corpus| x |queries| partial products, no corpus shuffle —
    right up to a few thousand queries.

  - lsh_topk: the scale path. Random-hyperplane (sign) LSH buckets
    both sides; candidates = bucket collisions (the corpus bucket
    rows carry their vector, so scoring is map-side in the collision
    stage); exact cosine re-rank within candidates. Recall is tunable
    via n_planes/n_tables. Hyperplanes are derived deterministically
    from a seed (md5 stream), never RNG state.

All math is done in DOUBLE after an explicit cast from float32 —
identical left-to-right IEEE ops in any engine, so oracle checks can
reproduce scores bit-for-bit.

Expression notes (measured at 10x bench scale, BENCH.md r6):
  - per-vector norms are computed once per ROW, never once per pair:
    ``sqrt(dot(v,v))`` yields the same double either way, so
    ``dot(a,b)/(na*nb)`` is bit-identical to the naive per-pair
    ``cosine`` and drops 2 of the 3 fold evaluations per scored pair
    (brute-force top-k 3.6s -> 1.3s);
  - the dot stays the zip_with+aggregate HOF form everywhere: an
    unrolled ``element_at(a,i)*element_at(b,i)`` chain is ~190
    expression nodes, which join operators evaluate INTERPRETED
    (BroadcastNestedLoopJoin does not whole-stage-codegen its
    projections: measured 4.5s vs 1.3s for the same top-k), and a
    projection holding several unrolled dots (bucket keys, centroid
    panels) overflows codegen entirely and falls back to interpreted
    evaluation for every row.
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
    """Left-fold sum of elementwise products — deterministic order:
    ``((0.0 + a1*b1) + a2*b2) + ...``."""
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
    Queries broadcast; ties broken by neighbor_id for determinism.
    Norms are computed once per side (same doubles as the per-pair
    form — see module docstring), so each scored pair costs one
    fold dot + one divide."""
    q = queries.select(
        F.col(id_col).alias("query_id"), _dvec(F.col(vec_col)).alias("qv")
    ).withColumn("nq", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _dvec(F.col(vec_col)).alias("cv")
    ).withColumn("nc", norm(F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc"))).alias(
                "sim"
            ),
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
    """Sign-bit string over the hyperplanes — the LSH bucket key.

    Deliberately the HOF dot, not the unrolled form: a bucket
    projection evaluates n_planes x n_tables dots in ONE projection,
    and unrolling all of them produces a multi-thousand-node
    expression tree that overflows codegen into interpreted
    evaluation (measured 2x slower end-to-end). Unrolling only pays
    when a projection holds a single dot."""
    bits = [
        F.when(dot(vec, F.array(*[F.lit(x) for x in plane])) >= 0, F.lit("1"))
        .otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def _fold_plane_bits(V, P):
    """Exact left-fold dot of every (vector, plane) pair and the LSH
    sign bits, shared by the numpy bucket stages (lsh_topk corpus side
    and embedding_near_dups).

    The k-ordered sequential adds reproduce the HOF fold's doubles
    bit-for-bit, and the sign test follows SPARK's comparison
    semantics: NaN orders greater than every double, so ``NaN >= 0``
    is TRUE and a NaN dot signs '1' — ``np.where(acc >= 0)`` alone
    would sign it '0' and silently move NaN-poisoned vectors to a
    different bucket than the expression form (caught in review with
    a live repro). Returns (acc, bits)."""
    import numpy as np

    acc = np.zeros((len(V), P.shape[0]))
    for k in range(P.shape[1]):
        acc += np.outer(V[:, k], P[:, k])
    bits = np.where((acc >= 0.0) | np.isnan(acc), "1", "0")
    return acc, bits


def _drop_megabuckets(b: DataFrame, max_bucket_size: int) -> DataFrame:
    """Remove rows landing in over-populated (tbl, bucket) cells via a
    broadcast ANTI join against the (tiny, usually empty) oversized
    set — the guard costs one small aggregation, never a join against
    the full bucket census."""
    big = (
        b.groupBy("tbl", "bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > max_bucket_size)
        .drop("_n")
    )
    return b.join(F.broadcast(big), ["tbl", "bucket"], "left_anti")


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
    """Approximate top-k: score bucket collisions map-side, then ONE
    dedup of the (tiny) scored candidate set and the per-query rank.

    Scale shape (the parts that survive 100 TB):
      - the corpus bucket rows carry their vector, so the per-table
        collision probe (queries broadcast) computes the exact cosine
        IN the probe stage — no candidate-id shuffle, no re-attach
        join; the corpus never shuffles at all here;
      - a pair colliding in several tables yields bit-identical sims,
        so the dedup is a ``distinct`` over the scored rows —
        proportional to candidate count, and AFTER the collision
        stage's threshold-free projection the scored set is small
        (queries x mean bucket size x tables);
      - ``max_bucket_size`` drops corpus-side mega-buckets (hash
        regions so dense they would go quadratic) via a broadcast
        anti-join against the oversized set; skipping them costs
        recall on degenerate near-constant regions only — the
        standard LSH guardrail.

    Missing neighbors (hash misses) are the accepted approximation;
    recall is tunable via n_planes/n_tables (measured in
    tests/test_training_ops.py::test_lsh_recall_vs_brute_force)."""
    import pandas as pd

    from pyspark.storagelevel import StorageLevel

    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]

    def all_buckets(vec: Column) -> Column:
        return F.posexplode(
            F.array(*[bucket_col(vec, planes) for planes in tables])
        )

    q = queries.select(
        F.col(id_col).alias("query_id"), _dvec(F.col(vec_col)).alias("qv")
    ).withColumn("nq", norm(F.col("qv")))
    # query side: a handful of rows — the HOF projection is fine there
    qb = q.select(
        "query_id", "qv", "nq", all_buckets(F.col("qv")).alias("tbl", "bucket")
    )
    # corpus bucket rows keep their vector: scoring happens in the
    # collision stage, so no candidate-id dedup shuffle and no
    # re-attach join ever carries the corpus. The bucket projection
    # itself runs as ONE mapInPandas stage with EXACT left-fold plane
    # dots and norms (_fold_plane_bits: same sequential-add order the
    # HOF fold evaluates, same NaN-signs-'1' comparison semantics) —
    # the n_planes x n_tables HOF dots were ~85% of the query wall
    # at 10x bench scale (BENCH.md r6). Residual NaN caveat: a vector
    # CONTAINING NaN gets a NaN norm, which Arrow surfaces to Spark
    # as null — such degenerate rows score a null sim (ranked last)
    # where the pure-expression form ranked their NaN sim first.
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _dvec(F.col(vec_col)).alias("cv")
    )
    id_ddl = c.schema["neighbor_id"].dataType.simpleString()
    planes_flat = [p for planes in tables for p in planes]
    n_pl, n_tab = n_planes, n_tables

    def corpus_buckets(batches):
        import numpy as np

        P = np.array(planes_flat, dtype=np.float64)  # (n_tab*n_pl, dim)
        dim_p = P.shape[1]
        for pdf in batches:
            if not len(pdf):
                continue
            cv = pdf["cv"].to_numpy()
            ok = np.array(
                [v is not None and len(v) == dim_p for v in cv], dtype=bool
            )
            frames = []
            if ok.any():
                V = np.stack(cv[ok])
                _, bits = _fold_plane_bits(V, P)
                # exact left-fold sum of squares, same k-order
                accn = np.zeros(len(V))
                for k in range(dim_p):
                    accn += V[:, k] * V[:, k]
                nc = np.sqrt(accn)
                ids = pdf["neighbor_id"].to_numpy()[ok]
                for t in range(n_tab):
                    key = bits[:, t * n_pl:(t + 1) * n_pl]
                    frames.append(
                        pd.DataFrame(
                            {
                                "neighbor_id": ids,
                                "cv": cv[ok],
                                "nc": nc,
                                "tbl": t,
                                "bucket": ["".join(r) for r in key],
                            }
                        )
                    )
            bad = np.flatnonzero(~ok)
            if len(bad):
                # null vector or length != dim: every plane-dot folds a
                # null product, so the expression form bucketed these
                # rows at all-"0" bits; norms still fold their own
                # squares (null norm for a null vector). Built as ONE
                # frame per table with an explicit float dtype — a
                # per-row all-None frame trips pandas' deprecated
                # all-NA concat dtype inference.
                bids, bcv, bnc = [], [], []
                for i in bad:
                    v = cv[i]
                    nrm = np.nan
                    if v is not None:
                        a = 0.0
                        for x in v:
                            a += float(x) * float(x)
                        nrm = float(np.sqrt(a))
                    bids.append(pdf["neighbor_id"].iloc[i])
                    bcv.append(v)
                    bnc.append(nrm)
                for t in range(n_tab):
                    frames.append(
                        pd.DataFrame(
                            {
                                "neighbor_id": bids,
                                "cv": bcv,
                                "nc": np.array(bnc, dtype=np.float64),
                                "tbl": t,
                                "bucket": "0" * n_pl,
                            }
                        )
                    )
            yield pd.concat(frames)

    cb = c.mapInPandas(
        corpus_buckets,
        schema=(
            f"neighbor_id {id_ddl}, cv array<double>, nc double, "
            "tbl int, bucket string"
        ),
    )
    if max_bucket_size is not None:
        # the guard aggregation and the probe both read the bucket
        # frame — persist so the scan+bucket projection runs once
        cb = cb.persist(StorageLevel.MEMORY_AND_DISK)
        cb = _drop_megabuckets(cb, max_bucket_size)
    scored = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc"))).alias(
                "sim"
            ),
        )
        .distinct()
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

    Scale shape:
      - the centroid table is metadata-sized (n_cells rows), so it is
        collected once; cell assignment then runs as ONE
        ``mapInPandas`` stage over the corpus — EXACT left-fold dots
        and IEEE sqrt/divide reproduce, bit-for-bit, the
        ``max(struct(csim, cid))`` the aggregate form computed
        (including the max-cid tie order) — so the corpus is scanned
        once, never shuffled, and never blown up 16x through a
        centroid crossJoin (the aggregate form materialized
        |corpus| x n_cells rows; carrying the vector through it cost
        ~0.5 KB per row);
      - the assigned rows keep their vector + norm, and the probe
        table (queries x nprobe, with query vectors) broadcasts into
        the candidate join, so candidates go straight to the re-rank
        with both vectors already in the row — zero corpus shuffles
        end to end.
    Cells are Voronoi regions, so each corpus vector lives in EXACTLY
    one cell — no cross-table dedup is needed (unlike LSH).
    Recall is tuned by nprobe/n_cells; ties break deterministically
    (max cell id on equal sim, min neighbor_id on equal rank)."""
    import pandas as pd

    q = queries.select(
        F.col(id_col).alias("query_id"), _dvec(F.col(vec_col)).alias("qv")
    ).withColumn("nq", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _dvec(F.col(vec_col)).alias("cv")
    )
    # metadata-sized collect: n_cells centroid vectors. A null
    # embedding among the centroid ids is skipped — the aggregate form
    # scored it as null csim, which never won the (csim, cid) max, so
    # excluding it from the panel assigns identically.
    cents = sorted(
        (r["cid"], list(r["cent"]))
        for r in corpus.filter(F.col(id_col) < n_cells)
        .select(F.col(id_col).alias("cid"), _dvec(F.col(vec_col)).alias("cent"))
        .collect()
        if r["cent"] is not None
    )

    def assign_cells(batches):
        import numpy as np

        cids = np.array([cid for cid, _ in cents], dtype=np.int64)
        C = np.array([v for _, v in cents], dtype=np.float64)  # (m, d)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["cv"].to_numpy())
            n, d = V.shape
            # exact left-fold dots and sums of squares
            acc = np.zeros((n, len(cents)))
            accn = np.zeros(n)
            for k in range(d):
                acc += np.outer(V[:, k], C[:, k])
                accn += V[:, k] * V[:, k]
            nc = np.sqrt(accn)
            # centroid norms exactly: left-fold of squares
            accc = np.zeros(len(cents))
            for k in range(d):
                accc += C[:, k] * C[:, k]
            cn = np.sqrt(accc)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = acc / np.outer(nc, cn)
            # max(struct(csim, cid)): among max-sim cells, take max cid.
            # Spark orders NaN greater than every double, so NaN sims
            # map to +inf before the max.
            simsf = np.where(np.isnan(sims), np.inf, sims)
            maxv = simsf.max(axis=1)
            is_max = simsf == maxv[:, None]
            cid_pick = np.where(is_max, cids[None, :], np.int64(-1)).max(axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"].to_numpy(),
                    "cv": pdf["cv"].to_numpy(),
                    "nc": nc,
                    "cid": cid_pick,
                }
            )

    assign = c.mapInPandas(
        assign_cells,
        schema="neighbor_id long, cv array<double>, nc double, cid long",
    )
    if not cents:
        # empty result with the id columns' REAL types (an id_col of
        # another type must not come back as a hardcoded long)
        return (
            q.crossJoin(c.limit(0))
            .select(
                "query_id",
                F.lit(1).cast("int").alias("rank"),
                "neighbor_id",
                F.lit(0.0).alias("sim"),
            )
            .limit(0)
        )
    cent_arr = [
        (cid, F.array(*[F.lit(float(x)) for x in cvec])) for cid, cvec in cents
    ]
    # query-side centroid scoring: a handful of rows — the HOF dot
    # keeps the n_cells-struct projection tree codegen-sized
    qscore = q.select(
        "query_id", "qv", "nq",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(cid).alias("cid"),
                        (
                            dot(F.col("qv"), arr)
                            / (F.col("nq") * F.sqrt(dot(arr, arr)))
                        ).alias("qsim"),
                    )
                    for cid, arr in cent_arr
                ]
            )
        ).alias("s"),
    ).select(
        "query_id", "qv", "nq",
        F.col("s.cid").alias("cid"), F.col("s.qsim").alias("qsim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qsim").desc(), F.col("cid").desc()
    )
    probes = (
        qscore.withColumn("_r", F.row_number().over(wq))
        .filter(F.col("_r") <= nprobe)
        .select("query_id", "qv", "nq", "cid")
    )
    rescored = (
        assign.join(F.broadcast(probes), "cid")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("nq") * F.col("nc"))).alias(
                "sim"
            ),
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

    Plan shape: the bucket rows carry their vector (and precomputed
    norm), so the per-bucket self-join computes the exact cosine and
    applies the threshold IN the collision stage — the candidate
    stream never crosses an exchange, and the only dedup is a
    ``distinct`` over the (tiny) above-threshold result; a pair
    colliding in several tables produces bit-identical sims, so the
    distinct collapses them exactly. (The previous plan deduped the
    FULL candidate set — millions of (id, id) rows through a shuffle —
    then re-attached both vectors with two more shuffled joins; at
    10x bench scale that was ~28s vs ~2s for this shape.)

    Plan shape (guide §4.2/§8 — hand whole batches to vectorized
    native code, move the payload once):

      1. ONE ``mapInPandas`` stage computes every table's bucket key
         per vector with EXACT left-fold plane dots (64 sequential
         vectorized adds — bit-for-bit the sign Spark's fold computes,
         so bucket membership is identical) and emits the exploded
         (tbl, bucket, vid, vv) rows.
      2. ONE shuffle groups by (tbl, bucket); ``applyInPandas`` scores
         each bucket as a matrix: a blocked BLAS gram over normalized
         vectors prefilters at ``threshold - 1e-6`` (BLAS error for
         64-dim doubles is ~1e-14, so no true pair is lost), then the
         surviving pairs are re-verified with the EXACT left-fold
         dot/norms — the returned sims are bit-identical to the
         builtin-expression form.
      3. a ``distinct`` collapses pairs found in several tables
         (identical sims), proportional to the RESULT size.

    The previous plans either shuffled the full candidate-id stream
    (millions of (id,id) rows through a distinct + two re-attach
    joins: ~28s at 10x bench scale) or materialized both vectors on
    every collision row through the self-join (~1 KB/pair x 10M
    pairs: worse). Here vectors cross the wire exactly once and pairs
    never do; per-bucket scoring is O(n_b^2 * dim) BLAS flops.

    ``max_bucket_size`` is enforced INSIDE the scorer (an oversized
    group emits nothing — same semantics as dropping its rows before
    the join): a near-constant embedding region would make scoring
    quadratic, so skipping such buckets trades recall only on
    degenerate regions."""
    import pandas as pd

    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    v = df.select(
        F.col(id_col).alias("vid"), _dvec(F.col(vec_col)).alias("vv")
    )
    planes_flat = [p for planes in tables for p in planes]
    n_planes_per = n_planes
    n_tab = n_tables
    thr = float(threshold)
    cap = max_bucket_size

    def explode_buckets(batches):
        import numpy as np

        P = np.array(planes_flat, dtype=np.float64)  # (n_tab*n_planes, dim)
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf["vv"].to_numpy())
            # exact left-fold dots + Spark-semantics sign bits
            # (NaN signs '1' — see _fold_plane_bits)
            _, bits = _fold_plane_bits(V, P)
            out = []
            for t in range(n_tab):
                key = bits[:, t * n_planes_per:(t + 1) * n_planes_per]
                out.append(
                    pd.DataFrame(
                        {
                            "tbl": t,
                            "bucket": ["".join(r) for r in key],
                            "vid": pdf["vid"].to_numpy(),
                            "vv": pdf["vv"].to_numpy(),
                        }
                    )
                )
            yield pd.concat(out)

    b = v.mapInPandas(
        explode_buckets,
        schema="tbl int, bucket string, vid long, vv array<double>",
    )

    def score(pdf):
        import numpy as np

        empty = pd.DataFrame({"doc_a": [], "doc_b": [], "sim": []}).astype(
            {"doc_a": "int64", "doc_b": "int64", "sim": "float64"}
        )
        n = len(pdf)
        if n < 2 or (cap is not None and n > cap):
            return empty
        V = np.stack(pdf["vv"].to_numpy())
        ids = pdf["vid"].to_numpy()
        d = V.shape[1]
        # exact norms: left-fold sum of squares, then IEEE sqrt —
        # the same doubles the builtin sqrt(fold) computes
        accn = np.zeros(n)
        sq = V * V
        for k in range(d):
            accn += sq[:, k]
        norms = np.sqrt(accn)
        with np.errstate(divide="ignore", invalid="ignore"):
            Vn = V / norms[:, None]
        Vn = np.nan_to_num(Vn)
        ia_all, ib_all = [], []
        blk = max(1, (1 << 24) // max(n, 1))
        for i0 in range(0, n, blk):
            g = Vn[i0:i0 + blk] @ Vn.T
            cand = np.argwhere(g >= thr - 1e-6)
            if len(cand):
                ia_all.append(cand[:, 0] + i0)
                ib_all.append(cand[:, 1])
        if not ia_all:
            return empty
        ia = np.concatenate(ia_all)
        ib = np.concatenate(ib_all)
        keep = ids[ia] < ids[ib]
        ia, ib = ia[keep], ib[keep]
        if not len(ia):
            return empty
        # exact re-verify: left-fold dot, exact norms, one divide
        prod = V[ia] * V[ib]
        acc = np.zeros(len(ia))
        for k in range(d):
            acc += prod[:, k]
        sim = acc / (norms[ia] * norms[ib])
        keep = sim >= thr
        return pd.DataFrame(
            {"doc_a": ids[ia[keep]], "doc_b": ids[ib[keep]], "sim": sim[keep]}
        )

    return (
        b.groupBy("tbl", "bucket")
        .applyInPandas(score, schema="doc_a long, doc_b long, sim double")
        .distinct()
    )
