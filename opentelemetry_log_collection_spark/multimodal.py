"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode/feature-extract/resize/frame-sample as
Arrow-batched UDFs over mapInPandas.

The Spark-side plumbing — schema, batch iteration, partition sizing,
UDF signatures — is real and tested; the actual media decoding is
STUBBED (this container ships no image/audio libs). Each stub either
raises NotImplementedError (strict mode) or produces a deterministic
fake derived from the bytes (test mode), so pipelines can be built
and validated end-to-end before the real decoder lands.

Scale notes:
  - media bytes stay OPAQUE through shuffles — operators carry
    metadata columns and only mapInPandas stages touch payloads, so
    Tungsten never copies decoded frames between stages.
  - ``maxRecordsPerBatch`` bounds Arrow batch memory; media rows are
    huge, so stages re-batch by BYTE budget (``batch_bytes``), not
    row count — a 10k-row default batch of 5MB videos would be 50GB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical media-asset schema: opaque payload + typed metadata
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),       # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

FEATURE_DIM = 16

_FEATURES_OUT = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_FRAMES_OUT = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def synthesize_assets(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table (payload = seeded md5 stream),
    for exercising the plumbing without media libraries."""
    kinds = ["image", "audio", "video"]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        blob = b"".join(
            hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()
            for j in range(4 + i % 5)
        )
        rows.append(
            (i, kind, mimes[kind], blob, len(blob), {"w": str(64 + i % 64)})
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _decode_stub(payload: bytes, kind: str, strict: bool) -> list[float]:
    """STUB for the real decoder. strict=True raises (production
    placeholder); strict=False returns a deterministic fake feature
    derived from the payload digest."""
    if strict:
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present "
            "in this environment; plug the real decoder in here"
        )
    d = hashlib.md5(kind.encode() + payload).digest()
    return [b / 255.0 for b in d[:FEATURE_DIM]]


def extract_features(
    df: DataFrame,
    batch_bytes: int = 64 << 20,
    strict: bool = False,
) -> DataFrame:
    """payload -> FEATURE_DIM float vector via mapInPandas, re-batched
    by byte budget so Arrow batches stay bounded."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf_ids: list[int] = []
        buf_kinds: list[str] = []
        buf_feats: list[list[float]] = []
        used = 0

        def emit():
            nonlocal buf_ids, buf_kinds, buf_feats, used
            if buf_ids:
                yield_df = pd.DataFrame(
                    {"asset_id": buf_ids, "kind": buf_kinds, "feature": buf_feats}
                )
                buf_ids, buf_kinds, buf_feats, used = [], [], [], 0
                return yield_df
            return None

        for pdf in batches:
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                buf_ids.append(int(row["asset_id"]))
                buf_kinds.append(row["kind"])
                buf_feats.append(_decode_stub(payload, row["kind"], strict))
                used += len(payload)
                if used >= batch_bytes:
                    out = emit()
                    if out is not None:
                        yield out
        out = emit()
        if out is not None:
            yield out

    return df.select("asset_id", "kind", "payload").mapInPandas(
        run, _FEATURES_OUT
    )


def sample_frames(
    df: DataFrame, every_n_bytes: int = 16, max_frames: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Frame-sampling plumbing for video assets: explode each payload
    into <=max_frames pseudo-frames. The real implementation replaces
    the slicer with a container demuxer; the batch shape (one input
    row -> many output rows via mapInPandas) is the part that matters
    for the plan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                if strict:
                    raise NotImplementedError("video demuxing not available")
                payload = bytes(row["payload"])
                for k in range(min(max_frames, len(payload) // every_n_bytes)):
                    ids.append(int(row["asset_id"]))
                    idxs.append(k)
                    frames.append(payload[k * every_n_bytes:(k + 1) * every_n_bytes])
            if ids:
                yield pd.DataFrame(
                    {"asset_id": ids, "frame_idx": idxs, "frame": frames}
                )

    return (
        df.filter(F.col("kind") == "video")
        .select("asset_id", "payload")
        .mapInPandas(run, _FRAMES_OUT)
    )
