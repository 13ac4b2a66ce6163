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
import io
import wave
from collections.abc import Iterator

import numpy as np
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


#: synthesized-WAV geometry shared by the generator, the decoder's
#: slice features, and the closed-form oracle: 10 slices x 512 samples
#: (powers of two keep per-slice means exact in float64), 8 kHz mono
#: 16-bit PCM, square wave flipping sign every 8 samples.
WAV_RATE = 8000
WAV_SLICES = 10
WAV_SLICE_LEN = 512
WAV_N = WAV_SLICES * WAV_SLICE_LEN
WAV_FLIP = 8


def wav_amplitude(asset_id: int, slice_idx: int) -> int:
    """Per-slice square-wave amplitude — an integer, so every derived
    statistic (peak, per-slice RMS) is an exact dyadic rational after
    the /32768 normalization and the DuckDB oracle reproduces it
    bit-for-bit from this same formula."""
    return 100 + (asset_id * 7 + slice_idx * 13) % 12000


def synthesize_wav(asset_id: int) -> bytes:
    """A real RIFF/WAVE container (stdlib ``wave``): mono 16-bit PCM,
    amplitude stepping per slice by wav_amplitude."""
    k = np.arange(WAV_N)
    sign = np.where((k // WAV_FLIP) % 2 == 0, 1, -1)
    amp = np.repeat(
        [wav_amplitude(asset_id, j) for j in range(WAV_SLICES)], WAV_SLICE_LEN
    )
    samples = (sign * amp).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(WAV_RATE)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """REAL audio decode: parse the RIFF/WAVE container, PCM-decode the
    sample stream, return physical statistics. Raises wave.Error /
    ValueError on a malformed container (a parse error, handled by the
    caller's strict/fallback policy).

    Float determinism (the oracle reproduces these bit-for-bit): all
    sample values are int16, so sums of squares stay exact integers in
    float64 (< 2^53); means over power-of-two slice lengths are exact;
    sqrt is correctly rounded IEEE; /32768 is an exact scale."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        n = w.getnframes()
        raw = w.readframes(n)
    if width != 2:
        raise ValueError(f"unsupported sample width {width}")
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    if n_channels > 1:
        x = x.reshape(-1, n_channels).mean(axis=1)
    n_samples = len(x)
    sq = x * x
    out = {
        "duration_s": n_samples / float(rate),
        "sample_rate": rate,
        "n_channels": n_channels,
        "n_samples": n_samples,
        "peak": float(np.abs(x).max()) / 32768.0 if n_samples else 0.0,
        "rms": float(np.sqrt(sq.mean())) / 32768.0 if n_samples else 0.0,
    }
    # fixed-count slice RMS profile (the "10-band energy" feature row)
    for j in range(WAV_SLICES):
        s = x[j * (n_samples // WAV_SLICES or 1):(j + 1) * (n_samples // WAV_SLICES or 1)]
        out[f"rms_{j}"] = (
            float(np.sqrt((s * s).mean())) / 32768.0 if len(s) else 0.0
        )
    return out


def _wav_feature_vector(payload: bytes) -> list[float]:
    """FEATURE_DIM floats from a real WAV decode (strict-mode audio)."""
    d = decode_wav(payload)
    return [
        d["duration_s"],
        d["sample_rate"] / 16000.0,
        float(d["n_channels"]),
        d["n_samples"] / 8192.0,
        d["peak"],
        d["rms"],
    ] + [d[f"rms_{j}"] for j in range(WAV_SLICES)]


def _decode_stub(payload: bytes, kind: str, strict: bool) -> list[float]:
    """Decoder dispatch. AUDIO decodes FOR REAL (stdlib wave + PCM
    statistics — no external libs needed); a payload that is not a
    valid WAV is a parse error in strict mode and falls back to the
    deterministic digest fake otherwise (so digest-fake corpora keep
    exercising the plumbing). image/video remain the declared stub:
    strict raises, non-strict returns the digest fake."""
    if kind == "audio":
        try:
            return _wav_feature_vector(payload)
        except (wave.Error, ValueError, EOFError):
            if strict:
                raise ValueError("malformed WAV payload")
    elif strict:
        raise NotImplementedError(
            "image/video decoding requires media libraries not present "
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
            # zip over raw columns, not iterrows — per-row pandas
            # iteration is the slowest row-access API and the decode
            # is per-asset anyway
            for aid, kind, payload in zip(
                pdf["asset_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload)
                buf_ids.append(int(aid))
                buf_kinds.append(kind)
                buf_feats.append(_decode_stub(payload, kind, strict))
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


def synthesize_wav_assets(spark, n: int = 60) -> DataFrame:
    """n REAL audio assets (valid RIFF/WAVE payloads, ~10 KB each),
    deterministic by asset_id. Built driver-side at test scale; the
    100 TB shape would generate per-partition from an id range
    (spark.range -> mapInPandas over the same synthesize_wav)."""
    rows = []
    for i in range(n):
        blob = synthesize_wav(i)
        rows.append((i, "audio", "audio/wav", blob, len(blob), {}))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


_AUDIO_OUT = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
    + [T.StructField(f"rms_{j}", T.DoubleType()) for j in range(WAV_SLICES)]
)


def audio_features(df: DataFrame, batch_bytes: int = 64 << 20) -> DataFrame:
    """REAL audio decode as a DataFrame op: WAV container parse + PCM
    statistics per asset, one flat row each. Same scale discipline as
    extract_features: payloads only ever touched inside mapInPandas,
    Arrow batches re-bounded by byte budget. Malformed payloads raise
    (strict: this op is only for audio corpora)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        buf: list[dict] = []
        used = 0
        for pdf in batches:
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                payload = bytes(payload)
                rec = decode_wav(payload)
                rec["asset_id"] = int(aid)
                buf.append(rec)
                used += len(payload)
                if used >= batch_bytes:
                    yield pd.DataFrame(buf)
                    buf, used = [], 0
        if buf:
            yield pd.DataFrame(buf)

    return (
        df.filter(F.col("kind") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(run, _AUDIO_OUT)
        .select([f.name for f in _AUDIO_OUT.fields])
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
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if strict:
                    raise NotImplementedError("video demuxing not available")
                payload = bytes(payload)
                aid = int(aid)
                for k in range(min(max_frames, len(payload) // every_n_bytes)):
                    ids.append(aid)
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
