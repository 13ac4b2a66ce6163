"""sample_frames non-strict fallback on undecodable RIFF payloads."""
from __future__ import annotations

import pytest

from opentelemetry_log_collection_spark.multimodal import sample_frames


def _assets(spark, rows):
    return spark.createDataFrame(
        rows, "asset_id: long, kind: string, payload: binary"
    )


def _fake_compressed_avi() -> bytes:
    # RIFF magic but not a decodable uncompressed-DIB AVI
    return b"RIFF" + (1000).to_bytes(4, "little") + b"AVI LIST" + b"\x00" * 64


def test_sample_frames_riff_fallback_non_strict(spark):
    df = _assets(spark, [(1, "video", _fake_compressed_avi())])
    rows = sample_frames(df, strict=False).collect()
    # falls back to the pseudo-frame slicer instead of crashing
    assert len(rows) > 0
    assert all(r.asset_id == 1 for r in rows)


def test_sample_frames_riff_strict_raises(spark):
    df = _assets(spark, [(1, "video", _fake_compressed_avi())])
    with pytest.raises(Exception):
        sample_frames(df, strict=True).collect()
