"""Multimodal plumbing tests (stubbed decoders, real Spark plumbing)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_log_collection_spark.multimodal import (
    FEATURE_DIM,
    extract_features,
    sample_frames,
    synthesize_assets,
)


@pytest.fixture(scope="module")
def assets(spark):
    return synthesize_assets(spark, n=30).persist()


def test_asset_synthesis_deterministic(spark, assets):
    again = synthesize_assets(spark, n=30)
    a = sorted(tuple(r) for r in assets.select("asset_id", "n_bytes").collect())
    b = sorted(tuple(r) for r in again.select("asset_id", "n_bytes").collect())
    assert a == b


def test_extract_features_shape_and_determinism(spark, assets):
    out = extract_features(assets).collect()
    assert len(out) == 30
    for r in out:
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
    # deterministic across runs
    out2 = {r["asset_id"]: r["feature"] for r in extract_features(assets).collect()}
    for r in out:
        assert out2[r["asset_id"]] == r["feature"]


def test_extract_features_strict_raises(spark, assets):
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        extract_features(assets.limit(1), strict=True).collect()


def test_sample_frames_only_video(spark, assets):
    frames = sample_frames(assets).collect()
    video_ids = {
        r["asset_id"] for r in assets.filter(F.col("kind") == "video").collect()
    }
    assert {r["asset_id"] for r in frames} == video_ids
    by_asset: dict[int, list[int]] = {}
    for r in frames:
        by_asset.setdefault(r["asset_id"], []).append(r["frame_idx"])
        assert len(bytes(r["frame"])) == 16
    for idxs in by_asset.values():
        assert sorted(idxs) == list(range(len(idxs)))  # dense frame ids
