"""Multimodal plumbing tests: schemas, batch shapes, deterministic fakes,
and the real-decode seam raising cleanly."""
from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.multimodal import (
    FRAME_SCHEMA,
    IMAGE_FEATURES_SCHEMA,
    extract_image_features,
    resize_images,
    sample_frames,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=30).cache()


def test_media_synth_deterministic(spark):
    a = synthesize_media(spark, n=6).collect()
    b = synthesize_media(spark, n=6).collect()
    assert a == b
    kinds = {r["meta"]["media_type"] for r in a}
    assert kinds == {"image", "audio", "video"}


def test_image_features_schema_and_determinism(media):
    out = extract_image_features(media)
    assert out.schema == IMAGE_FEATURES_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 30
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, r in rows.items():
        digest = hashlib.md5(src[mid]).digest()
        assert r["feature"] == [digest[i] / 255.0 for i in range(8)]
        assert r["n_bytes"] == len(src[mid])
        assert 0.0 <= r["mean_luma"] <= 1.0


def test_real_decode_seam_raises(media):
    with pytest.raises(Exception) as ei:
        extract_image_features(media, decode="real").collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_resize_respects_cap(media):
    images = media.filter(F.col("meta.media_type") == "image")
    out = {r["media_id"]: r for r in resize_images(images, max_dim=800).collect()}
    src = {r["media_id"]: r for r in images.collect()}
    assert set(out) == set(src)
    for mid, r in out.items():
        w0, h0 = src[mid]["meta"]["width"], src[mid]["meta"]["height"]
        assert max(r["width"], r["height"]) <= 800
        # aspect preserved under integer truncation
        if w0 and max(w0, h0) > 800:
            assert r["width"] < w0


def test_frame_sampling_fanout(media):
    videos = media.filter(F.col("meta.media_type") == "video")
    out = sample_frames(videos, every_ms=1500, max_frames=4)
    assert out.schema == FRAME_SCHEMA
    rows = out.collect()
    durs = {r["media_id"]: r["meta"]["duration_ms"] for r in videos.collect()}
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert set(by_media) == set(durs)
    for mid, frames in by_media.items():
        expect = min(4, max(1, durs[mid] // 1500))
        assert len(frames) == expect
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(len(frames)))
        for f in frames:
            assert f["frame_ts_ms"] == f["frame_idx"] * 1500


def test_narrow_no_shuffle(media):
    plan = extract_image_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # mapInPandas stays partition-preserving
