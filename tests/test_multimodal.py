"""Multimodal plumbing tests: schemas, batch shapes, deterministic fakes,
and the real-decode seam raising cleanly."""
from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from ocr_spark.operators.multimodal import (
    FRAME_SCHEMA,
    IMAGE_FEATURES_SCHEMA,
    MEDIA_SCHEMA,
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


def test_real_decode_nulls_for_undecodable(media):
    """The synthetic random payloads are not valid images: the real path
    yields NULL features (job survives), never raises."""
    rows = extract_image_features(media, decode="real").collect()
    assert rows and all(r["feature"] is None for r in rows)


@pytest.fixture(scope="module")
def real_media(spark):
    from ocr_spark.operators.multimodal import synthesize_real_media

    return synthesize_real_media(spark, n=24)


def test_real_image_features_match_local_codec(real_media):
    from ocr_spark.functions.codecs import (
        decode_image,
        mean_luma,
        rgb_histogram_feature,
    )

    out = {
        r["media_id"]: r
        for r in extract_image_features(real_media, decode="real").collect()
    }
    src = {r["media_id"]: r for r in real_media.collect()}
    n_jpeg_ok = 0
    for mid, r in out.items():
        kind = src[mid]["meta"]["format"]
        if kind in ("png", "ppm"):
            img = decode_image(bytes(src[mid]["payload"]))
            assert r["feature"] == pytest.approx(rgb_histogram_feature(img))
            assert r["mean_luma"] == pytest.approx(mean_luma(img))
        elif kind == "jpg":
            # half the jpeg rows are REAL baseline JPEGs (the in-repo
            # decoder handles them), half are planted garbage (NULL path)
            try:
                img = decode_image(bytes(src[mid]["payload"]))
            except ValueError:
                assert r["feature"] is None and r["mean_luma"] is None
            else:
                n_jpeg_ok += 1
                assert r["feature"] == pytest.approx(rgb_histogram_feature(img))
                assert r["mean_luma"] == pytest.approx(mean_luma(img))
        else:  # wav rows are not decodable images
            assert r["feature"] is None and r["mean_luma"] is None
    assert n_jpeg_ok > 0  # the real-JPEG path must actually be exercised


def test_real_resize_reencodes_png_with_pixel_dims(spark):
    import numpy as np

    from ocr_spark.functions.codecs import decode_image, encode_png
    from ocr_spark.operators.multimodal import resize_images

    img = np.arange(40 * 60 * 3, dtype=np.uint8).reshape(40, 60, 3)
    df = spark.createDataFrame(
        [(0, bytearray(encode_png(img)), ("image", "png", 60, 40, None, None))],
        MEDIA_SCHEMA,
    )
    (row,) = resize_images(df, max_dim=30, decode="real").collect()
    assert (row["width"], row["height"]) == (30, 20)
    resized = decode_image(bytes(row["payload_resized"]))
    assert resized.shape == (20, 30, 3)
    # within-bounds images pass through byte-identical (no re-encode)
    (row2,) = resize_images(df, max_dim=100, decode="real").collect()
    assert bytes(row2["payload_resized"]) == bytes(encode_png(img))
    assert (row2["width"], row2["height"]) == (60, 40)


def test_real_audio_features(real_media):
    from ocr_spark.operators.multimodal import extract_audio_features

    out = {
        r["media_id"]: r
        for r in extract_audio_features(real_media, decode="real").collect()
    }
    src = {r["media_id"]: r for r in real_media.collect()}
    for mid, r in out.items():
        if src[mid]["meta"]["media_type"] == "audio":
            assert r["duration_ms"] == 250 and r["sample_rate"] == 8000
            # 0.4-amplitude sine: rms = 0.4/sqrt(2), zcr ~ 2f/rate
            assert r["rms"] == pytest.approx(0.4 / 2**0.5, rel=0.01)
            assert r["zero_crossing_rate"] > 0
        else:
            assert r["rms"] is None  # images are not decodable audio


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
