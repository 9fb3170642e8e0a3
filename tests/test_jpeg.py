"""Baseline JPEG codec (functions/jpeg.py): planted-gradient round trip,
marker/scope errors, and dispatch through codecs.decode_image."""
from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.functions.codecs import UnsupportedMediaError, decode_image
from ocr_spark.functions.jpeg import (
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)


def _gradient(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // max(w - 1, 1)).astype(np.uint8),
            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
            ((xx + yy) * 255 // max(w + h - 2, 1)).astype(np.uint8),
        ],
        axis=-1,
    )


def test_gradient_round_trip_within_quantization_error():
    """Smooth content survives the Annex-K quantization nearly exactly:
    per-pixel error bounded by a small constant, mean error ~2 levels."""
    img = _gradient(40, 56)
    data = encode_baseline_jpeg(img)
    assert data[:3] == b"\xff\xd8\xff" and data[-2:] == b"\xff\xd9"
    dec = decode_baseline_jpeg(data)
    assert dec.shape == img.shape and dec.dtype == np.uint8
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 12 and err.mean() < 3.0


def test_non_multiple_of_8_dims_and_gray_input():
    img = _gradient(13, 21)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(img))
    assert dec.shape == (13, 21, 3)
    gray = np.tile(np.arange(0, 250, 10, dtype=np.uint8), (17, 1))
    dec2 = decode_baseline_jpeg(encode_baseline_jpeg(gray))
    assert dec2.shape == (17, 25, 3)
    # grayscale encodes as neutral chroma: channels stay near-equal
    assert np.abs(dec2[..., 0].astype(int) - dec2[..., 1].astype(int)).max() <= 4


def test_flat_and_noise_blocks():
    """Flat color (pure DC / EOB path) and dense noise (long AC runs,
    ZRL path) both survive; noise only approximately (lossy by design)."""
    flat = np.full((24, 24, 3), 77, dtype=np.uint8)
    dec = decode_baseline_jpeg(encode_baseline_jpeg(flat))
    assert np.abs(dec.astype(int) - 77).max() <= 3
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    dec2 = decode_baseline_jpeg(encode_baseline_jpeg(noise))
    assert dec2.shape == noise.shape  # exact values are quantized away


def test_deterministic_encoding():
    img = _gradient(16, 16)
    assert encode_baseline_jpeg(img) == encode_baseline_jpeg(img)


def test_progressive_raises_unsupported():
    """SOF2 (progressive) must fail loudly as an unsupported FORMAT, not
    decode wrong — splice the marker into a valid baseline stream."""
    data = bytearray(encode_baseline_jpeg(_gradient(8, 8)))
    idx = bytes(data).find(b"\xff\xc0")
    data[idx + 1] = 0xC2
    with pytest.raises(UnsupportedMediaError):
        decode_baseline_jpeg(bytes(data))


def test_corrupt_stream_is_value_error_via_dispatch():
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0" + bytes(64))


def test_dispatch_routes_jpeg_magic():
    img = _gradient(10, 10)
    assert np.array_equal(
        decode_image(encode_baseline_jpeg(img)),
        decode_baseline_jpeg(encode_baseline_jpeg(img)),
    )
