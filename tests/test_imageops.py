"""T9/T10 pixel-operator tests: Otsu, equalization, blur, dilation,
projection-profile deskew — algorithmic properties on synthetic documents,
plus the Spark preprocess operator end-to-end on real payloads."""
from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.functions import imageops as I


def _text_page(angle: float = 0.0) -> np.ndarray:
    """Synthetic document: dark text lines on white, optionally rotated."""
    page = np.full((120, 160), 255, np.uint8)
    for y0 in range(15, 110, 15):
        page[y0 : y0 + 3, 15:145] = 0
    return I.rotate_nearest(page, angle) if angle else page


def test_otsu_separates_bimodal():
    img = np.full((50, 50), 40, np.uint8)
    img[10:40, 10:40] = 200
    t = I.otsu_threshold(img)
    assert 40 <= t < 200
    b = I.binarize(img)
    assert set(np.unique(b)) <= {0, 255}
    # classes align with the modes
    assert (b[0, 0], b[20, 20]) == (0, 255)


def test_otsu_degenerate_images():
    flat = np.full((10, 10), 77, np.uint8)
    assert 0 <= I.otsu_threshold(flat) <= 255  # no crash, any valid cut
    assert I.otsu_threshold(np.zeros((0, 0), np.uint8)) == 127


def test_equalize_stretches_contrast():
    low = np.clip(np.random.default_rng(1).integers(100, 140, (30, 30)), 0, 255).astype(np.uint8)
    eq = I.equalize_hist(low)
    assert eq.min() < 30 and eq.max() > 225  # full range used


def test_gaussian_blur_smooths_and_preserves_mean():
    rng = np.random.default_rng(5)
    noisy = rng.integers(0, 256, (40, 40)).astype(np.uint8)
    bl = I.gaussian_blur(noisy, 2.0)
    assert bl.shape == noisy.shape
    assert np.var(bl) < 0.2 * np.var(noisy.astype(float))
    assert abs(bl.mean() - noisy.mean()) < 3.0


def test_dilate_and_thicken():
    img = np.full((20, 20), 255, np.uint8)
    img[10, 10] = 0  # one ink pixel
    thick = I.thicken_text(img)
    assert (thick == 0).sum() == 9  # 3x3 stroke growth


@pytest.mark.parametrize("true_angle", [-6.0, -2.5, 3.0, 7.5])
def test_deskew_recovers_known_angle(true_angle):
    rot = _text_page(true_angle)
    fixed, applied = I.deskew(rot)
    assert abs(applied + true_angle) < 1.0  # correction ≈ -rotation
    ink = lambda a: (I.binarize(a) == 0).astype(float)  # noqa: E731
    assert np.var(ink(fixed).sum(axis=1)) > np.var(ink(rot).sum(axis=1))


def test_deskew_leaves_straight_page_alone():
    _, applied = I.deskew(_text_page())
    assert applied == 0.0


def test_preprocess_document_chain():
    out = I.preprocess_document(np.stack([_text_page()] * 3, axis=2))
    assert out["binary"].shape == (120, 160)
    assert out["deskew_angle"] == 0.0
    assert 0 <= out["otsu_threshold"] <= 255
    # text survives the chain: ink exists, but far less than half the page
    ink_ratio = (out["binary"] == 0).mean()
    assert 0.0 < ink_ratio < 0.5


def test_spark_preprocess_images(spark):
    from ocr_spark.functions.codecs import decode_image, encode_png
    from ocr_spark.operators.multimodal import MEDIA_SCHEMA, preprocess_images

    rot = _text_page(4.0)
    rows = [
        (0, bytearray(encode_png(np.stack([rot] * 3, axis=2))),
         ("image", "png", 160, 120, None, None)),
        (1, b"\xff\xd8\xff junk", ("image", "jpg", 1, 1, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in preprocess_images(df).collect()}
    good = out[0]
    assert abs(good["deskew_angle"] + 4.0) < 1.5  # skew corrected
    assert 0.0 < good["ink_ratio"] < 0.6
    mask = decode_image(bytes(good["binary_mask"]))
    assert mask.shape[:2] == (120, 160)
    assert set(np.unique(mask)) <= {0, 255}
    assert out[1]["processed"] is None  # undecodable -> NULLs, no failure