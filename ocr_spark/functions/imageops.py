"""Pure-numpy image preprocessing: the T9/T10 pixel operators.

Re-expresses the reference's OpenCV preprocessing chain
(/root/reference/app/services/ocr_service.py:43-224) with standard
published algorithms — no cv2/PIL:

* grayscale (Rec.601) ........ cvtColor(BGR2GRAY) analog
* Otsu threshold ............. THRESH_OTSU (exact histogram algorithm)
* histogram equalization ..... the contrast-enhance role of CLAHE
* separable Gaussian blur .... GaussianBlur(sigma)
* unsharp mask ............... addWeighted(img, a, blurred, -b) sharpening
* 3×3 dilation ............... text thickening (dilate on inverted ink)
* projection-profile deskew .. THRESH_OTSU + minAreaRect-angle analog:
  the skew is the rotation maximizing the variance of row ink sums — the
  classic document-deskew estimator (Baird's method family)

All operators are per-image pure CPU work intended for Arrow-batched UDFs:
narrow, shuffle-free, scaling with input splits. Exactness is pinned by
property tests (Otsu on bimodal images, blur separability, known-angle
deskew recovery), not byte-parity with OpenCV — the reference's own output
depends on its cv2 build.
"""
from __future__ import annotations

import math

import numpy as np


def to_grayscale(arr: np.ndarray) -> np.ndarray:
    """(H, W[, C]) uint8 -> (H, W) uint8 Rec.601 luma."""
    if arr.ndim == 2:
        return arr.astype(np.uint8)
    a = arr.astype(np.float64)
    if a.shape[2] >= 3:
        y = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    else:
        y = a[:, :, 0]
    return np.clip(np.round(y), 0, 255).astype(np.uint8)


def otsu_threshold(gray: np.ndarray) -> int:
    """Otsu's method: the threshold maximizing inter-class variance of the
    256-bin histogram (the exact published algorithm)."""
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    total = hist.sum()
    if total == 0:
        return 127
    omega = np.cumsum(hist) / total            # class-0 probability
    mu = np.cumsum(hist * np.arange(256)) / total
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = np.where(denom > 0, (mu_t * omega - mu) ** 2 / denom, 0.0)
    return int(np.argmax(sigma_b))


def binarize(gray: np.ndarray, threshold: int | None = None) -> np.ndarray:
    """(H, W) uint8 -> {0, 255}; Otsu threshold when not given."""
    t = otsu_threshold(gray) if threshold is None else threshold
    return np.where(gray > t, 255, 0).astype(np.uint8)


def equalize_hist(gray: np.ndarray) -> np.ndarray:
    """Global histogram equalization — the contrast-enhancement role the
    reference fills with CLAHE (tile-local EQ needs no new machinery at
    these document sizes; the Spark-side parallelism is per image)."""
    hist = np.bincount(gray.ravel(), minlength=256).astype(np.float64)
    cdf = np.cumsum(hist)
    if cdf[-1] == 0:
        return gray.copy()
    nz = cdf[cdf > 0]
    cdf_min = nz[0]
    lut = np.clip(
        np.round((cdf - cdf_min) / max(cdf[-1] - cdf_min, 1) * 255), 0, 255
    ).astype(np.uint8)
    return lut[gray]


def _gaussian_kernel(sigma: float) -> np.ndarray:
    radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2.0 * sigma * sigma))
    return k / k.sum()


def gaussian_blur(gray: np.ndarray, sigma: float = 2.0) -> np.ndarray:
    """Separable Gaussian blur with edge-replicate padding -> float64."""
    k = _gaussian_kernel(sigma)
    r = len(k) // 2
    a = gray.astype(np.float64)
    padded = np.pad(a, ((0, 0), (r, r)), mode="edge")
    a = np.apply_along_axis(lambda row: np.convolve(row, k, "valid"), 1, padded)
    padded = np.pad(a, ((r, r), (0, 0)), mode="edge")
    return np.apply_along_axis(lambda col: np.convolve(col, k, "valid"), 0, padded)


def unsharp_mask(
    gray: np.ndarray, amount: float = 2.0, sigma: float = 3.0
) -> np.ndarray:
    """addWeighted(img, amount, blur, 1-amount) sharpening (reference
    _sharpen_text uses amount=2, sigma=3)."""
    blurred = gaussian_blur(gray, sigma)
    sharp = amount * gray.astype(np.float64) + (1.0 - amount) * blurred
    return np.clip(np.round(sharp), 0, 255).astype(np.uint8)


def dilate3(gray: np.ndarray) -> np.ndarray:
    """3×3 max filter (morphological dilation) via shifted maxima."""
    p = np.pad(gray, 1, mode="edge")
    out = gray.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out = np.maximum(out, p[1 + dy : 1 + dy + gray.shape[0],
                                    1 + dx : 1 + dx + gray.shape[1]])
    return out


def thicken_text(gray: np.ndarray) -> np.ndarray:
    """Reference text thickening (ocr_service.py:194-196): invert so ink is
    bright, dilate, invert back — strokes grow by one pixel."""
    return 255 - dilate3(255 - gray)


def rotate_nearest(arr: np.ndarray, angle_deg: float) -> np.ndarray:
    """Same-size nearest-neighbor rotation about the center with replicate
    border (warpAffine BORDER_REPLICATE analog)."""
    if abs(angle_deg) < 1e-9:
        return arr.copy()
    h, w = arr.shape[:2]
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    theta = math.radians(angle_deg)
    cos_t, sin_t = math.cos(theta), math.sin(theta)
    yy, xx = np.mgrid[0:h, 0:w]
    # inverse map: source = R(-theta) @ (dest - c) + c
    sy = cos_t * (yy - cy) + sin_t * (xx - cx) + cy
    sx = -sin_t * (yy - cy) + cos_t * (xx - cx) + cx
    sy = np.clip(np.round(sy), 0, h - 1).astype(np.intp)
    sx = np.clip(np.round(sx), 0, w - 1).astype(np.intp)
    return arr[sy, sx]


def estimate_skew(
    gray: np.ndarray, max_angle: float = 10.0, step: float = 0.5
) -> float:
    """Document skew estimate: the candidate angle whose rotation maximizes
    the variance of row-wise ink sums (sharp peaks at text baselines when
    lines are horizontal). Coarse-to-fine: ``step`` grid then a 3-point
    refinement. Returns the CORRECTION angle to apply."""
    ink = (binarize(gray) == 0).astype(np.float64)  # ink = dark pixels
    if ink.sum() == 0:
        return 0.0

    def score(angle: float) -> float:
        rot = rotate_nearest(ink, angle)
        return float(np.var(rot.sum(axis=1)))

    candidates = np.arange(-max_angle, max_angle + step / 2, step)
    scores = [score(a) for a in candidates]
    best = int(np.argmax(scores))
    a0 = candidates[best]
    # clip the refinement grid so the estimate never exceeds max_angle —
    # deskew's contract is that larger skews are left alone, not overshot
    fine = np.unique(
        np.clip(
            np.arange(a0 - step, a0 + step + 1e-9, step / 4),
            -max_angle,
            max_angle,
        )
    )  # unique: clipped boundary duplicates would re-score identical rotations
    fine_scores = [score(a) for a in fine]
    return float(fine[int(np.argmax(fine_scores))])


def deskew(gray: np.ndarray, max_angle: float = 10.0) -> tuple[np.ndarray, float]:
    """T10: estimate + correct skew; angles beyond ``max_angle`` are left
    alone (reference clamps the same way, ocr_service.py:66-72). Returns
    (rotated, applied_angle)."""
    angle = estimate_skew(gray, max_angle)
    if abs(angle) < 0.5:  # sub-degree jitter: not worth resampling damage
        return gray.copy(), 0.0
    return rotate_nearest(gray, angle), angle


def preprocess_document(
    arr: np.ndarray, enhance: bool = True, do_deskew: bool = True
) -> dict:
    """T9 chain (reference preprocess_gambar, ocr_service.py:145-224):
    grayscale → contrast enhance → text thicken → unsharp → optional
    deskew → Otsu binary. Returns the processed grayscale, the binary
    mask, the Otsu threshold, and the deskew angle."""
    gray = to_grayscale(arr)
    out = gray
    if enhance:
        out = equalize_hist(out)
        out = thicken_text(out)
        out = unsharp_mask(out, amount=1.8, sigma=2.0)
    angle = 0.0
    if do_deskew:
        out, angle = deskew(out)
    thresh = otsu_threshold(out)
    return {
        "gray": out,
        "binary": binarize(out, thresh),
        "otsu_threshold": thresh,
        "deskew_angle": angle,
    }
