"""Real media codecs from the standard library + numpy — no cv2/PIL.

Decoders/encoders implemented from the published format specifications
(PNG RFC 2083 / ISO 15948, Windows BITMAPINFOHEADER, Netpbm, RIFF/WAVE):

* **PNG** — 8-bit gray / gray+alpha / RGB / RGBA, non-interlaced: chunk
  walk, zlib inflate, per-row unfilter (None/Sub/Up/Average/Paeth with
  vectorized rows), plus a matching encoder (filter 0).
* **BMP** — uncompressed 24/32-bit BITMAPINFOHEADER, bottom-up or
  top-down, 4-byte row padding.
* **PPM/PGM** — binary P6/P5, maxval 255, plus a P6 encoder.
* **WAV** — stdlib ``wave``: 8/16/32-bit PCM to float64 in [-1, 1].

Formats that genuinely need external libraries (JPEG's DCT entropy coding,
video containers/H.264) raise ``UnsupportedMediaError`` naming the format —
the seam a cv2/ffmpeg deployment fills. Everything here is per-payload pure
CPU work: called from Arrow-batched UDFs, it parallelizes per input split
with zero shuffle, which is the entire scale story for decode at 100 TB.
"""
from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class UnsupportedMediaError(NotImplementedError):
    """Raised for formats whose decode requires libraries absent here."""


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

#: PNG color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        yield ctype, data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG -> (H, W, C) uint8. 8-bit depth, non-interlaced only (the
    overwhelmingly common case; Adam7 raises)."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    for ctype, chunk in _png_chunks(data):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS:
        raise UnsupportedMediaError(
            f"PNG bit_depth={bit_depth} color_type={color_type} (8-bit "
            "gray/GA/RGB/RGBA supported)"
        )
    if interlace:
        raise UnsupportedMediaError("Adam7-interlaced PNG")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up — fully vectorized
            cur = (row.astype(np.int16) + prev).astype(np.uint8)
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth — sequential in-row
            cur = row
            for x in range(stride):
                left = int(cur[x - ch]) if x >= ch else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + int(prev[x])) >> 1
                else:
                    ul = int(prev[x - ch]) if x >= ch else 0
                    pred = _paeth(left, int(prev[x]), ul)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(height, width, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, C) or (H, W) uint8 -> PNG bytes (filter 0, one IDAT)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + arr[y].astype(np.uint8).tobytes() for y in range(h)
    )

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP / PPM
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BITMAPINFOHEADER BMP -> (H, W, 3|4) uint8
    (BGR(A) converted to RGB(A))."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack("<I", data[10:14])
    header_size, width, height_raw = struct.unpack("<Iii", data[14:26])
    planes, bpp, compression = struct.unpack("<HHI", data[26:34])
    if compression != 0 or bpp not in (24, 32):
        raise UnsupportedMediaError(f"BMP bpp={bpp} compression={compression}")
    height = abs(height_raw)
    ch = bpp // 8
    row_bytes = ((width * ch + 3) // 4) * 4
    rows = []
    for y in range(height):
        start = offset + y * row_bytes
        rows.append(
            np.frombuffer(data, dtype=np.uint8, count=width * ch, offset=start)
            .reshape(width, ch)
        )
    img = np.stack(rows)
    if height_raw > 0:
        img = img[::-1]  # bottom-up storage
    # BGR(A) -> RGB(A)
    img = img[:, :, [2, 1, 0] + ([3] if ch == 4 else [])]
    return np.ascontiguousarray(img)


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 (RGB) / P5 (gray), maxval 255 -> (H, W, 3|1) uint8."""
    if data[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise UnsupportedMediaError(f"PPM maxval={maxval}")
    ch = 3 if data[:2] == b"P6" else 1
    return (
        np.frombuffer(data, dtype=np.uint8, count=width * height * ch, offset=pos)
        .reshape(height, width, ch)
        .copy()
    )


def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary P6 (the simplest real interchange format
    for resized payloads)."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.shape[2] == 4:
        arr = arr[:, :, :3]
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# Dispatch + image ops
# ---------------------------------------------------------------------------


def decode_image(data: bytes) -> np.ndarray:
    """Sniff the magic and decode -> (H, W, C) uint8."""
    if not data:
        raise ValueError("empty payload")
    if data.startswith(PNG_MAGIC):
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] in (b"P6", b"P5"):
        return decode_ppm(data)
    if data[:3] == b"\xff\xd8\xff":
        # baseline JPEG decodes in-repo (functions/jpeg.py, pure numpy
        # from the public T.81 spec); progressive/arithmetic raise
        # UnsupportedMediaError from inside, and malformed streams
        # surface as ValueError like every other codec here
        from ocr_spark.functions.jpeg import decode_baseline_jpeg

        try:
            return decode_baseline_jpeg(data)
        except (UnsupportedMediaError, ValueError):
            raise
        except Exception as e:
            raise ValueError(f"corrupt JPEG: {e}") from e
    raise UnsupportedMediaError(f"unknown image magic {data[:4]!r}")


def resize_nearest(arr: np.ndarray, max_dim: int) -> np.ndarray:
    """Clamp the longest side to ``max_dim`` (nearest-neighbor) — the
    reference's 2000-px resize cap (ocr_service.py:20-40). No-op when
    already within bounds."""
    h, w = arr.shape[:2]
    scale = min(1.0, max_dim / max(h, w)) if max(h, w) else 1.0
    if scale >= 1.0:
        return arr
    nh, nw = max(1, int(h * scale)), max(1, int(w * scale))
    yy = (np.arange(nh) * (h / nh)).astype(np.intp)
    xx = (np.arange(nw) * (w / nw)).astype(np.intp)
    return arr[yy][:, xx]


def mean_luma(arr: np.ndarray) -> float:
    """Rec.601 luma mean in [0, 1]."""
    a = arr.astype(np.float64)
    if a.ndim == 3 and a.shape[2] >= 3:
        y = 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    else:
        y = a.reshape(a.shape[0], a.shape[1], -1)[:, :, 0]
    return float(y.mean() / 255.0)


def rgb_histogram_feature(arr: np.ndarray, bins_per_channel: int = 2) -> list[float]:
    """Normalized 2x2x2 RGB occupancy histogram (8 dims) — a real,
    deterministic content descriptor with the same shape as the fake
    feature vector, so downstream schemas are unchanged."""
    a = arr
    if a.ndim == 2:
        a = np.repeat(a[:, :, None], 3, axis=2)
    if a.shape[2] < 3:
        a = np.repeat(a[:, :, :1], 3, axis=2)
    q = (a[:, :, :3] >= 128).astype(np.intp)
    idx = q[:, :, 0] * 4 + q[:, :, 1] * 2 + q[:, :, 2]
    counts = np.bincount(idx.ravel(), minlength=8).astype(np.float64)
    return list(counts / counts.sum())


# ---------------------------------------------------------------------------
# WAV audio
# ---------------------------------------------------------------------------

_WAV_DTYPES = {1: np.uint8, 2: np.int16, 4: np.int32}


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM -> (samples float64 in [-1, 1] shaped (n, channels),
    sample_rate)."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            n, ch, width, rate = (
                w.getnframes(), w.getnchannels(), w.getsampwidth(), w.getframerate(),
            )
            raw = w.readframes(n)
    except (wave.Error, EOFError, struct.error) as e:
        raise ValueError(f"not a decodable WAV payload: {e}") from e
    if width not in _WAV_DTYPES:
        raise UnsupportedMediaError(f"WAV sample width {width}")
    samples = np.frombuffer(raw, dtype=_WAV_DTYPES[width]).astype(np.float64)
    if width == 1:
        samples = (samples - 128.0) / 128.0
    else:
        samples = samples / float(2 ** (8 * width - 1))
    return samples.reshape(-1, ch), rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, ch) float64 in [-1, 1] -> 16-bit PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def audio_features(data: bytes) -> dict:
    """Duration / RMS energy / zero-crossing rate from decoded PCM."""
    samples, rate = decode_wav(data)
    mono = samples.mean(axis=1)
    zc = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if len(mono) > 1 else 0.0
    return {
        "duration_ms": int(round(1000.0 * len(mono) / rate)) if rate else 0,
        "sample_rate": rate,
        "rms": float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0,
        "zero_crossing_rate": zc,
    }
