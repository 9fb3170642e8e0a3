"""Pure-Python/numpy BASELINE JPEG codec (ITU-T T.81, public spec).

Closes the last NULL-feature seam in the multimodal family: a real
multimodal lake is mostly JPEG, and the container ships no libjpeg/PIL.
This module implements the baseline sequential DCT process from the
public standard — Huffman entropy coding (Annex C canonical codes, the
Annex K.3 typical tables for the encoder), 8×8 FDCT/IDCT as numpy
matrix products, the Annex K.1/K.2 quantization tables, JFIF YCbCr ↔ RGB,
byte stuffing, restart intervals, and 4:2:0 / 4:2:2 / 4:4:4 chroma
subsampling on decode.

Decoder scope (raises ``UnsupportedMediaError`` beyond it, same contract
as the PNG/BMP codecs in functions/codecs.py): baseline DCT (SOF0),
8-bit samples, 1 or 3 components, single interleaved scan. Progressive
(SOF2), arithmetic coding, hierarchical, and 12-bit modes are out —
they're rare in training lakes and each is a marker check, not a silent
wrong answer.

Encoder scope: 4:4:4 (no subsampling), fixed Annex K tables (≈ libjpeg
quality 50), single interleaved scan — enough to generate real JPEG
payloads for round-trip tests and synthetic fixtures without external
data.

Performance note: per-image Python cost is dominated by the Huffman
bit-loop; at scale this runs inside the same Arrow-batched ``mapInPandas``
workers as every other codec (one image per row, embarrassingly
parallel), so throughput scales with executors even though the inner
loop is Python. The IDCT/color math is vectorized numpy.
"""
from __future__ import annotations

import struct

import numpy as np

from ocr_spark.functions.codecs import UnsupportedMediaError

# --------------------------------------------------------------------------
# Tables from the public spec (ITU-T T.81 Annex K).
# --------------------------------------------------------------------------

#: Annex K.1 — typical luminance quantization table (quality 50), zigzag
#: order NOT applied (natural row-major 8×8).
QUANT_LUMA = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

#: Annex K.2 — typical chrominance quantization table.
QUANT_CHROMA = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

#: zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
def _zigzag_order() -> list[tuple[int, int]]:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1],
                        rc[1] if (rc[0] + rc[1]) % 2 else rc[0]),
    )
    return order


ZIGZAG = _zigzag_order()
ZZ_ROWS = np.array([rc[0] for rc in ZIGZAG])
ZZ_COLS = np.array([rc[1] for rc in ZIGZAG])

#: Annex K.3 typical Huffman tables as (bits[1..16], values) — the
#: canonical-code generation (Annex C) turns these into actual codes.
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

#: 8-point DCT-II basis matrix M: forward F = M @ f @ M.T, inverse
#: f = M.T @ F @ M (M is orthogonal).
def _dct_matrix() -> np.ndarray:
    m = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            m[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16)
    return m


DCT_M = _dct_matrix()


# --------------------------------------------------------------------------
# Canonical Huffman (Annex C).
# --------------------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the canonical generation."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol for the decoder."""
    out: dict[tuple[int, int], int] = {}
    for sym, (code, length) in _build_codes(bits, vals).items():
        out[(length, code)] = sym
    return out


# --------------------------------------------------------------------------
# Bit IO with 0xFF byte stuffing.
# --------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker reached mid-fill: the scan loop handles
                # RSTn explicitly; getting here means padding bits before
                # it — feed 1-bits (the pad value) without consuming
                self.pos -= 1
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
            else:
                # EOI or other marker: supply pad bits, do not consume
                self.pos -= 1
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                return
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the RSTn marker."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1  # skip any pad bytes (rare)
        marker = self.data[self.pos + 1]
        if marker != 0xD0 + (n % 8):
            raise ValueError(f"expected RST{n % 8}, got FF{marker:02X}")
        self.pos += 2


def _extend(v: int, t: int) -> int:
    """RECEIVE/EXTEND: map t low bits to the signed value (Annex F.12)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """signed value -> (category t, t-bit code) for encoding."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << t) - 1
    return t, v


# --------------------------------------------------------------------------
# Encoder (baseline, 4:4:4).
# --------------------------------------------------------------------------


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def encode_baseline_jpeg(arr: np.ndarray) -> bytes:
    """(H, W, 3) or (H, W) uint8 -> baseline JFIF JPEG bytes (4:4:4,
    Annex K tables ≈ quality 50, single interleaved scan)."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("need (H, W, 3) uint8")
    h, w = arr.shape[:2]
    ycc = _rgb_to_ycbcr(arr)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((ph, pw, 3))
    padded[:h, :w] = ycc
    padded[h:, :w] = ycc[h - 1:h, :]  # edge replicate
    padded[:, w:] = padded[:, w - 1:w]

    dc_codes = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_build_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    quant = [QUANT_LUMA, QUANT_CHROMA]

    bw = _BitWriter()
    pred = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for comp in range(3):
                tbl = 0 if comp == 0 else 1
                block = padded[by:by + 8, bx:bx + 8, comp] - 128.0
                coef = DCT_M @ block @ DCT_M.T
                q = np.round(coef / quant[tbl]).astype(np.int64)
                zz = q[ZZ_ROWS, ZZ_COLS]
                diff = int(zz[0]) - pred[comp]
                pred[comp] = int(zz[0])
                t, code = _magnitude(diff) if diff else (0, 0)
                hc, hl = dc_codes[tbl][t]
                bw.write(hc, hl)
                if t:
                    bw.write(code, t)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        hc, hl = ac_codes[tbl][0xF0]  # ZRL
                        bw.write(hc, hl)
                        run -= 16
                    t, code = _magnitude(v)
                    hc, hl = ac_codes[tbl][(run << 4) | t]
                    bw.write(hc, hl)
                    bw.write(code, t)
                    run = 0
                if last_nz < 63:
                    hc, hl = ac_codes[tbl][0x00]  # EOB
                    bw.write(hc, hl)
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        zz = table[ZZ_ROWS, ZZ_COLS].astype(np.uint8).tobytes()
        return seg(0xFFDB, bytes([tid]) + zz)

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, QUANT_LUMA) + dqt(1, QUANT_CHROMA)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # h=v=1 (4:4:4)
    out += seg(0xFFC0, sof)
    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder (baseline SOF0).
# --------------------------------------------------------------------------


def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (H, W, 3) uint8 (grayscale replicates)."""
    if data[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan_comps = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (length,) = struct.unpack(">H", data[pos:pos + 2])
        payload = data[pos + 2:pos + length]
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq != 0:
                    raise UnsupportedMediaError("16-bit quant table")
                t = np.zeros((8, 8), dtype=np.int32)
                t[ZZ_ROWS, ZZ_COLS] = np.frombuffer(
                    payload[p:p + 64], dtype=np.uint8
                )
                qt[tq] = t
                p += 64
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1:p + 17])
                n = sum(bits)
                vals = list(payload[p + 17:p + 17 + n])
                tbl = _build_decode(bits, vals)
                (huff_dc if cls == 0 else huff_ac)[tid] = tbl
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = payload[0], *struct.unpack(">HH", payload[1:5]), payload[5]
            if prec != 8:
                raise UnsupportedMediaError(f"{prec}-bit JPEG")
            comps = []
            for i in range(nc):
                cid, hv, tq = payload[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise UnsupportedMediaError(
                f"JPEG SOF{marker - 0xC0} (only baseline SOF0 supported)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            scan_comps = []
            for i in range(ns):
                cs, tbls = payload[1 + 2 * i], payload[2 + 2 * i]
                scan_comps.append({"id": cs, "dc": tbls >> 4, "ac": tbls & 0xF})
            pos += length
            break
        pos += length
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")
    comps = frame["comps"]
    if len(comps) not in (1, 3):
        raise UnsupportedMediaError(f"{len(comps)}-component JPEG")
    by_id = {c["id"]: c for c in comps}
    for sc in scan_comps:
        sc.update(by_id[sc["id"]])

    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)

    planes = {
        sc["id"]: np.zeros(
            (mcus_y * sc["v"] * 8, mcus_x * sc["h"] * 8), dtype=np.float64
        )
        for sc in scan_comps
    }
    pred = {sc["id"]: 0 for sc in scan_comps}
    br = _BitReader(data, pos)

    def read_symbol(tbl: dict) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = tbl.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    n_mcu = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                br.align_and_expect_rst(rst_n)
                rst_n = (rst_n + 1) % 8
                for k in pred:
                    pred[k] = 0
            for sc in scan_comps:
                dq = qt[sc["tq"]]
                for vy in range(sc["v"]):
                    for vx in range(sc["h"]):
                        t = read_symbol(huff_dc[sc["dc"]])
                        diff = _extend(br.read_bits(t), t)
                        pred[sc["id"]] += diff
                        zz = np.zeros(64, dtype=np.int64)
                        zz[0] = pred[sc["id"]]
                        k = 1
                        while k < 64:
                            rs = read_symbol(huff_ac[sc["ac"]])
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC index overflow")
                            size = rs & 0xF
                            zz[k] = _extend(br.read_bits(size), size)
                            k += 1
                        block = np.zeros((8, 8), dtype=np.float64)
                        block[ZZ_ROWS, ZZ_COLS] = zz * dq[ZZ_ROWS, ZZ_COLS]
                        pix = DCT_M.T @ block @ DCT_M + 128.0
                        py = (my * sc["v"] + vy) * 8
                        px = (mx * sc["h"] + vx) * 8
                        planes[sc["id"]][py:py + 8, px:px + 8] = pix
            n_mcu += 1

    def upsampled(sc) -> np.ndarray:
        plane = planes[sc["id"]]
        ry, rx = vmax // sc["v"], hmax // sc["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        return plane[:h, :w]

    if len(scan_comps) == 1:
        y = np.clip(upsampled(scan_comps[0]), 0, 255).astype(np.uint8)
        return np.stack([y] * 3, axis=-1)
    y, cb, cr = (upsampled(sc) for sc in scan_comps)
    return _ycbcr_to_rgb(y, cb, cr)
