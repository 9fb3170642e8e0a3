"""Multimodal (image/audio/video) columns: schema, plumbing, stubbed codecs.

Treats media as opaque ``binary`` payloads with a typed metadata struct,
exactly how a 100 TB training-data lake stores them (parquet binary columns
or ``binaryFile``-sourced blobs + sidecar metadata). All Spark-side
machinery is real and tested — schemas, ``mapInPandas`` batch iteration,
Arrow batch sizing, partition-preserving narrow execution; only the
pixel/sample codecs are stubs because no image/audio libraries exist in
this container:

* ``decode=\"fake\"`` (default) — deterministic synthetic features derived
  from the payload bytes (md5-seeded), so tests pin exact values and the
  full pipeline is exercised end-to-end.
* ``decode=\"real\"`` — raises ``NotImplementedError`` at the first batch
  with instructions; a deployment drops cv2/PIL/librosa calls into the
  marked seam without touching any plumbing.

Scale notes: ``mapInPandas`` keeps the operator narrow (no shuffle);
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory for
multi-MB blobs; feature extraction parallelizes per input split. Frame
sampling emits multiple rows per video via the iterator contract (a
flatMap, still narrow).
"""
from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: typed metadata carried alongside every media payload
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),   # image | audio | video
        StructField("format", StringType()),       # png / wav / mp4 / ...
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("sample_rate", IntegerType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta", MEDIA_META_SCHEMA),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),  # embedding-like
        StructField("mean_luma", DoubleType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ]
)

_FEATURE_DIM = 8


def _fake_features(payload: bytes) -> tuple[list[float], float]:
    """Deterministic stand-in for a decoded-image feature vector: md5 of the
    payload seeds 8 doubles in [0,1) plus a scalar. Pinned by tests; swap
    point for a real model/codec."""
    digest = hashlib.md5(payload or b"").digest()
    feats = [digest[i] / 255.0 for i in range(_FEATURE_DIM)]
    luma = digest[8] / 255.0
    return feats, luma


def extract_image_features(
    df: DataFrame, decode: str = "fake"
) -> DataFrame:
    """Per-image feature extraction via ``mapInPandas`` (Arrow-batched,
    narrow). Input needs (media_id, payload); output IMAGE_FEATURES_SCHEMA."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real image decode requires cv2/PIL (absent in this "
                    "container); implement decode here — the batch shape, "
                    "schema, and partitioning are already correct"
                )
            out = {
                "media_id": pdf["media_id"],
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0
                ),
            }
            feats, lumas = [], []
            for p in pdf["payload"]:
                f, l = _fake_features(bytes(p) if p is not None else b"")
                feats.append(f)
                lumas.append(l)
            out["feature"] = pd.Series(feats, index=pdf.index)
            out["mean_luma"] = pd.Series(lumas, index=pdf.index)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


def resize_images(
    df: DataFrame, max_dim: int = 2000, decode: str = "fake"
) -> DataFrame:
    """Resize-to-cap analog of the reference's 2000-px clamp
    (/root/reference/app/services/ocr_service.py:20-40). The fake codec
    truncates the payload proportionally (deterministic); the real seam is
    marked. Adds ``payload_resized`` + updated meta dims."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload_resized", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real resize requires an image library; implement here"
                )
            ids, payloads, ws, hs = [], [], [], []
            # column-wise zip, not iterrows — iterrows builds a Series per
            # row (the slow path a real codec loop must not inherit)
            for mid, payload, width, height in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                # Spark NULLs surface as NaN in pandas numeric columns —
                # `is not None` never fires; pd.isna is the correct guard
                w = 0 if pd.isna(width) else int(width)
                h = 0 if pd.isna(height) else int(height)
                p = bytes(payload) if payload is not None else b""
                scale = min(1.0, max_dim / max(w, h)) if max(w, h) else 1.0
                ids.append(mid)
                payloads.append(p[: max(1, int(len(p) * scale))] if p else p)
                ws.append(int(w * scale))
                hs.append(int(h * scale))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "payload_resized": payloads,
                    "width": ws,
                    "height": hs,
                }
            )

    return df.select(
        "media_id", "payload", F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height")
    ).mapInPandas(run, schema)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8,
    decode: str = "fake"
) -> DataFrame:
    """Video → frames fan-out (flatMap via the mapInPandas iterator): one
    output row per sampled timestamp. The fake codec slices the payload
    deterministically per frame; real decode plugs into the marked seam.
    Narrow — the fan-out multiplies rows, not shuffles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg/cv2; implement here"
                )
            rows = []
            for mid, payload, duration_ms in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                dur = 0 if pd.isna(duration_ms) else int(duration_ms)
                p = bytes(payload) if payload is not None else b""
                n = min(max_frames, max(1, int(dur // every_ms)))
                for i in range(n):
                    ts = i * every_ms
                    lo = (i * 7) % max(1, len(p))
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_ts_ms": ts,
                            "frame": p[lo : lo + 16],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "frame_ts_ms", "frame"],
            )

    return df.select(
        "media_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    ).mapInPandas(run, FRAME_SCHEMA)


def synthesize_media(spark, n: int = 64, seed: int = 13) -> DataFrame:
    """Deterministic fake media table (payload bytes seeded per id) for
    tests/benches — no external data, per the sandbox rule."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.randrange(256) for _ in range(128 + (i % 5) * 64))
        rows.append(
            (
                i,
                payload,
                (
                    kind,
                    {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                    640 + (i % 4) * 320 if kind == "image" else None,
                    480 + (i % 4) * 240 if kind == "image" else None,
                    (i % 7 + 1) * 1500 if kind == "video" else None,
                    16000 if kind == "audio" else None,
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
