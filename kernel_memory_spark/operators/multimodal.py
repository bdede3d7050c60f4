"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The reference treats media as decoder inputs producing text (ImageDecoder +
IOcrEngine, archived/km-v1/service/Core/DataFormats/Image/ImageDecoder.cs:38-71);
at training-data scale media also needs decode / feature-extract / resize /
frame-sample stages. The image/audio libraries are not in this container, so
the decode kernels are STUBBED (deterministic fakes or NotImplementedError
behind use_stub=False) — but the Spark-side plumbing is real and tested:
schema, partition sizing, UDF signatures, Arrow batch shape.

Binary payloads dominate partition bytes; media pipelines should set
spark.sql.files.maxPartitionBytes low (64-128MB) and avoid wide shuffles of
the binary column — all stages here are narrow maps that project metadata
and drop bytes as early as possible.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_ref", StringType(), False),
        StructField("doc_id", StringType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("mime_type", StringType(), False),
        StructField("content", BinaryType(), True),  # opaque payload
        StructField("byte_size", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)


def synth_media_for_corpus(spans_flat: DataFrame) -> DataFrame:
    """Deterministic fake media rows for every media span (bytes = seeded
    pseudo-random payload keyed on media_ref) — the test stand-in for a real
    object-store scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                seed = zlib.crc32(ref.encode())
                rs = np.random.RandomState(seed % (2**31))
                content = rs.bytes(256)
                rows.append(
                    {
                        "media_ref": ref,
                        "doc_id": doc_id,
                        "media_type": "image",
                        "mime_type": "image/png",
                        "content": content,
                        "byte_size": len(content),
                        "width": int(64 + seed % 512),
                        "height": int(64 + (seed >> 9) % 512),
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA.fields])

    media_spans = spans_flat.filter(F.col("kind") == "media").select(
        "doc_id", "media_ref"
    )
    return media_spans.mapInPandas(run, schema=MEDIA)


def decode_image_stub(content: bytes, use_stub: bool = True) -> np.ndarray:
    """STUB decode: a real deployment uses PIL/libvips here. The stub returns
    a deterministic 8x8 grayscale 'image' derived from the bytes so
    downstream feature extraction has a stable fixture."""
    if not use_stub:
        raise NotImplementedError(
            "image decoding requires PIL/libvips, not available in this container"
        )
    h = hashlib.sha256(content or b"").digest()
    return np.frombuffer((h * 2)[:64], dtype=np.uint8).reshape(8, 8)


def extract_image_features(media: DataFrame, dim: int = 16,
                           use_stub: bool = True) -> DataFrame:
    """decode -> pooled feature vector per media item (Arrow-batched).
    Output drops the binary payload: (media_ref, doc_id, feature array)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                img = decode_image_stub(bytes(content or b""), use_stub)
                flat = img.astype(np.float64).ravel()
                pooled = flat[: dim * (len(flat) // dim)].reshape(dim, -1).mean(axis=1)
                norm = np.linalg.norm(pooled) or 1.0
                feats.append((pooled / norm).astype(np.float32).tolist())
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "doc_id": pdf["doc_id"],
                    "feature": feats,
                }
            )

    return media.select("media_ref", "doc_id", "content").mapInPandas(
        run,
        schema=StructType(
            [
                StructField("media_ref", StringType(), False),
                StructField("doc_id", StringType(), False),
                StructField("feature", ArrayType(FloatType()), False),
            ]
        ),
    )


def resize_images(media: DataFrame, width: int, height: int,
                  use_stub: bool = True) -> DataFrame:
    """Resize plumbing: decodes (stub), 'resizes' deterministically, re-emits
    binary + updated dims. Real kernel swaps decode_image_stub for PIL."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            resized = []
            for content in pdf["content"]:
                img = decode_image_stub(bytes(content or b""), use_stub)
                resized.append(hashlib.sha256(img.tobytes()).digest())
            out["content"] = resized
            out["byte_size"] = [len(c) for c in resized]
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(run, schema=MEDIA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000,
                        use_stub: bool = True) -> DataFrame:
    """Frame-sampling plumbing for video rows: emits (media_ref, frame_idx,
    ts_ms, frame_bytes). Stub synthesizes frame bytes deterministically."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, doc_id, content, dur in zip(
                pdf["media_ref"], pdf["doc_id"], pdf["content"],
                pdf["duration_ms"],
            ):
                if not use_stub:
                    raise NotImplementedError("video decode requires ffmpeg")
                duration = int(dur) if dur is not None and not pd.isna(dur) else 3000
                for idx, ts in enumerate(range(0, duration, every_ms)):
                    frame = hashlib.sha256(
                        bytes(content or b"") + ts.to_bytes(8, "little")
                    ).digest()
                    rows.append((ref, doc_id, idx, ts, frame))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "doc_id", "frame_idx", "ts_ms", "frame"],
            )

    return media.select(
        "media_ref", "doc_id", "content", "duration_ms"
    ).mapInPandas(
        run,
        schema="media_ref string, doc_id string, frame_idx int, ts_ms long,"
        " frame binary",
    )
