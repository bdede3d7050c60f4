"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs.

The reference treats media as decoder inputs producing text (ImageDecoder +
IOcrEngine, archived/km-v1/service/Core/DataFormats/Image/ImageDecoder.cs:38-71);
at training-data scale media also needs decode / feature-extract / resize /
frame-sample stages. Dependency-free formats decode FOR REAL (binary netpbm
P6/P5 and uncompressed 24-bit BMP — pure numpy header parse + raw pixels;
resize is a real nearest-neighbor resample re-encoded as PPM), and the
synthetic media corpus emits real PPM payloads so the whole image path runs
end-to-end. Formats needing PIL/libvips/ffmpeg (PNG/JPEG decode, video
demux) remain STUBBED (deterministic fakes, or NotImplementedError behind
use_stub=False) since those libraries are absent in this container; the
Spark-side plumbing around them — schema, partition sizing, UDF signatures,
Arrow batch shape — is real and tested either way.

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
                # a REAL image: deterministic pixels encoded as binary PPM,
                # so the decode path downstream is exercised for real
                w, h = int(8 + seed % 9), int(6 + (seed >> 9) % 7)
                img = rs.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
                content = encode_ppm(img)
                rows.append(
                    {
                        "media_ref": ref,
                        "doc_id": doc_id,
                        "media_type": "image",
                        "mime_type": "image/x-portable-pixmap",
                        "content": content,
                        "byte_size": len(content),
                        "width": w,
                        "height": h,
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


# ---------------------------------------------------------------------------
# REAL decoders — dependency-free formats (pure numpy header parse + raw
# pixels). PPM/PGM (netpbm P6/P5) and uncompressed 24-bit BMP decode for
# real; PNG/JPEG still route to the stub (zlib inflate + huffman are out of
# scope without PIL). This makes the decode path genuinely functional, not
# just plumbing: the synthetic media corpus emits real PPM bytes.
# ---------------------------------------------------------------------------


def decode_ppm(content: bytes) -> np.ndarray:
    """netpbm P6 (RGB) / P5 (gray) binary decode -> (h, w, 3) or (h, w)."""
    if content[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary netpbm image")
    # header: magic, whitespace-separated width height maxval, ONE
    # whitespace byte, then raw samples ('#' comments allowed)
    fields: list = []
    i = 2
    while len(fields) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":
            while i < len(content) and content[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        fields.append(int(content[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = fields[0], fields[1], fields[2]
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    ch = 3 if content[:2] == b"P6" else 1
    pix = np.frombuffer(content, dtype=np.uint8, count=w * h * ch, offset=i)
    return pix.reshape(h, w, 3) if ch == 3 else pix.reshape(h, w)


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6 bytes (the inverse of decode_ppm)."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP decode -> (h, w, 3) RGB (BMP stores BGR
    bottom-up with 4-byte row padding)."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP image")
    data_offset = int.from_bytes(content[10:14], "little")
    w = int.from_bytes(content[18:22], "little", signed=True)
    h = int.from_bytes(content[22:26], "little", signed=True)
    bpp = int.from_bytes(content[28:30], "little")
    compression = int.from_bytes(content[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24-bit BMP supported")
    flipped = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        content, dtype=np.uint8, count=row_bytes * h, offset=data_offset
    ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return rgb[::-1] if flipped else rgb


def decode_wav(content: bytes):
    """PCM WAV decode (RIFF parse, 8/16-bit integer PCM) ->
    (samples ndarray shaped (n, channels), sample_rate). Dependency-free:
    the struct layout is fixed by the RIFF spec."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(content):
        chunk_id = content[i : i + 4]
        size = int.from_bytes(content[i + 4 : i + 8], "little")
        body = content[i + 8 : i + 8 + size]
        if chunk_id == b"fmt ":
            fmt = body
        elif chunk_id == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError("only 8/16-bit integer PCM supported")
    dtype = np.uint8 if bits == 8 else np.dtype("<i2")
    samples = np.frombuffer(data, dtype=dtype)
    samples = samples[: (len(samples) // channels) * channels]
    return samples.reshape(-1, channels), sample_rate


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, channels) int16 -> 16-bit PCM WAV bytes (inverse of decode_wav)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    samples = samples.astype("<i2")
    channels = samples.shape[1]
    data = samples.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = (
        (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + (channels * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    body = b"WAVE" + b"fmt " + (16).to_bytes(4, "little") + fmt \
        + b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def decode_y4m_frames(content: bytes):
    """YUV4MPEG2 decode (the dependency-free raw video format) ->
    (frames, width, height, fps): frames is a list of (h, w) luma planes
    (Y of 4:2:0 or mono; chroma is parsed past but not returned — feature
    stages downstream use luma)."""
    nl = content.find(b"\n")
    header = content[:nl].split(b" ")
    if header[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    fps = 0.0
    colorspace = b"420"
    for tok in header[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps = int(num) / int(den)
        elif tok[:1] == b"C":
            colorspace = tok[1:]
    if colorspace.startswith(b"420"):
        frame_bytes = w * h * 3 // 2
    elif colorspace.startswith(b"mono"):
        frame_bytes = w * h
    else:
        raise ValueError(f"unsupported colorspace {colorspace!r}")
    frames = []
    i = nl + 1
    while i < len(content):
        fnl = content.find(b"\n", i)
        if fnl < 0 or content[i : i + 5] != b"FRAME":
            break
        start = fnl + 1
        luma = np.frombuffer(content, dtype=np.uint8, count=w * h,
                             offset=start).reshape(h, w)
        frames.append(luma)
        i = start + frame_bytes
    return frames, w, h, fps


def encode_y4m(frames, fps_num: int = 25, fps_den: int = 1) -> bytes:
    """list of (h, w) uint8 luma planes -> mono YUV4MPEG2 bytes."""
    h, w = frames[0].shape
    out = [b"YUV4MPEG2 W%d H%d F%d:%d Im A1:1 Cmono\n" % (w, h, fps_num, fps_den)]
    for f in frames:
        out.append(b"FRAME\n")
        out.append(f.astype(np.uint8).tobytes())
    return b"".join(out)


def decode_image(content: bytes, use_stub: bool = True) -> np.ndarray:
    """Dispatch on magic bytes: PPM/PGM and 24-bit BMP decode for real;
    anything else (PNG/JPEG/...) falls back to the deterministic stub, or
    raises with use_stub=False."""
    content = content or b""
    if content[:2] in (b"P6", b"P5"):
        return decode_ppm(content)
    if content[:2] == b"BM":
        return decode_bmp(content)
    return decode_image_stub(content, use_stub)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Real nearest-neighbor resample via numpy index mapping."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]


def extract_image_features(media: DataFrame, dim: int = 16,
                           use_stub: bool = True) -> DataFrame:
    """decode -> pooled feature vector per media item (Arrow-batched).
    Output drops the binary payload: (media_ref, doc_id, feature array)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                img = decode_image(bytes(content or b""), use_stub)
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


def extract_audio_features(media: DataFrame, n_windows: int = 16,
                           use_stub: bool = True) -> DataFrame:
    """Audio feature extraction: PCM WAV decodes FOR REAL (mono-mixed,
    per-window RMS energy profile, L2-normalized) — compressed formats
    (mp3/aac) route to the deterministic stub. Output drops the payload:
    (media_ref, doc_id, feature array, sample_rate)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, rates = [], []
            for content in pdf["content"]:
                raw = bytes(content or b"")
                if raw[:4] == b"RIFF":
                    samples, rate = decode_wav(raw)
                    mono = samples.astype(np.float64).mean(axis=1)
                    n = max(1, len(mono) // n_windows)
                    # clips shorter than n_windows samples leave trailing
                    # windows empty; np.mean([]) is NaN (and NaN is truthy,
                    # so `or 0.0` would NOT catch it) — guard on length
                    windows = [mono[i * n:(i + 1) * n] for i in range(n_windows)]
                    rms = np.array([
                        np.sqrt(np.mean(s ** 2)) if len(s) else 0.0
                        for s in windows
                    ])
                else:
                    if not use_stub:
                        raise NotImplementedError(
                            "compressed audio decode requires ffmpeg"
                        )
                    h = hashlib.sha256(raw).digest()
                    rms = np.frombuffer(
                        (h * ((n_windows // 32) + 1))[:n_windows], np.uint8
                    ).astype(np.float64)
                    rate = 0
                norm = np.linalg.norm(rms) or 1.0
                feats.append((rms / norm).astype(np.float32).tolist())
                rates.append(int(rate))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "doc_id": pdf["doc_id"],
                    "feature": feats,
                    "sample_rate": rates,
                }
            )

    return media.select("media_ref", "doc_id", "content").mapInPandas(
        run,
        schema="media_ref string, doc_id string, feature array<float>,"
        " sample_rate int",
    )


def resize_images(media: DataFrame, width: int, height: int,
                  use_stub: bool = True) -> DataFrame:
    """Resize: decodes, resamples nearest-neighbor (REAL for PPM/PGM/BMP
    inputs), re-encodes as binary PPM with updated dims. Only non-decodable
    formats route through the stub (whose 'resize' is a deterministic
    digest — plumbing only)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            resized = []
            mimes = []
            for content, mime in zip(pdf["content"], pdf["mime_type"]):
                raw = bytes(content or b"")
                if raw[:2] in (b"P6", b"P5", b"BM"):
                    img = resize_nearest(decode_image(raw), width, height)
                    resized.append(encode_ppm(img))
                    mimes.append("image/x-portable-pixmap")
                else:
                    img = decode_image_stub(raw, use_stub)
                    resized.append(hashlib.sha256(img.tobytes()).digest())
                    mimes.append(mime)
            out["content"] = resized
            out["mime_type"] = mimes
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
                raw = bytes(content or b"")
                if raw.startswith(b"YUV4MPEG2"):
                    # REAL sampling: pick the frame at each timestamp from
                    # the decoded stream; emit it as a decodable gray PPM
                    frames, _w, _h, fps = decode_y4m_frames(raw)
                    fps = fps or 25.0
                    duration = int(len(frames) / fps * 1000)
                    for idx, ts in enumerate(range(0, duration, every_ms)):
                        fi = min(int(ts * fps / 1000), len(frames) - 1)
                        rows.append(
                            (ref, doc_id, idx, ts, encode_ppm(frames[fi]))
                        )
                    continue
                if not use_stub:
                    raise NotImplementedError(
                        "non-Y4M video decode requires ffmpeg"
                    )
                duration = int(dur) if dur is not None and not pd.isna(dur) else 3000
                for idx, ts in enumerate(range(0, duration, every_ms)):
                    frame = hashlib.sha256(
                        raw + ts.to_bytes(8, "little")
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
