"""Multimodal columns: images/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch
shapes, mapInPandas iterator signatures, partition-preserving feature
extraction. Codec coverage is split honestly:

- REAL decoders (pure numpy + stdlib struct, no external libraries):
  uncompressed 24-bit BMP, PCM 16-bit WAV, and binary PPM (P6). These
  parse headers, validate geometry, and featureize the decoded
  pixels/samples (luminance histogram + block means for images,
  amplitude histogram + chunk RMS for audio) — exercised end-to-end
  through mapInPandas by tests/test_streaming_multimodal.py.
- Everything else (JPEG/PNG/MP3/MP4...) needs codec libraries this
  container does not ship: ``_try_decode_real`` raises
  NotImplementedError for those, and ``deterministic_fake=True``
  substitutes a stable bytes-statistics featureizer so the full
  pipeline shape (decode -> features -> embedding dedup / ANN) stays
  testable.

Media table shape:
    media_id BIGINT, kind STRING ('image'|'audio'|'video'),
    content BINARY, meta MAP<STRING,STRING>
"""

from __future__ import annotations

import math
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("content", T.BinaryType(), False),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_DIM = 64

_FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, feature array<float>"
)


def decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> (H, W, 3) uint8 RGB. Bottom-up rows,
    BGR byte order, rows padded to 4 bytes (Windows BITMAPINFOHEADER)."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP file")
    data_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size = struct.unpack_from("<I", content, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    if data_off + row_bytes * height > len(content):
        raise ValueError("BMP truncated")
    raw = np.frombuffer(content, np.uint8, row_bytes * height, data_off)
    rows = raw.reshape(height, row_bytes)[:, : width * 3]
    img = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img


def decode_wav(content: bytes) -> np.ndarray:
    """PCM 16-bit WAV -> float32 samples in [-1, 1] (channels
    interleaved-averaged to mono)."""
    if len(content) < 44 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV file")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = struct.unpack_from("<I", content, pos + 4)[0]
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, _rate, _brate, _align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM 16-bit WAV (got format={audio_format}, bits={bits})"
        )
    x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    if channels > 1:
        x = x[: len(x) - len(x) % channels].reshape(-1, channels).mean(axis=1)
    return x


def decode_ppm(content: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval <= 255) -> (H, W, 3) uint8 RGB."""
    if content[:2] != b"P6":
        raise ValueError("not a P6 PPM file")
    # header = magic + 3 whitespace-separated ints, '#' comments allowed
    vals, pos = [], 2
    while len(vals) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    need = width * height * 3
    if pos + need > len(content):
        raise ValueError("PPM truncated")
    return np.frombuffer(content, np.uint8, need, pos).reshape(height, width, 3)


def _image_features(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> 64-dim: 32-bin luminance histogram (mass-
    normalized) + 32 raster-block luminance means, L2-normalized."""
    lum = (
        0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    ).astype(np.float32).ravel()
    hist = np.bincount(
        np.minimum(lum / 8.0, 31).astype(np.int64), minlength=32
    ).astype(np.float32)
    hist /= max(len(lum), 1)
    blocks = np.array(
        [c.mean() if len(c) else 0.0 for c in np.array_split(lum, 32)],
        np.float32,
    ) / 255.0
    v = np.concatenate([hist, blocks])
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _audio_features(x: np.ndarray) -> np.ndarray:
    """float samples in [-1, 1] -> 64-dim: 32-bin amplitude histogram
    + 32 chunk RMS values, L2-normalized."""
    if len(x) == 0:
        return np.zeros(FEATURE_DIM, np.float32)
    hist = np.bincount(
        np.minimum((x + 1.0) * 16.0, 31).astype(np.int64), minlength=32
    ).astype(np.float32) / len(x)
    rms = np.array(
        [np.sqrt((c**2).mean()) if len(c) else 0.0 for c in np.array_split(x, 32)],
        np.float32,
    )
    v = np.concatenate([hist, rms])
    n = np.linalg.norm(v)
    return v / n if n > 0 else v


def _try_decode_real(kind: str, content: bytes) -> np.ndarray:
    """Container-sniffing decode -> 64-dim feature vector. Pure numpy
    decoders for BMP / WAV / PPM; other containers (JPEG/PNG/MP3/...)
    need codec libraries this environment does not ship."""
    if content[:2] == b"BM":
        return _image_features(decode_bmp(content))
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return _audio_features(decode_wav(content))
    if content[:2] == b"P6":
        return _image_features(decode_ppm(content))
    raise NotImplementedError(
        f"no codec for this {kind} container in this environment "
        "(BMP/WAV/PPM decode natively; pass deterministic_fake=True "
        "for the bytes-statistics featureizer)"
    )


def _fake_features(content: bytes) -> np.ndarray:
    """Deterministic stand-in featureizer: bucketed byte histograms +
    coarse positional means, L2-normalized. Stable across runs."""
    b = np.frombuffer(content or b"\x00", dtype=np.uint8)
    hist = np.bincount(b % 32, minlength=32).astype(np.float32)
    # Exact float64 accumulation with ONE float32 rounding per
    # component: chunk sums are integer-valued (exact in float64 at
    # any summation order) and the norm uses math.fsum (correctly
    # rounded), so the result is bit-reproducible across numpy
    # versions/BLAS backends — np.mean/np.linalg.norm's pairwise
    # float32 summation order is an implementation detail that is
    # not. This also makes the vector exactly re-derivable from a
    # pure-Python reference (tests/test_properties.py pins it);
    # float32(float64 op) == direct float32 op for +,-,*,/ since
    # 53 >= 2*24+2 (Figueroa), so the divisions below are still
    # true float32 semantics.
    chunks = np.array_split(b.astype(np.float64), 32)
    means = np.array([c.mean() if len(c) else 0.0 for c in chunks], np.float32)
    v = np.concatenate([hist, means])
    sq = v.astype(np.float64)
    n = np.float32(math.sqrt(math.fsum((sq * sq).tolist())))
    return v / n if n > 0 else v


def extract_features(
    media: DataFrame, deterministic_fake: bool = False, batch_hint: int | None = None
) -> DataFrame:
    """mapInPandas: (media table) -> (media_id, kind, n_bytes, feature).

    Partition-preserving (no shuffle); Arrow streams binary content in
    bounded batches, so executor memory scales with batch size, not
    partition size.
    """

    def op(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, sizes = [], []
            for kind, content in zip(pdf["kind"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                sizes.append(len(raw))
                if deterministic_fake:
                    feats.append(_fake_features(raw))
                else:
                    feats.append(_try_decode_real(kind, raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(op, schema=_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: emits (media_id, frame_index) rows
    JVM-side from meta['n_frames'] — the decode of each frame is the
    stubbed step. Demonstrates the explode-then-decode partitioning
    shape used for real codecs."""
    n_frames = F.coalesce(
        F.element_at("meta", F.lit("n_frames")).cast("int"), F.lit(0)
    )
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_index"),
    ).where(n_frames > 0)
