"""Multimodal columns: images/audio/video as opaque binary + metadata.

The Spark-side plumbing is real and tested — schemas, Arrow batch
shapes, mapInPandas iterator signatures, partition-preserving feature
extraction. The *codec* step is stubbed (this container ships no
image/audio libraries): ``decode`` raises NotImplementedError unless
``deterministic_fake=True``, which derives a fixed-dimension feature
vector from the bytes' rolling statistics — stable, seedless, and
useful for testing the full pipeline shape (decode -> features ->
embedding dedup / ANN).

Media table shape:
    media_id BIGINT, kind STRING ('image'|'audio'|'video'),
    content BINARY, meta MAP<STRING,STRING>
"""

from __future__ import annotations

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


def _try_decode_real(kind: str, content: bytes):
    """Real decoders would live here (PIL / torchaudio / pyav). None of
    them ship in this container — always unavailable."""
    raise NotImplementedError(
        f"no {kind} codec available in this environment; pass "
        "deterministic_fake=True for the test featureizer"
    )


def _fake_features(content: bytes) -> np.ndarray:
    """Deterministic stand-in featureizer: bucketed byte histograms +
    coarse positional means, L2-normalized. Stable across runs."""
    b = np.frombuffer(content or b"\x00", dtype=np.uint8)
    hist = np.bincount(b % 32, minlength=32).astype(np.float32)
    chunks = np.array_split(b.astype(np.float32), 32)
    means = np.array([c.mean() if len(c) else 0.0 for c in chunks], np.float32)
    v = np.concatenate([hist, means])
    n = np.linalg.norm(v)
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
                    _try_decode_real(kind, raw)
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
