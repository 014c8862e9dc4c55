"""Deterministic synthetic Common-Crawl-style webpages (FIXTURES.md F7).

Schema follows BASELINE.json input_hint exactly:
    url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING
plus a test-only ``true_cluster_id`` labelling planted near-duplicate
families for recall measurement.

Families planted (seeded, reproducible):
- exact copies (different url, byte-identical text)
- char-typo variants (low rate => Jaccard >= ~0.9 on word shingles)
- OCR-confusion variants (tables from reference recurse.go:7-41)
- prefix truncations (substring containment)
- boilerplate-wrapped copies (shared header/footer)
- distinct singleton documents

The per-row invariant "byte-identical extracted text per url" is
honored by construction: html = header + text + footer, and
``extract_text(html)`` (below) returns exactly the ``text`` bytes.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from fuzzy_matcher_spark.functions.similarity import OCR_SINGLE

_WORDS = (
    "the a of to and in for on with data page web site news article store "
    "product review comment user profile search query result index table "
    "spark shuffle partition join filter scan merge sort window hash "
    "stream batch value count group order line item event click view "
    "price offer ship cart buy sell open close fast slow small large "
    "green blue red market house garden river mountain city road bridge"
).split()

_HTML_HEAD = b"<html><head><title>synthetic</title></head><body><p>"
_HTML_TAIL = b"</p></body></html>"

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("true_cluster_id", T.LongType(), False),
        T.StructField("doc_id", T.LongType(), False),
    ]
)

_BOILER_HEAD = "home about contact login subscribe newsletter "
_BOILER_TAIL = " copyright all rights reserved privacy terms cookies"


def extract_text(html: bytes) -> str:
    """Deterministic text extraction; inverse of the generator's html
    wrapping. extract_text(html) == text byte-for-byte (input_hint)."""
    body = html[len(_HTML_HEAD) : len(html) - len(_HTML_TAIL)]
    return body.decode("utf-8")


def _base_text(rng: random.Random, n_words: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n_words))


def _typo(rng: random.Random, text: str, n_typos: int) -> str:
    chars = list(text)
    alnum_idx = [i for i, c in enumerate(chars) if c.isalnum()]
    for i in rng.sample(alnum_idx, min(n_typos, len(alnum_idx))):
        chars[i] = rng.choice("abcdefghijklmnopqrstuvwxyz0123456789")
    return "".join(chars)


def _ocr_corrupt(rng: random.Random, text: str, n_subs: int) -> str:
    chars = list(text)
    idx = [i for i, c in enumerate(chars) if c in OCR_SINGLE]
    for i in rng.sample(idx, min(n_subs, len(idx))):
        chars[i] = rng.choice(OCR_SINGLE[chars[i]])
    return "".join(chars)


def generate_webpage_rows(
    n_families: int = 60,
    singletons: int = 120,
    seed: int = 42,
    words_per_doc: int = 120,
) -> list[tuple]:
    """Rows matching SCHEMA. Deterministic in (n_families, singletons,
    seed, words_per_doc)."""
    rng = random.Random(seed)
    t0 = datetime(2025, 6, 1, tzinfo=timezone.utc)
    rows: list[tuple] = []
    doc_id = 0
    cluster = 0

    def emit(text: str, cluster_id: int) -> None:
        nonlocal doc_id
        url = f"https://example.org/p/{doc_id:08d}"
        ts = t0 + timedelta(minutes=doc_id)
        html = _HTML_HEAD + text.encode("utf-8") + _HTML_TAIL
        lang = ("en", "de", "es", "fr")[doc_id % 4]
        rows.append((url, ts, html, text, lang, cluster_id, doc_id))
        doc_id += 1

    for _ in range(n_families):
        base = _base_text(rng, words_per_doc)
        emit(base, cluster)
        kind = rng.randrange(5)
        if kind == 0:  # exact copies
            for _ in range(rng.randint(1, 3)):
                emit(base, cluster)
        elif kind == 1:  # char typos (few => high word-shingle Jaccard)
            emit(_typo(rng, base, 2), cluster)
        elif kind == 2:  # OCR confusions
            emit(_ocr_corrupt(rng, base, 3), cluster)
        elif kind == 3:  # prefix truncation (keep ~90%)
            words = base.split()
            emit(" ".join(words[: int(len(words) * 0.92)]), cluster)
        else:  # boilerplate-wrapped copy
            emit(_BOILER_HEAD + base + _BOILER_TAIL, cluster)
        cluster += 1

    for _ in range(singletons):
        emit(_base_text(rng, words_per_doc), cluster)
        cluster += 1

    return rows


def webpages_df(
    spark: SparkSession,
    n_families: int = 60,
    singletons: int = 120,
    seed: int = 42,
    words_per_doc: int = 120,
    partitions: int | None = None,
) -> DataFrame:
    rows = generate_webpage_rows(n_families, singletons, seed, words_per_doc)
    df = spark.createDataFrame(rows, SCHEMA)
    return df.repartition(partitions) if partitions else df
