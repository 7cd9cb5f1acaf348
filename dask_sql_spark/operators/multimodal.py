"""Multimodal column plumbing: image/audio/video as opaque binary columns.

Design (SURVEY.md §7 M6): media payloads are ``binary`` columns carried
alongside typed metadata; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` pipelines, so executors stream batches
without materializing whole partitions.

The actual codecs (PIL / torchaudio / av) are NOT in this container, so the
decode step is STUBBED: :func:`decode_image` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder derives
(width, height, channels, mean_byte) from the payload bytes. The Spark-side
plumbing — schema, batch iteration, partitioning — is real and tested; a
deployment swaps `_fake_decode` for the real codec without touching the
plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha1", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def attach_binary(df: DataFrame, source_col: str, out_col: str = "payload") -> DataFrame:
    """Materialize a binary payload column (UTF-8 encode of a string column
    — stands in for real media bytes read from a lake)."""
    return df.withColumn(out_col, F.encode(F.col(source_col), "UTF-8"))


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake image decode: dimensions derived from md5 bytes
    (md5, not sha1, so the DuckDB oracle can reproduce the values).
    Placeholder for PIL/av — stable across runs and engines."""
    digest = hashlib.md5(payload).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    channels = 1 + digest[2] % 4
    mean_byte = round(sum(payload) / len(payload), 4) if payload else 0.0
    return width, height, channels, mean_byte


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int, int, float]:
    """Decode one image payload. Real codecs are unavailable in this
    environment — set ``fake=True`` for the deterministic stub."""
    if not fake:
        raise NotImplementedError(
            "Image codecs (PIL/cv2) are not installed in this environment; "
            "pass fake=True for the deterministic stub decoder"
        )
    return _fake_decode(payload)


def extract_image_meta(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = True,
) -> DataFrame:
    """(id, byte_len, sha1, width, height, channels, mean_byte) via
    mapInPandas — the canonical decode/feature-extract batch shape.

    Arrow batches stream through Python once; everything before/after stays
    JVM-side. Partitioning is inherited (narrow transform, no shuffle).
    """
    out_schema = T.StructType(
        [df.schema[id_col]] + list(IMAGE_META_SCHEMA.fields)
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            decoded = [decode_image(p, fake=fake) for p in payloads]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "byte_len": [len(p) for p in payloads],
                    "sha1": [hashlib.sha1(p).hexdigest() for p in payloads],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                    "mean_byte": [d[3] for d in decoded],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_extract, out_schema)


def resize_stub(df: DataFrame, payload_col: str = "payload", size: int = 224) -> DataFrame:
    """Resize plumbing: passes payloads through mapInPandas with the target
    size recorded — the real resize drops into `_resize_batch`."""

    def _resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["resized_to"] = size  # real impl: decoded→resized bytes
            yield out

    schema = T.StructType(list(df.schema.fields) + [T.StructField("resized_to", T.IntegerType())])
    return df.mapInPandas(_resize_batch, schema)
