"""Multimodal column plumbing: media spans as opaque references/binary with
typed metadata, processed by Arrow-batched ``mapInPandas``.

The corpus interleaves text and media spans (input_hint). Media payloads are
treated as opaque ``binary`` columns with typed metadata; decode /
feature-extract runs as a ``mapInPandas`` stage so each Arrow batch maps to
one vectorized Python call — the Spark-side plumbing (schema, partitioning,
UDF signature, batch shape) is real and tested.

The actual image decode is STUBBED: this container has no image/audio
libraries, so ``decode_stub`` derives deterministic fake features from the
media_ref digest, and ``decode_real`` raises NotImplementedError with the
integration point documented. Swapping in PIL/torchvision later changes one
function, not the plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURES_SCHEMA = ("doc_id string, media_ref string, span_offset int, "
                         "width int, height int, feat array<float>")


def media_inventory(docs: DataFrame) -> DataFrame:
    """All media spans with their position — map-only span filter."""
    return (docs.select(
        "doc_id",
        F.explode(F.filter("spans",
                           lambda s: s["kind"] == F.lit("media"))).alias("s"))
        .select("doc_id",
                F.col("s.media_ref").alias("media_ref"),
                F.col("s.text").alias("caption"),
                F.col("s.offset").alias("span_offset")))


def decode_real(payload: bytes):
    """Integration point for a real decoder (PIL.Image.open etc.)."""
    raise NotImplementedError(
        "media decode requires an image library not present in this "
        "environment; wire PIL/torchvision here")


def _fake_decode(media_ref: str, feat_dim: int = 8):
    h = hashlib.md5(media_ref.encode()).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    feat = [((h[i % 16] / 255.0) * 2 - 1) for i in range(feat_dim)]
    return width, height, feat


def extract_media_features(docs: DataFrame, feat_dim: int = 8) -> DataFrame:
    """mapInPandas media feature extraction. Partitioning: inherits the doc
    partitioning (media spans stay co-located with their document); each
    Arrow batch is decoded vectorized."""
    inv = media_inventory(docs)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(m, feat_dim) for m in pdf["media_ref"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "span_offset": pdf["span_offset"],
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "feat": [d[2] for d in decoded],
            })

    return inv.mapInPandas(decode_batches, MEDIA_FEATURES_SCHEMA)
