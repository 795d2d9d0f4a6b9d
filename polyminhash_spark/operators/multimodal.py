"""Multimodal column plumbing — training-data-pipeline extra.

Image/audio/video payloads are opaque `binary` columns with typed
metadata; decode/feature-extraction runs as Arrow-batched
`mapInPandas` so each Python worker sees whole record batches.

Decoders (operators/media_codecs.py): `decoder="real"` decodes
PGM/PPM images (pure numpy netpbm parsing -> 4x4 mean-luma grid
feature) and PCM WAV audio (stdlib `wave` -> 16-bucket RMS envelope)
with NO external libraries; formats that genuinely need external
codecs (JPEG/PNG/MP4) raise NotImplementedError naming the plug-in
point.  `decoder="fake"` produces deterministic sha-seeded features so
pipeline tests exercise real batch shapes without media fixtures.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),        # image | audio | video
    StructField("mime", StringType()),
    StructField("payload", BinaryType()),      # opaque bytes
    StructField("width", IntegerType()),       # typed metadata (nullable)
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("payload_sha", StringType()),
    StructField("feature", ArrayType(FloatType())),  # decoded embedding
])

FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: features are
    a pure function of the bytes, so tests exercise real batch shapes."""
    dig = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(dig[: FEATURE_DIM * 2], dtype=np.uint16)
    return (arr.astype(np.float32) / 65535.0)


def extract_features(media: DataFrame, decoder: str = "fake",
                     batch_size_hint: int = 256) -> DataFrame:
    """media (MEDIA_SCHEMA) -> FEATURE_SCHEMA via mapInPandas.

    At scale: payloads are large, so the input should be repartitioned
    by size (`spark.sql.files.maxPartitionBytes` governs the scan);
    this operator keeps batches Arrow-sized and never concatenates
    payloads across rows."""
    if decoder not in ("fake", "real"):
        raise ValueError(decoder)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from polyminhash_spark.operators.media_codecs import real_decode_feature

        for pdf in it:
            n = len(pdf)
            feats = [None] * n
            shas = [None] * n
            sizes = np.zeros(n, dtype=np.int64)
            for i in range(n):
                payload = bytes(pdf["payload"].iloc[i] or b"")
                if decoder == "real":
                    feats[i] = real_decode_feature(payload, pdf["mime"].iloc[i])
                else:
                    feats[i] = _fake_decode(payload)
                shas[i] = hashlib.sha256(payload).hexdigest()
                sizes[i] = len(payload)
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "kind": pdf["kind"].values,
                "n_bytes": sizes,
                "payload_sha": shas,
                "feature": feats,
            })

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled
    timestamp (the decode itself is the stub above).  JVM-side row
    expansion — `sequence` + explode, no Python in the expansion."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ms",
            F.explode(F.expr(
                f"sequence(0, greatest(coalesce(duration_ms, 0) - 1, 0), {every_ms})")))
        .select("media_id", "mime", "frame_ms", "payload")
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Test helper: fabricate a deterministic media table from the
    documents table (payload = utf-8 bytes of text)."""
    return docs.select(
        F.concat(F.lit("m"), F.col("doc_id").cast("string")).alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
         .when(F.col("doc_id") % 3 == 1, "audio")
         .otherwise("video").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.col("text").cast("binary").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(64)).alias("width"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(64)).alias("height"),
        F.when(F.col("doc_id") % 3 == 2,
               (F.col("doc_id") % 10 + 1) * 1000).cast("long").alias("duration_ms"),
    )
