"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape, ``mapInPandas`` UDF signatures. The actual media decoding is
STUBBED (``decode_backend="fake"``): the container has no image/audio
libraries, so the decode step either raises ``NotImplementedError``
(``decode_backend="real"``) or produces a deterministic fake feature
vector derived from the bytes. Swapping in a real backend (PIL/ffmpeg)
changes only ``_decode_one``.

Design for 100 TB of media:
- media stays an opaque ``binary`` column; all filtering/joins happen on
  the typed metadata columns so parquet predicate pushdown + column
  pruning mean the binary bytes are only read by the decode stage;
- decode runs in ``mapInPandas`` with a bounded Arrow batch size — each
  Python worker streams batches, never materializing a partition;
- feature extraction emits fixed-length float arrays, so downstream ANN
  (operators/similarity.py) applies unchanged.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("media", BinaryType(), False),  # opaque encoded bytes
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),  # image/video
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),  # audio/video
    ]
)

FEATURE_DIM = 32

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def generate_media(
    spark: SparkSession, n: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Deterministic synthetic media table (executor-side, no driver data):
    bytes are a seeded hash stream, metadata follows the modality."""
    base = spark.range(0, n, numPartitions=partitions).select(
        F.col("id").alias("media_id")
    )
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("media_id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
    )
    payload_len = (F.pmod(F.xxhash64("media_id", F.lit(seed + 1)), F.lit(4096)) + 64).cast("int")
    # Deterministic pseudo-bytes: repeat the hex of xxhash64 to the length.
    hexes = F.lower(F.hex(F.xxhash64("media_id", F.lit(seed + 2))))
    payload = F.encode(F.substring(F.repeat(hexes, 300), 1, 4160).substr(F.lit(1), payload_len), "utf-8")
    return base.select(
        "media_id",
        modality.alias("modality"),
        payload.alias("media"),
        F.concat(F.lit("application/x-fake-"), modality).alias("mime"),
        F.when(modality != "audio", (F.pmod(F.xxhash64("media_id", F.lit(seed + 3)), F.lit(1920)) + 16).cast("int")).alias("width"),
        F.when(modality != "audio", (F.pmod(F.xxhash64("media_id", F.lit(seed + 4)), F.lit(1080)) + 16).cast("int")).alias("height"),
        F.when(modality != "image", (F.pmod(F.xxhash64("media_id", F.lit(seed + 5)), F.lit(600000)) + 1000).cast("int")).alias("duration_ms"),
    )


def _decode_one(data: bytes, modality: str, backend: str) -> np.ndarray:
    """STUB decode → fixed-dim feature vector.

    ``backend="real"`` is the integration point for PIL/torchaudio/ffmpeg
    — not available in this container, so it raises. ``backend="fake"``
    derives a deterministic unit vector from sha256 of the bytes: stable
    across runs/partitions, which is what the plumbing tests pin.
    """
    if backend == "real":
        raise NotImplementedError(
            "real media decoding requires image/audio libs not present in "
            "this container; use decode_backend='fake'"
        )
    digest = hashlib.sha256(data + modality.encode()).digest()
    # 32 bytes → 8 uint32 → tile to FEATURE_DIM floats in [0, 1)
    ints = struct.unpack("<8I", digest)
    vec = np.array(
        [ints[i % 8] / 2**32 for i in range(FEATURE_DIM)], dtype=np.float32
    )
    n = float(np.linalg.norm(vec))
    return vec / n if n > 0 else vec


def extract_features(
    media: DataFrame, decode_backend: str = "fake", batch_size: int | None = None
) -> DataFrame:
    """media table → (media_id, modality, n_bytes, feature[FEATURE_DIM]).

    ``mapInPandas``: Arrow streams bounded batches into Python; each batch
    is decoded row-wise *inside numpy/pandas* (the per-item decode is the
    irreducibly non-vectorizable part — a real codec call), and emitted as
    one Arrow batch. No driver collect, no per-row Python UDF overhead.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_one(m, mod, decode_backend).tolist()
                for m, mod in zip(pdf["media"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["media"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    cols = media.select("media_id", "modality", "media")
    return cols.mapInPandas(decode_batches, FEATURES_SCHEMA)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    without touching the binary — pure metadata expansion that the decode
    stage consumes. Videos only; count = duration_ms // every_ms + 1."""
    vids = media.filter(F.col("modality") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
