"""Multimodal (image/audio/video) column support.

Convention: a modality lives in an opaque ``binary`` payload column
plus a typed metadata struct (mime, width/height/duration, …). All
per-payload compute (decode, resize, frame-sample, feature-extract)
runs as Arrow-batched ``mapInPandas`` stages — the payload bytes never
round-trip through Python row-at-a-time, and partitioning is governed
by ``spark.sql.files.maxPartitionBytes`` exactly like any other
binary-heavy scan.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so ``decode_image`` is a clearly-marked stub: the Spark-side plumbing
(schema, batch iteration, output contract) is real and tested with
the deterministic fake decoder.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: metadata struct every multimodal table carries alongside `payload`
MEDIA_META_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", LongType()),
    ]
)


def decode_image(payload: bytes) -> dict:
    """STUB — image codecs are not installed in this container.

    Real deployments plug PIL/torchvision here. The deterministic
    fake below derives pseudo-dimensions from the payload bytes so the
    distributed plumbing (batching, schema, partitioning) is testable.
    """
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    return {
        "width": 16 + checksum % 1024,
        "height": 16 + (checksum * 7) % 1024,
        "mean_luma": checksum % 256,
    }


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo adapter: derive a binary payload column from text (the
    fixtures carry no real media; real pipelines read binary parquet
    or `binaryFile` sources)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder: Callable[[bytes], dict] = decode_image,
) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, narrow
    schema out (payload column is dropped — never carry bytes past
    the stage that needs them)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p if p is not None else b"") for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[payload_col].map(
                        lambda p: len(p) if p is not None else 0
                    ).astype("int64"),
                    "width": pd.Series([f["width"] for f in feats], dtype="int32"),
                    "height": pd.Series([f["height"] for f in feats], dtype="int32"),
                    "mean_luma": pd.Series(
                        [f["mean_luma"] for f in feats], dtype="int64"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)
