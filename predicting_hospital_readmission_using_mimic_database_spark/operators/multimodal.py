"""Multimodal column plumbing (north-star surface).

Images / audio / video ride through the engine as opaque ``binary``
columns plus typed metadata — the Spark-side machinery (schemas, Arrow
batch transport, ``mapInPandas`` partition iteration, batch sizing) is
REAL and tested; the codec itself is stubbed because no image/audio
library ships in this container:

- ``decode_stub_features`` raises ``NotImplementedError`` when asked for a
  real codec, and provides ``fake_decoder`` — a deterministic
  bytes->features transform (content-hash-seeded) with the exact signature
  a real decoder (PIL / torchaudio / pyav) would slot into;
- everything around the decoder — blob manifest schema, partition-wise
  Arrow batching, feature schema, frame sampling arithmetic — is live
  code a user swaps a real codec into.

Scale posture: blobs stay columnar (parquet binary); decode fans out via
``mapInPandas`` (one Python worker per partition, Arrow-batched);
per-batch rows bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
so a partition of large blobs never materializes at once.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: manifest schema for binary assets (the parquet layout a real ingest
#: writes: content + typed metadata; blobs NEVER go through string columns)
BLOB_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("content", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(DoubleType()), False),
    ]
)


def synthetic_blobs(spark, n: int = 64, partitions: int = 4) -> DataFrame:
    """Deterministic fake asset manifest (content = seeded bytes) used by
    tests and the mm1 query entry — stands in for a real ingest."""
    rows = []
    for i in range(n):
        media = ("image", "audio", "video")[i % 3]
        content = hashlib.sha256(f"asset-{i}".encode()).digest() * (1 + i % 5)
        rows.append(
            (i, media, content, 64 + i % 512, 64 + (i * 3) % 512, 1000 * (1 + i % 30))
        )
    return spark.createDataFrame(rows, BLOB_SCHEMA).repartition(partitions)


def fake_decoder(content: bytes) -> list[float]:
    """Deterministic stand-in for a codec: FEATURE_DIM doubles derived from
    the content digest. Same bytes -> same features, any engine."""
    dg = hashlib.sha256(content or b"").digest()
    return [dg[i] / 255.0 for i in range(FEATURE_DIM)]


def decode_stub_features(df: DataFrame, real_codec: bool = False) -> DataFrame:
    """Blob manifest -> per-asset feature rows via ``mapInPandas``.

    ``real_codec=True`` is the seam for PIL/torchaudio/pyav — not
    available in this environment, so it raises (clearly marked stub).
    The surrounding plumbing (Arrow batches, schema, partition fan-out)
    is the production path.
    """
    if real_codec:
        raise NotImplementedError(
            "media codecs (PIL/torchaudio/pyav) are not installed in this "
            "environment; plug the real decoder into fake_decoder's seam"
        )

    def decode(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:  # one Arrow batch at a time — bounded memory
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["content"].map(lambda b: len(b or b"")),
                    "features": pdf["content"].map(fake_decoder),
                }
            )

    return df.mapInPandas(decode, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video frame-sampling arithmetic (pure plan, no decode): one output
    row per sampled timestamp — the explode a real frame extractor feeds."""
    # duration <= 0 (corrupt/zero-length asset) yields zero frames rather
    # than an illegal descending sequence
    vids = df.filter((F.col("media_type") == "video") & (F.col("duration_ms") > 0))
    return vids.select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
