"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas``.

The Spark-side machinery — schema contract, Arrow batch shape, partition
behavior — is real and tested. The *codec* step is a clearly marked STUB:
this container ships no image/audio libraries, so ``decode_stub`` derives
deterministic pseudo-features from the bytes (sha256-seeded). On a real
cluster you swap ``_decode_bytes`` for PIL/librosa/pyav; nothing else
changes — the UDF signature, batch iteration, and output schema are the
production shape.

Schema contract for a multimodal table::

    media_id: long, kind: string ('image'|'audio'|'video'),
    payload: binary, meta: struct<width:int, height:int,
    sample_rate:int, duration_ms:int>
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("payload_sha256", T.StringType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def _decode_bytes(payload: bytes) -> list[float]:
    """STUB codec — deterministic fake features from the byte content.

    Real deployment replaces this body with e.g.::

        img = PIL.Image.open(io.BytesIO(payload)).resize((224, 224))
        return model_preprocess(img)

    (PIL/librosa are not installed in this container.) The fake is a pure
    function of the bytes, so tests are reproducible and parity-checkable.
    """
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract every media row via ``mapInPandas``.

    One Arrow batch in → one out; the Python loop is per *batch element*
    inside pandas, never a per-row JVM↔Python round trip. Partitioning is
    preserved — at 100 TB, repartition upstream so each task's batch of
    payloads fits executor memory (payload bytes dominate)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)).astype(
                        "int64"
                    ),
                    "payload_sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "features": payloads.map(lambda b: _decode_bytes(b or b"")),
                }
            )

    return df.mapInPandas(decode, schema=FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024, frame_bytes: int = 64) -> DataFrame:
    """Video frame-sampling plumbing: explode each payload into fixed-stride
    byte windows (stand-in for keyframe extraction). JVM-side slicing — the
    explode and substring run in codegen; no Python at all."""
    n_frames = F.greatest(
        F.lit(1), (F.length("payload") / every_n_bytes).cast("int")
    )
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no", "_i"),
            F.col("payload"),
        )
        .select(
            "media_id",
            F.col("frame_no").cast("long").alias("frame_no"),
            F.substring(
                F.col("payload"), F.col("frame_no") * every_n_bytes + 1, frame_bytes
            ).alias("frame_bytes"),
        )
    )


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (test fixture): payload bytes are
    a pure function of media_id."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.repeat(
        F.sha2(F.concat(F.lit("media:"), F.col("id").cast("string")), 256), 48
    ).cast("binary")
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        kinds.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(480).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit(5000).alias("duration_ms"),
        ).alias("meta"),
    )
