"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The container has no image/audio libraries, so the *decode* step is a
clearly-marked deterministic stub — but everything Spark-side is real and
tested: binary columns, typed metadata struct, Arrow-batched mapInPandas
feature extraction (batch shape, schema, partitioning), and the manifest
query surface.

At 100TB: binaries live in the lake as parquet binary columns (or object
storage refs); decode/feature-extract runs as mapInPandas so each Arrow
batch amortizes Python/JVM transfer; partitioning by media_id hash keeps
batches balanced; never collect binaries to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("n_frames_sampled", T.IntegerType()),
    ]
)

MEDIA_TYPES = ["image/png", "audio/wav", "video/mp4"]


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media over the documents table: payload = utf-8
    bytes of text; metadata derived from doc_id. Stands in for real blobs
    so the plumbing (binary column through shuffle + Arrow) is exercised."""
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]), (F.pmod(F.col("doc_id"), F.lit(3)) + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            (F.pmod(F.col("doc_id"), F.lit(1920)) + 1).cast("int").alias("width"),
            (F.pmod(F.col("doc_id"), F.lit(1080)) + 1).cast("int").alias("height"),
            (F.pmod(F.col("doc_id"), F.lit(60000))).cast("long").alias("duration_ms"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes, media_type: str) -> dict:
    """STUB decoder. A real deployment would dispatch to PIL/librosa/ffmpeg
    here; those libs are absent in this container, so features are a
    deterministic function of the bytes (keeps tests meaningful)."""
    digest = hashlib.sha256(payload).hexdigest()
    return {
        "n_bytes": len(payload),
        "digest": digest,
        # pseudo-random-in-[0,1] "feature", a pure function of the payload
        # digest so the WHOLE feature row is SQL-expressible and the driver
        # gate can hash-match it (single IEEE divide — bit-identical in
        # Python and DuckDB)
        "feat_mean": int(digest[:8], 16) / 4294967295.0,
        "n_frames_sampled": (len(payload) % 7) + 1,
    }


def decode_real(payload: bytes, media_type: str):
    """The real decode hook — intentionally unimplemented in-sandbox."""
    raise NotImplementedError(
        "media decode requires PIL/librosa/ffmpeg, not present in this environment"
    )


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).
    This is the pattern for any Python-side media op: iterate pandas
    batches, vectorize inside the batch, never per-row Python UDFs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            yield out

    # repartition by media hash: balanced Arrow batches regardless of how
    # the source files were laid out; width follows cluster parallelism
    # (never a hardcoded count — 32 would cap a 1000-executor cluster)
    n = media.sparkSession.sparkContext.defaultParallelism
    balanced = media.repartition(F.pmod(F.xxhash64("media_id"), F.lit(n)))
    return balanced.mapInPandas(run, FEATURE_SCHEMA)
