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


def synth_media_binary(docs: DataFrame) -> DataFrame:
    """Deterministic REAL media payloads — genuine PNG and WAV bytes built
    with stdlib only (zlib/struct/wave), parameters derived from doc_id so
    tests can assert the decoded features against the generator's inputs.
    doc_id % 2 == 0 -> PNG (width = doc_id%32+1, height = doc_id%24+1,
    8-bit grayscale, constant pixel doc_id%256); odd -> WAV (sample_rate
    8000, mono 16-bit, n_frames = doc_id%400+40, constant sample value
    doc_id%1000). Runs as mapInPandas: payload synthesis is Python-side by
    necessity (byte packing), Arrow-batched, never per-row UDFs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            payloads, types, metas = [], [], []
            for i in ids:
                i = int(i)
                if i % 2 == 0:
                    w, h = i % 32 + 1, i % 24 + 1
                    payloads.append(_png_bytes(w, h, i % 256))
                    types.append("image/png")
                    metas.append({"width": w, "height": h,
                                  "duration_ms": None, "codec": "png"})
                else:
                    nf = i % 400 + 40
                    payloads.append(_wav_bytes(8000, nf, i % 1000))
                    types.append("audio/wav")
                    metas.append({"width": None, "height": None,
                                  "duration_ms": int(nf * 1000 / 8000),
                                  "codec": "pcm_s16le"})
            yield pd.DataFrame({
                "media_id": ids.values, "media_type": types,
                "payload": payloads, "meta": metas,
            })

    return docs.select("doc_id").mapInPandas(run, MEDIA_SCHEMA)


def _png_bytes(width: int, height: int, gray: int) -> bytes:
    """Minimal valid 8-bit grayscale PNG, stdlib only (zlib + struct)."""
    import struct
    import zlib

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # gray, no interlace
    raw = b"".join(b"\x00" + bytes([gray]) * width for _ in range(height))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _wav_bytes(sample_rate: int, n_frames: int, value: int) -> bytes:
    """Minimal valid mono 16-bit PCM WAV, stdlib only (wave + struct)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack("<h", value) * n_frames)
    return buf.getvalue()


def decode_real(payload: bytes, media_type: str) -> dict:
    """REAL stdlib decoders for the two formats this sandbox can parse
    without external libraries; anything else (mp4 needs ffmpeg) keeps the
    clearly-marked environment hook.

    - image/png: header + IHDR via struct, pixel stats by zlib-inflating
      the IDAT stream (8-bit grayscale, filter 0 — the synth generator's
      shape; other color types report dimensions only).
    - audio/wav: stdlib ``wave`` — sample rate, frame count, duration,
      mean |amplitude| over the 16-bit PCM frames.
    """
    import struct
    import zlib

    if media_type == "image/png":
        if payload[:8] != b"\x89PNG\r\n\x1a\n":
            raise ValueError("not a PNG stream")
        width, height, bit_depth, color_type = struct.unpack(
            ">IIBB", payload[16:26]
        )
        idat = b""
        off = 8
        while off + 8 <= len(payload):
            (ln,) = struct.unpack(">I", payload[off:off + 4])
            tag = payload[off + 4:off + 8]
            if tag == b"IDAT":
                idat += payload[off + 8:off + 8 + ln]
            off += 12 + ln
        feat_mean = None
        if bit_depth == 8 and color_type == 0 and idat:
            raw = zlib.decompress(idat)
            stride = width + 1  # leading filter byte per scanline
            pix = [b for r in range(height)
                   for b in raw[r * stride + 1:(r + 1) * stride]]
            if pix:
                feat_mean = sum(pix) / len(pix) / 255.0
        return {"width": width, "height": height, "bit_depth": bit_depth,
                "feat_mean": feat_mean, "duration_ms": None,
                "sample_rate": None}
    if media_type == "audio/wav":
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            rate, nframes, swidth = (
                w.getframerate(), w.getnframes(), w.getsampwidth()
            )
            frames = w.readframes(nframes)
        feat_mean = None
        if swidth == 2 and nframes:
            vals = struct.unpack(f"<{len(frames) // 2}h", frames)
            feat_mean = sum(abs(v) for v in vals) / len(vals) / 32768.0
        return {"width": None, "height": None, "bit_depth": swidth * 8,
                "feat_mean": feat_mean,
                "duration_ms": int(nframes * 1000 / rate),
                "sample_rate": rate}
    raise NotImplementedError(
        f"decode for {media_type!r} requires ffmpeg/PIL, not present in this "
        "environment"
    )


REAL_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("feat_mean", T.DoubleType()),
    ]
)


def extract_features_real(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode (PNG/WAV via stdlib) — same mapInPandas
    shape as the stub path; unknown media types surface as NULL features
    rather than failing the batch (DLQ-style leniency)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mt, p in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                try:
                    d = decode_real(bytes(p), mt)
                except Exception:
                    # DLQ-style leniency: decoding arbitrary bytes can
                    # raise wave.Error / struct.error / zlib.error /
                    # EOFError... — a corrupt blob yields NULL features,
                    # never a failed batch
                    d = {"width": None, "height": None, "bit_depth": None,
                         "sample_rate": None, "duration_ms": None,
                         "feat_mean": None}
                rows.append({"media_id": int(mid), "media_type": mt,
                             "n_bytes": len(p), **d})
            yield pd.DataFrame(rows)[
                [f.name for f in REAL_FEATURE_SCHEMA.fields]
            ]

    n = media.sparkSession.sparkContext.defaultParallelism
    balanced = media.repartition(F.pmod(F.xxhash64("media_id"), F.lit(n)))
    return balanced.mapInPandas(run, REAL_FEATURE_SCHEMA)


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
