"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched ``mapInPandas``.

The decode step is STUBBED (codec libraries are not available in this
environment): ``decode_image``/``decode_audio`` raise NotImplementedError
unless ``fake=True``, which substitutes a deterministic content-hash-derived
feature vector so the Spark-side plumbing — schema, batch iteration,
partition behavior, UDF signature — is real and testable end-to-end.

Scale notes: binary payloads dominate bytes, so (a) the media column must be
column-pruned out of any pass not touching it (same discipline as
html:binary — SURVEY.md §7.4), (b) ``mapInPandas`` streams Arrow batches so
one task never materializes a partition of raw media, and (c)
``spark.sql.files.maxPartitionBytes`` bounds per-task payload.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata struct carried next to the opaque payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image/jpeg, audio/wav, ...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ]
)

#: Output of the feature-extraction pass.
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)

N_FEATURES = 16


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 array. STUB: real codecs are not
    available in this container; ``fake=True`` produces a deterministic
    pseudo-decode derived from the payload bytes."""
    if not fake:
        raise NotImplementedError(
            "image codecs not available in this environment; pass fake=True "
            "for the deterministic test double"
        )
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    side = 4
    return np.tile(h[: side * side * 3], 1).reshape(side, side, 3)[:side, :side, :3]


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an audio payload to a 1-D float32 waveform in [-1, 1]. STUB:
    real codecs are not available in this container; ``fake=True`` produces
    a deterministic pseudo-waveform derived from the payload bytes."""
    if not fake:
        raise NotImplementedError(
            "audio codecs not available in this environment; pass fake=True "
            "for the deterministic test double"
        )
    arr = np.frombuffer(payload[:1024], dtype=np.uint8).astype(np.float32)
    return (arr - 127.5) / 127.5


def _features_from_bytes(payload: bytes) -> list[float]:
    """Deterministic fake feature vector: byte-histogram moments — a stand-in
    with the exact shape/dtype a real extractor would produce."""
    if payload is None or len(payload) == 0:
        return [0.0] * N_FEATURES
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=N_FEATURES)[:N_FEATURES]
    return (hist / max(len(arr), 1)).astype(np.float32).tolist()


def extract_media_features(media_df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """media table → features table via mapInPandas (Arrow batch iterator).
    The real pipeline swaps ``_features_from_bytes`` for a codec+model call;
    everything else (schema, batching, distribution) is production-shaped."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["meta"].map(
                        lambda m: (m or {}).get("media_type")
                    ),
                    "n_bytes": pdf["media"].map(lambda b: 0 if b is None else len(b)),
                    "features": pdf["media"].map(_features_from_bytes),
                }
            )

    return media_df.mapInPandas(process, schema=FEATURES_SCHEMA)


def resize_images(
    media_df: DataFrame, width: int, height: int, batch_size_hint: int = 256
) -> DataFrame:
    """Image resize pass: decode → nearest-neighbor resample → re-encode,
    streamed through mapInPandas so no task materializes a partition of
    decoded pixels. Output rows keep the media schema with updated meta
    (width/height) and the resized payload; non-image rows pass through
    untouched. The decode/encode pair is the stubbed step (deterministic
    fake decode, raw-RGB re-encode); the resample arithmetic and all
    Spark-side plumbing are production-shaped."""

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_media, out_meta = [], []
            for media, meta in zip(pdf["media"], pdf["meta"]):
                if (
                    media is not None
                    and meta is not None
                    and ((meta.get("media_type") if isinstance(meta, dict) else meta["media_type"]) or "").startswith("image/")
                ):
                    img = decode_image(media, fake=True)  # STUB decode
                    ys = (np.arange(height) * img.shape[0] // height).clip(0, img.shape[0] - 1)
                    xs = (np.arange(width) * img.shape[1] // width).clip(0, img.shape[1] - 1)
                    resized = img[ys][:, xs]
                    media = resized.astype(np.uint8).tobytes()  # raw-RGB "encode"
                    m = dict(meta)
                    m["width"], m["height"] = width, height
                    m["media_type"] = "image/raw-rgb"
                    meta = m
                # non-image / null-meta rows pass through UNTOUCHED — a NULL
                # meta must stay NULL, not become a struct of null fields
                out_media.append(media)
                out_meta.append(meta)
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "media": out_media, "meta": out_meta}
            )

    return media_df.mapInPandas(process, schema=MEDIA_SCHEMA)


def frame_sample_plan(media_df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand each VIDEO row (media_type
    video/*; rows with no positive duration have no frames) into (doc_id,
    frame_ts_ms) rows from metadata only — no decode, pure JVM explode.
    The decode of each planned frame is the stubbed step."""
    return (
        media_df.where(
            F.col("meta.media_type").startswith("video/")
            & (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) > 0)
        )
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.col("meta.duration_ms") - 1,
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synth_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    df = spark.range(0, n_rows)
    payload = F.encode(
        F.concat(F.lit("media-payload-"), F.sha2(F.concat(F.col("id").cast("string"), F.lit(seed)), 256)),
        "UTF-8",
    )
    meta = F.struct(
        F.when(F.col("id") % 3 == 0, "image/jpeg")
        .when(F.col("id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.lit(640).alias("width"),
        F.lit(480).alias("height"),
        (F.col("id") % 5000 + 1000).cast("int").alias("duration_ms"),
    )
    return df.select(
        F.col("id").alias("doc_id"), payload.alias("media"), meta.alias("meta")
    )
