"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED in this environment (no image/audio codecs
in the container): :func:`decode_image` raises NotImplementedError
unless ``fake=True``, in which case a deterministic fake decoder
(splitmix-seeded pixel stats from the bytes) stands in.  Everything
around the decode — schema, batch shape, partitioning, UDF signatures,
metadata propagation — is real and tested, so swapping in a real codec
on a cluster is a one-function change.

Scale shape: media processing is embarrassingly parallel (narrow
mapInPandas); the operative knobs are Arrow batch size (bound memory:
rows * payload size per batch) and input file-split size.  No shuffle
anywhere in this module.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "meta struct<width:int, height:int, duration_ms:int, codec:string>")

FEATURE_DIM = 32


def attach_fake_media(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Derive a deterministic fake media payload per row (bytes = sha256
    stream of the text) with plausible typed metadata — the test stand-in
    for real WARC media attachments."""
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"))
    payload = F.sha2(F.col(text_col).cast("binary"), 256).cast("binary")
    meta = F.struct(
        (F.pmod(F.col(id_col) * 37, F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.col(id_col) * 53, F.lit(1080)) + 16).cast("int").alias("height"),
        (F.pmod(F.col(id_col) * 97, F.lit(600000))).cast("int").alias("duration_ms"),
        F.lit("fake/v1").alias("codec"))
    return df.select(F.col(id_col).alias("media_id"), kind.alias("kind"),
                     payload.alias("payload"), meta.alias("meta"))


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 uint8 array.

    REAL DECODE IS STUBBED: no codec libraries ship in this container.
    With ``fake=True`` returns a deterministic 8x8x3 array derived from
    the payload bytes (stable across runs/executors) so downstream
    plumbing is exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image codecs unavailable in this environment; pass fake=True "
            "or swap in PIL/libvips on a real cluster")
    h = hashlib.sha256(payload or b"").digest()
    rng = np.frombuffer((h * ((8 * 8 * 3) // len(h) + 1))[: 8 * 8 * 3], dtype=np.uint8)
    return rng.reshape(8, 8, 3).copy()


def extract_features(df: DataFrame, fake: bool = True,
                     payload_col: str = "payload") -> DataFrame:
    """media rows -> (media_id, kind, feature: array<float>) via
    mapInPandas.  Batch shape: the decode loop runs per row (decoding
    is inherently per-payload) but the feature reduction is one numpy
    op per batch.  Arrow batch size bounds executor memory:
    maxRecordsPerBatch * payload_size."""
    out_schema = "media_id long, kind string, feature array<float>"

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = np.empty((len(pdf), FEATURE_DIM), dtype=np.float32)
            for i, payload in enumerate(pdf[payload_col]):
                img = decode_image(payload, fake=fake)
                flat = img.reshape(-1).astype(np.float32)
                pad = np.resize(flat, FEATURE_DIM)
                feats[i] = pad / 255.0
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "kind": pdf["kind"],
                                "feature": list(feats)})

    return df.mapInPandas(_extract, schema=out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: explode each video row into frame
    timestamps every ``every_ms`` (decode of the actual frames is the
    same stubbed step).  Pure built-ins: sequence + explode."""
    frames = F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
    return (df.where(F.col("kind") == "video")
            .select("media_id", F.explode(frames).alias("frame_ms")))
