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


def resize_image(img: np.ndarray, out_h: int, out_w: int,
                 method: str = "area") -> np.ndarray:
    """REAL image resize (pure numpy — no codec needed once pixels
    exist): ``area`` does box-average downsampling via integral images
    (antialiased, the right default for thumbnailing); ``nearest`` does
    index sampling (exact, fastest).  Works for any HxWxC uint8/float
    array, vectorized — no per-pixel Python."""
    h, w = img.shape[:2]
    if method == "nearest":
        ri = (np.arange(out_h) * h) // out_h
        ci = (np.arange(out_w) * w) // out_w
        return img[ri][:, ci]
    if method != "area":
        raise ValueError(f"unknown resize method {method!r}")
    # box-average via a 2-D integral image: output pixel = mean over its
    # (fractional-free) source box, computed with 4 gather ops
    f = img.astype(np.float64)
    integral = np.zeros((h + 1, w + 1) + f.shape[2:], dtype=np.float64)
    integral[1:, 1:] = f.cumsum(axis=0).cumsum(axis=1)
    r0 = (np.arange(out_h) * h) // out_h
    r1 = ((np.arange(out_h) + 1) * h + out_h - 1) // out_h
    c0 = (np.arange(out_w) * w) // out_w
    c1 = ((np.arange(out_w) + 1) * w + out_w - 1) // out_w
    area = ((r1 - r0)[:, None] * (c1 - c0)[None, :]).astype(np.float64)
    box = (integral[r1][:, c1] - integral[r1][:, c0]
           - integral[r0][:, c1] + integral[r0][:, c0])
    out = box / area[(...,) + (None,) * (img.ndim - 2)]
    return out.astype(img.dtype) if np.issubdtype(img.dtype, np.integer) else out


def thumbnails(df: DataFrame, out_h: int = 4, out_w: int = 4,
               fake: bool = True, payload_col: str = "payload") -> DataFrame:
    """Image rows -> (media_id, thumb: array<float>) — decode (stubbed)
    then REAL area resize, flattened row-major.  Same narrow mapInPandas
    shape as extract_features."""
    out_schema = "media_id long, thumb array<float>"

    def _thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                img = decode_image(payload, fake=fake)
                t = resize_image(img, out_h, out_w, method="area")
                rows.append((t.astype(np.float32) / 255.0).reshape(-1))
            yield pd.DataFrame({"media_id": pdf["media_id"], "thumb": rows})

    return df.where(F.col("kind") == "image").mapInPandas(_thumb, schema=out_schema)


def decode_audio(payload: bytes, fake: bool = False,
                 n_samples: int = 2048) -> np.ndarray:
    """Decode an audio payload to a float32 PCM array in [-1, 1].

    REAL DECODE IS STUBBED (no audio codecs in this container); with
    ``fake=True`` returns deterministic pseudo-PCM derived from the
    payload bytes, so the feature pipeline below runs end-to-end."""
    if not fake:
        raise NotImplementedError(
            "audio codecs unavailable in this environment; pass fake=True "
            "or swap in soundfile/ffmpeg on a real cluster")
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * (n_samples * 2 // len(h) + 1))[: n_samples * 2],
                        dtype=np.int16)
    return (raw.astype(np.float32) / 32768.0)


def audio_features(df: DataFrame, frame: int = 256, fake: bool = True,
                   payload_col: str = "payload") -> DataFrame:
    """Audio rows -> framewise RMS energy + zero-crossing rate (the
    real DSP is numpy over the PCM array; only the codec is stubbed).
    Output: (media_id, rms: array<float>, zcr: array<float>)."""
    out_schema = "media_id long, rms array<float>, zcr array<float>"

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rms_rows, zcr_rows = [], []
            for payload in pdf[payload_col]:
                pcm = decode_audio(payload, fake=fake)
                n = (pcm.shape[0] // frame) * frame
                frames = pcm[:n].reshape(-1, frame)
                rms_rows.append(np.sqrt((frames ** 2).mean(axis=1)).astype(np.float32))
                signs = frames >= 0
                zcr_rows.append((signs[:, 1:] != signs[:, :-1])
                                .mean(axis=1).astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"],
                                "rms": rms_rows, "zcr": zcr_rows})

    return df.where(F.col("kind") == "audio").mapInPandas(_feat, schema=out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: explode each video row into frame
    timestamps every ``every_ms`` (decode of the actual frames is the
    same stubbed step).  Pure built-ins: sequence + explode."""
    frames = F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
    return (df.where(F.col("kind") == "video")
            .select("media_id", F.explode(frames).alias("frame_ms")))
