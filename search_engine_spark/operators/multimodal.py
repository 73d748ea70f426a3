"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns next to typed metadata, and runs decode / feature
extraction as Arrow-batched Pandas UDFs. The decode libraries (Pillow,
ffmpeg, torchaudio) are NOT in this container, so the decode kernels are
STUBBED — ``decode_image``/``decode_audio`` raise ``NotImplementedError``
unless ``fake=True`` selects the deterministic fake decoder — while the
Spark-side plumbing (schemas, mapInPandas batch shape, partitioning,
metadata extraction) is real and tested.

Magic-byte sniffing and hashing are JVM column expressions; only the
(stubbed) decode crosses into Python.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# (magic-prefix hex, media type) — public file signatures.
_MAGIC = (
    ("89504e47", "image/png"),
    ("ffd8ff", "image/jpeg"),
    ("47494638", "image/gif"),
    ("52494646", "audio/wav"),  # RIFF container (wav/avi)
    ("494433", "audio/mpeg"),
    ("664c6143", "audio/flac"),
    ("000000", "video/mp4"),    # ftyp boxes start with size; weak sniff
)


def sniff_media_type(payload: Column) -> Column:
    """Magic-byte media-type sniff — pure column expression."""
    head = F.lower(F.hex(F.substring(payload, 1, 8)))
    expr = F.lit("application/octet-stream")
    for magic, mtype in reversed(_MAGIC):
        expr = F.when(head.startswith(magic.lower()), F.lit(mtype)).otherwise(expr)
    return expr


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata for a binary column: byte length, sha256, sniffed
    type. No Python, no shuffle — one codegen'd projection."""
    p = F.col(payload_col)
    return df.select(
        "*",
        F.length(p).cast("long").alias("n_bytes"),
        F.sha2(p, 256).alias("sha256"),
        sniff_media_type(p).alias("media_type"),
    )


_IMG_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_luma", T.DoubleType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def _fake_decode(payload: bytes, side: int = 8) -> np.ndarray:
    """Deterministic fake decoder: payload bytes → pseudo-image
    (side × side grayscale) by tiling the byte stream. Stands in for
    PIL/ffmpeg so the batch plumbing is exercised end-to-end."""
    buf = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    reps = int(np.ceil(side * side / len(buf)))
    return np.tile(buf, reps)[: side * side].reshape(side, side)


def decode_image_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "doc_id", side: int = 8,
                          fake: bool = False) -> DataFrame:
    """Decode → resize → feature-extract pipeline over binary payloads,
    as one Arrow-batched mapInPandas. Real decode requires an image
    library not present in this container; pass ``fake=True`` for the
    deterministic fake decoder (tests, plumbing verification)."""
    if not fake:
        raise NotImplementedError(
            "image decode requires Pillow/libvips, not available in this "
            "container; pass fake=True for the deterministic fake decoder"
        )

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                img = _fake_decode(bytes(payload) if payload is not None else b"",
                                   side)
                # "feature" = row means, a stand-in for a CNN embedding
                feat = (img.astype(np.float64).mean(axis=1) / 255.0).astype(
                    np.float32
                )
                rows.append(
                    (
                        int(doc_id),
                        side,
                        side,
                        float(img.astype(np.float64).mean()),
                        feat.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mean_luma", "feature"]
            )

    return df.select(id_col, payload_col).mapInPandas(fn, schema=_IMG_FEAT_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sha", T.StringType(), False),
    ]
)


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id", every_n_bytes: int = 64,
                  n_frames: int = 4, fake: bool = False) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits ``n_frames``
    evenly spaced "frames" per document (fake decoder slices the byte
    stream; a real one would seek keyframes). Demonstrates the 1→N
    row-expanding UDTF shape (mapInPandas output rows ≠ input rows)."""
    if not fake:
        raise NotImplementedError(
            "video decode requires ffmpeg, not available in this container; "
            "pass fake=True for the deterministic fake sampler"
        )
    import hashlib

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                for i in range(n_frames):
                    start = i * every_n_bytes
                    chunk = data[start : start + every_n_bytes]
                    rows.append(
                        (int(doc_id), i, hashlib.sha256(chunk).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_sha"])

    return df.select(id_col, payload_col).mapInPandas(fn, schema=_FRAME_SCHEMA)
