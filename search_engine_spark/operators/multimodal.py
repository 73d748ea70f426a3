"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries image/audio/video as opaque
``binary`` columns next to typed metadata, and runs decode / feature
extraction as Arrow-batched Pandas UDFs.

Decode status by format:

* **netpbm images (P2/P3/P5/P6)** — REAL decode (pure numpy header +
  ``frombuffer`` parse) via ``decoder="netpbm"``, with real
  nearest-neighbor resize and the feature kernel on actual pixels.
* **PCM WAV audio** — REAL decode (stdlib ``wave`` + numpy) in
  ``decode_audio_features``: sample rate, channels, duration, RMS,
  zero-crossing rate.
* **PNG/JPEG/MP3/FLAC/MP4** — the codec libraries (Pillow, ffmpeg,
  torchaudio) are NOT in this container, so those paths raise
  ``NotImplementedError`` (or ``fake=True`` selects the deterministic
  fake decoder for plumbing tests). The Spark-side shape — schemas,
  mapInPandas batching, partitioning, metadata — is identical to the
  real formats', so dropping in a library decoder changes one function.

Magic-byte sniffing and hashing are JVM column expressions; only
decode crosses into Python.
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
    # netpbm magic is 2 bytes + whitespace; requiring the whitespace
    # byte keeps ordinary text starting with "P2..." out
    ("50320a", "image/x-portable-graymap"), ("503220", "image/x-portable-graymap"),
    ("50330a", "image/x-portable-pixmap"), ("503320", "image/x-portable-pixmap"),
    ("50350a", "image/x-portable-graymap"), ("503520", "image/x-portable-graymap"),
    ("50360a", "image/x-portable-pixmap"), ("503620", "image/x-portable-pixmap"),
    ("59555634", "video/x-yuv4mpeg"),       # YUV4MPEG2
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


def decode_netpbm(payload: bytes) -> np.ndarray:
    """REAL netpbm decode (P2/P3 ASCII, P5/P6 binary) → grayscale
    float64 HxW array in [0, maxval]. Pure numpy — no image library.
    RGB (P3/P6) converts to luma via the BT.601 weights. Raises
    ``ValueError`` on anything that is not a well-formed netpbm
    payload (callers route by sniffed media_type first)."""
    if len(payload) < 2 or payload[0:1] != b"P":
        raise ValueError("not a netpbm payload")
    kind = payload[1:2]
    if kind not in b"2356":
        raise ValueError(f"unsupported netpbm variant P{kind.decode()}")
    # header: magic, then whitespace-separated width/height/maxval with
    # '#' comments allowed between tokens
    pos = 2
    fields = []
    n = len(payload)
    while len(fields) < 3:
        while pos < n and payload[pos] in b" \t\r\n":
            pos += 1
        if pos < n and payload[pos] in b"#":
            while pos < n and payload[pos] not in b"\n":
                pos += 1
            continue
        start = pos
        while pos < n and payload[pos] not in b" \t\r\n":
            pos += 1
        if pos == start:
            raise ValueError("truncated netpbm header")
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    if w <= 0 or h <= 0 or maxval <= 0:
        raise ValueError("bad netpbm dimensions")
    channels = 3 if kind in b"36" else 1
    count = w * h * channels
    if kind in b"56":  # binary: exactly ONE whitespace byte after maxval
        pos += 1
        dtype = np.dtype(">u2") if maxval > 255 else np.uint8
        arr = np.frombuffer(payload, dtype=dtype, count=count, offset=pos)
        arr = arr.astype(np.float64)
    else:  # ASCII samples
        arr = np.array(payload[pos:].split()[:count], dtype=np.float64)
        if len(arr) < count:
            raise ValueError("truncated netpbm data")
    if channels == 3:
        rgb = arr.reshape(h, w, 3)
        return rgb @ np.array([0.299, 0.587, 0.114])
    return arr.reshape(h, w)


def _resize_nearest(img: np.ndarray, side: int) -> np.ndarray:
    """Real nearest-neighbor resize to side×side (numpy take)."""
    h, w = img.shape
    ys = np.minimum((np.arange(side) * h) // side, h - 1)
    xs = np.minimum((np.arange(side) * w) // side, w - 1)
    return img[np.ix_(ys, xs)]


def _fake_decode(payload: bytes, side: int = 8) -> np.ndarray:
    """Deterministic fake decoder: payload bytes → pseudo-image
    (side × side grayscale) by tiling the byte stream. Stands in for
    PIL/ffmpeg so the batch plumbing is exercised end-to-end."""
    buf = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    reps = int(np.ceil(side * side / len(buf)))
    return np.tile(buf, reps)[: side * side].reshape(side, side)


def decode_image_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "doc_id", side: int = 8,
                          fake: bool = False,
                          decoder: str | None = None) -> DataFrame:
    """Decode → resize → feature-extract pipeline over binary payloads,
    as one Arrow-batched mapInPandas.

    ``decoder="netpbm"`` is a REAL path: P2/P3/P5/P6 payloads decode to
    actual pixels (pure numpy), nearest-neighbor-resize to side×side,
    and the emitted width/height are the TRUE source dimensions.
    ``fake=True`` keeps the deterministic fake decoder for plumbing
    tests. PNG/JPEG need Pillow/libvips (absent here) and raise."""
    if decoder == "netpbm":
        def decode(payload: bytes):
            img = decode_netpbm(payload)
            h, w = img.shape
            return _resize_nearest(img, side), w, h
    elif fake:
        def decode(payload: bytes):
            return _fake_decode(payload, side), side, side
    else:
        raise NotImplementedError(
            "PNG/JPEG decode requires Pillow/libvips, not available in "
            "this container; decoder='netpbm' is the real path for "
            "P2/P3/P5/P6 payloads, fake=True the plumbing-test decoder"
        )

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                img, w, h = decode(
                    bytes(payload) if payload is not None else b""
                )
                # "feature" = row means, a stand-in for a CNN embedding
                feat = (img.astype(np.float64).mean(axis=1) / 255.0).astype(
                    np.float32
                )
                rows.append(
                    (
                        int(doc_id),
                        int(w),
                        int(h),
                        float(img.astype(np.float64).mean()),
                        feat.tolist(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mean_luma", "feature"]
            )

    return df.select(id_col, payload_col).mapInPandas(fn, schema=_IMG_FEAT_SCHEMA)


_AUDIO_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
        T.StructField("rms", T.DoubleType(), False),
        T.StructField("zero_cross_rate", T.DoubleType(), False),
    ]
)


def decode_wav(payload: bytes):
    """REAL PCM WAV decode via stdlib ``wave``: returns
    ``(mono float64 samples in [-1, 1], sample_rate, n_channels)``.
    8/16/32-bit PCM; compressed codecs raise ``ValueError``."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as wf:
            sr = wf.getframerate()
            ch = wf.getnchannels()
            width = wf.getsampwidth()
            frames = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a PCM WAV payload: {e}") from e
    if width == 1:  # unsigned 8-bit
        x = np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif width == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if ch > 1:
        x = x[: (len(x) // ch) * ch].reshape(-1, ch).mean(axis=1)
    return x, sr, ch


def decode_audio_features(df: DataFrame, payload_col: str = "payload",
                          id_col: str = "doc_id") -> DataFrame:
    """REAL audio feature extraction for PCM WAV payloads (stdlib
    ``wave`` + numpy — no external codec): sample rate, channel count,
    mono sample count, duration, RMS level, zero-crossing rate. The
    Arrow-batched shape is the template a libsndfile/torchaudio decoder
    would drop into for MP3/FLAC (which raise here)."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                x, sr, ch = decode_wav(
                    bytes(payload) if payload is not None else b""
                )
                n = len(x)
                rms = float(np.sqrt((x * x).mean())) if n else 0.0
                zcr = (
                    float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean())
                    if n > 1
                    else 0.0
                )
                rows.append(
                    (int(doc_id), int(sr), int(ch), n,
                     n / sr if sr else 0.0, rms, zcr)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_channels", "n_samples",
                         "duration_s", "rms", "zero_cross_rate"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        fn, schema=_AUDIO_FEAT_SCHEMA
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_sha", T.StringType(), False),
    ]
)


def parse_y4m_frames(payload: bytes):
    """REAL uncompressed-video frame parse: yuv4mpeg2 (Y4M) — stream
    header ``YUV4MPEG2 W<w> H<h> ...\\n`` then ``FRAME...\\n`` markers,
    each followed by w*h*3/2 bytes of raw 4:2:0 YUV (the only chroma
    mode supported here; others raise). Returns the list of raw frame
    byte-slices. Pure stdlib — no codec."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a yuv4mpeg2 payload")
    nl = payload.index(b"\n")
    header = payload[:nl].split(b" ")
    w = h = None
    for tok in header[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C" and not tok[1:].startswith(b"420"):
            raise ValueError(f"unsupported chroma mode {tok.decode()}")
    if not w or not h:
        raise ValueError("yuv4mpeg2 header missing W/H")
    frame_bytes = w * h * 3 // 2  # 4:2:0
    frames = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        if not payload.startswith(b"FRAME", pos):
            raise ValueError(f"expected FRAME marker at byte {pos}")
        pos = payload.index(b"\n", pos) + 1
        if pos + frame_bytes > n:
            raise ValueError("truncated yuv4mpeg2 frame")
        frames.append(payload[pos:pos + frame_bytes])
        pos += frame_bytes
    return frames


def sample_frames(df: DataFrame, payload_col: str = "payload",
                  id_col: str = "doc_id", every_n_bytes: int = 64,
                  n_frames: int = 4, fake: bool = False,
                  decoder: str | None = None) -> DataFrame:
    """Frame sampling for video payloads — the 1→N row-expanding UDTF
    shape (mapInPandas output rows ≠ input rows).

    ``decoder="y4m"`` is a REAL path: yuv4mpeg2 payloads parse into
    actual raw frames and ``n_frames`` evenly spaced ones are hashed.
    ``fake=True`` keeps the byte-slicing plumbing sampler; compressed
    codecs need ffmpeg (absent here) and raise."""
    import hashlib

    if decoder == "y4m":
        def chunks_of(data: bytes):
            frames = parse_y4m_frames(data)
            if not frames:
                return []
            idx = [
                min(i * len(frames) // n_frames, len(frames) - 1)
                for i in range(n_frames)
            ]
            return [frames[j] for j in idx]
    elif fake:
        def chunks_of(data: bytes):
            return [
                data[i * every_n_bytes:(i + 1) * every_n_bytes]
                for i in range(n_frames)
            ]
    else:
        raise NotImplementedError(
            "compressed video needs ffmpeg, not available in this "
            "container; decoder='y4m' is the real path for yuv4mpeg2 "
            "payloads, fake=True the plumbing-test sampler"
        )

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload) if payload is not None else b""
                for i, chunk in enumerate(chunks_of(data)):
                    rows.append(
                        (int(doc_id), i, hashlib.sha256(chunk).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_sha"])

    return df.select(id_col, payload_col).mapInPandas(fn, schema=_FRAME_SCHEMA)
