"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The reference's only media handling is PDF page → JPEG → base64
(pdf_parser.py:24-35, 462-482; SURVEY §2.1 S2).  At corpus scale the same
pattern generalizes: media travel as ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

Codec strategy: formats the stdlib can decode ARE decoded for real —
:func:`stdlib_decode` handles RIFF/WAV audio (``wave`` module: channels,
rate, duration, mean |amplitude|) and PGM images (P5/P2 header + raster
mean).  Compressed formats (JPEG/MP4/OGG) need PIL/ffmpeg, which are NOT
in this container — for those ``decode_fn`` stays an injected kernel and
the default raises NotImplementedError.  Everything Spark-side (schema,
batch shape, partitioning, UDF signature, metadata propagation) is real
and tested either way.
"""

from __future__ import annotations

import io
import struct
import wave
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("mime", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests and
    plumbing benchmarks — no external data."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = bytes((i * 37 + j * 11) % 256 for j in range(128 + (i % 5) * 64))
        rows.append(
            (
                i,
                kind,
                payload,
                {"mime": f"application/x-fake-{kind}", "width": 64, "height": 48,
                 "duration_ms": 1000 + i},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_real_media(spark, n: int = 32) -> DataFrame:
    """Deterministic VALID media payloads decodable without external
    codecs: even ids → 16-bit PCM WAV (wave module), odd ids → binary PGM.
    Exercises the real stdlib_decode path end-to-end."""
    rows = []
    for i in range(n):
        if i % 2 == 0:
            rate, n_frames = 8000, 400 + 40 * (i % 5)
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(rate)
                w.writeframes(
                    struct.pack(
                        f"<{n_frames}h",
                        *[((i * 131 + j * 17) % 2048) - 1024 for j in range(n_frames)],
                    )
                )
            payload, kind = buf.getvalue(), "audio"
            meta = {"mime": "audio/wav", "width": None, "height": None,
                    "duration_ms": int(n_frames * 1000 / rate)}
        else:
            width, height, maxval = 8 + (i % 4), 6, 255
            raster = bytes((i * 29 + j * 7) % 256 for j in range(width * height))
            payload = b"P5\n%d %d\n%d\n" % (width, height, maxval) + raster
            kind = "image"
            meta = {"mime": "image/x-portable-graymap", "width": width,
                    "height": height, "duration_ms": None}
        rows.append((i, kind, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_wav(payload: bytes) -> list:
    """REAL stdlib WAV decode: [n_channels, sample_rate, duration_ms,
    mean |amplitude| normalized to [0,1]] — 16-bit PCM via the wave
    module, deterministic."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, width, rate, n_frames = (
            w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        )
        raw = w.readframes(n_frames)
    if width != 2:
        raise NotImplementedError(f"only 16-bit PCM supported, got width={width}")
    n = len(raw) // 2
    samples = struct.unpack(f"<{n}h", raw[: n * 2])
    mean_abs = (sum(abs(s) for s in samples) / n / 32768.0) if n else 0.0
    duration_ms = n_frames * 1000.0 / rate if rate else 0.0
    return [float(n_ch), float(rate), duration_ms, mean_abs]


def decode_pgm(payload: bytes) -> list:
    """REAL PGM decode (P5 binary / P2 ascii): [width, height, maxval,
    mean intensity normalized to [0,1]].

    The P5 header is scanned token-by-token with an explicit byte offset:
    per the PGM spec exactly ONE whitespace byte follows the maxval token,
    and the raster starts immediately after it.  A naive
    ``payload.split(None, 4)`` would also eat raster bytes that happen to
    be whitespace codes (9-13, 32), silently truncating the pixel data.
    Header comments ('#') are not supported — no producer here emits them.
    """
    magic = payload[:2]
    if magic not in (b"P5", b"P2"):
        raise NotImplementedError(f"not a PGM payload: {magic!r}")
    pos, header = 2, []
    while len(header) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PGM header")
        header.append(int(payload[start:pos]))
    width, height, maxval = header
    if maxval <= 0:
        # the spec requires 0 < maxval < 65536; a zero would otherwise
        # surface as an uncontrolled ZeroDivisionError in the mean
        raise ValueError(f"invalid PGM maxval: {maxval}")
    n = width * height
    if magic == b"P5":
        if maxval > 255:
            # spec: 2 bytes per sample, big-endian, when maxval > 255 —
            # reading n of the 2n raster bytes would pass the truncation
            # guard and yield a plausible but understated mean
            raw = payload[pos + 1 : pos + 1 + 2 * n]
            if len(raw) < 2 * n:
                raise ValueError(
                    f"truncated PGM raster: {len(raw)} of {2 * n} bytes"
                )
            samples = [
                (raw[2 * i] << 8) | raw[2 * i + 1] for i in range(n)
            ]
            mean = (sum(samples) / n / maxval) if n else 0.0
            return [float(width), float(height), float(maxval), mean]
        pixels = payload[pos + 1 : pos + 1 + n]
        if len(pixels) < n:
            # a short raster with an intact header would otherwise produce
            # a plausible-looking but understated mean (sum(partial)/n)
            raise ValueError(f"truncated PGM raster: {len(pixels)} of {n} bytes")
        mean = (sum(pixels) / n / maxval) if n else 0.0
    else:
        vals = [int(v) for v in payload[pos:].split()[:n]]
        if len(vals) < n:
            raise ValueError(f"truncated PGM raster: {len(vals)} of {n} values")
        mean = (sum(vals) / n / maxval) if n and vals else 0.0
    return [float(width), float(height), float(maxval), mean]


def stdlib_decode(kind: str, payload: bytes) -> list:
    """Dependency-free decode kernel for self-describing formats; raises
    NotImplementedError for codec-bound ones (inject PIL/ffmpeg there)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:2] in (b"P5", b"P2"):
        return decode_pgm(payload)
    raise NotImplementedError(
        f"no stdlib decoder for kind={kind!r} "
        f"(magic={payload[:4]!r}); inject decode_fn (PIL/ffmpeg)"
    )


def _default_decode(kind: str, payload: bytes) -> list:
    raise NotImplementedError(
        "compressed-media codecs (PIL/ffmpeg) are not available in this "
        "environment; pass decode_fn=stdlib_decode for WAV/PGM payloads or "
        "inject a real codec — the Spark plumbing around it is real"
    )


def extract_features(
    media: DataFrame,
    decode_fn: Optional[Callable[[str, bytes], list]] = None,
    batch_hint: int = 0,
) -> DataFrame:
    """binary payload → fixed-width float feature vector via mapInPandas.

    ``decode_fn(kind, payload) -> list[float]`` is the injected kernel
    (stubbed by default).  One Arrow batch = many media rows; the loop is
    per-row only around the opaque codec call, exactly like a real
    image-decode stage.
    """
    fn = decode_fn or _default_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            # NULL payloads (allowed by MEDIA_SCHEMA) yield NULL features /
            # 0 bytes instead of bytes(None) aborting the stage — one
            # corrupt media row must not kill a corpus-scale batch (same
            # discipline as extract.py's NULL-content handling)
            feats = [
                None if p is None else fn(k, bytes(p))
                for k, p in zip(b["kind"], b["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": [
                        0 if p is None else len(bytes(p)) for p in b["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def base64_encode(media: DataFrame) -> DataFrame:
    """S2 parity: payload → base64 string column (JVM builtin, exactly the
    reference's encode_image semantics at pdf_parser.py:24-35)."""
    return media.select(
        "media_id", "kind", F.base64(F.col("payload")).alias("payload_b64")
    )


def frame_sample(
    media: DataFrame,
    every_ms: int = 250,
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (JVM explode over the metadata duration — the decode itself would be a
    downstream extract_features call on the sliced payload).

    A video with NULL duration metadata emits ONE row with NULL
    frame_ts_ms (explode_outer): visible for repair downstream rather than
    silently vanishing from the frame pipeline (O8 discipline)."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode_outer(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
