"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The reference's only media handling is PDF page → JPEG → base64
(pdf_parser.py:24-35, 462-482; SURVEY §2.1 S2).  At corpus scale the same
pattern generalizes: media travel as ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are STUBS — ``decode_fn=None`` raises NotImplementedError,
and tests inject a deterministic fake.  Everything Spark-side (schema,
batch shape, partitioning, UDF signature, metadata propagation) is real and
tested; swapping in a real codec is a one-function change on the executors.
"""

from __future__ import annotations

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


def _default_decode(kind: str, payload: bytes) -> list:
    raise NotImplementedError(
        "media codecs (PIL/ffmpeg) are not available in this environment; "
        "inject decode_fn — the Spark plumbing around it is real"
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
            feats = [fn(k, bytes(p)) for k, p in zip(b["kind"], b["payload"])]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": [len(bytes(p)) for p in b["payload"]],
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
    downstream extract_features call on the sliced payload)."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
