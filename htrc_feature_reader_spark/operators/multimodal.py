"""Multimodal column plumbing (training-data extension).

Images/audio/video ride through the engine as opaque ``binary`` columns
with a typed metadata struct. The Spark-side plumbing — schema, Arrow batch
shape, partition sizing — is real and tested; the actual codec work
(decode/resize/frame-sample) is stubbed behind ``decoder=`` because no
image/audio libraries exist in this environment: pass a real decoder
callable in production, or ``fake_decoder`` for deterministic tests.

Scale notes: payload columns dominate row size, so ``mapInPandas`` batches
are capped by bytes not rows (``spark.sql.execution.arrow.maxRecordsPerBatch``
set in session.py); metadata-only plans never touch the payload column
(column pruning keeps the parquet scan payload-free — verify with
``.explain`` showing ReadSchema without the payload field).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes long, feature array<float>"


def payload_stats(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Metadata-only plan: byte length + emptiness, no decode. Catalyst
    prunes everything else from the scan."""
    return df.withColumn("n_bytes", F.octet_length(payload_col).cast("long"))


def fake_decoder(payload: bytes) -> list[float]:
    """Deterministic stand-in for a codec: 8 floats derived from payload
    bytes. Lets tests exercise the full Arrow path without image libs."""
    if payload is None:
        return []
    n = len(payload)
    return [float(payload[i % n] if n else 0) / 255.0 + i for i in range(8)]


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    payload_col: str = "payload",
) -> DataFrame:
    """Decode payloads to feature vectors via mapInPandas (Arrow batches).

    ``decoder`` maps raw bytes -> list[float]. Without one this raises
    NotImplementedError *at executor time* (clearly marked stub — codecs
    aren't available in this environment); pass ``fake_decoder`` in tests.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder is None:
                raise NotImplementedError(
                    "no media codec available in this environment; pass a "
                    "decoder callable (e.g. PIL/torchaudio-backed) or "
                    "multimodal.fake_decoder for tests"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf[payload_col].map(lambda b: len(b) if b is not None else 0),
                    "feature": pdf[payload_col].map(decoder),
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    duration_col: str = "meta.duration_ms",
) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame timestamp
    (the decode of each frame is the stubbed step). Pure Catalyst explode —
    the planner sees the fan-out and sizes partitions accordingly."""
    n_frames = (F.col(duration_col) / every_ms).cast("int")
    return df.select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                lambda i: i * every_ms,
            )
        ).alias("frame_ms"),
    )


def fake_resizer(payload: bytes, height: int, width: int) -> bytes:
    """Deterministic stand-in for an image resize: returns a byte string
    derived from (payload, h, w) with length h*w (mod 4096). Lets tests
    exercise batch shapes and schema without image libs."""
    if payload is None:
        return b""
    n = (height * width - 1) % 4096 + 1  # h*w mod-wrapped, never 0
    seed = sum(payload[:16]) + height * 31 + width
    return bytes((seed + i) % 256 for i in range(n))


def resize_images(
    df: DataFrame,
    height: int,
    width: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    payload_col: str = "payload",
) -> DataFrame:
    """Resize opaque image payloads via mapInPandas (Arrow batches).

    ``resizer(bytes, h, w) -> bytes`` does the pixel work. Without one
    this raises NotImplementedError at executor time (stub — no image
    codecs in this environment); pass ``fake_resizer`` in tests or a
    PIL-backed callable in production. The Spark-side plumbing — schema,
    partition-preserving map, per-batch Arrow transfer — is real and
    identical to what a PIL resizer would ride on.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if resizer is None:
                raise NotImplementedError(
                    "no image codec available in this environment; pass a "
                    "resizer callable (e.g. PIL-backed) or "
                    "multimodal.fake_resizer for tests"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "resized": pdf[payload_col].map(
                        lambda b: resizer(b, height, width)
                    ),
                    "height": height,
                    "width": width,
                }
            )

    id_t = df.schema["media_id"].dataType.simpleString()
    return df.mapInPandas(
        run, schema=f"media_id {id_t}, resized binary, height int, width int"
    )
