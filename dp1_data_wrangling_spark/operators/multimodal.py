"""Multimodal (image/audio/video) column handling (north star).

Media are opaque ``binary`` payload columns + typed metadata, exactly as a
100 TB multimodal corpus stores them (the bytes travel in parquet; decode
happens executor-side).  The Spark-side plumbing — schema, partitioning,
Arrow batch shape, mapInPandas signatures — is real and tested; the actual
codec calls are STUBBED (image/audio libraries are not in this container):
``decode_media_stub`` raises NotImplementedError while
``fake_decode_features`` produces deterministic pseudo-features from the
payload bytes so the pipeline is end-to-end testable.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents fixture:
    payload = utf-8 bytes of the text, fake image metadata from lengths."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
        (F.col("n_chars") % 1024 + 16).cast("long").alias("width"),
        (F.col("n_chars") % 768 + 16).cast("long").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def decode_media_stub(payload: bytes, media_type: str) -> object:
    """The real decode hook (PIL/ffmpeg/soundfile would go here).

    Kept as an explicit stub: the container has no media codecs.  Swap in
    a real implementation without touching the Spark plumbing."""
    raise NotImplementedError(
        f"media decoding for {media_type!r} requires codec libraries "
        "not present in this environment"
    )


N_FAKE_FEATURES = 8


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, schema-declared.

    Uses ``fake_decode_features`` (deterministic md5-derived floats) in
    place of a codec; the dataflow (binary in, float vector out, batch
    shape, partition preservation) is the real thing."""
    import hashlib

    import pandas as pd

    def fake_decode_features(payload: bytes | None) -> tuple[int, list[float]]:
        if payload is None:
            return 0, [0.0] * N_FAKE_FEATURES
        digest = hashlib.md5(payload).digest()
        feats = [digest[i] / 255.0 for i in range(N_FAKE_FEATURES)]
        return len(payload), feats

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [d[0] for d in decoded],
                    "features": [d[1] for d in decoded],
                }
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """mapInPandas image resize: aspect-preserving downscale to
    ``max_side``.  The codec call is stubbed (payload passes through; a
    real implementation decodes, resizes, re-encodes inside the same batch
    loop) but the size arithmetic, schema, and Arrow batch shape are real."""
    import numpy as np
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            # dimensions are nullable (audio/video rows carry duration but
            # no width/height) — NaN would crash the int64 cast
            w = pdf["width"].fillna(0)
            h = pdf["height"].fillna(0)
            scale = (max_side / w.combine(h, max).clip(lower=1)).clip(upper=1.0)
            # floor(x + 0.5), NOT .round(): numpy rounds half-to-even, which
            # no SQL engine replays — half-up keeps the arithmetic
            # oracle-expressible (same IEEE ops in any engine)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": np.floor(w * scale + 0.5).astype("int64"),
                    "height": np.floor(h * scale + 0.5).astype("int64"),
                    # stub: re-encode would happen here (decode_media_stub)
                    "payload": pdf["payload"],
                }
            )

    return media.mapInPandas(batches, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_no", LongType(), False),
        StructField("ts_ms", LongType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1_000) -> DataFrame:
    """mapInPandas frame sampling: one output row per ``every_ms`` of
    duration (video → frame table fan-out).  Frame extraction is stubbed
    (payload passes through; ffmpeg would seek+decode per ts) — the
    fan-out shape, schema, and timestamps are real."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {"media_id": [], "frame_no": [], "ts_ms": [], "payload": []}
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                n = 1 if pd.isna(dur) else max(int(dur) // every_ms, 1)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["payload"].append(payload)  # stub: frame bytes
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FRAME_SCHEMA)
