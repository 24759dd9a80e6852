"""Multimodal column conventions + operators (SURVEY.md §2.11 L5).

Design: media travel as opaque `binary` columns beside a typed metadata
struct; decode/feature-extract run as Arrow-batched functions over
`mapInPandas`, so each task processes whole record batches and the Spark
plumbing (schema, partitioning, batch shape) is identical to what a real
image/audio decoder would use. The actual pixel/sample decoding is STUBBED
(this container has no image/audio libs): `decode_image` raises
NotImplementedError unless `fake=True`, in which case it derives
deterministic pseudo-features from the bytes — making the pipeline fully
testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Convention: one metadata struct per media column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image/audio/video
        T.StructField("format", T.StringType()),       # png/jpeg/wav/mp4…
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, payload_col: str = "media") -> DataFrame:
    """Test helper: manufacture a deterministic binary payload + metadata
    struct from an id column (keeps the multimodal plumbing testable
    without real media files)."""
    payload = F.sha2(F.col(id_col).cast("string"), 256).cast("binary")
    return df.withColumn(payload_col, payload).withColumn(
        f"{payload_col}_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            (F.pmod(F.col(id_col), F.lit(1024)) + 32).cast("int").alias("width"),
            (F.pmod(F.col(id_col) * 7, F.lit(1024)) + 32).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(payload).cast("long").alias("n_bytes"),
        ),
    )


def decode_image_features(
    df: DataFrame, id_col: str, payload_col: str = "media", fake: bool = False
) -> DataFrame:
    """Image decode + feature extraction over mapInPandas (Arrow batches).

    Real decoding (PIL/opencv) is NOT available in this container — with
    fake=False this raises NotImplementedError at executor time, by design.
    With fake=True, features are derived deterministically from the payload
    bytes (sha256, mean byte value as 'intensity'), exercising the exact
    same batch shape, schema, and partitioning a real decoder would.
    """

    meta_col = f"{payload_col}_meta"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires PIL/opencv (not in this container); "
                    "pass fake=True for the deterministic test path"
                )
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "sha256": [hashlib.sha256(b).hexdigest() for b in pdf[payload_col]],
                    "n_bytes": [len(b) for b in pdf[payload_col]],
                    "width": [m["width"] for m in pdf[meta_col]],
                    "height": [m["height"] for m in pdf[meta_col]],
                    "mean_intensity": [
                        float(sum(b)) / max(len(b), 1) for b in pdf[payload_col]
                    ],
                }
            )
            yield out

    cols = [id_col, payload_col, meta_col]
    return df.select(*cols).mapInPandas(batches, IMAGE_FEATURES_SCHEMA)


def sample_frames(
    df: DataFrame, id_col: str, payload_col: str = "media", every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    rows at `every_ms` intervals (timestamps from metadata duration; frame
    payload decoding stubbed the same way as decode_image_features).
    Pure built-ins: sequence + explode — JVM-side row expansion."""
    meta = f"{payload_col}_meta"
    dur = F.coalesce(F.col(f"{meta}.duration_ms"), F.lit(0))
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), dur, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
