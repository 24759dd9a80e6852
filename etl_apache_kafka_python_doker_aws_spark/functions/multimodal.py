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


# ---------------------------------------------------------------------------
# RAW8: a self-describing toy raster format this engine decodes FOR REAL.
# Layout (little-endian): b"RAW8" | uint16 width | uint16 height |
# uint8 channels | width*height*channels pixel bytes (row-major).
# Real formats (JPEG/PNG) still require PIL/opencv and stay gated; RAW8
# proves the full binary-column pipeline — parse header, validate, numpy
# pixel math, Arrow batches — with zero external dependencies.
# ---------------------------------------------------------------------------

RAW8_MAGIC = b"RAW8"

RAW8_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_per_channel", T.ArrayType(T.DoubleType())),
        T.StructField("std_per_channel", T.ArrayType(T.DoubleType())),
        T.StructField("thumbnail_4x4", T.ArrayType(T.DoubleType())),
        T.StructField("valid", T.BooleanType()),
    ]
)


def encode_raw8(width: int, height: int, channels: int, pixels) -> bytes:
    """Serialize a numpy uint8 array (h, w, c) into RAW8 bytes."""
    import struct

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    assert px.shape == (height, width, channels), px.shape
    return RAW8_MAGIC + struct.pack("<HHB", width, height, channels) + px.tobytes()


def attach_raw8_media(df: DataFrame, id_col: str, payload_col: str = "media") -> DataFrame:
    """Generate deterministic RAW8 gradient images per id (real pixels,
    real header) via a pandas UDF — the synthetic stand-in for an object-
    store read of raster tiles."""
    import struct

    import numpy as np

    @F.pandas_udf(T.BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            w, h, c = 8 + int(i) % 8, 8 + (int(i) * 3) % 8, 3
            yy, xx = np.mgrid[0:h, 0:w]
            base = (xx * 7 + yy * 13 + int(i)) % 256
            px = np.stack([(base + k * 11) % 256 for k in range(c)], axis=-1).astype(
                np.uint8
            )
            out.append(
                RAW8_MAGIC + struct.pack("<HHB", w, h, c) + px.tobytes()
            )
        return pd.Series(out)

    return df.withColumn(payload_col, gen(F.col(id_col)))


def decode_raw8_features(
    df: DataFrame, id_col: str, payload_col: str = "media"
) -> DataFrame:
    """REAL decode of RAW8 binary columns over mapInPandas: header parse
    + length validation, per-channel mean/std, and a 4x4 mean-pooled
    grayscale thumbnail — all numpy, batch-at-a-time. Malformed payloads
    yield valid=false rows (never executor crashes: at 100 TB a poison
    blob must not kill the stage). Non-RAW8 real formats raise with a
    pointer to the gated PIL path."""
    import struct

    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None or len(b) < 9 or bytes(b[:4]) != RAW8_MAGIC:
                    rows.append((int(i), 0, 0, 0, None, None, None, False))
                    continue
                w, h, c = struct.unpack("<HHB", bytes(b[4:9]))
                body = np.frombuffer(bytes(b[9:]), dtype=np.uint8)
                if len(body) != w * h * c or w == 0 or h == 0 or c == 0:
                    rows.append((int(i), w, h, c, None, None, None, False))
                    continue
                px = body.reshape(h, w, c).astype(np.float64)
                gray = px.mean(axis=2)
                # 4x4 mean-pool: split rows/cols into 4 nearly-even chunks
                # images smaller than 4x4 produce empty pooling blocks:
                # emit None for those cells (NaN would poison downstream
                # aggregates silently)
                pools = [
                    float(block.mean()) if block.size else None
                    for rchunk in np.array_split(gray, 4, axis=0)
                    for block in np.array_split(rchunk, 4, axis=1)
                ]
                rows.append(
                    (
                        int(i), w, h, c,
                        [float(m) for m in px.mean(axis=(0, 1))],
                        [float(s) for s in px.std(axis=(0, 1))],
                        pools,
                        True,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels",
                    "mean_per_channel", "std_per_channel", "thumbnail_4x4", "valid",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RAW8_FEATURES_SCHEMA)
