"""Multimodal (image/audio/video) column plumbing (north-star M5).

Media travels as an opaque ``binary`` column plus a typed metadata struct.
The schema/partitioning/UDF-shape layer is real and tested, and so are the
codecs: PNG (stdlib zlib + numpy unfilter), baseline JPEG (operators.jpeg
— Huffman + IDCT + chroma upsampling, pure numpy), binary PPM, and
RIFF/WAV PCM. Only formats with no stdlib-expressible decoder
(WebP/AVIF/progressive JPEG) raise ``NotImplementedError`` and would
route to Pillow/libvips in production.

Scale posture: decode/feature-extract are ``mapInPandas`` stages — Arrow
batches in and out, one Python worker per core, no driver involvement. The
binary column rides the parquet scan like any other column; partition sizing
is governed by ``spark.sql.files.maxPartitionBytes`` exactly as for text.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("bytes", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Build a media table from any string column: deterministic fake bytes
    (utf-8 of the payload) + metadata. Stands in for reading real image/audio
    blobs; every downstream stage treats `bytes` as opaque."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/fake").alias("mime"),
        F.encode(F.col(payload_col), "utf-8").alias("bytes"),
        F.create_map(
            F.lit("source"), F.lit("synthetic"),
            F.lit("n_chars"), F.length(F.col(payload_col)).cast("string"),
        ).alias("meta"),
    )


def decode_image(df: DataFrame) -> DataFrame:
    """Image decode dispatching on magic bytes inside mapInPandas — REAL
    for PNG (stdlib zlib inflate + numpy per-row unfilter, ``_parse_png``),
    baseline JPEG (operators.jpeg: Huffman entropy decode + vectorized
    IDCT + chroma upsampling), and binary PPM (``_parse_ppm``). Formats
    with no native codec here (WebP/AVIF/progressive JPEG/...) raise
    NotImplementedError — they need Pillow/libvips. Output is IMAGE_SCHEMA
    (dims + raw pixel plane), so ``resize_nearest``/``image_stats``
    compose regardless of source format."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from bullet_spark_spark.operators.jpeg import decode_jpeg

        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["bytes"]):
                data = bytes(blob or b"")
                if data.startswith(PNG_SIGNATURE):
                    h, w, c, px = _parse_png(data)
                elif data.startswith(b"\xff\xd8"):
                    h, w, c, px = decode_jpeg(data)
                elif data.startswith(b"P6"):
                    h, w, c, px = _parse_ppm(data)
                else:
                    raise NotImplementedError(
                        "image decode for this format needs Pillow/libvips "
                        "(PNG, baseline JPEG, and P6 PPM decode natively); "
                        "plumbing (schema/Arrow/mapInPandas) is real"
                    )
                rows.append((mid, h, w, c, px))
            yield pd.DataFrame(
                rows, columns=["media_id", "height", "width", "channels", "pixels"]
            )

    return df.mapInPandas(decode, schema=IMAGE_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Deterministic fake feature extractor: FEATURE_DIM floats derived from
    the byte content (rolling checksum per stripe). Real system swaps the
    inner function for a model forward pass; the Spark-side contract
    (mapInPandas, Arrow batches, fixed-dim float array out) is identical."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, mime, blob in zip(pdf["media_id"], pdf["mime"], pdf["bytes"]):
                data = bytes(blob or b"")
                stripe = max(1, len(data) // FEATURE_DIM)
                feats = []
                for i in range(FEATURE_DIM):
                    chunk = data[i * stripe : (i + 1) * stripe]
                    feats.append(float(sum(chunk) % 1000) / 1000.0)
                rows.append((mid, mime, len(data), feats))
            yield pd.DataFrame(
                rows, columns=["media_id", "mime", "n_bytes", "features"]
            )

    return df.mapInPandas(features, schema=FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8) -> DataFrame:
    """Deterministic fake frame sampler (video analogue): slices the payload
    into fixed-size 'frames', emitting ≤ max_frames per media row. Real
    system: pyav keyframe extraction; identical mapInPandas shape."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["bytes"]):
                data = bytes(blob or b"")
                for idx in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    rows.append((mid, idx, data[idx * every_n_bytes : (idx + 1) * every_n_bytes]))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_bytes"])

    return df.mapInPandas(frames, schema=FRAME_SCHEMA)


# --------------------------------------------------------------------------
# Real codec paths (no external libraries needed): PPM (P6) is a header +
# raw RGB bytes, and PNG is zlib-deflated filtered scanlines — both
# decodable with stdlib + numpy, so the decode → resize → feature pipeline
# below is REAL end-to-end. JPEG (entropy coding) still routes to the
# decode_image NotImplementedError until a codec library is present; the
# Spark-side contract is identical either way.
# --------------------------------------------------------------------------

IMAGE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("pixels", BinaryType()),  # raw HxWxC uint8, row-major
    ]
)


def encode_ppm(arr) -> bytes:
    """numpy (H, W, 3) uint8 → binary PPM (P6). Test/fixture helper."""
    h, w, c = arr.shape
    assert c == 3, "PPM is RGB"
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _parse_ppm(data: bytes):
    """P6 PPM → (height, width, 3, pixel bytes). Pure-python header parse +
    numpy reshape; raises ValueError on malformed input."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if data[i : i + 1] == b"#":  # comment to end of line
            while i < len(data) and data[i : i + 1] != b"\n":
                i += 1
            continue
        start = i
        while i < len(data) and not data[i : i + 1].isspace():
            i += 1
        tokens.append(data[start:i])
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    pixels = data[i : i + h * w * 3]
    if len(pixels) != h * w * 3:
        raise ValueError("truncated pixel data")
    return h, w, 3, pixels


# ------------------------------- PNG (stdlib zlib + numpy — no codec lib) --

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type → channel count (8-bit, non-interlaced only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(arr) -> bytes:
    """numpy (H, W, C) uint8 (C in {1,2,3,4}) → real PNG bytes (filter 0,
    single IDAT). Test/fixture/producer helper — emits spec-conformant files
    any PNG reader opens."""
    import struct
    import zlib

    import numpy as np

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _parse_png(data: bytes):
    """PNG → (height, width, channels, raw pixel bytes): chunk walk, zlib
    inflate of the concatenated IDAT stream, then per-scanline unfiltering
    (all 5 filter types — None/Sub/Up/Average/Paeth). 8-bit non-interlaced
    gray/gray+alpha/RGB/RGBA; palette (color type 3), 16-bit, and Adam7
    interlace raise ValueError (they are rare in training corpora and would
    route to a codec library)."""
    import struct
    import zlib

    import numpy as np

    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG")
    pos, ihdr, idat = len(PNG_SIGNATURE), None, []
    while pos + 8 <= len(data):
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + size  # size + tag + body + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={color_type}, "
            f"interlace={interlace}): only 8-bit non-interlaced "
            "gray/GA/RGB/RGBA decode natively"
        )
    c = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("truncated PNG pixel data")

    out = np.zeros((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r else zero
        if ft == 0:  # None
            cur = line
        elif ft == 2:  # Up — vectorizes (no intra-row dependency)
            cur = (line + prev) & 0xFF
        elif ft in (1, 3, 4):  # Sub/Average/Paeth — sequential along the row
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - c] if i >= c else 0
                b = int(prev[i])
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + b) >> 1
                else:
                    cc = int(prev[i - c]) if i >= c else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[r] = cur.astype(np.uint8)
    return h, w, c, out.tobytes()


def decode_ppm(df: DataFrame) -> DataFrame:
    """REAL image decode for binary PPM columns: mapInPandas over Arrow
    batches, each row's bytes parsed to (height, width, channels, raw
    pixels). The shape every decode stage shares — swapping the parser for
    Pillow when available changes one inner function, not the plan."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["bytes"]):
                h, w, c, px = _parse_ppm(bytes(blob))
                rows.append((mid, h, w, c, px))
            yield pd.DataFrame(
                rows, columns=["media_id", "height", "width", "channels", "pixels"]
            )

    return df.mapInPandas(decode, schema=IMAGE_SCHEMA)


def resize_nearest(df: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """REAL nearest-neighbour resize of decoded images (numpy integer
    indexing per Arrow batch) — the normalize-resolution stage of an image
    training pipeline. Output keeps IMAGE_SCHEMA with the new dimensions."""
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, h, w, c, px in zip(
                pdf["media_id"], pdf["height"], pdf["width"], pdf["channels"], pdf["pixels"]
            ):
                arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w, c)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                out = arr[ys][:, xs]
                rows.append((mid, out_h, out_w, int(c), out.tobytes()))
            yield pd.DataFrame(
                rows, columns=["media_id", "height", "width", "channels", "pixels"]
            )

    return df.mapInPandas(resize, schema=IMAGE_SCHEMA)


def image_stats(df: DataFrame) -> DataFrame:
    """REAL per-image statistics over decoded pixels: per-channel means and
    a luminance histogram sketch (8 buckets) — the quality/dedup features an
    image curation pipeline computes after decode."""
    import numpy as np

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("mean_r", FloatType()),
            StructField("mean_g", FloatType()),
            StructField("mean_b", FloatType()),
            StructField("luma_hist", ArrayType(FloatType())),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, h, w, c, px in zip(
                pdf["media_id"], pdf["height"], pdf["width"], pdf["channels"], pdf["pixels"]
            ):
                arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w, c).astype(np.float64)
                means = arr.reshape(-1, c).mean(axis=0)
                luma = arr @ np.array([0.299, 0.587, 0.114])
                hist, _ = np.histogram(luma, bins=8, range=(0.0, 255.0))
                hist = hist / max(1, luma.size)
                rows.append(
                    (
                        mid,
                        float(means[0]),
                        float(means[1]),
                        float(means[2]),
                        [float(x) for x in hist],
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "mean_r", "mean_g", "mean_b", "luma_hist"]
            )

    return df.mapInPandas(stats, schema=out_schema)


def attach_ppm_media(df: DataFrame, id_col: str, payload_col: str, side: int = 8) -> DataFrame:
    """Build REAL (decodable) PPM media from any string column: the payload's
    utf-8 bytes, right-padded/truncated to side×side×3, become the pixel
    plane. Deterministic, pure column expressions — gives every fixture table
    an image column the real decode path can exercise."""
    n = side * side * 3
    header = ("P6\n%d %d\n255\n" % (side, side)).encode()
    pixels = F.encode(F.rpad(F.col(payload_col), n, " ").substr(1, n), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/x-portable-pixmap").alias("mime"),
        F.concat(F.lit(header), pixels).alias("bytes"),
        F.create_map(
            F.lit("source"), F.lit("synthetic-ppm"),
            F.lit("side"), F.lit(str(side)),
        ).alias("meta"),
    )


# ------------------------------- audio (RIFF/WAV PCM — numpy-decodable) ----

AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("samples", BinaryType()),  # int16 little-endian mono
    ]
)


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """numpy int16 mono array → minimal RIFF/WAV (PCM). Test/fixture helper."""
    import struct

    data = samples.astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(df: DataFrame) -> DataFrame:
    """REAL audio decode for RIFF/WAV PCM-16 mono columns (header walk +
    numpy frombuffer — no audio library needed). Compressed codecs would
    swap the inner parser; the mapInPandas contract is identical."""
    import struct

    def parse(data: bytes):
        if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE file")
        i, rate, samples = 12, None, None
        while i + 8 <= len(data):
            cid, size = data[i : i + 4], struct.unpack("<I", data[i + 4 : i + 8])[0]
            body = data[i + 8 : i + 8 + size]
            if cid == b"fmt ":
                fmt, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
                if (fmt, ch, bits) != (1, 1, 16):
                    raise ValueError("only PCM-16 mono supported")
            elif cid == b"data":
                samples = body
            i += 8 + size + (size & 1)
        if rate is None or samples is None:
            raise ValueError("missing fmt/data chunk")
        return rate, samples

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["bytes"]):
                rate, samples = parse(bytes(blob))
                rows.append((mid, rate, len(samples) // 2, samples))
            yield pd.DataFrame(
                rows, columns=["media_id", "sample_rate", "n_samples", "samples"]
            )

    return df.mapInPandas(decode, schema=AUDIO_SCHEMA)


def audio_stats(df: DataFrame) -> DataFrame:
    """REAL per-clip audio features over decoded PCM: duration, RMS level,
    zero-crossing rate, clipping ratio — the filter signals an audio
    curation pipeline computes after decode."""
    import numpy as np

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("duration_sec", FloatType()),
            StructField("rms", FloatType()),
            StructField("zero_cross_rate", FloatType()),
            StructField("clip_ratio", FloatType()),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, rate, n, blob in zip(
                pdf["media_id"], pdf["sample_rate"], pdf["n_samples"], pdf["samples"]
            ):
                x = np.frombuffer(bytes(blob), dtype="<i2").astype(np.float64) / 32768.0
                dur = n / rate
                rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
                zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if n > 1 else 0.0
                clip = float(np.mean(np.abs(x) > 0.999)) if n else 0.0
                rows.append((mid, float(dur), rms, zcr, clip))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "duration_sec", "rms", "zero_cross_rate", "clip_ratio"],
            )

    return df.mapInPandas(stats, schema=out_schema)


# ----------------------- video (AVI/MJPEG — numpy-decodable) ---------------
#
# The video analogue of the WAV and PNG/JPEG paths: Motion-JPEG inside a
# minimal RIFF/AVI container. The RIFF walk is the same discipline as
# decode_wav; each '00dc' chunk is a complete baseline JPEG the
# operators.jpeg codec decodes — so frame-sampling + per-frame decode are
# REAL end-to-end with no video library. Inter-frame codecs (H.264/VP9)
# would swap the chunk parser for pyav behind the identical mapInPandas
# contract.

VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_sec", FloatType()),
        StructField("frame_bytes", BinaryType()),  # one complete JPEG
    ]
)


def encode_avi_mjpeg(frames: list, fps: int = 10) -> bytes:
    """List of JPEG byte strings → minimal spec-shaped AVI (RIFF 'AVI ' with
    hdrl avih + strl strh/strf 'vids'/'MJPG', then the 'movi' LIST of
    '00dc' chunks, even-padded). Test/fixture helper, like encode_wav."""
    import struct

    from bullet_spark_spark.operators.jpeg import decode_jpeg

    h, w = (0, 0)
    if frames:
        h, w, _, _ = decode_jpeg(frames[0])

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(subtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", subtype + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0xFFFFFFFF, 0,
        0, 0, w & 0xFFFF, h & 0xFFFF,
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", h * w * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def parse_avi_mjpeg(data: bytes):
    """AVI bytes → (fps, [jpeg_frame_bytes, ...]). RIFF walk: read avih for
    the frame clock, then every '00dc'/'00db' chunk inside LIST 'movi'."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    fps, frames = None, []

    def walk(buf: bytes) -> None:
        nonlocal fps
        i = 0
        while i + 8 <= len(buf):
            cid, size = buf[i : i + 4], struct.unpack("<I", buf[i + 4 : i + 8])[0]
            body = buf[i + 8 : i + 8 + size]
            if cid == b"LIST":
                walk(body[4:])  # recurse past the subtype fourcc
            elif cid == b"avih":
                usec = struct.unpack("<I", body[:4])[0]
                fps = round(1_000_000 / usec) if usec else None
            elif cid in (b"00dc", b"00db"):
                frames.append(body)
            i += 8 + size + (size & 1)

    walk(data[12:])
    if fps is None:
        raise ValueError("missing avih header")
    return fps, frames


def sample_video_frames(
    df: DataFrame, every_n: int = 1, max_frames: int | None = None
) -> DataFrame:
    """REAL video frame sampling: parse the AVI container, keep every
    ``every_n``-th frame (≤ ``max_frames`` per video), emit one row per kept
    frame with its stream timestamp. ``frame_bytes`` is a complete JPEG, so
    the rows compose directly with ``decode_image``/``image_stats`` —
    exactly how a keyframe-extraction stage feeds a vision pipeline.

    Scale shape: mapInPandas over Arrow batches; fan-out is rows→frames
    (bounded by max_frames), no shuffle — downstream repartitioning is the
    caller's choice when frame work dominates."""

    def frames_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["bytes"]):
                fps, frames = parse_avi_mjpeg(bytes(blob or b""))
                kept = frames[::every_n] if every_n > 1 else frames
                if max_frames is not None:
                    kept = kept[:max_frames]
                for k, fb in enumerate(kept):
                    idx = k * every_n
                    rows.append((mid, idx, float(idx) / fps, fb))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "ts_sec", "frame_bytes"]
            )

    return df.mapInPandas(frames_fn, schema=VIDEO_FRAME_SCHEMA)


def attach_mjpeg_media(
    df: DataFrame, id_col: str, n_frames: int = 4, side: int = 16, fps: int = 10
) -> DataFrame:
    """Build REAL (decodable) MJPEG/AVI media per row: ``n_frames`` gradient
    frames whose phase is seeded by the row id, JPEG-encoded and boxed in
    the AVI container. pandas-UDF (the encoder is numpy); deterministic per
    id — gives any fixture table a video column the real path can decode."""
    import numpy as np

    from bullet_spark_spark.operators.jpeg import encode_jpeg

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid in pdf["__id"]:
                frames = []
                for f in range(n_frames):
                    y, x = np.mgrid[0:side, 0:side]
                    r = (x * 255 // max(side - 1, 1) + int(rid) * 11 + f * 29) % 256
                    g = (y * 255 // max(side - 1, 1) + f * 53) % 256
                    b = np.full_like(r, (int(rid) * 7 + f * 17) % 256)
                    frames.append(
                        encode_jpeg(np.stack([r, g, b], axis=-1).astype(np.uint8), quality=90)
                    )
                rows.append((int(rid), "video/x-msvideo", encode_avi_mjpeg(frames, fps)))
            yield pd.DataFrame(rows, columns=["media_id", "mime", "bytes"])

    src = df.select(F.col(id_col).cast("long").alias("__id"))
    return src.mapInPandas(
        build,
        schema=StructType(
            [
                StructField("media_id", LongType()),
                StructField("mime", StringType()),
                StructField("bytes", BinaryType()),
            ]
        ),
    )


def audio_spectral_features(df: DataFrame, n_fft: int = 512) -> DataFrame:
    """REAL frequency-domain audio features over decoded PCM — the
    speech/music curation signals time-domain stats can't see: spectral
    centroid + bandwidth (brightness), 85% rolloff, spectral flatness
    (tonal vs noise-like — the voice-activity proxy), dominant frequency.
    Hann-windowed half-overlapping frames through numpy's FFT (no audio
    library), per-clip means of the per-frame magnitude spectra.

    Arrow-batched mapInPandas like every media stage; at scale the only
    knob is arrow batch size vs clip length (SCALE.md multimodal note)."""
    import numpy as np

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("centroid_hz", FloatType()),
            StructField("bandwidth_hz", FloatType()),
            StructField("rolloff_hz", FloatType()),
            StructField("flatness", FloatType()),
            StructField("dominant_hz", FloatType()),
        ]
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        win = np.hanning(n_fft)
        for pdf in batches:
            rows = []
            for mid, rate, blob in zip(
                pdf["media_id"], pdf["sample_rate"], pdf["samples"]
            ):
                x = (
                    np.frombuffer(bytes(blob), dtype="<i2").astype(np.float64)
                    / 32768.0
                )
                if len(x) < n_fft:
                    x = np.pad(x, (0, n_fft - len(x)))
                hop = n_fft // 2
                n_frames = 1 + (len(x) - n_fft) // hop
                frames = np.lib.stride_tricks.sliding_window_view(x, n_fft)[
                    ::hop
                ][:n_frames]
                mag = np.abs(np.fft.rfft(frames * win, axis=1))
                spec = mag.mean(axis=0)  # mean magnitude spectrum
                freqs = np.fft.rfftfreq(n_fft, d=1.0 / rate)
                p = spec / max(spec.sum(), 1e-12)
                centroid = float((freqs * p).sum())
                bandwidth = float(
                    np.sqrt(((freqs - centroid) ** 2 * p).sum())
                )
                cum = np.cumsum(p)
                rolloff = float(freqs[int(np.searchsorted(cum, 0.85))])
                power = spec**2 + 1e-20
                flatness = float(
                    np.exp(np.mean(np.log(power))) / np.mean(power)
                )
                dominant = float(freqs[int(np.argmax(spec))])
                rows.append(
                    (mid, centroid, bandwidth, rolloff, flatness, dominant)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "centroid_hz", "bandwidth_hz",
                    "rolloff_hz", "flatness", "dominant_hz",
                ],
            )

    return df.mapInPandas(feats, schema=out_schema)


def phash_images(decoded: DataFrame, hash_size: int = 8, highfreq: int = 4) -> DataFrame:
    """64-bit perceptual hash per decoded image — (media_id, phash).
    The classic pHash recipe: grayscale → block-mean resize to
    (hash_size·highfreq)² → 2-D DCT-II → keep the hash_size×hash_size
    low-frequency corner → bit i = coefficient > median. Images that are
    re-encoded, slightly blurred, or brightness-shifted keep most bits,
    so near-duplicate detection becomes a Hamming-distance problem on
    64-bit ints — feeding dedup.hamming_near_dup_pairs' pigeonhole join
    exactly like text simhash.

    Input is IMAGE_SCHEMA from decode_image (any codec). Pure numpy
    inside mapInPandas (Arrow-batched; the DCT is two 32×32 matmuls per
    image). Engine-specific by nature → rows-only in the oracle suite."""
    import numpy as np

    n = hash_size * highfreq  # 32 by default

    # DCT-II matrix, orthonormal — same convention as scipy.fft.dct(norm='ortho')
    k = np.arange(n)
    dct_m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    dct_m[0, :] /= np.sqrt(2.0)

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in batches:
            for mid, h, w, c, px in zip(
                pdf["media_id"], pdf["height"], pdf["width"],
                pdf["channels"], pdf["pixels"],
            ):
                arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w, c)
                gray = arr.astype(np.float64).mean(axis=2)
                # per-axis resize to n: bucket means when shrinking,
                # nearest-index replication when growing
                def _resize_axis(a, m, axis):
                    if m >= n:
                        idx = np.arange(m) * n // m
                        out = np.add.reduceat(
                            a, np.searchsorted(idx, np.arange(n)), axis=axis
                        )
                        cnt = np.bincount(idx, minlength=n)
                        shape = [1, 1]
                        shape[axis] = n
                        return out / cnt.reshape(shape)
                    return np.take(a, np.arange(n) * m // n, axis=axis)

                rs = _resize_axis(_resize_axis(gray, h, 0), w, 1)
                coef = dct_m @ rs @ dct_m.T
                block = coef[:hash_size, :hash_size].ravel()
                bits = block > np.median(block)
                v = 0
                for bit in bits:
                    v = (v << 1) | int(bit)
                # wrap to signed 64-bit (Spark LongType)
                if v >= 1 << 63:
                    v -= 1 << 64
                rows.append((int(mid), v))
        yield pd.DataFrame(rows, columns=["media_id", "phash"])

    return decoded.mapInPandas(
        hashes,
        schema=StructType(
            [StructField("media_id", LongType()), StructField("phash", LongType())]
        ),
    )


def energy_segments(
    df: DataFrame,
    frame_ms: int = 20,
    threshold: float = 0.02,
    min_frames: int = 2,
) -> DataFrame:
    """Energy-based voice-activity segmentation over decoded PCM →
    (media_id, seg_idx, start_sec, end_sec, mean_rms): split each clip
    into ``frame_ms`` frames, mark frames whose RMS exceeds ``threshold``
    as active, and emit maximal active runs of at least ``min_frames``
    frames — the classic energy-VAD prefilter an audio curation pipeline
    runs to drop silence/noise-only clips and to cut long recordings into
    trainable utterances (the audio analogue of chunk_documents).

    Scale shape: clip-local — one mapInPandas over the decoded frame
    (Arrow batches, numpy reshape + one boolean run-length scan per
    clip, no Python per-sample loop); clips parallelize across the
    cluster and nothing shuffles. Deterministic given the PCM bytes.
    A model-based VAD (webrtcvad/silero) would swap the frame scorer
    behind the identical contract."""
    import numpy as np

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("seg_idx", IntegerType()),
            StructField("start_sec", FloatType()),
            StructField("end_sec", FloatType()),
            StructField("mean_rms", FloatType()),
        ]
    )

    def segments(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, rate, blob in zip(
                pdf["media_id"], pdf["sample_rate"], pdf["samples"]
            ):
                x = np.frombuffer(bytes(blob), dtype="<i2").astype(np.float64) / 32768.0
                flen = max(1, int(rate) * frame_ms // 1000)
                n_frames = len(x) // flen
                if n_frames == 0:
                    continue
                frames = x[: n_frames * flen].reshape(n_frames, flen)
                rms = np.sqrt(np.mean(frames * frames, axis=1))
                active = rms > threshold
                # run-length scan: boundaries where activity flips
                padded = np.concatenate(([False], active, [False]))
                starts = np.flatnonzero(~padded[:-1] & padded[1:])
                ends = np.flatnonzero(padded[:-1] & ~padded[1:])
                seg_idx = 0
                for s, e in zip(starts, ends):
                    if e - s < min_frames:
                        continue
                    rows.append(
                        (
                            mid,
                            seg_idx,
                            float(s * flen / rate),
                            float(e * flen / rate),
                            float(np.mean(rms[s:e])),
                        )
                    )
                    seg_idx += 1
            yield pd.DataFrame(
                rows,
                columns=["media_id", "seg_idx", "start_sec", "end_sec", "mean_rms"],
            )

    return df.mapInPandas(segments, schema=out_schema)
