"""Multimodal (image/audio/video) column plumbing.

The corpus schema interleaves text spans with media spans
(FIXTURES.md §1); at training-data scale the media payloads live as
opaque ``binary`` columns with typed metadata, and decode / feature
extraction runs as Arrow-batched Pandas functions via ``mapInPandas``.

``decode_media(..., impl="real")`` REALLY decodes the four formats a
stdlib-pure container can: uncompressed 24-bit BMP (struct-parsed
headers + pixel channel sums), 16-bit PCM WAV (the stdlib ``wave``
codec), 8-bit RGB PNG (full stdlib decoder: chunk walk, zlib IDAT
inflate, all five scanline filters incl. Paeth), and baseline
sequential JPEG (marker walk, file-supplied DQT/DHT, Huffman entropy
decode, dequant + IDCT, fixed-point YCbCr→RGB; 4:4:4 or grayscale) —
:func:`synth_media_table_real` / :func:`synth_media_table_png` /
:func:`synth_media_table_jpeg` build genuine files of each.  Formats
needing non-stdlib codecs (mp4; progressive/subsampled jpeg) raise at
the codec call site; the default ``impl="fake"`` byte-histogram twin
keeps the Spark-side plumbing — schema, Arrow batch shape, partition
behavior — testable for any format.

Scale notes: media rows are fat (MBs); we bound Arrow batches via
``spark.sql.execution.arrow.maxRecordsPerBatch`` (set in plans.job) and
keep the decode a partition-preserving mapInPandas (no shuffle).  Frame
sampling emits one row per sampled frame via the iterator protocol
(output batches need not align 1:1 with input rows).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),          # figure | table | image | audio | video
        StructField("payload", BinaryType()),       # opaque bytes
        StructField("n_bytes", IntegerType()),
        StructField("format", StringType()),        # e.g. png | wav | mp4 (from metadata)
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("features", ArrayType(DoubleType())),  # 16-bin byte histogram (fake decode)
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def synth_media_table(spans_df: DataFrame) -> DataFrame:
    """Media spans of the documents table → typed media rows with a
    deterministic fake binary payload (md5-derived bytes; a real corpus
    reads the payload from object storage by ``media_ref``).

    Pure built-in expressions — ``unhex(md5(...))`` stays JVM-side.
    """
    media = (
        spans_df.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind").isin("figure", "table"))
        .select(
            "doc_id",
            F.col("s.media_ref").alias("media_ref"),
            F.col("s.kind").alias("kind"),
        )
    )
    payload = F.unhex(
        F.concat(F.md5(F.col("media_ref")), F.md5(F.concat(F.col("media_ref"), F.lit(":1"))))
    )
    return media.select(
        "doc_id",
        "media_ref",
        "kind",
        payload.alias("payload"),
        F.length(payload).cast("int").alias("n_bytes"),
        F.when(F.col("kind") == "figure", F.lit("png")).otherwise(F.lit("csv")).alias("format"),
    )


# ---------------------------------------------------------------------------
# REAL codecs for the two formats a stdlib-pure container can decode:
# uncompressed BMP (struct-parsed) and PCM WAV (the stdlib `wave` module).
# Compressed formats (jpeg/png/mp4) genuinely need PIL/ffmpeg and still
# raise NotImplementedError below.
# ---------------------------------------------------------------------------

import struct as _struct

BMP_W = BMP_H = 8          # synth image geometry (8*3 stride: no row padding)
_BMP_PIXBYTES = BMP_W * BMP_H * 3
_BMP_HEADER = (
    b"BM"
    + _struct.pack("<IHHI", 54 + _BMP_PIXBYTES, 0, 0, 54)          # file header
    + _struct.pack("<IiiHHIIiiII", 40, BMP_W, BMP_H, 1, 24, 0,     # BITMAPINFOHEADER
                   _BMP_PIXBYTES, 2835, 2835, 0, 0)
)
WAV_RATE, WAV_FRAMES = 8000, 32   # mono 16-bit PCM -> 64 data bytes
_WAV_DATABYTES = WAV_FRAMES * 2
_WAV_HEADER = (
    b"RIFF" + _struct.pack("<I", 36 + _WAV_DATABYTES) + b"WAVE"
    + b"fmt " + _struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
    + b"data" + _struct.pack("<I", _WAV_DATABYTES)
)


def _decode_bmp(payload: bytes) -> list[float]:
    """Parse a real (uncompressed 24-bit) BMP with struct: validate the
    magic, read geometry from the headers, then per-channel pixel sums —
    [width, height, sum_B, sum_G, sum_R], all integers (exact doubles)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = _struct.unpack_from("<I", payload, 10)
    width, height = _struct.unpack_from("<ii", payload, 18)
    (bpp,) = _struct.unpack_from("<H", payload, 28)
    if bpp != 24 or (width * 3) % 4 != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} width={width}")
    pix = payload[data_off : data_off + width * abs(height) * 3]
    sums = [0, 0, 0]   # B, G, R — BMP stores BGR
    for i, b in enumerate(pix):
        sums[i % 3] += b
    return [float(width), float(abs(height))] + [float(s) for s in sums]


def _decode_wav(payload: bytes) -> list[float]:
    """Decode PCM WAV with the stdlib `wave` codec —
    [n_channels, framerate, n_frames, sum(|sample|)] as exact doubles."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        ch, rate, n = w.getnchannels(), w.getframerate(), w.getnframes()
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        frames = w.readframes(n)
    vals = _struct.unpack(f"<{n * ch}h", frames)
    return [float(ch), float(rate), float(n), float(sum(abs(v) for v in vals))]


# --- PNG: a REAL stdlib decoder/encoder (zlib inflate + scanline
# (un)filtering per the PNG spec) — reference corpus media ("figure/
# table" spans) is most plausibly PNG, and PNG needs no PIL: the whole
# codec is zlib + struct.  Supported profile: 8-bit RGB (color type 2),
# no interlace — the profile the synthesizer emits and thumbnailers
# produce.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
PNG_W = PNG_H = 8


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        _struct.pack(">I", len(body))
        + tag
        + body
        + _struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _encode_png(pixels: bytes, width: int, height: int) -> bytes:
    """Emit a VALID 8-bit RGB PNG from raw RGB bytes.  Each row takes
    filter type ``row % 5`` — deliberately cycling through ALL five spec
    filters (None/Sub/Up/Average/Paeth) so every synthesized file
    exercises the decoder's full unfilter path, not just the trivial
    one.  Deterministic: zlib level pinned, no timestamps."""
    import zlib

    bpp = 3
    stride = width * bpp
    prev = bytes(stride)
    out = bytearray()
    for r in range(height):
        row = pixels[r * stride : (r + 1) * stride]
        ft = r % 5
        out.append(ft)
        for i, x in enumerate(row):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                f = x
            elif ft == 1:
                f = (x - a) & 0xFF
            elif ft == 2:
                f = (x - b) & 0xFF
            elif ft == 3:
                f = (x - (a + b) // 2) & 0xFF
            else:
                f = (x - _png_paeth(a, b, c)) & 0xFF
            out.append(f)
        prev = row
    ihdr = _struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_pixels(payload: bytes) -> tuple[int, int, bytes]:
    """Full PNG parse → (width, height, raw RGB bytes): signature check,
    chunk walk, IHDR validation (8-bit RGB, no interlace), multi-IDAT
    concat, zlib inflate, and per-row unfilter of all five filter
    types."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width = 8, None
    height = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (ln,) = _struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, inter = _struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, ctype, comp, filt, inter) != (8, 2, 0, 0, 0):
                raise ValueError(
                    f"unsupported PNG profile: depth={depth} color={ctype} interlace={inter}"
                )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + ln  # len + tag + body + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    bpp = 3
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    prev = bytearray(stride)
    pixels = bytearray()
    for r in range(height):
        ft = raw[r * (stride + 1)]
        row = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        for i in range(stride):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 1:
                row[i] = (row[i] + a) & 0xFF
            elif ft == 2:
                row[i] = (row[i] + b) & 0xFF
            elif ft == 3:
                row[i] = (row[i] + (a + b) // 2) & 0xFF
            elif ft == 4:
                row[i] = (row[i] + _png_paeth(a, b, c)) & 0xFF
            elif ft != 0:
                raise ValueError(f"bad PNG filter type {ft}")
        pixels += row
        prev = row
    return width, height, bytes(pixels)


def _decode_png(payload: bytes) -> list[float]:
    """[width, height, sum_R, sum_G, sum_B] — PNG stores RGB (the BMP
    twin emits BGR order); all integers, exact as doubles."""
    w, h, pix = _png_pixels(payload)
    sums = [0, 0, 0]
    for i, v in enumerate(pix):
        sums[i % 3] += v
    return [float(w), float(h)] + [float(s) for s in sums]


# --- JPEG: a REAL stdlib baseline-sequential codec (ITU T.81).  Real
# crawl corpora are jpeg-heavy, so the decode leg can't honestly stop at
# PNG.  Profile: baseline DCT (SOF0), 8-bit, grayscale or 3-component
# YCbCr with no chroma subsampling (all sampling factors 1 — the 4:4:4
# shape thumbnailers emit); progressive (SOF2) and subsampled files
# raise a ValueError naming the unsupported profile, mirroring the PNG
# decoder's contract.  The DHT/DQT tables are read from the FILE (any
# baseline 4:4:4/grayscale jpeg decodes, not just ours); the encoder
# writes the spec's Annex-K Huffman tables so synthesized files open in
# any viewer.  Color conversion is fixed-point integer math (the same
# 16-bit-scaled constants libjpeg uses), which keeps the math exactly
# replayable by an integer-only SQL oracle.

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.3 typical Huffman tables: (BITS counts per code length 1..16,
# HUFFVAL symbol list) for DC/AC luminance and chrominance.
_JPEG_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_JPEG_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# fixed-point color conversion, 16-bit scale (identical constants to
# libjpeg's jccolor/jdcolor): exact integer math both here and in the
# DuckDB oracle.  Forward triples sum to 65536 so gray stays gray.
_JFIX = 65536
_JHALF = 32768


def _jpeg_rgb_to_ycc(r: int, g: int, b: int) -> tuple[int, int, int]:
    y = (19595 * r + 38470 * g + 7471 * b + _JHALF) >> 16
    cb = ((-11059 * r - 21709 * g + 32768 * b + _JHALF) >> 16) + 128
    cr = ((32768 * r - 27439 * g - 5329 * b + _JHALF) >> 16) + 128
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)  # noqa: E731
    return clamp(y), clamp(cb), clamp(cr)


def _jpeg_ycc_to_rgb(y: int, cb: int, cr: int) -> tuple[int, int, int]:
    r = y + ((91881 * (cr - 128) + _JHALF) >> 16)
    g = y + ((-22554 * (cb - 128) - 46802 * (cr - 128) + _JHALF) >> 16)
    b = y + ((116130 * (cb - 128) + _JHALF) >> 16)
    clamp = lambda v: 0 if v < 0 else (255 if v > 255 else v)  # noqa: E731
    return clamp(r), clamp(g), clamp(b)


def _jpeg_cos_table() -> list[list[float]]:
    import math

    return [
        [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)] for u in range(8)
    ]


_JPEG_COS = _jpeg_cos_table()
_JPEG_C = [0.7071067811865476] + [1.0] * 7  # C(0)=1/sqrt(2)


def _jpeg_fdct(block: list[int]) -> list[int]:
    """Forward 8×8 DCT of level-shifted samples → quantized (qtab=1)
    integer coefficients in natural order."""
    out = [0] * 64
    for v in range(8):
        for u in range(8):
            s = 0.0
            for y in range(8):
                cy = _JPEG_COS[v][y]
                row = y * 8
                for x in range(8):
                    s += block[row + x] * _JPEG_COS[u][x] * cy
            val = 0.25 * _JPEG_C[u] * _JPEG_C[v] * s
            out[v * 8 + u] = int(val + 0.5) if val >= 0 else -int(-val + 0.5)
    return out


def _jpeg_idct(coef: list[int]) -> list[int]:
    """Inverse 8×8 DCT of dequantized coefficients → clamped samples."""
    out = [0] * 64
    for y in range(8):
        for x in range(8):
            s = 0.0
            for v in range(8):
                cv = _JPEG_C[v] * _JPEG_COS[v][y]
                row = v * 8
                for u in range(8):
                    c = coef[row + u]
                    if c:
                        s += _JPEG_C[u] * c * _JPEG_COS[u][x] * cv
            val = 0.25 * s + 128.0
            iv = int(val + 0.5) if val >= 0 else 0
            out[y * 8 + x] = 0 if iv < 0 else (255 if iv > 255 else iv)
    return out


class _JpegBitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, bits: int, n: int) -> None:
        self._acc = (self._acc << n) | (bits & ((1 << n) - 1))
        self._n += n
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)  # pad with 1s
        return bytes(self.buf)


def _jpeg_build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the spec's canonical code assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


def _jpeg_magnitude(v: int) -> tuple[int, int]:
    """(size category, appended bits) for a DC diff / AC coefficient."""
    a, s = abs(v), 0
    while a:
        a >>= 1
        s += 1
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _jpeg_encode_block(
    w: _JpegBitWriter,
    coef: list[int],
    pred: int,
    dc: dict[int, tuple[int, int]],
    ac: dict[int, tuple[int, int]],
) -> int:
    zz = [coef[_JPEG_ZIGZAG[i]] for i in range(64)]
    s, bits = _jpeg_magnitude(zz[0] - pred)
    c, ln = dc[s]
    w.put(c, ln)
    if s:
        w.put(bits, s)
    run = 0
    for i in range(1, 64):
        if zz[i] == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac[0xF0]  # ZRL
            w.put(c, ln)
            run -= 16
        s, bits = _jpeg_magnitude(zz[i])
        c, ln = ac[(run << 4) | s]
        w.put(c, ln)
        w.put(bits, s)
        run = 0
    if run:
        c, ln = ac[0x00]  # EOB
        w.put(c, ln)
    return zz[0]


def _encode_jpeg(pixels: bytes, width: int, height: int, gray: bool = False) -> bytes:
    """Emit a VALID baseline-sequential JPEG (quant tables all 1s —
    legal, near-lossless; exactly lossless for blocks that are constant
    per channel, where every AC coefficient is analytically zero).
    width/height must be multiples of 8 (the synth geometry); ``pixels``
    is raw RGB (or luma bytes when ``gray``)."""
    if width % 8 or height % 8:
        raise ValueError("encoder requires multiple-of-8 geometry")
    ncomp = 1 if gray else 3
    planes: list[list[int]] = [[0] * (width * height) for _ in range(ncomp)]
    for i in range(width * height):
        if gray:
            planes[0][i] = pixels[i]
        else:
            y, cb, cr = _jpeg_rgb_to_ycc(
                pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
            )
            planes[0][i], planes[1][i], planes[2][i] = y, cb, cr

    out = bytearray(b"\xff\xd8")  # SOI
    qtab = bytes([0]) + bytes([1] * 64)  # Pq=0/Tq=0, all-ones
    out += b"\xff\xdb" + _struct.pack(">H", 2 + 65) + qtab
    sof = _struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])  # id, sampling 1x1, qtab 0
    out += b"\xff\xc0" + _struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0x00, _JPEG_DC_LUM), (0x10, _JPEG_AC_LUM)]
    if ncomp == 3:
        tables += [(0x01, _JPEG_DC_CHR), (0x11, _JPEG_AC_CHR)]
    for tc, (bits, vals) in tables:
        body = bytes([tc]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + _struct.pack(">H", 2 + len(body)) + body
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + _struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _jpeg_build_codes(*_JPEG_DC_LUM)
    ac_l = _jpeg_build_codes(*_JPEG_AC_LUM)
    dc_c = _jpeg_build_codes(*_JPEG_DC_CHR)
    ac_c = _jpeg_build_codes(*_JPEG_AC_CHR)
    huff = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (ncomp - 1)
    w = _JpegBitWriter()
    preds = [0] * ncomp
    for by in range(height // 8):
        for bx in range(width // 8):
            for ci in range(ncomp):
                block = [
                    planes[ci][(by * 8 + yy) * width + bx * 8 + xx] - 128
                    for yy in range(8)
                    for xx in range(8)
                ]
                preds[ci] = _jpeg_encode_block(
                    w, _jpeg_fdct(block), preds[ci], *huff[ci]
                )
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _JpegBitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing and RSTn
    detection (``marker`` set when one is consumed)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                self.pos += 1
                if nxt != 0x00:
                    self.marker = nxt
                    raise EOFError(f"marker 0x{nxt:02x} inside entropy data")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        self._n = 0


def _jpeg_decode_huff(r: _JpegBitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | r.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("bad Huffman code")


def _jpeg_extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _decode_jpeg(payload: bytes) -> list[float]:
    """Full baseline-sequential decode → [width, height, sum_R, sum_G,
    sum_B] (grayscale: [width, height, sum_Y]).  Marker walk, DQT/DHT
    from the file, interleaved MCU entropy decode, dequantize + dezigzag
    + IDCT, DRI/RSTn honored, fixed-point YCbCr→RGB."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[tuple[int, int, int]] = []  # (id, sampling, tq)
    width = height = 0
    restart = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker stream")
        m = payload[pos + 1]
        pos += 2
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            continue
        (ln,) = _struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + ln]
        if m == 0xDB:  # DQT (possibly several tables)
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                o += 1
                if pq:
                    vals = list(_struct.unpack_from(">64H", body, o))
                    o += 128
                else:
                    vals = list(body[o : o + 64])
                    o += 64
                qtabs[tq] = vals
        elif m in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(
                f"unsupported JPEG profile: SOF marker 0x{m:02x} "
                "(only baseline sequential SOF0 is supported)"
            )
        elif m == 0xC0:  # SOF0
            prec, height, width, nc = _struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if samp != 0x11:
                    raise ValueError(
                        "unsupported JPEG profile: chroma subsampling "
                        f"(sampling factor 0x{samp:02x}; only 4:4:4 / "
                        "grayscale supported)"
                    )
                comps.append((cid, samp, tq))
        elif m == 0xC4:  # DHT (possibly several tables)
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                nv = sum(bits)
                vals = list(body[o + 17 : o + 17 + nv])
                table: dict[tuple[int, int], int] = {}
                code, k = 0, 0
                for ll in range(1, 17):
                    for _ in range(bits[ll - 1]):
                        table[(ll, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                htabs[(tc, th)] = table
                o += 17 + nv
        elif m == 0xDD:  # DRI
            (restart,) = _struct.unpack_from(">H", body, 0)
        elif m == 0xDA:  # SOS — entropy data follows
            nc = body[0]
            scan = []  # (comp index, dc table, ac table)
            for si in range(nc):
                cs, tda = body[1 + 2 * si], body[2 + 2 * si]
                idx = next(i for i, c in enumerate(comps) if c[0] == cs)
                scan.append((idx, htabs[(0, tda >> 4)], htabs[(1, tda & 0xF)]))
            r = _JpegBitReader(payload, pos + ln)
            mx, my = (width + 7) // 8, (height + 7) // 8
            planes = [[0] * (mx * my * 64) for _ in comps]
            preds = [0] * len(comps)
            mcu = 0
            for byk in range(my):
                for bxk in range(mx):
                    if restart and mcu and mcu % restart == 0:
                        r.align()
                        if r.data[r.pos] == 0xFF and 0xD0 <= r.data[r.pos + 1] <= 0xD7:
                            r.pos += 2
                        preds = [0] * len(comps)
                    mcu += 1
                    for idx, dct, act in scan:
                        q = qtabs[comps[idx][2]]
                        coef = [0] * 64
                        s = _jpeg_decode_huff(r, dct)
                        diff = _jpeg_extend(r.bits(s), s) if s else 0
                        preds[idx] += diff
                        coef[0] = preds[idx] * q[0]
                        k = 1
                        while k < 64:
                            sym = _jpeg_decode_huff(r, act)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            coef[_JPEG_ZIGZAG[k]] = (
                                _jpeg_extend(r.bits(size), size) * q[k]
                            )
                            k += 1
                        samples = _jpeg_idct(coef)
                        base = (byk * mx + bxk) * 64
                        planes[idx][base : base + 64] = samples
            sums = [0, 0, 0]
            for byk in range(my):
                for bxk in range(mx):
                    base = (byk * mx + bxk) * 64
                    for yy in range(8):
                        py = byk * 8 + yy
                        if py >= height:
                            break
                        for xx in range(8):
                            if bxk * 8 + xx >= width:
                                break
                            o = base + yy * 8 + xx
                            if len(comps) == 1:
                                sums[0] += planes[0][o]
                            else:
                                rr, gg, bb = _jpeg_ycc_to_rgb(
                                    planes[0][o], planes[1][o], planes[2][o]
                                )
                                sums[0] += rr
                                sums[1] += gg
                                sums[2] += bb
            head = [float(width), float(height)]
            if len(comps) == 1:
                return head + [float(sums[0])]
            return head + [float(s) for s in sums]
        pos += ln
    raise ValueError("JPEG missing SOS scan")


def _decode_real(payload: bytes, fmt: str) -> list[float]:
    """The real decoder hook: BMP, PCM-WAV, 8-bit-RGB PNG and baseline
    4:4:4/grayscale JPEG decode here with pure stdlib codecs; mp4 (and
    progressive/subsampled jpeg) require ffmpeg/PIL, absent in this
    container."""
    if fmt == "bmp":
        return _decode_bmp(payload)
    if fmt == "wav":
        return _decode_wav(payload)
    if fmt == "png":
        return _decode_png(payload)
    if fmt in ("jpg", "jpeg"):
        return _decode_jpeg(payload)
    raise NotImplementedError(
        f"real media decode ({fmt}) requires PIL/soundfile/pyav — not installed; "
        "bmp/wav/png/jpeg decode natively, or use impl='fake' for the "
        "byte-histogram stand-in"
    )


def synth_media_table_real(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One GENUINE media payload per document: even ids get a real 8×8
    24-bit BMP, odd ids a real 32-sample 16-bit PCM WAV — valid files any
    image viewer / audio player would open.  Pixel/sample bytes are
    md5-derived from the media_ref, so the payload is a pure JVM
    expression (``unhex(header_hex || md5-chain)``) AND a DuckDB oracle
    can recompute the decoded features from the same hex stream."""
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    ref = F.concat(F.lit("mr:"), F.col("doc_id"))
    is_img = F.col("doc_id") % 2 == 0

    def md5_chain(n: int):
        return F.concat(*[F.md5(F.concat(ref, F.lit(f":p{i}"))) for i in range(n)])

    bmp_hex = F.concat(F.lit(_BMP_HEADER.hex()), md5_chain(_BMP_PIXBYTES // 16))
    wav_hex = F.concat(F.lit(_WAV_HEADER.hex()), md5_chain(_WAV_DATABYTES // 16))
    payload = F.unhex(F.when(is_img, bmp_hex).otherwise(wav_hex))
    return base.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        ref.alias("media_ref"),
        F.when(is_img, F.lit("image")).otherwise(F.lit("audio")).alias("kind"),
        payload.alias("payload"),
        F.length(payload).cast("int").alias("n_bytes"),
        F.when(is_img, F.lit("bmp")).otherwise(F.lit("wav")).alias("format"),
    )


def synth_media_table_png(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One GENUINE PNG per document: 8×8 8-bit RGB, pixel bytes =
    the md5 chain of ``pr:<doc_id>:p{i}`` (192 bytes = 12 digests), rows
    filtered with types 0–4 cycling, zlib-deflated IDAT with correct
    CRCs — a valid file any viewer opens.  The zlib framing forces this
    synth to be an Arrow-batched mapInPandas stage (no JVM deflate
    expression exists), but the PIXELS stay oracle-replayable: a DuckDB
    query recomputes the channel sums from the same md5 hex chain
    without touching the binary (contract query ``media_features_png``).

    ``n_pixel_bytes`` (width*height*3) is carried instead of the
    compressed size: deflate output length is a zlib-build detail the
    oracle must not depend on."""
    import hashlib

    n_pix = PNG_W * PNG_H * 3

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            refs, payloads = [], []
            for doc_id in pdf[id_col].astype(str):
                ref = f"pr:{doc_id}"
                pix = b"".join(
                    hashlib.md5(f"{ref}:p{i}".encode()).digest()
                    for i in range(n_pix // 16)
                )
                refs.append(ref)
                payloads.append(_encode_png(pix, PNG_W, PNG_H))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype(str),
                    "media_ref": refs,
                    "kind": ["image"] * len(refs),
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                    "format": ["png"] * len(refs),
                }
            )

    return docs.select(F.col(id_col)).mapInPandas(run, schema=MEDIA_SCHEMA)


JPEG_W = JPEG_H = 16  # 2×2 blocks of 8×8, constant color per block


def synth_media_table_jpeg(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One GENUINE baseline JPEG per document: 16×16 8-bit YCbCr 4:4:4
    (SOF0, Annex-K Huffman tables, all-ones quant), where each of the
    four 8×8 blocks has a CONSTANT RGB color taken from the md5 digest
    of ``jr:<doc_id>:p0`` (bytes 3j..3j+2 for block j, row-major).
    Constant blocks make every AC coefficient analytically zero, so the
    lossy-in-general codec is EXACTLY lossless here up to the
    fixed-point RGB→YCbCr→RGB color round-trip — integer math a DuckDB
    oracle replays verbatim (contract query ``media_features_jpeg``):
    agreement proves the encoder, the entropy/huffman round-trip, the
    IDCT and the color conversion all at once.  The compressed size is
    a huffman-content detail, so ``n_pix_bytes`` (w*h*3) is carried for
    the compare, as with PNG."""
    import hashlib

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            refs, payloads = [], []
            for doc_id in pdf[id_col].astype(str):
                ref = f"jr:{doc_id}"
                d = hashlib.md5(f"{ref}:p0".encode()).digest()
                pix = bytearray(JPEG_W * JPEG_H * 3)
                for j in range(4):
                    by, bx = divmod(j, 2)
                    color = d[3 * j : 3 * j + 3]
                    for yy in range(8):
                        row = ((by * 8 + yy) * JPEG_W + bx * 8) * 3
                        pix[row : row + 24] = color * 8
                refs.append(ref)
                payloads.append(_encode_jpeg(bytes(pix), JPEG_W, JPEG_H))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype(str),
                    "media_ref": refs,
                    "kind": ["image"] * len(refs),
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                    "format": ["jpeg"] * len(refs),
                }
            )

    return docs.select(F.col(id_col)).mapInPandas(run, schema=MEDIA_SCHEMA)


def _decode_fake(payload: bytes, fmt: str) -> list[float]:
    """Deterministic 16-bin byte histogram, L1-normalized — stands in for
    the decoded feature vector with the same schema/batch shape."""
    hist = [0] * 16
    for b in payload:
        hist[b >> 4] += 1
    n = max(1, len(payload))
    return [h / n for h in hist]


def decode_media(media_df: DataFrame, impl: str = "fake") -> DataFrame:
    """binary payload → feature vector via Arrow-batched mapInPandas.

    Partition-preserving (no shuffle); decode cost is linear per byte and
    embarrassingly parallel.  ``impl='real'`` raises where the codec would
    run — the distributed plumbing is identical either way.
    """
    decode = _decode_real if impl == "real" else _decode_fake

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            feats = [
                decode(bytes(p), f) for p, f in zip(pdf["payload"], pdf["format"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return media_df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),   # resized bytes
        StructField("n_bytes", IntegerType()),
        StructField("scale_denom", IntegerType()),
    ]
)


def _resize_bmp(payload: bytes, scale_denom: int) -> bytes:
    """Real nearest-neighbor BMP downscale (1/scale_denom per axis):
    re-parse the headers, stride-sample pixels, re-emit a VALID BMP with
    correct row padding — what a thumbnailer does, minus interpolation."""
    (data_off,) = _struct.unpack_from("<I", payload, 10)
    w, h = _struct.unpack_from("<ii", payload, 18)
    (bpp,) = _struct.unpack_from("<H", payload, 28)
    if bpp != 24:
        raise ValueError("only 24-bit BMP resize supported")
    w2, h2 = max(1, w // scale_denom), max(1, abs(h) // scale_denom)
    in_stride = ((w * 3 + 3) // 4) * 4
    out_stride = ((w2 * 3 + 3) // 4) * 4
    out = bytearray()
    for r in range(h2):
        row = bytearray()
        src_row = payload[data_off + (r * scale_denom) * in_stride :]
        for c in range(w2):
            p = (c * scale_denom) * 3
            row += src_row[p : p + 3]
        row += b"\x00" * (out_stride - len(row))
        out += row
    header = (
        b"BM"
        + _struct.pack("<IHHI", 54 + len(out), 0, 0, 54)
        + _struct.pack("<IiiHHIIiiII", 40, w2, h2, 1, 24, 0, len(out), 2835, 2835, 0, 0)
    )
    return bytes(header) + bytes(out)


def _resize_wav(payload: bytes, scale_denom: int) -> bytes:
    """Real PCM decimation: every scale_denom-th sample, re-emitted as a
    VALID WAV via the stdlib wave writer (rate scaled to keep duration)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as r:
        ch, width, rate, n = (
            r.getnchannels(), r.getsampwidth(), r.getframerate(), r.getnframes(),
        )
        frames = r.readframes(n)
    frame_bytes = ch * width
    kept = b"".join(
        frames[i * frame_bytes : (i + 1) * frame_bytes]
        for i in range(0, n, scale_denom)
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(width)
        w.setframerate(max(1, rate // scale_denom))
        w.writeframes(kept)
    return buf.getvalue()


def _resize_png(payload: bytes, scale_denom: int) -> bytes:
    """Real nearest-neighbor PNG downscale: full decode (inflate +
    unfilter), stride-sample pixels, re-encode as a VALID PNG."""
    w, h, pix = _png_pixels(payload)
    w2, h2 = max(1, w // scale_denom), max(1, h // scale_denom)
    out = bytearray()
    for r in range(h2):
        src = (r * scale_denom) * w * 3
        for c in range(w2):
            p = src + (c * scale_denom) * 3
            out += pix[p : p + 3]
    return _encode_png(bytes(out), w2, h2)


def _resize_real(payload: bytes, fmt: str, scale_denom: int) -> bytes:
    """Real resize for the stdlib-decodable formats (bmp/wav/png);
    jpeg/mp4 require PIL/ffmpeg, absent in this container."""
    if fmt == "bmp":
        return _resize_bmp(payload, scale_denom)
    if fmt == "wav":
        return _resize_wav(payload, scale_denom)
    if fmt == "png":
        return _resize_png(payload, scale_denom)
    raise NotImplementedError(
        f"real media resize ({fmt}) requires PIL/ffmpeg — not installed; "
        "bmp/wav/png resize natively, or use impl='fake' for the byte-stride stand-in"
    )


def _resize_fake(payload: bytes, fmt: str, scale_denom: int) -> bytes:
    """Deterministic 1/scale_denom 'resize': stride sampling of the
    payload — preserves the schema/shape contract of a real thumbnailer."""
    return payload[::scale_denom]


def resize_media(media_df: DataFrame, scale_denom: int = 4, impl: str = "fake") -> DataFrame:
    """Downscale media payloads (thumbnail step of an ingest pipeline)
    via Arrow-batched mapInPandas; partition-preserving, no shuffle.
    ``impl='real'`` raises at the codec call site (PIL/ffmpeg absent in
    this container); the fake is a deterministic byte-stride."""
    resize = _resize_real if impl == "real" else _resize_fake

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            resized = [
                resize(bytes(p), f, scale_denom)
                for p, f in zip(pdf["payload"], pdf["format"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "payload": resized,
                    "n_bytes": [len(b) for b in resized],
                    "scale_denom": [scale_denom] * len(resized),
                }
            )

    return media_df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media_df: DataFrame, every_n_bytes: int = 8) -> DataFrame:
    """Frame-sampling shape for video-kind media: emits one row per
    sampled "frame" (here: deterministic byte slices; real impl seeks
    keyframes via pyav).  Demonstrates 1→N row fan-out inside
    mapInPandas without any shuffle."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, ref, payload in zip(pdf["doc_id"], pdf["media_ref"], pdf["payload"]):
                raw = bytes(payload)
                for i, start in enumerate(range(0, len(raw), every_n_bytes)):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "media_ref": ref,
                            "frame_no": i,
                            "frame_bytes": raw[start : start + every_n_bytes],
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "media_ref", "frame_no", "frame_bytes"])

    return media_df.mapInPandas(run, schema=FRAME_SCHEMA)
