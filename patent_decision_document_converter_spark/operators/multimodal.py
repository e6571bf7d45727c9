"""Multimodal (image/audio/video) column plumbing.

The corpus schema interleaves text spans with media spans
(FIXTURES.md §1); at training-data scale the media payloads live as
opaque ``binary`` columns with typed metadata, and decode / feature
extraction runs as Arrow-batched Pandas functions via ``mapInPandas``.

``decode_media(..., impl="real")`` REALLY decodes the three formats a
stdlib-pure container can: uncompressed 24-bit BMP (struct-parsed
headers + pixel channel sums), 16-bit PCM WAV (the stdlib ``wave``
codec), and 8-bit RGB PNG (full stdlib decoder: chunk walk, zlib
IDAT inflate, all five scanline filters incl. Paeth) —
:func:`synth_media_table_real` / :func:`synth_media_table_png` build
genuine files of each.  Formats needing non-stdlib codecs (jpeg/mp4)
raise NotImplementedError at the codec call site; the default
``impl="fake"`` byte-histogram twin keeps the Spark-side plumbing —
schema, Arrow batch shape, partition behavior — testable for any format.

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


def _decode_real(payload: bytes, fmt: str) -> list[float]:
    """The real decoder hook: BMP, PCM-WAV and 8-bit-RGB PNG decode here
    with pure stdlib codecs; jpeg/mp4 require PIL/pyav, absent in this
    container."""
    if fmt == "bmp":
        return _decode_bmp(payload)
    if fmt == "wav":
        return _decode_wav(payload)
    if fmt == "png":
        return _decode_png(payload)
    raise NotImplementedError(
        f"real media decode ({fmt}) requires PIL/soundfile/pyav — not installed; "
        "bmp/wav/png decode natively, or use impl='fake' for the byte-histogram stand-in"
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
