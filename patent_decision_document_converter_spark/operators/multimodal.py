"""Multimodal (image/audio/video) column plumbing.

The corpus schema interleaves text spans with media spans
(FIXTURES.md §1); at training-data scale the media payloads live as
opaque ``binary`` columns with typed metadata, and decode / feature
extraction runs as Arrow-batched Pandas functions via ``mapInPandas``.

The actual codec step is STUBBED in this container (no PIL/ffmpeg):
``decode_media(..., impl="real")`` raises NotImplementedError at the
exact call site where Pillow/ffmpeg would decode; the default
``impl="fake"`` produces a deterministic byte-histogram "feature vector"
so the Spark-side plumbing — schema, Arrow batch shape, partition
behavior — is fully real and tested.

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


def _decode_real(payload: bytes, fmt: str) -> list[float]:
    """The real decoder hook.  In production: PIL.Image.open /
    soundfile.read / pyav frame decode.  Not available in this container."""
    raise NotImplementedError(
        f"real media decode ({fmt}) requires PIL/soundfile/pyav — not installed; "
        "use impl='fake' for the deterministic byte-histogram stand-in"
    )


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


def _resize_real(payload: bytes, fmt: str, scale_denom: int) -> bytes:
    raise NotImplementedError(
        f"real media resize ({fmt}) requires PIL/ffmpeg — not installed; "
        "use impl='fake' for the deterministic byte-stride stand-in"
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
