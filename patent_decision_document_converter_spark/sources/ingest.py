"""Additional document sources: JSONL and raw-text-file ingestion.

The corpus table is parquet/Iceberg-shaped (sources.documents), but
upstream feeds arrive as JSONL dumps or as one-raw-text-file-per-document
drops — both mapped onto the same spans schema here so every downstream
operator is source-agnostic.

Scale notes: the JSONL reader passes an explicit schema (no sampling
pass over 100 TB to infer one); the raw-text reader uses Spark's
wholetext mode (one row per file; file listing parallelizes across the
driver's listing threads, reads across executors) and derives doc_id
from the file name — ingestion then normally repartitions by doc_id
hash into the bucketed parquet layout via ``documents.write_documents``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .documents import DOCUMENTS_SCHEMA


def read_documents_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL with the canonical shape: one object per line,
    ``{"doc_id": ..., "spans": [{kind,text,media_ref,offset}, ...]}``.
    Explicit schema — no inference scan."""
    return spark.read.schema(DOCUMENTS_SCHEMA).json(path)


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    df.select("doc_id", "spans").write.mode("overwrite").json(path)


def read_raw_text_dir(spark: SparkSession, path: str) -> DataFrame:
    """Directory of raw text files → documents rows: one doc per file,
    doc_id = file name without extension, the whole file as a single
    text span at offset 0."""
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("_file"), F.col("value").alias("_text")
    )
    doc_id = F.regexp_replace(
        F.element_at(F.split(F.col("_file"), "/"), -1), r"\.[^.]*$", ""
    )
    return raw.select(
        doc_id.alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("_text").alias("text"),
                F.lit("").alias("media_ref"),
                F.lit(0).alias("offset"),
            )
        ).alias("spans"),
    )


def stage_raw_text_dir(rows: list[dict], path: str) -> None:
    """Test helper: materialize docs as one .txt file each (text spans
    joined in offset order)."""
    os.makedirs(path, exist_ok=True)
    for r in rows:
        texts = [
            s["text"]
            for s in sorted(r["spans"], key=lambda s: s["offset"])
            if s["kind"] == "text"
        ]
        with open(os.path.join(path, f"{r['doc_id']}.txt"), "w", encoding="utf-8") as f:
            f.write("\n".join(texts))
