"""Unified main-content extraction — the north rule's three legs
("HTML boilerplate strip, PDF/layout parse, DOM heuristics") behind one
format-routed operator.

:func:`extract_main_content` takes a media table (doc_id, media_ref,
format, payload:binary) and routes each row to the right extractor:

* ``html`` → UTF-8 decode + :func:`..operators.corpus.html_main_content`
  (block split, per-block link-density + length gate — the DOM-heuristic
  / boilerplate leg; pure JVM array expressions, zero shuffle),
* ``pdf``  → :func:`..operators.pdf.pdf_extract_text_df` (structural
  parse + layout-order reconstruction; Arrow-batched ``mapInPandas``),
* ``xml``  → UTF-8 decode + :func:`..operators.corpus.xml_strip`
  (CDATA unwrap, comment drop, tag strip, entity decode — the
  JPO/WIPO patent-body format; pure JVM expressions, zero shuffle),
* ``txt``  → UTF-8 decode, whitespace-normalized passthrough.

Unknown formats yield NULL ``main_text`` with the format echoed so a
10^12-doc crawl with a long tail of exotic types degrades loudly but
non-fatally (same philosophy as ``pdf_extract_text_df(permissive=)``).

Plan shape: one filter per leg over the same scan (Catalyst merges the
scans under one InMemoryFileIndex; every leg is shuffle-free — the HTML
leg's block pipeline is pure array expressions since the r4 rewrite),
``unionByName`` at the end — no join, no driver collection.  At scale the union is a no-op barrier: each leg
stays embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpus import html_main_content, xml_strip
from .pdf import pdf_extract_text_df

_OUT_COLS = ("doc_id", "media_ref", "format", "main_text", "error")


def extract_main_content(
    media_df: DataFrame,
    min_block_chars: int = 40,
    max_link_density_permille: int = 500,
    permissive_pdf: bool = False,
    dom_hints: bool = False,
) -> DataFrame:
    """Route (doc_id, media_ref, format, payload) rows to the
    format-appropriate main-content extractor; returns one row per input
    row with ``main_text`` (NULL for unknown formats or, when
    ``permissive_pdf``, unparseable PDFs) and ``error`` (NULL except for
    rows a permissive PDF parse rejected — the parser's message, so a
    10^12-doc run can aggregate failure modes without re-reading
    payloads; ``'unsupported format'`` for unknown-format rows)."""
    base = media_df.select("doc_id", "media_ref", "format", "payload")

    html = base.filter(F.col("format") == "html").select(
        "doc_id", "media_ref", "format", F.decode("payload", "UTF-8").alias("html")
    )
    # carry_cols keeps media_ref/format in the output selection;
    # keep_empty preserves all-boilerplate docs as NULL rows
    html_full = html_main_content(
        html,
        html_col="html",
        id_col="doc_id",
        min_block_chars=min_block_chars,
        max_link_density_permille=max_link_density_permille,
        carry_cols=("media_ref", "format"),
        keep_empty=True,
        dom_hints=dom_hints,
    ).select(
        "doc_id", "media_ref", "format", "main_text",
        F.lit(None).cast("string").alias("error"),
    )

    pdf = base.filter(F.col("format") == "pdf")
    pdf_parsed = pdf_extract_text_df(pdf, permissive=permissive_pdf)
    pdf_out = pdf_parsed.select(
        "doc_id",
        "media_ref",
        F.lit("pdf").alias("format"),
        F.col("text").alias("main_text"),
        (F.col("error") if permissive_pdf else F.lit(None).cast("string")).alias("error"),
    )

    xml = base.filter(F.col("format") == "xml").select(
        "doc_id",
        "media_ref",
        "format",
        xml_strip(F.decode("payload", "UTF-8")).alias("main_text"),
        F.lit(None).cast("string").alias("error"),
    )

    txt = base.filter(F.col("format") == "txt").select(
        "doc_id",
        "media_ref",
        "format",
        F.trim(F.regexp_replace(F.decode("payload", "UTF-8"), r"[ \t\n\x0b\f\r]+", " ")).alias(
            "main_text"
        ),
        F.lit(None).cast("string").alias("error"),
    )

    # NULL formats must land here too: NULL fails every leg's equality
    # filter AND the negated isin (NULL -> false), which would silently
    # drop the row — violating the one-row-in/one-row-out contract
    other = base.filter(
        F.col("format").isNull() | ~F.col("format").isin("html", "pdf", "xml", "txt")
    ).select(
        "doc_id",
        "media_ref",
        "format",
        F.lit(None).cast("string").alias("main_text"),
        F.lit("unsupported format").alias("error"),
    )

    return (
        html_full.select(*_OUT_COLS)
        .unionByName(pdf_out.select(*_OUT_COLS))
        .unionByName(xml.select(*_OUT_COLS))
        .unionByName(txt.select(*_OUT_COLS))
        .unionByName(other.select(*_OUT_COLS))
    )
