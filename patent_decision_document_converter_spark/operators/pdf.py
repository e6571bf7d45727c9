"""PDF/layout parse — the PDF leg of main-content extraction.

The north rule scopes main-content extraction as "HTML boilerplate
strip, PDF/layout parse, DOM heuristics"; `corpus.html_main_content`
covers the HTML/DOM legs, this module covers PDF.  Everything is pure
stdlib (``zlib`` + ``struct``-free byte parsing), same as the BMP/WAV/
PNG codecs in :mod:`.multimodal`:

* :func:`_encode_pdf` emits a GENUINE PDF (single- or multi-page) —
  catalog / pages / page / Type1-font object graph, one content stream
  of ``Tm``-positioned ``Tj`` text runs per page (FlateDecode-compressed
  or raw), a byte-exact xref table, trailer and ``startxref`` — a file
  any PDF viewer opens.
* :func:`_content_streams` + :func:`_extract_stream_runs` form a REAL
  structural parser, not a regex scrape of the whole file: it reads
  ``startxref``, walks the xref table to the trailer's ``/Root``,
  follows Catalog → Pages → every Kid in order → ``/Contents``,
  inflates each stream if ``/FlateDecode`` is set, and tokenizes the
  content stream (``BT/ET``, ``Tm``, ``Td/TD``, ``TL``, ``T*``,
  ``Tj``, ``'``, ``TJ``; literal strings with all spec escapes incl.
  octal and balanced parens, and hex strings).
* :func:`_runs_to_text` is the LAYOUT step: text runs carry (x, y)
  positions and may appear in the content stream in any order (the
  synthesizer deliberately scrambles them); reading order is
  reconstructed by sorting lines top-to-bottom (descending y — PDF's
  y-axis points up) and runs within a line left-to-right, joining
  same-line runs with single spaces.

Oracle replay: :func:`synth_pdf_table` derives every run's text from
an md5 chain of the media_ref (prefix ``p(<i>)`` — parens force the
string-escape path — plus the digest hex), so a DuckDB query
recomputes the expected extracted text, line counts and text md5
without touching the binary (contract query ``media_pdf_extract``).

Scale notes: synthesis and extraction are partition-preserving
Arrow-batched ``mapInPandas`` stages — no shuffle, no driver
collection; Arrow batch size is bounded via
``spark.sql.execution.arrow.maxRecordsPerBatch`` (plans.job).  At
10^12 docs the extractor is embarrassingly parallel and the only cost
is the scan.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .multimodal import MEDIA_SCHEMA

PDF_TEXT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("media_ref", StringType()),
        StructField("n_lines", IntegerType()),
        StructField("n_chars", IntegerType()),
        StructField("text", StringType()),
    ]
)

# --------------------------------------------------------------------------
# encoder
# --------------------------------------------------------------------------

_ESCAPES = {ord("("): b"\\(", ord(")"): b"\\)", ord("\\"): b"\\\\"}


def _pdf_string(s: str) -> bytes:
    """PDF literal string: latin-1 bytes with (, ), \\ escaped."""
    return b"(" + b"".join(_ESCAPES.get(b, bytes([b])) for b in s.encode("latin-1")) + b")"


def _encode_pdf(
    runs: list[tuple[float, float, str]],
    compress: bool,
    raw_content: bytes | None = None,
    pages: list[list[tuple[float, float, str]]] | None = None,
) -> bytes:
    """A valid PDF showing ``runs`` = [(x, y, text), ...] in Helvetica
    12pt, each run absolutely positioned with ``Tm`` (so the
    content-stream emission order carries NO layout information —
    reconstruction must use the coordinates).  xref offsets are exact;
    content streams are FlateDecode-compressed iff ``compress``.
    ``raw_content`` substitutes a hand-written content stream (tests use
    it to exercise Td/TD/T*/'/TJ/hex paths the synthesizer never emits).
    ``pages`` makes a MULTI-page document (one Kids entry + one content
    stream per page; ``runs``/``raw_content`` are the one-page forms)."""

    def page_content(page_runs: list[tuple[float, float, str]]) -> bytes:
        parts = [b"BT /F1 12 Tf"]
        for x, y, text in page_runs:
            parts.append(b"1 0 0 1 %g %g Tm %s Tj" % (x, y, _pdf_string(text)))
        parts.append(b"ET")
        return b"\n".join(parts)

    if pages is None:
        contents = [raw_content if raw_content is not None else page_content(runs)]
    else:
        contents = [page_content(p) for p in pages]
    filt = b""
    if compress:
        contents = [zlib.compress(c, 6) for c in contents]
        filt = b" /Filter /FlateDecode"

    n = len(contents)
    # objects: 1 catalog, 2 pages, 3 font, then per page i: page obj
    # (4+2i) + content stream (5+2i)
    kids = b" ".join(b"%d 0 R" % (4 + 2 * i) for i in range(n))
    bodies = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    for i, content in enumerate(contents):
        bodies.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>" % (5 + 2 * i)
        )
        bodies.append(
            b"<< /Length %d%s >>\nstream\n%s\nendstream" % (len(content), filt, content)
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(bodies, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n%s\nendobj\n" % (i, body)
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(bodies) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(bodies) + 1, xref_at)
    )
    return bytes(out)


# --------------------------------------------------------------------------
# structural parse
# --------------------------------------------------------------------------

_REF_RE = {
    key: re.compile(rb"/" + key.encode() + rb"\s+(\d+)\s+0\s+R")
    for key in ("Root", "Pages", "Contents")
}
_KIDS_RE = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+0\s+R)+)\s*\]")
_KID_REF_RE = re.compile(rb"(\d+)\s+0\s+R")


def _pdf_objects(payload: bytes) -> dict[int, bytes]:
    """startxref → xref table → {obj_num: body bytes}.  Offsets are
    trusted (and validated) — this is a structural parse of the file
    the way a viewer reads it, not a whole-file regex scrape."""
    if not payload.startswith(b"%PDF-"):
        raise ValueError("not a PDF payload")
    tail = payload[-256:]
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF", tail)
    if not m:
        raise ValueError("PDF missing startxref")
    xref_at = int(m.group(1))
    if payload[xref_at : xref_at + 4] != b"xref":
        raise ValueError("startxref does not point at an xref table")
    mh = re.match(rb"xref\s+(\d+)\s+(\d+)\s*\n", payload[xref_at:])
    if not mh:
        raise ValueError("malformed xref header")
    first, count = int(mh.group(1)), int(mh.group(2))
    pos = xref_at + mh.end()
    objs: dict[int, bytes] = {}
    for num in range(first, first + count):
        entry = payload[pos : pos + 20]
        pos += 20
        off, _gen, kind = int(entry[:10]), int(entry[11:16]), entry[17:18]
        if kind != b"n":
            continue
        mo = re.match(rb"(\d+)\s+0\s+obj\s*\n", payload[off:])
        if not mo or int(mo.group(1)) != num:
            raise ValueError(f"xref offset for object {num} is wrong")
        end = payload.index(b"endobj", off)
        objs[num] = payload[off + mo.end() : end]
    return objs


def _content_streams(payload: bytes) -> list[bytes]:
    """Catalog → Pages → every Kid in order → /Contents stream,
    inflated if /FlateDecode — one entry per page."""
    objs = _pdf_objects(payload)
    trailer_at = payload.rindex(b"trailer")
    root = int(_REF_RE["Root"].search(payload, trailer_at).group(1))
    pages = int(_REF_RE["Pages"].search(objs[root]).group(1))
    kids_m = _KIDS_RE.search(objs[pages])
    if not kids_m:
        raise ValueError("/Pages object has no /Kids array")
    streams = []
    for kid_m in _KID_REF_RE.finditer(kids_m.group(1)):
        page = int(kid_m.group(1))
        contents = int(_REF_RE["Contents"].search(objs[page]).group(1))
        body = objs[contents]
        ms = re.search(rb"stream\r?\n", body)
        if not ms:
            raise ValueError("/Contents object has no stream")
        data = body[ms.end() : body.rindex(b"endstream")]
        if data.endswith(b"\n"):
            data = data[:-1]
        if b"/FlateDecode" in body[: ms.start()]:
            data = zlib.decompress(data)
        streams.append(data)
    return streams


# --------------------------------------------------------------------------
# content-stream tokenizer
# --------------------------------------------------------------------------

_NUM_RE = re.compile(rb"[+-]?\d*\.?\d+")
_OCT_RE = re.compile(rb"[0-7]{1,3}")


def _parse_literal(data: bytes, pos: int) -> tuple[str, int]:
    """Parse a ``(...)`` literal string starting at ``pos`` (at the
    open paren).  Handles \\( \\) \\\\ \\n \\r \\t \\b \\f, octal
    escapes, escaped newlines (line continuation) and UNescaped
    balanced parens, per PDF 32000-1 §7.3.4.2."""
    assert data[pos : pos + 1] == b"("
    out = bytearray()
    depth = 1
    i = pos + 1
    simple = {ord("n"): 10, ord("r"): 13, ord("t"): 9, ord("b"): 8, ord("f"): 12}
    while i < len(data):
        b = data[i]
        if b == 0x5C:  # backslash
            nxt = data[i + 1]
            if nxt in simple:
                out.append(simple[nxt])
                i += 2
            elif nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and data[i : i + 1] == b"\n":
                    i += 1
            elif 0x30 <= nxt <= 0x37:
                mo = _OCT_RE.match(data, i + 1)
                out.append(int(mo.group(0), 8) & 0xFF)
                i = mo.end()
            else:  # \( \) \\ and "ignore the backslash" for the rest
                out.append(nxt)
                i += 2
        elif b == 0x28:  # ( — balanced nesting
            depth += 1
            out.append(b)
            i += 1
        elif b == 0x29:  # )
            depth -= 1
            if depth == 0:
                return out.decode("latin-1"), i + 1
            out.append(b)
            i += 1
        else:
            out.append(b)
            i += 1
    raise ValueError("unterminated PDF literal string")


def _parse_hex(data: bytes, pos: int) -> tuple[str, int]:
    end = data.index(b">", pos)
    hx = re.sub(rb"\s", b"", data[pos + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")).decode("latin-1"), end + 1


def _extract_stream_runs(data: bytes) -> list[tuple[float, float, str]]:
    """Tokenize one page's content stream into positioned text runs
    [(x, y, text), ...] in EMISSION order (no layout applied yet).
    Supported operators: BT/ET, Tf, TL, Tm (text matrix — e/f taken as
    position), Td, TD (Td + sets leading), T* (next line via leading),
    Tj, ' (T* + show), TJ (array show — strings concatenated, kerning
    numbers ignored for text purposes)."""
    runs: list[tuple[float, float, str]] = []
    stack: list[object] = []  # operand stack: floats and strings
    x = y = 0.0
    line_x = line_y = 0.0  # start-of-line (Td/T* move relative to it)
    leading = 0.0
    in_array: list[str] | None = None
    i = 0
    n = len(data)
    while i < n:
        b = data[i : i + 1]
        if b.isspace():
            i += 1
        elif b == b"(":
            s, i = _parse_literal(data, i)
            if in_array is not None:
                in_array.append(s)
            else:
                stack.append(s)
        elif b == b"<":
            s, i = _parse_hex(data, i)
            if in_array is not None:
                in_array.append(s)
            else:
                stack.append(s)
        elif b == b"[":
            in_array = []
            i += 1
        elif b == b"]":
            stack.append("".join(in_array or []))
            in_array = None
            i += 1
        elif b == b"/":
            mo = re.match(rb"/[^\s\[\]()<>/]*", data[i:])
            i += mo.end()  # names (font resources) are not text operands
        elif _NUM_RE.match(data, i):
            mo = _NUM_RE.match(data, i)
            if in_array is None:
                stack.append(float(mo.group(0)))
            i = mo.end()
        else:
            mo = re.match(rb"[A-Za-z'*\"]+", data[i:])
            if not mo:
                raise ValueError(f"bad content-stream byte at {i}: {b!r}")
            op = mo.group(0)
            i += mo.end()
            if op == b"Tm":
                # a b c d e f Tm — translation components only
                x = line_x = float(stack[-2])
                y = line_y = float(stack[-1])
            elif op in (b"Td", b"TD"):
                if op == b"TD":
                    leading = -float(stack[-1])
                line_x += float(stack[-2])
                line_y += float(stack[-1])
                x, y = line_x, line_y
            elif op == b"T*":
                line_y -= leading
                x, y = line_x, line_y
            elif op == b"TL":
                leading = float(stack[-1])
            elif op == b"Tj":
                runs.append((x, y, str(stack[-1])))
            elif op == b"'":
                line_y -= leading
                x, y = line_x, line_y
                runs.append((x, y, str(stack[-1])))
            elif op == b"TJ":
                runs.append((x, y, str(stack[-1])))
            elif op in (b"BT", b"ET"):
                x = y = line_x = line_y = 0.0
            # Tf and anything else: operands already consumed positionally
            stack = []
    return runs


def _runs_to_text(runs: list[tuple[float, float, str]]) -> str:
    """Layout reconstruction: lines top-to-bottom (desc y — PDF y goes
    up), runs within a line left-to-right joined by single spaces,
    lines joined by newlines.  y is bucketed to 0.01pt so float noise
    cannot split a line."""
    by_line: dict[int, list[tuple[float, str]]] = {}
    for x, y, text in runs:
        by_line.setdefault(round(y * 100), []).append((x, text))
    lines = []
    for key in sorted(by_line, reverse=True):
        lines.append(" ".join(t for _x, t in sorted(by_line[key])))
    return "\n".join(lines)


def extract_pdf_text(payload: bytes) -> str:
    """payload → reading-order text: per page, lines top-to-bottom and
    runs left-to-right; pages concatenated in Kids order, separated by
    a newline (the single-file composition)."""
    return "\n".join(
        _runs_to_text(_extract_stream_runs(s)) for s in _content_streams(payload)
    )


# --------------------------------------------------------------------------
# Spark operators
# --------------------------------------------------------------------------

PDF_MAX_LINES = 6  # synth emits 3 + doc_id % 3 lines; oracle iterates range(6)


def _synth_runs(media_ref: str, doc_id: int) -> list[list[tuple[float, float, str]]]:
    """The per-doc text runs as one list PER PAGE, SCRAMBLED within each
    page: all body runs first in reverse line order, then the prefix
    runs forward — emission order shares nothing with reading order, so
    extraction equality proves the layout sort really ran.  Every fourth
    doc gets a SECOND page (multi-Kids path).  Texts are
    oracle-replayable: prefix ``p(<i>)`` (parens exercise string
    escaping), body ``md5('<media_ref>:l<i>')`` hex on page 0 and
    ``md5('<media_ref>:p1l<i>')`` on page 1."""
    import hashlib

    n_lines = 3 + doc_id % 3
    n_pages = 2 if doc_id % 4 == 0 else 1
    pages = []
    for pg in range(n_pages):
        tag = "l" if pg == 0 else f"p{pg}l"
        prefixes, bodies = [], []
        for ln in range(n_lines):
            yy = 720.0 - 14.0 * ln
            prefixes.append((72.0, yy, f"p({ln})"))
            bodies.append(
                (130.0, yy, hashlib.md5(f"{media_ref}:{tag}{ln}".encode()).hexdigest())
            )
        pages.append(bodies[::-1] + prefixes)
    return pages


def synth_pdf_table(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """One GENUINE PDF per document (media_ref ``pdf:<doc_id>``, kind
    ``document``); even doc_ids get FlateDecode-compressed content
    streams, odd ids raw, and every fourth doc is TWO pages — all
    parser paths are exercised on every corpus."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf_batch in batches:
            ids = pdf_batch[id_col].astype(str)
            refs, payloads = [], []
            for doc_id in ids:
                ref = f"pdf:{doc_id}"
                payload = _encode_pdf(
                    [], compress=int(doc_id) % 2 == 0, pages=_synth_runs(ref, int(doc_id))
                )
                refs.append(ref)
                payloads.append(payload)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "media_ref": refs,
                    "kind": ["document"] * len(refs),
                    "payload": payloads,
                    "n_bytes": [len(p) for p in payloads],
                    "format": ["pdf"] * len(refs),
                }
            )

    return docs.select(F.col(id_col)).mapInPandas(run, schema=MEDIA_SCHEMA)


PDF_TEXT_PERMISSIVE_SCHEMA = StructType(
    list(PDF_TEXT_SCHEMA.fields) + [StructField("error", StringType())]
)


def pdf_extract_text_df(media_df: DataFrame, permissive: bool = False) -> DataFrame:
    """binary PDF payload → reading-order text via Arrow-batched
    mapInPandas (partition-preserving, zero shuffle).  Output:
    (doc_id, media_ref, n_lines, n_chars, text).

    ``permissive=True`` adds an ``error`` column and keeps the job alive
    on malformed payloads (text NULL, the parser's message captured) —
    at 10^12 scraped docs a single corrupt file must not kill the stage;
    the default strict mode fails fast, which is what the oracle-gated
    synthetic corpus wants."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf_batch in batches:
            texts, errors = [], []
            for p in pdf_batch["payload"]:
                if permissive:
                    try:
                        texts.append(extract_pdf_text(bytes(p)))
                        errors.append(None)
                    except Exception as exc:  # malformed payload — keep going
                        texts.append(None)
                        errors.append(f"{type(exc).__name__}: {exc}")
                else:
                    texts.append(extract_pdf_text(bytes(p)))
            out = {
                "doc_id": pdf_batch["doc_id"],
                "media_ref": pdf_batch["media_ref"],
                "n_lines": [
                    (t.count("\n") + 1 if t else 0) if t is not None else None
                    for t in texts
                ],
                "n_chars": [len(t) if t is not None else None for t in texts],
                "text": texts,
            }
            if permissive:
                out["error"] = errors
            yield pd.DataFrame(out)

    return media_df.select("doc_id", "media_ref", "payload").mapInPandas(
        run, schema=PDF_TEXT_PERMISSIVE_SCHEMA if permissive else PDF_TEXT_SCHEMA
    )


def enrich_media_spans(
    docs: DataFrame,
    media_text: DataFrame,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Inject extracted media text into interleaved span sequences.

    ``docs`` carries the input-hint shape (doc_id, spans:array<struct<
    kind,text,media_ref,offset>>); ``media_text`` is (doc_id, media_ref,
    text) — e.g. :func:`pdf_extract_text_df` output, one row per
    (doc_id, media_ref) (duplicate keys would fail the map build, by
    design — extraction emits one row per media item).  For every
    ``kind='media'`` span whose (doc_id, media_ref) has extracted text,
    a ``kind='media_text'`` span with that text is inserted IMMEDIATELY
    after the media span; offsets are densely renumbered so the output
    again satisfies the (kind, text, media_ref, order) span-sequence
    invariant.  Media spans without extracted text (or non-PDF refs)
    pass through untouched, as do all text spans — and documents with an
    EMPTY spans array pass through unchanged (no explode to drop them).

    Plan shape (doc-level, no explode): aggregate ``media_text`` into a
    per-doc map(media_ref → text) — one shuffle over the SMALL extracted
    frame — then a single doc-level join on ``doc_id`` and a pure-JVM
    array rewrite per row (``array_sort`` by offset → ``transform`` +
    ``flatten`` 1-or-2 fan-out → dense re-offset).  The span arrays
    themselves never pass through a shuffle as exploded rows: vs the
    explode → join → posexplode → groupBy/collect_list reassembly shape
    this halves shuffled bytes (the dominant term is the document text)
    and removes the widest regroup stage — at 10^12 docs the regroup's
    collect_list of every span was the scaling bottleneck.  Media text
    is doc-aligned (same cardinality as the docs), so the join is NOT
    broadcast; both sides co-partition on doc_id.
    """
    mt = media_text.groupBy(F.col("doc_id").alias("_mid")).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("media_ref"), F.col("text")))
        ).alias("_mmap")
    )
    id_t = dict(docs.select(F.col(id_col)).dtypes)[id_col]
    joined = docs.join(
        mt.select(F.col("_mid").cast(id_t).alias("_mid"), "_mmap"),
        F.col(id_col) == F.col("_mid"),
        "left",
    ).drop("_mid")

    span_t = "struct<kind:string,text:string,media_ref:string>"
    # input arrays may arrive in any order — the offset column IS the
    # order key (input-hint invariant); sort by it before splicing
    ordered = F.array_sort(
        F.transform(
            F.col(spans_col),
            lambda s: F.struct(
                s["offset"].alias("offset"),
                F.struct(s["kind"], s["text"], s["media_ref"]).cast(span_t).alias("s"),
            ),
        )
    )
    # try_element_at, not element_at: under ANSI mode (Spark 4 default)
    # element_at on a map THROWS for an absent key; try_ yields NULL,
    # which is the pass-through signal here
    mtext = lambda e: F.when(  # noqa: E731
        e["s"]["kind"] == "media", F.try_element_at(F.col("_mmap"), e["s"]["media_ref"])
    )
    flat = F.flatten(
        F.transform(
            ordered,
            lambda e: F.when(
                mtext(e).isNotNull(),
                F.array(
                    e["s"],
                    F.struct(
                        F.lit("media_text").alias("kind"),
                        mtext(e).alias("text"),
                        e["s"]["media_ref"].alias("media_ref"),
                    ).cast(span_t),
                ),
            ).otherwise(F.array(e["s"])),
        )
    )
    keep = [c for c in docs.columns if c != spans_col]
    return joined.select(
        *keep,
        F.transform(
            flat,
            lambda s, i: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                i.cast("int").alias("offset"),
            ),
        ).alias(spans_col),
    )
