"""Span classifier / paragraph builder (SURVEY.md §2.10).

Exact semantics of to_HTML (/root/reference/js/makeHtml.js:4-257): a per-line
classifier + accumulator that emits heading (h1/h2) and paragraph nodes in
document order.

Two outputs from the same scan:
- ``classify_spans(text)`` -> list of typed span dicts
  {kind: heading1|heading2|para|para_plain, text, no, style} — the span-typed
  representation used by the Spark span-emission job;
- ``to_html(text)`` -> the byte-exact HTML string of the reference.
"""

from __future__ import annotations

import re

_Z2H = {c + 0xFEE0: c for c in range(0x30, 0x3A)}


def _esc(s: str) -> str:
    """makeHtml.js:16-23."""
    return (
        str(s)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&#39;")
    )


# JS String.prototype.trim set (normalizeLine uses .trim())
from .jsstr import js_trim  # noqa: E402

_KNOWN_EN_HEADINGS = [
    "description",
    "abstract",
    "claims",
    "summary",
    "field of the disclosure",
    "background",
    "brief description of the drawings",
    "detailed description",
]

_ALLCAPS_RE = re.compile(r"^[A-Z][A-Z0-9 \-–—/(),.&:;']+$")
_PARA_SQ_EXCL_RE = re.compile(r"^\[[0-9０-９]{4,}\]")
_PARA_JP_EXCL_RE = re.compile(r"^【[0-9０-９]{4,}】")
_JP_HEADING_RE = re.compile(r"^【\s*([^】]+?)\s*】$")
_MARKER_SQ_RE = re.compile(r"^\[\s*([0-9０-９]{4,})\s*\]\s*(.*)$")
_MARKER_JP_RE = re.compile(r"^【\s*([0-9０-９]{4,})\s*】\s*(.*)$")
_ASCII_WORD_RE = re.compile(r"[A-Za-z0-9]")
_WS_RE = re.compile(r"\s+")


def _is_english_all_caps_heading(line: str) -> bool:
    """makeHtml.js:55-63."""
    if not line or len(line) > 140:
        return False
    if _PARA_SQ_EXCL_RE.match(line) or _PARA_JP_EXCL_RE.match(line):
        return False
    return _ALLCAPS_RE.match(line) is not None


def _is_english_title_heading(line: str) -> bool:
    """makeHtml.js:65-88."""
    if not line or len(line) > 100:
        return False
    if _PARA_SQ_EXCL_RE.match(line) or _PARA_JP_EXCL_RE.match(line):
        return False
    return line.lower() in _KNOWN_EN_HEADINGS


def _parse_japanese_bracket_heading(line: str):
    """makeHtml.js:90-103 — 【…】 line, excluding pure paragraph numbers."""
    m = _JP_HEADING_RE.match(line)
    if not m:
        return None
    inside_raw = m.group(1)
    no_space = _WS_RE.sub("", inside_raw.translate(_Z2H))
    if re.match(r"^\d+$", no_space):
        return None
    return js_trim(inside_raw)


def _heading_tag_en(line: str) -> str:
    return "h1" if line.lower() == "description" else "h2"


def _heading_tag_jp(title: str) -> str:
    t = _WS_RE.sub("", title)
    return "h1" if t in ("発明の詳細な説明", "発明の概要") else "h2"


def _parse_paragraph_marker(line: str):
    """makeHtml.js:121-143."""
    m = _MARKER_SQ_RE.match(line)
    if m:
        return {"no": m.group(1).translate(_Z2H), "rest": m.group(2) or "", "style": "square"}
    m = _MARKER_JP_RE.match(line)
    if m:
        return {"no": m.group(1).translate(_Z2H), "rest": m.group(2) or "", "style": "jp-bracket"}
    return None


def _join_wrapped(a: str, b: str) -> str:
    """makeHtml.js:40-50 — space only between ASCII word chars."""
    if not a:
        return b
    if not b:
        return a
    need_space = bool(_ASCII_WORD_RE.match(a[-1])) and bool(_ASCII_WORD_RE.match(b[0]))
    return a + (" " if need_space else "") + b


def classify_spans(text: str) -> list[dict]:
    """The main parse loop of makeHtml.js:187-254, emitting typed span dicts
    instead of HTML strings.  Kinds: heading1, heading2, para (numbered),
    para_plain."""
    if text is None:
        return []
    src = re.sub(r"\r\n?", "\n", str(text))
    src = re.sub("^\ufeff", "", src)
    lines = src.split("\n")

    out: list[dict] = []
    current = None  # {no, style, text}
    pending = None  # {no, style}

    def flush():
        nonlocal current
        if current is None:
            return
        if current["no"]:
            out.append(
                {"kind": "para", "no": current["no"], "style": current["style"], "text": current["text"] or ""}
            )
        else:
            out.append({"kind": "para_plain", "no": None, "style": "plain", "text": current["text"] or ""})
        current = None

    for raw in lines:
        line = js_trim(raw.replace("\u3000", " "))

        if not line:
            flush()
            pending = None
            continue

        jp_head = _parse_japanese_bracket_heading(line)
        if jp_head is not None:
            flush()
            pending = None
            tag = _heading_tag_jp(jp_head)
            out.append({"kind": "heading1" if tag == "h1" else "heading2", "no": None, "style": "jp", "text": jp_head})
            continue

        if _is_english_title_heading(line) or _is_english_all_caps_heading(line):
            flush()
            pending = None
            tag = _heading_tag_en(line)
            out.append({"kind": "heading1" if tag == "h1" else "heading2", "no": None, "style": "en", "text": line})
            continue

        marker = _parse_paragraph_marker(line)
        if marker:
            flush()
            if marker["rest"]:
                current = {"no": marker["no"], "style": marker["style"], "text": marker["rest"]}
            else:
                pending = {"no": marker["no"], "style": marker["style"]}
            continue

        if current is None:
            if pending:
                current = {"no": pending["no"], "style": pending["style"], "text": line}
                pending = None
            else:
                current = {"no": None, "style": "plain", "text": line}
        else:
            current["text"] = _join_wrapped(current["text"], line)

    flush()
    return out


def to_html(text: str) -> str:
    """Byte-exact to_HTML (makeHtml.js:4-257), formatted from the span list."""
    if text is None:
        return '<div class="patent-text"></div>'
    nodes = classify_spans(text)
    out = []
    for nd in nodes:
        if nd["kind"] in ("heading1", "heading2"):
            tag = "h1" if nd["kind"] == "heading1" else "h2"
            out.append(f"<{tag} class=\"patent-heading\">{_esc(nd['text'])}</{tag}>")
        elif nd["kind"] == "para":
            label = ("【" + nd["no"] + "】") if nd["style"] == "jp-bracket" else ("[" + nd["no"] + "]")
            out.append(
                '<p class="patent-paragraph" data-para="' + _esc(nd["no"]) + '">'
                + '<span class="para-no">' + _esc(label) + "</span> "
                + '<span class="para-text">' + _esc(nd["text"]) + "</span>"
                + "</p>"
            )
        else:
            out.append('<p class="patent-paragraph no-num">' + _esc(nd["text"]) + "</p>")
    return '<div class="patent-text">\n' + "\n".join(out) + "\n</div>"
