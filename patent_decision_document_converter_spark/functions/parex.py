"""Paragraph / figure reference extraction (SURVEY.md §2.9).

Exact semantics of /root/reference/js/paragraphExtraction.js:13-148:
collect paragraph refs [xxxx]/【xxxx】 (incl. dash-class-normalized ranges) and
figure refs after 図, dedupe -> sort -> run-length compress -> format
``(段落[００２７]、[００６５]-[００６７]、図１、６-８)``.
"""

from __future__ import annotations

import re

_TO_ASCII = {c + 0xFEE0: c for c in range(0x30, 0x3A)}
_TO_FULL = {c: c + 0xFEE0 for c in range(0x30, 0x3A)}

_DASH_RE = re.compile("[‐-‒–—−－〜～]")


def _normalize_dash(s: str) -> str:
    return _DASH_RE.sub("-", s)


_LBR = "[\\[【]"
_RBR = "[\\]】]"
_RE_RANGE = re.compile(f"{_LBR}([0-9０-９]+){_RBR}\\s*-\\s*{_LBR}([0-9０-９]+){_RBR}")
_RE_SINGLE = re.compile(f"{_LBR}([0-9０-９]+){_RBR}")
_RE_FIG_BLOCK = re.compile("図\\s*([0-9０-９][0-9０-９\\s、,，\\-‐-‒–—−－〜～]*)")
_RE_FIG_TAIL_JUNK = re.compile("[^0-9０-９\\s、,，\\-]+$")
_RE_TOK_TAIL_JUNK = re.compile("[^0-9０-９\\-]+$")
_RE_TOK_RANGE = re.compile("^([0-9０-９]+)\\-([0-9０-９]+)$")


def _compress(nums: list[int], fmt_single, fmt_range) -> list[str]:
    """paragraphExtraction.js:30-50 — consecutive-run compression."""
    if not nums:
        return []
    nums = sorted(nums)
    out: list[str] = []
    s = prev = nums[0]
    for cur in nums[1:]:
        if cur == prev + 1:
            prev = cur
            continue
        out.append(fmt_single(s) if s == prev else fmt_range(s, prev))
        s = prev = cur
    out.append(fmt_single(s) if s == prev else fmt_range(s, prev))
    return out


_INT_PREFIX_RE = re.compile(r"^[+-]?[0-9]+")


def _parse_int_prefix(s: str) -> int | None:
    """JS ``parseInt(s, 10)``: parse the leading integer, NaN -> None."""
    m = _INT_PREFIX_RE.match(s.strip())
    return int(m.group(0)) if m else None


def _add_range(acc: set[int], a: int, b: int) -> None:
    if a > b:
        a, b = b, a
    acc.update(range(a, b + 1))


def extract_refs(s: str) -> tuple[list[int], int, list[int]]:
    """Return (sorted paragraph numbers, pad width, sorted figure numbers) —
    the aggregation state before formatting (used by the relational demo)."""
    s = str(s)
    paragraph_set: set[int] = set()
    width = 0

    dashed = _normalize_dash(s)
    for m in _RE_RANGE.finditer(dashed):
        a_raw, b_raw = m.group(1), m.group(2)
        width = max(width, len(a_raw), len(b_raw))
        _add_range(paragraph_set, int(a_raw.translate(_TO_ASCII)), int(b_raw.translate(_TO_ASCII)))
    for m in _RE_SINGLE.finditer(dashed):
        raw = m.group(1)
        width = max(width, len(raw))
        paragraph_set.add(int(raw.translate(_TO_ASCII)))

    fig_set: set[int] = set()
    for m in _RE_FIG_BLOCK.finditer(s):
        block = _normalize_dash(m.group(1))
        block = _RE_FIG_TAIL_JUNK.sub("", block)
        for tok0 in re.split("[、,，]", block):
            tok = tok0.strip()
            if not tok:
                continue
            tok = re.sub(r"\s+", "", _normalize_dash(tok))
            tok = _RE_TOK_TAIL_JUNK.sub("", tok)
            mr = _RE_TOK_RANGE.match(tok)
            if mr:
                _add_range(
                    fig_set,
                    int(mr.group(1).translate(_TO_ASCII)),
                    int(mr.group(2).translate(_TO_ASCII)),
                )
            else:
                n = _parse_int_prefix(tok.translate(_TO_ASCII))
                if n is not None:
                    fig_set.add(n)

    return sorted(paragraph_set), width, sorted(fig_set)


def extract_paragraph_and_figure_refs(s: str) -> str:
    """paragraphExtraction.js:13-148 — the full format pipeline."""
    paragraphs, width, figs = extract_refs(s)
    pad_width = max(4, width)

    def fmt_p(n: int) -> str:
        return "[" + str(n).rjust(pad_width, "0").translate(_TO_FULL) + "]"

    def fmt_pr(a: int, b: int) -> str:
        return fmt_p(a) + "-" + fmt_p(b)

    p_parts = _compress(paragraphs, fmt_p, fmt_pr)

    def fmt_f(n: int) -> str:
        return str(n).translate(_TO_FULL)

    def fmt_fr(a: int, b: int) -> str:
        return fmt_f(a) + "-" + fmt_f(b)

    f_parts = _compress(figs, fmt_f, fmt_fr)

    parts = []
    if p_parts:
        parts.append("段落" + "、".join(p_parts))
    if f_parts:
        parts.append("図" + "、".join(f_parts))
    return "(" + "、".join(parts) + ")"
