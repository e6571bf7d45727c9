"""Marker-range blank-line strippers (SURVEY.md §2.4).

Exact semantics of /root/reference/js/stripBlankLines.js:68-271 and the
『…』 claims variant (textUtilsMain.js:867-905).

Each stripper finds every (start, end) marker pair (cartesian product over the
marker arrays, lazy match) and removes blank lines inside; the _L/_LR/_R/_Keep
variants differ only in whether a newline is re-inserted after start / before
end.
"""

from __future__ import annotations

import re

from ..functions.headings import is_blank_line_strip
from ..functions.jsstr import (
    join_lines,
    js_trim,
    lazy_block_sub,
    split_lines_blank,
)


def _strip_between(s: str, start_markers, end_markers, left_nl: bool, right_nl: bool) -> str:
    """stripBlankLines.js:68-150 generic body.

    The reference compiles ``(START)([\\s\\S]*?)(END)`` per pair; markers
    are regex-escaped literals, so the linear two-pointer
    ``lazy_block_sub`` gives identical output in O(n) (the lazy regex is
    O(n·starts) on megadocs when the end marker is absent)."""
    if not s:
        return ""
    starts = start_markers if isinstance(start_markers, list) else [start_markers]
    ends = end_markers if isinstance(end_markers, list) else [end_markers]

    result = str(s)
    for start in starts:
        for end in ends:

            def repl(start_str: str, inner: str, end_str: str) -> str:
                inner_lines = split_lines_blank(inner)
                out = [ln for ln in inner_lines if not is_blank_line_strip(ln)]
                mid = join_lines(out)
                return (
                    start_str
                    + ("\n" if left_nl else "")
                    + mid
                    + ("\n" if right_nl else "")
                    + end_str
                )

            result = lazy_block_sub(result, start, end, repl)
    return result


def strip_between_l(s, start, end):
    """stripBlankLines.js:68-87."""
    return _strip_between(s, start, end, True, False)


def strip_between_lr(s, start, end):
    """stripBlankLines.js:89-108."""
    return _strip_between(s, start, end, True, True)


def strip_between_r(s, start, end):
    """stripBlankLines.js:110-129."""
    return _strip_between(s, start, end, False, True)


def strip_between_keep(s, start, end):
    """stripBlankLines.js:131-150."""
    return _strip_between(s, start, end, False, False)


# ---- the 6 named boilerplate strippers (stripBlankLines.js:161-271) ----

def strip_blank_lines_in_correction_note(s: str) -> str:
    """stripBlankLines.js:161-170 — <補正をする際の注意> … PA5J note."""
    return strip_between_l(
        s,
        "<補正をする際の注意>",
        "(上記「●●●●」に置き換えて、「PA5J」と入力ください。)",
    )


def strip_blank_lines_in_search_result(s: str) -> str:
    """stripBlankLines.js:180-189."""
    return strip_between_lr(
        s,
        "<先行技術文献調査結果の記録>",
        "　この先行技術文献調査結果の記録は、拒絶理由を構成するものではありません。",
    )


_KOTO_GA_RE = re.compile("こと[\\s　]*が記載されている。")


def strip_blank_lines_in_citation(s: str) -> str:
    """stripBlankLines.js:202-214 — citation blocks + こと…が fixup."""
    if not s:
        return ""
    out = strip_between_r(
        s,
        ["引用文献１(特に", "引用文献２(特に"],
        ["　ことが記載されている。", "　が記載されている。"],
    )
    return _KOTO_GA_RE.sub("ことが記載されている。", out)


def strip_blank_lines_in_appendix(s: str) -> str:
    """stripBlankLines.js:224-233."""
    return strip_between_lr(
        s, "<付記>", "　この付記は、拒絶理由を構成するものではありません。"
    )


def strip_blank_lines_in_priority(s: str) -> str:
    """stripBlankLines.js:243-251."""
    return strip_between_l(
        s, "<優先権の主張の効果について>", "優先権の主張の効果が認められない。"
    )


def strip_blank_lines_in_amendment_suggestion(s: str) -> str:
    """stripBlankLines.js:261-271."""
    return strip_between_lr(
        s,
        "<補正の示唆>",
        [
            "　なお、上記の補正の示唆は、法律的効果を生じさせるものではなく、拒絶理由を解消するための一案である。明細書等についてどのように補正をするかは、出願人が決定すべきものである。"
        ],
    )


# ---- 『…』 claims variant (textUtilsMain.js:867-905) ----

def strip_blank_lines_between(s, start_marker, end_marker):
    """textUtilsMain.js:867-895 — like _Keep but the joined inner text is
    additionally JS-trimmed."""
    if not s:
        return ""
    starts = start_marker if isinstance(start_marker, list) else [start_marker]
    ends = end_marker if isinstance(end_marker, list) else [end_marker]
    result = str(s)
    for start in starts:
        for end in ends:

            def repl(start_str: str, inner: str, end_str: str) -> str:
                inner_lines = split_lines_blank(inner)
                out = [ln for ln in inner_lines if not _is_blank_main(ln)]
                return start_str + js_trim(join_lines(out)) + end_str

            result = lazy_block_sub(result, start, end, repl)
    return result


_BLANK_MAIN_RE = re.compile("^[ \t\r\n\x0c\x0b　]*$")


def _is_blank_main(line: str) -> bool:
    # textUtilsMain.js:48-50 (the Main isBlankLine, includes \n in the class)
    return _BLANK_MAIN_RE.match(str(line or "")) is not None


def tight_claims(s: str) -> str:
    """textUtilsMain.js:902-905 — strip blank lines inside 『…』."""
    if not s:
        return ""
    return strip_blank_lines_between(str(s), "『", "』")
