"""Heading / bullet detection regexes — the segmentation core.

Re-expression of the reference's regex builders
(/root/reference/js/textUtilsMain.js:212-319).  Patterns are built once at
module import (the reference builds them once per page load) so executors pay
zero per-batch compilation cost.
"""

from __future__ import annotations

import re

# textUtilsMain.js:212-214
DOT_MARKS = ["・", "●", "○", "◆", "◇", "■", "□"]
# textUtilsMain.js:222
DASH_AND_ANGLE_MARKS = ["-", "<"]


def build_heading_mark_re(max_digits: int = 2, max_depth: int = 3, alpha_max: int = 2) -> re.Pattern[str]:
    """textUtilsMain.js:233-299 — heading-mark regex builder.

    Matches (1)/（１）, (A), 1., 1.2.3., 1), A., A), bare number chain with
    delimiter lookahead, and 第1 with 章節条項号編部款頁回図表 lookahead.
    Caps: maxDigits<=4, maxDepth<=6, alphaMax<=4.
    """
    if not (max_digits > 0):
        max_digits = 2
    if max_depth < 0:
        max_depth = 3
    if not (alpha_max > 0):
        alpha_max = 2
    max_digits = min(max_digits, 4)
    max_depth = min(max_depth, 6)
    alpha_max = min(alpha_max, 4)

    sp0 = "[ 　]*"
    num = "[0-9０-９]"
    alpha = "[A-Za-zＡ-Ｚａ-ｚ]"
    open_p = "[\\(\\（]"
    close_p = "[\\)\\）]"
    dot = "[\\.．]"
    close_only = "[\\)\\）]"

    seg = num + "{1," + str(max_digits) + "}"
    chain = seg + "(?:" + dot + seg + "){0," + str(max_depth) + "}"
    delim_after_num = "(?:[\\s　]|$|[、,，．。\\.：:;；\\)\\）])"
    suffix_after_dai = "(?:[\\s　]|$|[、,，．。\\.：:;；]|[章節条項号編部款頁回図表])"

    parts = [
        open_p + seg + close_p,
        open_p + alpha + "{1," + str(alpha_max) + "}" + close_p,
        chain + dot,
        seg + close_only,
        alpha + "{1," + str(alpha_max) + "}" + dot,
        alpha + "{1," + str(alpha_max) + "}" + close_only,
        chain + "(?=" + delim_after_num + ")",
        "第" + seg + "(?=" + suffix_after_dai + ")",
    ]
    inner = "(?:" + "|".join(parts) + ")"
    return re.compile("^(" + sp0 + ")(" + inner + ")")


def build_dot_bullet_re(marks: list[str]) -> re.Pattern[str]:
    """textUtilsMain.js:306-309."""
    cls = "".join(re.escape(m) for m in marks)
    return re.compile("^[ 　]*([" + cls + "])")


HEADING_MARK_RE = build_heading_mark_re()
DOT_MARKS_FOR_TIGHT = [m for m in DOT_MARKS if m != "●"]
DOT_BULLET_RE_FOR_TIGHT = build_dot_bullet_re(DOT_MARKS_FOR_TIGHT)
DASH_ANGLE_RE = re.compile("^[ 　]*([" + "".join(re.escape(m) for m in DASH_AND_ANGLE_MARKS) + "])")

# textUtilsMain.js:48-50 (Main variant: includes \n in the blank class)
BLANK_LINE_MAIN_RE = re.compile("^[ \t\r\n\x0c\x0b　]*$")
# stripBlankLines.js:45-47 (no \n)
BLANK_LINE_STRIP_RE = re.compile("^[ \t\r\x0c\x0b　]*$")


def is_blank_line_main(line: str) -> bool:
    return BLANK_LINE_MAIN_RE.match(line or "") is not None


def is_blank_line_strip(line: str) -> bool:
    return BLANK_LINE_STRIP_RE.match(line if line is not None else "") is not None
