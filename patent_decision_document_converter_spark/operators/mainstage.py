"""Main-stage line-structure operators (SURVEY.md §2.5, §2.2).

Exact semantics of /root/reference/js/textUtilsMain.js:337-532,845-905.
"""

from __future__ import annotations

from ..functions.headings import (
    DASH_ANGLE_RE,
    DOT_BULLET_RE_FOR_TIGHT,
    DOT_MARKS,
    HEADING_MARK_RE,
    is_blank_line_main,
)
from ..functions.jsstr import join_lines, split_lines
from ..functions.widths import fw, fw_alnum


def pad_head(s: str, count: int = 1) -> str:
    """textUtilsMain.js:337-346 — prepend N ideographic spaces to every
    non-empty line."""
    lines = split_lines(str(s or ""))
    c = count if isinstance(count, (int, float)) and count > 0 else 1
    pad = "　" * int(c)
    return join_lines([ln if ln == "" else pad + ln for ln in lines])


def trim_head(s: str, mode=None) -> str:
    """textUtilsMain.js:358-410 — conditionally strip ONE leading space."""
    lines = split_lines(str(s or ""))
    if mode is None:
        modes = ["dot", "head", "lt"]
    elif isinstance(mode, list):
        modes = list(mode)
    else:
        modes = [mode]

    use_all = "all" in modes
    use_dot = "dot" in modes
    use_head = "head" in modes
    use_lt = "lt" in modes

    out = []
    for line in lines:
        if use_all:
            out.append(_lstrip_sp(line))
            continue
        t = line
        if use_dot and t[:1] in (" ", "　"):
            for mark in DOT_MARKS:
                if t.startswith(" " + mark) or t.startswith("　" + mark):
                    t = t[1:]
                    break
        if use_head and t[:1] in (" ", "　") and HEADING_MARK_RE.match(t[1:]):
            t = t[1:]
        if use_lt and (t.startswith(" <") or t.startswith("　<")):
            t = t[1:]
        if use_lt and (t.startswith(" -") or t.startswith("　-")):
            t = t[1:]
        out.append(t)
    return join_lines(out)


def _lstrip_sp(line: str) -> str:
    i = 0
    while i < len(line) and line[i] in " \t　":
        i += 1
    return line[i:]


def tight_below_bullet(s: str, mode: str = "both") -> str:
    """textUtilsMain.js:422-450 — delete ONE blank line directly below a
    bullet / heading / dash-angle line."""
    lines = split_lines(str(s or ""))
    n = len(lines)
    use_dot = mode in ("both", "dot")
    use_head = mode in ("both", "head")

    out = []
    i = 0
    while i < n:
        line = lines[i]
        out.append(line)
        is_dot = use_dot and DOT_BULLET_RE_FOR_TIGHT.match(line) is not None
        is_head = use_head and HEADING_MARK_RE.match(line) is not None
        is_dash = DASH_ANGLE_RE.match(line) is not None
        if (is_dot or is_head or is_dash) and i + 1 < n and is_blank_line_main(lines[i + 1]):
            i += 2
            continue
        i += 1
    return join_lines(out)


def fw_head(s: str) -> str:
    """textUtilsMain.js:467-532 — full-width the heading MARK only, then
    whole-line fw() for lines starting with ● or ・ (column 0)."""
    lines = split_lines(str(s or ""))
    for i, line in enumerate(lines):
        if line == "":
            continue
        m = HEADING_MARK_RE.match(line)
        if m:
            pre, mark = m.group(1), m.group(2)
            after = line[len(pre) + len(mark):]
            lines[i] = pre + fw_alnum(mark) + after
    # fwLineStartsWithBlackDot then fwLineStartsWithSmallDot
    # (textUtilsMain.js:481,493-532)
    for ch in ("●", "・"):
        for i, line in enumerate(lines):
            if line and line[0] == ch:
                lines[i] = fw(line)
    return join_lines(lines)


def tight_lines(s: str) -> str:
    """textUtilsMain.js:845-854 — delete ALL blank lines."""
    if not s:
        return ""
    return join_lines([ln for ln in split_lines(str(s)) if not is_blank_line_main(ln)])
