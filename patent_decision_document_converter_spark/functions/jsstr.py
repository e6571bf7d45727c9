"""JavaScript string-semantics shims.

The reference engine is JavaScript; a handful of its string primitives differ
subtly from Python's defaults (``String.prototype.trim`` whitespace set,
``split(/\\r\\n|\\r|\\n/)``).  Centralizing them keeps every ported operator
byte-exact.

Reference evidence:
- js trim whitespace set: ECMA-262 `TrimString` (WhiteSpace + LineTerminator),
  used throughout e.g. /root/reference/js/textUtilsInit.js:201,
  /root/reference/js/textUtilsConvertForDoc.js:96.
- splitLines: /root/reference/js/textUtilsStd.js:492-495 (and 4 dups).
"""

from __future__ import annotations

import re

# ECMAScript WhiteSpace + LineTerminator (what String.prototype.trim strips):
# TAB LF VT FF CR SP NBSP ZWNBSP(U+FEFF) U+1680 U+2000-200A LS PS U+202F U+205F U+3000
JS_WS = (
    "\t\n\x0b\x0c\r \u00a0\ufeff\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)

_TRIM_RE = re.compile(f"^[{JS_WS}]+|[{JS_WS}]+$")

_SPLIT_RE = re.compile(r"\r\n|\r|\n")


def js_trim(s: str) -> str:
    """Exact ``String.prototype.trim``."""
    return _TRIM_RE.sub("", s)


def split_lines(s: str) -> list[str]:
    """``String(str).split(/\\r\\n|\\r|\\n/)`` (textUtilsStd.js:492-495)."""
    return _SPLIT_RE.split(str(s))


def split_lines_blank(s: str) -> list[str]:
    """stripBlankLines.js:17-20 variant: empty/None input -> [""]."""
    if not s:
        return [""]
    return _SPLIT_RE.split(str(s))


def join_lines(lines: list[str]) -> str:
    return "\n".join(lines)


def escape_regexp(s: str) -> str:
    """JS-style escapeRegExp used by marker strippers
    (stripBlankLines.js:73: ``[.*+?^${}()|[\\]\\\\]`` -> escaped)."""
    return re.sub(r"[.*+?^${}()|[\]\\]", lambda m: "\\" + m.group(0), str(s))


def lazy_block_sub(s: str, start: str, end: str, repl, count: int = 0) -> str:
    """Linear-time equivalent of
    ``re.sub('(START)([\\s\\S]*?)(END)', repl, s)`` for LITERAL markers.

    The reference's lazy regex is O(n·starts) when start markers are
    frequent and the end marker is absent (every attempt rescans to EOF) —
    a megadoc blowup measured at 4x length -> 12x time.  Leftmost-match +
    lazy-inner semantics are exactly: take the first start, pair it with
    the EARLIEST end after it, continue after the match; if some start has
    no end after it, no later start can have one either (its search space
    is a subset), so stop.  ``repl(start_str, inner, end_str) -> str``.
    """
    out: list[str] = []
    pos = 0
    done = 0
    while True:
        i = s.find(start, pos)
        if i == -1:
            break
        j = s.find(end, i + len(start))
        if j == -1:
            break
        out.append(s[pos:i])
        out.append(repl(start, s[i + len(start): j], end))
        pos = j + len(end)
        done += 1
        if count and done >= count:
            break
    out.append(s[pos:])
    return "".join(out)


def lazy_block_sub_re(s: str, a_re: re.Pattern, b_re: re.Pattern, repl, count: int = 0) -> str:
    """Same linear rewrite for regex start/end markers:
    ``re.sub('(A)([\\s\\S]*?)(B)', repl, s)`` with ``repl(ma, inner, mb)``.
    A and B must be self-contained patterns (no lookaround across the
    inner span), which is true for every block pattern in the reference.
    """
    out: list[str] = []
    pos = 0
    done = 0
    while True:
        ma = a_re.search(s, pos)
        if ma is None:
            break
        mb = b_re.search(s, ma.end())
        if mb is None:
            break
        out.append(s[pos: ma.start()])
        out.append(repl(ma, s[ma.end(): mb.start()], mb))
        pos = mb.end()
        done += 1
        if count and done >= count:
            break
    out.append(s[pos:])
    return "".join(out)
