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
