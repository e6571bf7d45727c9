"""Full-width / half-width and whitespace normalization primitives.

Exact re-expression of the reference scalar filters (SURVEY.md §2.2):
- init pipeline ops: nl, hw, clean, rmBlank, squeeze, trim, gap, lead
  (/root/reference/js/textUtilsInit.js:32-249)
- width converters: fwNum/hwNum/fwSym/hwSym/fwAlpha/hwAlpha/fwAlnum/hwAlnum/fw/hw
  (/root/reference/js/textUtilsStd.js:117-476)
- helpers: removeWS, padLeftZero (textUtilsMain.js:57-85),
  toZenkakuAscii (textUtilsConvertForDoc.js:439-451),
  toHalfAlnumStr/toFullNumStr/toFullDigits (textUtilsConvertForCau.js:33-121)

All are implemented as str.translate tables / compiled regexes — C-speed per
document, no per-character Python in the hot path.
"""

from __future__ import annotations

import re
import unicodedata

from .jsstr import js_trim, join_lines, split_lines

FW_OFFSET = 0xFEE0

# --- translate tables ----------------------------------------------------

_FW_NUM = {c: c + FW_OFFSET for c in range(0x30, 0x3A)}
_HW_NUM = {c + FW_OFFSET: c for c in range(0x30, 0x3A)}
_FW_ALPHA = {c: c + FW_OFFSET for c in list(range(0x41, 0x5B)) + list(range(0x61, 0x7B))}
_HW_ALPHA = {c + FW_OFFSET: c for c in list(range(0x41, 0x5B)) + list(range(0x61, 0x7B))}
_FW_ALNUM = {**_FW_NUM, **_FW_ALPHA}
_HW_ALNUM = {**_HW_NUM, **_HW_ALPHA}
_SYM_CODES = [c for c in range(0x21, 0x7F) if not (0x30 <= c <= 0x39 or 0x41 <= c <= 0x5B - 1 or 0x61 <= c <= 0x7B - 1)]
_FW_SYM = {c: c + FW_OFFSET for c in _SYM_CODES}
_HW_SYM = {c + FW_OFFSET: c for c in _SYM_CODES}
# fw(): all ASCII 0x21-0x7E -> full-width, ' ' -> U+3000 …
_FW_ALL = {c: c + FW_OFFSET for c in range(0x21, 0x7F)}
_FW_ALL[0x20] = 0x3000
# … then re-halve －＜＞［］／　 (textUtilsStd.js:369-377) — note this also
# halves full-width chars already present in the input.
_FW_POST = {0xFF0D: 0x2D, 0xFF1C: 0x3C, 0xFF1E: 0x3E, 0xFF3B: 0x5B, 0xFF3D: 0x5D, 0xFF0F: 0x2F, 0x3000: 0x20}
# hw(): manual pass after NFKC — full-width ASCII + ideographic space
_HW_ALL = {c + FW_OFFSET: c for c in range(0x21, 0x7F)}
_HW_ALL[0x3000] = 0x20
# toZenkakuAscii: 0x21-0x7E -> full-width, space kept
_ZENKAKU_ASCII = {c: c + FW_OFFSET for c in range(0x21, 0x7F)}


def fw_num(s: str) -> str:
    """textUtilsStd.js:117-132 — digits only half->full."""
    return s.translate(_FW_NUM)


def hw_num(s: str) -> str:
    """textUtilsStd.js:144-159."""
    return s.translate(_HW_NUM)


def fw_alpha(s: str) -> str:
    """textUtilsStd.js:233-248."""
    return s.translate(_FW_ALPHA)


def hw_alpha(s: str) -> str:
    """textUtilsStd.js:260-275."""
    return s.translate(_HW_ALPHA)


def fw_alnum(s: str) -> str:
    """textUtilsStd.js:291-306."""
    return s.translate(_FW_ALNUM)


def hw_alnum(s: str) -> str:
    """textUtilsStd.js:318-333."""
    return s.translate(_HW_ALNUM)


def fw_sym(s: str) -> str:
    """textUtilsStd.js:175-190."""
    return s.translate(_FW_SYM)


def hw_sym(s: str) -> str:
    """textUtilsStd.js:202-217."""
    return s.translate(_HW_SYM)


def fw(s: str) -> str:
    """textUtilsStd.js:351-379 — ASCII->full-width then re-halve 7 chars."""
    if not s:
        return ""
    return s.translate(_FW_ALL).translate(_FW_POST)


def hw(s: str) -> str:
    """NFKC normalize + manual full-width-ASCII/U+3000 fold
    (textUtilsInit.js:52-83; duplicated textUtilsStd.js:445-476)."""
    if not s:
        return ""
    return unicodedata.normalize("NFKC", s).translate(_HW_ALL)


def to_half_width(s: str) -> str:
    """app.js:73-103 pre-step: NFKC only (normalize() path always taken)."""
    if not s:
        return ""
    return unicodedata.normalize("NFKC", s)


# --- init-pipeline line ops ----------------------------------------------

_NL_RE = re.compile(r"\r\n?")


def nl(s: str) -> str:
    """textUtilsInit.js:32-37 — CRLF/CR -> LF."""
    if not s:
        return ""
    return _NL_RE.sub("\n", s)


# clean (textUtilsInit.js:102-135): \t \v \f -> ' '; ASCII control (incl 0x7F)
# deleted; Unicode Cc/Cf/Cs/Co/Cn deleted; '\n' kept.
_TAB_CLASS = {0x09: 0x20, 0x0B: 0x20, 0x0C: 0x20}
_CLEAN_DROP_CATS = frozenset({"Cc", "Cf", "Cs", "Co", "Cn"})


def _is_clean_kept(ch: str) -> bool:
    code = ord(ch)
    if (code <= 0x1F) or code == 0x7F:
        return False
    return unicodedata.category(ch) not in _CLEAN_DROP_CATS


# Precompute the drop-set over the BMP lazily via regex alternative: build a
# character-class regex for category removal is impractical; instead translate
# with a cached per-codepoint decision.
class _CleanTable(dict):
    """Lazy translate table: maps every seen codepoint to itself/None/' '."""

    def __missing__(self, code: int) -> int | None:
        if code == 0x0A:
            r: int | None = code
        elif code in _TAB_CLASS:
            r = 0x20
        elif not _is_clean_kept(chr(code)):
            r = None
        else:
            r = code
        self[code] = r
        return r


_CLEAN_TABLE = _CleanTable()


def clean(s: str) -> str:
    """textUtilsInit.js:102-135."""
    if not s:
        return ""
    return s.translate(_CLEAN_TABLE)


_BLANK_STRIP_RE = re.compile("[ \t\r\f\x0b　]")


def rm_blank(s: str) -> str:
    """textUtilsInit.js:149-166 — drop lines whose non-space content is empty.

    Splits on '\\n' ONLY (JS `s.split("\\n")`), not the \\r\\n|\\r|\\n class.
    """
    if not s:
        return ""
    out = [ln for ln in s.split("\n") if _BLANK_STRIP_RE.sub("", ln)]
    return "\n".join(out)


_SQUEEZE_RE = re.compile(" {2,}")


def squeeze(s: str) -> str:
    """textUtilsInit.js:178-183."""
    if not s:
        return ""
    return _SQUEEZE_RE.sub(" ", s)


def trim(s: str) -> str:
    """textUtilsInit.js:196-203 — per-line JS trim; splits on '\\n' only."""
    if not s:
        return ""
    return "\n".join(js_trim(ln) for ln in s.split("\n"))


def gap(s: str) -> str:
    """textUtilsInit.js:219-231 — blank line after every line.

    ["a","b"] -> ["a","","b",""] joined = "a\\n\\nb\\n" (trailing single \\n).
    """
    if not s:
        return ""
    out: list[str] = []
    for ln in s.split("\n"):
        out.append(ln)
        out.append("")
    return "\n".join(out)


def lead(s: str) -> str:
    """textUtilsInit.js:244-249 — ensure exactly one leading newline."""
    if not s:
        return ""
    return s if s[0] == "\n" else "\n" + s


# --- misc helpers used by later stages -----------------------------------

_WS_ALL_RE = re.compile("[ 　\t\r\n\x0b\x0c]+")


def remove_ws(s: str) -> str:
    """textUtilsMain.js:57-59 — delete ALL whitespace incl. ideographic."""
    return _WS_ALL_RE.sub("", str(s or ""))


def pad_left_zero(y: str, n: int) -> str:
    """textUtilsMain.js:68-85 — left-pad to width n with U+3000 (sic: pads
    with full-width SPACE despite the name; bug-as-spec)."""
    n = int(n)
    if n <= 0:
        return str(y)
    s = str(y)
    sign = ""
    if s[:1] in ("-", "+"):
        sign, s = s[0], s[1:]
    if len(s) >= n:
        return sign + s
    return sign + "　" * (n - len(s)) + s


def to_zenkaku_ascii(s: str) -> str:
    """textUtilsConvertForDoc.js:439-451 — ASCII 0x21-0x7E -> full-width."""
    return str(s).translate(_ZENKAKU_ASCII)


def to_half_alnum_str(s: str) -> str:
    """textUtilsConvertForCau.js:110-112 / textUtilsConvertForDoc.js:69-73."""
    return str(s).translate(_HW_ALNUM)


def to_full_num_str(s: str) -> str:
    """textUtilsConvertForCau.js:119-121 — half digits -> full."""
    return str(s).translate(_FW_NUM)


def to_full_digits(s: str) -> str:
    """textUtilsConvertForCau.js:33-37 — digits (half or full) -> full."""
    return str(s).translate(_FW_NUM)


__all__ = [
    "fw_num", "hw_num", "fw_alpha", "hw_alpha", "fw_alnum", "hw_alnum",
    "fw_sym", "hw_sym", "fw", "hw", "to_half_width",
    "nl", "clean", "rm_blank", "squeeze", "trim", "gap", "lead",
    "remove_ws", "pad_left_zero", "to_zenkaku_ascii",
    "to_half_alnum_str", "to_full_num_str", "to_full_digits",
    "split_lines", "join_lines",
]
