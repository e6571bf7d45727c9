"""Per-document block state machines (SURVEY.md §2.7).

Exact semantics of:
- convertForDoc / convertEachLine / convertBeforeKirokuLineToFullWidth /
  normalizeNumberedHeadingsWithBlankLine / convertForFamily
  (/root/reference/js/textUtilsConvertForDoc.js:94-529)
- convertForCau / processCauTail / suggestion & family-info line rules /
  convertForOther / lcKenshuSakiUrl
  (/root/reference/js/textUtilsConvertForCau.js:148-565)

These are sequential per-document scans (cross-line carried state); they run
inside the Arrow-batched UDF — parallel ACROSS documents, ordered within one,
matching the reference's single-document semantics.
"""

from __future__ import annotations

import re

from ..functions.jsstr import join_lines, js_trim, lazy_block_sub_re, split_lines
from ..functions.widths import (
    to_full_digits,
    to_full_num_str,
    to_half_alnum_str,
    to_zenkaku_ascii,
)

# ======================================================================
# convertForDoc side (textUtilsConvertForDoc.js)
# ======================================================================

_IPC_RANGE_RE = re.compile(r"\s*(\d+)\s*(/)\s*(\d+)(\s*-\s*)(\d+)\s*(/)\s*(\d+)")


def _pad(num: str, width: int) -> str:
    return (" " * width + num)[-width:]


def convert_each_line(line: str) -> str:
    """convertEachLine (textUtilsConvertForDoc.js:94-248) — prior-art block
    per-line rule table."""
    raw = "" if line is None else str(line)
    s = js_trim(raw)
    if s == "":
        return ""
    s = to_half_alnum_str(s)

    # n/m - x/y IPC range padding (widths 3/3/5/3)
    s = _IPC_RANGE_RE.sub(
        lambda m: (
            _pad(js_trim(m.group(1)), 3)
            + js_trim(m.group(2))
            + _pad(js_trim(m.group(3)), 3)
            + js_trim(m.group(4))
            + _pad(js_trim(m.group(5)), 5)
            + js_trim(m.group(6))
            + _pad(js_trim(m.group(7)), 3)
        ),
        s,
    )

    exact = {
        "<先行技術文献調査結果の記録>": "　　　　　　　　　　<先行技術文献調査結果の記録>",
        "DB名 IEEE 802.11": "　　　　　　　　　ＤＢ名　　IEEE 802.11",
        "DB名 3GPP TSG RAN WG1-4": "　　　　　　　　　ＤＢ名　　3GPP TSG RAN WG1-4",
        "IEEE 802.11": "　　　　　　　　　　　　　　IEEE 802.11",
        "3GPP TSG RAN WG1-4": "　　　　　　　　　　　　　　3GPP TSG RAN WG1-4",
        "SA WG1-4、6": "　　　　　　　　　　　　　　　　　　 SA  WG1-4、6",
        "CT WG1、4": "　　　　　　　　　　　　　　　　　　 CT  WG1、4",
    }
    if s in exact:
        return exact[s]

    m = re.match(r"^・調査した分野[\s　]+IPC[\s　]+(.+)$", s)
    if m:
        return "・調査した分野　　ＩＰＣ　　" + m.group(1)

    m = re.match(r"^・先行技術文献[\s　]+(.+)$", s)
    if m:
        return "・先行技術文献  " + m.group(1)

    m = re.match(r"^([A-Za-z]\d{2}[A-Za-z].*)$", s)
    if m:
        return "　　　　　　　　　　　　　　" + m.group(1)

    for head in ("国", "特", "実", "米", "中", "韓"):
        if s.startswith(head):
            return "　　　　　　　　" + s

    return "　　　　　　　　" + s


def convert_each_line_for_family(line: str) -> str:
    """convertEachLineForFamily (textUtilsConvertForDoc.js:250-280)."""
    raw = "" if line is None else str(line)
    s = js_trim(raw)
    if s == "":
        return ""
    s = to_half_alnum_str(s)
    if re.match(r"^[0-9]", s):
        return s
    return "　　　" + s


_KI_LINE_RE = re.compile(
    r"([\s\S]*?)(^[ 　]*記[ 　]*(?:[（(]引用文献等については引用文献等一覧参照[）)])?[ 　]*$[\s\S]*)",
    re.M,
)
# Whole-line form of the 記 marker for the fast path (O(n) scan; the lazy
# [\s\S]*? form above is O(n^2) on megadocs).
_KI_LINE_FULL_RE = re.compile(
    r"[ 　]*記[ 　]*(?:[（(]引用文献等については引用文献等一覧参照[）)])?[ 　]*"
)


def _find_ki_line_start(s: str) -> int:
    """Offset of the first full line matching the 記 marker, else -1."""
    pos = 0
    n = len(s)
    while pos <= n:
        nl_idx = s.find("\n", pos)
        end = nl_idx if nl_idx != -1 else n
        if "記" in s[pos:end] and _KI_LINE_FULL_RE.fullmatch(s, pos, end):
            return pos
        if nl_idx == -1:
            return -1
        pos = nl_idx + 1
    return -1

_NUM_HEAD_RE = re.compile(r"^([ 　]*)([0-9０-９]+)([\.．])(\s*)(.*)$")


def normalize_numbered_headings_with_blank_line(block: str, newline: str = "\n") -> str:
    """textUtilsConvertForDoc.js:388-430."""
    lines = str(block).split("\n")
    result: list[str] = []
    i = 0
    n = len(lines)
    while i < n:
        line = lines[i]
        m = _NUM_HEAD_RE.match(line)
        if not m:
            result.append(line)
            i += 1
            continue
        result.append(m.group(1) + m.group(2) + m.group(3) + m.group(5))
        i += 1
        while i < n and js_trim(lines[i]) == "":
            i += 1
        result.append("")
    return newline.join(result)


def _convert_pre_tail(s: str, pre: str, tail: str) -> str:
    converted = to_zenkaku_ascii(pre)
    newline = "\n"
    if "\r\n" in s:
        newline = "\r\n"
    elif "\r" in s:
        newline = "\r"
    converted = normalize_numbered_headings_with_blank_line(converted, newline)
    # the reference replacement inserts one extra "\n" between pre and the
    # 記 line (textUtilsConvertForDoc.js:367) — bug-as-spec
    return converted + "\n" + tail


def convert_before_kiroku_line_to_full_width(text: str) -> str:
    """textUtilsConvertForDoc.js:315-370 — split at the standalone 記 line;
    upper part ASCII->full-width + numbered-heading blank normalization."""
    s = str(text)
    if "\r" not in s and " " not in s and " " not in s:
        # fast path: '\n'-only text (always true after the init chain's nl) —
        # locate the 記 line with a linear scan instead of the reference's
        # lazy-[\s\S]*? regex (quadratic on megadocs)
        idx = _find_ki_line_start(s)
        if idx == -1:
            return s
        return _convert_pre_tail(s, s[:idx], s[idx:])
    # exactness fallback: JS multiline ^/$ also break on \r / U+2028 / U+2029
    return _KI_LINE_RE.sub(lambda m: _convert_pre_tail(s, m.group(1), m.group(2)), s, count=1)


_DOC_BLOCK_A_RE = re.compile(r"-{20,}\r?\n")
_DOC_BLOCK_B_RE = re.compile(
    r"\r?\n[ \t　]*この先行技術文献調査結果の記録は、拒絶理由を構成するものではありません。"
)


def convert_for_doc(text: str) -> str:
    """convertForDoc (textUtilsConvertForDoc.js:479-501).

    The reference's ``(A)([\\s\\S]*?)(B)`` lazy regex rescans to EOF for
    every dash-rule line when the closing sentence is absent (O(n²) on
    megadocs); ``lazy_block_sub_re`` is the linear equivalent."""
    s = convert_before_kiroku_line_to_full_width(str(text))

    def repl(ma: re.Match[str], inner: str, mb: re.Match[str]) -> str:
        inner_lines = split_lines(inner)
        return ma.group(0) + join_lines([convert_each_line(ln) for ln in inner_lines]) + mb.group(0)

    return lazy_block_sub_re(s, _DOC_BLOCK_A_RE, _DOC_BLOCK_B_RE, repl)


_FAMILY_BLOCK_A_RE = re.compile(r"<ファミリー文献情報>\n?")
_FAMILY_BLOCK_B_RE = re.compile(
    r"[ 　]*この拒絶理由通知の内容に関するお問合せ又は面接のご希望がありましたら、次の連絡先までご連絡ください。補正案等の送付を希望される際は、その旨を事前にご連絡ください。"
)


def convert_for_family(text: str) -> str:
    """convertForFamily (textUtilsConvertForDoc.js:503-529) — note the
    replacement PREPENDS one newline before the header (reference behavior).
    Linear two-pointer form of the reference's lazy block regex."""

    def repl(ma: re.Match[str], inner: str, mb: re.Match[str]) -> str:
        lines = split_lines(inner)
        out = [convert_each_line_for_family(ln) for ln in lines]
        return "\n" + ma.group(0) + join_lines(out) + "\n" + mb.group(0)

    return lazy_block_sub_re(
        str(text), _FAMILY_BLOCK_A_RE, _FAMILY_BLOCK_B_RE, repl, count=1
    )


# ======================================================================
# convertForCau side (textUtilsConvertForCau.js)
# ======================================================================

_SUGGESTION_NUM_RE = re.compile(r"^([ \t　]*)([（(])([0-9０-９]+)([)）])(.*)$")
_CAP_AFTER_RE = re.compile(r"(^|[,\s])([a-zA-Z])")


def convert_suggestion_number_line_to_full_width(line: str) -> str:
    """textUtilsConvertForCau.js:148-177."""
    s = str(line)
    m = _SUGGESTION_NUM_RE.match(s)
    if not m:
        return s
    indent, digits, rest = m.group(1), m.group(3), m.group(5)
    full_digits = to_full_digits(digits)
    normalized = to_half_alnum_str(rest)
    normalized = _CAP_AFTER_RE.sub(lambda mm: mm.group(1) + mm.group(2).upper(), normalized)
    return indent + "(" + full_digits + ")" + normalized


def is_suggestion_number_line(line: str) -> bool:
    """textUtilsConvertForCau.js:183-186."""
    return re.match(r"^[ \t　]*[（(][0-9０-９]+[)）]", str(line)) is not None


def is_family_info_head_line(line: str) -> bool:
    """textUtilsConvertForCau.js:196-198."""
    return re.match(r"^[ 　]*[0-9０-９]+[\.．]", str(line)) is not None


def is_family_info_body_line(line: str) -> bool:
    """textUtilsConvertForCau.js:203-206."""
    return re.match(r"^[ 　\t]+.*\S.*$", str(line)) is not None


_FAMILY_HEAD_RE = re.compile(r"^([ 　]*)([0-9０-９]+)([\.．])(.*)$")


def convert_family_info_head_line(line: str) -> str:
    """textUtilsConvertForCau.js:224-241."""
    s = str(line)
    m = _FAMILY_HEAD_RE.match(s)
    if not m:
        return s
    return m.group(1) + to_full_digits(m.group(2)) + m.group(3) + to_half_alnum_str(m.group(4))


def convert_family_info_body_line(line: str) -> str:
    """textUtilsConvertForCau.js:257-270 — re-indent to 3 ideographic
    spaces, alnum halved."""
    s = str(line)
    body = re.sub(r"^[ 　\t]+", "", s)
    return "　　　" + to_half_alnum_str(body)


def convert_each_line_for_cau(line: str) -> str:
    """convertEachLine_ForCau (textUtilsConvertForCau.js:287-325)."""
    raw = "" if line is None else str(line)
    if raw == "":
        return ""
    if raw == "　審査第四部伝送システム(PA5J) 飯星 陽平(いいほし ようへい)":
        return "\n審査第四部伝送システム(PA5J) 飯星 陽平(いいほし ようへい)"
    if raw == "　TEL.03-3581-1101 内線3534":
        return "TEL.03-3581-1101 内線3534"
    if raw == "　※●●●●@Jpo.Go.Jp (上記「●●●●」に置き換えて、「PA5J」と入力ください。)":
        return "※●●●●@jpo.go.jp (上記「●●●●」に置き換えて、「PA5J」と入力ください。)"
    return to_full_num_str(to_half_alnum_str(raw))


_CAU_SPLIT_RE = re.compile(r"([\s\S]*?)(<補正をする際の注意>)([\s\S]*)")
_TERMINATOR_RE = re.compile(r"^この拒絶理由通知の内容に関するお問合せ")
_HEAD_WS_RE = re.compile(r"^[ \t　]+")


def process_cau_tail(_marker: str, tail: str) -> str:
    """processCauTail (textUtilsConvertForCau.js:413-506) — line-level state
    machine over the <補正をする際の注意> tail."""
    lines = split_lines(tail)
    out: list[str] = []
    in_suggestion = False
    in_family = False

    for line in lines:
        head_trimmed = _HEAD_WS_RE.sub("", line)

        if head_trimmed.startswith("<補正の示唆>") or head_trimmed.startswith("＜補正の示唆＞"):
            in_suggestion, in_family = True, False
            out.append(convert_each_line_for_cau(line))
            continue

        if head_trimmed.startswith("<ファミリー文献情報>") or head_trimmed.startswith("＜ファミリー文献情報＞"):
            in_suggestion, in_family = False, True
            out.append(convert_each_line_for_cau(line))
            continue

        if _TERMINATOR_RE.match(head_trimmed):
            if in_family:
                in_family = False
                if out and out[-1] != "":
                    out.append("")
            else:
                out.append("")
            in_suggestion = False
            out.append(convert_each_line_for_cau(line))
            continue

        if in_suggestion and is_suggestion_number_line(line):
            out.append(convert_suggestion_number_line_to_full_width(line))
            continue

        if in_family:
            if js_trim(line) == "":
                continue
            if is_family_info_head_line(line):
                out.append(convert_family_info_head_line(line))
                continue
            if is_family_info_body_line(line):
                out.append(convert_family_info_body_line(line))
                continue
            # fall through to default handling

        out.append(convert_each_line_for_cau(line))

    return join_lines(out)


def convert_for_cau(text: str) -> str:
    """convertForCau (textUtilsConvertForCau.js:353-371)."""
    s = str(text)
    m = _CAU_SPLIT_RE.match(s)
    if m:
        return m.group(1) + m.group(2) + process_cau_tail(m.group(2), m.group(3))
    return process_cau_tail("", s)


_URL_RE = re.compile(r"(取得先\s*<)(\S+)(>)")


def lc_kenshu_saki_url(s: str) -> str:
    """lcKenshuSakiUrl (textUtilsConvertForCau.js:381-394)."""
    if not isinstance(s, str) or not s:
        return s
    return _URL_RE.sub(lambda m: m.group(1) + m.group(2).lower() + m.group(3), s)


_OTHER_EXACT = {
    "SA WG1-4、6": "　　　　　　　　　　　　　　　SA  WG1-4、6",
    "CT WG1、4": "　　　　　　　　　　　　　　　CT  WG1、4",
    "記 (引用文献等については引用文献等一覧参照)": "　　　　　記　　　（引用文献等については引用文献等一覧参照）",
    "記": "　　　　　　　　　　　　　　　　　記",
    "------------------------------------": "－－－－－－－－－－－－－－－－－－－－－－－－－－－－－－－－－－－－",
    "<最後の拒絶理由通知とする理由>": "　　　　　　　　　　＜最後の拒絶理由通知とする理由＞",
    "<引用文献等一覧>": "　　　　　　　　　　　　　<引用文献等一覧>",
}

_HEAD_SP_RE = re.compile(r"^[ 　]+")
_ANGLE_TABLE = str.maketrans({"<": "＜", ">": "＞"})


def convert_for_other(text: str) -> str:
    """convertForOther (textUtilsConvertForCau.js:519-565).  Runs 2x in
    officeAction (reference-faithful); measured at ~1% of conversion cost,
    so no memo layer is warranted (doc-level hit rate is 0 — the text
    changes between applications)."""
    lines = split_lines(lc_kenshu_saki_url(text))
    out = []
    for line in lines:
        raw = str(line)
        head_trimmed = _HEAD_SP_RE.sub("", raw)
        out.append(_OTHER_EXACT.get(head_trimmed, raw))
    return join_lines(out).translate(_ANGLE_TABLE)
