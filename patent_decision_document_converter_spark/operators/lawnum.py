"""Legal-number / citation full-width rewrites (SURVEY.md §2.6).

Exact semantics of /root/reference/js/textUtilsMain.js:133-187 (tech-token
protection), :543-676 (fwNumLaw cascade), :692-775 (repKW/kw builders),
:789-812 (fwRefLaw), :823-834 (alphaCase).

All regexes are compiled once at module import.  Order of the cascade matters
(longest statute pattern first) and is preserved verbatim.
"""

from __future__ import annotations

import re

from ..functions.jsstr import js_trim as _strip_js
from ..functions.widths import fw_alnum, fw_num, pad_left_zero, remove_ws

# --- tech-token protection (textUtilsMain.js:133-187) --------------------

DEFAULT_KEEP_TECH_RE_LIST = [
    re.compile(r"IEEE\s*802\.\d+(?:\.\d+)*(?:[a-z])?", re.I),
    re.compile(r"\b802\.\d+(?:\.\d+)*(?:[a-z])?\b", re.I),
    re.compile(r"\bWPA(?:\d+)?-PSK\b", re.I),
    re.compile(r"\b[A-Z]{2,}(?:[0-9]{0,3})?(?:[-\/][A-Z0-9]{2,})+\b"),
    re.compile(r"\bWi-?Fi\b", re.I),
]

_SENTINEL_RE = re.compile("(\\d+)")


def protect_by_regex_list(text: str, re_list) -> tuple[str, list[str]]:
    """textUtilsMain.js:147-161 — replace matches with PUA sentinels."""
    out = str(text or "")
    mapping: list[str] = []
    for rx in re_list:
        def repl(m: re.Match[str]) -> str:
            idx = len(mapping)
            mapping.append(m.group(0))
            return "" + str(idx) + ""
        out = rx.sub(repl, out)
    return out, mapping


def restore_protected(text: str, mapping: list[str]) -> str:
    """textUtilsMain.js:169-174."""
    return _SENTINEL_RE.sub(
        lambda m: mapping[int(m.group(1))] if int(m.group(1)) < len(mapping) else m.group(0),
        str(text or ""),
    )


def apply_with_tech_protection(text: str, fn, keep_list=None) -> str:
    """textUtilsMain.js:183-187."""
    protected, mapping = protect_by_regex_list(text, keep_list or DEFAULT_KEEP_TECH_RE_LIST)
    return restore_protected(fn(protected), mapping)


# --- repKW / kw (textUtilsMain.js:692-775) -------------------------------

_ESC_RE = re.compile(r"[.*+?^${}()|[\]\\]")


def _esc(s: str) -> str:
    return _ESC_RE.sub(lambda m: "\\" + m.group(0), s)


def kw(dig: str, p_l: str, p_r: str, sep: str) -> str:
    """textUtilsMain.js:738-775 — number-list pattern builder."""
    dig, p_l, p_r, sep = str(dig or ""), str(p_l or ""), str(p_r or ""), str(sep or "")
    if not dig:
        return ""

    def add_plus(src: str) -> str:
        if re.search(r"[+*?]$", src) or re.search(r"\}\s*$", src):
            return src
        return src + "+"

    DIG = add_plus(dig)
    use_paren = bool(p_l and p_r)
    NUM = f"(?:{DIG}|(?:{p_l}{DIG}{p_r}))" if use_paren else f"(?:{DIG})"
    DASH = r"(?:-|－|−)"
    TERM = rf"(?:{NUM}(?:\s*{DASH}\s*{NUM})?)"
    SEP = rf"(?:{sep})" if sep else r"(?:[、,]|及び|又は)"
    return rf"(?:{TERM}(?:\s*{SEP}\s*{TERM})*)"


def rep_kw(s: str, stars, kw_pattern: str, f) -> str:
    """textUtilsMain.js:692-725 — rewrite the number-list after STAR_WORD."""
    s = str(s if s is not None else "")
    star_list = stars if isinstance(stars, list) else [stars]
    star_list = [x for x in star_list if x]
    if not star_list or not kw_pattern:
        return s
    star_src = "|".join(
        sorted((_esc(str(x)) for x in star_list), key=len, reverse=True)
    )
    rx = re.compile("(" + star_src + ")([ \\t　]*)(" + kw_pattern + ")")
    fn = f if callable(f) else (lambda x: x)
    return rx.sub(lambda m: m.group(1) + m.group(2) + fn(m.group(3)), s)


# --- fwNumLaw cascade (textUtilsMain.js:543-675) -------------------------

_DIGS_WS = "[0-9０-９\\s　]+"

_LAW_PATTERNS: list[tuple[re.Pattern[str], object]] = []


def _law(pattern: str, repl) -> None:
    _LAW_PATTERNS.append((re.compile(pattern), repl))


def _w(g: str) -> str:
    return fw_num(remove_ws(g))


# 第◯条の◯第◯項第◯号
_law(
    f"第({_DIGS_WS})条の({_DIGS_WS})第({_DIGS_WS})項第({_DIGS_WS})号",
    lambda m: f"第{_w(m.group(1))}条の{_w(m.group(2))}第{_w(m.group(3))}項第{_w(m.group(4))}号",
)
# 第◯条の◯第◯項
_law(
    f"第({_DIGS_WS})条の({_DIGS_WS})第({_DIGS_WS})項",
    lambda m: f"第{_w(m.group(1))}条の{_w(m.group(2))}第{_w(m.group(3))}項",
)
# 第◯条の◯
_law(
    f"第({_DIGS_WS})条の({_DIGS_WS})",
    lambda m: f"第{_w(m.group(1))}条の{_w(m.group(2))}",
)
# 第◯条第◯項第◯号
_law(
    f"第({_DIGS_WS})条第({_DIGS_WS})項第({_DIGS_WS})号",
    lambda m: f"第{_w(m.group(1))}条第{_w(m.group(2))}項第{_w(m.group(3))}号",
)
# 第◯条第◯項
_law(
    f"第({_DIGS_WS})条第({_DIGS_WS})項",
    lambda m: f"第{_w(m.group(1))}条第{_w(m.group(2))}項",
)
# PCT第◯条 → ＰＣＴ第◯条
_law(
    f"(?:PCT|ＰＣＴ)第({_DIGS_WS})条",
    lambda m: f"ＰＣＴ第{_w(m.group(1))}条",
)
# 第◯条
_law(f"第({_DIGS_WS})条", lambda m: f"第{_w(m.group(1))}条")
# 特許法施行規則様式第◯備考◯、◯
_law(
    "特許法施行規則様式第([0-9０-９\\s　]+)備考([0-9０-９\\s　、,，]+)",
    lambda m: f"特許法施行規則様式第{_w(m.group(1))}備考{_w(m.group(2))}",
)
# 第◯節/頁/章/段落/行目 (alnum)
_law(
    "第([0-9０-９A-Za-zＡ-Ｚａ-ｚ\\.．\\s　]+)(節|頁|章|段落|行目)",
    lambda m: "第" + fw_alnum(remove_ws(m.group(1))) + m.group(2),
)
# JPGL第◯部
_law(
    "(?:JPGL|ＪＰＧＬ)第([0-9０-９A-Za-zＡ-Ｚａ-ｚ\\.．\\s　]+)(部)",
    lambda m: "ＪＰＧＬ第" + fw_alnum(remove_ws(m.group(1))) + m.group(2),
)
# 令和YY年MM月DD日 (zero-pad-2 via padLeftZero which pads with U+3000)
_law(
    "令和([0-9０-９\\s　]+)年([0-9０-９\\s　]+)月([0-9０-９\\s　]+)日",
    lambda m: (
        "令和"
        + fw_num(pad_left_zero(_strip_js(remove_ws(m.group(1))), 2))
        + "年"
        + fw_num(pad_left_zero(_strip_js(remove_ws(m.group(2))), 2))
        + "月"
        + fw_num(pad_left_zero(_strip_js(remove_ws(m.group(3))), 2))
        + "日"
    ),
)

# repKW instantiations (textUtilsMain.js:649-674)
_REPKW_STEPS: list[tuple[list[str], str]] = [
    (["引用文献", "文献", "相違点", "主張", "理由"], kw("[0-9]+", "", "", "[、]|[-]|及び|又は")),
    (["請求項", "前記", "上記", "記載"], kw("[0-9]+", "\\(", "\\)", "[、]|[-]|[\\(\\)]|及び|又は")),
    (["claims", "claim"], kw("[0-9]+", "\\(", "\\)", "[,]|[、]|[-]|[\\(\\)]|及び|又は")),
    (["段落"], kw("[0-9]+", "\\[", "\\]", "[、]|[-]|[\\[\\]]|及び|又は")),
    (["paragraphs", "paragraph"], kw("[0-9]+", "\\[", "\\]", "[,]|[、]|[-]|[\\[\\]]|及び|又は")),
    (["図"], kw("[0-9a-zA-z]+", "", "", "[、]|[-]|及び|又は")),
    (["fig."], kw("[0-9a-zA-z]+", "", "", "[,]|[、]|[-]|及び|又は")),
    (["式"], kw("[0-9a-zA-z]+", "\\(", "\\)", "[、]|[-]|[\\(\\)]|及び|又は")),
]


def fw_num_law(s: str) -> str:
    """textUtilsMain.js:543-675 — the full ordered cascade."""
    s = str(s or "")
    for rx, repl in _LAW_PATTERNS:
        s = rx.sub(repl, s)
    for stars, pattern in _REPKW_STEPS:
        s = rep_kw(s, stars, pattern, fw_alnum)
    return s


# --- fwRefLaw (textUtilsMain.js:789-812) ---------------------------------

_DIG = "[0-9０-９]"
_ALPHA_CLS = "[A-Za-zＡ-Ｚａ-ｚ]"
_TOKEN = "(?:[\\[\\【]?" + _DIG + "+(?:" + _ALPHA_CLS + "+)?[\\]\\】]?)"
_SEP_REF = "(?:[\\s　]*(?:及び|又は|[、,，]|[-‐-–—−]|[\\.．])[\\s　]*)"
_TAIL = "(" + _TOKEN + "(?:" + _SEP_REF + _TOKEN + ")*)"
_RE_TABLE = re.compile("(表)([\\s　:：]*?)" + _TAIL)


def fw_ref_law(s: str) -> str:
    """表+number-list full-width rewrite, skipping 特表 (checks char before
    the match offset)."""
    s = str(s or "")

    def repl(m: re.Match[str]) -> str:
        if m.start() > 0 and s[m.start() - 1] == "特":
            return m.group(0)
        return m.group(1) + m.group(2) + fw_alnum(remove_ws(m.group(3)))

    return _RE_TABLE.sub(repl, s)


# --- alphaCase (textUtilsMain.js:823-834) --------------------------------

_WORD_RE = re.compile("[a-zA-Z]+")


def alpha_case(s: str) -> str:
    """Capitalize first letter of each ASCII word unless already capitalized,
    under tech-token protection."""

    def conv(t: str) -> str:
        def cap(m: re.Match[str]) -> str:
            w = m.group(0)
            return w if "A" <= w[0] <= "Z" else w[0].upper() + w[1:]

        return _WORD_RE.sub(cap, t)

    return apply_with_tech_protection(str(s or ""), conv)
