"""Japanese typo / redundancy validation scan (SURVEY.md §2.11).

Exact semantics of JaTypoChecker.check
(/root/reference/js/jaTypoChecker.js:19-135, 240-301): 8 regex patterns + 10
fixed phrases, each finding carrying a 15-char context window.

Spark usage: instead of the reference's abort-on-finding UI gate
(app.js:486-494), the job materializes findings as a typed column and routes
rows with findings to a quarantine output (never kills the job for one doc).
"""

from __future__ import annotations

import re

# Python port notes: \k<p> -> (?P=p); JS 'u' flag irrelevant (Python is
# codepoint-based); lookbehinds are fixed-width in every pattern.
TYPO_PATTERNS: list[tuple[str, re.Pattern[str], str]] = [
    (
        "mixedFullHalfSpace",
        re.compile(r"(?<![0-9０-９][0-9０-９][0-9０-９])[0-9０-９][ 　]+[0-9０-９]"),
        "数字の間に余分なスペース（半角／全角）が入っている可能性があります。",
    ),
    (
        "duplicatedComma",
        re.compile(r"、{2,}"),
        "読点「、」が連続しています。打ち過ぎの可能性があります。",
    ),
    (
        "duplicatedPeriod",
        re.compile(r"。。+"),
        "句点「。」が連続しています。打ち過ぎの可能性があります。",
    ),
    (
        "spaceBeforePunctuation",
        re.compile(r"[ 　]+[。、，．]"),
        "句読点の直前にスペースが入っています。",
    ),
    (
        "missingNiBeforeKisaiInvent",
        re.compile(r"([^\s\nに])[ 　]*記載された発明"),
        "「〜に記載された発明」の「に」が抜けている可能性があります（例: 「引用文献１記載された発明」）。",
    ),
    (
        "missingNiBeforeKisaiNoInvent",
        re.compile(r"([^\s\nに])[ 　]*記載の発明"),
        "「〜に記載の発明」の「に」が抜けている可能性があります（例: 「引用文献１記載の発明」）。",
    ),
    (
        "duplicatedParticleGeneric",
        re.compile(
            r"(?:^|(?<=[一-龥々ぁ-んァ-ヶーA-Za-zａ-ｚＡ-Ｚ0-9０-９）」』】、，,。．.・:：;；!?！？\s]))"
            r"(?:(?P<p>から|まで|より|だけ|ほど|など|こそ|しか|さえ|でも|って|のに|ので|には|では|へは|にも|とも|とは|は|が|を|に|へ|で|や|も)(?P=p)"
            r"|と(?<!こと|ひと|あと|もと)と"
            r"|かか(?!わらず|わる|われ(?:た|ない)?|る|った|って|り|れ(?:た|ない)?|ろ|ない|なかった))"
        ),
        "助詞が同じ形で連続しています。不要な助詞が重複している可能性があります（例: 「〜がが」「〜はは」など）。",
    ),
    (
        "duplicatedKanaWord",
        re.compile(r"([ぁ-んァ-ン]{2,4})\1"),
        "同じ仮名の並びが連続しています。単語の重複や変換ミスの可能性があります（例: 同じ「ああ」が続けて出現）。",
    ),
]

TYPO_PHRASES: list[tuple[str, str, str]] = [
    ("kisaiarete_iiru", "記載されていいる", "「記載されている」の誤記と考えられます。"),
    ("ito_to_shite", "意図として", "文脈によっては「意図して」の誤記の可能性があります。"),
    ("suru_koto_ga_dekiru_koto", "することができること", "「することができる」等に簡略化できる冗長な表現です。"),
    ("suru_tame_tame", "するためため", "「するため」が重複している可能性があります。"),
    ("ni_oite_ni_oite", "においてにおいて", "「において」が重複している可能性があります。"),
    ("ni_taisite_ni_taisite", "に対してに対して", "「に対して」が重複している可能性があります。"),
    ("ni_yori_ni_yori", "によりにより", "「により」が重複している可能性があります。"),
    ("dekiru_dekiru", "することができることができる", "「することができる」が重複しています。"),
    ("koku_koku", "告知し告知し", "同じ動詞が続けて出現しています。文のつなぎに誤りがある可能性があります。"),
    ("to_shite_shite", "としてとして", "「として」が重複しています。接続の誤りの可能性があります。"),
]

_CTX_NL_RE = re.compile(r"\r?\n")


class _U16:
    """UTF-16 view of a Python str: JS indexes/slices count UTF-16 code
    units, so `index` and the 15-unit context windows must be computed in
    that coordinate system to match the reference byte-for-byte."""

    def __init__(self, text: str):
        self.raw = text.encode("utf-16-le", "surrogatepass")
        self.len16 = len(self.raw) // 2
        # cumulative utf-16 offset for each codepoint position (only built
        # when the text actually contains astral chars)
        self.has_astral = self.len16 != len(text)
        if self.has_astral:
            offs = [0] * (len(text) + 1)
            acc = 0
            for i, ch in enumerate(text):
                acc += 2 if ord(ch) > 0xFFFF else 1
                offs[i + 1] = acc
            self.offs = offs

    def to16(self, cp_index: int) -> int:
        return self.offs[cp_index] if self.has_astral else cp_index

    def slice16(self, start: int, end: int) -> str:
        return self.raw[2 * start:2 * end].decode("utf-16-le", "surrogatepass")

    def context(self, idx16: int, match_len16: int) -> str:
        start = max(0, idx16 - 15)
        end = min(self.len16, idx16 + match_len16 + 15)
        return _CTX_NL_RE.sub(" ", self.slice16(start, end))


def _len16(s: str) -> int:
    return len(s.encode("utf-16-le", "surrogatepass")) // 2


def check(text: str) -> dict:
    """jaTypoChecker.js:242-301 — returns {hasError, items:[...]}."""
    items: list[dict] = []
    if not text:
        return {"hasError": False, "items": items}

    u16 = _U16(text)

    for pid, rx, message in TYPO_PATTERNS:
        for m in rx.finditer(text):
            matched = m.group(0)
            idx16 = u16.to16(m.start())
            items.append({
                "type": "pattern",
                "id": pid,
                "message": message,
                "match": matched,
                "index": idx16,
                "context": u16.context(idx16, _len16(matched)),
            })

    for pid, phrase, message in TYPO_PHRASES:
        search = 0
        while True:
            found = text.find(phrase, search)
            if found == -1:
                break
            idx16 = u16.to16(found)
            items.append({
                "type": "phrase",
                "id": pid,
                "message": message,
                "match": phrase,
                "index": idx16,
                "context": u16.context(idx16, _len16(phrase)),
            })
            search = found + len(phrase)

    return {"hasError": len(items) > 0, "items": items}
