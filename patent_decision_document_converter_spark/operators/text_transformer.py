"""Region (marker-window) operators — the reference's "window functions".

Exact semantics of TextTransformer
(/root/reference/TextTransformer/TextTransformer.js:85-374): apply a function
F to contiguous line ranges located by FIRST exact-match full-line markers in
the ORIGINAL text (markers are looked up in the unmutated original lines even
after earlier transforms ran).

The Spark-native equivalent of these index-window maps for exploded lines is
in plans/relational.py (Window.partitionBy(doc_id).orderBy(line_no) with
first-occurrence flags); this class is the exact in-UDF form.
"""

from __future__ import annotations

from collections.abc import Callable

from ..functions.jsstr import join_lines, split_lines

_FW_NUM_TBL = {c: c + 0xFEE0 for c in range(0x30, 0x3A)}
_FW_ALNUM_TBL = {
    **{c: c + 0xFEE0 for c in range(0x30, 0x3A)},
    **{c: c + 0xFEE0 for c in range(0x41, 0x5B)},
    **{c: c + 0xFEE0 for c in range(0x61, 0x7B)},
}


def _to_arr(x) -> list:
    if x is None:
        return []
    return list(x) if isinstance(x, (list, tuple)) else [x]


def _run_f(line: str, F) -> str:
    """TextTransformer.js:31-44 — F may be a function or a (fn, *args) tuple
    (the JS form allows [fn, ...args])."""
    if isinstance(F, (list, tuple)) and F and callable(F[0]):
        return str(F[0](line, *F[1:]))
    if callable(F):
        return str(F(line))
    return line


def _has_sep(s: str, sep) -> bool:
    """TextTransformer.js:47-51."""
    seps = _to_arr(sep)
    return any(bool(x) and x in s for x in seps)


class TextTransformer:
    """Positional line-index region transformer (TextTransformer.js:85-328)."""

    def __init__(self, text: str):
        self._orig_lines = split_lines(text)
        self._lines = list(self._orig_lines)

    def reset(self, text: str | None = None) -> "TextTransformer":
        if text is not None:
            self._orig_lines = split_lines(text)
        self._lines = list(self._orig_lines)
        return self

    def __str__(self) -> str:
        return join_lines(self._lines)

    to_string = __str__

    def _index_of(self, marker: str) -> int:
        try:
            return self._orig_lines.index(marker)
        except ValueError:
            return -1

    def above_inc(self, a, F) -> "TextTransformer":
        """TextTransformer.js:112-125."""
        n = len(self._lines)
        for m in _to_arr(a):
            if m is None:
                continue
            idx = self._index_of(m)
            if idx < 0:
                continue
            for i in range(0, min(idx + 1, n)):
                self._lines[i] = _run_f(self._lines[i], F)
        return self

    def above_exc(self, a, F) -> "TextTransformer":
        """TextTransformer.js:127-140."""
        n = len(self._lines)
        for m in _to_arr(a):
            if m is None:
                continue
            idx = self._index_of(m)
            if idx <= 0:
                continue
            for i in range(0, min(idx, n)):
                self._lines[i] = _run_f(self._lines[i], F)
        return self

    def below_inc(self, a, F) -> "TextTransformer":
        """TextTransformer.js:146-159."""
        n = len(self._lines)
        for m in _to_arr(a):
            if m is None:
                continue
            idx = self._index_of(m)
            if idx < 0 or idx >= n:
                continue
            for i in range(idx, n):
                self._lines[i] = _run_f(self._lines[i], F)
        return self

    def below_exc(self, a, F) -> "TextTransformer":
        """TextTransformer.js:161-174."""
        n = len(self._lines)
        for m in _to_arr(a):
            if m is None:
                continue
            idx = self._index_of(m)
            if idx < 0 or idx + 1 >= n:
                continue
            for i in range(idx + 1, n):
                self._lines[i] = _run_f(self._lines[i], F)
        return self

    def range_inc(self, a, b, F) -> "TextTransformer":
        """TextTransformer.js:183-206 — pairwise (a_k, b_k), order-insensitive."""
        arr_a, arr_b = _to_arr(a), _to_arr(b)
        n = len(self._lines)
        for ma, mb in zip(arr_a, arr_b):
            if ma is None or mb is None:
                continue
            ia, ib = self._index_of(ma), self._index_of(mb)
            if ia < 0 or ib < 0:
                continue
            s = max(0, min(ia, ib))
            e = min(n - 1, max(ia, ib))
            for i in range(s, e + 1):
                self._lines[i] = _run_f(self._lines[i], F)
        return self

    def range_exc(self, a, b, F) -> "TextTransformer":
        """TextTransformer.js:208-235."""
        arr_a, arr_b = _to_arr(a), _to_arr(b)
        n = len(self._lines)
        for ma, mb in zip(arr_a, arr_b):
            if ma is None or mb is None:
                continue
            ia, ib = self._index_of(ma), self._index_of(mb)
            if ia < 0 or ib < 0:
                continue
            s = min(ia, ib) + 1
            e = max(ia, ib) - 1
            if s > e:
                continue
            s = max(s, 0)
            e = min(e, n - 1)
            for i in range(s, e + 1):
                self._lines[i] = _run_f(self._lines[i], F)
        return self

    def head(self, ch: str, F) -> "TextTransformer":
        """TextTransformer.js:242-251 — lines starting with ch."""
        for i, line in enumerate(self._lines):
            if line.startswith(ch):
                self._lines[i] = _run_f(line, F)
        return self

    def _mark_tail(self, mark, sep, table: dict) -> "TextTransformer":
        marks = _to_arr(mark)
        for i, line in enumerate(self._lines):
            best_pos, best_len = -1, 0
            for m in marks:
                if not m:
                    continue
                pos = line.find(m)
                if pos == -1:
                    continue
                if best_pos == -1 or pos < best_pos:
                    best_pos, best_len = pos, len(m)
            if best_pos == -1:
                continue
            head_part = line[: best_pos + best_len]
            tail_part = line[best_pos + best_len:]
            if not _has_sep(tail_part, sep):
                continue
            self._lines[i] = head_part + tail_part.translate(table)
        return self

    def fw_num_mark(self, mark, sep) -> "TextTransformer":
        """TextTransformer.js:261-294 — full-width digits in the tail after
        the earliest mark, iff the tail contains a sep."""
        return self._mark_tail(mark, sep, _FW_NUM_TBL)

    def fw_alnum_mark(self, mark, sep) -> "TextTransformer":
        """TextTransformer.js:296-328."""
        return self._mark_tail(mark, sep, _FW_ALNUM_TBL)


# Static-style wrappers (TextTransformer.js:335-374)

def above_inc(text, a, F):
    return str(TextTransformer(text).above_inc(a, F))


def above_exc(text, a, F):
    return str(TextTransformer(text).above_exc(a, F))


def below_inc(text, a, F):
    return str(TextTransformer(text).below_inc(a, F))


def below_exc(text, a, F):
    return str(TextTransformer(text).below_exc(a, F))


def range_inc(text, a, b, F):
    return str(TextTransformer(text).range_inc(a, b, F))


def range_exc(text, a, b, F):
    return str(TextTransformer(text).range_exc(a, b, F))


def head(text, ch, F):
    return str(TextTransformer(text).head(ch, F))


def fw_num_mark(text, mark, sep):
    return str(TextTransformer(text).fw_num_mark(mark, sep))


def fw_alnum_mark(text, mark, sep):
    return str(TextTransformer(text).fw_alnum_mark(mark, sep))
