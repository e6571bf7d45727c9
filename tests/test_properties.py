"""Property-based tests (SURVEY.md §5.2): idempotence laws, total-function
robustness, and the lazy-block linear-scan equivalence proof."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from patent_decision_document_converter_spark.functions import widths
from patent_decision_document_converter_spark.functions.jsstr import (
    escape_regexp,
    lazy_block_sub,
)
from patent_decision_document_converter_spark.plans.registry import MODES, convert_text

# text over a small adversarial alphabet: marker chars, widths, whitespace
_ALPHABET = list("AB xy\n\r\t　０9ａz『』<>-。、")
_texts = st.text(alphabet=_ALPHABET, max_size=200)


@settings(max_examples=200, deadline=None)
@given(_texts)
def test_idempotent_normalizers(s):
    for fn in (widths.nl, widths.squeeze, widths.trim, widths.rm_blank,
               widths.lead, widths.to_half_width, widths.hw):
        once = fn(s)
        assert fn(once) == once, fn.__name__


@settings(max_examples=200, deadline=None)
@given(_texts)
def test_width_roundtrip_laws(s):
    # folding to half-width is stable under repeated full->half cycles
    assert widths.hw_alnum(widths.fw_alnum(widths.hw_alnum(s))) == widths.hw_alnum(s)
    assert widths.hw_num(widths.fw_num(widths.hw_num(s))) == widths.hw_num(s)


@settings(max_examples=60, deadline=None)
@given(_texts, st.sampled_from(sorted(MODES)))
def test_convert_text_total(s, mode):
    """Every mode is a total function: returns a str for ANY input
    (the reference's fail-safe wrapper semantics)."""
    out = convert_text(s, mode)
    assert isinstance(out, str)


_marker_alphabet = list("SExy\n ")
_block_texts = st.text(alphabet=_marker_alphabet, max_size=120)


@settings(max_examples=300, deadline=None)
@given(_block_texts, st.sampled_from(["S", "SS", "Sx"]), st.sampled_from(["E", "EE", "Ey"]))
def test_lazy_block_sub_equals_regex(s, start, end):
    """The O(n) two-pointer scan must equal the reference-shaped lazy
    regex ``(START)([\\s\\S]*?)(END)`` for every input, including
    overlapping/adjacent/nested marker layouts."""
    pattern = re.compile(
        "(" + escape_regexp(start) + ")([\\s\\S]*?)(" + escape_regexp(end) + ")"
    )

    def re_repl(m):
        return m.group(1) + "[" + m.group(2).replace("\n", "|") + "]" + m.group(3)

    def lin_repl(a, inner, b):
        return a + "[" + inner.replace("\n", "|") + "]" + b

    assert lazy_block_sub(s, start, end, lin_repl) == pattern.sub(re_repl, s)
