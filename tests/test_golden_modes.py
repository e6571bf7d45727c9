"""Golden end-to-end tests: every mode on every reference fixture must
byte-equal the output of the reference JS (frozen by tools/gen_goldens.mjs).

This is the span/text-equality gate of BASELINE.json ("100% span-sequence
equality on reference fixtures").
"""

import json
import os

import pytest

from patent_decision_document_converter_spark.plans.registry import MODES, convert_text
from patent_decision_document_converter_spark.functions.typo import check

from .conftest import FIXTURES, GOLDEN_DIR, read_fixture, read_golden


@pytest.mark.parametrize("fixture", FIXTURES)
@pytest.mark.parametrize("mode", sorted(MODES))
def test_mode_golden(fixture: str, mode: str):
    raw = read_fixture(fixture)
    expected = read_golden(f"{fixture}__{mode}")
    assert convert_text(raw, mode) == expected


@pytest.mark.parametrize("fixture", FIXTURES)
@pytest.mark.parametrize(
    "chain", ["init", "main", "stripBlankLines", "convertEnd", "finalAction"]
)
def test_chain_stage_golden(fixture: str, chain: str):
    """Cumulative per-chain goldens along the officeAction path."""
    from patent_decision_document_converter_spark.functions.widths import to_half_width
    from patent_decision_document_converter_spark.plans.registry import REGISTRY

    order = ["init", "main", "stripBlankLines"]
    raw = read_fixture(fixture)
    cur = to_half_width(raw)
    if chain in ("init", "main", "stripBlankLines"):
        upto = order[: order.index(chain) + 1]
    elif chain == "convertEnd":
        upto = order + ["convertEnd"]
    else:  # finalAction branches off after stripBlankLines
        upto = order + ["finalAction"]
    for nm in upto:
        cur = REGISTRY.apply(nm, cur)
    assert cur == read_golden(f"{fixture}__chain_{chain}")


@pytest.mark.parametrize("fixture", FIXTURES)
def test_typo_golden(fixture: str):
    raw = read_fixture(fixture)
    with open(os.path.join(GOLDEN_DIR, f"{fixture}__typo.json"), encoding="utf-8") as f:
        expected = json.load(f)
    assert check(raw) == expected
