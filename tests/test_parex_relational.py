"""Relational paragraph/figure extraction must equal the exact UDF
string-for-string (SURVEY §2.9: "UDF for exactness, relational variant
for oracle checks")."""

import pytest

from patent_decision_document_converter_spark.functions.parex import (
    extract_paragraph_and_figure_refs,
)
from patent_decision_document_converter_spark.operators.parex_relational import (
    paragraph_refs_relational,
)
from patent_decision_document_converter_spark.plans.job import get_spark
from patent_decision_document_converter_spark.sources.generator import (
    doc_text_from_spans,
    make_documents_rows,
)

from .conftest import FIXTURES, read_fixture


@pytest.fixture(scope="module")
def spark():
    yield get_spark(app_name="pytest-parex-rel", master="local[4]", shuffle_partitions=4)


CASES = [
    "引用文献1(特に段落[0001]、[0003]-[0008]、図1、4a、式(2)、表5b参照)",
    "UEは、DCIを受信し（段落[００２７]、[００６５]、[００９８]-[００９９]、図１、６-８）動作する。",
    "段落［３２４２］及び［３２５０］を参照されたい。",
    "図9〜11、図１２－１４を見よ。",
    "refs [5]-[3] reversed and 図 3、2、1 descending",
    "no refs at all here",
    "[99999] wide and 【０００１】 narrow",
    "図-5 negative-ish and [0007]",
    "",
]


def test_matches_exact_udf_on_cases(spark):
    df = spark.createDataFrame(list(enumerate(CASES)), ["doc_id", "text"])
    got = {r["doc_id"]: r["refs"] for r in paragraph_refs_relational(df).collect()}
    for i, text in enumerate(CASES):
        assert got[i] == extract_paragraph_and_figure_refs(text), f"case {i}: {text!r}"


def test_matches_exact_udf_on_corpus(spark):
    rows = make_documents_rows(80, seed=3, mega_frac=0.0)
    data = [(r["doc_id"], doc_text_from_spans(r["spans"])) for r in rows]
    df = spark.createDataFrame(data, ["doc_id", "text"])
    got = {r["doc_id"]: r["refs"] for r in paragraph_refs_relational(df).collect()}
    for doc_id, text in data:
        assert got[doc_id] == extract_paragraph_and_figure_refs(text), doc_id


def test_matches_exact_udf_on_fixtures(spark):
    data = [(fx, read_fixture(fx)) for fx in FIXTURES]
    df = spark.createDataFrame(data, ["doc_id", "text"])
    got = {r["doc_id"]: r["refs"] for r in paragraph_refs_relational(df).collect()}
    for doc_id, text in data:
        assert got[doc_id] == extract_paragraph_and_figure_refs(text), doc_id
