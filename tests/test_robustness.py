"""Null/degenerate-input robustness: the job and the training-data
operators must not throw on empty docs, empty span arrays, null text, or
empty DataFrames (a 100 TB corpus always contains garbage rows)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from patent_decision_document_converter_spark.operators import dedup, similarity, textstats
from patent_decision_document_converter_spark.plans.job import (
    convert_documents,
    convert_documents_exploded,
    get_spark,
)
from patent_decision_document_converter_spark.sources.documents import (
    DOCUMENTS_SCHEMA,
    create_documents_df,
)


@pytest.fixture(scope="module")
def spark():
    yield get_spark(app_name="pytest-robust", master="local[4]", shuffle_partitions=4)


def test_convert_degenerate_docs(spark):
    rows = [
        {"doc_id": "empty-spans", "spans": []},
        {"doc_id": "empty-text", "spans": [{"kind": "text", "text": "", "media_ref": "", "offset": 0}]},
        {"doc_id": "media-only", "spans": [{"kind": "figure", "text": "", "media_ref": "media://figure/1", "offset": 0}]},
        {"doc_id": "ws-only", "spans": [{"kind": "text", "text": " 　\t ", "media_ref": "", "offset": 0}]},
    ]
    df = create_documents_df(spark, rows)
    out = {r["doc_id"]: r for r in convert_documents(df, "officeAction").collect()}
    assert out["empty-spans"]["n_spans_out"] == 0
    assert out["media-only"]["spans"][0]["media_ref"] == "media://figure/1"
    assert set(out) == {r["doc_id"] for r in rows}
    # exploded strategy on the same degenerate docs (empty-spans has no
    # exploded rows -> absent by design; the rest must match)
    expl = {r["doc_id"]: r for r in convert_documents_exploded(df, "officeAction").collect()}
    for k in ("empty-text", "media-only", "ws-only"):
        assert expl[k].asDict(recursive=True) == out[k].asDict(recursive=True)


def test_convert_null_kind_span_parity(spark):
    """A NULL-kind span is a run boundary plus a passthrough row in BOTH
    strategies — the nested per-row loop sends anything kind != 'text'
    (including NULL) down the media branch, and r5 aligned the exploded
    strategy to it (the pre-r5 window shape silently DROPPED null-kind
    spans: `kind != 'text'` is NULL-valued in its filters)."""
    from patent_decision_document_converter_spark.plans.job import get_spark  # noqa: F401

    rows = [
        {
            "doc_id": "dirty",
            "spans": [
                {"kind": "text", "text": "前半テキスト", "media_ref": "", "offset": 0},
                {"kind": None, "text": "", "media_ref": "x:1", "offset": 1},
                {"kind": "text", "text": "後半テキスト", "media_ref": "", "offset": 2},
            ],
        }
    ]
    df = create_documents_df(spark, rows)
    nested = convert_documents(df, "officeAction").collect()[0].asDict(recursive=True)
    exploded = convert_documents_exploded(df, "officeAction").collect()[0].asDict(recursive=True)
    assert nested == exploded
    # the null-kind span survived as a passthrough and split the runs
    assert nested["n_spans_out"] == 3
    assert nested["spans"][1]["kind"] is None
    assert nested["spans"][1]["media_ref"] == "x:1"


def test_exploded_parity_randomized_dirty_corpus(spark):
    """Seeded-random dirty corpus: random kind mix (text/figure/table/
    NULL), empty and whitespace texts, media-heavy and text-heavy docs,
    empty span arrays — exploded must equal nested row-for-row.
    (Offsets stay unique per doc: the input_hint defines offset as the
    span's position; tie order inside one offset is out of contract.)"""
    import random

    rng = random.Random(20260818)
    pool = ["theory", "本文テキスト", "", " 　", "claim 1\nbody", "特許法第２９条"]
    rows = []
    for d in range(40):
        n = rng.randint(0, 12)
        spans = []
        for i in range(n):
            kind = rng.choice(["text", "text", "text", "figure", "table", None])
            spans.append(
                {
                    "kind": kind,
                    "text": rng.choice(pool) if kind == "text" else "",
                    "media_ref": "" if kind == "text" else f"m:{d}:{i}",
                    "offset": i,
                }
            )
        rows.append({"doc_id": f"rnd-{d:03d}", "spans": spans})
    df = create_documents_df(spark, rows)
    nested = {
        r["doc_id"]: r.asDict(recursive=True) for r in convert_documents(df, "pct").collect()
    }
    exploded = {
        r["doc_id"]: r.asDict(recursive=True)
        for r in convert_documents_exploded(df, "pct").collect()
    }
    assert nested == exploded


def test_text_ops_on_null_and_empty(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "ok text here")],
        StructType([StructField("doc_id", StringType()), StructField("text", StringType())]),
    )
    # none of these may throw; null text behaves like empty
    assert dedup.exact_dedup(df).count() >= 1
    assert dedup.simhash_fingerprints(df).count() == 4
    sigs = {r["doc_id"]: list(r["signature"]) for r in dedup.minhash_signatures(df).collect()}
    assert sigs["1"] == sigs["2"] == []
    assert textstats.token_stats(df).count() == 4
    assert textstats.quality_scores(df).count() == 4
    assert textstats.lang_id(df).count() == 4


def test_minhash_null_parity(spark):
    df = spark.createDataFrame(
        [("1", None), ("2", ""), ("3", "a b c d e f")],
        StructType([StructField("doc_id", StringType()), StructField("text", StringType())]),
    )
    fast = {r["doc_id"]: list(r["signature"]) for r in dedup.minhash_signatures(df, impl="pandas").collect()}
    expr = {r["doc_id"]: list(r["signature"]) for r in dedup.minhash_signatures(df, impl="expr").collect()}
    assert fast == expr


def test_empty_dataframe_through_ops(spark):
    empty = spark.createDataFrame([], DOCUMENTS_SCHEMA)
    assert convert_documents(empty, "pct").count() == 0
    et = spark.createDataFrame(
        [], StructType([StructField("doc_id", StringType()), StructField("text", StringType())])
    )
    assert dedup.exact_dedup(et).count() == 0
    sigs = dedup.minhash_signatures(et)
    assert dedup.minhash_lsh_candidates(sigs).count() == 0
    assert textstats.winnow_fingerprints(et).count() == 0


def test_similarity_degenerate_vectors(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0], 0), (2, [1.0, 0.0, 0.0], 0), (3, [0.0, 1.0, 0.0], 1)],
        ["vec_id", "embedding", "label"],
    )
    # zero vector -> NaN cosine; must not throw, must not rank above real sims
    out = similarity.cosine_topk(df, [1.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in out][0] == 2
    assert similarity.cosine_pairs(df, 0.5).count() == 0
