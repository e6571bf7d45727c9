"""Round-4 advisory-finding regression tests (ADVICE.md, round 3):

1. simhash_near_dups refuses band_bits>15 on single-word fingerprint
   frames (silent recall collapse otherwise).
2. unigram_surprise builds a fully LAZY plan (no Spark job at
   plan-construction time) and still matches the eager version's values.
3. chunk_documents rejects negative overlap (silent token skipping).
4. curate_corpus emits a substring_cut flag column in both branches.
"""

import pytest
from pyspark.sql import functions as F

from patent_decision_document_converter_spark.operators import corpus, dedup, textstats
from patent_decision_document_converter_spark.plans.job import get_spark


@pytest.fixture(scope="module")
def spark():
    yield get_spark(app_name="pytest-advice-r4", master="local[4]", shuffle_partitions=4)


def test_simhash_band_bits_guard(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta zeta")],
        "doc_id int, text string",
    )
    one_word = dedup.simhash_fingerprints(docs, words=1)
    assert "fingerprint2" not in one_word.columns
    with pytest.raises(ValueError, match="fingerprint2"):
        dedup.simhash_near_dups(one_word, band_bits=30)
    # single-word frames still work at <=15-bit bands
    dedup.simhash_near_dups(one_word, band_bits=15).collect()
    # two-word frames take the wide banding
    two_word = dedup.simhash_fingerprints(docs, words=2)
    dedup.simhash_near_dups(two_word, band_bits=30).collect()


def test_unigram_surprise_plan_is_lazy(spark):
    """Constructing the plan must trigger NO Spark job (the r3 version ran
    an eager .head() for the corpus token total)."""
    docs = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "aa dd"), (3, None), (4, "")],
        "doc_id int, text string",
    )
    tracker = spark.sparkContext.statusTracker()
    group = "unigram-lazy-probe"
    spark.sparkContext.setJobGroup(group, "plan construction must be lazy")
    try:
        out = textstats.unigram_surprise(docs)
        jobs_during_construction = tracker.getJobIdsForGroup(group)
    finally:
        spark.sparkContext.setJobGroup(None, None)
    assert jobs_during_construction == [], (
        "unigram_surprise ran a Spark job at plan-construction time"
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # N=6 tokens -> bits(6)=3; aa cnt=3 (bits 2, s=1), bb/cc/dd cnt=1 (bits 1, s=2)
    assert rows[1]["surprise_bits"] == 1 + 2 + 1 + 2
    assert rows[1]["n_tokens"] == 4
    assert rows[2]["surprise_bits"] == 1 + 2
    assert rows[3]["surprise_bits"] == 0 and rows[3]["n_tokens"] == 0
    assert rows[4]["surprise_bits"] == 0 and rows[4]["n_tokens"] == 0
    assert rows[1]["mean_surprise_milli"] == (1000 * 6) // 4


def test_chunk_documents_rejects_negative_overlap(spark):
    docs = spark.createDataFrame([(1, "a b c d e f")], "doc_id int, text string")
    with pytest.raises(ValueError, match=">= 0"):
        corpus.chunk_documents(docs, chunk_tokens=4, overlap=-1)
    with pytest.raises(ValueError, match="smaller than"):
        corpus.chunk_documents(docs, chunk_tokens=4, overlap=4)
    # boundary: overlap=0 is legal (disjoint windows)
    out = corpus.chunk_documents(docs, chunk_tokens=4, overlap=0).collect()
    assert sorted(r["chunk_id"] for r in out) == [0, 1]


def test_curate_substring_cut_flag(spark, tmp_path):
    from patent_decision_document_converter_spark.plans.curate import curate_corpus
    from patent_decision_document_converter_spark.sources.documents import (
        create_documents_df,
    )
    from patent_decision_document_converter_spark.sources.generator import (
        make_documents_rows,
    )

    docs = create_documents_df(spark, make_documents_rows(12, seed=7))
    curated_off, _ = curate_corpus(docs)
    assert "substring_cut" in curated_off.columns
    assert curated_off.filter(F.col("substring_cut")).count() == 0

    curated_on, m = curate_corpus(docs, substring_dedup_min_run=2)
    assert "substring_cut" in curated_on.columns
    assert (
        curated_on.filter(F.col("substring_cut")).count() == m["substring_cut_docs"]
    )
