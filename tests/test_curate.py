"""End-to-end curation pipeline test: inject known garbage (typo docs,
low-quality docs, exact dupes, near dupes) and verify each stage drops
exactly the right documents."""

import pytest

from patent_decision_document_converter_spark.plans.curate import curate_corpus
from patent_decision_document_converter_spark.plans.job import get_spark
from patent_decision_document_converter_spark.sources.documents import create_documents_df


@pytest.fixture(scope="module")
def spark():
    yield get_spark(app_name="pytest-curate", master="local[4]", shuffle_partitions=4)


def _doc(doc_id: str, text: str) -> dict:
    return {
        "doc_id": doc_id,
        "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
    }


BASE = (
    "１．この出願の請求項１に係る発明は、特許法第２９条第２項の規定により"
    "特許を受けることができない。引用文献１には、無線通信システムの基地局"
    "が端末に制御情報を送信する構成が記載されている。"
)


def test_curation_stages(spark):
    rows = [
        _doc("a-base", BASE),
        _doc("b-exact-dup", BASE),                               # exact dup of a-base
        _doc("c-near-dup", BASE + "なお、これは付記である。"),      # near dup (high shingle overlap)
        _doc("d-unique", "本願発明は、データを符号化する装置であって、プロセッサとメモリとを備え、受信した信号を復号して出力する構成を有する点で引用発明と相違する。"),
        _doc("e-typo", "これは、、誤記のある文書です。" * 5),        # doubled-punct → quarantine
        _doc("f-short", "短い"),                                  # fails min_tokens
        _doc("g-repeat", "同じ 同じ 同じ 同じ 同じ 同じ 同じ 同じ 同じ 同じ"),  # low diversity
    ]
    df = create_documents_df(spark, rows)
    curated, m = curate_corpus(
        df, mode="officeAction", min_chars=10, min_tokens=3, min_distinct_permille=300
    )
    kept = sorted(r["doc_id"] for r in curated.select("doc_id").collect())

    assert m["input_docs"] == 7
    assert m["quarantined"] == 1                      # e-typo
    assert m["after_quality"] == 4                    # drops f-short, g-repeat
    assert m["after_exact_dedup"] == 3                # drops b-exact-dup
    assert m["after_near_dedup"] == 2                 # drops c-near-dup
    assert kept == ["a-base", "d-unique"]

    # curated rows are full converted span rows (schema intact)
    cols = set(curated.columns)
    assert {"doc_id", "mode", "spans", "findings", "n_spans_in", "n_spans_out"} <= cols


def test_curate_repetition_gate(spark):
    from patent_decision_document_converter_spark.plans.curate import curate_corpus
    from patent_decision_document_converter_spark.sources.documents import create_documents_df

    def doc(doc_id, text):
        return {
            "doc_id": doc_id,
            "spans": [{"kind": "text", "text": text, "media_ref": "", "offset": 0}],
        }

    rows = [
        doc("clean", "this document has plenty of distinct words and normal structure overall"),
        doc("looper", "spam line here\nspam line here\nspam line here\nspam line here\nunique tail words"),
    ]
    df = create_documents_df(spark, rows)
    _, m = curate_corpus(
        df, mode="pct", min_chars=10, min_tokens=3, min_distinct_permille=100,
        max_dup_line_permille=300,
    )
    assert m["after_quality"] == 2
    assert m["after_repetition"] == 1  # looper dropped by the dup-line gate


def test_curate_cli_end_to_end(spark, tmp_path_factory):
    """The spark-submit-shaped CLI path: python -m ...plans.curate over a
    staged parquet corpus, with the substring-dedup flag — exercises
    argparse wiring, the metrics JSON line, and the output write."""
    import json
    import os
    import subprocess
    import sys

    from patent_decision_document_converter_spark.sources.documents import (
        create_documents_df,
    )
    from patent_decision_document_converter_spark.sources.generator import (
        make_documents_rows,
    )

    base = str(tmp_path_factory.mktemp("curate_cli"))
    rows = make_documents_rows(12, seed=41, mega_frac=0.0)
    create_documents_df(spark, rows).write.parquet(f"{base}/in")

    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "4"
    res = subprocess.run(
        [
            sys.executable, "-m",
            "patent_decision_document_converter_spark.plans.curate",
            "--input", f"{base}/in",
            "--output", f"{base}/out",
            "--mode", "pct",
            "--min-chars", "5",
            "--substring-dedup-min-run", "2",
        ],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        timeout=480,
    )
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    metrics = json.loads(res.stdout.strip().splitlines()[-1])
    assert metrics["input_docs"] == 12
    assert "substring_cut_docs" in metrics
    curated = spark.read.parquet(f"{base}/out")
    assert curated.count() == metrics["curated_docs"] > 0
