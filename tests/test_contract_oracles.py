"""In-suite driver-contract gate: a representative subset of the
``__spark_entry__`` queries compared against their DuckDB oracles
(rows + sorted schema + order-insensitive value hash — the same
comparison the driver runs), so `pytest tests/ -x -q` alone catches an
oracle/engine divergence.  The full 50-query sweep stays in
tools/check_contract.py."""

import hashlib

import duckdb
import pytest

import __spark_entry__ as entry
from patent_decision_document_converter_spark.plans.job import get_spark

SF_DIR = "/root/testdata/sf0.001"

# cheap but diverse: scan-agg, window/island, dedup, repetition, packing,
# multimodal, and the frozen-reference conversion gates (incl. interleaved)
SUBSET = [
    "q1_pricing_summary",
    "run_compress_orderkeys",
    "dedup_exact",
    "text_repetition",
    "corpus_token_batches",
    "media_features",
    "convert_office_action",
    "convert_interleaved_spans",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def spark():
    yield get_spark(app_name="pytest-contract", master="local[4]", shuffle_partitions=4)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield c
    c.close()


def _norm(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _digest(cols, rows) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(_norm(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "surrogatepass"))
        h.update(b"\x00")
    return h.hexdigest()[:16]


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, con, name):
    fn = entry.queries()[name]
    sql = entry.oracle_sql()[name]

    df = fn(spark, SF_DIR)
    s_cols = df.columns
    s_rows = [tuple(r) for r in df.collect()]

    res = con.execute(sql)
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _digest(s_cols, s_rows) == _digest(d_cols, d_rows)
